"""Invariant tests for the round-3 session ops, independent of the
DuckDB oracles: each re-derives the operator's contract in plain python
from the collected output (different mechanism than the gate's
value-hash compare)."""

import os

SF = "/root/testdata/sf0.001"


def test_redirect_fixture_exercises_multihop_and_terminates(spark):
    """The synthesized redirect set must contain real CHAINS (else the
    pointer doubling is untested) and every resolution must land on a
    non-source URL (terminal)."""
    from grabspark.ops.relational import redirect_resolution, _REDIR_URL

    rows = redirect_resolution(spark, SF).collect()
    assert rows
    hops = sorted({r["hops"] for r in rows})
    assert hops[0] == 1 and hops[-1] >= 2, hops  # multi-hop chains exist
    srcs = {r["url"] for r in rows}
    for r in rows:
        assert r["final_url"] not in srcs, r  # terminal, never a source


def test_pack_sequences_matches_sequential_simulation(spark):
    """The closed-form window assignment must equal a literal
    concat-and-chop simulation (walk docs in order, carry a token
    cursor) — the semantics, re-derived without window functions."""
    from grabspark.ops.textstats import pack_sequences, _PACK_BUDGET

    rows = pack_sequences(spark, SF).collect()
    by_shard: dict[tuple, list] = {}
    for r in rows:
        by_shard.setdefault((r["lang"], r["shard"]), []).append(r)
    assert by_shard
    for members in by_shard.values():
        members.sort(key=lambda r: r["doc_id"])
        cursor = 0
        for r in members:
            assert r["seq_id"] == cursor // _PACK_BUDGET, r
            assert r["start_off"] == cursor % _PACK_BUDGET, r
            end = cursor + r["tok"] - 1
            assert r["straddles"] == (
                r["tok"] > 0 and end // _PACK_BUDGET > cursor // _PACK_BUDGET
            ), r
            cursor += r["tok"]


def test_boilerplate_page_edges_always_dropped(spark):
    """Nav header and footer are short page-EDGE lines: smoothing can
    never rescue them (one neighbor is always missing), so every doc
    must drop at least both — and keep at least one content line when
    the body has a full line."""
    from grabspark.ops.textstats import boilerplate_strip

    rows = boilerplate_strip(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] <= r["n_lines"] - 2, r
        if r["n_lines"] >= 5:  # nav + first body + RELATED + body + footer
            assert r["n_kept"] >= 1, r


def test_crawl_tiers_budgets_exact_and_proportional(spark):
    """Largest remainder contract: per-tier budgets sum EXACTLY to the
    tier budget and every host is within 1 fetch of its real-valued
    proportional share."""
    from grabspark.ops.crawlgraph import crawl_tiers, _TIER_BUDGETS

    rows = crawl_tiers(spark, SF).collect()
    tiers: dict[int, list] = {}
    for r in rows:
        tiers.setdefault(r["tier"], []).append(r)
    assert set(tiers) == {1, 2, 3}
    for t, members in tiers.items():
        budget = _TIER_BUDGETS[t - 1]
        assert sum(r["host_budget"] for r in members) == budget
        denom = sum(r["rank_ppm"] for r in members)
        for r in members:
            ideal = budget * r["rank_ppm"] / denom
            assert abs(r["host_budget"] - ideal) < 1.0, (r, ideal)


def test_image_batch_buckets_partition_of_corpus(spark):
    """Every image lands in exactly one (bucket, batch, position) slot;
    positions within a batch are a contiguous 0..k prefix; complete
    batches have exactly _BATCH_B members."""
    from grabspark.ops.images import image_batch_buckets, _BATCH_B

    rows = image_batch_buckets(spark, SF).collect()
    assert len({r["image_id"] for r in rows}) == len(rows)
    batches: dict[tuple, list] = {}
    for r in rows:
        batches.setdefault((r["ar_bucket"], r["res_tier"], r["batch_idx"]), []).append(r)
    for key, members in batches.items():
        poss = sorted(r["pos_in_batch"] for r in members)
        assert poss == list(range(len(members))), key
        flags = {r["complete"] for r in members}
        assert len(flags) == 1, key  # whole batch agrees
        if flags.pop():
            assert len(members) == _BATCH_B, key
        else:
            assert len(members) < _BATCH_B, key


def test_multimodal_curation_priority_and_coverage(spark):
    """Every pair gets exactly one disposition; all five classes are
    populated at fixture scale (else a rule is dead code); kept pairs
    are a strict subset of the corpus."""
    from grabspark.ops.images import multimodal_curation, build_joint_corpus

    rows = multimodal_curation(spark, SF).collect()
    corpus = build_joint_corpus()
    assert len(rows) == len(corpus)
    assert len({r["image_id"] for r in rows}) == len(rows)
    classes = {r["disposition"] for r in rows}
    assert classes == {
        "kept", "short_caption", "misaligned", "dup_image", "dup_caption"
    }, classes


def test_rendezvous_minimal_resharding(spark):
    """Rendezvous hashing's defining property: growing the pool N -> N+1
    moves hosts ONLY to the new shard (no old shard can overtake another
    old shard — neither weight changed), and the moved fraction is
    near 1/(N+1)."""
    from grabspark.ops.relational import rendezvous_shard, _RDV_SHARDS

    rows = rendezvous_shard(spark, SF).collect()
    moved = [r for r in rows if r["moved"]]
    assert moved, "scaling must move someone"
    assert all(r["shard_scaled"] == _RDV_SHARDS for r in moved)
    frac = len(moved) / len(rows)
    assert 0.02 <= frac <= 0.30, frac  # ~1/9 expected, loose band


def test_grayscale_detector_separates_planted_classes(spark):
    """Every planted '#gray' twin is detected; no colorful original is
    misflagged; the two classes are separated by a wide margin."""
    from grabspark.ops.images import image_grayscale_detect

    rows = image_grayscale_detect(spark, SF).collect()
    gray = [r for r in rows if r["image_id"].endswith("#gray")]
    color = [r for r in rows if not r["image_id"].endswith("#gray")]
    assert gray and color
    assert all(r["is_gray"] for r in gray)
    assert not any(r["is_gray"] for r in color)
    assert max(r["colorfulness"] for r in gray) * 10 < min(
        r["colorfulness"] for r in color
    )


def test_leakage_safe_split_cluster_integrity(spark):
    """No near-dup component straddles splits, and the split fractions
    are near 90/5/5."""
    from grabspark.ops.dedup import leakage_safe_split

    rows = leakage_safe_split(spark, SF).collect()
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    assert any(len([r for r in rows if r["component"] == c]) > 1 for c in by_comp)
    n = len(rows)
    train = sum(r["split"] == "train" for r in rows)
    assert 0.8 <= train / n <= 0.97, train / n


def test_letterbox_detector_recovers_planted_border(spark):
    """Every '#box' twin reports exactly its planted uniform border
    thickness on all four sides; no PRNG original reports any border;
    crop box equals the pre-padding dimensions."""
    from grabspark.ops.images import (
        BOX_EVERY,
        build_image_corpus,
        image_letterbox_detect,
    )

    expected_t = {
        r.image_id + "#box": (i // BOX_EVERY) % 3 + 1
        for i, r in enumerate(build_image_corpus().itertuples(index=False))
        if i % BOX_EVERY == 0
    }
    rows = {r["image_id"]: r for r in image_letterbox_detect(spark, SF).collect()}
    boxed = [k for k in rows if k.endswith("#box")]
    assert boxed and set(boxed) == set(expected_t)
    for k in boxed:
        r, orig = rows[k], rows[k[: -len("#box")]]
        t = expected_t[k]
        assert (r["top"], r["bottom"], r["left"], r["right"]) == (t, t, t, t), k
        assert r["has_border"]
        # crop restores the original (un-padded) dimensions
        assert (r["crop_w"], r["crop_h"]) == (
            orig["crop_w"] + orig["left"] + orig["right"],
            orig["crop_h"] + orig["top"] + orig["bottom"],
        )
    for k, r in rows.items():
        if not k.endswith("#box"):
            assert not r["has_border"], k


def test_circuit_breaker_matches_sequential_simulation(spark):
    """Per-host max consecutive-failure run recomputed by a plain python
    scan over the same deterministic log agrees with the DataFrame op."""
    import hashlib

    from grabspark.ops.relational import _CB_THRESHOLD, host_circuit_breaker
    import duckdb

    keys = duckdb.sql(
        "SELECT o_orderkey FROM '/root/testdata/sf0.001/orders.parquet' ORDER BY 1"
    ).fetchall()
    sim: dict = {}
    for (k,) in keys:
        host = f"h{k % 7}.test"
        ok = int(hashlib.md5(str(k).encode()).hexdigest()[:2], 16) % 4 != 0
        n, f, run, mx = sim.get(host, (0, 0, 0, 0))
        run = 0 if ok else run + 1
        sim[host] = (n + 1, f + (not ok), run, max(mx, run))
    got = {r["host"]: r for r in host_circuit_breaker(spark, SF).collect()}
    assert set(got) == set(sim)
    for host, (n, f, _, mx) in sim.items():
        r = got[host]
        assert (r["n_attempts"], r["n_fail"], r["max_consec_fail"]) == (n, f, mx), host
        assert r["circuit_open"] == (mx >= _CB_THRESHOLD)
    # fixture is non-degenerate: both breaker states occur
    assert {r["circuit_open"] for r in got.values()} == {True, False}


def test_exposure_detector_classifies_planted_twins(spark):
    """Every '#over' twin labels over, '#under' under, originals ok;
    per-triple brightness ordering under < original < over holds."""
    from grabspark.ops.images import image_exposure_detect

    rows = {r["image_id"]: r for r in image_exposure_detect(spark, SF).collect()}
    overs = [k for k in rows if k.endswith("#over")]
    assert overs
    for k in overs:
        base = k[: -len("#over")]
        assert rows[k]["exposure"] == "over", k
        assert rows[base + "#under"]["exposure"] == "under"
        assert rows[base]["exposure"] == "ok"
        assert (
            rows[base + "#under"]["mean_bp"]
            < rows[base]["mean_bp"]
            < rows[k]["mean_bp"]
        )
    for k, r in rows.items():
        if not (k.endswith("#over") or k.endswith("#under")):
            assert r["exposure"] == "ok", k


def test_pixel_dedup_groups_exactly_the_planted_twins(spark):
    """Each '#pxtwin' groups with its source (group size 2, or 3 when a
    '#requant' raw re-encode of the same qraw pixels also exists — both
    constructions are pixel-identical); the representative is the
    lexicographic-min member; group bookkeeping is self-consistent."""
    from grabspark.ops.images import image_pixel_dedup

    rows = {r["image_id"]: r for r in image_pixel_dedup(spark, SF).collect()}
    twins = [k for k in rows if k.endswith("#pxtwin")]
    assert twins
    by_md5: dict = {}
    for k, r in rows.items():
        by_md5.setdefault(r["pixel_md5"], []).append(k)
    for k in twins:
        src = k[: -len("#pxtwin")]
        group = sorted(by_md5[rows[k]["pixel_md5"]])
        assert src in group and 2 <= len(group) <= 3, (k, group)
        if len(group) == 3:  # only a requant sibling can join
            assert any(g.endswith("#requant") for g in group), group
        for g in group:
            assert rows[g]["group_size"] == len(group)
            assert rows[g]["is_dup"] and rows[g]["rep_id"] == group[0]
    for md5, group in by_md5.items():
        if len(group) == 1:
            r = rows[group[0]]
            assert not r["is_dup"] and r["group_size"] == 1
            assert r["rep_id"] == group[0]


def test_sitemap_robots_gate_decisions_match_closed_form(spark):
    """The parser+matcher pipeline must reproduce the fixture's ground
    truth: /private blocked on even hosts, /tmp blocked except on
    empty-Disallow (nk%4==0) hosts, /public and /c always admitted;
    admitted rows carry the host's declared crawl-delay."""
    from grabspark.ops.relational import sitemap_robots_gate

    rows = sitemap_robots_gate(spark, SF).collect()
    assert rows
    segs = set()
    for r in rows:
        nk = int(r["host"][1:].split(".")[0])
        seg = r["url_canon"].split("/")[3]
        segs.add(seg)
        if seg == "private":
            assert nk % 2 == 1, r
        if seg == "tmp":
            assert nk % 4 == 0, r
        want_delay = float(nk % 5 + 1) if nk % 3 == 0 else 0.0
        assert r["crawl_delay"] == want_delay, r
    # every admit branch is populated (else a rule path is dead)
    assert segs == {"private", "public", "tmp", "c"}, segs


def test_weighted_sample_is_length_biased_and_well_formed(spark):
    """Efraimidis-Spirakis contract: ranks are a 1..K permutation ordered
    by ascending key, members are distinct docs, and the sample is
    length-biased (its mean length clearly exceeds the corpus mean —
    the defining property weight-proportional sampling must show)."""
    import duckdb

    from grabspark.ops.textstats import _ES_K, weighted_sample

    rows = sorted(weighted_sample(spark, SF).collect(), key=lambda r: r["samp_rank"])
    assert [r["samp_rank"] for r in rows] == list(range(1, min(_ES_K, len(rows)) + 1))
    keys = [r["es_key"] for r in rows]
    assert keys == sorted(keys)
    assert len({r["doc_id"] for r in rows}) == len(rows)
    corpus_mean = duckdb.sql(
        f"SELECT avg(n_chars) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_mean > 1.15 * corpus_mean, (sample_mean, corpus_mean)


def test_doc_lm_score_model_contract(spark):
    """Unigram-LM scoring contract: every doc is scored and total
    (n_oov <= n_tok, avg_logprob < 0); docs composed entirely of
    frequent tokens outscore docs with OOV mass (the floor is strictly
    below every in-vocab logprob by construction)."""
    from grabspark.ops.textstats import doc_lm_score

    rows = doc_lm_score(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tok"], r
        assert r["avg_logprob"] < 0.0, r
    no_oov = [r for r in rows if r["n_oov"] == 0]
    heavy_oov = [r for r in rows if r["n_oov"] * 2 > r["n_tok"]]
    if no_oov and heavy_oov:
        import statistics

        assert statistics.mean(r["avg_logprob"] for r in no_oov) > statistics.mean(
            r["avg_logprob"] for r in heavy_oov
        )


def test_dhash_finds_every_requant_twin(spark):
    """dHash contract: every '#requant' re-encode pairs with its source
    within HAM_MAX (gradient signs survive the 6-bit requantization),
    and no pair joins two images that are neither twin nor twin-source."""
    from grabspark.ops.images import HAM_MAX, build_image_corpus, image_dhash_near_dup

    pairs = [(r["img_a"], r["img_b"], r["hamming"])
             for r in image_dhash_near_dup(spark, SF).collect()]
    assert pairs
    found = {tuple(sorted((a, b))) for a, b, _ in pairs}
    twins = [r.image_id for r in build_image_corpus().itertuples(index=False)
             if r.image_id.endswith("#requant")]
    assert twins
    for t in twins:
        src = t[: -len("#requant")]
        assert tuple(sorted((src, t))) in found, t
    for a, b, d in pairs:
        assert 0 <= d <= HAM_MAX
        assert a.rstrip("#requant") == b.rstrip("#requant") or (
            a + "#requant" == b or b + "#requant" == a
        ), (a, b)


def test_block_shuffle_manifest_is_a_permutation(spark):
    """Every doc appears exactly once; positions within each block are a
    contiguous 0..k-1 prefix ordered by the salt; block sizes are
    balanced within the md5-uniform band."""
    from grabspark.ops.textstats import _SHUF_BLOCKS, block_shuffle_manifest

    rows = block_shuffle_manifest(spark, SF).collect()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    blocks: dict = {}
    for r in rows:
        blocks.setdefault(r["block"], []).append(r["pos"])
    assert set(blocks) == set(range(_SHUF_BLOCKS))
    for b, poss in blocks.items():
        assert sorted(poss) == list(range(len(poss))), b
    sizes = [len(p) for p in blocks.values()]
    assert max(sizes) < 3 * max(1, min(sizes)), sizes


def test_mirror_detection_finds_exactly_the_planted_pairs(spark):
    """The fixture plants mirrors as residue-class partners (m_k,
    m_{k+4}); the detector must report exactly those 4 pairs and no
    cross-class pair (those share only the small '/common' set, far
    under threshold)."""
    from grabspark.ops.relational import mirror_host_detect

    rows = mirror_host_detect(spark, SF).collect()
    got = {(r["host_a"], r["host_b"]) for r in rows}
    assert got == {(f"m{k}.test", f"m{k + 4}.test") for k in range(4)}, got
    for r in rows:
        assert r["shared"] <= min(r["pages_a"], r["pages_b"])
        assert r["sim_pct"] >= 50


def test_domain_rollup_groups_suffix_hosts_correctly(spark):
    """eTLD+1 contract: co.uk/com.au hosts roll up under 3-label
    registered domains (13 subdomains -> ONE row), plain TLDs under
    2-label ones; the shared budget divides by live host count."""
    from grabspark.ops.relational import _DOMAIN_BUDGET, domain_budget_rollup

    rows = {r["reg_domain"]: r for r in domain_budget_rollup(spark, SF).collect()}
    assert set(rows) == {
        "shared.co.uk", "example.com", "pages.dev", "corp.com.au", "site.test"
    }, set(rows)
    for dom, r in rows.items():
        assert r["n_hosts"] == 13, r  # all 13 subdomain residues occur
        assert r["per_host_budget"] == _DOMAIN_BUDGET // 13


def test_scene_cuts_both_classes_and_bounds(spark):
    """Cut counts are bounded by frame count - 1; the 500 threshold
    splits the lattice's delta values so both cut and no-cut transitions
    occur at fixture scale (else the detector is vacuous)."""
    from grabspark.ops.multimodal import video_scene_cuts

    rows = video_scene_cuts(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_cuts"] <= r["n_frames"] - 1, r
    assert any(r["n_cuts"] > 0 for r in rows)
    assert any(r["n_cuts"] < r["n_frames"] - 1 for r in rows)


def test_tracking_strip_collapses_only_tracking_params(spark):
    """No clean_url retains a tracking key; non-tracking params (id=7)
    survive; gclid-only URLs collapse to a bare path while pages with
    different real params never merge."""
    from grabspark.ops.relational import url_strip_tracking

    rows = url_strip_tracking(spark, SF).collect()
    assert rows
    collapsed = [r for r in rows if r["n_variants"] > 1]
    assert collapsed, "tracking variants must collapse"
    for r in rows:
        q = r["clean_url"].split("?", 1)[1] if "?" in r["clean_url"] else ""
        for part in filter(None, q.split("&")):
            key = part.split("=", 1)[0]
            assert not (key.startswith("utm_") or key in ("gclid", "fbclid", "ref")), r
        if "?" in r["first_url"] and "gclid" in r["first_url"]:
            assert "?" not in r["clean_url"], r  # gclid was the only param


def test_int8_quant_error_within_half_bin(spark):
    """Quantization contract: every vector's max reconstruction error is
    at most half the widest dimension bin (plus float slack), and no
    error is negative-impossible (all >= 0 by abs)."""
    import duckdb

    from grabspark.ops.similarity import embedding_int8_quant

    rows = embedding_int8_quant(spark, SF).collect()
    assert rows
    widest = duckdb.sql(f"""
        WITH ex AS (
          SELECT i, CAST(embedding[i] AS DOUBLE) AS v
          FROM '{SF}/embeddings.parquet',
               LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
        )
        SELECT max(max_v - min_v) FROM (
          SELECT i, min(v) AS min_v, max(v) AS max_v FROM ex GROUP BY i)
    """).fetchone()[0]
    half_bin = widest / 255.0 / 2.0
    for r in rows:
        assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"], r
        assert r["max_abs_err"] <= half_bin + 1e-9, (r, half_bin)


def test_robots_failure_policy_spec_table(spark):
    """RFC 9309 2.3.1 semantics: 2xx parses, plain 4xx allows all, 429
    and 5xx deny (or reuse a fresh cache); all four policies occur at
    fixture scale."""
    from grabspark.ops.relational import robots_failure_policy

    rows = robots_failure_policy(spark, SF).collect()
    seen = set()
    for r in rows:
        seen.add(r["policy"])
        if r["status"] == 200:
            assert r["policy"] == "parse_rules"
        elif r["status"] in (403, 404):
            assert r["policy"] == "allow_all"
        else:  # 429 / 5xx
            assert r["policy"] in ("use_cached", "deny_all")
            assert (r["policy"] == "use_cached") == (r["cache_age_h"] < 24), r
    assert seen == {"parse_rules", "allow_all", "use_cached", "deny_all"}, seen


def test_blockiness_separates_planted_tiles(spark):
    """Every '#blocky' tile-averaged twin is flagged; no PRNG original
    is; blocky twins' interior gradient collapses far below the
    boundary gradient while originals are balanced."""
    from grabspark.ops.images import image_blockiness_detect

    rows = {r["image_id"]: r for r in image_blockiness_detect(spark, SF).collect()}
    blocky = [k for k in rows if k.endswith("#blocky")]
    assert blocky
    for k, r in rows.items():
        assert r["is_blocky"] == k.endswith("#blocky"), k
        if not k.endswith("#blocky") and r["n_boundary"] > 0:
            # PRNG balance: per-column means within 2x of each other
            assert (
                r["boundary_sum"] * r["n_interior"]
                < 2 * r["interior_sum"] * r["n_boundary"]
            ), k


def test_prefix_dim_recall_consistency(spark):
    """The audit's bookkeeping is self-consistent (recall = hits*10,
    0 <= hits <= k) and its full-dimension side reproduces
    ann_cosine_topk's exact answer."""
    from grabspark.ops.similarity import ann_cosine_topk, ann_prefix_dim_recall

    (r,) = ann_prefix_dim_recall(spark, SF).collect()
    assert 0 <= r["hits"] <= r["k"] == 10
    assert r["recall_pct"] == r["hits"] * 10
    assert len(ann_cosine_topk(spark, SF).collect()) == 10


def test_bloom_sizing_plan_hits_target_fpp(spark):
    """Provisioning contract: m_bits is a power of two at least the
    optimal size, k >= 1, and the expected fpp at the chosen (m, k) is
    at or below the 1% target (power-of-two rounding only ever
    over-provisions)."""
    import math

    from grabspark.ops.relational import _BLOOM_TARGET_FPP, bloom_sizing_plan

    rows = bloom_sizing_plan(spark, SF).collect()
    assert rows
    for r in rows:
        m, n, k = r["m_bits"], r["n_keys"], r["k_hashes"]
        assert m & (m - 1) == 0 and m > 0, r
        m_opt = math.ceil(-n * math.log(_BLOOM_TARGET_FPP) / math.log(2) ** 2)
        assert m >= m_opt, r
        assert k >= 1
        assert r["expected_fpp"] <= _BLOOM_TARGET_FPP + 1e-9, r


def test_resize_plan_contract_and_no_decode(spark):
    """Plan math: never upscale, both target edges multiples of 8,
    scaled edge fits the 32 cap after alignment slack; the physical
    scan prunes the binary column (metadata-only planning)."""
    from grabspark.ops.images import _RESIZE_MAX, image_resize_plan

    df = image_resize_plan(spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["target_w"] % 8 == 0 and r["target_h"] % 8 == 0, r
        assert r["scale_bp"] <= 10000
        assert r["needs_resize"] == (max(r["w"], r["h"]) > _RESIZE_MAX)
        if r["needs_resize"]:
            # ceil-to-8 adds at most 7 px over the scaled edge
            assert max(r["target_w"], r["target_h"]) <= _RESIZE_MAX + 7, r
        else:
            assert (r["target_w"], r["target_h"]) == (
                (r["w"] + 7) // 8 * 8, (r["h"] + 7) // 8 * 8
            )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "bytes" not in scan_schema, scan_schema


def test_containment_verify_discriminates_mutations(spark):
    """Every true snippet (doc_id % 14 != 0) is found contained in its
    source; every mutated snippet (one char flipped) reaches the
    candidate stage (shares grams) but is REJECTED by the exact verify
    — the case candidate-generation alone gets wrong."""
    from grabspark.ops.dedup import containment_dedup

    rows = containment_dedup(spark, SF).collect()
    own = {
        r["snip_id"]: r for r in rows if r["snip_id"] == "s" + str(r["doc_id"])
    }
    assert own
    truths = mutants = 0
    for sid, r in own.items():
        doc_id = int(sid[1:])
        if doc_id % 14 == 0:
            assert not r["contained"], r
            mutants += 1
        else:
            assert r["contained"], r
            truths += 1
    assert truths and mutants


def test_source_similarity_matrix_properties(spark):
    """All 190 source pairs present exactly once (a < b), cosine in
    (0, 1], and the matrix is non-degenerate (similarities vary)."""
    from grabspark.ops.textstats import source_similarity

    rows = source_similarity(spark, SF).collect()
    pairs = {(r["source_a"], r["source_b"]) for r in rows}
    assert len(pairs) == len(rows) == 190  # C(20, 2)
    for a, b in pairs:
        assert a < b
    sims = [r["cos_sim"] for r in rows]
    assert all(0.0 < s <= 1.0 for s in sims)
    assert max(sims) - min(sims) > 0.001, "degenerate similarity matrix"


def test_adaptive_crawl_delay_matches_sequential_simulation(spark):
    """Re-derive the per-host decayed latency mean with a literal pandas
    walk (sort by ts, take the tail, explicit 3^j weight loop) — no
    window functions, no SQL — and require exact integer equality."""
    import pandas as pd

    from grabspark.ops.relational import _ACD_K, adaptive_crawl_delay

    rows = {r["host"]: r for r in adaptive_crawl_delay(spark, SF).collect()}
    ev = pd.read_parquet(os.path.join(SF, "events.parquet"),
                         columns=["event_id", "ts", "user_id"])
    ev["host"] = "h" + (ev["user_id"] % 200).astype(str)
    # reduced-mod form mirrors _ACD_LAT (overflow-free at every sf)
    ev["lat_ms"] = 50 + ((ev["event_id"] % 1950) * 2654435761) % 1950
    assert set(rows) == set(ev["host"].unique())
    for host, grp in ev.groupby("host"):
        tail = grp.sort_values(["ts", "event_id"]).tail(_ACD_K)
        lats = list(tail["lat_ms"])[::-1]  # newest first
        score = sum(int(l) * 3 ** (_ACD_K - 1 - j) for j, l in enumerate(lats))
        norm = sum(3 ** (_ACD_K - 1 - j) for j in range(len(lats)))
        ewma = score // norm
        r = rows[host]
        assert r["k"] == len(lats) and r["ewma_ms"] == ewma, (host, r)
        assert r["last_lat_ms"] == lats[0]
        assert r["crawl_delay_ms"] == max(100, min(5000, ewma * 2))
        want_mode = ("backoff" if lats[0] > 2 * ewma
                     else "speedup" if lats[0] * 2 < ewma else "steady")
        assert r["mode"] == want_mode, (host, r)


def test_phash_band_recall_guarantee_and_planted_radii(spark):
    """The 4x16 pigeonhole guarantee must be EXACT (10000 bp at every
    radius <= 3) and the planted flip twins must populate every audited
    radius 1..8 — otherwise the beyond-guarantee measurements are
    vacuous."""
    from grabspark.ops.images import HAM_MAX, _AUDIT_RADIUS, phash_band_recall

    rows = {r["radius"]: r for r in phash_band_recall(spark, SF).collect()}
    assert set(rows) >= set(range(1, _AUDIT_RADIUS + 1)), sorted(rows)
    for rad, r in rows.items():
        assert r["n_exact"] > 0
        assert r["guaranteed"] == (rad <= HAM_MAX)
        if r["guaranteed"]:
            assert r["recall_bp"] == 10000, r
        assert 0 <= r["n_banded"] <= r["n_exact"]


def test_simhash_band_recall_guarantee_and_planted_radii(spark):
    """Pigeonhole guarantee exact at radius <= 3, every audited radius
    populated by planted twins, caught <= planted."""
    from grabspark.ops.dedup import _HAM_MAX, _SBR_MAXR, simhash_band_recall

    rows = {r["radius"]: r for r in simhash_band_recall(spark, SF).collect()}
    assert set(rows) == set(range(1, _SBR_MAXR + 1)), sorted(rows)
    for rad, r in rows.items():
        assert r["n_planted"] > 0
        assert r["guaranteed"] == (rad <= _HAM_MAX)
        if r["guaranteed"]:
            assert r["recall_bp"] == 10000, r
        assert 0 <= r["n_caught"] <= r["n_planted"]
