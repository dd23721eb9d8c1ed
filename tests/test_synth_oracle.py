"""Synthetic store sanity + oracle crawl behavior (golden-trace producer)."""

import numpy as np

import tests.oracle as oracle
from grabspark import imaging, synth, urlkit


def small_spec(**kw):
    defaults = dict(n_hosts=3, pages_per_host=8, out_degree=4, seed=42)
    defaults.update(kw)
    return synth.StoreSpec(**defaults)


def test_store_deterministic():
    a = synth.build_store(small_spec()).pdf
    b = synth.build_store(small_spec()).pdf
    assert a.equals(b)
    c = synth.build_store(small_spec(seed=7)).pdf
    assert not a["caption"].equals(c["caption"])


def test_store_schema_matches_input_hint():
    pdf = synth.build_store(small_spec()).pdf
    assert list(pdf.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert pdf["w"].dtype == np.int32 and pdf["h"].dtype == np.int32
    assert pdf["phash"].dtype == np.int64
    assert set(pdf["fmt"]) == {"raw", "qraw"}
    # image_id is canonical: canon_ref is the identity on it
    assert all(urlkit.canon_ref(i) == i for i in pdf["image_id"])
    # bytes decode against independently recomputed reference pixels
    for r in pdf.itertuples(index=False):
        ref = imaging.pixels_from_id(r.image_id, r.w, r.h)
        dec = imaging.decode_image(r.bytes, r.w, r.h, r.fmt)
        if r.fmt == "raw":
            assert np.array_equal(ref, dec)
        else:
            assert imaging.psnr(ref, dec) >= imaging.PSNR_LOSSY_MIN_DB
        assert imaging.phash64(dec) == r.phash


def test_oracle_crawl_basics():
    store = synth.build_store(small_spec())
    seeds = synth.default_seeds(store.spec)
    res = oracle.crawl(store.by_id, seeds)
    # per-seed traces start at seq 0 and are contiguous
    by_seed = {}
    for seed_idx, seq, url, canon, host, ok in res.trace:
        by_seed.setdefault(seed_idx, []).append(seq)
    for seed_idx, seqs in by_seed.items():
        assert seqs == list(range(len(seqs)))
    # duplicate seed (idx 0 vs its repeat) produces the identical sub-trace
    seeds_list = seeds
    dup_pairs = [
        (i, j)
        for i in range(len(seeds_list))
        for j in range(i + 1, len(seeds_list))
        if seeds_list[i] == seeds_list[j]
    ]
    assert dup_pairs, "fixture should include a duplicate seed"
    i, j = dup_pairs[0]
    t_i = [(u, c, h, ok) for s, q, u, c, h, ok in res.trace if s == i]
    t_j = [(u, c, h, ok) for s, q, u, c, h, ok in res.trace if s == j]
    assert t_i == t_j, "fresh per-seed seen set => identical re-crawl"
    # same-host discipline: every OK fetch stays on the seed's host
    # (cross-host/case-variant links were filtered)
    for seed_idx, seq, url, canon, host, ok in res.trace:
        if seq == 0:
            seed_host = host
        else:
            assert host == seed_host
    # no canon appears twice within one seed's trace
    for s in by_seed:
        canons = [c for si, q, u, c, h, ok in res.trace if si == s]
        assert len(canons) == len(set(canons))
    # failure rows exist (missing seed) and contribute no pages
    fail_rows = [t for t in res.trace if not t[5]]
    assert fail_rows
    page_urls = {p[2] for p in res.pages}
    assert all(t[2] not in page_urls or t[5] for t in res.trace)
    # seen set == set of trace canons per seed (mark-before-fetch incl. failures)
    trace_seen = {(s, c) for s, q, u, c, h, ok in res.trace}
    assert trace_seen == res.seen


def test_oracle_reaches_whole_host():
    """The ring link guarantees every page of the seed host is fetched."""
    spec = small_spec(p_frag=0.0, p_case=0.0)
    store = synth.build_store(spec)
    res = oracle.crawl(store.by_id, [f"http://{spec.host(0)}/p0"])
    ok_targets = {oracle.fetch_target(t[2]) for t in res.trace if t[5]}
    host0_ids = {i for i in store.by_id if "host0" in i}
    assert host0_ids <= ok_targets


def test_oracle_content_cleanup():
    store = synth.build_store(small_spec())
    res = oracle.crawl(store.by_id, [f"http://host0.test/p0"])
    for seed_idx, seq, url, title, content in res.pages:
        assert "\n" not in content and "\t" not in content
        assert "  " not in content
        assert title.startswith("Page ")
