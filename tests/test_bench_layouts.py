"""Hashed seen-key layout (VERDICT r3 task 2): the bench anti-join
probes an 8-byte xxhash64 key instead of the URL string, shrinking the
per-round seen-table scan ~7x.  These tests pin (a) result equivalence
with the exact string layout, and (b) the plan properties the byte
claim rests on: the seen scan reads ONLY (seed_idx, key_hash) — never
the retained url_canon audit column — and the round still shuffles the
candidate stream exactly once."""

import re

import pytest
from pyspark.sql import functions as F

from grabspark import bench_core

N = 40_000
N_HOSTS = 64


def _prep(spark, tmp_path, hashed: bool):
    tag = "h" if hashed else "s"
    name = f"seen_layout_{tag}"
    path = str(tmp_path / f"seen_{tag}")
    df = (
        bench_core.synth_seen_hash_df(spark, N, N, N_HOSTS)
        if hashed
        else bench_core.synth_seen_df(spark, N, N, N_HOSTS)
    )
    keys = ["key_hash"] if hashed else ["url_canon"]
    bench_core.write_bucketed(df, name, path, keys)
    return f"table:{name}"


@pytest.fixture()
def no_broadcast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    yield
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_hashed_layout_schedules_identical_rows(spark, tmp_path, no_broadcast):
    """Same synthetic round, both layouts (seen AND store hashed), with
    the inline Bloom and the fetch lookup join: the scheduled set must
    be IDENTICAL (64-bit collisions are the only divergence mode; none
    occur at any bench scale)."""
    seen_s = _prep(spark, tmp_path, hashed=False)
    seen_h = _prep(spark, tmp_path, hashed=True)
    bench_core.write_bucketed(
        bench_core.synth_store_df(spark, N // 2, N, N_HOSTS),
        "store_layout_s", str(tmp_path / "st_s"), ["image_id"],
    )
    bench_core.write_bucketed(
        bench_core.synth_store_hash_df(spark, N // 2, N, N_HOSTS),
        "store_layout_h", str(tmp_path / "st_h"), ["fkey_hash"],
    )
    bl_s = bench_core.build_seen_bloom(spark, seen_s, n_bits=1 << 20, n_shards=4)
    bl_h = bench_core.build_seen_bloom(spark, seen_h, n_bits=1 << 20, n_shards=4)
    r_s = bench_core.run_frontier_round(
        spark, N, seen_s, "table:store_layout_s", bl_s, n_hosts=N_HOSTS
    )
    r_h = bench_core.run_frontier_round(
        spark, N, seen_h, "table:store_layout_h", bl_h, n_hosts=N_HOSTS
    )
    assert r_s.scheduled == r_h.scheduled > 0
    for name in ("seen_layout_s", "seen_layout_h", "store_layout_s", "store_layout_h"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_hashed_layout_plan_prunes_string_and_keeps_one_exchange(
    spark, tmp_path, no_broadcast
):
    """The plan evidence for the byte claim: the bucketed seen scan's
    ReadSchema carries only (seed_idx, key_hash) — url_canon stays in
    the files but never crosses the bus — and the candidate stream still
    moves through exactly ONE exchange (dedupe + anti-join share the
    key_hash partitioning)."""
    from grabspark import udfs

    seen_h = _prep(spark, tmp_path, hashed=True)
    seen = spark.table(seen_h[len("table:"):]).select("seed_idx", "key_hash")
    cand = (
        bench_core.synth_candidates(spark, 1000, 16)
        .withColumn("_p", udfs.url_parts_udf(F.col("url")))
        .select("*", "_p.url_canon", "_p.host", "_p.fetch_key")
        .drop("_p")
        .withColumn("key_hash", F.xxhash64("url_canon"))
        .repartition(bench_core.N_BUCKETS, "key_hash")
    )
    other = [c for c in cand.columns if c not in ("seed_idx", "url_canon", "key_hash")]
    deduped = (
        cand.groupBy("seed_idx", "key_hash", "url_canon")
        .agg(F.min_by(F.struct(*other), F.struct("parent_seq", "link_idx")).alias("_r"))
        .select("seed_idx", "key_hash", "url_canon", "_r.*")
    )
    j = deduped.join(seen, ["seed_idx", "key_hash"], "left_anti")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    p = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "Bucketed: true" in p
    seen_scans = [
        m.group(1)
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p)
        if "key_hash" in m.group(1)
    ]
    assert seen_scans, p
    for schema in seen_scans:
        assert "url_canon" not in schema, schema
    spark.sql("DROP TABLE IF EXISTS seen_layout_h")
