"""J2 Bloom: no false negatives ever, bounded false positives, merge
associativity, persistence round-trip, distributed build equivalence."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grabspark.bloom import ShardedBloom, build_partials, merge_partials_into


@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=300, unique=True))
@settings(max_examples=50, deadline=None)
def test_no_false_negatives(keys):
    bl = ShardedBloom(n_bits=1 << 14, n_hashes=5, n_shards=8)
    bl.add(pd.Series(keys))
    assert bl.contains(pd.Series(keys)).all()


def test_false_positive_rate_bounded():
    bl = ShardedBloom(n_bits=1 << 17, n_hashes=7, n_shards=16)
    inserted = [f"key-{i}" for i in range(10_000)]
    bl.add(pd.Series(inserted))
    probe = pd.Series([f"other-{i}" for i in range(20_000)])
    fp = bl.contains(probe).mean()
    # theoretical ~ (1 - e^{-kn/m})^k ≈ 0.9% for n=10k, m=128k bits, k=7
    assert fp < 0.05, fp


def test_merge_equals_bulk_add():
    a = ShardedBloom(n_bits=1 << 12, n_hashes=4, n_shards=4)
    b = ShardedBloom(n_bits=1 << 12, n_hashes=4, n_shards=4)
    both = ShardedBloom(n_bits=1 << 12, n_hashes=4, n_shards=4)
    k1 = [f"a{i}" for i in range(100)]
    k2 = [f"b{i}" for i in range(100)]
    a.add(pd.Series(k1))
    b.add(pd.Series(k2))
    both.add(pd.Series(k1 + k2))
    a.or_merge(b)
    assert np.array_equal(a._bits, both._bits)


def test_save_load_roundtrip(tmp_path):
    bl = ShardedBloom(n_bits=1 << 12, n_hashes=4, n_shards=4)
    bl.add(pd.Series([f"k{i}" for i in range(50)]))
    bl.save(str(tmp_path / "b"))
    got = ShardedBloom.load(str(tmp_path / "b"))
    assert np.array_equal(bl._bits, got._bits)
    assert (got.n_bits, got.n_hashes, got.n_shards) == (bl.n_bits, bl.n_hashes, bl.n_shards)


def test_distributed_build_matches_local(spark):
    keys = [f"url-{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(6)
    partials = build_partials(df, "k", 1 << 14, 5, 8).collect()
    dist = ShardedBloom(1 << 14, 5, 8)
    merge_partials_into(dist, partials)
    local = ShardedBloom(1 << 14, 5, 8)
    local.add(pd.Series(keys))
    assert np.array_equal(dist._bits, local._bits)


def test_contains_speed():
    """The membership probe must stay vectorized: 500k keys in well under
    a second of driver time (regression guard for the per-shard loop)."""
    import time

    bl = ShardedBloom(n_bits=1 << 22, n_hashes=7, n_shards=64)
    bl.add(pd.Series([f"k{i}" for i in range(50_000)]))
    probe = pd.Series([f"p{i}" for i in range(500_000)])
    # warm-up absorbs sandbox CPU-throttle ramp (first numpy burst after
    # idle can be ~100x slower than steady state on this box)
    bl.contains(probe.head(10_000))
    # best-of-3: hypervisor-steal bursts on this box can stall ANY python
    # for minutes (one full-suite run measured 178s for this probe, then
    # 0.3s in isolation); the regression this guards — a per-shard python
    # loop — is slow on EVERY attempt, so the minimum is the honest signal
    best = min(_timed_contains(bl, probe) for _ in range(3))
    # steady-state ~0.3s; the per-shard loop this guards against took ~17s
    assert best < 8.0


def _timed_contains(bl, probe):
    import time

    t0 = time.time()
    bl.contains(probe)
    return time.time() - t0


# -- partitioned mode (J2 scale path) ----------------------------------------


def test_partitioned_no_false_negatives_and_probe(spark, tmp_path):
    """Every inserted key must probe true through the shard-co-partitioned
    path; un-inserted keys mostly probe false (advisory prefilter)."""
    from pyspark.sql import functions as F

    from grabspark.bloom import PartitionedBloom, partitioned_prefilter

    pb = PartitionedBloom(str(tmp_path / "pb"), n_bits=1 << 14, n_hashes=5, n_shards=8)
    pb.create()
    ins = spark.createDataFrame([(f"k{i}",) for i in range(1500)], ["k"]).repartition(6)
    v1 = pb.update(ins, "k")
    assert v1 == 1 and len(pb.shard_files()) > 0

    probe = spark.createDataFrame(
        [(f"k{i}",) for i in range(1500)] + [(f"x{i}",) for i in range(1500)], ["k"]
    )
    out = partitioned_prefilter(probe, F.col("k"), pb, spark, out_col="maybe")
    rows = {r.k: r.maybe for r in out.collect()}
    assert all(rows[f"k{i}"] for i in range(1500)), "false negative!"
    fp = sum(1 for i in range(1500) if rows[f"x{i}"]) / 1500
    assert fp < 0.2


def test_partitioned_incremental_update_and_rollback(spark, tmp_path):
    from pyspark.sql import functions as F

    from grabspark.bloom import PartitionedBloom, partitioned_prefilter

    pb = PartitionedBloom(str(tmp_path / "pb2"), n_bits=1 << 14, n_hashes=5, n_shards=8)
    pb.create()
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], ["k"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], ["k"])
    v1 = pb.update(a, "k")
    v2 = pb.update(b, "k")
    assert (v1, v2) == (1, 2)

    probe = spark.createDataFrame([("a0",), ("b0",)], ["k"])
    out = {r.k: r.m for r in partitioned_prefilter(probe, F.col("k"), pb, spark, "m").collect()}
    assert out == {"a0": True, "b0": True}

    # rollback to v1: b-keys may flip back to definitely-not-seen
    pb.rollback(v1)
    out1 = {r.k: r.m for r in partitioned_prefilter(probe, F.col("k"), pb, spark, "m").collect()}
    assert out1["a0"] is True

    pb2 = PartitionedBloom.load(str(tmp_path / "pb2"))
    assert (pb2.n_bits, pb2.n_hashes, pb2.n_shards) == (1 << 14, 5, 8)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    keys=st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=200, unique=True),
    n_shards=st.sampled_from([4, 8, 16]),
)
def test_partitioned_shard_math_no_false_negatives(keys, n_shards):
    """Property: keys routed to their shard and inserted into that
    shard's local bitmap ALWAYS probe true through the same math the
    executor-side build/probe kernels use (pure numpy, no Spark)."""
    from grabspark.bloom import _shard_positions, shard_of

    shard_bits = 1 << 12
    ser = pd.Series(keys)
    shards = shard_of(ser, n_shards)
    pos = _shard_positions(ser, 5, shard_bits)
    bitmaps = {s: np.zeros(shard_bits // 8, dtype=np.uint8) for s in range(n_shards)}
    for s in np.unique(shards):
        mask = shards == s
        p = pos[:, mask].ravel()
        np.bitwise_or.at(
            bitmaps[int(s)],
            (p >> np.uint64(3)).astype(np.int64),
            (1 << (p & np.uint64(7))).astype(np.uint8),
        )
    # probe: every inserted key hits in its own shard
    for i, k in enumerate(keys):
        s = int(shards[i])
        pk = pos[:, i]
        hit = all(
            bitmaps[s][int(q) >> 3] & (1 << (int(q) & 7)) for q in pk
        )
        assert hit, k
    # shard routing is deterministic across calls
    assert np.array_equal(shard_of(ser, n_shards), shards)


# -- saturation accounting (est_fpp / bloom_bits_for) -------------------------


def test_insert_count_tracks_adds_and_merge():
    a = ShardedBloom(n_bits=1 << 12, n_hashes=4, n_shards=4)
    b = ShardedBloom(n_bits=1 << 12, n_hashes=4, n_shards=4)
    a.add(pd.Series([f"a{i}" for i in range(100)]))
    b.add(pd.Series([f"b{i}" for i in range(40)]))
    a.or_merge(b)
    assert a.n_inserted == 140


def test_insert_count_survives_save_load(tmp_path):
    bl = ShardedBloom(n_bits=1 << 12, n_hashes=4, n_shards=4)
    bl.add(pd.Series([f"k{i}" for i in range(77)]))
    bl.save(str(tmp_path / "b"))
    got = ShardedBloom.load(str(tmp_path / "b"))
    assert got.n_inserted == 77
    assert got.est_fpp() == bl.est_fpp()


def test_est_fpp_brackets_measured_rate():
    bl = ShardedBloom(n_bits=1 << 17, n_hashes=7, n_shards=16)
    bl.add(pd.Series([f"key-{i}" for i in range(10_000)]))
    measured = bl.contains(pd.Series([f"other-{i}" for i in range(40_000)])).mean()
    est = bl.est_fpp()
    # analytic model within small-constant agreement of the measured rate
    assert measured / 3 <= est <= max(3 * measured, 0.02), (est, measured)


def test_est_fpp_saturates_to_one():
    bl = ShardedBloom(n_bits=1 << 10, n_hashes=7, n_shards=8)
    bl.add(pd.Series([f"k{i}" for i in range(5000)]))
    assert bl.est_fpp() > 0.99
    # and the filter really is useless now: ~every fresh key "hits"
    assert bl.contains(pd.Series([f"z{i}" for i in range(2000)])).mean() > 0.9


def test_distributed_build_carries_insert_count(spark):
    keys = [f"url-{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(6)
    partials = build_partials(df, "k", 1 << 14, 5, 8).collect()
    dist = ShardedBloom(1 << 14, 5, 8)
    merge_partials_into(dist, partials)
    assert dist.n_inserted == 2000


def test_bloom_bits_for_sizing():
    from grabspark.bloom import bloom_bits_for

    assert bloom_bits_for(16_000_000) == 1 << 28
    assert bloom_bits_for(64_000_000) == 1 << 30
    assert bloom_bits_for(10) == 1 << 20  # floor
    # sized filters stay useful: est fpp ~1% at the design load
    from grabspark.bloom import est_bloom_fpp

    assert est_bloom_fpp(64_000_000, bloom_bits_for(64_000_000), 7) < 0.02


def test_partitioned_insert_count_and_rollback(spark, tmp_path):
    from grabspark.bloom import PartitionedBloom

    pb = PartitionedBloom(str(tmp_path / "pb"), n_bits=1 << 14, n_hashes=5, n_shards=8)
    pb.create()
    df1 = spark.createDataFrame([(f"k{i}",) for i in range(100)], ["k"])
    v1 = pb.update(df1, "k")
    assert pb.n_inserted == 100
    df2 = spark.createDataFrame([(f"m{i}",) for i in range(50)], ["k"])
    pb.update(df2, "k")
    assert pb.n_inserted == 150
    assert pb.est_fpp() > 0.0
    pb.rollback(v1)
    assert pb.n_inserted == 100


def test_reduce_partials_matches_direct_merge(spark):
    """Executor-side per-shard OR-merge must produce the identical filter
    as collecting raw partials: same bitmaps, same key count."""
    from grabspark.bloom import reduce_partials

    df = spark.createDataFrame([(f"k{i}",) for i in range(500)], "k string").repartition(7)
    raw = build_partials(df, "k", 1 << 14, 5, 8)
    direct = ShardedBloom(1 << 14, 5, 8)
    merge_partials_into(direct, raw.collect())
    reduced = ShardedBloom(1 << 14, 5, 8)
    rows = reduce_partials(raw).collect()
    assert len(rows) == 8  # one row per shard
    merge_partials_into(reduced, rows)
    assert reduced.n_inserted == direct.n_inserted
    assert all(
        (a == b).all() for a, b in zip(reduced.shards, direct.shards)
    )
