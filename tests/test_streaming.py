"""Structured Streaming surface: file-source trace stream, windowed
metrics with watermark, foreachBatch seen/Bloom maintenance, stateful
rate monitor."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from grabspark import streaming
from grabspark.bloom import ShardedBloom
from grabspark.seen import SEEN_SCHEMA
from grabspark.snapshots import SnapshotTable

SCHEMA = StructType(
    [
        StructField("seed_idx", IntegerType()),
        StructField("url_canon", StringType()),
        StructField("fetch_seq", LongType()),
        StructField("round", IntegerType()),
        StructField("host", StringType()),
        StructField("ok", BooleanType()),
        StructField("event_time", TimestampType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _rows(round_no, host, n, base_ts):
    ts = pd.Timestamp(base_ts)
    return [
        (
            0,
            f"http://{host}/p{round_no}_{i}",
            round_no * 100 + i,
            round_no,
            host,
            True,
            (ts + pd.Timedelta(seconds=i)).to_pydatetime(),
        )
        for i in range(n)
    ]


@pytest.fixture()
def trace_dir(spark, tmp_path):
    d = str(tmp_path / "trace_stream")
    _write_batch(spark, d, _rows(0, "a.test", 5, "2024-01-01 00:00:00"))
    _write_batch(spark, d, _rows(1, "b.test", 3, "2024-01-01 00:00:30"))
    return d


def test_windowed_metrics_stream(spark, trace_dir, tmp_path):
    src = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 4).parquet(trace_dir)
    )
    agg = streaming.stream_trace_metrics(src, window="1 minute", watermark="2 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("m1")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.host, str(r.window_start), r.fetches)
        for r in spark.sql("select * from m1").collect()
    }
    assert ("a.test", "2024-01-01 00:00:00", 5) in got
    assert ("b.test", "2024-01-01 00:00:00", 3) in got


def test_foreachbatch_seen_and_bloom(spark, trace_dir, tmp_path):
    seen = SnapshotTable(spark, str(tmp_path / "seen"), SEEN_SCHEMA)
    seen.overwrite(spark.createDataFrame([], SEEN_SCHEMA))
    bloom = ShardedBloom(1 << 14, 5, 8)
    src = spark.readStream.schema(SCHEMA).parquet(trace_dir)
    q = streaming.stream_seen_updates(
        spark, src, seen, bloom, str(tmp_path / "ck2")
    ).start()
    q.awaitTermination(120)
    got = seen.read().count()
    assert got == 8  # 5 + 3 rows across the two batches
    keys = pd.Series([f"0\x1fhttp://a.test/p0_{i}" for i in range(5)])
    assert bloom.contains(keys).all()


def test_stateful_rate_monitor(spark, trace_dir, tmp_path):
    src = spark.readStream.schema(SCHEMA).parquet(trace_dir)
    mon = streaming.host_rate_monitor(src, budget_per_sec=0.5)
    q = (
        mon.writeStream.outputMode("update")
        .format("memory")
        .queryName("rates")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.host: r for r in spark.sql("select * from rates").collect()}
    assert rows["a.test"].fetches == 5
    assert rows["b.test"].fetches == 3
    # a.test: 5 fetches over 4s span = 1.25/s > 0.5 budget
    assert rows["a.test"].over_budget == "True"


def test_stream_image_validation(spark, tmp_path):
    """New store parquet files arrive as micro-batches; every image must
    flow through the batch validate kernel and pass (plus one corrupted
    image that must be caught)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from grabspark import bench_core

    store_dir = str(tmp_path / "imgstream")
    os.makedirs(store_dir)
    # batch 1: 24 clean images (written via the bench generator for the
    # exact input_hint schema), as one file
    tmp1 = str(tmp_path / "gen1")
    bench_core.synth_images_parquet(spark, 24, tmp1, n_files=1)
    t1 = pq.read_table(tmp1)
    pq.write_table(t1, os.path.join(store_dir, "b1.parquet"))
    # batch 2: 8 more, one corrupted (raw fmt -> pixels_ok must be False)
    tmp2 = str(tmp_path / "gen2")
    bench_core.synth_images_parquet(spark, 8, tmp2, n_files=1)
    pdf2 = pq.read_table(tmp2).to_pandas()
    raw_idx = pdf2.index[pdf2["fmt"] == "raw"][0]
    b = bytearray(pdf2.loc[raw_idx, "bytes"])
    b[0] ^= 0xFF
    pdf2.loc[raw_idx, "bytes"] = bytes(b)
    pq.write_table(
        pa.Table.from_pandas(pdf2, schema=pq.read_table(tmp2).schema, preserve_index=False),
        os.path.join(store_dir, "b2.parquet"),
    )

    stream = streaming.read_store_stream(spark, store_dir, max_files=1)
    assert stream.isStreaming
    validated = streaming.stream_validate_images(stream)
    q = (
        validated.writeStream.format("memory")
        .queryName("imgval_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM imgval_stream").toPandas()
    assert len(out) == 32
    assert int(out["pixels_ok"].sum()) == 31  # the corrupted one caught
    bad = out[~out["pixels_ok"]]
    assert list(bad["fmt"]) == ["raw"]
    # qraw images must still clear the lossy PSNR bar
    assert (out[out["fmt"] == "qraw"]["psnr_db"] >= 40.0).all()


def test_seed_inbox_stream_two_chunks(spark, tmp_path):
    """Streaming S1: seed files arrive in two chunks with intra- and
    cross-batch duplicates (raw variants canonicalizing to the same
    URL); the inbox ends deduped on url_canon with a deterministic,
    gap-free ingest_seq, and re-running with no new files appends
    nothing."""
    from grabspark.snapshots import SnapshotTable
    from grabspark.streaming import INBOX_SCHEMA, read_seed_stream, seed_inbox_stream

    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    inbox = SnapshotTable(spark, str(tmp_path / "inbox"), INBOX_SCHEMA)
    inbox.overwrite(spark.createDataFrame([], INBOX_SCHEMA))

    def run():
        q = seed_inbox_stream(
            spark, read_seed_stream(spark, str(seeds_dir)), inbox, ckpt
        ).start()
        q.awaitTermination(120)

    (seeds_dir / "a.txt").write_text(
        "http://h1.test/x\nhttp://h1.test/x/\nhttp://h2.test/y\n\n"
    )
    run()
    rows1 = {
        (r.ingest_seq, r.url_canon, r.host)
        for r in inbox.read().collect()
    }
    assert rows1 == {
        (0, "http://h1.test/x", "h1.test"),
        (1, "http://h2.test/y", "h2.test"),
    }
    # chunk 2: one cross-batch dup (h1/x again, new raw form) + one new
    (seeds_dir / "b.txt").write_text("http://h1.test/x//\nhttp://h3.test/z\n")
    run()
    rows2 = sorted(
        (r.ingest_seq, r.url_canon) for r in inbox.read().collect()
    )
    assert rows2 == [
        (0, "http://h1.test/x"),
        (1, "http://h2.test/y"),
        (2, "http://h3.test/z"),
    ]
    # idempotent re-run: no new files -> no new rows
    run()
    assert inbox.row_count() == 3


def test_enqueue_seeds_from_inbox(spark, tmp_path):
    """enqueue_seeds ≙ a second POST /api/crawl: the trace of crawl(A)
    then enqueue(B) equals one crawl seeded A+B (per-seed seen reset —
    B re-crawls URLs A already fetched, under its own seed_idx)."""
    from grabspark import synth
    from grabspark.config import EngineConfig
    from grabspark.engine import CrawlEngine
    from tests import oracle

    spec = synth.StoreSpec(n_hosts=3, pages_per_host=6, out_degree=3, seed=5)
    store = synth.build_store(spec)
    sp = str(tmp_path / "store.parquet")
    synth.write_store_parquet(store, sp)
    all_seeds = synth.default_seeds(spec)
    a, b = all_seeds[:2], all_seeds[2:] + [all_seeds[0]]  # b re-crawls a[0]

    eng = CrawlEngine(spark, EngineConfig(run_dir=str(tmp_path / "run"), store_path=sp))
    eng.start(a)
    eng.enqueue_seeds(b)

    golden = oracle.crawl(store.by_id, a + b)
    got = [
        (r.seed_idx, r.fetch_seq, r.url, r.url_canon, r.host, r.ok)
        for r in eng.trace_df()
        .orderBy("seed_idx", "fetch_seq")
        .select("seed_idx", "fetch_seq", "url", "url_canon", "host", "ok")
        .collect()
    ]
    assert got == [tuple(t) for t in golden.trace]
    seen_got = {
        (r.seed_idx, r.url_canon)
        for r in eng.seen_df().select("seed_idx", "url_canon").collect()
    }
    assert seen_got == golden.seen


def test_seed_dedup_stream_watermark_semantics(spark, tmp_path):
    """dropDuplicatesWithinWatermark contract: duplicates inside the
    watermark window collapse to one emission; after the key's state
    expires (watermark passed ts + delay), a re-arrival is re-emitted.
    Files trigger one micro-batch each so the watermark advances
    between arrivals."""
    import os
    import time

    from grabspark.streaming import read_seed_stream, seed_dedup_stream

    seeds_dir = tmp_path / "seeds"
    seeds_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, lines):
        p = seeds_dir / name
        tmp = seeds_dir / (name + ".tmp")
        tmp.write_text("\n".join(lines) + "\n")
        os.rename(tmp, p)

    # t0 batch: A twice (same canon: trailing slash variant), B once
    write("f1.txt", [
        "2024-01-01 00:00:00|http://a.test/x",
        "2024-01-01 00:00:00|http://a.test/x/",
        "2024-01-01 00:00:10|http://b.test/y",
    ])

    stream = seed_dedup_stream(read_seed_stream(spark, str(seeds_dir), max_files=1))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_seeds")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # within-watermark duplicate of A at t0+1min -> dropped; C new
        write("f2.txt", [
            "2024-01-01 00:01:00|http://a.test/x",
            "2024-01-01 00:01:00|http://c.test/z",
        ])
        q.processAllAvailable()
        # t0+60min: watermark (max_ts - 10min) passes A's expiry -> state
        # evicted -> the same URL is re-emitted
        write("f3.txt", ["2024-01-01 01:00:00|http://a.test/x"])
        q.processAllAvailable()
        write("f4.txt", ["2024-01-01 01:30:00|http://a.test/x"])
        q.processAllAvailable()
    finally:
        q.stop()
    got = [
        (str(r["ts"]), r["url_canon"])
        for r in spark.sql("SELECT * FROM dedup_seeds").collect()
    ]
    canon_a = "http://a.test/x"
    emits_a = [g for g in got if g[1] == canon_a]
    urls = {g[1] for g in got}
    assert urls == {canon_a, "http://b.test/y", "http://c.test/z"}, got
    # A: one emission from the first window, one after expiry; the
    # within-window duplicates (f1 slash variant, f2 re-arrival) dropped
    assert len(emits_a) == 2, got
    assert len(got) == 4, got
