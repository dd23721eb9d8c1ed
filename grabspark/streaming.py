"""Structured Streaming surface: live crawl telemetry + incremental seen
maintenance.

The reference has no streaming (its "stream" is a synchronous HTTP
handler blocking until the crawl ends, handlers/crawl.go:47-55).  At
100 TB scale the crawl's trace/metrics stream is itself big data, so the
engine exposes its tables as streams:

* ``stream_trace_metrics`` — readStream over the trace table's data
  directory (new round batches arrive as new parquet files), tumbling-
  window per-host fetch counters with a watermark for late batches.
  The same logical plan as ops.relational.event_window_agg's batch shape.
* ``stream_seen_updates`` — foreachBatch sink that appends newly-seen
  keys into a SnapshotTable and folds them into a ShardedBloom — the
  streaming form of the engine's per-round seen/Bloom maintenance.
* ``host_rate_monitor`` — stateful per-host fetch-rate tracking with
  ``applyInPandasWithState`` (politeness enforcement as a streaming
  operator: emits hosts whose rate exceeds their crawl-delay budget).
* ``stream_validate_images`` — incremental X4/X5 image validation: new
  store parquet files arrive as micro-batches and flow through the SAME
  Arrow validate kernel the batch engine uses (udfs.validate_images).
* ``seed_dedup_stream`` — native stateful dedup of timestamped seeds
  (``dropDuplicatesWithinWatermark``): bounded state, watermark-expired
  keys re-emit by design; the at-scale complement to the inbox anti-join.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def trace_stream_schema() -> StructType:
    """Stream schema derived from the engine's real trace table
    (fetch.TRACE_SCHEMA — so ``ok`` is BooleanType, matching the parquet
    the engine writes), plus ``event_time``.  The trace table itself has
    no event-time column (rounds are logical time); supply one when
    streaming engine data, e.g. a per-batch ingestion timestamp column
    written by the producer, or map ``round`` to a synthetic timestamp —
    the tests derive it from ``ts`` fixtures the same way."""
    from .fetch import TRACE_SCHEMA

    keep = {"seed_idx", "fetch_seq", "round", "host", "ok"}
    fields = [f for f in TRACE_SCHEMA.fields if f.name in keep]
    return StructType(fields + [StructField("event_time", TimestampType())])


TRACE_STREAM_SCHEMA = trace_stream_schema()


def read_trace_stream(spark: SparkSession, trace_data_dir: str, schema: StructType) -> DataFrame:
    """File-source stream over a trace data directory (each engine round
    appends new parquet files => new micro-batch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(os.path.join(trace_data_dir, "*"))
    )


def stream_trace_metrics(trace_stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes") -> DataFrame:
    """Per-host tumbling-window fetch counters with late-data watermark."""
    return (
        trace_stream.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col("host"))
        .agg(
            F.count("*").alias("fetches"),
            F.sum(F.col("ok").cast("long")).alias("fetched_ok"),
        )
        .select(F.col("win.start").alias("window_start"), "host", "fetches", "fetched_ok")
    )


def stream_seen_updates(
    spark: SparkSession,
    trace_stream: DataFrame,
    seen_table,
    bloom,
    checkpoint_dir: str,
):
    """foreachBatch sink: append newly-seen keys to the snapshot table and
    fold them into the Bloom filter — streaming seen/Bloom maintenance."""
    from .bloom import build_partials, merge_partials_into

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.select("seed_idx", "url_canon", "fetch_seq", "round")
        seen_table.append(
            new.withColumnRenamed("fetch_seq", "first_seq"), meta={"stream_batch": batch_id}
        )
        key = F.concat_ws("\x1f", F.col("seed_idx").cast("string"), F.col("url_canon"))
        partials = build_partials(
            new.withColumn("_bk", key), "_bk", bloom.n_bits, bloom.n_hashes, bloom.n_shards
        ).collect()
        merge_partials_into(bloom, partials)

    return (
        trace_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


RATE_STATE_SCHEMA = StructType(
    [StructField("fetches", LongType()), StructField("first_us", LongType()), StructField("last_us", LongType())]
)
RATE_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("fetches", LongType()),
        StructField("window_sec", DoubleType()),
        StructField("rate_per_sec", DoubleType()),
        StructField("over_budget", StringType()),
    ]
)


def make_rate_monitor(budget_per_sec: float, state_ttl_ms: int = 600_000):
    """Stateful per-host rate tracker (applyInPandasWithState kernel).
    State carries a processing-time TTL: a host quiet for ``state_ttl_ms``
    is evicted, so state is bounded by the active-host working set
    instead of growing with every host ever fetched."""

    def fn(key, pdfs, state: GroupState):
        host = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        fetches, first_us, last_us = (
            state.get if state.exists else (0, None, None)
        )
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["event_time"]).astype("int64") // 1000
            fetches += len(pdf)
            lo, hi = int(ts.min()), int(ts.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((fetches, first_us, last_us))
        state.setTimeoutDuration(state_ttl_ms)
        span = max((last_us - first_us) / 1e6, 1e-6)
        rate = fetches / span if fetches > 1 else float(fetches)
        yield pd.DataFrame(
            {
                "host": [host],
                "fetches": [fetches],
                "window_sec": [span],
                "rate_per_sec": [rate],
                "over_budget": [str(rate > budget_per_sec)],
            }
        )

    return fn


def host_rate_monitor(trace_stream: DataFrame, budget_per_sec: float) -> DataFrame:
    return (
        trace_stream.withWatermark("event_time", "2 minutes")
        .groupBy("host")
        .applyInPandasWithState(
            make_rate_monitor(budget_per_sec),
            outputStructType=RATE_OUT_SCHEMA,
            stateStructType=RATE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming image validation (the image axis as a stream)
#
# A crawl's fetched store grows file-by-file; validating ONLY the new
# files per micro-batch is the streaming form of the engine's X4/X5
# fetch-time validation.  The kernel is the same udfs.validate_images
# the batch engine runs — mapInPandas composes with readStream, so the
# whole validation pipeline is incremental with zero code divergence
# between batch and streaming.
# ---------------------------------------------------------------------------

STORE_STREAM_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

VALIDATION_STREAM_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("fmt", StringType()),
        StructField("psnr_db", DoubleType()),
        StructField("pixels_ok", BooleanType()),
        StructField("phash_ok", BooleanType()),
        StructField("bytes_len", IntegerType()),
    ]
)


def read_store_stream(spark: SparkSession, store_dir: str, max_files: int = 8) -> DataFrame:
    """File-source stream over an image+caption store directory (each
    fetched/committed parquet file arrives as part of a micro-batch)."""
    return (
        spark.readStream.schema(STORE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(store_dir)
    )


def stream_validate_images(store_stream: DataFrame) -> DataFrame:
    """Per-image validation rows (append-mode compatible: no aggregate)
    via the engine's batch kernel — decode, PSNR/allclose, phash."""
    from . import udfs

    cols = [f.name for f in VALIDATION_STREAM_SCHEMA.fields]
    j = store_stream.withColumn("phash_str", F.col("phash").cast("string")).drop("phash")
    return j.mapInPandas(lambda it: udfs.validate_images(it, cols), schema=VALIDATION_STREAM_SCHEMA)


# ---------------------------------------------------------------------------
# Streaming seed ingest (S1 as a stream: new seed URLs trickle in)
# ---------------------------------------------------------------------------

SEED_LINE_SCHEMA = StructType([StructField("value", StringType())])

INBOX_SCHEMA = StructType(
    [
        StructField("ingest_seq", LongType()),
        StructField("url", StringType()),
        StructField("url_canon", StringType()),
        StructField("host", StringType()),
        StructField("batch_id", LongType()),
    ]
)


def read_seed_stream(spark: SparkSession, seeds_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream of seed URLs, one per text line (≙ repeated
    POST /api/crawl bodies, /root/reference/handlers/crawl.go:18-28,
    arriving over time instead of in one request)."""
    return (
        spark.readStream.schema(SEED_LINE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .text(seeds_dir)
    )


def seed_inbox_stream(
    spark: SparkSession,
    seed_stream: DataFrame,
    inbox,
    checkpoint_dir: str,
):
    """foreachBatch sink: canonicalize (REF canon, urlkit.canon_ref),
    first-occurrence dedupe within the batch, anti-join against the
    inbox SnapshotTable (cross-batch dedupe), append survivors with a
    deterministic ``ingest_seq`` (inbox size + rank by url_canon within
    the batch).  The inbox is the staging table
    ``CrawlEngine.enqueue_seeds`` drains — together they are the
    streaming form of S1 seed ingest.  Exactly-once across restarts:
    the checkpointed batch_id is recorded per append, and a replayed
    batch's rows fall out on the anti-join."""
    from . import udfs

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.select(F.trim(F.col("value")).alias("url"))
            .filter(F.col("url") != "")
            .withColumn("url_canon", udfs.canon_ref_udf(F.col("url")))
            .withColumn("_p", udfs.url_parts_udf(F.col("url")))
            .withColumn("host", F.col("_p.host"))
            .drop("_p")
        )
        # first occurrence within the batch: smallest raw url per canon key
        rows = (
            rows.groupBy("url_canon")
            .agg(F.min_by("url", "url").alias("url"), F.first("host").alias("host"))
        )
        existing = inbox.read().select("url_canon")
        fresh = rows.join(existing, "url_canon", "left_anti")
        base = inbox.row_count()
        from pyspark.sql.window import Window

        w = Window.orderBy("url_canon")
        out = fresh.select(
            (F.lit(base) + F.row_number().over(w) - 1).cast("long").alias("ingest_seq"),
            "url",
            "url_canon",
            "host",
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
        inbox.append(out, meta={"stream_batch": batch_id})

    return (
        seed_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )

def seed_dedup_stream(seed_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Native stateful streaming dedup of timestamped seed lines
    ("<iso-ts>|<url>"): ``dropDuplicatesWithinWatermark`` on the canon
    key — Spark keeps one state-store entry per key and EXPIRES it once
    the watermark passes ts + delay, so state is bounded by the
    watermark window instead of the full URL history.

    This is the at-scale alternative to ``seed_inbox_stream``'s
    anti-join-vs-inbox (which re-reads the inbox table every batch): the
    state store is partitioned with the stream, no table scan per
    micro-batch.  The two compose — within-window spam collapses here,
    and the inbox anti-join remains the exact long-horizon guard.  A
    duplicate arriving after its key expired is re-emitted BY DESIGN
    (semantics pinned in tests/test_streaming.py)."""
    from . import udfs

    rows = (
        seed_stream.select(F.trim(F.col("value")).alias("line"))
        .filter(F.col("line") != "")
        .select(
            F.to_timestamp(F.substring_index("line", "|", 1)).alias("ts"),
            F.substring_index("line", "|", -1).alias("url"),
        )
        .withColumn("url_canon", udfs.canon_ref_udf(F.col("url")))
    )
    return rows.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["url_canon"]
    )
