"""A2 — per-round lineage + fetch/dedupe metrics (north-rule extension).

Long-format metrics table so every round appends a handful of rows:
``(round, scope, host, partition_id, metric, value)`` with scopes
``round`` (global counters), ``host`` (per-host fetch stats) and
``partition`` (per-Spark-partition lineage of the trace write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

METRICS_SCHEMA = StructType(
    [
        StructField("round", IntegerType()),
        StructField("scope", StringType()),
        StructField("host", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("metric", StringType()),
        StructField("value", DoubleType()),
    ]
)


def round_counter_rows(spark, rnd: int, counters: dict[str, float]) -> DataFrame:
    rows = [(rnd, "round", None, None, k, float(v)) for k, v in counters.items()]
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def host_metrics(trace_batch: DataFrame, rnd: int) -> DataFrame:
    """Per-host fetch stats for one round's trace batch."""
    agg = trace_batch.groupBy("host").agg(
        F.count("*").alias("scheduled"),
        F.sum(F.col("ok").cast("long")).alias("fetched_ok"),
        F.sum((~F.col("ok")).cast("long")).alias("fetch_failed"),
        F.sum(F.coalesce("bytes_len", F.lit(0))).alias("bytes"),
        F.sum(F.coalesce("n_links", F.lit(0))).alias("links_out"),
        F.sum(F.coalesce(F.col("pixels_ok").cast("long"), F.lit(0))).alias("pixels_ok"),
    )
    metrics = ["scheduled", "fetched_ok", "fetch_failed", "bytes", "links_out", "pixels_ok"]
    stacked = agg.select(
        "host",
        F.explode(
            F.array(*[F.struct(F.lit(m).alias("metric"), F.col(m).cast("double").alias("value")) for m in metrics])
        ).alias("kv"),
    )
    return stacked.select(
        F.lit(rnd).cast("int").alias("round"),
        F.lit("host").alias("scope"),
        F.col("host"),
        F.lit(None).cast("int").alias("partition_id"),
        F.col("kv.metric").alias("metric"),
        F.col("kv.value").alias("value"),
    )


def partition_lineage(trace_batch: DataFrame, rnd: int) -> DataFrame:
    """Per-partition row lineage of the round's trace (north_rule
    "per-partition lineage and fetch/dedupe metrics")."""
    agg = (
        trace_batch.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("rows"), F.sum(F.col("ok").cast("long")).alias("ok_rows"))
    )
    stacked = agg.select(
        "_pid",
        F.explode(
            F.array(
                F.struct(F.lit("rows").alias("metric"), F.col("rows").cast("double").alias("value")),
                F.struct(F.lit("ok_rows").alias("metric"), F.col("ok_rows").cast("double").alias("value")),
            )
        ).alias("kv"),
    )
    return stacked.select(
        F.lit(rnd).cast("int").alias("round"),
        F.lit("partition").alias("scope"),
        F.lit(None).cast("string").alias("host"),
        F.col("_pid").cast("int").alias("partition_id"),
        F.col("kv.metric").alias("metric"),
        F.col("kv.value").alias("value"),
    )
