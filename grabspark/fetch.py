"""J3/X4/X5 — fetch as a lookup join + image/caption validation.

The reference "fetch" renders a page in headless Chrome
(/root/reference/functions/main_functions.go:82-100).  In the graft cell
the web IS a table: fetching becomes a left join of the scheduled round
against the image+caption page store on the browser-request key
(fetch_key = canon minus fragment; store ``image_id`` is the canonical
page URL).  A miss is a fetch failure: the row stays in the seen set and
contributes no links (main_functions.go:50,57-62) [REF-EXACT].

Post-join, one Arrow-batched stage derives the REF-EXACT page record
fields (title via the Title: marker ≙ chromedp.Title; content via
trim→blank-lines→space-collapse, main_functions.go:107-109; links via
ordered href extraction ≙ querySelectorAll('a[href]')) and the NR-EXT
image validation (decoded-pixel allclose / PSNR>=40dB vs independently
recomputed reference pixels + phash recomputation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import udfs

# columns of the scheduled input that pass through
SCHED_COLS = [
    "seed_idx",
    "fetch_seq",
    "round",
    "url",
    "url_canon",
    "host",
    "parent_seq",
    "link_idx",
]

TRACE_SCHEMA = StructType(
    [
        StructField("seed_idx", IntegerType()),
        StructField("fetch_seq", LongType()),
        StructField("round", IntegerType()),
        StructField("url", StringType()),
        StructField("url_canon", StringType()),
        StructField("host", StringType()),
        # storage partition key (SURVEY D5/§4.3): trace/fetched files are
        # bucketed by host-hash so per-host reads prune at the manifest
        StructField("host_bucket", LongType()),
        StructField("parent_seq", LongType()),
        StructField("link_idx", IntegerType()),
        StructField("ok", BooleanType()),
        StructField("image_id", StringType()),
        StructField("title", StringType()),
        StructField("content", StringType()),
        StructField("caption", StringType()),
        StructField("fmt", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("phash", LongType()),
        StructField("links", ArrayType(StringType())),
        StructField("n_links", IntegerType()),
    ]
    + udfs.VALIDATION_FIELDS
)


def fetch_and_validate(
    sched: DataFrame, store: DataFrame, broadcast_store: bool = False, host_buckets: int = 16
) -> DataFrame:
    """Scheduled round -> trace rows (TRACE_SCHEMA)."""
    right = store.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    if broadcast_store:
        right = F.broadcast(right)
    j = (
        sched.select(*SCHED_COLS)
        .withColumn("host_bucket", F.pmod(F.xxhash64("host"), F.lit(host_buckets)))
        .withColumn("_fk", udfs.fetch_key_udf(F.col("url")))
        .join(right, F.col("_fk") == F.col("image_id"), "left")
        .drop("_fk")
        # int64 must not travel through nullable pandas columns (float64
        # coercion rounds large values) — ship it as a string
        .withColumn("phash_str", F.col("phash").cast("string"))
        .drop("phash")
    )
    j = (
        j.withColumn("ok", F.col("image_id").isNotNull())
        .withColumn("title", udfs.extract_title_udf(F.col("caption")))
        .withColumn("content", udfs.clean_text_udf(F.col("caption")))
        .withColumn(
            "links",
            F.when(F.col("ok"), udfs.extract_links_udf(F.col("caption"))).otherwise(
                F.lit(None).cast(ArrayType(StringType()))
            ),
        )
        .withColumn("n_links", F.coalesce(F.size("links"), F.lit(0)))
        .withColumn("title", F.when(F.col("ok"), F.col("title")))
        .withColumn("content", F.when(F.col("ok"), F.col("content")))
    )
    cols = [f.name for f in TRACE_SCHEMA.fields]
    validated = j.mapInPandas(
        lambda it: udfs.validate_images(it, cols), schema=TRACE_SCHEMA
    )
    return validated
