"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Brute-force cosine top-k is the correctness baseline; the scale path is
the LSH-bucketed variant (deterministic hyperplane signs derived from
md5 bits — no stored planes, reproducible in SQL).  All arithmetic runs
JVM-side via higher-order functions (zip_with/aggregate) in double
precision, summed in array order so DuckDB (list reduction, double cast)
agrees to the last bit wherever we round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import T

# dot(a, b) in double, sequential order
_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = "sqrt(aggregate(transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"


def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 nearest neighbours of vec_id=0 by cosine (brute force —
    one scan, no shuffle except the final top-k)."""
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("b"))
    j2 = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", F.col("embedding").alias("a"))
        .crossJoin(F.broadcast(q))
    )
    scored = j2.select(
        "vec_id",
        F.expr(f"round({_DOT} / ({_NORM.format(c='a')} * {_NORM.format(c='b')}), 6)").alias(
            "cos_sim"
        ),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)


_TOPK_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS b FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         round(list_dot_product(embedding::DOUBLE[], q.b)
               / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.b, q.b))), 6) AS cos_sim
  FROM embeddings, q
  WHERE vec_id <> 0
)
SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


def embedding_norms(spark: SparkSession, sf: str) -> DataFrame:
    e = T(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dims"),
        F.expr(f"round({_NORM.format(c='embedding')}, 6)").alias("l2_norm"),
    )


_NORMS_SQL = """
SELECT vec_id, len(embedding) AS dims,
       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
FROM embeddings
"""


def knn_per_label(spark: SparkSession, sf: str) -> DataFrame:
    """For each label, the most-central vector (max summed cosine to its
    own label group) — a grouped similarity aggregation exercising the
    pairwise join within buckets (the IVF-style scale pattern: pairs
    confined to a partition/label bucket, never the full cross join)."""
    e = T(spark, sf, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("a")
    )
    e2 = T(spark, sf, "embeddings").select(
        F.col("vec_id").alias("vec_id_b"), F.col("label").alias("label_b"), F.col("embedding").alias("b")
    )
    pairs = e.join(e2, (F.col("label") == F.col("label_b")) & (F.col("vec_id") != F.col("vec_id_b")))
    sims = pairs.select(
        "label",
        "vec_id",
        F.expr(f"{_DOT} / ({_NORM.format(c='a')} * {_NORM.format(c='b')})").alias("s"),
    )
    per_vec = sims.groupBy("label", "vec_id").agg(F.round(F.sum("s"), 4).alias("total_sim"))
    w = Window.partitionBy("label").orderBy(F.desc("total_sim"), F.asc("vec_id"))
    return (
        per_vec.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("label", F.col("vec_id").alias("central_vec_id"), "total_sim")
    )


_KNN_SQL = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT a.label, a.vec_id,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS s
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
),
per_vec AS (
  SELECT label, vec_id, round(sum(s), 4) AS total_sim
  FROM sims GROUP BY label, vec_id
)
SELECT label, vec_id AS central_vec_id, total_sim FROM (
  SELECT label, vec_id, total_sim,
         row_number() OVER (PARTITION BY label ORDER BY total_sim DESC, vec_id ASC) AS rk
  FROM per_vec
) WHERE rk = 1
"""


def lsh_bucket_sign(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH bucket id (8 bits) per vector.  Plane p's
    j-th coefficient sign is bit (j of md5(p)) — deterministic and
    SQL-reproducible; bucket = concat of sign(dot(v, plane)).  The scale
    path groups ANN candidates by bucket instead of cross-joining."""
    e = T(spark, sf, "embeddings")
    bits = []
    for p in range(8):
        # coefficient j in {+1,-1} from md5 nibble parity of (plane, j)
        coef = (
            f"transform(sequence(0, size(embedding) - 1), "
            f"j -> CASE WHEN substring(md5(concat('plane{p}|', CAST(j AS STRING))), 1, 1) "
            f"IN ('8','9','a','b','c','d','e','f') THEN 1.0D ELSE -1.0D END)"
        )
        dot = (
            f"aggregate(zip_with(embedding, {coef}, (x, c) -> CAST(x AS DOUBLE) * c), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    bucket = "concat(" + ", ".join(bits) + ")"
    return e.select("vec_id", F.expr(bucket).alias("bucket"))


def _lsh_sql() -> str:
    parts = []
    for p in range(8):
        coef = (
            f"list_transform(generate_series(0, len(embedding) - 1), "
            f"j -> CASE WHEN substring(md5('plane{p}|' || CAST(j AS VARCHAR)), 1, 1) "
            f"IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END)"
        )
        dot = f"list_dot_product(embedding::DOUBLE[], {coef})"
        parts.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    return "SELECT vec_id, concat(" + ", ".join(parts) + ") AS bucket FROM embeddings"


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "embedding_norms": embedding_norms,
    "knn_per_label": knn_per_label,
    "lsh_bucket_sign": lsh_bucket_sign,
}

ORACLES = {
    "ann_cosine_topk": _TOPK_SQL,
    "embedding_norms": _NORMS_SQL,
    "knn_per_label": _KNN_SQL,
    "lsh_bucket_sign": _lsh_sql(),
}
