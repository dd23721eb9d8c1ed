"""Crawl-graph analytics: link-graph PageRank for frontier prioritization
and exact perceptual-hash KNN over the image corpus.

The reference crawls FIFO with no notion of page importance
(/root/reference/functions/main_functions.go:34-76); a 10^10-frontier
crawl schedules by link-graph rank instead.  ``pagerank_hosts`` is that
prioritizer: fixed-point integer PageRank (no floats, so the DuckDB
oracle matches bit-for-bit) over a deterministic host graph synthesized
from the customer fixture — the same device robots_txt_parse/pii_scrub
use for inputs the TPC-H tables don't carry natively.

``phash_knn`` extends the image axis (input_hint: phash:int64) from
near-dup PAIRS (images.image_phash_near_dup) to per-image nearest
neighbours: every neighbour within hamming <= 3, ranked.  Signatures are
synthesized IN SQL on both sides (multiplicative 60-bit mixes + planted
<=3-bit flips), so the oracle is pure DuckDB all-pairs — a genuinely
different algorithm from the Spark banded join, proving the banding loses
no neighbour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import T

# --- pagerank_hosts ----------------------------------------------------------
#
# Fixed-point arithmetic: ranks scaled by 10^6, damping 0.85 as integer
# (BASE + (85 * incoming) DIV 100), per-edge contribution floor-divided
# BEFORE the sum.  Every operation is an order-free integer op, so Spark
# and DuckDB agree exactly regardless of aggregation order.
#
# 100 TB shape: per iteration one join (edges ⋈ ranks on src — ranks is
# node-sized, broadcast when hosts << edges; co-partitioned on src
# otherwise) + one partial-agg groupBy(dst).  Edges are computed once and
# reused across iterations; at scale they live bucketed by src so the
# join side never re-shuffles.  K iterations = K shuffles of the
# node-sized rank table only, never of the edge table.

_PR_SCALE = 1_000_000
_PR_BASE = 150_000  # 0.15 * SCALE, integer damping base
_PR_ITERS = 3
_PR_MOD = 25  # host id space: n0.test .. n24.test


def pagerank_hosts(spark: SparkSession, sf: str) -> DataFrame:
    """3-iteration fixed-point PageRank over the synthesized host graph
    (edge per customer: n{c_nationkey}.test -> n{c_custkey % 25}.test,
    multi-edges kept as weights)."""
    c = T(spark, sf, "customer").select(
        F.col("c_nationkey").cast("long").alias("src"),
        (F.col("c_custkey") % _PR_MOD).cast("long").alias("dst"),
    )
    edges = c.groupBy("src", "dst").agg(F.count("*").alias("w"))
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(out_w, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    r = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = e.join(r, e["src"] == r["node"]).select(
            F.col("dst").alias("node"),
            F.expr("(rank * w) DIV out_w").alias("c"),
        )
        inc = contrib.groupBy("node").agg(F.sum("c").alias("inc"))
        r = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(_PR_BASE)
                + F.expr("(85 * coalesce(inc, CAST(0 AS BIGINT))) DIV 100")
            ).cast("long").alias("rank"),
        )
    deg_in = e.groupBy(F.col("dst").alias("node")).agg(F.sum("w").alias("in_w"))
    return (
        r.join(out_w.withColumnRenamed("src", "node"), "node", "left")
        .join(deg_in, "node", "left")
        .select(
            F.concat(F.lit("n"), F.col("node").cast("string"), F.lit(".test")).alias(
                "host"
            ),
            F.coalesce(F.col("out_w"), F.lit(0)).cast("long").alias("out_links"),
            F.coalesce(F.col("in_w"), F.lit(0)).cast("long").alias("in_links"),
            F.col("rank").alias("rank_ppm"),
        )
    )


def _pagerank_sql() -> str:
    its = []
    prev = "r0"
    for k in range(1, _PR_ITERS + 1):
        its.append(
            f"i{k} AS (SELECT e.dst AS node, sum(({prev}.rank * e.w) // e.out_w) AS inc\n"
            f"         FROM e JOIN {prev} ON e.src = {prev}.node GROUP BY e.dst),\n"
            f"r{k} AS (SELECT n.node,\n"
            f"                CAST({_PR_BASE} + (85 * coalesce(i{k}.inc, 0)) // 100 AS BIGINT) AS rank\n"
            f"         FROM n LEFT JOIN i{k} USING (node))"
        )
        prev = f"r{k}"
    return f"""
WITH e0 AS (
  SELECT CAST(c_nationkey AS BIGINT) AS src,
         CAST(c_custkey % {_PR_MOD} AS BIGINT) AS dst,
         count(*) AS w
  FROM customer GROUP BY 1, 2
),
od AS (SELECT src, sum(w) AS out_w FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, e0.w, od.out_w FROM e0 JOIN od USING (src)),
n AS (SELECT DISTINCT src AS node FROM e0 UNION SELECT DISTINCT dst FROM e0),
r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM n),
{", ".join(its)},
din AS (SELECT dst AS node, sum(w) AS in_w FROM e GROUP BY dst)
SELECT 'n' || CAST(n.node AS VARCHAR) || '.test' AS host,
       CAST(coalesce(od2.out_w, 0) AS BIGINT) AS out_links,
       CAST(coalesce(din.in_w, 0) AS BIGINT) AS in_links,
       r{_PR_ITERS}.rank AS rank_ppm
FROM n
JOIN r{_PR_ITERS} USING (node)
LEFT JOIN (SELECT src AS node, out_w FROM od) od2 USING (node)
LEFT JOIN din USING (node)
"""


# --- phash_knn ---------------------------------------------------------------
#
# 60-bit signatures (two multiplicative 30-bit mixes, no md5 so DuckDB
# computes the identical int64 without hex parsing); every 5th image gets
# a planted variant whose signature flips <= 3 deterministic bit
# positions.  Semantics: for each image, ALL neighbours within hamming <=
# 3, ranked (hamming ASC, neighbour ASC), top-5.
#
# Spark path is the scale path: 4 bands x 15 bits — by pigeonhole a pair
# within hamming <= 3 shares at least one untouched band, so the banded
# equi-join is candidate-complete; bit_count(xor) verifies exactly.  One
# signature pass + one equi-join on (band, bucket) + a per-image top-k
# window (rank-limit pushdown keeps map output at k rows per image).  The
# DuckDB oracle is brute-force all-pairs — a different algorithm, so a
# green row proves the banding drops nothing.

_KNN_A1 = 2654435761  # Knuth multiplicative constants (public folklore)
_KNN_A2 = 2246822519
_KNN_M30 = 1 << 30
_KNN_BANDS = 4
_KNN_BAND_BITS = 15
_KNN_HAM_MAX = 3
_KNN_K = 5

_SIG_SPARK = (
    f"CAST((c_custkey * {_KNN_A1}) % {_KNN_M30} AS BIGINT) "
    f"+ CAST((c_custkey * {_KNN_A2}) % {_KNN_M30} AS BIGINT) * {_KNN_M30}"
)
_SIG_DUCK = (
    f"CAST((c_custkey * {_KNN_A1}) % {_KNN_M30} AS BIGINT) "
    f"+ CAST((c_custkey * {_KNN_A2}) % {_KNN_M30} AS BIGINT) * {_KNN_M30}"
)
# variant #v flips 1-3 bits (bits 2/3 conditional on parity/mod-3 so the
# planted hamming distances span {1,2,3}); second variant #w (every 10th)
# flips <= 2 different bits, giving some images MULTIPLE ranked neighbours
_MASK_SPARK = (
    "shiftleft(CAST(1 AS BIGINT), CAST(c_custkey % 60 AS INT)) "
    "| CASE WHEN c_custkey % 2 = 0 THEN "
    "shiftleft(CAST(1 AS BIGINT), CAST((c_custkey * 7 + 11) % 60 AS INT)) "
    "ELSE CAST(0 AS BIGINT) END "
    "| CASE WHEN c_custkey % 3 = 0 THEN "
    "shiftleft(CAST(1 AS BIGINT), CAST((c_custkey * 13 + 29) % 60 AS INT)) "
    "ELSE CAST(0 AS BIGINT) END"
)
_MASK_DUCK = (
    "(CAST(1 AS BIGINT) << CAST(c_custkey % 60 AS INT)) "
    "| CASE WHEN c_custkey % 2 = 0 THEN "
    "(CAST(1 AS BIGINT) << CAST((c_custkey * 7 + 11) % 60 AS INT)) "
    "ELSE CAST(0 AS BIGINT) END "
    "| CASE WHEN c_custkey % 3 = 0 THEN "
    "(CAST(1 AS BIGINT) << CAST((c_custkey * 13 + 29) % 60 AS INT)) "
    "ELSE CAST(0 AS BIGINT) END"
)
_MASK2_SPARK = (
    "shiftleft(CAST(1 AS BIGINT), CAST((c_custkey + 17) % 60 AS INT)) "
    "| CASE WHEN c_custkey % 4 = 0 THEN "
    "shiftleft(CAST(1 AS BIGINT), CAST((c_custkey * 3 + 41) % 60 AS INT)) "
    "ELSE CAST(0 AS BIGINT) END"
)
_MASK2_DUCK = (
    "(CAST(1 AS BIGINT) << CAST((c_custkey + 17) % 60 AS INT)) "
    "| CASE WHEN c_custkey % 4 = 0 THEN "
    "(CAST(1 AS BIGINT) << CAST((c_custkey * 3 + 41) % 60 AS INT)) "
    "ELSE CAST(0 AS BIGINT) END"
)


def _knn_sigs(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer")
    base = c.select(
        F.expr("concat('img', CAST(c_custkey AS STRING))").alias("img_id"),
        F.expr(_SIG_SPARK).alias("sig"),
    )
    variants = c.filter(F.expr("c_custkey % 5 = 0")).select(
        F.expr("concat('img', CAST(c_custkey AS STRING), '#v')").alias("img_id"),
        F.expr(f"({_SIG_SPARK}) ^ ({_MASK_SPARK})").alias("sig"),
    )
    variants2 = c.filter(F.expr("c_custkey % 10 = 0")).select(
        F.expr("concat('img', CAST(c_custkey AS STRING), '#w')").alias("img_id"),
        F.expr(f"({_SIG_SPARK}) ^ ({_MASK2_SPARK})").alias("sig"),
    )
    return base.union(variants).union(variants2)


def phash_knn(spark: SparkSession, sf: str) -> DataFrame:
    sigs = _knn_sigs(spark, sf)
    banded = sigs.select(
        "img_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"shiftright(sig, {b * _KNN_BAND_BITS}) "
                        f"& {(1 << _KNN_BAND_BITS) - 1}"
                    )
                    for b in range(_KNN_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b2 = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.img_id") < F.col("b.img_id")),
        )
        .select(
            F.col("a.img_id").alias("img_a"),
            F.col("b.img_id").alias("img_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
        .withColumn("hamming", F.expr("CAST(bit_count(sig_a ^ sig_b) AS INT)"))
        .filter(F.col("hamming") <= _KNN_HAM_MAX)
    )
    directed = cand.select(
        F.col("img_a").alias("img_id"), F.col("img_b").alias("neighbor"), "hamming"
    ).union(
        cand.select(
            F.col("img_b").alias("img_id"), F.col("img_a").alias("neighbor"), "hamming"
        )
    )
    w = Window.partitionBy("img_id").orderBy(F.asc("hamming"), F.asc("neighbor"))
    return (
        directed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_K)
        .select("img_id", "neighbor", "hamming", "rk")
    )


_KNN_SQL = f"""
WITH sigs AS (
  SELECT 'img' || CAST(c_custkey AS VARCHAR) AS img_id, {_SIG_DUCK} AS sig
  FROM customer
  UNION ALL
  SELECT 'img' || CAST(c_custkey AS VARCHAR) || '#v' AS img_id,
         xor({_SIG_DUCK}, {_MASK_DUCK}) AS sig
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT 'img' || CAST(c_custkey AS VARCHAR) || '#w' AS img_id,
         xor({_SIG_DUCK}, {_MASK2_DUCK}) AS sig
  FROM customer WHERE c_custkey % 10 = 0
),
pairs AS (
  SELECT a.img_id, b.img_id AS neighbor,
         CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
  FROM sigs a JOIN sigs b ON a.img_id <> b.img_id
  WHERE bit_count(xor(a.sig, b.sig)) <= {_KNN_HAM_MAX}
)
SELECT img_id, neighbor, hamming, CAST(rk AS INT) AS rk FROM (
  SELECT img_id, neighbor, hamming,
         row_number() OVER (PARTITION BY img_id ORDER BY hamming ASC, neighbor ASC) AS rk
  FROM pairs
) WHERE rk <= {_KNN_K}
"""


# --- crawl_tiers ---------------------------------------------------------------
#
# The tiered-crawl scheduler head: hosts are split into crawl TIERS by
# link-graph rank (tier 1 re-crawled most often), and each tier's
# per-round fetch budget is divided among its hosts PROPORTIONALLY TO
# RANK with largest-remainder rounding — budgets are integers that sum
# exactly to the tier budget, so the round never over- or under-commits.
# Composes pagerank_hosts (the rank signal) with the mixture_weights
# allocation idiom; the FIFO reference has no prioritization at all
# (/root/reference/functions/main_functions.go:34-76).
#
# 100 TB shape: everything after PageRank runs on the HOST-level frame —
# node-sized, not corpus-sized — where single-partition windows are
# metadata-scale by construction (same argument as mixture_weights).

_TIER_BUDGETS = (6000, 3000, 1000)  # per-round fetches for tiers 1..3


def crawl_tiers(spark: SparkSession, sf: str) -> DataFrame:
    """(host, rank_ppm, tier, host_budget): NTILE(3) rank tiers and
    exact integer per-host budgets via largest remainder within tier."""
    r = pagerank_hosts(spark, sf).select("host", "rank_ppm")
    t = r.withColumn(
        "tier",
        F.ntile(3).over(Window.orderBy(F.desc("rank_ppm"), F.asc("host"))).cast("int"),
    ).withColumn(
        "tier_budget",
        F.expr(
            f"CAST(CASE tier WHEN 1 THEN {_TIER_BUDGETS[0]} "
            f"WHEN 2 THEN {_TIER_BUDGETS[1]} ELSE {_TIER_BUDGETS[2]} END AS BIGINT)"
        ),
    )
    wt = Window.partitionBy("tier")
    t = (
        t.withColumn("denom", F.sum("rank_ppm").over(wt))
        .withColumn("base", F.expr("tier_budget * rank_ppm DIV denom"))
        .withColumn("leftover", F.col("tier_budget") - F.sum("base").over(wt))
        .withColumn(
            "rem_rank",
            F.row_number().over(
                wt.orderBy(
                    F.desc(F.expr("tier_budget * rank_ppm % denom")), F.asc("host")
                )
            ),
        )
    )
    return t.select(
        "host",
        "rank_ppm",
        "tier",
        (
            F.col("base") + (F.col("rem_rank") <= F.col("leftover")).cast("long")
        ).alias("host_budget"),
    )


def _crawl_tiers_sql() -> str:
    return f"""
WITH pr AS (SELECT host, rank_ppm FROM ({_pagerank_sql()})),
tiers AS (
  SELECT host, rank_ppm,
         CAST(ntile(3) OVER (ORDER BY rank_ppm DESC, host) AS INT) AS tier
  FROM pr
),
tb AS (
  SELECT host, rank_ppm, tier,
         CAST(CASE tier WHEN 1 THEN {_TIER_BUDGETS[0]}
              WHEN 2 THEN {_TIER_BUDGETS[1]}
              ELSE {_TIER_BUDGETS[2]} END AS BIGINT) AS tier_budget
  FROM tiers
),
alloc AS (
  SELECT host, rank_ppm, tier, tier_budget,
         sum(rank_ppm) OVER (PARTITION BY tier) AS denom,
         tier_budget * rank_ppm // sum(rank_ppm) OVER (PARTITION BY tier) AS base
  FROM tb
),
ranked AS (
  SELECT host, rank_ppm, tier, base,
         tier_budget - sum(base) OVER (PARTITION BY tier) AS leftover,
         row_number() OVER (PARTITION BY tier
                            ORDER BY tier_budget * rank_ppm % denom DESC, host)
           AS rem_rank
  FROM alloc
)
SELECT host, rank_ppm, tier,
       CAST(base + (CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END) AS BIGINT)
         AS host_budget
FROM ranked
"""


# --- hits_hosts --------------------------------------------------------------
#
# HITS (Kleinberg 1999, public) complements PageRank for crawl
# scheduling: hubs (directory/index pages that link out to many good
# pages) deserve crawl budget even when their own in-link rank is low,
# and authorities are the fetch targets hubs point at.  Same
# deterministic host graph as pagerank_hosts; 2 mutual-reinforcement
# iterations.  All arithmetic is order-free integer: per-iteration
# scores are sums of (score * weight) products, then re-normalized to
# _HITS_SCALE by an integer max-division — so Spark and DuckDB agree
# bit-for-bit with no float summation anywhere.
#
# 100 TB shape: per half-iteration ONE join of the edge table with the
# NODE-sized score table (broadcast at host cardinality; co-partitioned
# on the join key when nodes outgrow broadcast) + one partial-agg
# groupBy; the normalization max is a broadcast scalar.  Edges are
# computed once and reused; K iterations shuffle only node-sized tables.

_HITS_SCALE = 1_000_000
_HITS_ITERS = 2


def hits_hosts(spark: SparkSession, sf: str) -> DataFrame:
    """(host, hub_ppm, auth_ppm): 2-iteration integer HITS over the
    synthesized host graph (edge per customer: n{c_nationkey}.test ->
    n{c_custkey % 25}.test, multi-edges kept as weights)."""
    c = T(spark, sf, "customer").select(
        F.col("c_nationkey").cast("long").alias("src"),
        (F.col("c_custkey") % _PR_MOD).cast("long").alias("dst"),
    )
    edges = c.groupBy("src", "dst").agg(F.count("*").alias("w"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    hub = nodes.select("node", F.lit(_HITS_SCALE).cast("long").alias("s"))
    auth = None
    for _ in range(_HITS_ITERS):
        a_raw = (
            edges.join(hub, edges["src"] == hub["node"])
            .select(F.col("dst").alias("node"), F.expr("s * w").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        a_max = a_raw.agg(F.max("raw").alias("mx"))  # scalar aggregate
        auth = nodes.join(a_raw, "node", "left").crossJoin(F.broadcast(a_max)).select(
            "node",
            F.expr(
                f"(coalesce(raw, CAST(0 AS BIGINT)) * {_HITS_SCALE}) DIV mx"
            ).cast("long").alias("s"),
        )
        h_raw = (
            edges.join(auth, edges["dst"] == auth["node"])
            .select(F.col("src").alias("node"), F.expr("s * w").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("raw"))
        )
        h_max = h_raw.agg(F.max("raw").alias("mx"))
        hub = nodes.join(h_raw, "node", "left").crossJoin(F.broadcast(h_max)).select(
            "node",
            F.expr(
                f"(coalesce(raw, CAST(0 AS BIGINT)) * {_HITS_SCALE}) DIV mx"
            ).cast("long").alias("s"),
        )
    return (
        hub.withColumnRenamed("s", "hub_ppm")
        .join(auth.withColumnRenamed("s", "auth_ppm"), "node")
        .select(
            F.concat(F.lit("n"), F.col("node").cast("string"), F.lit(".test")).alias(
                "host"
            ),
            "hub_ppm",
            "auth_ppm",
        )
    )


def _hits_sql() -> str:
    parts = []
    prev_h = "h0"
    auth_name = "a0"
    for k in range(1, _HITS_ITERS + 1):
        parts.append(
            f"ar{k} AS (SELECT e.dst AS node, sum({prev_h}.s * e.w) AS raw\n"
            f"          FROM e JOIN {prev_h} ON e.src = {prev_h}.node GROUP BY e.dst),\n"
            f"a{k} AS (SELECT n.node,\n"
            f"                CAST((coalesce(ar{k}.raw, 0) * {_HITS_SCALE})\n"
            f"                     // (SELECT max(raw) FROM ar{k}) AS BIGINT) AS s\n"
            f"         FROM n LEFT JOIN ar{k} USING (node)),\n"
            f"hr{k} AS (SELECT e.src AS node, sum(a{k}.s * e.w) AS raw\n"
            f"          FROM e JOIN a{k} ON e.dst = a{k}.node GROUP BY e.src),\n"
            f"h{k} AS (SELECT n.node,\n"
            f"                CAST((coalesce(hr{k}.raw, 0) * {_HITS_SCALE})\n"
            f"                     // (SELECT max(raw) FROM hr{k}) AS BIGINT) AS s\n"
            f"         FROM n LEFT JOIN hr{k} USING (node))"
        )
        prev_h = f"h{k}"
        auth_name = f"a{k}"
    return f"""
WITH e AS (
  SELECT CAST(c_nationkey AS BIGINT) AS src,
         CAST(c_custkey % {_PR_MOD} AS BIGINT) AS dst,
         count(*) AS w
  FROM customer GROUP BY 1, 2
),
n AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
h0 AS (SELECT node, CAST({_HITS_SCALE} AS BIGINT) AS s FROM n),
{", ".join(parts)}
SELECT 'n' || CAST(n.node AS VARCHAR) || '.test' AS host,
       {prev_h}.s AS hub_ppm,
       {auth_name}.s AS auth_ppm
FROM n JOIN {prev_h} USING (node) JOIN {auth_name} USING (node)
"""


QUERIES = {
    "pagerank_hosts": pagerank_hosts,
    "phash_knn": phash_knn,
    "crawl_tiers": crawl_tiers,
    "hits_hosts": hits_hosts,
}

ORACLES = {
    "pagerank_hosts": _pagerank_sql(),
    "phash_knn": _KNN_SQL,
    "crawl_tiers": _crawl_tiers_sql(),
    "hits_hosts": _hits_sql(),
}
