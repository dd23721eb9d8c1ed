"""X3 — robots.txt rules + crawl-delay (north-rule extension).

Absent from the reference (its politeness is a global 1 s sleep,
/root/reference/functions/main_functions.go:39).  The north rule adds
per-host robots allow/deny rules and a crawl-delay budget.

Rules table (FIXTURES.md §3): ``(host, rule_prefix, allow, crawl_delay)``.
Matching (RFC 9309 / Google REP): ``rule_prefix`` is a path PATTERN —
a prefix, optionally with ``*`` (any octet sequence) and a trailing
``$`` (end-of-path anchor); every other character is literal.  Among a
host's matching rules the longest pattern wins; on a length tie the
allow rule wins (least-restrictive); no matching rule => allowed.
``crawl_delay`` is host-level (taken from the host's rules; the engine
turns it into a per-round fetch budget: max(1, tick/crawl_delay)).

Physical plan: rules are a small dimension — broadcast join on host, then
a prefix-match + longest-prefix argmax via ``max_by``; all JVM-side
(no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

RULES_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("rule_prefix", StringType()),
        StructField("allow", BooleanType()),
        StructField("crawl_delay", DoubleType()),
    ]
)


def host_delays(rules: DataFrame, default_delay: float) -> DataFrame:
    """(host, crawl_delay): max declared delay per host, default elsewhere."""
    return rules.groupBy("host").agg(
        F.coalesce(F.max("crawl_delay"), F.lit(default_delay)).alias("crawl_delay")
    )


def _pattern_regex():
    """``rule_prefix`` REP pattern -> anchored Java regex, as a Catalyst
    column (no UDF): a trailing ``$`` becomes the end anchor, ``*``
    becomes ``.*``, every other regex metacharacter is escaped.  A plain
    prefix therefore matches exactly as ``startswith`` did."""
    anchored = F.col("rule_prefix").endswith("$")
    body = F.when(
        anchored, F.expr("substring(rule_prefix, 1, length(rule_prefix) - 1)")
    ).otherwise(F.col("rule_prefix"))
    esc = F.regexp_replace(body, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    return F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )


def apply_robots(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Filter candidate rows to robots-allowed ones.

    ``frontier`` must carry ``host`` and ``url_canon``; the path used for
    pattern matching is everything after scheme://authority of the
    canonical URL (computed JVM-side with string ops, not a UDF).
    """
    path = F.regexp_replace(F.col("url_canon"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    path = F.when(path == "", "/").otherwise(path)
    cand = frontier.withColumn("_path", path)
    joined = cand.join(F.broadcast(rules.select("host", "rule_prefix", "allow")), "host", "left")
    matched = joined.withColumn(
        "_m",
        F.when(
            F.col("rule_prefix").isNotNull()
            & F.regexp_like(F.col("_path"), _pattern_regex()),
            F.struct(F.length("rule_prefix").alias("l"), F.col("allow").alias("a")),
        ),
    )
    decided = matched.groupBy(*[c for c in frontier.columns]).agg(
        F.max("_m").alias("_best")  # struct max: longest prefix wins
    )
    return decided.filter(F.coalesce(F.col("_best.a"), F.lit(True))).drop("_best")


def parse_robots_txt(bodies: DataFrame) -> DataFrame:
    """Parse raw robots.txt bodies into the RULES_SCHEMA table, all
    JVM-side (split/explode + a running ``last`` window for group
    tracking — no Python UDF).

    ``bodies``: ``(host, body)``.  Google-style subset: lines belong to
    the most recent ``User-agent:`` header; only ``*`` groups apply
    (the engine crawls under no specific agent name).  ``Allow:`` /
    ``Disallow:`` with a non-empty path become rules; an empty
    ``Disallow:`` means allow-all and emits nothing.  ``Crawl-delay:``
    is host-level (max across the host's ``*`` groups) and is attached
    to every emitted rule row; a host with a delay but no path rules
    gets one neutral ``('', allow)`` row to carry it.  Comments (#) and
    blank lines drop; keys are case-insensitive."""
    from pyspark.sql import Window

    lines = bodies.select(
        "host", F.posexplode(F.split(F.col("body"), "\r?\n")).alias("pos", "raw")
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    kv = F.split(clean, ":", 2)
    parsed = (
        lines.withColumn("_c", clean)
        .filter(F.col("_c") != "")
        .select(
            "host",
            "pos",
            F.lower(F.trim(kv.getItem(0))).alias("k"),
            F.trim(kv.getItem(1)).alias("v"),
        )
        .filter(F.col("v").isNotNull())
    )
    w = Window.partitionBy("host").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    star = parsed.withColumn(
        "_ua", F.last(F.when(F.col("k") == "user-agent", F.col("v")), ignorenulls=True).over(w)
    ).filter(F.col("_ua") == "*")
    delays = star.filter(F.col("k") == "crawl-delay").groupBy("host").agg(
        F.max(F.col("v").cast("double")).alias("crawl_delay")
    )
    rules = star.filter(
        F.col("k").isin("allow", "disallow") & (F.col("v") != "")
    ).select("host", F.col("v").alias("rule_prefix"), (F.col("k") == "allow").alias("allow"))
    carrier = delays.join(
        rules.select("host").distinct(), "host", "left_anti"
    ).select("host", F.lit("").alias("rule_prefix"), F.lit(True).alias("allow"))
    out = rules.unionByName(carrier).join(delays, "host", "left")
    return out.select(
        "host",
        "rule_prefix",
        "allow",
        F.col("crawl_delay").cast("double").alias("crawl_delay"),
    )
