"""Text analysis over ``documents``: cleanup, token counting, quality
scoring, language-ID heuristic, fingerprinting.

Crawl-operator lineage: text cleanup is the REF-EXACT F2/F3/F4 chain
(utils/text_utils.go:24-49) applied to document text; fingerprints and
quality stats are the training-data-pipeline extensions.  Outputs are
integers/strings wherever possible so oracle comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import udfs
from .common import T

_TOKENS = "filter(split(text, '\\\\s+'), x -> x != '')"
_TOKENS_DUCK = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"


def text_cleanup(spark: SparkSession, sf: str) -> DataFrame:
    """F4→F2→F3 reference cleanup chain via the engine's Arrow UDF."""
    d = T(spark, sf, "documents")
    return d.select("doc_id", udfs.clean_text_udf(F.col("text")).alias("clean"))


_CLEAN_SQL = """
SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS clean
FROM documents
"""


def token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace tokens + BPE-ish word-piece count (alnum runs) + chars."""
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.expr(f"size({_TOKENS})").alias("ws_tokens"),
        F.expr("size(filter(split(text, '[^A-Za-z0-9]+'), x -> x != ''))").alias(
            "word_tokens"
        ),
        F.length("text").alias("chars"),
    )


_TOKCOUNT_SQL = f"""
SELECT doc_id,
       len({_TOKENS_DUCK}) AS ws_tokens,
       len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), x -> x <> '')) AS word_tokens,
       length(text) AS chars
FROM documents
"""

_STOPWORDS = ["the", "a", "of", "to", "and"]


def quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Quality stats as exact integers: stopword hits, token count, char
    classes, plus an integer score bucket (percent stopwords)."""
    d = T(spark, sf, "documents").withColumn("toks", F.expr(_TOKENS))
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"
    return d.select(
        "doc_id",
        F.expr("size(toks)").alias("n_tokens"),
        F.expr(f"size(filter(toks, x -> array_contains({stop_arr}, x)))").alias("n_stop"),
        F.expr("length(regexp_replace(text, '[^.,;:!?]', ''))").alias("n_punct"),
        F.expr("length(regexp_replace(text, '[^0-9]', ''))").alias("n_digit"),
        F.expr(
            f"CAST(floor(100.0 * size(filter(toks, x -> array_contains({stop_arr}, x))) "
            "/ greatest(size(toks), 1)) AS INT)"
        ).alias("stop_pct"),
    )


_QUALITY_SQL = f"""
WITH d AS (SELECT doc_id, text, {_TOKENS_DUCK} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> list_contains(['the','a','of','to','and'], x))) AS n_stop,
       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
       length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
       CAST(floor(100.0 * len(list_filter(toks, x -> list_contains(['the','a','of','to','and'], x)))
            / greatest(len(toks), 1)) AS INT) AS stop_pct
FROM d
"""

# language-ID heuristic: argmax of marker-token hits, ties -> lexicographic
_MARKERS = {
    "en": ["the", "data", "fast"],
    "es": ["filter", "row", "key"],
    "zh": ["query", "group", "table"],
    "de": ["join", "sort", "hash"],
}


def lang_id_heuristic(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").withColumn("toks", F.expr(_TOKENS))
    counts = [
        F.expr(
            "size(filter(toks, x -> array_contains(array("
            + ", ".join(f"'{w}'" for w in ws)
            + "), x)))"
        ).alias(f"c_{lang}")
        for lang, ws in _MARKERS.items()
    ]
    scored = d.select("doc_id", "lang", *counts)
    # argmax with lexicographic tie-break via greatest over structs
    pairs = ", ".join(f"struct(c_{lang} AS c, '{lang}' AS l)" for lang in sorted(_MARKERS, reverse=True))
    best = f"greatest({pairs}).l"
    return scored.select(
        "doc_id",
        F.expr(best).alias("lang_guess"),
        (F.expr(best) == F.col("lang")).alias("matches_label"),
    )


def _langid_sql() -> str:
    count_cols = ", ".join(
        "len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in ws)
        + "], x))) AS c_" + lang
        for lang, ws in _MARKERS.items()
    )
    unpivot = " UNION ALL ".join(
        f"SELECT doc_id, lang, '{lang}' AS cand, c_{lang} AS cnt FROM c"
        for lang in _MARKERS
    )
    # argmax with (count DESC, lang DESC) tie-break == Spark's
    # greatest(struct(c, l)) pick
    return f"""
WITH d AS (SELECT doc_id, lang, {_TOKENS_DUCK} AS toks FROM documents),
c AS (SELECT doc_id, lang, {count_cols} FROM d),
u AS ({unpivot}),
r AS (
  SELECT doc_id, lang, cand,
         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cand DESC) AS rk
  FROM u
)
SELECT doc_id, cand AS lang_guess, (cand = lang) AS matches_label
FROM r WHERE rk = 1
"""


def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint: md5 of the cleaned text (exact-dup key) —
    portable across engines because both md5 the same UTF-8 bytes."""
    d = T(spark, sf, "documents")
    clean = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return d.select(
        "doc_id", F.md5(clean).alias("fingerprint"), F.length(clean).alias("clean_len")
    )


_FP_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
       length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS clean_len
FROM documents
"""


def winnow_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing (MOSS-style) fingerprint: k-gram md5 hashes, min per
    sliding window of w, distinct mins summarized per doc.  String-min
    keeps it engine-portable."""
    k, w = 8, 4
    d = T(spark, sf, "documents")
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {k - 1}, 1)), "
                f"i -> md5(substring(text, i, {k})))"
            )
        ).alias("pos", "gh"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    mins = grams.withColumn("wmin", F.min("gh").over(win))
    return (
        mins.groupBy("doc_id")
        .agg(
            F.countDistinct("wmin").alias("n_fp"),
            F.md5(F.concat_ws("|", F.array_sort(F.collect_set("wmin")))).alias("fp_set_md5"),
        )
    )


_WINNOW_SQL = """
WITH grams AS (
  SELECT doc_id, i AS pos, md5(substring(text, i, 8)) AS gh
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i) g
),
mins AS (
  SELECT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM grams
)
SELECT doc_id, count(DISTINCT wmin) AS n_fp,
       md5(string_agg(DISTINCT wmin, '|' ORDER BY wmin)) AS fp_set_md5
FROM mins GROUP BY doc_id
"""


# --- corpus curation: the composed pipeline a training-data user runs ------
#
# cleanup -> token-length bounds -> stopword-rate quality gate -> lang ID
# -> exact near-dup collapse on the CLEANED text (keep min doc_id), all
# one declarative DataFrame plan: Catalyst collapses the projections into
# a single scan pass and the only shuffle is the final dedup groupBy
# (partial aggregation map-side).  At 100 TB this is scan -> filter
# (pushed) -> one exchange, which is the minimum the semantics allow.

_CUR_MIN_TOKENS, _CUR_MAX_TOKENS, _CUR_MIN_STOP_PCT = 20, 200, 5


def corpus_curation(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").withColumn("toks", F.expr(_TOKENS))
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"
    lang_pairs = ", ".join(
        "struct(size(filter(toks, x -> array_contains(array("
        + ", ".join(f"'{w}'" for w in ws)
        + f"), x))) AS c, '{lang}' AS l)"
        for lang, ws in sorted(_MARKERS.items(), reverse=True)
    )
    scored = d.select(
        "doc_id",
        F.expr("size(toks)").alias("n_tokens"),
        F.expr(
            f"CAST(floor(100.0 * size(filter(toks, x -> array_contains({stop_arr}, x))) "
            "/ greatest(size(toks), 1)) AS INT)"
        ).alias("stop_pct"),
        F.expr(f"greatest({lang_pairs}).l").alias("lang_guess"),
        F.md5(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))).alias("clean_md5"),
    )
    kept = scored.filter(
        F.col("n_tokens").between(_CUR_MIN_TOKENS, _CUR_MAX_TOKENS)
        & (F.col("stop_pct") >= _CUR_MIN_STOP_PCT)
    )
    return kept.groupBy("clean_md5").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang_guess", "doc_id").alias("lang_guess"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
        F.min_by("stop_pct", "doc_id").alias("stop_pct"),
        F.count("*").alias("dup_count"),
    )


def _curation_sql() -> str:
    count_cols = ", ".join(
        "len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in ws)
        + "], x))) AS c_" + lang
        for lang, ws in _MARKERS.items()
    )
    unpivot = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS cand, c_{lang} AS cnt FROM m"
        for lang in _MARKERS
    )
    return f"""
WITH d AS (SELECT doc_id, text, {_TOKENS_DUCK} AS toks FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CAST(floor(100.0 * len(list_filter(toks, x -> list_contains(['the','a','of','to','and'], x)))
              / greatest(len(toks), 1)) AS INT) AS stop_pct,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS clean_md5,
         {count_cols}
  FROM d),
u AS ({unpivot}),
r AS (SELECT doc_id, cand,
             row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, cand DESC) AS rk
      FROM u),
k AS (
  SELECT m.doc_id, m.n_tokens, m.stop_pct, m.clean_md5, r.cand AS lang_guess
  FROM m JOIN r ON m.doc_id = r.doc_id AND r.rk = 1
  WHERE m.n_tokens BETWEEN {_CUR_MIN_TOKENS} AND {_CUR_MAX_TOKENS}
    AND m.stop_pct >= {_CUR_MIN_STOP_PCT})
SELECT clean_md5,
       min(doc_id) AS doc_id,
       arg_min(lang_guess, doc_id) AS lang_guess,
       arg_min(n_tokens, doc_id) AS n_tokens,
       arg_min(stop_pct, doc_id) AS stop_pct,
       count(*) AS dup_count
FROM k GROUP BY clean_md5
"""


# --- corpus n-gram counts: the LM-training statistic ------------------------

_NGRAM_TOP = 100


def ngram_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level top-{k} bigram counts — the language-model training
    statistic (vocabulary/bigram tables at 100 TB are exactly this
    plan: explode -> partial-agg groupBy -> TakeOrdered top-k; the
    groupBy combines map-side so the shuffle carries one row per
    distinct bigram per partition, and top-k never materializes the
    full sorted table).  Ties pinned (n DESC, bigram ASC) so the LIMIT
    is deterministic."""
    d = T(spark, sf, "documents").select(F.expr(_TOKENS).alias("toks"))
    bg = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
                "i -> concat_ws(' ', toks[i-1], toks[i])) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(_NGRAM_TOP)
    )


_NGRAM_SQL = f"""
WITH d AS (SELECT {_TOKENS_DUCK} AS toks FROM documents),
bg AS (
  SELECT concat_ws(' ', toks[i], toks[i+1]) AS bigram
  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i) g
)
SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
ORDER BY n DESC, bigram ASC LIMIT {_NGRAM_TOP}
"""


# --- OOV rate: vocabulary coverage against the corpus top-k bigram vocab ----
#
# The companion statistic to ngram_counts: once a vocabulary (the top-100
# bigram table, ties pinned) exists, the per-document out-of-vocabulary
# occurrence rate is the coverage metric an LM-data pipeline uses to
# detect domain drift / garbage docs.  Basis points (x10000, floor-div)
# keep the output float-free.
#
# 100 TB shape: the vocab is top-k-bounded (100 rows) -> BROADCAST to the
# gram stream; the per-doc aggregate is one partial-agg groupBy.  The
# expensive side (exploded grams) is never shuffled for the join, only
# for the final doc_id aggregate.


def oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    d = T(spark, sf, "documents").select("doc_id", F.expr(_TOKENS).alias("toks"))
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
                "i -> concat_ws(' ', toks[i-1], toks[i])) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("gram"),
    )
    vocab = ngram_counts(spark, sf).select(
        F.col("bigram").alias("gram"), F.lit(1).alias("in_v")
    )
    j = grams.join(F.broadcast(vocab), "gram", "left")
    return (
        j.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_oov",
            F.expr("(n_oov * 10000) DIV n_grams").alias("oov_bp"),
        )
    )


_OOV_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents),
bg AS (
  SELECT doc_id, concat_ws(' ', toks[i], toks[i+1]) AS gram
  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i) g
),
vocab AS (
  SELECT gram FROM (
    SELECT gram, count(*) AS n FROM bg GROUP BY gram
    ORDER BY n DESC, gram ASC LIMIT {_NGRAM_TOP}
  )
),
j AS (
  SELECT bg.doc_id, CASE WHEN v.gram IS NULL THEN 1 ELSE 0 END AS oov
  FROM bg LEFT JOIN vocab v USING (gram)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       CAST((sum(oov) * 10000) // count(*) AS BIGINT) AS oov_bp
FROM j GROUP BY doc_id
"""


# --- PII scrub: redaction pass over synthesized contact records -------------
#
# The fixtures' document text is PII-free word salad, so the graded input
# is synthesized deterministically from the customer table (same device
# as robots_txt_parse): per-customer contact blurbs with 0-2 emails and
# an optional phone.  Patterns are conservative character classes that
# parse identically under Java regex (Spark) and RE2 (DuckDB).

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
_PHONE_RE = "[+]1-555-[0-9]{4}"

_PII_BODY_SPARK = (
    "concat('contact ', c_name, ' ', "
    "CASE WHEN c_custkey % 3 = 0 THEN concat('cust', CAST(c_custkey AS STRING), '@n', "
    "CAST(c_nationkey AS STRING), '.example ') ELSE '' END, "
    "CASE WHEN c_custkey % 2 = 0 THEN concat('+1-555-', "
    "lpad(CAST(c_custkey % 10000 AS STRING), 4, '0'), ' ') ELSE '' END, "
    "CASE WHEN c_custkey % 7 = 0 THEN concat('alt.', CAST(c_custkey AS STRING), "
    "'@mail.example ') ELSE '' END, 'end')"
)

_PII_BODY_DUCK = (
    "concat('contact ', c_name, ' ', "
    "CASE WHEN c_custkey % 3 = 0 THEN concat('cust', CAST(c_custkey AS VARCHAR), '@n', "
    "CAST(c_nationkey AS VARCHAR), '.example ') ELSE '' END, "
    "CASE WHEN c_custkey % 2 = 0 THEN concat('+1-555-', "
    "lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'), ' ') ELSE '' END, "
    "CASE WHEN c_custkey % 7 = 0 THEN concat('alt.', CAST(c_custkey AS VARCHAR), "
    "'@mail.example ') ELSE '' END, 'end')"
)


def pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over per-customer contact records: count + replace
    emails and phone numbers (JVM regexp, global replace — one codegen
    pass per row, no UDF).  At 100 TB this is the pre-training scrub
    stage: a pure map, no shuffle, filter-pushdown-transparent."""
    c = T(spark, sf, "customer").select(
        F.col("c_custkey").alias("src_id"), F.expr(_PII_BODY_SPARK).alias("body")
    )
    return c.select(
        "src_id",
        F.expr(f"size(regexp_extract_all(body, '{_EMAIL_RE}', 0))").alias("n_emails"),
        F.expr(f"size(regexp_extract_all(body, '{_PHONE_RE}', 0))").alias("n_phones"),
        F.expr(
            f"regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>'), "
            f"'{_PHONE_RE}', '<PHONE>')"
        ).alias("redacted"),
    )


_PII_SQL = f"""
WITH c AS (SELECT c_custkey AS src_id, {_PII_BODY_DUCK} AS body FROM customer)
SELECT src_id,
       len(regexp_extract_all(body, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(body, '{_PHONE_RE}')) AS n_phones,
       regexp_replace(regexp_replace(body, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM c
"""


# ---------------------------------------------------------------------------
# Repetition signals (round 3): the Gopher-style within-document
# repetition filters (Rae et al. 2021 §A1.1, public) — the fraction of
# 2-gram occurrences taken by the single most frequent 2-gram, and the
# fraction occupied by 2-grams that occur more than once.  High values
# mark low-quality/generated text for corpus curation.
def repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc 2-gram repetition stats as exact integers: total 2-gram
    occurrences, the top 2-gram's count, duplicated-occurrence count, and
    both fractions scaled to basis points (x10000, floor-div — float-free
    for the oracle hash).

    100 TB shape: explode -> two codegen hash aggregates keyed on
    (doc_id, gram) then doc_id — per-doc state never exceeds one row per
    distinct gram, so arbitrarily large documents stream through the
    partial aggregate instead of materializing per-doc arrays.
    """
    d = T(spark, sf, "documents").select("doc_id", F.expr(_TOKENS).alias("toks"))
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 2 THEN "
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat_ws(' ', toks[i-1], toks[i])) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.max("cnt").alias("top_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias(
                "dup_cnt"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "top_cnt",
            "dup_cnt",
            F.expr("top_cnt * 10000 DIV n_grams").alias("top_frac_bp"),
            F.expr("dup_cnt * 10000 DIV n_grams").alias("dup_frac_bp"),
        )
    )


_REP_SQL = f"""
WITH g AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
  FROM (SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents),
       LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i) t
),
pg AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_grams,
       CAST(max(cnt) AS BIGINT) AS top_cnt,
       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_cnt,
       CAST(max(cnt) * 10000 // sum(cnt) AS BIGINT) AS top_frac_bp,
       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 10000 // sum(cnt) AS BIGINT)
         AS dup_frac_bp
FROM pg
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Stratified sampling (round 3): deterministic per-language sampling for
# training-mixture construction — exactly k docs per language, selected
# by md5 hash order so the sample is uniform, reproducible, and both
# engines agree bit-for-bit.
_SAMPLE_K = 25


def stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly min(k, group size) docs per ``lang``, the k smallest
    md5('samp:' || doc_id) hashes, ranked 1..k.

    100 TB shape: the declarative single-window form IS the scalable
    one on Spark 4 — Catalyst inserts a *Partial* ``WindowGroupLimit``
    below the exchange (rank-limit pushdown, SPARK-37099), so every map
    partition ships at most k rows per stratum and the per-lang reducer
    sorts (#map partitions × k) rows, never a billion-row stratum.  A
    hand-rolled salted two-phase top-k was measured to produce the same
    bound with one EXTRA exchange — the optimizer's form wins (the plan
    guard pins the Partial limit below the single exchange).
    """
    d = T(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    w = Window.partitionBy("lang").orderBy("h")
    return (
        d.withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= _SAMPLE_K)
        .select("doc_id", "lang", "samp_rank")
    )


_SAMPLE_SQL = f"""
SELECT doc_id, lang, samp_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR))
         ) AS samp_rank
  FROM documents
) WHERE samp_rank <= {_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (round 3): pick K docs with
# inclusion probability proportional to length, the mixture-building
# primitive when strata are too coarse.  Efraimidis–Spirakis (IPL 2006,
# public): draw u~U(0,1) per item, keep the K smallest -ln(u)/w keys —
# exactly a weight-w exponential race, no sequential pass, no rejection.
# u is md5-derived (52 mantissa bits, +1 so u>0) so both engines draw
# identical values.
#
# 100 TB shape: per-row key then global top-K = TakeOrderedAndProject
# (map-side partial top-K, K rows per partition to the driver — never a
# full sort, never a full shuffle).
_ES_K = 100


def weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, lang, n_chars, es_key, samp_rank): the _ES_K docs winning
    the length-weighted exponential race."""
    d = T(spark, sf, "documents")
    u = (
        "(CAST(conv(substring(md5(concat('es:', CAST(doc_id AS STRING))), 1, 13), 16, 10) AS DOUBLE) + 1.0)"
        " / 4503599627370496.0"
    )
    keyed = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.expr(f"-ln({u}) / CAST(n_chars AS DOUBLE)").alias("es_key"),
    )
    w = Window.orderBy("es_key")
    return (
        keyed.orderBy("es_key")
        .limit(_ES_K)
        .withColumn("samp_rank", F.row_number().over(w))
    )


_ES_SQL = f"""
SELECT doc_id, lang, n_chars, es_key,
       CAST(row_number() OVER (ORDER BY es_key) AS INT) AS samp_rank
FROM (
  SELECT doc_id, lang, n_chars,
         -ln((CAST(CAST('0x' || substring(md5('es:' || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) AS DOUBLE) + 1.0)
             / 4503599627370496.0) / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents
)
ORDER BY es_key LIMIT {_ES_K}
"""


# ---------------------------------------------------------------------------
# Context-window chunking (round 3): split each document into overlapping
# token windows — the sequence-prep step every pretraining/RAG pipeline
# runs before packing/embedding.  Window 32 tokens, stride 24 (25%
# overlap); the trailing partial window is kept.
_CHUNK_LEN = 32
_CHUNK_STRIDE = 24


def chunk_documents(spark: SparkSession, sf: str) -> DataFrame:
    """One row per (doc, chunk): 0-based chunk_idx, token count, md5 of
    the space-joined chunk (compact exact value surrogate for the text).

    100 TB shape: pure map — transform over start positions + one
    posexplode, no shuffle at all; chunk state never exceeds the row.
    Docs with no tokens emit nothing.
    """
    d = T(spark, sf, "documents").select("doc_id", F.expr(_TOKENS).alias("toks"))
    return d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"CASE WHEN size(toks) >= 1 THEN "
                f"transform(sequence(1, size(toks), {_CHUNK_STRIDE}), "
                f"s -> concat_ws(' ', slice(toks, s, {_CHUNK_LEN}))) "
                f"ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("chunk_idx", "chunk"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.expr("size(split(chunk, ' '))").alias("chunk_tokens"),
        F.md5("chunk").alias("chunk_md5"),
    )


_CHUNK_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents),
starts AS (
  SELECT doc_id, toks, CAST(s.i AS INT) AS s,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s.i) - 1 AS INT)
           AS chunk_idx
  FROM d, LATERAL (
    SELECT unnest(generate_series(1, greatest(len(toks), 0), {_CHUNK_STRIDE})) AS i
  ) s
),
chunks AS (
  SELECT doc_id, chunk_idx,
         array_to_string(toks[s : least(s + {_CHUNK_LEN} - 1, len(toks))], ' ') AS chunk
  FROM starts
)
SELECT doc_id, chunk_idx,
       len(string_split(chunk, ' ')) AS chunk_tokens,
       md5(chunk) AS chunk_md5
FROM chunks
"""


# ---------------------------------------------------------------------------
# Training-mixture weights (round 3): turn per-language corpus sizes into
# integer sampling quotas — the data-mixing step that decides how much of
# each language/domain a training run draws.  Public multilingual recipes
# (mBERT, XLM-R exponential smoothing) sample with weight ∝ count^alpha,
# alpha ~ 0.3-0.7, to up-weight low-resource strata; alpha = 0.5 here.
# Every step is integer-exact so both engines agree bit-for-bit:
# weight_l = floor(sqrt(n_tokens_l)) (IEEE sqrt is correctly rounded in
# both engines), base quota = floor(BUDGET * w_l / W) by bigint division,
# and the leftover (BUDGET - sum of floors < #langs) goes to the largest
# remainders (tie: lang ASC) — the largest-remainder method, so quotas
# sum to exactly BUDGET.
_MIX_BUDGET = 1_000_000


def mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    """(lang, n_docs, n_tokens, weight, quota): temperature-smoothed
    (alpha=0.5) per-language sampling quotas summing exactly to
    ``_MIX_BUDGET``.

    100 TB shape: ONE partial-agg groupBy over the corpus (map-side
    combine reduces each partition to #langs rows before the shuffle);
    everything after runs on the #langs-row frame, where the unavoidable
    single-partition windows are metadata-scale.
    """
    d = T(spark, sf, "documents").select("lang", F.expr(f"size({_TOKENS})").alias("nt"))
    per = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens")
    )
    per = per.withColumn("weight", F.expr("CAST(floor(sqrt(n_tokens)) AS BIGINT)"))
    wall = Window.partitionBy()
    per = per.withColumn("w_total", F.sum("weight").over(wall)).withColumn(
        "base", F.expr(f"CAST({_MIX_BUDGET} AS BIGINT) * weight DIV w_total")
    )
    leftover = F.lit(_MIX_BUDGET) - F.sum("base").over(wall)
    rem_rank = F.row_number().over(
        Window.orderBy(
            F.desc(F.expr(f"CAST({_MIX_BUDGET} AS BIGINT) * weight % w_total")),
            F.asc("lang"),
        )
    )
    return (
        per.withColumn("extra", (rem_rank <= leftover).cast("long"))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "weight",
            (F.col("base") + F.col("extra")).alias("quota"),
        )
    )


_MIX_SQL = f"""
WITH per AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({_TOKENS_DUCK})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
w AS (
  SELECT lang, n_docs, n_tokens,
         CAST(floor(sqrt(n_tokens)) AS BIGINT) AS weight
  FROM per
),
q AS (
  SELECT lang, n_docs, n_tokens, weight,
         CAST({_MIX_BUDGET} AS BIGINT) * weight // sum(weight) OVER () AS base,
         CAST({_MIX_BUDGET} AS BIGINT) * weight % sum(weight) OVER () AS rem
  FROM w
),
r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, lang ASC) AS rem_rank,
         {_MIX_BUDGET} - sum(base) OVER () AS leftover
  FROM q
)
SELECT lang, n_docs, n_tokens, weight,
       CAST(base + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r
"""


# ---------------------------------------------------------------------------
# BPE merge-candidate mining (round 3): the statistic the first iteration
# of byte-pair-encoding tokenizer training computes — corpus-weighted
# counts of adjacent symbol pairs inside words (Sennrich et al. 2016,
# public).  At 100 TB this is exactly two partial-agg groupBys: the first
# collapses the token stream to the vocabulary (shuffle carries one row
# per distinct word per partition), the second runs over vocab x avg
# word length rows — corpus-size-independent.
_BPE_TOP = 30
_WORDS = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
_WORDS_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def bpe_merge_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """Top-{k} adjacent character pairs weighted by word frequency —
    the argmax of round 1 of BPE training.  Ties pinned (n DESC, pair
    ASC) so the LIMIT is deterministic; repeated pairs inside a word
    ('aaa' -> 'aa' twice) each count, matching the published algorithm.
    """
    d = T(spark, sf, "documents").select(F.explode(F.expr(_WORDS)).alias("word"))
    wf = d.groupBy("word").agg(F.count("*").alias("cnt"))
    pairs = wf.select(
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 THEN "
                "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2)) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


_BPE_SQL = f"""
WITH w AS (
  SELECT unnest({_WORDS_DUCK}) AS word FROM documents
),
wf AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
p AS (
  SELECT substring(word, CAST(i AS INT), 2) AS pair, cnt
  FROM wf, LATERAL (
    SELECT unnest(generate_series(1, length(word) - 1)) AS i
  ) g
  WHERE length(word) >= 2
)
SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair ASC LIMIT {_BPE_TOP}
"""


# ---------------------------------------------------------------------------
# Domain-level quality rollup (round 3): curation policy at the SOURCE
# granularity — public pipelines (C4, RefinedWeb) gate whole domains, not
# just documents, because quality correlates by origin.  Gopher-style
# rule surrogate: a source whose pooled stopword rate is under 2% is
# flagged (gibberish/keyword-stuffing signal).  Integer-exact basis
# points; ONE partial-agg groupBy on source.
_SRC_STOP_BP_MIN = 200


def source_quality_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """(source, n_docs, n_tokens, n_stop, stop_bp, flagged): pooled
    per-source quality stats and the domain gate decision."""
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"
    d = T(spark, sf, "documents").select(
        "source",
        F.expr(f"size({_TOKENS})").alias("nt"),
        F.expr(f"size(filter({_TOKENS}, x -> array_contains({stop_arr}, x)))").alias("ns"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("ns").alias("n_stop"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_stop",
            F.expr("n_stop * 10000 DIV greatest(n_tokens, 1)").alias("stop_bp"),
            F.expr(
                f"n_stop * 10000 DIV greatest(n_tokens, 1) < {_SRC_STOP_BP_MIN}"
            ).alias("flagged"),
        )
    )


_SRCQ_SQL = f"""
WITH d AS (
  SELECT source,
         len({_TOKENS_DUCK}) AS nt,
         len(list_filter({_TOKENS_DUCK}, x -> list_contains(['the','a','of','to','and'], x))) AS ns
  FROM documents
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS n_tokens, CAST(sum(ns) AS BIGINT) AS n_stop
  FROM d GROUP BY source
)
SELECT source, n_docs, n_tokens, n_stop,
       n_stop * 10000 // greatest(n_tokens, 1) AS stop_bp,
       (n_stop * 10000 // greatest(n_tokens, 1)) < {_SRC_STOP_BP_MIN} AS flagged
FROM agg
"""


# --- vocabulary coverage curve ---------------------------------------------------
#
# Tokenizer sizing: what fraction of corpus tokens does a top-k
# vocabulary cover?  The curve (k -> coverage) is THE input to choosing
# vocab size before BPE training (ks are fixture-sized — the synthetic
# corpus has a ~31-token vocabulary; production ks scale with it) (bpe_merge_candidates mines the
# merges; this sizes the budget).  Coverage is basis points (integer
# DIV), so the oracle compare is exact.
#
# 100 TB shape: ONE corpus-wide partial-agg groupBy(token) (map-side
# combine collapses each partition to its local vocab before the
# shuffle); ranking and the cumulative sums then run on the VOCAB-sized
# frame where single-partition windows are metadata-scale (same
# argument as mixture_weights / bpe_merge_candidates).

_VOCAB_KS = (5, 10, 20)
_WORD_TOKS = "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
_WORD_TOKS_DUCK = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)


def vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """(k, vocab_size, covered_bp): corpus-token coverage of the top-k
    vocabulary (rank by count DESC, token ASC)."""
    d = T(spark, sf, "documents")
    counts = (
        d.select(F.explode(F.expr(_WORD_TOKS)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    wall = Window.partitionBy()
    ranked = (
        counts.withColumn("rk", F.row_number().over(w))
        .withColumn("total", F.sum("n").over(wall))
        .withColumn("vocab_size", F.count("*").over(wall))
    )
    parts = [
        ranked.groupBy().agg(
            F.lit(k).cast("int").alias("k"),
            F.max("vocab_size").alias("vocab_size"),
            F.expr(f"sum(CASE WHEN rk <= {k} THEN n ELSE 0 END) * 10000 DIV max(total)")
            .alias("covered_bp"),
        )
        for k in _VOCAB_KS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _vocab_sql() -> str:
    selects = " UNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS k, max(vocab_size) AS vocab_size, "
        f"CAST(sum(CASE WHEN rk <= {k} THEN n ELSE 0 END) * 10000 // max(total) "
        f"AS BIGINT) AS covered_bp "
        f"FROM ranked"
        for k in _VOCAB_KS
    )
    return f"""
WITH toks AS (
  SELECT unnest({_WORD_TOKS_DUCK}) AS tok FROM documents
),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, n,
         row_number() OVER (ORDER BY n DESC, tok ASC) AS rk,
         sum(n) OVER () AS total,
         count(*) OVER () AS vocab_size
  FROM counts
)
{selects}
"""


# --- boilerplate stripping -----------------------------------------------------
#
# Main-content extraction (the JusText / boilerpipe / C4 step): crawled
# pages carry nav bars, footers, and "related" stubs that poison a
# training corpus.  The classifier here is the standard shape — per-LINE
# token density plus NEIGHBOR smoothing (a short line flanked by two
# content lines is content: a heading inside an article survives; a nav
# line at the page edge does not).
#
# Pages are synthesized deterministically from ``documents``: body text
# re-lined 8 tokens per line, wrapped with a nav header, a short
# RELATED stub mid-body, and a footer — each the boilerplate class the
# rule must drop while the smoothing rescues the mid-body stub.
#
# 100 TB shape: construction + per-line features are a pure map
# (posexplode of a transform); the lag/lead smoothing and the ordered
# re-assembly share ONE hash exchange on doc_id (window + groupBy use
# the same key); output is (counts, md5) so rows stay small.  All
# JVM-side — no UDF anywhere.

_BP_LINE_TOKS = 8  # tokens per synthesized body line
_BP_MIN_TOKS = 5  # content threshold


def boilerplate_strip(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, n_lines, n_kept, kept_tokens, kept_md5) after dropping
    low-density lines not rescued by two content neighbors."""
    d = T(spark, sf, "documents").select(
        "doc_id", F.expr(_TOKENS).alias("toks")
    )
    lined = d.select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(toks) >= 1 THEN "
            f"transform(sequence(1, size(toks), {_BP_LINE_TOKS}), "
            f"s -> concat_ws(' ', slice(toks, s, {_BP_LINE_TOKS}))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        ).alias("body"),
    )
    pages = lined.select(
        "doc_id",
        F.posexplode(
            F.expr(
                """concat(
  array(concat('NAV home about doc', CAST(doc_id % 7 AS STRING))),
  slice(body, 1, 1),
  array(concat('RELATED: doc', CAST(doc_id % 9 AS STRING))),
  CASE WHEN size(body) > 1 THEN slice(body, 2, size(body) - 1)
       ELSE CAST(array() AS ARRAY<STRING>) END,
  array(concat('(c) h', CAST(doc_id % 5 AS STRING), '.test rights'))
)"""
            )
        ).alias("pos", "line"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    feat = pages.withColumn(
        "content", F.expr(f"size(split(line, ' ')) >= {_BP_MIN_TOKS}")
    ).withColumn(
        "keep",
        F.expr("content")
        | (
            F.coalesce(F.lag("content").over(w), F.lit(False))
            & F.coalesce(F.lead("content").over(w), F.lit(False))
        ),
    )
    return feat.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.expr("CAST(keep AS BIGINT)")).alias("n_kept"),
        F.sum(
            F.expr("CASE WHEN keep THEN size(split(line, ' ')) ELSE 0 END").cast("long")
        ).alias("kept_tokens"),
        F.md5(
            F.expr(
                "concat_ws(char(10), transform("
                "array_sort(collect_list(CASE WHEN keep THEN struct(pos, line) END)),"
                " s -> s.line))"
            )
        ).alias("kept_md5"),
    )


_BP_SQL = f"""
WITH d AS (SELECT doc_id, {_TOKENS_DUCK} AS toks FROM documents),
lined AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 1 THEN
           list_transform(generate_series(1, len(toks), {_BP_LINE_TOKS}),
             s -> array_to_string(toks[s : least(s + {_BP_LINE_TOKS} - 1, len(toks))], ' '))
         ELSE [] END AS body
  FROM d
),
assembled AS (
  SELECT doc_id,
         [concat('NAV home about doc', CAST(doc_id % 7 AS VARCHAR))]
           || body[1:1]
           || [concat('RELATED: doc', CAST(doc_id % 9 AS VARCHAR))]
           || (CASE WHEN len(body) > 1 THEN body[2:]
                    ELSE CAST([] AS VARCHAR[]) END)
           || [concat('(c) h', CAST(doc_id % 5 AS VARCHAR), '.test rights')]
           AS ls
  FROM lined
),
pages AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos, ls[i] AS line
  FROM assembled, LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i) u
),
feat AS (
  SELECT doc_id, pos, line,
         len(string_split(line, ' ')) >= {_BP_MIN_TOKS} AS content
  FROM pages
),
flagged AS (
  SELECT doc_id, pos, line, content,
         (content OR (coalesce(lag(content) OVER w, false)
                      AND coalesce(lead(content) OVER w, false))) AS keep
  FROM feat
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN keep THEN len(string_split(line, ' ')) ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
                      FILTER (WHERE keep), '')) AS kept_md5
FROM flagged
GROUP BY doc_id
"""


# --- training-sequence packing -------------------------------------------------
#
# The last mile of a pre-training pipeline: documents are concatenated
# in a deterministic order and chopped into fixed-token-budget training
# sequences (the standard GPT-style pack-and-split — a document that
# crosses a boundary straddles two sequences).  Packing is defined per
# (lang, shard) with shard = doc_id % _PACK_SHARDS, which makes it
# embarrassingly parallel at corpus scale: each shard packs its own
# token stream independently, so 100 TB of text is N_lang x N_shard
# independent window problems instead of one global serial scan — the
# only shuffle is the hash partition on the (lang, shard) key, and skew
# is bounded by construction (shards are uniform in doc_id).
#
# The closed form makes it window-expressible end-to-end (no UDF, no
# recursion): with cum = running token sum, a doc occupies
# [cum - tok, cum); its first sequence is (cum - tok) / budget and it
# straddles iff (cum - 1) / budget differs.

_PACK_BUDGET = 128  # tokens per training sequence
_PACK_SHARDS = 8


def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """(lang, shard, doc_id, tok, seq_id, start_off, straddles) — each
    document's position in the packed fixed-budget token stream."""
    d = T(spark, sf, "documents")
    toks = d.select(
        "lang",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        "doc_id",
        F.expr(f"CAST(size({_TOKENS}) AS BIGINT)").alias("tok"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum", F.sum("tok").over(w))
    return cum.select(
        "lang",
        "shard",
        "doc_id",
        "tok",
        F.expr(f"(cum - tok) DIV {_PACK_BUDGET}").alias("seq_id"),
        F.expr(f"(cum - tok) % {_PACK_BUDGET}").alias("start_off"),
        F.expr(f"(cum - 1) DIV {_PACK_BUDGET} > (cum - tok) DIV {_PACK_BUDGET}").alias(
            "straddles"
        ),
    )


_PACK_SQL = f"""
WITH toks AS (
  SELECT lang, doc_id % {_PACK_SHARDS} AS shard, doc_id,
         CAST(len({_TOKENS_DUCK}) AS BIGINT) AS tok
  FROM documents
),
cums AS (
  SELECT lang, shard, doc_id, tok,
         sum(tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
)
SELECT lang, shard, doc_id, tok,
       CAST((cum - tok) // {_PACK_BUDGET} AS BIGINT) AS seq_id,
       CAST((cum - tok) % {_PACK_BUDGET} AS BIGINT) AS start_off,
       (cum - 1) // {_PACK_BUDGET} > (cum - tok) // {_PACK_BUDGET} AS straddles
FROM cums
"""


# ---------------------------------------------------------------------------
# Unigram-LM document scoring (round 3): the CCNet/Gopher-style quality
# filter — train a unigram model on the corpus (top-K vocabulary by
# count), then score every document by its mean token log-probability;
# low scorers are gibberish/boilerplate, suspiciously high scorers are
# repetitive.  Two-pass broadcast-model shape: pass 1 is ONE partial-agg
# groupBy(token) + TakeOrdered top-K (the model, K rows, broadcastable);
# pass 2 explodes docs, broadcast-joins the model, and re-aggregates per
# doc — the corpus is shuffled once per pass, the model never.
# Out-of-vocabulary tokens take a fixed floor logprob (ln of half the
# smallest vocab probability) so the score is total, not partial.
_LM_K = 512


def doc_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, n_tok, n_oov, avg_logprob) under the corpus-trained
    top-_LM_K unigram model."""
    d = T(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.expr(_WORD_TOKS)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    wall = Window.partitionBy()
    model = (
        counts.withColumn("total", F.sum("n").over(wall))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(_LM_K)
        .select("tok", F.expr("ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))").alias("lp"))
    )
    floor = model.groupBy().agg((F.min("lp") - F.lit(float(_LN2))).alias("floor_lp"))
    scored = (
        toks.join(F.broadcast(model), "tok", "left")
        .crossJoin(F.broadcast(floor))
        .select("doc_id", F.coalesce("lp", "floor_lp").alias("lp"),
                F.col("lp").isNull().alias("oov"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.col("oov").cast("bigint")).alias("n_oov"),
        (F.sum("lp") / F.count("*")).alias("avg_logprob"),
    )


_LN2 = 0.6931471805599453

_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORD_TOKS_DUCK}) AS tok FROM documents
),
counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
model AS (
  SELECT tok, ln(CAST(n AS DOUBLE) / CAST((SELECT sum(n) FROM counts) AS DOUBLE)) AS lp
  FROM counts ORDER BY n DESC, tok ASC LIMIT {_LM_K}
),
fl AS (SELECT min(lp) - {_LN2!r} AS floor_lp FROM model)
SELECT doc_id,
       count(*) AS n_tok,
       CAST(sum(CASE WHEN m.lp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       sum(coalesce(m.lp, fl.floor_lp)) / count(*) AS avg_logprob
FROM toks t LEFT JOIN model m USING (tok), fl
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Block-shuffle manifest (round 3): the approximate global shuffle every
# 100 TB training run uses instead of a true one — docs are hashed into
# B independent blocks and ordered WITHIN the block by a second salt;
# an epoch reads blocks sequentially, so any training window mixes
# ~corpus/B of the data while the corpus itself crosses exactly ONE
# (block)-keyed exchange.  A true global shuffle would range-partition
# and sort all 100 TB; this is the standard trade (shuffle quality
# bounded by B) and B scales with executor count.
_SHUF_BLOCKS = 16


def block_shuffle_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, block, pos): epoch read order is (block, pos); both
    coordinates are md5-derived so the permutation is deterministic."""
    d = T(spark, sf, "documents").select(
        "doc_id",
        F.expr(
            "CAST(conv(substring(md5(concat('blk:', CAST(doc_id AS STRING))), 1, 7), 16, 10) AS BIGINT)"
            f" % {_SHUF_BLOCKS}"
        ).alias("block"),
        F.md5(F.concat(F.lit("ord:"), F.col("doc_id").cast("string"))).alias("_ord"),
    )
    w = Window.partitionBy("block").orderBy("_ord")
    return d.select(
        "doc_id", "block", (F.row_number().over(w) - 1).cast("long").alias("pos")
    )


_SHUF_SQL = f"""
SELECT doc_id, block, CAST(row_number() OVER (PARTITION BY block ORDER BY ord) - 1 AS BIGINT) AS pos
FROM (
  SELECT doc_id,
         CAST(('0x' || substring(md5('blk:' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
           % {_SHUF_BLOCKS} AS block,
         md5('ord:' || CAST(doc_id AS VARCHAR)) AS ord
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Source lexical-similarity matrix (round 3): pairwise cosine between
# per-source token-COUNT vectors — the mixture-planning diagnostic that
# shows which sources are lexically redundant before weights are
# assigned.  All dot products are INTEGER sums (exact): the only float
# is the final normalize, rounded.  Scale shape: token postings join
# pairs sources per shared token, so work is vocab x S^2 where S
# (#sources) is the SMALL dimension of a corpus — never doc x doc.


def source_similarity(spark: SparkSession, sf: str) -> DataFrame:
    """(source_a, source_b, dot, cos_sim) for every source pair."""
    d = T(spark, sf, "documents")
    counts = (
        d.select("source", F.explode(F.expr(_WORD_TOKS)).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    norms = counts.groupBy("source").agg(
        F.expr("sqrt(CAST(sum(c * c) AS DOUBLE))").alias("nrm")
    )
    a = counts.select(
        F.col("source").alias("source_a"), "tok", F.col("c").alias("ca")
    )
    b = counts.select(
        F.col("source").alias("source_b"), "tok", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(F.col("source").alias("source_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("source").alias("source_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "dot",
            F.expr("round(dot / (na * nb), 6)").alias("cos_sim"),
        )
    )


_SRCSIM_SQL = f"""
WITH counts AS (
  SELECT source, tok, count(*) AS c
  FROM (SELECT source, unnest({_WORD_TOKS_DUCK.replace('text', 'text')}) AS tok FROM documents)
  GROUP BY source, tok
),
norms AS (SELECT source, sqrt(CAST(sum(c * c) AS DOUBLE)) AS nrm FROM counts GROUP BY source),
dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM counts a JOIN counts b USING (tok)
  WHERE a.source < b.source
  GROUP BY a.source, b.source
)
SELECT d.source_a, d.source_b, d.dot,
       round(d.dot / (na.nrm * nb.nrm), 6) AS cos_sim
FROM dots d
JOIN norms na ON na.source = d.source_a
JOIN norms nb ON nb.source = d.source_b
"""


QUERIES = {
    "text_cleanup": text_cleanup,
    "token_count": token_count,
    "quality_score": quality_score,
    "lang_id_heuristic": lang_id_heuristic,
    "doc_fingerprint": doc_fingerprint,
    "winnow_fingerprints": winnow_fingerprints,
    "corpus_curation": corpus_curation,
    "ngram_counts": ngram_counts,
    "oov_rate": oov_rate,
    "pii_scrub": pii_scrub,
    "repetition_signals": repetition_signals,
    "stratified_sample": stratified_sample,
    "chunk_documents": chunk_documents,
    "mixture_weights": mixture_weights,
    "bpe_merge_candidates": bpe_merge_candidates,
    "source_quality_rollup": source_quality_rollup,
    "pack_sequences": pack_sequences,
    "boilerplate_strip": boilerplate_strip,
    "vocab_coverage": vocab_coverage,
    "weighted_sample": weighted_sample,
    "doc_lm_score": doc_lm_score,
    "block_shuffle_manifest": block_shuffle_manifest,
    "source_similarity": source_similarity,
}

ORACLES = {
    "text_cleanup": _CLEAN_SQL,
    "token_count": _TOKCOUNT_SQL,
    "quality_score": _QUALITY_SQL,
    "lang_id_heuristic": _langid_sql(),
    "doc_fingerprint": _FP_SQL,
    "winnow_fingerprints": _WINNOW_SQL,
    "corpus_curation": _curation_sql(),
    "ngram_counts": _NGRAM_SQL,
    "oov_rate": _OOV_SQL,
    "pii_scrub": _PII_SQL,
    "repetition_signals": _REP_SQL,
    "stratified_sample": _SAMPLE_SQL,
    "chunk_documents": _CHUNK_SQL,
    "mixture_weights": _MIX_SQL,
    "bpe_merge_candidates": _BPE_SQL,
    "source_quality_rollup": _SRCQ_SQL,
    "pack_sequences": _PACK_SQL,
    "boilerplate_strip": _BP_SQL,
    "vocab_coverage": _vocab_sql(),
    "weighted_sample": _ES_SQL,
    "doc_lm_score": _LM_SQL,
    "block_shuffle_manifest": _SHUF_SQL,
    "source_similarity": _SRCSIM_SQL,
}
