"""D3 — the URL-seen table.

Reference: in-memory ``map[string]bool`` keyed by the normalized URL,
scoped per seed (/root/reference/functions/main_functions.go:30-31,45-51).
Here: an append-only snapshot table keyed by ``(seed_idx, url_canon)``
— ``seed_idx`` in the key reproduces the per-seed reset [REF-EXACT] —
with the first fetch sequence and round for lineage.  Robots-denied URLs
are NOT recorded here (they are re-evaluated if re-linked): the seen set
must stay REF-EXACT — only fetched/attempted URLs enter it, matching the
oracle's visited map (main_functions.go:45-51).
"""

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SEEN_SCHEMA = StructType(
    [
        StructField("seed_idx", IntegerType()),
        StructField("url_canon", StringType()),
        StructField("first_seq", LongType()),
        StructField("round", IntegerType()),
    ]
)
