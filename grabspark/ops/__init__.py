"""Query/operator surface for the driver correctness gate.

Each module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL over the
pre-registered testdata views).  Names map 1:1 onto the operator
inventory in SURVEY.md §2 (crawl-dataflow operators expressed over the
TPC-H-ish fixtures) plus the training-data-pipeline operators (dedup,
similarity, text analysis) the engine provides at 100 TB scale.

Output discipline (driver compares row-count + schema + order-insensitive
value-hash): every computed column is aliased identically in the Spark
plan and the SQL; floating outputs are either avoided (integer/string
surrogates) or rounded on both sides; LIMIT/top-k is only used with a
total deterministic ordering.
"""

from . import crawlgraph, dedup, images, multimodal, relational, similarity, table_ops, textstats

_MODULES = (relational, dedup, similarity, textstats, table_ops, multimodal, images, crawlgraph)


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
