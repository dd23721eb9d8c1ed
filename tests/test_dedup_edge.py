"""Edge-case guard for the shingle builder (ADVICE r1, high): docs with
fewer than 3 tokens must emit no shingles — under Spark 4 ANSI mode an
unguarded sequence(1, size-2) is descending and throws
INVALID_ARRAY_INDEX; with ANSI off it fabricates spurious shingles that
diverge from DuckDB.  Also checks the document-frequency stop-list keeps
Spark and DuckDB agreeing on a corpus with a hot boilerplate shingle."""

import os

import duckdb
import pytest

from grabspark.ops import dedup


@pytest.fixture(scope="module")
def edge_sf(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("dedupedge")
    docs = [
        (0, ""),  # empty
        (1, "one"),  # 1 token
        (2, "two tokens"),  # 2 tokens
        (3, "exactly three tokens"),  # minimum shingle-able
        (4, "a b c d e f g"),
        (5, "a b c d e f g"),  # exact dup of 4
        (6, "a b c d e f h"),  # near dup of 4
        (7, "   "),  # whitespace only
    ]
    # 120 docs sharing one boilerplate shingle ("common boiler plate"):
    # df=120 > _MAX_DF=100, so the stop-list must drop it in BOTH engines
    # (without the guard these alone create 120*119/2 = 7140 join pairs)
    docs += [
        (100 + i, f"common boiler plate unique{i} tail{i}") for i in range(120)
    ]
    # a 12-doc near-dup CHAIN (each window shares exactly one 3-gram
    # shingle with its successor: J = 1/15 >= 0.05; none with anything
    # further): components must merge it into ONE cluster, which takes
    # the hash-min loop ~11 propagation rounds — multi-round convergence
    stream = [f"ch{i}" for i in range(7 * 11 + 10)]
    docs += [
        (300 + i, " ".join(stream[7 * i : 7 * i + 10])) for i in range(12)
    ]
    spark.createDataFrame(docs, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(base), "documents.parquet"))
    return str(base)


def _duck(sf_dir):
    con = duckdb.connect()
    # Spark writes documents.parquet as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet', '*.parquet')}'"
    )
    return con


@pytest.mark.parametrize(
    "name",
    ["dedup_ngram_jaccard", "minhash_signatures", "dedup_minhash_lsh", "dedup_simhash",
     "ngram_hot_shingles", "dedup_components"],
)
def test_short_docs_do_not_break_or_diverge(spark, edge_sf, name):
    sdf = dedup.QUERIES[name](spark, edge_sf)
    srows = sorted(tuple(str(v) for v in r) for r in sdf.collect())
    con = _duck(edge_sf)
    orows = sorted(tuple(str(v) for v in r) for r in con.execute(dedup.ORACLES[name]).fetchall())
    con.close()
    assert srows == orows


def test_short_docs_emit_no_shingles(spark, edge_sf):
    sh = dedup._shingles_df(spark, edge_sf)
    by_doc = {r.doc_id for r in sh.select("doc_id").distinct().collect()}
    assert by_doc.isdisjoint({0, 1, 2, 7})
    assert 3 in by_doc


def test_components_merge_chain_into_one_cluster(spark, edge_sf):
    """The 12-doc chain is connected only through consecutive hops, so a
    single-round min-propagation would leave it fragmented; the loop
    must iterate to convergence and label all 12 with the chain's min
    doc_id."""
    out = {
        r.doc_id: (r.component, r.csize)
        for r in dedup.QUERIES["dedup_components"](spark, edge_sf).collect()
    }
    chain = [300 + i for i in range(12)]
    assert all(d in out for d in chain)
    assert {out[d] for d in chain} == {(300, 12)}
    # exact-dup pair 4/5 and near-dup 6 form one separate component
    assert out[4] == out[5] == out[6] == (4, 3)


def test_two_phase_cc_matches_min_label_and_converges_in_log_rounds(spark, edge_sf):
    """The O(log n) large-star/small-star contraction must agree
    label-for-label with the O(diameter) min-label oracle, and the
    12-hop chain (min-label needs ~11 rounds) must converge in
    <= ceil(log2 12) + 2 = 6 star rounds."""
    import math

    pairs = (
        dedup.dedup_ngram_jaccard(spark, edge_sf)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    fast, fast_rounds = dedup.cc_two_phase(pairs, n_parts=4)
    slow, slow_rounds = dedup.cc_min_label(pairs, n_parts=4)
    got = {(r.node, r.lab) for r in fast.collect()}
    want = {(r.node, r.lab) for r in slow.collect()}
    assert got == want
    assert slow_rounds >= 11  # the chain really is the O(diameter) case
    assert fast_rounds <= math.ceil(math.log2(12)) + 2
