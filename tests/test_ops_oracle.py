"""Mirror of the driver's correctness gate: run every queries() entry and
its oracle_sql() on the same parquet fixtures, compare row count + column
names + order-insensitive values (floats rounded)."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("GRABSPARK_TEST_SF", "/root/testdata/sf0.001")


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = _duck(SF_DIR)
    yield con
    con.close()


def _oracle_names():
    import __spark_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, spark, duck, contract):
    # the crawl/export golden oracles are sf-adaptive (they select the
    # committed golden by the registered customer view's row count), so
    # the SQL runs unmodified at every pytest SF — same as the driver.
    queries, oracles = contract
    sdf = queries[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    got = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])

    res = duck.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    want = _rows_to_set(ocols, orows)

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: values differ\n spark: {got[:3]}\n duck:  {want[:3]}"


def test_no_oracle_emits_decimal_types(duck, contract):
    """DuckDB promotes sum(BIGINT) to HUGEINT, which Arrow surfaces as
    decimal128(38,0); the driver's type-sensitive value hash then rejects
    a value-exact Spark int64 result (round-4 pack_sequences red row).
    Catch the whole class: no oracle may type any column (or nested
    element) as HUGEINT/DECIMAL — cast to BIGINT/DOUBLE at the source."""
    _, oracles = contract
    offenders = {}
    for name, sql in oracles.items():
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in rows
            if "HUGEINT" in typ.upper() or "DECIMAL" in typ.upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles emitting hash-unstable types: {offenders}"


_TZ_TOUCHING = [
    "metrics_rollup", "event_window_agg", "sessionize_events",
    "recrawl_priority", "adaptive_crawl_delay", "zorder_layout_plan",
    "latency_quantile_sketch", "host_circuit_breaker",
    "politeness_schedule", "frontier_snapshot_diff",
]


def test_time_ops_are_session_timezone_free(spark, duck, contract):
    """An external grading driver may not run with
    spark.sql.session.timeZone=UTC (ADVICE r4): every op that touches
    the events timestamp must match its oracle under an extreme
    non-UTC session timezone too (ts is TIMESTAMP_NTZ; all derivations
    use wall-clock diffs from fixed NTZ origins, never unix_timestamp)."""
    queries, oracles = contract
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    try:
        for name in _TZ_TOUCHING:
            sdf = queries[name](spark, SF_DIR)
            got = _rows_to_set(sdf.columns, [list(r) for r in sdf.collect()])
            res = duck.execute(oracles[name])
            cols = [d[0] for d in res.description]
            want = _rows_to_set(cols, res.fetchall())
            assert got == want, f"{name} drifts under a non-UTC session tz"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_every_query_has_an_oracle(contract):
    """Round 2 closed the two rows-only gaps: every queries() entry now
    carries a DuckDB oracle (golden parquet for the crawl trace + image
    validation, SQL for everything else)."""
    queries, oracles = contract
    assert set(queries) - set(oracles) == set()
