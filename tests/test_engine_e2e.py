"""End-to-end: CrawlEngine (round-based DataFrame jobs) must reproduce the
oracle's (sequential Go transliteration) exact fetch order, seen set, and
page records [REF-EXACT], plus the input_hint per-row image invariant."""

import tempfile

import pytest
from pyspark.sql import functions as F

import tests.oracle as oracle
from grabspark import synth
from grabspark.config import BloomConfig, EngineConfig
from grabspark.engine import CrawlEngine


@pytest.fixture(scope="module")
def crawl_setup(spark, tmp_path_factory):
    spec = synth.StoreSpec(n_hosts=3, pages_per_host=10, out_degree=4, seed=42)
    store = synth.build_store(spec)
    base = tmp_path_factory.mktemp("crawl")
    store_path = str(base / "store.parquet")
    synth.write_store_parquet(store, store_path)
    seeds = synth.default_seeds(spec)
    golden = oracle.crawl(store.by_id, seeds)
    return spec, store, store_path, seeds, golden, base


def run_engine(spark, store_path, seeds, run_dir, **cfg_kw):
    cfg = EngineConfig(run_dir=str(run_dir), store_path=store_path, **cfg_kw)
    eng = CrawlEngine(spark, cfg)
    eng.start(seeds)
    return eng


def engine_trace_rows(eng):
    return [
        (r.seed_idx, r.fetch_seq, r.url, r.url_canon, r.host, r.ok)
        for r in eng.trace_df()
        .orderBy("seed_idx", "fetch_seq")
        .select("seed_idx", "fetch_seq", "url", "url_canon", "host", "ok")
        .collect()
    ]


@pytest.fixture(scope="module")
def engine_run(spark, crawl_setup):
    spec, store, store_path, seeds, golden, base = crawl_setup
    eng = run_engine(spark, store_path, seeds, base / "run_main")
    return eng


def test_trace_exact_order(engine_run, crawl_setup):
    *_, golden, _ = crawl_setup
    got = engine_trace_rows(engine_run)
    want = [(s, q, u, c, h, ok) for (s, q, u, c, h, ok) in golden.trace]
    assert got == want


def test_seen_set_exact(engine_run, crawl_setup):
    *_, golden, _ = crawl_setup
    got = {
        (r.seed_idx, r.url_canon)
        for r in engine_run.seen_df().select("seed_idx", "url_canon").collect()
    }
    assert got == golden.seen


def test_page_records_exact(engine_run, crawl_setup):
    *_, golden, _ = crawl_setup
    got = {
        (r.seed_idx, r.fetch_seq, r.url, r.title, r.content)
        for r in engine_run.pages_df()
        .select("seed_idx", "fetch_seq", "url", "title", "content")
        .collect()
    }
    assert got == set(golden.pages)


def test_image_validation_invariant(engine_run, crawl_setup):
    """input_hint: decoded-pixel allclose (PSNR>=40dB lossy) + caption
    equality + phash match for every fetched row."""
    spec, store, *_ = crawl_setup
    pages = engine_run.pages_df()
    n = pages.count()
    assert n > 0
    assert pages.filter(~F.col("pixels_ok")).count() == 0
    assert pages.filter(~F.col("phash_ok")).count() == 0
    assert pages.filter(F.col("fmt") == "qraw").filter(F.col("psnr_db") < 40.0).count() == 0
    # caption equality vs the store
    store_df = pages.sparkSession.createDataFrame(store.pdf[["image_id", "caption"]])
    mismatch = (
        pages.select("image_id", F.col("caption").alias("got"))
        .join(store_df.withColumnRenamed("caption", "want"), "image_id")
        .filter(F.col("got") != F.col("want"))
    )
    assert mismatch.count() == 0


def test_failed_rows_have_no_payload(engine_run):
    failed = engine_run.trace_df().filter(~F.col("ok"))
    assert failed.count() > 0
    assert failed.filter(F.col("image_id").isNotNull()).count() == 0
    assert failed.filter(F.col("n_links") != 0).count() == 0


def test_metrics_emitted(engine_run):
    m = engine_run.metrics_df()
    scopes = {r.scope for r in m.select("scope").distinct().collect()}
    assert {"round", "host", "partition"} <= scopes
    sched = (
        m.filter((F.col("scope") == "round") & (F.col("metric") == "scheduled"))
        .agg(F.sum("value"))
        .first()[0]
    )
    assert int(sched) == engine_run.trace_df().count()


def test_bloom_disabled_same_result(spark, crawl_setup):
    spec, store, store_path, seeds, golden, base = crawl_setup
    eng = run_engine(
        spark, store_path, seeds, base / "run_nobloom", bloom=BloomConfig(enabled=False)
    )
    got = engine_trace_rows(eng)
    assert got == [tuple(t) for t in golden.trace]


def test_budget_mode_invariants(spark, crawl_setup):
    """per_host budget: same fetched SET (politeness reorders, never
    drops), per-host per-round budget respected, priority order kept
    within each host."""
    spec, store, store_path, seeds, golden, base = crawl_setup
    eng = run_engine(
        spark,
        store_path,
        seeds,
        base / "run_budget",
        budget_mode="per_host",
        tick_seconds=3.0,
        default_crawl_delay=1.0,  # budget = 3 fetches/host/round
    )
    trace = eng.trace_df()
    # same set of (seed, canon) attempted as the oracle
    got = {(r.seed_idx, r.url_canon) for r in trace.select("seed_idx", "url_canon").collect()}
    assert got == golden.seen
    # budget respected
    per_round_host = trace.groupBy("round", "host").count().collect()
    assert all(r["count"] <= 3 for r in per_round_host)
    # within a host, scheduling follows priority order: fetch_seq within a
    # seed+host increases with (parent_seq, link_idx) round by round
    rows = trace.orderBy("seed_idx", "host", "fetch_seq").select(
        "seed_idx", "host", "round", "parent_seq", "link_idx"
    ).collect()
    # rounds are non-decreasing in fetch order per (seed, host)
    last = {}
    for r in rows:
        k = (r.seed_idx, r.host)
        if k in last:
            assert r.round >= last[k]
        last[k] = r.round
