"""Image-axis ops: pHash near-dup (banded LSH ≡ all-pairs oracle) and
decode->resize->feature extraction vs the pure-python golden."""

import pandas as pd
import pytest

from grabspark.ops import images as im
from tests.make_golden import build_image_features_golden, build_image_neardup_golden


def _sorted_rows(pdf: pd.DataFrame) -> list[tuple]:
    return sorted(map(tuple, pdf.to_numpy().tolist()))


def test_phash_near_dup_equals_allpairs_oracle(spark):
    """The banded 4x16 LSH join must find EXACTLY the pairs the
    all-pairs hamming scan finds at <= HAM_MAX (recall 1.0 guaranteed
    by pigeonhole; precision 1.0 by the exact verify)."""
    got = im.image_phash_near_dup(spark, "unused").toPandas()
    want = build_image_neardup_golden()
    assert _sorted_rows(got) == _sorted_rows(want)
    assert len(want) > 0  # the corpus genuinely contains near-dups


def test_requant_twins_all_detected(spark):
    """Every re-encoded twin must pair with its base image: a qraw
    re-encode moves each channel by <= 2, which cannot flip more than
    HAM_MAX DCT sign bits on this corpus."""
    got = im.image_phash_near_dup(spark, "unused").toPandas()
    pairs = {(a, b) for a, b in zip(got["img_a"], got["img_b"])}
    corpus = im.build_image_corpus()
    twins = [i for i in corpus["image_id"] if i.endswith("#requant")]
    assert len(twins) > 10
    for t in twins:
        base = t[: -len("#requant")]
        assert (base, t) in pairs or (t, base) in pairs


def test_image_features_match_golden(spark):
    got = im.image_features(spark, "unused").toPandas()
    want = build_image_features_golden()
    got = got.sort_values("image_id").reset_index(drop=True)
    want = want.sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"w": "int32", "h": "int32"}), want, check_exact=True
    )


def test_near_dup_plan_is_bucketed_not_allpairs(spark):
    """Candidate generation must be an equi-join on (band, bucket) —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere.  (The
    public query materializes its result to release the band cache, so
    the assertion runs on the inner pipeline it executes.)"""
    from tests.test_plans import plan

    p = plan(im._banded_near_dup_pairs(im.phash_signatures(im._corpus_df(spark))))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_near_dup_decodes_each_image_once(spark):
    """The banded self-join must consume the persisted signature frame:
    exactly one Python decode/hash kernel in the executed plan (an
    unpersisted self-join runs it once per side — every image decoded
    twice)."""
    import re

    persisted = []
    df = im._banded_near_dup_pairs(
        im.phash_signatures(im._corpus_df(spark)), persisted
    )
    try:
        df.collect()
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        n_kernels = len(re.findall(r"\(\d+\) MapInPandas", p))
        assert n_kernels <= 1, f"decode kernel appears {n_kernels}x in executed plan"
        assert "InMemoryTableScan" in p or "TableCacheQueryStage" in p
    finally:
        for d in persisted:
            d.unpersist()


def test_near_dup_queries_release_their_caches(spark):
    """The public pair queries materialize and release the band cache —
    no persisted RDDs accumulate across invocations."""
    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    before = n_persisted()
    assert im.image_phash_near_dup(spark, "unused").count() > 0
    assert im.image_dhash_near_dup(spark, "unused").count() > 0
    assert n_persisted() <= before
