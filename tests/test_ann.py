"""Bucketed ANN (ann_lsh_topk) vs the brute-force baseline: the multi-
probe LSH query must return genuinely near neighbours — recall vs the
exact top-10 is logged and must clear a floor; the centroid-based
knn path must agree with the all-pairs form on the winner."""

import os

from grabspark.ops import similarity

SF_DIR = os.environ.get("GRABSPARK_TEST_SF", "/root/testdata/sf0.001")


def test_ann_lsh_recall_vs_brute_force(spark):
    exact = [r.vec_id for r in similarity.ann_cosine_topk(spark, SF_DIR).collect()]
    approx = [r.vec_id for r in similarity.ann_lsh_topk(spark, SF_DIR).collect()]
    assert approx, "bucketed ANN returned no candidates"
    recall = len(set(exact) & set(approx)) / len(exact)
    print(f"# ann_lsh_topk recall@10 = {recall:.2f} ({len(approx)} returned)")
    # 16 tables x (8-plane bucket + hamming<=1 probes): recall compounds
    # across tables (deterministic per fixture; measured 0.7 at sf0.001,
    # 0.9 at sf0.01 — the fixtures' near-random embeddings are the
    # adversarial case, see similarity._N_TABLES).  Floor just below
    # measured so a half-recall regression fails loudly.
    assert recall >= 0.6


def test_lsh_sig_kernel_matches_expr_form(spark):
    """The Arrow matmul signature kernel (similarity._lsh_sig_table) must
    emit bit-identical (vec_id, t, bucket) rows to the JVM fold form it
    replaced — the DuckDB gate oracle replays the fold form, so any sign
    divergence here would surface as a hash mismatch in the gate."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    expr_form = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    F.expr(similarity._bucket_spark_expr(t))
                    for t in range(similarity._N_TABLES)
                ]
            )
        ).alias("t", "bucket"),
    )
    kernel = similarity._lsh_sig_table(e)
    assert expr_form.exceptAll(kernel).count() == 0
    assert kernel.exceptAll(expr_form).count() == 0


def test_knn_centroid_agrees_with_all_pairs(spark):
    exact = {
        r.label: r.central_vec_id
        for r in similarity.knn_per_label(spark, SF_DIR).collect()
    }
    fast = {
        r.label: r.central_vec_id
        for r in similarity.knn_centroid_per_label(spark, SF_DIR).collect()
    }
    assert exact == fast


def test_ann_pq_recall_vs_brute_force(spark):
    exact = [r.vec_id for r in similarity.ann_cosine_topk(spark, SF_DIR).collect()]
    approx = [r.vec_id for r in similarity.ann_pq_topk(spark, SF_DIR).collect()]
    assert approx, "PQ ANN returned no candidates"
    recall = len(set(exact) & set(approx)) / len(exact)
    print(f"# ann_pq_topk recall@10 = {recall:.2f} ({len(approx)} returned)")
    # 8x256 codebook ADC with a store-proportional exact rescore (12.5%
    # of vectors, floor 60): measured 1.0 at sf0.001, 0.9 at sf0.01 and
    # sf0.1 on the near-random fixtures (r5 sweep,
    # BENCH/pq_recall_sweep_r5.json); floor pinned just below the
    # weakest measured point.
    assert recall >= 0.85


def test_ann_ivf_recall_vs_brute_force(spark):
    exact = [r.vec_id for r in similarity.ann_cosine_topk(spark, SF_DIR).collect()]
    approx = [r.vec_id for r in similarity.ann_ivf_topk(spark, SF_DIR).collect()]
    assert approx, "IVF ANN returned no candidates"
    recall = len(set(exact) & set(approx)) / len(exact)
    print(f"# ann_ivf_topk recall@10 = {recall:.2f} ({len(approx)} returned)")
    # 4-of-16 cells probed: nearest-cell candidates must recover a
    # non-trivial share of the exact top-10 (measured 0.5; floor just
    # below measured)
    assert recall >= 0.4
