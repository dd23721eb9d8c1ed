"""Image-validation throughput round: the bench's image axis must run the
real engine kernel (udfs.validate_images) and every synthetic image must
pass the north-rule invariant (pixels_ok + phash_ok, PSNR >= 40 dB)."""

import os
import tempfile

from grabspark import bench_core


def test_image_round_validates_every_image(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="grabspark-imgbench-"), "store")
    bench_core.synth_images_parquet(spark, 96, path, n_files=4)
    r = bench_core.run_image_round(spark, path)
    assert r.n_images == 96
    assert r.n_pixels_ok == 96  # raw exact + qraw PSNR >= 40 dB
    assert r.n_phash_ok == 96  # store phash == recomputed phash (both fmts)
    assert r.min_psnr_db >= 40.0
    assert r.n_bytes == 96 * 48 * 48 * 3
    assert r.images_per_sec > 0


def test_image_round_deterministic(spark):
    """Two independent generations validate to identical aggregates."""
    base = tempfile.mkdtemp(prefix="grabspark-imgbench-")
    p1, p2 = os.path.join(base, "a"), os.path.join(base, "b")
    bench_core.synth_images_parquet(spark, 64, p1, n_files=2)
    bench_core.synth_images_parquet(spark, 64, p2, n_files=2)
    r1, r2 = bench_core.run_image_round(spark, p1), bench_core.run_image_round(spark, p2)
    assert (r1.n_images, r1.n_pixels_ok, r1.n_phash_ok, r1.n_bytes, r1.min_psnr_db) == (
        r2.n_images,
        r2.n_pixels_ok,
        r2.n_phash_ok,
        r2.n_bytes,
        r2.min_psnr_db,
    )


def test_image_round_validates_tdct_store(spark):
    """The tdct codec (decode-once round's store) passes the same
    north-rule invariant: PSNR >= 40 dB + recomputed phash match."""
    path = os.path.join(tempfile.mkdtemp(prefix="grabspark-imgbench-"), "store")
    bench_core.synth_images_parquet(spark, 64, path, n_files=4, fmts=("tdct",))
    r = bench_core.run_image_round(spark, path)
    assert r.n_images == 64
    assert r.n_pixels_ok == 64
    assert r.n_phash_ok == 64
    assert r.min_psnr_db >= 40.0


def test_decode_once_round_cross_checks(spark):
    """run_decode_once_round's composed pass must agree with the five
    single-signal jobs AND the naive assembled verdict (the function
    asserts all cross-checks internally); planted exact-pixel duplicates
    must be found by both pipelines."""
    path = os.path.join(tempfile.mkdtemp(prefix="grabspark-imgbench-"), "store")
    bench_core.synth_images_parquet(spark, 128, path, n_files=4, fmts=("tdct",))
    r = bench_core.run_decode_once_round(spark, path)
    assert r.n_images == 128
    assert r.composed_sec > 0 and r.naive_verdict_sec > 0
    assert r.n_keep + r.n_pixel_dups + r.n_blurry + r.n_gray >= r.n_keep
