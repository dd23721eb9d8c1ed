"""X4/X5 image codecs: lossless round-trip, lossy PSNR bound, phash
determinism (input_hint: decoded-pixel allclose, PSNR>=40dB lossy)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from grabspark import imaging


@given(st.text(min_size=1, max_size=30), st.integers(8, 40), st.integers(8, 40))
@settings(max_examples=50, deadline=None)
def test_raw_roundtrip_exact(image_id, w, h):
    px = imaging.pixels_from_id(image_id, w, h)
    dec = imaging.decode_image(imaging.encode_image(px, "raw"), w, h, "raw")
    assert np.array_equal(px, dec)
    assert imaging.psnr(px, dec) == float("inf")


@given(st.text(min_size=1, max_size=30), st.integers(8, 40), st.integers(8, 40))
@settings(max_examples=50, deadline=None)
def test_qraw_psnr_above_40(image_id, w, h):
    px = imaging.pixels_from_id(image_id, w, h)
    dec = imaging.decode_image(imaging.encode_image(px, "qraw"), w, h, "qraw")
    assert np.max(np.abs(px.astype(int) - dec.astype(int))) <= 2
    assert imaging.psnr(px, dec) >= imaging.PSNR_LOSSY_MIN_DB


def test_pixels_deterministic():
    a = imaging.pixels_from_id("http://h.test/p0", 16, 12)
    b = imaging.pixels_from_id("http://h.test/p0", 16, 12)
    assert np.array_equal(a, b)
    c = imaging.pixels_from_id("http://h.test/p1", 16, 12)
    assert not np.array_equal(a, c)


def test_phash_deterministic_and_int64():
    px = imaging.pixels_from_id("http://h.test/p0", 24, 18)
    h1 = imaging.phash64(px)
    h2 = imaging.phash64(px.copy())
    assert h1 == h2
    assert -(2**63) <= h1 < 2**63


def test_phash_robust_to_quantization():
    """phash of the lossy-decoded image is close to the original's."""
    px = imaging.pixels_from_id("http://h.test/p3", 32, 32)
    dec = imaging.decode_image(imaging.encode_image(px, "qraw"), 32, 32, "qraw")
    assert imaging.hamming64(imaging.phash64(px), imaging.phash64(dec)) <= 6


def test_phash_differs_across_images():
    h = [
        imaging.phash64(imaging.pixels_from_id(f"http://h.test/p{i}", 20, 20))
        for i in range(8)
    ]
    assert len(set(h)) == len(h)


def test_decode_length_mismatch():
    with pytest.raises(ValueError):
        imaging.decode_image(b"\x00" * 10, 4, 4, "raw")


@given(st.integers(0, 10**6), st.integers(5, 64), st.integers(5, 64))
@settings(max_examples=40, deadline=None)
def test_psnr_integer_intermediates_exact(seed, w, h):
    """psnr's int32 fast path must equal plain float64 arithmetic bit for
    bit (diffs and squares are small integers, exact in float64)."""
    a = imaging.pixels_from_id(f"http://a{seed}.test/x", w, h)
    b = imaging.decode_image(imaging.encode_image(a, "qraw"), w, h, "qraw")
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = np.mean(d * d)
    want = float("inf") if mse == 0.0 else float(10.0 * np.log10(255.0 * 255.0 / mse))
    assert imaging.psnr(a, b) == want


@given(st.integers(0, 10**6), st.sampled_from([8, 16, 24, 48]), st.sampled_from([8, 16, 32, 48]))
@settings(max_examples=25, deadline=None)
def test_tdct_roundtrip_quality_and_determinism(seed, w, h):
    """tdct (block-DCT + quant + zlib): deterministic encode, decode
    reconstructs above the 40 dB lossy floor for any 8-aligned size —
    even on PRNG noise images, the hardest case for transform coding."""
    px = imaging.pixels_from_id(f"http://t{seed}.test/x", w, h)
    b = imaging.encode_image(px, "tdct")
    assert b == imaging.encode_image(px, "tdct")
    out = imaging.decode_image(b, w, h, "tdct")
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert imaging.psnr(px, out) >= imaging.PSNR_LOSSY_MIN_DB


def test_tdct_rejects_unaligned_dims():
    px = imaging.pixels_from_id("http://t.test/x", 12, 8)
    with pytest.raises(ValueError):
        imaging.encode_image(px, "tdct")
