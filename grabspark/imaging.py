"""Image payload codecs + validation (X4/X5) — numpy only, no Pillow.

The graft payload (BASELINE.json input_hint) is an image+caption page
store: ``(image_id, bytes, w, h, fmt, caption, phash)``.  The sandbox has
no image libraries, so the codecs are deterministic numpy transforms
(SURVEY.md §7.5):

* ``raw``  — RGB888, lossless: decoded pixels must match the reference
  pixels exactly (allclose with atol=0).
* ``qraw`` — 6-bit/channel quantization, our stand-in lossy codec:
  encode p -> p >> 2, decode q -> (q << 2) + 2 (midpoint reconstruction,
  max abs error 2, PSNR ≈ 46 dB > the required 40 dB).
* ``tdct`` — JPEG-shaped transform codec: per-channel 8x8 block DCT,
  uniform coefficient quantization (step 4 -> PSNR ≈ 47 dB), zlib
  entropy stage over the int16 coefficient stream.  Deterministic numpy
  + zlib only, but the decode pays the three real JPEG cost centers
  (entropy decode + dequant + inverse DCT), so decode-cost-sensitive
  benchmarks (the decode-once composed round) see a realistic profile
  instead of the ~free raw memcpy.

Reference pixels are PRNG-derived from ``image_id`` alone, so the
validator recomputes them independently of the store (FIXTURES.md §1).

``phash64`` is an 8x8-of-32x32 DCT sign hash (classic pHash shape),
implemented as two float64 matrix multiplies — deterministic across
platforms at the tolerance we compare at (exact, since inputs are uint8
and the DCT basis is fixed).
"""

from __future__ import annotations

import hashlib

import numpy as np

PSNR_LOSSY_MIN_DB = 40.0


def _seed_from_id(image_id: str) -> int:
    return int.from_bytes(hashlib.sha256(image_id.encode("utf-8")).digest()[:8], "big")


def pixels_from_id(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic reference pixels (h, w, 3) uint8 for a page id."""
    rng = np.random.default_rng(_seed_from_id(image_id))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return px.astype(np.uint8).tobytes()
    if fmt == "qraw":
        return (px.astype(np.uint8) >> 2).tobytes()
    if fmt == "tdct":
        return _tdct_encode(px)
    raise ValueError(f"unknown fmt: {fmt}")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "tdct":
        return _tdct_decode(data, w, h)
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size != w * h * 3:
        raise ValueError(f"byte length {arr.size} != {w}x{h}x3")
    arr = arr.reshape(h, w, 3)
    if fmt == "raw":
        return arr.copy()
    if fmt == "qraw":
        return ((arr.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)
    raise ValueError(f"unknown fmt: {fmt}")


# --- tdct: block-DCT transform codec ----------------------------------------

_TDCT_STEP = 4.0  # uniform quantizer step; MSE ~ step^2/12 -> ~47 dB


def _tdct_blocks(px: np.ndarray) -> np.ndarray:
    '''(h, w, 3) -> (n_blocks, 3, 8, 8) float64 blocks (h, w % 8 == 0).'''
    h, w, _ = px.shape
    b = px.astype(np.float64).reshape(h // 8, 8, w // 8, 8, 3)
    return b.transpose(0, 2, 4, 1, 3).reshape(-1, 3, 8, 8)


def _tdct_encode(px: np.ndarray) -> bytes:
    import zlib

    h, w, _ = px.shape
    if h % 8 or w % 8:
        raise ValueError(f"tdct needs 8-aligned dims, got {w}x{h}")
    blocks = _tdct_blocks(px)
    coef = _DCT_M8F @ blocks @ _DCT_M8F.T
    q = np.round(coef / _TDCT_STEP).astype(np.int16)
    return zlib.compress(q.tobytes(), 1)


def _tdct_decode(data: bytes, w: int, h: int) -> np.ndarray:
    import zlib

    raw = zlib.decompress(data)
    nb = (h // 8) * (w // 8)
    q = np.frombuffer(raw, dtype=np.int16).reshape(nb, 3, 8, 8)
    coef = q.astype(np.float64) * _TDCT_STEP
    blocks = _DCT_M8F.T @ coef @ _DCT_M8F
    out = (
        blocks.reshape(h // 8, w // 8, 3, 8, 8)
        .transpose(0, 3, 1, 4, 2)
        .reshape(h, w, 3)
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images.

    Diffs/squares are small integers, exactly representable in float64,
    so the int32 intermediate is bit-identical to float64 arithmetic at
    a fraction of the memory traffic."""
    d = a.astype(np.int32) - b.astype(np.int32)
    mse = np.mean(d * d, dtype=np.float64)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


# --- phash ------------------------------------------------------------------

_DCT_N = 32


def _dct_matrix(n: int = _DCT_N) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    basis = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    basis[0, :] *= np.sqrt(1.0 / n)
    basis[1:, :] *= np.sqrt(2.0 / n)
    return basis


_DCT_M = _dct_matrix()
# full orthonormal 8x8 DCT basis for the tdct block codec (inverse =
# transpose)
_DCT_M8F = _dct_matrix(8)
# only the top-left 8x8 coefficient block feeds the hash, so only the
# first 8 DCT basis rows are ever needed: (8,32)@(32,32)@(32,8) is ~6x
# fewer flops than the full transform
_DCT_M8 = _DCT_M[:8].copy()


def _area_resize(gray: np.ndarray, n: int = _DCT_N) -> np.ndarray:
    """Deterministic area-average resize of a 2-D float array to n x n."""
    h, w = gray.shape
    yb = (np.arange(n + 1) * h) // n
    xb = (np.arange(n + 1) * w) // n
    # guard degenerate bins when h or w < n: fall back to nearest sampling
    if h < n or w < n:
        yi = (np.arange(n) * h) // n
        xi = (np.arange(n) * w) // n
        return gray[np.ix_(yi, xi)]
    csum = np.zeros((h + 1, w + 1), dtype=np.float64)
    csum[1:, 1:] = np.cumsum(np.cumsum(gray, axis=0), axis=1)
    out = (
        csum[yb[1:, None], xb[None, 1:]]
        - csum[yb[:-1, None], xb[None, 1:]]
        - csum[yb[1:, None], xb[None, :-1]]
        + csum[yb[:-1, None], xb[None, :-1]]
    )
    areas = (yb[1:, None] - yb[:-1, None]) * (xb[None, 1:] - xb[None, :-1])
    return out / areas


def phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash as a SIGNED int64 (Spark LongType)."""
    gray = px.mean(axis=2, dtype=np.float64)
    small = _area_resize(gray)
    block = (_DCT_M8 @ small @ _DCT_M8.T).ravel()
    med = np.median(block)
    bits = block > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))


# NOTE on batching: stacking whole Arrow batches into (k, h, w, 3) arrays
# and running batched numpy kernels was tried and REVERTED — single-core
# it is ~25% faster, but under 32 parallel Spark workers the float64
# gray/cumsum temps (MBs per chunk) thrash the shared L3 and measured
# 1.5-10x SLOWER than this per-image path, whose ~100 KB working set
# stays cache-resident (interleaved A/B, two sessions).
