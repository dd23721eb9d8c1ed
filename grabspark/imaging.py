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
    raise ValueError(f"unknown fmt: {fmt}")


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size != w * h * 3:
        raise ValueError(f"byte length {arr.size} != {w}x{h}x3")
    arr = arr.reshape(h, w, 3)
    if fmt == "raw":
        return arr.copy()
    if fmt == "qraw":
        return ((arr.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)
    raise ValueError(f"unknown fmt: {fmt}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
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
    gray = px.astype(np.float64).mean(axis=2)
    small = _area_resize(gray)
    coef = _DCT_M @ small @ _DCT_M.T
    block = coef[:8, :8].ravel()
    med = np.median(block)
    bits = block > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))
