"""Multimodal binary columns: audio + video as opaque ``binary`` with
typed metadata, processed by Arrow-batched kernels (mapInPandas).

The environment has no audio/video codec libraries, so — per the build
contract — the *container* decode for real codecs (mp3/h264/...) is
stubbed behind an explicit error, while the Spark-side plumbing (schema,
binary payloads, batch iteration, partitioning, feature kernels) is real
and verified: payloads are deterministic raw formats (int8 PCM audio,
8x8 rawvideo frames) generated from a closed-form lattice, and the
DuckDB oracle recomputes the features FROM THE FORMULA, never touching
the bytes — so a correct result proves the binary round-trip
(encode -> parquet binary column -> Arrow batch -> numpy decode)
reproduced the signal exactly.

Ops (each a graded query):

* ``audio_features``   — decode int8 PCM, per-clip RMS + zero-crossing
                          count + sample count.
* ``video_frame_sample`` — frame-strided sampling of raw 8x8 grayscale
                          video, per-sampled-frame mean luminance.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# -- deterministic payload lattice (shared with the SQL oracle) --------------
#
# audio clip k:  n_samples = 1000 + (k % 5) * 500
#                sample_i  = ((k*31 + i*17) % 256) - 128        (int8 PCM)
# video clip k:  n_frames  = 4 + (k % 3), frame = 8x8 grayscale
#                pixel(f,p) = (k*7 + f*13 + p*3) % 256          (uint8)

N_AUDIO = 200
N_VIDEO = 120
_FRAME_PX = 64  # 8x8
FRAME_STRIDE = 2  # video_frame_sample keeps frames 0, 2, 4, ...


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """Raw PCM path is implemented; compressed codecs are explicit stubs
    (no decoder library exists in this environment — the Spark plumbing
    around this call is what the engine owns and tests)."""
    if fmt == "pcm8":
        return np.frombuffer(data, dtype=np.int8)
    raise NotImplementedError(
        f"audio codec {fmt!r} needs an external decoder (not present in this "
        "environment); only the raw 'pcm8' path is implemented"
    )


def decode_video(data: bytes, fmt: str, frame_px: int = _FRAME_PX) -> np.ndarray:
    """(n_frames, frame_px) uint8 for rawvideo; codecs are stubs."""
    if fmt == "rawvideo":
        arr = np.frombuffer(data, dtype=np.uint8)
        return arr.reshape(-1, frame_px)
    raise NotImplementedError(
        f"video codec {fmt!r} needs an external decoder (not present in this "
        "environment); only the raw 'rawvideo' path is implemented"
    )


def synth_audio_df(spark: SparkSession, n: int = N_AUDIO) -> DataFrame:
    """Binary audio table (audio_id, fmt, sample_rate, n_samples, bytes),
    payload generated executor-side from the lattice."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                n_s = 1000 + (k % 5) * 500
                i = np.arange(n_s, dtype=np.int64)
                samples = ((k * 31 + i * 17) % 256 - 128).astype(np.int8)
                rows.append((f"a{k}", "pcm8", 8000, n_s, samples.tobytes()))
            yield pd.DataFrame(
                rows, columns=["audio_id", "fmt", "sample_rate", "n_samples", "bytes"]
            )

    return spark.range(n).mapInPandas(
        gen,
        schema="audio_id string, fmt string, sample_rate int, n_samples int, bytes binary",
    )


def synth_video_df(spark: SparkSession, n: int = N_VIDEO) -> DataFrame:
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for k in pdf["id"]:
                k = int(k)
                n_f = 4 + (k % 3)
                f = np.arange(n_f, dtype=np.int64)[:, None]
                p = np.arange(_FRAME_PX, dtype=np.int64)[None, :]
                px = ((k * 7 + f * 13 + p * 3) % 256).astype(np.uint8)
                rows.append((f"v{k}", "rawvideo", n_f, 8, 8, px.tobytes()))
            yield pd.DataFrame(
                rows, columns=["video_id", "fmt", "n_frames", "w", "h", "bytes"]
            )

    return spark.range(n).mapInPandas(
        gen,
        schema="video_id string, fmt string, n_frames int, w int, h int, bytes binary",
    )


def audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Decode the binary PCM column and emit per-clip features.  The
    oracle recomputes RMS/zero-crossings from the closed-form signal, so
    equality proves the binary round-trip was lossless."""
    audio = synth_audio_df(spark)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                s = decode_audio(r.bytes, r.fmt).astype(np.int64)
                rms = float(np.sqrt((s * s).sum() / len(s)))
                zc = int(((s[:-1] * s[1:]) < 0).sum())
                out.append((r.audio_id, len(s), round(rms, 6), zc))
            yield pd.DataFrame(
                out, columns=["audio_id", "n_samples", "rms", "zero_crossings"]
            )

    return audio.mapInPandas(
        kernel, schema="audio_id string, n_samples int, rms double, zero_crossings int"
    )


_AUDIO_SQL = f"""
WITH clips AS (
  SELECT k, 1000 + (k % 5) * 500 AS n_s
  FROM (SELECT unnest(generate_series(0, {N_AUDIO - 1})) AS k)
),
samples AS (
  SELECT k, n_s, i, ((k * 31 + i * 17) % 256) - 128 AS s
  FROM clips, LATERAL (SELECT unnest(generate_series(0, n_s - 1)) AS i) g
),
nexted AS (
  SELECT k, n_s, s, lead(s) OVER (PARTITION BY k ORDER BY i) AS s_next
  FROM samples
),
feat AS (
  SELECT k, n_s,
         round(sqrt(sum(CAST(s AS DOUBLE) * s) / n_s), 6) AS rms,
         sum(CASE WHEN s * s_next < 0 THEN 1 ELSE 0 END) AS zc
  FROM nexted GROUP BY k, n_s
)
SELECT 'a' || k AS audio_id, CAST(n_s AS INT) AS n_samples, rms,
       CAST(zc AS INT) AS zero_crossings
FROM feat
"""


def video_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-strided sampling: keep every FRAME_STRIDE-th frame of the
    raw video payload, emit per-sampled-frame mean luminance."""
    video = synth_video_df(spark)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                frames = decode_video(r.bytes, r.fmt).astype(np.int64)
                for fi in range(0, frames.shape[0], FRAME_STRIDE):
                    luma = round(float(frames[fi].sum() / _FRAME_PX), 6)
                    out.append((r.video_id, fi, luma))
            yield pd.DataFrame(out, columns=["video_id", "frame_idx", "mean_luma"])

    return video.mapInPandas(
        kernel, schema="video_id string, frame_idx int, mean_luma double"
    )


_VIDEO_SQL = f"""
WITH clips AS (
  SELECT k, 4 + (k % 3) AS n_f
  FROM (SELECT unnest(generate_series(0, {N_VIDEO - 1})) AS k)
),
frames AS (
  SELECT k, f FROM clips, LATERAL (SELECT unnest(generate_series(0, n_f - 1)) AS f) g
  WHERE f % {FRAME_STRIDE} = 0
),
px AS (
  SELECT k, f, (k * 7 + f * 13 + p * 3) % 256 AS v
  FROM frames, LATERAL (SELECT unnest(generate_series(0, {_FRAME_PX - 1})) AS p) g
)
SELECT 'v' || k AS video_id, CAST(f AS INT) AS frame_idx,
       round(sum(CAST(v AS DOUBLE)) / {_FRAME_PX}, 6) AS mean_luma
FROM px GROUP BY k, f
"""


# -- scene-cut detection ------------------------------------------------------
#
# Shot-boundary detection, the key video-pipeline op before frame
# sampling: training sets want one keyframe per SHOT, not per stride,
# or near-identical frames flood the batch.  Detector: a cut between
# consecutive frames when the absolute luminance-sum delta exceeds
# _CUT_THRESH (all-integer: frame sums are exact int64, no float mean).
# The DuckDB oracle recomputes the sums FROM THE LATTICE FORMULA —
# bytes never touch it — so agreement again certifies the binary
# round-trip, now through a different statistic (inter-frame deltas).
#
# 100 TB shape: one Arrow decode pass, per-clip sequential frame walk
# inside the kernel (frames of one clip are one row), no shuffle.

_CUT_THRESH = 500  # |sum(frame_f) - sum(frame_{f-1})| that marks a cut
# (lattice deltas take values {64,192,320,448,576,832}: 500 splits them,
#  so clips carry 0..n cuts and both classes are populated at fixture scale)


def video_scene_cuts(spark: SparkSession, sf: str) -> DataFrame:
    """(video_id, n_frames, n_cuts, max_delta): inter-frame luminance
    deltas over the raw payload, cuts above _CUT_THRESH."""
    video = synth_video_df(spark)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                frames = decode_video(r.bytes, r.fmt).astype(np.int64)
                sums = frames.sum(axis=1)
                deltas = [int(abs(sums[f] - sums[f - 1])) for f in range(1, len(sums))]
                n_cuts = sum(d > _CUT_THRESH for d in deltas)
                out.append(
                    (r.video_id, int(len(sums)), int(n_cuts),
                     int(max(deltas)) if deltas else 0)
                )
            yield pd.DataFrame(
                out, columns=["video_id", "n_frames", "n_cuts", "max_delta"]
            )

    return video.mapInPandas(
        kernel,
        schema="video_id string, n_frames int, n_cuts int, max_delta bigint",
    )


_CUTS_SQL = f"""
WITH clips AS (
  SELECT k, 4 + (k % 3) AS n_f
  FROM (SELECT unnest(generate_series(0, {N_VIDEO - 1})) AS k)
),
px AS (
  SELECT k, f, (k * 7 + f * 13 + p * 3) % 256 AS v
  FROM clips,
       LATERAL (SELECT unnest(generate_series(0, n_f - 1)) AS f) g,
       LATERAL (SELECT unnest(generate_series(0, {_FRAME_PX - 1})) AS p) h
),
sums AS (SELECT k, f, sum(v) AS s FROM px GROUP BY k, f),
deltas AS (
  SELECT k, abs(s - lag(s) OVER (PARTITION BY k ORDER BY f)) AS d
  FROM sums
)
SELECT 'v' || k AS video_id,
       CAST(max(c.n_f) AS INT) AS n_frames,
       CAST(sum(CASE WHEN d.d > {_CUT_THRESH} THEN 1 ELSE 0 END) AS INT) AS n_cuts,
       CAST(coalesce(max(d.d), 0) AS BIGINT) AS max_delta
FROM clips c JOIN deltas d USING (k)
GROUP BY k
"""


QUERIES = {
    "audio_features": audio_features,
    "video_frame_sample": video_frame_sample,
    "video_scene_cuts": video_scene_cuts,
}

ORACLES = {
    "audio_features": _AUDIO_SQL,
    "video_frame_sample": _VIDEO_SQL,
    "video_scene_cuts": _CUTS_SQL,
}
