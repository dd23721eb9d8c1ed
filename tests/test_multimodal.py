"""Multimodal binary plumbing: codec-stub dispatch + payload round-trip."""

import numpy as np
import pytest

from grabspark.ops import multimodal as mm


def test_pcm_roundtrip():
    s = np.arange(-128, 128, dtype=np.int8)
    assert np.array_equal(mm.decode_audio(s.tobytes(), "pcm8"), s)


def test_rawvideo_roundtrip():
    px = np.arange(128, dtype=np.uint8).reshape(2, 64)
    assert np.array_equal(mm.decode_video(px.tobytes(), "rawvideo"), px)


@pytest.mark.parametrize("fmt", ["mp3", "flac", "h264"])
def test_compressed_codecs_are_explicit_stubs(fmt):
    with pytest.raises(NotImplementedError, match="external decoder"):
        mm.decode_audio(b"\x00", fmt)
    with pytest.raises(NotImplementedError, match="external decoder"):
        mm.decode_video(b"\x00", fmt)


def test_synth_tables_schema(spark):
    a = mm.synth_audio_df(spark, n=8)
    assert [f.name for f in a.schema.fields] == [
        "audio_id", "fmt", "sample_rate", "n_samples", "bytes",
    ]
    row = a.filter(a.audio_id == "a3").first()
    assert row.n_samples == 1000 + 3 % 5 * 500 and len(row.bytes) == row.n_samples
    v = mm.synth_video_df(spark, n=5)
    r = v.filter(v.video_id == "v2").first()
    assert r.n_frames == 6 and len(r.bytes) == 6 * 64
