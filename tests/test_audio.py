"""Real WAV (RIFF PCM) decode path: byte-level decoder exactness,
chunk walking, and the Spark mapInPandas plumbing. The end-to-end
planted pipeline is oracled by `q_audio_meta` (hash-green vs a DuckDB
generate_series re-derivation of the sample statistics)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.multimodal import (
    audio_metadata,
    decode_wav_real,
    render_wav_udf,
)


def _wav(samples, rate=8000, channels=1, bits=16, extra_chunks=b""):
    if bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
        block = 2 * channels
    else:
        data = (np.asarray(samples, dtype=np.int16) + 128).astype(
            np.uint8
        ).tobytes()
        block = channels
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = (
        b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + extra_chunks
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_decode_16bit_exact():
    ch, rate, bits, s = decode_wav_real(_wav([0, -1, 32767, -32768]))
    assert (ch, rate, bits) == (1, 8000, 16)
    assert s.tolist() == [0, -1, 32767, -32768]


def test_decode_8bit_recentered():
    ch, rate, bits, s = decode_wav_real(
        _wav([-128, 0, 127], rate=11025, bits=8)
    )
    assert (ch, rate, bits) == (1, 11025, 8)
    assert s.tolist() == [-128, 0, 127]


def test_decode_skips_junk_chunks_with_odd_padding():
    # odd-sized LIST chunk between fmt and data: the even-byte pad
    # rule must be honored or the data chunk is misread
    junk = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\0"
    ch, rate, bits, s = decode_wav_real(_wav([7, -7], extra_chunks=junk))
    assert s.tolist() == [7, -7]


def test_decode_stereo_interleaved():
    ch, _, _, s = decode_wav_real(_wav([1, 2, 3, 4], channels=2))
    assert ch == 2 and s.tolist() == [1, 2, 3, 4]


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFFxxxxWAVX" + b"\0" * 10,
        b"not audio at all",
        _wav([1])[:20],  # truncated: no data chunk survives
    ],
)
def test_decode_rejects_non_wav(payload):
    with pytest.raises(ValueError):
        decode_wav_real(payload)


def test_decode_rejects_compressed_format():
    body = _wav([1])
    # flip the fmt audio-format field (offset: 12 + 8 = fmt body)
    bad = body[:20] + (85).to_bytes(2, "little") + body[22:]
    with pytest.raises(ValueError, match="PCM"):
        decode_wav_real(bad)


def test_render_wav_roundtrips_closed_form(spark):
    """The planted payload decodes to exactly the closed-form stats
    the SQL oracle recomputes."""
    df = spark.range(0, 40).select(
        F.col("id").cast("string").alias("url"),
        render_wav_udf()(F.col("id")).alias("html"),
    )
    meta = {int(r["key"]): r for r in audio_metadata(df).collect()}
    assert len(meta) == 40
    for i in (0, 1, 5, 17, 39):
        n = 16 + i % 32
        rate = 8000 * (1 + i % 3)
        a = np.abs((3 * i + 7 * np.arange(n)) % 256 - 128)
        r = meta[i]
        assert (r["channels"], r["sample_rate"], r["bits"]) == (1, rate, 16)
        assert r["n_frames"] == n
        assert r["duration_ms"] == n * 1000 // rate
        assert r["peak_abs"] == int(a.max())
        assert r["mean_abs_x100"] == int(a.sum()) * 100 // n


def test_audio_metadata_drops_null_and_undecodable(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", b"junk"), ("c", _wav([5, -5]))],
        "url string, html binary",
    )
    rows = audio_metadata(df).collect()
    assert [r["key"] for r in rows] == ["c"]
    assert rows[0]["peak_abs"] == 5 and rows[0]["mean_abs_x100"] == 500
