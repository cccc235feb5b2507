"""Real RIFF/AVI decode + frame sampling (operators/multimodal.py) —
the video analogue of test_audio.py: renderer↔decoder round-trip
against the closed-form pixel function, container edge cases (junk
chunk padding, compressed stream rejection), and the sample_frames
Spark surface."""

from __future__ import annotations

import numpy as np
import pytest

from py_schemax_spark.operators.multimodal import (
    decode_avi_real,
    sample_frames,
)


def _render_payloads(spark, ids):
    from pyspark.sql import functions as F

    from py_schemax_spark.operators.multimodal import render_avi_udf

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = df.select(
        "doc_id", render_avi_udf()(F.col("doc_id")).alias("payload")
    ).collect()
    return {r["doc_id"]: bytes(r["payload"]) for r in rows}


def _expected_pixel(i, f, y, x, c):
    return (i * 7 + f * 31 + y * 13 + x * 5 + c * 3) % 256


def test_avi_roundtrip_matches_closed_form(spark):
    payloads = _render_payloads(spark, range(12))
    for i, payload in payloads.items():
        w, h, fps, frames = decode_avi_real(payload)
        assert (w, h) == (4 + i % 3, 2 + i % 2)
        assert fps == 1_000_000_000 // (40_000 * (1 + i % 2))
        assert len(frames) == 3 + i % 4
        for f, img in enumerate(frames):
            assert img.shape == (h, w, 3)
            for y in range(h):
                for x in range(w):
                    for c in range(3):
                        assert img[y, x, c] == _expected_pixel(
                            i, f, y, x, c
                        ), (i, f, y, x, c)


def test_avi_decoder_rejects_bad_payloads():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_real(b"RIFF\x00\x00\x00\x00WAVE")
    # a compressed stream chunk must be rejected, not garbled
    avih = b"".join(
        v.to_bytes(4, "little")
        for v in [40_000, 0, 0, 0, 1, 0, 1, 0, 2, 2, 0, 0, 0, 0]
    )
    hdrl = b"avih" + len(avih).to_bytes(4, "little") + avih
    movi = b"movi" + b"00dc" + (4).to_bytes(4, "little") + b"xxxx"
    chunks = (
        b"LIST" + (4 + len(hdrl)).to_bytes(4, "little") + b"hdrl" + hdrl
        + b"LIST" + len(movi).to_bytes(4, "little") + movi
    )
    payload = (
        b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"AVI " + chunks
    )
    with pytest.raises(ValueError, match="00dc"):
        decode_avi_real(payload)


def test_sample_frames_stats_and_stride(spark):
    from pyspark.sql import functions as F

    from py_schemax_spark.operators.multimodal import render_avi_udf

    ids = list(range(20))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    vids = df.select(
        F.col("doc_id").cast("string").alias("url"),
        render_avi_udf()(F.col("doc_id")).alias("html"),
    )
    # null payload is dropped, not crashed on
    vids = vids.unionByName(
        spark.createDataFrame(
            [("null-doc", None)], "url string, html binary"
        )
    )
    got = {
        (r["key"], r["frame_index"]): r.asDict()
        for r in sample_frames(vids, every_n=2).collect()
    }
    for i in ids:
        w, h, n = 4 + i % 3, 2 + i % 2, 3 + i % 4
        for idx in range(0, n, 2):
            r = got.pop((str(i), idx))
            exp = sum(
                _expected_pixel(i, idx, y, x, c)
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            assert r["sum_px"] == exp
            assert r["mean_px_x100"] == exp * 100 // (w * h * 3)
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, n)
    assert not got  # nothing from the null payload, no extra frames
    with pytest.raises(ValueError, match="every_n"):
        sample_frames(vids, every_n=0)
