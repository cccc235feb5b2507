"""Streaming sessionization: batch-twin parity + session semantics.

The batch `sessionize` result is the oracle: the same events through
the streaming session_window path (availableNow trigger, append mode)
must produce the same (user, start, end, n_events, total) session
set. Data is planted away from the exact-gap boundary tie (see module
docstring of sessions_stream)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from py_schemax_spark.operators.sessions import sessionize
from py_schemax_spark.streaming.sessions_stream import stream_sessionize

T0 = dt.datetime(2024, 1, 1, 8, 0, 0)


def _events():
    m = dt.timedelta(minutes=1)
    rows = []
    eid = 0
    # u1: two sessions (events 0-2 tight, then a 45-min gap, 3-4)
    for offs in (0, 3, 7, 52, 55):
        rows.append((eid, 1, T0 + offs * m, 10.5)); eid += 1
    # u2: one long session (every 10 min, gap=30 never exceeded)
    for offs in (0, 10, 20, 30, 40):
        rows.append((eid, 2, T0 + offs * m, 1.25)); eid += 1
    # u3: three singleton sessions
    for offs in (0, 100, 200):
        rows.append((eid, 3, T0 + offs * m, 2.0)); eid += 1
    # null ts: dropped by both paths
    rows.append((eid, 1, None, 99.0)); eid += 1
    # flush sentinel: append mode only emits sessions the WATERMARK
    # has closed, so a far-future event advances the frontier past
    # every real session's close; its own (still-open) session is
    # excluded from the comparison
    rows.append((eid, 999, T0 + dt.timedelta(days=2), 0.0))
    return rows


def _session_set(rows):
    return {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], float(r["total_value"]))
        for r in rows
        if r["user_id"] != 999  # flush sentinel's own open session
    }


def test_stream_sessionize_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    df = spark.createDataFrame(
        _events(), "event_id long, user_id long, ts timestamp, value double"
    )
    df.write.mode("overwrite").parquet(src)

    batch = sessionize(
        spark.read.parquet(src), gap_seconds=1800, value_col="value"
    )
    want = _session_set(batch.collect())
    assert len(want) == 6  # 2 + 1 + 3 sessions

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        stream_sessionize(stream, gap_seconds=1800, value_col="value",
                          watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _session_set(spark.sql("SELECT * FROM sess_stream").collect())
    assert got == want


def test_stream_sessionize_append_only_closed_sessions(spark, tmp_path):
    """Append mode emits a session exactly once (no per-batch
    retraction rows): the emitted set has unique (user, start)."""
    src = str(tmp_path / "sess_src2")
    spark.createDataFrame(
        _events(), "event_id long, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        stream_sessionize(stream, gap_seconds=1800,
                          watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_once")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r for r in spark.sql("SELECT * FROM sess_once").collect()
            if r["user_id"] != 999]
    keys = [(r["user_id"], r["session_start"]) for r in rows]
    assert len(keys) == len(set(keys)) == 6
    assert all(r["session_end"] >= r["session_start"] for r in rows)
