"""Streaming drift (streaming/drift_stream.py): grid bucketing, the
stream-vs-batch twin invariant, and PSI finalization on planted
uniform vs shifted windows."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.streaming.drift_stream import (
    bucket_index_expr,
    psi_from_bucket_counts,
    stream_bucket_counts,
)

GRID = [0.0, 10.0, 20.0, 30.0]  # interior edges 10, 20 → 3 buckets


def test_bucket_index_edges(spark):
    vals = [(-5.0,), (0.0,), (5.0,), (10.0,), (15.0,), (20.0,),
            (25.0,), (100.0,)]
    df = spark.createDataFrame(vals, "v: double")
    got = [
        r["b"]
        for r in df.select(
            bucket_index_expr(F.col("v"), GRID).alias("b")
        ).collect()
    ]
    # bucket = #interior edges <= v; below-min → 0, beyond-max → last
    assert got == [0, 0, 0, 1, 1, 2, 2, 2]


def _write_stream_src(spark, tmp_path, rows):
    src = str(tmp_path / "drift_src")
    spark.createDataFrame(rows, ["warc_ts", "v"]).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.read.parquet(src), spark.readStream.schema(
        schema
    ).parquet(src)


def test_stream_counts_match_batch_twin(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0 + dt.timedelta(minutes=i % 90), float(i % 35))
        for i in range(300)
    ] + [(t0, None)]  # null value must be dropped, not bucket 0
    batch, stream = _write_stream_src(spark, tmp_path, rows)
    q = (
        stream_bucket_counts(
            stream, F.col("v"), GRID,
            window_duration="1 hour", watermark="1 hour",
        )
        .writeStream.format("memory")
        .queryName("drift_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["bucket"]): r["cnt"]
        for r in spark.sql("SELECT * FROM drift_counts").collect()
    }
    want = {
        (r["ws"], r["bucket"]): r["cnt"]
        for r in batch.filter(F.col("v").isNotNull())
        .select(
            F.window("warc_ts", "1 hour")["start"].alias("ws"),
            bucket_index_expr(F.col("v"), GRID).alias("bucket"),
        )
        .groupBy("ws", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want
    assert sum(got.values()) == 300  # the null row is gone


def test_psi_uniform_vs_shifted(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 1, 0, 0)
    rows = (
        # window 0: 100 rows spread evenly over 4 buckets → psi ≈ 0
        [(t0, t0 + dt.timedelta(hours=1), b, 25) for b in range(4)]
        # window 1: all mass in bucket 0 → psi large
        + [(t1, t1 + dt.timedelta(hours=1), 0, 100)]
    )
    df = spark.createDataFrame(
        rows, "window_start: timestamp, window_end: timestamp, "
        "bucket: int, cnt: long"
    )
    out = {
        r["window_start"]: r
        for r in psi_from_bucket_counts(df, n_buckets=4).collect()
    }
    assert out[t0]["psi"] == pytest.approx(0.0, abs=1e-9)
    assert not out[t0]["drifted"]
    # p=(1,eps,eps,eps) vs q=0.25: dominant term (1-.25)·ln(1/.25)≈1.04
    assert out[t1]["psi"] > 1.0
    assert out[t1]["drifted"]
    assert out[t0]["n"] == 100 and out[t1]["n"] == 100
