"""Wave-14 operators: missing_partitions, fk_cardinality_violations,
stream_dedup_exact.

Mirrors the reference's test strategy (SURVEY.md §5): hand-computed
expectations, boundary exactness, null handling, and a batch-twin
parity check for the streaming path.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.integrity import (
    fk_cardinality_violations,
    missing_partitions,
)


def _ts(day):
    return dt.datetime(2024, 3, day, 10, 0, 0)


# ---------------------------------------------------------------------------
# missing_partitions


def test_missing_days_hand_computed(spark):
    rows = [(i, _ts(d)) for i, d in enumerate([1, 2, 5, 6, 9])]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    got = sorted(
        str(r["missing_day"])
        for r in missing_partitions(df, ts_col="ts").collect()
    )
    assert got == ["2024-03-03", "2024-03-04", "2024-03-07",
                   "2024-03-08"]


def test_missing_days_none_when_contiguous(spark):
    rows = [(i, _ts(i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    assert missing_partitions(df, ts_col="ts").count() == 0


def test_missing_days_date_partition_column(spark):
    rows = [(1, dt.date(2024, 3, 1)), (2, dt.date(2024, 3, 4))]
    df = spark.createDataFrame(rows, "id long, day date")
    got = sorted(
        str(r["missing_day"])
        for r in missing_partitions(df, part_col="day").collect()
    )
    assert got == ["2024-03-02", "2024-03-03"]


def test_missing_days_null_ts_ignored_and_empty_input(spark):
    df = spark.createDataFrame(
        [(1, None), (2, _ts(1))], "id long, ts timestamp"
    )
    assert missing_partitions(df, ts_col="ts").count() == 0
    empty = spark.createDataFrame([], "id long, ts timestamp")
    assert missing_partitions(empty, ts_col="ts").count() == 0


# ---------------------------------------------------------------------------
# fk_cardinality_violations


def _pc(spark):
    parent = spark.createDataFrame(
        [(k,) for k in (1, 2, 3, 4)], "pk long"
    )
    child = spark.createDataFrame(
        # pk1: 2 children; pk2: 0; pk3: 5; pk4: 1; orphan fk 99 ignored
        [(1, 10), (1, 11), (3, 12), (3, 13), (3, 14), (3, 15),
         (3, 16), (4, 17), (99, 18), (None, 19)],
        "fk long, cid long",
    )
    return parent, child


def test_fk_cardinality_bounds(spark):
    parent, child = _pc(spark)
    got = {
        r["key"]: (r["n_children"], r["violation"])
        for r in fk_cardinality_violations(
            parent, child, "pk", "fk", min_children=1, max_children=4
        ).collect()
    }
    assert got == {2: (0, "too_few"), 3: (5, "too_many")}


def test_fk_cardinality_boundaries_inclusive(spark):
    parent, child = _pc(spark)
    got = fk_cardinality_violations(
        parent, child, "pk", "fk", min_children=1, max_children=5
    ).collect()
    assert {r["key"] for r in got} == {2}  # 5 children now allowed
    got2 = fk_cardinality_violations(
        parent, child, "pk", "fk", min_children=0, max_children=4
    ).collect()
    assert {r["key"] for r in got2} == {3}  # zero now allowed


def test_fk_cardinality_no_max(spark):
    parent, child = _pc(spark)
    got = fk_cardinality_violations(
        parent, child, "pk", "fk", min_children=2
    ).collect()
    assert {r["key"] for r in got} == {2, 4}


def test_fk_cardinality_validation(spark):
    parent, child = _pc(spark)
    with pytest.raises(ValueError):
        fk_cardinality_violations(parent, child, "pk", "fk",
                                  min_children=-1)
    with pytest.raises(ValueError):
        fk_cardinality_violations(parent, child, "pk", "fk",
                                  min_children=3, max_children=2)


# ---------------------------------------------------------------------------
# stream_dedup_exact


def test_stream_dedup_matches_distinct_keys(spark, tmp_path):
    from py_schemax_spark.streaming.dedup_stream import stream_dedup_exact

    rows = [
        (1, _ts(1), "alpha"), (2, _ts(1), "alpha"),      # dup text
        (3, _ts(2), "beta"), (4, _ts(3), "beta"),        # dup text
        (5, _ts(4), "gamma"),
        (6, None, "dropped"),                            # null ts
    ]
    src = str(tmp_path / "dd_src")
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, text string"
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        stream_dedup_exact(stream, ts_col="ts", text_col="text",
                           watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dd_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dd_stream").collect()
    assert sorted(r["text"] for r in got) == ["alpha", "beta", "gamma"]
    # emitted rows carry the digest key and one winning event each
    assert len({r["digest"] for r in got}) == 3


def test_stream_dedup_explicit_keys_and_validation(spark, tmp_path):
    from py_schemax_spark.streaming.dedup_stream import stream_dedup_exact

    src = str(tmp_path / "dd_src2")
    df = spark.createDataFrame(
        [(1, _ts(1), "u1"), (2, _ts(2), "u1"), (3, _ts(2), "u2")],
        "event_id long, ts timestamp, url string",
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        stream_dedup_exact(stream, key_cols=("url",), ts_col="ts",
                           watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dd_stream2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dd_stream2").collect()
    assert sorted(r["url"] for r in got) == ["u1", "u2"]
    with pytest.raises(ValueError):
        stream_dedup_exact(stream, key_cols=())
