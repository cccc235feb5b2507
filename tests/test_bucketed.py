"""Bucketed-table sink: round-trip + the shuffle-elimination evidence.

The point of bucketing is what the PLAN no longer contains — these
tests assert Exchange-free joins and aggregations on the bucket key,
and that the un-bucketed control plan DOES shuffle (so the assertion
is meaningful, not vacuous).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.sources.bucketed import bucket_spec, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so Exchange presence/absence is the signal."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def pages_tables(spark, tmp_path):
    """Two snapshots of a pages-like table, bucketed on url."""
    raw = spark.range(0, 2000).select(
        F.col("id"),
        F.concat(F.lit("https://d"), (F.col("id") % 37).cast("string"),
                 F.lit(".org/p/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 97).alias("score"),
    )
    write_bucketed(raw.drop("id"), "t_snap_a", "url", 8, sort_cols="url",
                   path=str(tmp_path / "a"))
    write_bucketed(
        raw.withColumn("score", F.col("score") + (F.col("id") % 2)).drop("id"),
        "t_snap_b", "url", 8, sort_cols="url", path=str(tmp_path / "b"),
    )
    yield "t_snap_a", "t_snap_b"
    spark.sql("DROP TABLE IF EXISTS t_snap_a")
    spark.sql("DROP TABLE IF EXISTS t_snap_b")


def test_roundtrip_and_spec(spark, pages_tables):
    a, _ = pages_tables
    t = spark.table(a)
    assert t.count() == 2000
    assert t.filter(F.col("url").isNull()).count() == 0
    assert bucket_spec(spark, a) == (["url"], 8)


def test_join_on_bucket_key_is_shuffle_free(spark, pages_tables,
                                            no_broadcast):
    a, b = pages_tables
    joined = spark.table(a).join(spark.table(b), "url")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    # the control: the same join from plain (un-bucketed) parquet
    # frames DOES exchange both sides — the assertion above is real
    pa = spark.table(a).select("url", "score")
    plain = pa.localCheckpoint(eager=False)  # strips partitioning info
    assert "Exchange" in _plan(plain.join(plain.alias("r"), "url"))
    # verdict parity: bucketed join result == recomputed join result
    assert joined.count() == 2000


def test_groupby_on_bucket_key_is_shuffle_free(spark, pages_tables):
    a, _ = pages_tables
    agg = spark.table(a).groupBy("url").agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange" not in _plan(agg), _plan(agg)
    # uniqueness over the bucket key — the 10^12-row validation use
    # case — runs as a zero-exchange plan
    assert agg.filter("n > 1").count() == 0


def test_mismatched_bucket_counts_shuffle_again(spark, tmp_path,
                                                no_broadcast):
    """Honesty check: a 8-vs-5 bucket join cannot co-locate and the
    planner reintroduces an Exchange — bucket counts must MATCH, which
    is exactly what bucket_spec() is for."""
    df = spark.range(0, 100).select(
        F.col("id").cast("string").alias("url"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_m8", "url", 8, path=str(tmp_path / "m8"))
    write_bucketed(df, "t_m5", "url", 5, path=str(tmp_path / "m5"))
    try:
        plan = _plan(spark.table("t_m8").join(spark.table("t_m5"), "url"))
        assert "Exchange" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_m8")
        spark.sql("DROP TABLE IF EXISTS t_m5")


def test_bucket_spec_rejects_unbucketed(spark, tmp_path):
    spark.range(5).write.mode("overwrite").option(
        "path", str(tmp_path / "nb")
    ).saveAsTable("t_nb")
    try:
        with pytest.raises(ValueError, match="not bucketed"):
            bucket_spec(spark, "t_nb")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_nb")


def test_write_bucketed_validates_args(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("url"))
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "t_bad", "url", 0)
    with pytest.raises(ValueError, match="key_cols"):
        write_bucketed(df, "t_bad", [], 4)


def test_one_file_per_bucket(spark, tmp_path):
    """The pre-shuffle bounds output at one file per bucket — without
    it every write task emits a file per bucket it touches."""
    df = spark.range(0, 1000, 1, 6).select(
        F.col("id").cast("string").alias("url"), F.col("id").alias("v")
    )
    write_bucketed(df, "t_files", "url", 4, path=str(tmp_path / "f"))
    try:
        import os

        files = [
            f for f in os.listdir(tmp_path / "f") if f.endswith(".parquet")
        ]
        assert len(files) == 4, files
    finally:
        spark.sql("DROP TABLE IF EXISTS t_files")


def test_validation_uniqueness_over_bucketed_table_is_shuffle_free(
    spark, tmp_path
):
    """The north-star integration: the pages table written bucketed on
    the validation key makes BOTH uniqueness plans (dup-count groupBy
    and first-wins attribution window) exchange-free — the dominant
    shuffle of the 10^12-row validation pass is paid once at ingest."""
    from py_schemax_spark.operators.uniqueness import (
        duplicate_keys,
        uniqueness_violations,
    )
    from py_schemax_spark.specs.loader import validate_spec_dict

    pages = spark.range(0, 3000).select(
        # url is a pure function of id % 2900, so ids 2900..2999
        # duplicate the urls of ids 0..99 exactly
        F.concat(F.lit("https://d"),
                 ((F.col("id") % 2900) % 41).cast("string"),
                 F.lit(".org/p/"), (F.col("id") % 2900).cast("string")
                 ).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias(
            "warc_ts"
        ),
        F.col("id").cast("string").alias("text"),
    )
    write_bucketed(pages, "t_pages_b", "url", 8,
                   path=str(tmp_path / "pb"))
    try:
        t = spark.table("t_pages_b")
        dups = duplicate_keys(t, "url")
        plan = _plan(dups)
        assert "Exchange" not in plan, plan
        assert dups.count() == 100  # ids 2900..2999 collide mod 2900

        spec = validate_spec_dict(
            {
                "fqn": "w.pages",
                "key": "url",
                "columns": [
                    {"name": "url", "type": "string", "unique": True},
                    {"name": "warc_ts", "type": "datetime"},
                    {"name": "text", "type": "string"},
                ],
            }
        ).spec
        viol = uniqueness_violations(t, spec, order_col="warc_ts")
        vplan = _plan(viol)
        # the attribution window re-uses the bucket partitioning: a
        # Sort remains (windows need in-partition order), no Exchange
        assert "Exchange" not in vplan, vplan
        assert viol.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS t_pages_b")
