"""Mergeable stats manifests (sources/stats_manifest.py).

Mirrors the reference's test strategy (SURVEY.md §5): the incremental
== batch determinism contract, typed min/max routing, parquet
round-trip of the sketch column, empty-snapshot folds.
"""

from __future__ import annotations

import datetime as dt

from py_schemax_spark.sources.stats_manifest import (
    merge_stats_manifests,
    stats_manifest,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (
                i,
                f"l{i % 5}" if i % 7 else None,
                float(i) * 1.5,
                dt.date(2024, 1, i % 9 + 1),
            )
            for i in range(100)
        ],
        "id long, lang string, v double, day date",
    )


def _rows(mdf):
    return sorted(map(tuple, mdf.collect()))


def test_incremental_equals_batch_exactly(spark):
    df = _df(spark)
    halves = (
        stats_manifest(df.filter("id < 50"), snapshot_id="a")
        .union(stats_manifest(df.filter("id >= 50"), snapshot_id="b"))
    )
    merged = _rows(merge_stats_manifests(halves))
    single = _rows(merge_stats_manifests(stats_manifest(df)))
    # EXACT equality incl. the HLL distinct estimate (register merges
    # are max-based, so union-of-halves == one-pass)
    assert merged == single


def test_typed_minmax_and_counts(spark):
    got = {
        r["column"]: r.asDict()
        for r in merge_stats_manifests(stats_manifest(_df(spark)))
        .collect()
    }
    # integral extrema travel exact as bigint; the double pair is
    # reserved for fractional types (ADVICE r04)
    assert got["id"]["min_int"] == 0 and got["id"]["max_int"] == 99
    assert got["id"]["min_num"] is None
    assert got["v"]["min_num"] == 0.0 and got["v"]["max_num"] == 148.5
    assert got["v"]["min_int"] is None
    assert got["id"]["min_str"] is None
    assert got["lang"]["min_str"] == "l0"
    assert got["lang"]["max_str"] == "l4"
    assert got["lang"]["nulls"] == 15 and got["lang"]["cnt"] == 85
    assert got["lang"]["approx_distinct"] == 5
    # dates route through the string pair, ISO-rendered
    assert got["day"]["min_str"] == "2024-01-01"
    assert got["day"]["max_str"] == "2024-01-09"


def test_manifest_survives_parquet_roundtrip(spark, tmp_path):
    df = _df(spark)
    p1, p2 = str(tmp_path / "m1"), str(tmp_path / "m2")
    stats_manifest(df.filter("id < 30"), snapshot_id="d1") \
        .write.parquet(p1)
    stats_manifest(df.filter("id >= 30"), snapshot_id="d2") \
        .write.parquet(p2)
    back = spark.read.parquet(p1).union(spark.read.parquet(p2))
    merged = _rows(merge_stats_manifests(back))
    single = _rows(merge_stats_manifests(stats_manifest(df)))
    assert merged == single


def test_empty_snapshot_is_identity(spark):
    df = _df(spark)
    with_empty = stats_manifest(df).union(
        stats_manifest(df.filter("id < 0"), snapshot_id="empty")
    )
    assert _rows(merge_stats_manifests(with_empty)) == _rows(
        merge_stats_manifests(stats_manifest(df))
    )


def test_column_subset(spark):
    m = stats_manifest(_df(spark), columns=["id", "lang"])
    assert {r["column"] for r in m.collect()} == {"id", "lang"}


def test_integral_extrema_exact_above_2_53(spark):
    """64-bit ids above 2^53 must merge exactly — a double would
    round them (ADVICE r04: the old manifest cast extrema to double,
    so snowflake-style ids lost exactness)."""
    big = (1 << 53) + 1  # not representable as double
    df = spark.createDataFrame(
        [(big,), (big + 2,), (0,)], "id long"
    )
    m = stats_manifest(df.filter("id > 0"), snapshot_id="a").union(
        stats_manifest(df.filter("id = 0"), snapshot_id="b")
    )
    got = merge_stats_manifests(m).collect()[0]
    assert got["min_int"] == 0 and got["max_int"] == big + 2
    assert got["min_num"] is None and got["max_num"] is None


def test_scale0_decimal_ids_route_to_exact_bigint_pair(spark):
    """NUMBER(18,0)-style decimal ids must take the exact bigint pair
    (a double rounds them above 2^53); fractional decimals stay on the
    double pair."""
    from decimal import Decimal

    big = Decimal((1 << 53) + 1)
    df = spark.createDataFrame(
        [(big, Decimal("1.5")), (Decimal(0), Decimal("2.5"))],
        "id decimal(18,0), v decimal(10,2)",
    )
    got = {
        r["column"]: r.asDict()
        for r in merge_stats_manifests(stats_manifest(df)).collect()
    }
    assert got["id"]["min_int"] == 0
    assert got["id"]["max_int"] == (1 << 53) + 1
    assert got["id"]["min_num"] is None
    assert got["v"]["min_int"] is None
    assert got["v"]["min_num"] == 1.5
