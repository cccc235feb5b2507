"""Integrity operators: exact two-sample KS, monotonicity, rolling
volume anomalies, functional-dependency conformance, and the exact
substring-window dedup report."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.integrity import (
    exact_ks_2samp,
    fd_violations,
    monotonicity_violations,
    volume_anomaly,
)
from py_schemax_spark.operators.substrings import substring_dedup_report


# ---------------------------------------------------------------- KS


def test_ks_identical_samples_is_zero(spark):
    df = spark.createDataFrame(
        [(v, g) for v in range(50) for g in (0, 1)], "v long, g int"
    )
    row = exact_ks_2samp(df, "v", "g").first()
    assert (row["n_a"], row["n_b"], row["ks_bp"]) == (50, 50, 0)


def test_ks_disjoint_samples_is_10000(spark):
    rows = [(v, 0) for v in range(20)] + [(v + 100, 1) for v in range(20)]
    df = spark.createDataFrame(rows, "v long, g int")
    assert exact_ks_2samp(df, "v", "g").first()["ks_bp"] == 10000


def test_ks_matches_manual_cdf_computation(spark):
    a = [1, 1, 2, 3, 5, 8, 8, 9]
    b = [1, 2, 2, 2, 4, 9, 9, 9]
    rows = [(v, 0) for v in a] + [(v, 1) for v in b]
    df = spark.createDataFrame(rows, "v long, g int")
    grid = sorted(set(a) | set(b))
    expect = max(
        abs(
            sum(x <= v for x in a) * len(b)
            - sum(x <= v for x in b) * len(a)
        )
        for v in grid
    )
    expect_bp = expect * 10000 // (len(a) * len(b))
    row = exact_ks_2samp(df, "v", "g").first()
    assert row["ks_bp"] == expect_bp


def test_ks_drops_null_values_and_groups(spark):
    rows = [(1, 0), (2, 1), (None, 0), (3, None)]
    df = spark.createDataFrame(rows, "v long, g int")
    row = exact_ks_2samp(df, "v", "g").first()
    assert (row["n_a"], row["n_b"]) == (1, 1)


# ------------------------------------------------------ monotonicity


def test_monotonicity_flags_decreasing_ts(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (1, 2, t0 + dt.timedelta(seconds=10)),
        (1, 3, t0 + dt.timedelta(seconds=5)),  # out of order
        (2, 1, t0),
        (2, 2, t0),  # equal is fine
    ]
    df = spark.createDataFrame(rows, "k long, o long, ts timestamp")
    out = monotonicity_violations(df, "k", "o", "ts").collect()
    assert [(r["key"], r["pos"], r["prev_pos"]) for r in out] == [(1, 3, 2)]


def test_monotonicity_null_ts_never_violates(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, 1, t0), (1, 2, None), (1, 3, t0 - dt.timedelta(1))]
    df = spark.createDataFrame(rows, "k long, o long, ts timestamp")
    # row 3's prev_ts is NULL (lag sees row 2), so ts < prev_ts is null
    assert monotonicity_violations(df, "k", "o", "ts").count() == 0


# ---------------------------------------------------- volume anomaly


def _hourly(spark, counts: list[int]):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(hours=h, seconds=i),)
        for h, c in enumerate(counts)
        for i in range(c)
    ]
    return spark.createDataFrame(rows, "ts timestamp")


def test_volume_anomaly_flags_spike_and_drop(spark):
    counts = [100] * 24 + [300] + [100] * 5 + [10]
    df = _hourly(spark, counts)
    out = {
        r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1): r["direction"]
        for r in volume_anomaly(df, "ts").collect()
    }
    assert out[24] == "high"
    assert out[30] == "low"
    # steady buckets not flagged
    assert 25 not in out and 29 not in out


def test_volume_anomaly_warmup_not_judged(spark):
    # a wild second bucket with < min_history prior buckets: no verdict
    df = _hourly(spark, [100, 500, 100])
    assert volume_anomaly(df, "ts").count() == 0


def test_volume_anomaly_exact_boundary(spark):
    # trailing mean 100, tol 50%: cnt=150 is NOT > 150% exactly;
    # cnt=151 is — integer arithmetic, no float wobble
    for spike, expect in ((150, 0), (151, 1)):
        df = _hourly(spark, [100] * 24 + [spike])
        assert volume_anomaly(df, "ts").count() == expect


# ------------------------------------------------------------- FD


def test_fd_clean_dependency_no_rows(spark):
    rows = [("a", "x"), ("a", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "det string, dep string")
    assert fd_violations(df, "det", "dep").count() == 0


def test_fd_violation_majority_and_counts(spark):
    rows = [("a", "x")] * 3 + [("a", "y")] * 2 + [("b", "z")]
    df = spark.createDataFrame(rows, "det string, dep string")
    out = fd_violations(df, "det", "dep").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["det"], r["majority_dep"], r["n_rows"],
            r["n_dep_values"], r["n_violations"]) == ("a", "x", 5, 2, 2)


def test_fd_tie_breaks_deterministically(spark):
    # 2-2 tie between 'x' and 'y': majority is the smaller value
    rows = [("a", "y"), ("a", "x"), ("a", "y"), ("a", "x")]
    df = spark.createDataFrame(rows, "det string, dep string")
    assert fd_violations(df, "det", "dep").first()["majority_dep"] == "x"


def test_fd_null_dependent_is_a_value(spark):
    rows = [("a", "x"), ("a", None), ("a", "x")]
    df = spark.createDataFrame(rows, "det string, dep string")
    r = fd_violations(df, "det", "dep").first()
    assert r["n_dep_values"] == 2 and r["majority_dep"] == "x"
    assert r["n_violations"] == 1


# ------------------------------------------------- substring dedup


def test_substring_dedup_shared_span_flagged(spark):
    shared = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, shared + " uniqA1 uniqA2"),
        (2, "uniqB0 " + shared),
        (3, " ".join(f"solo{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dedup_report(df, n=12).collect()}
    # doc 1: 14 tokens -> 3 windows; exactly the pure-shared window
    # (w0..w11) also occurs in doc 2
    assert out[1]["n_windows"] == 3 and out[1]["n_dup"] == 1
    assert out[2]["n_dup"] == 1
    assert out[3]["n_dup"] == 0 and out[3]["dup_bp"] == 0
    assert out[1]["dup_bp"] == 10000 // 3


def test_substring_dedup_short_and_null_docs(spark):
    rows = [(1, "too short"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dedup_report(df, n=12).collect()}
    for d in (1, 2):
        assert (out[d]["n_windows"], out[d]["n_dup"],
                out[d]["dup_bp"]) == (0, 0, 0)


def test_substring_dedup_within_doc_repeat_counts_once(spark):
    span = " ".join(f"t{i}" for i in range(12))
    # doc 1 contains the span twice (with a separator token so the
    # repeat creates extra distinct windows too); doc 2 once
    rows = [(1, span + " sep " + span), (2, span)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           substring_dedup_report(df, n=12).collect()}
    assert out[1]["n_windows"] > out[1]["n_distinct"]
    # the only hash shared ACROSS docs is the span window itself
    assert out[1]["n_dup"] == 1 and out[2]["n_dup"] == 1


def test_substring_dedup_min_docs_threshold(spark):
    span = " ".join(f"q{i}" for i in range(12))
    rows = [(1, span), (2, span), (3, span)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert (
        substring_dedup_report(df, n=12, min_docs=4)
        .agg(F.sum("n_dup")).first()[0] == 0
    )
    assert (
        substring_dedup_report(df, n=12, min_docs=3)
        .agg(F.sum("n_dup")).first()[0] == 3
    )


def test_ks_single_partition_window_is_post_aggregation(spark):
    """Plan shape: the global-order window must consume the VALUE-level
    aggregate, not corpus rows — assert the plan has an exchange+agg
    below the window (the scale contract in the module docstring)."""
    df = spark.createDataFrame([(v % 7, v % 2) for v in range(100)],
                               "v long, g int")
    plan = exact_ks_2samp(df, "v", "g")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" in plan
    # partial aggregation (map-side combine) precedes the shuffle
    assert "partial" in plan.lower()


class TestSequenceGaps:
    def _gaps(self, spark, ids, bucket_size=10):
        from py_schemax_spark.operators.integrity import sequence_gaps

        df = spark.createDataFrame([(i,) for i in ids], "id: long")
        return sorted(
            (r.gap_start, r.gap_end, r.n_missing)
            for r in sequence_gaps(df, "id", bucket_size).collect()
        )

    def test_intra_and_inter_bucket_gaps(self, spark):
        # bucket_size=10: ids 0..4, 7..9 (gap 5-6 inside bucket 0),
        # then 30..31 (buckets 1,2 empty: gap 10-29 spans them)
        ids = [0, 1, 2, 3, 4, 7, 8, 9, 30, 31]
        assert self._gaps(spark, ids) == [(5, 6, 2), (10, 29, 20)]

    def test_consecutive_missing_merge(self, spark):
        ids = [0, 1, 5, 6]
        assert self._gaps(spark, ids) == [(2, 4, 3)]

    def test_duplicates_and_nulls_ignored(self, spark):
        from py_schemax_spark.operators.integrity import sequence_gaps

        rows = [(0,), (0,), (1,), (None,), (3,), (3,)]
        df = spark.createDataFrame(rows, "id: long")
        got = [(r.gap_start, r.gap_end) for r in
               sequence_gaps(df, "id", 10).collect()]
        assert got == [(2, 2)]

    def test_dense_space_no_gaps(self, spark):
        assert self._gaps(spark, list(range(25)), bucket_size=7) == []

    def test_gap_at_bucket_boundary(self, spark):
        # 9 present, 10 missing, 11 present: the hole sits exactly on
        # the bucket edge → caught by the INTER-bucket value check
        assert self._gaps(spark, [8, 9, 11]) == [(10, 10, 1)]


class TestSnapshotReconcile:
    def test_all_statuses(self, spark):
        from py_schemax_spark.operators.integrity import snapshot_reconcile

        prev = spark.createDataFrame(
            [("a",)] * 3 + [("b",)] * 2 + [("gone",)] + [("same",)] * 4,
            "p: string",
        )
        cur = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 1 + [("new",)] * 2 + [("same",)] * 4,
            "p: string",
        )
        got = {
            r.part: (r.rows_prev, r.rows_cur, r.delta, r.status)
            for r in snapshot_reconcile(cur, prev, "p").collect()
        }
        assert got == {
            "a": (3, 5, 2, "grown"),
            "b": (2, 1, -1, "shrunk"),
            "gone": (1, 0, -1, "removed"),
            "new": (0, 2, 2, "added"),
        }
        assert "same" not in got

    def test_null_partition_is_a_partition(self, spark):
        from py_schemax_spark.operators.integrity import snapshot_reconcile

        prev = spark.createDataFrame([(None,), ("x",)], "p: string")
        cur = spark.createDataFrame([(None,), (None,), ("x",)], "p: string")
        got = {r.part: r.status
               for r in snapshot_reconcile(cur, prev, "p").collect()}
        assert got == {None: "grown"}
