"""Cohort retention (operators/retention.py).

Mirrors the reference's test strategy (SURVEY.md §5): hand-computed
cohort tables, anonymous (null-user) cohort, offset cap, partitioning
invariance.
"""

from __future__ import annotations

import datetime as dt

from py_schemax_spark.operators.retention import retention_cohorts


def _ts(day, hour=12):
    return dt.datetime(2024, 1, day, hour)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def _run(spark, rows, **kw):
    return {
        (str(r["cohort_day"]), r["offset_days"]): r["n_users"]
        for r in retention_cohorts(_df(spark, rows), **kw).collect()
    }


def test_hand_computed_cohorts(spark):
    rows = [
        (1, _ts(1), 1), (2, _ts(1), 2),           # day-1 cohort: u1,u2
        (3, _ts(2), 1),                           # u1 back on day 2
        (4, _ts(3), 1), (5, _ts(3), 2),           # both back day 3
        (6, _ts(2), 3),                           # day-2 cohort: u3
        (7, _ts(2, hour=23), 3),                  # same day, once
    ]
    got = _run(spark, rows)
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 2,
        ("2024-01-02", 0): 1,
    }


def test_anonymous_null_user_cohort_counted(spark):
    rows = [(1, _ts(1), None), (2, _ts(2), None), (3, _ts(1), 7)]
    got = _run(spark, rows)
    # the null user IS a cohort member: day1 offset0 has anon + u7
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1  # anon back on day 2


def test_null_ts_excluded(spark):
    rows = [(1, None, 1), (2, _ts(5), 1)]
    got = _run(spark, rows)
    assert got == {("2024-01-05", 0): 1}


def test_offset_cap(spark):
    rows = [(1, _ts(1), 1), (2, _ts(30), 1)]
    got = _run(spark, rows, max_offset_days=7)
    assert got == {("2024-01-01", 0): 1}


def test_partitioning_invariance(spark):
    rows = [(i, _ts(i % 9 + 1), i % 6 if i % 13 else None)
            for i in range(80)]
    df = _df(spark, rows)
    a = sorted(map(tuple, retention_cohorts(df).collect()))
    b = sorted(map(tuple, retention_cohorts(df.repartition(9)).collect()))
    assert a == b
