"""Funnel analysis (operators/funnel.py).

Mirrors the reference's test strategy (SURVEY.md §5): hand-computed
stage expectations, order/tie semantics, repeated steps, null
handling, partitioning invariance.
"""

from __future__ import annotations

import datetime as dt

import pytest

from py_schemax_spark.operators.funnel import funnel_report, funnel_stages


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string"
    )


STEPS = ("view", "click", "purchase")


def test_stages_hand_computed(spark):
    rows = [
        # user 1: full funnel in order
        (1, _ts(1), 1, "view"), (2, _ts(2), 1, "click"),
        (3, _ts(3), 1, "purchase"),
        # user 2: purchase BEFORE view/click -> stage stops at 2
        (4, _ts(1), 2, "purchase"), (5, _ts(2), 2, "view"),
        (6, _ts(3), 2, "click"),
        # user 3: only noise
        (7, _ts(1), 3, "error"),
        # user 4: view only
        (8, _ts(5), 4, "view"),
    ]
    got = {
        r["user"]: r["stage"]
        for r in funnel_stages(_df(spark, rows), STEPS).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 1}


def test_equal_timestamps_break_by_event_id(spark):
    # same ts: event_id order decides; click(id=1) precedes view(id=2)
    rows = [(1, _ts(1), 1, "click"), (2, _ts(1), 1, "view")]
    got = funnel_stages(_df(spark, rows), STEPS).collect()[0]
    assert got["stage"] == 1  # view matched, click was before it
    rows2 = [(1, _ts(1), 1, "view"), (2, _ts(1), 1, "click")]
    got2 = funnel_stages(_df(spark, rows2), STEPS).collect()[0]
    assert got2["stage"] == 2


def test_repeated_steps_need_distinct_events(spark):
    rows = [(1, _ts(1), 1, "view")]
    assert (
        funnel_stages(_df(spark, rows), ("view", "view"))
        .collect()[0]["stage"] == 1
    )
    rows2 = [(1, _ts(1), 1, "view"), (2, _ts(2), 1, "view")]
    assert (
        funnel_stages(_df(spark, rows2), ("view", "view"))
        .collect()[0]["stage"] == 2
    )


def test_null_ts_events_excluded(spark):
    rows = [(1, None, 1, "view"), (2, _ts(1), 1, "click")]
    got = funnel_stages(_df(spark, rows), STEPS).collect()[0]
    assert got["stage"] == 0  # the null-ts view never happened


def test_report_counts_at_least_stage(spark):
    rows = [
        (1, _ts(1), 1, "view"), (2, _ts(2), 1, "click"),
        (3, _ts(3), 1, "purchase"),
        (4, _ts(1), 2, "view"), (5, _ts(2), 2, "click"),
        (6, _ts(1), 3, "view"),
        (7, _ts(1), 4, "error"),
    ]
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_report(_df(spark, rows), STEPS).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1}


def test_report_empty_input_zero_rows_per_stage(spark):
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_report(_df(spark, []), STEPS).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0}


def test_partitioning_invariance(spark):
    rows = [
        (i, _ts(i % 7), i % 5,
         ["view", "click", "purchase", "error", "view"][i % 5])
        for i in range(60)
    ]
    df = _df(spark, rows)
    a = sorted(map(tuple, funnel_stages(df, STEPS).collect()))
    b = sorted(
        map(tuple, funnel_stages(df.repartition(11), STEPS).collect())
    )
    assert a == b


def test_empty_steps_validation(spark):
    with pytest.raises(ValueError):
        funnel_stages(_df(spark, []), ())


def test_funnel_single_user_exchange(spark):
    rows = [(1, _ts(1), 1, "view")]
    df = _df(spark, rows)
    plan = (
        funnel_stages(df, STEPS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # ONE hash exchange (the user groupBy); no join, no window
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan
