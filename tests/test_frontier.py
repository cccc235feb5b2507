"""Frontier expansion (operators/frontier.py).

Mirrors the reference's test strategy (SURVEY.md §5): hand-computed
expectations on planted URL sets, canonicalization on BOTH sides,
null/empty handling, and plan assertions for the gated broadcast.
"""

from __future__ import annotations

import pytest

from py_schemax_spark.operators.frontier import build_frontier


def _run(spark, cand, seen, **kw):
    cdf = spark.createDataFrame([(u,) for u in cand], "url string")
    sdf = spark.createDataFrame([(u,) for u in seen], "url string")
    return {
        r["url"]: r["n_refs"]
        for r in build_frontier(cdf, sdf, **kw).collect()
    }


def test_decorated_spellings_collapse_and_count(spark):
    got = _run(
        spark,
        [
            "https://a.org/p?b=2&a=1",
            "HTTPS://WWW.A.ORG:443/p/?a=1&b=2&utm_source=x#f",
            "https://a.org/q",
        ],
        [],
    )
    assert got == {"https://a.org/p?a=1&b=2": 2, "https://a.org/q": 1}


def test_seen_side_canonicalizes_before_antijoin(spark):
    got = _run(
        spark,
        ["https://a.org/p", "https://a.org/q"],
        ["HTTPS://WWW.A.ORG/p/"],  # decorated spelling of seen page
    )
    assert got == {"https://a.org/q": 1}


def test_null_and_empty_candidates_dropped(spark):
    got = _run(spark, ["https://a.org/x", None, ""], [])
    assert got == {"https://a.org/x": 1}


def test_shuffle_fallback_same_result(spark):
    cand = [f"https://h{i % 5}.org/p{i}" for i in range(20)]
    seen = [f"https://h{i % 5}.org/p{i}" for i in range(0, 20, 4)]
    a = _run(spark, cand, seen)
    b = _run(spark, cand, seen, max_seen_broadcast_rows=0)
    assert a == b
    assert len(a) == 15


def test_broadcast_gate_plans(spark):
    cdf = spark.createDataFrame(
        [("https://a.org/1",), ("https://a.org/2",)], "url string"
    )
    sdf = spark.createDataFrame([("https://a.org/1",)], "url string")
    small = build_frontier(cdf, sdf)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small
    big = build_frontier(cdf, sdf, max_seen_broadcast_rows=0)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_big
