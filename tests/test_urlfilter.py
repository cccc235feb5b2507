import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.urlfilter import block_urls


def _run(spark, urls, domains, rules=None, **kw):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    bl = spark.createDataFrame([(d,) for d in domains], "domain string")
    rows = block_urls(df, bl, pattern_rules=rules, **kw).collect()
    return {r["doc_id"]: r for r in rows}


def test_block_urls_domain_semantics(spark):
    urls = [
        "https://tracker.org/x",            # exact
        "https://cdn.eu.tracker.org/y",     # subdomain, label boundary
        "https://nottracker.org/z",         # NOT a suffix at a boundary
        "https://clean.example.com/",       # clean
        "https://user:p@Sub.Tracker.ORG:8080/a",  # userinfo/port/case
        None,
        "not a url",
    ]
    got = _run(spark, urls, ["tracker.org"])
    assert got[0]["blocked"] and got[0]["reason"] == "domain:tracker.org"
    assert got[1]["blocked"] and got[1]["reason"] == "domain:tracker.org"
    assert not got[2]["blocked"] and got[2]["reason"] is None
    assert not got[3]["blocked"]
    assert got[4]["blocked"] and got[4]["host"] == "sub.tracker.org"
    assert got[5]["blocked"] is False and got[5]["reason"] is None
    assert got[6]["blocked"] is False


def test_block_urls_most_specific_domain_wins(spark):
    got = _run(
        spark,
        ["https://a.bad.site.org/"],
        ["site.org", "bad.site.org"],
    )
    assert got[0]["reason"] == "domain:bad.site.org"


def test_block_urls_pattern_rules_order_and_precedence(spark):
    urls = [
        "https://clean.org/casino-games",       # pattern 1
        "https://clean.org/p?utm_source=x",     # pattern 2
        "https://clean.org/casino?utm_source=x",  # first rule wins
        "https://tracker.org/casino",            # domain beats pattern
    ]
    rules = [("gambling", r"casino|poker"), ("tracking", r"[?&]utm_")]
    got = _run(spark, urls, ["tracker.org"], rules=rules)
    assert got[0]["reason"] == "pattern:gambling"
    assert got[1]["reason"] == "pattern:tracking"
    assert got[2]["reason"] == "pattern:gambling"
    assert got[3]["reason"] == "domain:tracker.org"


def test_block_urls_sanitizes_blocklist(spark):
    # duplicate entries must not double-emit rows; empty/null entries
    # would match the ''-suffix of nearly every host
    got = _run(
        spark,
        ["https://tracker.org/x", "https://clean.org/y"],
        ["tracker.org", "tracker.org", "", None],
    )
    assert len(got) == 2
    assert got[0]["blocked"] is True
    assert got[1]["blocked"] is False


def test_passthrough_rejects_colliding_input_columns(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "https://x.org/", "pre")],
        "doc_id long, url string, host string",
    )
    bl = spark.createDataFrame([("x.org",)], "domain string")
    with _pytest.raises(ValueError, match="collide"):
        block_urls(df, bl, passthrough=True)
    from py_schemax_spark.operators.normalize import normalize_text

    df2 = spark.createDataFrame(
        [(1, "t", True)], "doc_id long, text string, changed boolean"
    )
    with _pytest.raises(ValueError, match="collide"):
        normalize_text(df2, passthrough=True)


def test_block_urls_rejects_too_deep_blocklist_entry(spark):
    df = spark.createDataFrame([(1, "https://x.org/")], "doc_id long, url string")
    bl = spark.createDataFrame(
        [("a.b.c.d.e.f.g",)], "domain string"
    )
    with pytest.raises(ValueError, match="max_labels"):
        block_urls(df, bl)


def test_block_urls_plan_is_broadcast_only(spark):
    df = spark.createDataFrame(
        [(1, "https://x.org/")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([("x.org",)], "domain string")
    plan = (
        block_urls(df, bl, pattern_rules=[("k", "q")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the limit-probe runs eagerly; the RESULT plan must be pure
    # broadcast joins with NO exchange over the corpus side (the
    # blocklist-side distinct exchange is over <=5M domains and fine)
    assert "BroadcastHashJoin" in plan
    ex_lines = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
        or "Exchange rangepartitioning" in ln
    ]
    assert all("domain" in ln or "_m" in ln for ln in ex_lines), ex_lines
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan
