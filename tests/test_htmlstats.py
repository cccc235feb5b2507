"""HTML structure profile: exact counts on hand-built markup, binary
vs string input parity, null handling, and plan shape (no shuffle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_schemax_spark.operators.htmlstats import html_profile


def test_html_profile_exact_counts(spark):
    page = (
        '<html><body><SCRIPT src="x.js"></SCRIPT>'
        '<h1>Title</h1><p>hello world</p>'
        '<a href="/1">one</a><A href="/2">two</A></body></html>'
    )
    df = spark.createDataFrame([("u1", page)], "url string, html string")
    r = html_profile(df).first()
    # opening/self-closing tags: html body SCRIPT h1 p a A = 7
    assert r["n_tags"] == 7
    assert r["n_links"] == 2
    assert r["n_scripts"] == 1
    assert r["html_bytes"] == len(page.encode())
    stripped = "Titlehello worldonetwo"
    assert r["text_bp"] == 10000 * len(stripped.encode()) // len(page.encode())


def test_html_profile_binary_and_string_agree(spark):
    page = "<html><body><p>café naïve</p></body></html>"
    s = spark.createDataFrame([("u", page)], "url string, html string")
    b = s.select("url", F.encode("html", "UTF-8").alias("html"))
    rs = html_profile(s).first()
    rb = html_profile(b).first()
    assert tuple(rs) == tuple(rb)
    # multibyte: byte length exceeds char length
    assert rs["html_bytes"] == len(page.encode("utf-8")) > len(page)


def test_html_profile_null_and_empty(spark):
    df = spark.createDataFrame(
        [("u1", None), ("u2", "")], "url string, html string"
    )
    got = {r["url"]: r for r in html_profile(df).collect()}
    assert got["u1"]["n_tags"] is None and got["u1"]["text_bp"] is None
    assert got["u2"]["html_bytes"] == 0 and got["u2"]["text_bp"] is None


def test_html_profile_plan_has_no_exchange(spark):
    df = spark.createDataFrame([("u", "<p>x</p>")], "url string, html string")
    plan = html_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_html_profile_no_int32_overflow_on_large_text(spark):
    # 10000 * octet_length must be computed in 64-bit: a page with
    # >~214 KB of stripped text wraps a 32-bit multiply
    big = "x" * 300_000
    page = "<p>" + big + "</p>"
    df = spark.createDataFrame([("u", page)], "url string, html string")
    r = html_profile(df).first()
    assert r["text_bp"] == (10000 * len(big)) // len(page)
