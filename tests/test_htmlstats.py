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


def test_html_metadata_extraction(spark):
    from py_schemax_spark.operators.htmlstats import html_metadata

    rows = [
        ("a", '<html lang="en"><head><title>T1</title>'
              '<meta name="description" content="d1">'
              '<link rel="canonical" href="https://c/1"></head>'),
        # reversed attribute orders
        ("b", "<HTML LANG='fr'><head><TITLE>T2</TITLE>"
              "<meta content='d2' name='description'>"
              "<link href='https://c/2' rel='canonical'></head>"),
        # everything absent -> NULLs
        ("c", "<html><body>no head</body></html>"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r["url"]: r for r in html_metadata(df).collect()}
    assert (got["a"]["title"], got["a"]["meta_description"],
            got["a"]["canonical_url"], got["a"]["html_lang"]) == (
        "T1", "d1", "https://c/1", "en")
    assert (got["b"]["title"], got["b"]["meta_description"],
            got["b"]["canonical_url"], got["b"]["html_lang"]) == (
        "T2", "d2", "https://c/2", "fr")
    assert all(got["c"][f] is None for f in
               ("title", "meta_description", "canonical_url", "html_lang"))
    assert all(got["d"][f] is None for f in
               ("title", "meta_description", "canonical_url", "html_lang"))


def test_html_metadata_binary_input_and_no_shuffle(spark):
    from py_schemax_spark.operators.htmlstats import html_metadata
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a",)], "url string"
    ).select("url", F.encode(F.lit("<title>Bin</title>"), "utf-8")
             .alias("html"))
    out = html_metadata(df)
    assert out.collect()[0]["title"] == "Bin"
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
