"""Byte-identical extraction invariant (BASELINE.json input_hint;
SURVEY.md §7 hard-point (b)): UDF(html) == pure-Python reference
extraction == stored text, byte-for-byte, including multibyte UTF-8."""

from pyspark.sql import functions as F

from py_schemax_spark.functions.extraction import (
    extract_text_py,
    extract_text_udf,
    render_html_expr,
    render_html_py,
)
from py_schemax_spark.sources.datagen import gen_pages


def test_pure_python_roundtrip():
    cases = [
        "hello world",
        "",
        "multibyte: 日本語 café über Ελληνικά עברית",
        "escapes: a & b < c > d && <<>>",
        "mixed 中文 & <tags> ß",
    ]
    for text in cases:
        html = render_html_py(text)
        assert extract_text_py(html) == text
        # byte identity, not just str equality
        assert extract_text_py(html).encode("utf-8") == text.encode("utf-8")


def test_corrupt_html_returns_none():
    assert extract_text_py(b"\x00corrupt\x00") is None
    assert extract_text_py(None) is None
    assert extract_text_py(b"<html><body>no markers</body></html>") is None
    # invalid UTF-8 in the body
    bad = render_html_py("x")[:-len("</article></body></html>")]
    bad = bad + b"\xff\xfe" + b"</article></body></html>"
    assert extract_text_py(bad) is None


def test_jvm_renderer_matches_python_renderer(spark):
    texts = [
        "hello", "a & b < c > d", "日本語 straße", "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        "text", render_html_expr(F.col("text")).alias("html")
    ).collect()
    for r in rows:
        assert bytes(r["html"]) == render_html_py(r["text"]), r["text"]


def test_udf_extraction_byte_identical_on_generated_pages(spark):
    # clean generation: EVERY row must extract byte-identically
    pages = gen_pages(spark, 1000, clean=True)
    mismatches = (
        pages.select(
            "text", extract_text_udf(F.col("html")).alias("extracted")
        )
        .filter(~F.col("extracted").eqNullSafe(F.col("text")))
        .count()
    )
    assert mismatches == 0


def test_udf_extraction_flags_only_corrupt_rows(spark):
    pages = gen_pages(spark, 2000)  # dirty: ~0.1% corrupt html
    df = pages.select(
        "html", "text", extract_text_udf(F.col("html")).alias("extracted")
    )
    mism = df.filter(~F.col("extracted").eqNullSafe(F.col("text")))
    # every mismatch must be a corrupt-html row, never a real-text row
    for r in mism.collect():
        assert extract_text_py(bytes(r["html"])) is None
