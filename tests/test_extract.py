"""Main-content extraction (operators/extract.py).

Mirrors the reference's test strategy (SURVEY.md §5): hand-computed
expected outputs on planted pages, edge rows (null / empty / no
content), boundary exactness on both gates, and plan-shape assertions
(the whole extractor is one shuffle-free projection).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.extract import extract_main_content

PAGE = (
    '<html><body><div><a href="/a">Home</a> <a href="/b">About</a>'
    "</div><script>var x=9;</script>"
    "<p>alpha bravo charlie delta echo foxtrot golf hotel india "
    "juliet kilo one</p>"
    "<p>tiny</p>"
    "<p>lima mike november oscar papa quebec romeo sierra tango "
    "&amp; uniform one</p>"
    '<div><a href="/c">Contact</a></div></body></html>'
)
B1 = ("alpha bravo charlie delta echo foxtrot golf hotel india "
      "juliet kilo one")
B2 = ("lima mike november oscar papa quebec romeo sierra tango "
      "& uniform one")


def _run(spark, rows, schema="url long, html string", **kw):
    df = spark.createDataFrame(rows, schema)
    return {
        r["url"]: r.asDict()
        for r in extract_main_content(df, key_col="url", **kw).collect()
    }


def test_planted_page_closed_form(spark):
    got = _run(spark, [(1, PAGE)])[1]
    assert got["main_text"] == B1 + "\n" + B2
    assert got["n_blocks"] == 5  # nav, b1, tiny, b2, footer
    assert got["n_kept"] == 2
    assert got["n_chars"] == len(B1) + 1 + len(B2)


def test_null_and_empty_html(spark):
    got = _run(spark, [(1, None), (2, ""), (3, "<html></html>")])
    assert got[1] == {
        "url": 1, "main_text": None, "n_blocks": None,
        "n_kept": None, "n_chars": None,
    }
    assert got[2]["main_text"] == "" and got[2]["n_kept"] == 0
    assert got[3]["main_text"] == "" and got[3]["n_blocks"] == 0


def test_nav_dropped_by_link_density_not_length(spark):
    # long nav: text is over min length but almost all of it is
    # anchor text -> dropped by the density gate alone
    nav = "<div>" + " ".join(
        f'<a href="/x{i}">navigation entry {i}</a>' for i in range(8)
    ) + "</div>"
    got = _run(spark, [(1, nav)])[1]
    assert got["n_blocks"] == 1
    assert got["n_kept"] == 0


def test_link_density_boundary_exact(spark):
    # 100-char block with exactly 30 link chars at max 3000 bp: kept
    # (30*10000 == 3000*100); 31 link chars: dropped
    pad = "x" * 70
    kept = f'<p><a href="/l">{"y" * 30}</a>{pad}</p>'
    dropped = f'<p><a href="/l">{"y" * 31}</a>{pad[:-1]}</p>'
    got = _run(spark, [(1, kept), (2, dropped)])
    assert got[1]["n_kept"] == 1
    assert got[2]["n_kept"] == 0


def test_min_length_boundary_exact(spark):
    got = _run(
        spark,
        [(1, "<p>" + "a" * 40 + "</p>"), (2, "<p>" + "a" * 39 + "</p>")],
    )
    assert got[1]["n_kept"] == 1
    assert got[2]["n_kept"] == 0


def test_script_style_comment_content_removed(spark):
    html = (
        "<style>.c{color:red}</style><script>const boilerplate_word "
        "= 1;</script><!-- hidden comment text --><p>"
        + "real content " * 5 + "end</p>"
    )
    got = _run(spark, [(1, html)])[1]
    assert "boilerplate_word" not in got["main_text"]
    assert "color" not in got["main_text"]
    assert "hidden" not in got["main_text"]
    assert got["main_text"].startswith("real content")


def test_uppercase_tags_and_inline_markup(spark):
    html = ("<HTML><BODY><P>alpha <B>bravo</B> charlie "
            + "delta " * 10 + "end</P></BODY></HTML>")
    got = _run(spark, [(1, html)])[1]
    assert got["n_kept"] == 1
    assert got["main_text"].startswith("alpha bravo charlie")


def test_entity_unescape_minimal_set(spark):
    html = "<p>" + "pad " * 12 + "1 &lt; 2 &amp; 3 &gt; 2 &amp;lt;</p>"
    got = _run(spark, [(1, html)])[1]
    assert got["main_text"].endswith("1 < 2 & 3 > 2 &lt;")


def test_binary_equals_string_payload(spark):
    s = _run(spark, [(1, PAGE)])
    b = _run(
        spark,
        [(1, PAGE.encode())],
        schema="url long, html binary",
    )
    assert s == b


def test_whitespace_collapse(spark):
    html = "<p>alpha\t\tbravo\n\ncharlie   " + "delta " * 10 + "x</p>"
    got = _run(spark, [(1, html)])[1]
    assert got["main_text"].startswith("alpha bravo charlie")


def test_plan_is_single_shuffle_free_projection(spark):
    df = spark.createDataFrame([(1, PAGE)], "url long, html string")
    out = extract_main_content(df, key_col="url")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_param_validation(spark):
    df = spark.createDataFrame([(1, PAGE)], "url long, html string")
    with pytest.raises(ValueError):
        extract_main_content(df, key_col="url", min_block_chars=-1)
