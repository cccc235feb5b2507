"""Gopher/C4 quality-filter signals — hand-computed expectations on
crafted documents, plus Python-recomputed sweeps over generated text
(the semantic-twin pattern the other regexp operators use)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F  # noqa: F401

from py_schemax_spark.operators.quality import (
    GOPHER_STOPWORDS,
    c4_profile,
    gopher_profile,
)

_WS = re.compile(r"[ \t\n\r\f]+")


def _py_gopher(text: str) -> dict:
    """Independent Python recomputation of every gopher signal."""
    words = [w for w in _WS.split(text) if w]
    n_words = len(words)
    word_chars = sum(len(w) for w in words)
    n_symbols = len(re.findall(r"#|\.\.\.|…", text))
    lines = text.split("\n")
    n_lines = len(lines)
    bullet = sum(1 for ln in lines if re.match(r"^[ \t]*[-*•‣▪]", ln))
    ellipsis = sum(1 for ln in lines if re.search(r"(\.\.\.|…)[ \t]*$", ln))
    alpha = sum(1 for w in words if re.search(r"[a-zA-Z]", w))
    stops = sum(1 for w in words if w.lower() in GOPHER_STOPWORDS)
    bp = lambda n, d: (n * 10000) // d if d else None  # noqa: E731
    return {
        "n_words": n_words,
        "mean_word_len_x100": (word_chars * 100) // n_words if n_words else None,
        "symbol_bp": bp(n_symbols, n_words),
        "n_lines": n_lines,
        "bullet_bp": bp(bullet, n_lines),
        "ellipsis_bp": bp(ellipsis, n_lines),
        "alpha_bp": bp(alpha, n_words),
        "stop_hits": stops,
    }


def test_gopher_signals_match_python_twin(spark):
    texts = [
        "the cat sat on the mat with a hat and that was that",
        "- one\n- two\n- three\nplain line",
        "to be continued...\nor not…\nfinal",
        "### ### #hash tag… more #",
        "12345 67890 !!! ??? ---",
        "   ",
        "",
        "word",
        "a\tb\tc of the and to be have with",
        "café naïve résumé crème",  # multibyte chars in words
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_profile(df).collect()}
    for i, t in enumerate(texts):
        want = _py_gopher(t)
        for k, v in want.items():
            assert got[i][k] == v, f"doc {i} field {k}: {got[i][k]} != {v}"


def test_gopher_flags_and_verdict(spark):
    good = (
        "the quick brown fox jumps over a lazy dog and then runs to "
        "town with great speed because that is what foxes have done "
        "for many years in stories told by people who write about "
        "animals doing things in the forest near the river bank "
        "where trees grow tall and birds sing songs every morning"
    )
    assert len([w for w in good.split() if w]) >= 50
    bad_short = "too short"
    bad_symbols = "the " * 50 + "# " * 20
    df = spark.createDataFrame(
        [(1, good), (2, bad_short), (3, bad_symbols), (4, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_profile(df).collect()}
    assert got[1]["gopher_pass"] is True
    assert got[2]["gopher_pass"] is False and got[2]["flag_word_count"] is False
    assert got[3]["gopher_pass"] is False and got[3]["flag_symbol"] is False
    assert got[4]["gopher_pass"] is False and got[4]["n_words"] is None


def test_gopher_stop_hits_adjacent_and_edges(spark):
    # adjacent stop words must each count (the doubled-space padding
    # exists exactly for this), and string-edge words count too
    df = spark.createDataFrame(
        [(1, "of of of"), (2, "the"), (3, "THE AND to"), (4, "xthe they")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["stop_hits"] for r in gopher_profile(df).collect()}
    assert got == {1: 3, 2: 1, 3: 3, 4: 0}


def test_c4_profile_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "First sentence. Second one! Third thing? Clean page."),
            (2, "Lorem Ipsum dolor sit. More. Text."),
            (3, "enable javascript to view this. Page. Here."),
            (4, "code { margin: 0 } is leaked. Here. Now."),
            (5, "read our Privacy Policy please. Ok. Fine."),
            (6, "only two. sentences here!"),
            (7, None),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in c4_profile(df).collect()}
    assert got[1]["c4_keep"] is True and got[1]["n_sentences"] == 4
    assert got[2]["has_lorem_ipsum"] is True and got[2]["c4_keep"] is False
    assert got[3]["has_javascript"] is True and got[3]["c4_keep"] is False
    assert got[4]["has_curly"] is True and got[4]["c4_keep"] is False
    assert got[5]["has_bad_phrase"] is True and got[5]["c4_keep"] is False
    assert got[6]["c4_keep"] is False  # < 3 sentences
    assert got[7]["c4_keep"] is False


def test_c4_terminal_line_bp(spark):
    text = 'ends with period.\nno terminal here\nquoted end!"\nbang!'
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    row = c4_profile(df).collect()[0]
    # lines 1, 3 (closing quote after !), 4 end terminal; 4 lines total
    assert row["terminal_line_bp"] == (3 * 10000) // 4


def test_quality_plan_is_scan_only(spark):
    """Both profiles must stay pure projections — no exchange."""
    df = spark.createDataFrame(
        [(1, "a. b. c.")], "doc_id bigint, text string"
    )
    for op in (gopher_profile, c4_profile):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_induce_domain_blocklist_gates_and_exact_bp(spark):
    from py_schemax_spark.operators.quality import induce_domain_blocklist

    rows = (
        # big.org: 3 docs, 2 fail (one via null verdict) -> 6666 bp,
        # blocked at max_fail_bp=5000
        [("big.org", True), ("big.org", False), ("big.org", None)]
        # ok.org: 3 docs, 1 fail -> 3333 bp, not blocked
        + [("ok.org", True), ("ok.org", True), ("ok.org", False)]
        # tiny.org: 1 doc, 1 fail -> 10000 bp but UNDER min_docs
        + [("tiny.org", False)]
    )
    df = spark.createDataFrame(rows, "domain string, gopher_pass boolean")
    out = {
        r["domain"]: r
        for r in induce_domain_blocklist(
            df, pass_col="gopher_pass", min_docs=2, max_fail_bp=5000
        ).collect()
    }
    assert (out["big.org"]["n_docs"], out["big.org"]["n_fail"]) == (3, 2)
    assert out["big.org"]["fail_bp"] == 6666  # exact integral div
    assert out["big.org"]["blocked"] is True
    assert out["ok.org"]["fail_bp"] == 3333
    assert out["ok.org"]["blocked"] is False
    # sample gate: 100% fail but only 1 doc
    assert out["tiny.org"]["blocked"] is False


def test_induce_domain_blocklist_threshold_is_strict(spark):
    """Exactly AT the threshold is not blocked (rate must EXCEED)."""
    from py_schemax_spark.operators.quality import induce_domain_blocklist

    df = spark.createDataFrame(
        [("d.org", False), ("d.org", True)],
        "domain string, ok boolean",
    )
    row = induce_domain_blocklist(
        df, pass_col="ok", min_docs=1, max_fail_bp=5000
    ).collect()[0]
    assert row["fail_bp"] == 5000 and row["blocked"] is False


def test_induced_blocklist_feeds_block_urls(spark):
    """Closing the curate loop: the induced list is block_urls input."""
    from pyspark.sql import functions as F

    from py_schemax_spark.operators.quality import induce_domain_blocklist
    from py_schemax_spark.operators.urlfilter import block_urls

    verdicts = spark.createDataFrame(
        [("bad.org", False), ("bad.org", False), ("good.org", True),
         ("good.org", True)],
        "domain string, ok boolean",
    )
    bl = (
        induce_domain_blocklist(verdicts, pass_col="ok", min_docs=2)
        .filter("blocked")
        .select("domain")
    )
    docs = spark.createDataFrame(
        [(0, "https://sub.bad.org/x"), (1, "https://good.org/y")],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["blocked"]
        for r in block_urls(docs, bl).collect()
    }
    assert got == {0: True, 1: False}
