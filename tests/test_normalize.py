import random

from pyspark.sql import functions as F

from py_schemax_spark.operators.normalize import (
    normalize_py,
    normalize_text,
)


def _run(spark, vals):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, text string"
    )
    rows = normalize_text(df).collect()
    return {r["doc_id"]: r for r in rows}


def test_normalize_hand_cases(spark):
    vals = [
        "café",          # decomposed -> composed
        "café",           # already NFC: unchanged
        "a\x08b\x7fc",         # control chars stripped
        "a \t  b\t\tc",        # horizontal runs collapse, newlines kept
        "  x\n y \n",          # edge trim incl. trailing newline
        "line1\nline2",        # newline survives
        None,
        "",
    ]
    got = _run(spark, vals)
    assert got[0]["norm_text"] == "café"
    assert got[0]["changed"] is True
    assert got[1]["norm_text"] == "café"
    assert got[1]["changed"] is False
    assert got[2]["norm_text"] == "abc"
    assert got[3]["norm_text"] == "a b c"
    assert got[4]["norm_text"] == "x\n y"
    assert got[5]["norm_text"] == "line1\nline2"
    assert got[5]["changed"] is False
    assert got[6]["norm_text"] is None
    assert got[6]["changed"] is False
    assert got[6]["n_raw"] is None
    assert got[7]["norm_text"] == ""


def test_normalize_trailing_newline_not_dollar_semantics(spark):
    # Java regex '$' matches BEFORE a final line terminator; the
    # \A/\z contract must trim 'x\n' -> 'x' and 'x\n\n' -> 'x'
    got = _run(spark, ["x\n", "x\n\n", "\n\nx"])
    assert got[0]["norm_text"] == "x"
    assert got[1]["norm_text"] == "x"
    assert got[2]["norm_text"] == "x"


def test_normalize_matches_python_twin_random_sweep(spark):
    rng = random.Random(20260818)
    alphabet = (
        list("ab c\t\n")
        + ["é", "é", "́", "\x08", "\x7f", "ß",
           "İ", "Ａ", "Å", "Å"]
    )
    vals = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
        for _ in range(300)
    ] + [None]
    got = _run(spark, vals)
    for i, v in enumerate(vals):
        assert got[i]["norm_text"] == normalize_py(v), repr(v)


def test_normalize_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        normalize_text(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
