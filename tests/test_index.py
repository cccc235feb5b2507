"""Inverted-index builder: gates, caps, determinism, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.index import build_inverted_index


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "apple banana cherry"),
        (1, "apple banana"),
        (2, "apple APPLE date"),       # case folds; dup in-doc counts once
        (3, None),                      # dropped
        (4, "  banana   end  "),       # whitespace runs
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_df_counts_and_postings(spark, docs):
    out = {
        r["term"]: r
        for r in build_inverted_index(docs, min_df=1).collect()
    }
    assert out["apple"]["df"] == 3
    assert out["apple"]["postings"] == [0, 1, 2]
    assert out["banana"]["postings"] == [0, 1, 4]
    assert out["date"]["df"] == 1
    assert not out["apple"]["truncated"]
    assert "" not in out


def test_index_df_gates(spark, docs):
    # min_df drops the singletons (cherry/date/end)
    out = build_inverted_index(docs, min_df=2).collect()
    assert {r["term"] for r in out} == {"apple", "banana"}
    # max_df drops the stopword-like terms (apple/banana, df 3)
    out = build_inverted_index(docs, min_df=1, max_df=2).collect()
    assert {r["term"] for r in out} == {"cherry", "date", "end"}


def test_index_truncation_keeps_true_df_and_lowest_keys(spark):
    docs = spark.createDataFrame(
        [(i, "hot") for i in range(30)], "doc_id long, text string"
    )
    row = build_inverted_index(docs, max_postings=5).collect()[0]
    assert row["df"] == 30
    assert row["postings"] == [0, 1, 2, 3, 4]
    assert row["truncated"] is True


def test_index_partitioning_invariant(spark, docs):
    a = build_inverted_index(docs.repartition(7), min_df=1).collect()
    b = build_inverted_index(docs.coalesce(1), min_df=1).collect()
    key = lambda r: (r["term"], r["df"], tuple(r["postings"]),
                     r["truncated"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_index_validates_args(spark, docs):
    with pytest.raises(ValueError, match="min_df"):
        build_inverted_index(docs, min_df=0)
    with pytest.raises(ValueError, match="max_postings"):
        build_inverted_index(docs, max_postings=0)
