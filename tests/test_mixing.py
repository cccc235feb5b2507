import hashlib

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.mixing import sample_to_token_budget


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _twin(rows, budgets, default=0):
    """Driver-side python twin: single-pass per-group greedy in
    (md5(key), key) order."""
    out = {}
    by_grp = {}
    for doc_id, lang, text in rows:
        by_grp.setdefault(lang, []).append((doc_id, text))
    for lang, docs in by_grp.items():
        docs.sort(key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest(), d[0]))
        cum = 0
        budget = budgets.get(lang, default) if lang is not None else default
        for doc_id, text in docs:
            nt = len(text.split()) if text else 0
            out[doc_id] = (nt, cum, cum < budget)
            cum += nt
    return out


def test_mixing_matches_python_twin(spark):
    rows = [
        (i, ["en", "de", "fr", None][i % 4], ("w " * (i % 7)).strip() or None)
        for i in range(200)
    ]
    budgets = {"en": 40, "de": 0, "fr": 10**9}
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_before"], r["kept"])
        for r in sample_to_token_budget(_mk(spark, rows), budgets).collect()
    }
    assert got == _twin(rows, budgets)
    # de budget 0 and null-group default 0: nothing kept
    assert not any(
        got[i][2] for i in range(200) if i % 4 in (1, 3)
    )
    # fr effectively unlimited: everything kept
    assert all(got[i][2] for i in range(200) if i % 4 == 2)


def test_mixing_overshoot_at_most_one_doc_and_nonempty(spark):
    rows = [(i, "en", "a b c d e") for i in range(50)]  # 5 tokens each
    got = sample_to_token_budget(_mk(spark, rows), {"en": 12}).collect()
    kept = [r for r in got if r["kept"]]
    # 12-token budget, 5-token docs: cum_before 0,5,10 kept -> 3 docs
    assert len(kept) == 3
    assert sum(r["n_tokens"] for r in kept) == 15  # <= budget + one doc
    # tiny budget still keeps one document
    got1 = sample_to_token_budget(_mk(spark, rows), {"en": 1}).collect()
    assert sum(1 for r in got1 if r["kept"]) == 1


def test_mixing_partitioning_invariance(spark):
    rows = [(i, ["en", "de"][i % 2], "x " * (i % 5)) for i in range(300)]
    budgets = {"en": 100, "de": 57}
    a = {
        r["doc_id"]: (r["cum_before"], r["kept"])
        for r in sample_to_token_budget(
            _mk(spark, rows).repartition(1), budgets
        ).collect()
    }
    b = {
        r["doc_id"]: (r["cum_before"], r["kept"])
        for r in sample_to_token_budget(
            _mk(spark, rows).repartition(37), budgets
        ).collect()
    }
    assert a == b


def _bk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, score long"
    )


def test_perplexity_buckets_thirds_by_token_mass(spark):
    from py_schemax_spark.operators.mixing import perplexity_buckets

    # 9 docs x 4 tokens, scores 9..1 (best first): 36 tokens -> cuts
    # at 12/24: docs ranked 1-3 head, 4-6 middle, 7-9 tail
    rows = [(i, "en", "a b c d", 10 - i) for i in range(1, 10)]
    out = {
        r["doc_id"]: (r["bucket_id"], r["bucket"], r["cum_before"])
        for r in perplexity_buckets(_bk(spark, rows), "score").collect()
    }
    assert [out[i][1] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert out[1][2] == 0 and out[4][2] == 12 and out[9][2] == 32


def test_perplexity_buckets_per_group_and_nulls_worst(spark):
    from py_schemax_spark.operators.mixing import perplexity_buckets

    rows = [
        (1, "en", "w w w", 100),
        (2, "en", "w w w", 50),
        (3, "en", "w w w", None),   # null score -> tail
        (4, "de", "w w", 7),        # own group: alone -> head
    ]
    out = {
        r["doc_id"]: r
        for r in perplexity_buckets(_bk(spark, rows), "score").collect()
    }
    assert out[1]["bucket"] == "head"
    assert out[3]["bucket"] == "tail"
    assert out[4]["bucket"] == "head" and out[4]["cum_before"] == 0


def test_perplexity_buckets_ascending_mode_and_label_check(spark):
    import pytest as _pytest

    from py_schemax_spark.operators.mixing import perplexity_buckets

    rows = [(1, "en", "a b", 5), (2, "en", "a b", 1)]
    out = {
        r["doc_id"]: r["bucket_id"]
        for r in perplexity_buckets(
            _bk(spark, rows), "score", n_buckets=2, labels=("lo", "hi"),
            best_first_descending=False,
        ).collect()
    }
    assert out[2] == 0 and out[1] == 1  # ascending: lowest score first
    with _pytest.raises(ValueError, match="labels"):
        perplexity_buckets(_bk(spark, rows), "score", n_buckets=2)


def test_mixing_rejects_negative_budget(spark):
    df = _mk(spark, [(1, "en", "x")])
    with pytest.raises(ValueError, match="negative"):
        sample_to_token_budget(df, {"en": -1})


def test_mixing_no_group_wide_window_in_plan(spark):
    df = _mk(spark, [(i, "en", "x") for i in range(10)])
    plan = (
        sample_to_token_budget(df, {"en": 5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchange over the corpus is the range partitioning; the
    # window must be partition-local (_pid in its partition spec) and
    # the offset join a broadcast
    assert "rangepartitioning" in plan.lower()
    assert "_pid" in plan
    assert "BroadcastHashJoin" in plan
