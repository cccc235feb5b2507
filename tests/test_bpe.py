"""Distributed BPE training (operators/bpe.py).

Mirrors the reference's test strategy (SURVEY.md §5): a pure-Python
BPE twin cross-checked against the distributed loop, deterministic
tie-breaks, early stop, cap semantics, partitioning invariance.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from py_schemax_spark.operators.bpe import (
    bpe_pair_counts,
    merge_pair_py,
    train_bpe,
    word_freq_table,
)

_WS = re.compile(r"[ \t\n\r\f]+")


def _bpe_py(texts, n_merges, top_words=None):
    words = Counter(
        tok
        for t in texts
        if t is not None
        for tok in _WS.split(t.lower())
        if tok
    )
    items = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))
    if top_words is not None:
        items = items[:top_words]
    sym = {w: list(w) for w, _ in items}
    merges = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for w, c in items:
            s = sym[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (left, right), n = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if n < 2:
            break
        merges.append((rank, left, right, n))
        for w in sym:
            sym[w] = merge_pair_py(sym[w], left, right)
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider low",
    None,
]


def test_merge_pair_py_left_to_right():
    assert merge_pair_py(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    # overlapping run: leftmost wins, no re-merge of the result
    assert merge_pair_py(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_pair_py(["x"], "a", "b") == ["x"]
    assert merge_pair_py([], "a", "b") == []


def test_word_freq_cap_deterministic(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {
        r["word"]: r["cnt"]
        for r in word_freq_table(df, top_words=3).collect()
    }
    # counts: low 6, newest 6, lower 2, wider 2 -> cap tie-breaks asc
    assert got == {"low": 6, "newest": 6, "lower": 2}


def test_train_bpe_matches_python_twin(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in train_bpe(df, n_merges=6, top_words=None)
        .orderBy("rank").collect()
    ]
    assert got == _bpe_py(CORPUS, 6)


def test_train_bpe_respects_cap(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in train_bpe(df, n_merges=4, top_words=2)
        .orderBy("rank").collect()
    ]
    assert got == _bpe_py(CORPUS, 4, top_words=2)


def test_train_bpe_early_stop_on_singletons(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    # every word is one char: no pairs at all -> zero merges
    assert train_bpe(df, n_merges=5).count() == 0
    df2 = spark.createDataFrame([("ab cd",)], "text string")
    # each pair occurs once -> below the n>=2 floor -> zero merges
    assert train_bpe(df2, n_merges=5).count() == 0


def test_train_bpe_partitioning_invariance(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    a = [tuple(r) for r in train_bpe(df, n_merges=5)
         .orderBy("rank").collect()]
    b = [tuple(r) for r in train_bpe(df.repartition(7), n_merges=5)
         .orderBy("rank").collect()]
    assert a == b


def test_pair_counts_match_python(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {
        (r["l"], r["r"]): r["n"]
        for r in bpe_pair_counts(df).collect()
    }
    pc: Counter = Counter()
    words = Counter(
        tok for t in CORPUS if t for tok in _WS.split(t.lower()) if tok
    )
    for w, c in words.items():
        for i in range(len(w) - 1):
            pc[(w[i], w[i + 1])] += c
    assert got == dict(pc)


def test_n_merges_validation(spark):
    df = spark.createDataFrame([("x y",)], "text string")
    with pytest.raises(ValueError):
        train_bpe(df, n_merges=0)
