"""Keyword extraction (distributed tf-idf): exact contract against a
pure-Python twin, tie-break determinism, and cache release."""

from __future__ import annotations

import math
import random
import re

from py_schemax_spark.operators.keywords import tfidf_topk_terms

_WS = re.compile(r"[ \t\n\r\f]+")


def _py_topk(rows, k):
    docs = {}
    for d, text in rows:
        if text is None:
            continue
        toks = [t for t in _WS.split(text.lower()) if t]
        if toks:
            docs[d] = toks
    n = len(docs)
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = []
    for d, toks in docs.items():
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        scored = [
            (
                t,
                c,
                dfreq[t],
                c * (n // dfreq[t]),
                round(c * math.log(n / dfreq[t]), 4),
            )
            for t, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[3], x[2], x[0]))
        for rank, (t, c, df_, se, ti) in enumerate(scored[:k], 1):
            out.append((d, rank, t, c, df_, se, ti))
    return sorted(out)


def test_tfidf_topk_exact_small(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "apple durian durian elder"),
        (4, None),
        (5, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (
            r["doc_id"], r["rank"], r["term"], r["tf"], r["df"],
            r["score_exact"], r["tfidf"],
        )
        for r in tfidf_topk_terms(df, k=2).collect()
    )
    assert got == _py_topk(rows, 2)


def test_tfidf_topk_python_twin_sweep(spark):
    rng = random.Random(23)
    vocab = ["w%d" % i for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25))))
        for i in range(200)
    ]
    rows += [(900, None), (901, ""), (902, "UPPER upper UpPeR")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (
            r["doc_id"], r["rank"], r["term"], r["tf"], r["df"],
            r["score_exact"], r["tfidf"],
        )
        for r in tfidf_topk_terms(df, k=3).collect()
    )
    assert got == _py_topk(rows, 3)


def test_tfidf_releases_its_cache(spark):
    from py_schemax_spark.operators.dedup import release_all_intermediates

    # delta-based: session-scoped test fixtures legitimately hold
    # .cache()d tables in the same block manager — assert tfidf adds
    # nothing that release doesn't take back, not a global zero
    release_all_intermediates()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id bigint, text string"
    )
    tfidf_topk_terms(df, k=1).collect()
    release_all_intermediates()
    assert jsc.getPersistentRDDs().size() == before
