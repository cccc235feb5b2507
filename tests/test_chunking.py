"""Token-window chunking + concat-then-chunk packing: exact contract
tests against a pure-Python twin, partitioning invariance, and plan
shape (the chunker must not shuffle)."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.chunking import (
    NON_WS_RUN,
    chunk_documents,
    pack_chunks,
)

_WS = re.compile(r"[ \t\n\r\f]+")


def _py_tokens(text):
    if text is None:
        return []
    return [t for t in _WS.split(text) if t != ""]


def _py_chunks(text, chunk, overlap):
    toks = _py_tokens(text)
    n = len(toks)
    if n == 0:
        return []
    stride = chunk - overlap
    n_chunks = 1 + max(0, -(-(n - chunk) // stride)) if n > chunk else 1
    out = []
    for i in range(n_chunks):
        s = i * stride
        piece = toks[s : s + chunk]
        out.append((i, len(piece), " ".join(piece)))
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_chunk_documents_exact_windows(spark):
    toks10 = " ".join(f"t{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (1, toks10),  # 10 tokens, chunk=4 stride=3 -> 3 chunks
            (2, "a b c"),  # shorter than chunk -> 1 chunk
            (3, "a b c d"),  # exactly chunk -> 1 chunk
            (4, None),  # no chunks
            (5, " \t\n "),  # whitespace-only -> no chunks
        ],
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            df, chunk_tokens=4, overlap_tokens=1
        ).collect()
    }
    assert got == {
        (1, 0): (4, "t0 t1 t2 t3"),
        (1, 1): (4, "t3 t4 t5 t6"),
        (1, 2): (4, "t6 t7 t8 t9"),
        (2, 0): (3, "a b c"),
        (3, 0): (4, "a b c d"),
    }


def test_chunk_documents_normalizes_whitespace_and_covers(spark):
    df = _docs(spark, [(1, "  a\t\tb\nc  d\f e ")])
    rows = chunk_documents(df, chunk_tokens=2, overlap_tokens=0).collect()
    texts = [r["chunk_text"] for r in sorted(rows, key=lambda r: r["chunk_id"])]
    assert texts == ["a b", "c d", "e"]


def test_chunk_documents_python_twin_sweep(spark):
    rng = random.Random(7)
    words = ["w%d" % i for i in range(40)] + ["", " "]
    rows = []
    for i in range(120):
        n = rng.randrange(0, 50)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    rows.append((998, None))
    rows.append((999, "\x0bvt"))  # \x0B is NOT a delimiter by contract
    for chunk, ov in [(4, 0), (8, 3), (5, 4)]:
        df = _docs(spark, rows)
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(
                df, chunk_tokens=chunk, overlap_tokens=ov
            ).collect()
        )
        want = sorted(
            (d, i, k, t)
            for d, text in rows
            for (i, k, t) in _py_chunks(text, chunk, ov)
        )
        assert got == want, f"chunk={chunk} overlap={ov}"


def test_chunk_documents_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=-1)


def test_chunk_documents_plan_has_no_exchange(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = (
        chunk_documents(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure projection + generate


def test_pack_chunks_matches_python_cumsum(spark):
    rows = [
        (1, "a b c"),  # 3 tokens
        (2, None),  # 0
        (3, "x"),  # 1
        (4, " ".join(["t"] * 7)),  # 7
        (5, ""),  # 0
        (6, "p q"),  # 2
    ]
    df = _docs(spark, rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_token"],
            r["bin_id"],
            r["bin_offset"],
        )
        for r in pack_chunks(df, budget_tokens=4).collect()
    }
    running = 0
    want = {}
    for d, text in sorted(rows):
        k = len(_py_tokens(text))
        want[d] = (k, running, running // 4, running % 4)
        running += k
    assert got == want


def test_pack_chunks_invariant_to_input_partitioning(spark):
    rng = random.Random(11)
    rows = [
        (i, " ".join("w%d" % rng.randrange(9) for _ in range(rng.randrange(12))))
        for i in range(300)
    ]
    a = pack_chunks(_docs(spark, rows).repartition(1), budget_tokens=64)
    b = pack_chunks(_docs(spark, rows).repartition(13), budget_tokens=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_chunks_respects_order_col(spark):
    df = spark.createDataFrame(
        [(1, 9, "a b"), (2, 1, "c d e")],
        "doc_id bigint, pos bigint, text string",
    )
    got = {
        r["doc_id"]: r["start_token"]
        for r in pack_chunks(df, order_col="pos").collect()
    }
    assert got == {2: 0, 1: 3}  # pos order, not doc_id order


def test_non_ws_run_matches_contract():
    # the regexp token count and the split+filter tokens must agree
    assert _WS.pattern == "[ \\t\\n\\r\\f]+"
    assert NON_WS_RUN == "[^ \\t\\n\\r\\f]+"
