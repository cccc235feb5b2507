import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_schemax_spark.operators.semdedup import semantic_dedup

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _unit(angle_deg, scale=1.0):
    a = math.radians(angle_deg)
    return [float(scale * math.cos(a)), float(scale * math.sin(a)), 0.0, 0.0]


def _mk(spark, rows):
    return spark.createDataFrame(rows, VEC_SCHEMA)


def test_semantic_dedup_groups_near_duplicates(spark):
    # three tight bundles (within ~2 deg) + two isolated directions;
    # magnitudes vary (cosine ignores scale)
    rows = []
    for i, ang in enumerate([0, 1, 2]):          # bundle A: ids 0-2
        rows.append((i, _unit(ang, 1 + i)))
    for i, ang in enumerate([90, 91]):           # bundle B: ids 10-11
        rows.append((10 + i, _unit(ang, 0.5)))
    rows.append((20, _unit(45)))                 # isolated
    rows.append((21, _unit(-45)))                # isolated
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _mk(spark, rows), dim=4, threshold=0.999, n_lists=4
        ).collect()
    }
    assert {out[i]["cluster_id"] for i in (0, 1, 2)} == {0}
    assert out[0]["is_survivor"] is True
    assert out[1]["is_survivor"] is False and out[2]["is_survivor"] is False
    assert {out[i]["cluster_id"] for i in (10, 11)} == {10}
    assert out[20]["cluster_id"] == 20 and out[20]["is_survivor"] is True
    assert out[21]["cluster_id"] == 21 and out[21]["is_survivor"] is True


def test_semantic_dedup_exact_duplicates_always_collapse(spark):
    # identical vectors must land in the same list (same matmul, same
    # argmax) and pair at sim 1.0 regardless of clustering randomness
    rows = []
    for i in range(40):
        rows.append((i, _unit(i * 9.0)))
    for i in range(40):                          # exact dup of each
        rows.append((100 + i, _unit(i * 9.0)))
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _mk(spark, rows), dim=4, threshold=0.9999, n_lists=8
        ).collect()
    }
    for i in range(40):
        assert out[100 + i]["cluster_id"] == out[i]["cluster_id"], i
        assert out[i]["list_id"] == out[100 + i]["list_id"], i


def test_semantic_dedup_transitive_chain(spark):
    # a~b and b~c above threshold, a~c below: one cluster of three
    rows = [(0, _unit(0)), (1, _unit(1.2)), (2, _unit(2.4))]
    thr = math.cos(math.radians(1.5))
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in semantic_dedup(
            _mk(spark, rows), dim=4, threshold=thr, n_lists=1
        ).collect()
    }
    # sanity: 0~2 is genuinely below threshold
    assert math.cos(math.radians(2.4)) < thr
    assert out == {0: 0, 1: 0, 2: 0}


def test_semantic_dedup_cluster_cap_drops_but_keeps_rows(spark):
    # one degenerate bundle larger than the cap: its rows survive as
    # singletons (pairwise pass skipped), smaller bundles still dedup
    rows = [(i, _unit(0.001 * i)) for i in range(30)]       # huge bundle
    rows += [(100, _unit(90)), (101, _unit(90.5))]           # small pair
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _mk(spark, rows),
            dim=4,
            threshold=0.999,
            n_lists=2,
            max_cluster_size=10,
        ).collect()
    }
    assert all(out[i]["cluster_id"] == i for i in range(30))
    assert out[101]["cluster_id"] == 100


def test_semantic_dedup_null_embeddings_excluded(spark):
    rows = [(0, _unit(0)), (1, None), (2, _unit(0.5))]
    out = semantic_dedup(
        _mk(spark, rows), dim=4, threshold=0.999, n_lists=1
    ).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 2]


def test_semantic_dedup_rejects_non_integral_ids(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<float>"
    )
    with pytest.raises(TypeError):
        semantic_dedup(df, dim=2)


def test_semantic_dedup_autosizes_n_lists_to_target(spark):
    """Round-3 verdict fix: a FIXED n_lists default silently defeats
    the operator at scale (every cluster exceeds max_cluster_size and
    is excluded, so nothing dedups). With n_lists=None it must derive
    ceil(n / target_cluster_size) so clusters track the target and a
    corpus far larger than (old_default x cap) still dedups."""
    rows = []
    # 200 directions, one exact duplicate each -> 400 vectors; any
    # honest clustering puts each dup pair in one list together
    for i in range(200):
        rows.append((i, _unit(i * 1.8)))
        rows.append((1000 + i, _unit(i * 1.8)))
    out = semantic_dedup(
        _mk(spark, rows),
        dim=4,
        # 0.9999 sits between exact-dup cosine (1.0) and the 1.8-deg
        # neighbor cosine (~0.99951), so each cluster is exactly one
        # planted pair
        threshold=0.9999,
        max_cluster_size=60,        # observed max list size at this
        target_cluster_size=20,     # seed is 44; derive ceil(400/20)
        seed=7,                     # = 20 lists
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 400
    # every exact-dup pair collapsed: min id survives, twin does not
    # (a dup pair is identical vectors -> same argmax -> same list,
    # independent of how k-means split the corpus)
    collapsed = sum(
        1
        for i in range(200)
        if by_id[i]["cluster_id"] == by_id[1000 + i]["cluster_id"] == i
        and by_id[i]["is_survivor"] and not by_id[1000 + i]["is_survivor"]
    )
    assert collapsed == 200, collapsed
    # and the derived list count actually spread the corpus: 20 lists
    # over 400 vectors, none handed the whole corpus / none excluded
    from collections import Counter

    sizes = Counter(r["list_id"] for r in out)
    assert len(sizes) == 20, len(sizes)
    assert max(sizes.values()) <= 60, sizes.most_common(3)
