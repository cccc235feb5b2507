"""Semantic deduplication (SemDeDup-style embedding-space dedup).

Near-duplicate TEXT dedup (MinHash/SimHash) misses semantic
duplicates: rephrased boilerplate, templated articles, translations of
the same page. SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication") removes them in
embedding space: k-means-cluster the corpus embeddings, then inside
each cluster drop all but one of every group of points whose cosine
similarity exceeds a threshold. No reference analogue (the reference
has no data plane); part of the north star's training-pipeline
toolkit.

Pipeline (all pieces shared with the ANN/dedup operators):

1. coarse centroids — :func:`similarity.train_centroids`
   (deterministic seeding + distributed Lloyd steps, corpus never
   shuffles during assignment);
2. cluster assignment — one numpy matmul per Arrow batch against the
   broadcast centroid matrix;
3. within-cluster pairs ≥ threshold — ``applyInPandas`` per cluster
   with CHUNKED matmuls (block rows × cluster), so peak memory is
   bounded regardless of cluster size. The one corpus shuffle in the
   whole pipeline is this groupBy(list_id) co-location — the
   algorithm's definition, same as the paper's per-cluster pass;
4. connected components + min-id survivor — :func:`dedup.
   dedup_clusters` semantics (a~b, b~c collapse transitively).

Degenerate clusters are the same hazard as hot LSH buckets (a cluster
of b near-identical pages emits O(b²) pairs): clusters above
``max_cluster_size`` are EXCLUDED from the pairwise pass, logged with
their populations (same contract as the MinHash/SimHash caps — exact
duplicates remain exact-dedup's job; recall inside a dropped cluster
degrades, silently losing it does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_schemax_spark.operators.dedup import (
    _log_dropped_buckets,
    _track_persisted,
    dedup_clusters,
)
from py_schemax_spark.operators.similarity import (
    _assign_lists,
    _require_integral_id,
    train_centroids,
)


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_lists: int | None = None,
    iters: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 100_000,
    pair_block_rows: int = 1024,
    target_cluster_size: int = 10_000,
) -> DataFrame:
    """Per-vector semantic-dedup verdict: ``(id_col, list_id,
    cluster_id, is_survivor)`` for every input row with a non-null
    embedding. ``cluster_id`` is the min id among semantically
    connected near-duplicates (own id when untouched); ``is_survivor``
    marks the kept representative.

    Cluster-count sizing (round-3 verdict fix): when ``n_lists`` is
    None it is derived as ``ceil(n / target_cluster_size)`` — the
    SemDeDup paper's regime, where cluster population tracks a fixed
    target as the corpus grows. A FIXED default (the old ``n_lists=16``)
    silently defeats the operator at scale: every cluster exceeds
    ``max_cluster_size`` and is excluded, so nothing dedups.
    ``target_cluster_size`` must sit at or below ``max_cluster_size``
    with headroom for skew (default 10k vs the 100k cap).

    Per-task memory bound: each cluster is processed by ONE
    ``applyInPandas`` task holding the cluster's embedding matrix as
    float64 — ``cluster_rows × dim × 8 B`` (plus a
    ``pair_block_rows × cluster_rows × 8 B`` similarity block). At the
    10k target and dim=768 that is ~61 MB + ~82 MB per task; the 100k
    HARD cap bounds the worst skewed cluster at ~614 MB + ~820 MB —
    size ``max_cluster_size`` down if executors give tasks less than
    ~1.5 GB of headroom."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import types as T

    _require_integral_id(df, id_col, "semantic_dedup")
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    if n_lists is None:
        # one count over the (id, vec) projection — the k-means step
        # scans the corpus anyway, so this adds one cheap column-pruned
        # job, not a new scan pattern
        n_vecs = base.count()
        n_lists = max(1, math.ceil(n_vecs / max(1, target_cluster_size)))
    centroids = train_centroids(
        base, dim, n_lists=n_lists, iters=iters, seed=seed,
        id_col="vec_id", vec_col="vec",
    )
    assigned = _assign_lists(base, centroids, "vec", "_lists", nprobe=1).select(
        "vec_id", "vec", F.element_at("_lists", 1).alias("list_id")
    )
    assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)

    eligible = assigned
    if max_cluster_size is not None:
        # cluster populations: n_lists rows — a tiny aggregation that
        # broadcasts back (the LSH caps use a window because bucket
        # cardinality is corpus-sized; here it is n_lists)
        sizes = assigned.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("_n")
        )
        annotated = assigned.join(F.broadcast(sizes), "list_id")
        _log_dropped_buckets(
            annotated, ["list_id"], max_cluster_size, "semantic_dedup"
        )
        eligible = annotated.filter(F.col("_n") <= max_cluster_size).drop(
            "_n"
        )

    thr = float(threshold)
    blk = int(pair_block_rows)
    pair_schema = T.StructType(
        [
            T.StructField("key_a", T.LongType()),
            T.StructField("key_b", T.LongType()),
        ]
    )

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({"key_a": [], "key_b": []}).astype(
                {"key_a": "int64", "key_b": "int64"}
            )
        m = np.array(list(pdf["vec"]), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        outs_a, outs_b = [], []
        for s in range(0, len(ids), blk):
            block = m[s : s + blk]
            sims = block @ m.T  # (blk, n) — bounded by pair_block_rows
            bi, bj = np.nonzero(sims >= thr)
            gi = bi + s
            keep = gi < bj  # upper triangle: each pair once, no self
            a, b = ids[gi[keep]], ids[bj[keep]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            outs_a.append(lo)
            outs_b.append(hi)
        return pd.DataFrame(
            {
                "key_a": np.concatenate(outs_a) if outs_a else [],
                "key_b": np.concatenate(outs_b) if outs_b else [],
            }
        ).astype({"key_a": "int64", "key_b": "int64"})

    pairs = eligible.groupBy("list_id").applyInPandas(
        cluster_pairs, pair_schema
    )
    # cluster assignment + min-id survivor selection is exactly
    # dedup_clusters (passthrough keeps list_id riding along)
    clustered = dedup_clusters(
        assigned.select("vec_id", "list_id"),
        pairs,
        key_col="vec_id",
        passthrough=True,
    )
    out = clustered.select(
        F.col("vec_id").alias(id_col), "list_id", "cluster_id",
        "is_survivor",
    )
    keep = [assigned]
    keep.extend(getattr(clustered, "_schemax_persisted", []))
    return _track_persisted(out, keep)
