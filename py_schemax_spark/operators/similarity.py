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
    pseudo-random hyperplanes. Plane components are deterministic ±1
    derived driver-side from blake2b("seed:plane:component") and folded
    in as constant literals — no RNG state to ship, identical across
    executors/runs. (Round 1 briefly derived planes differently;
    bucket ids are session-internal, not a persisted contract — do not
    compare bucket tables across engine versions.)"""
    import hashlib

    def comp(p: int, i: int) -> float:
        h = hashlib.blake2b(
            f"{seed}:{p}:{i}".encode(), digest_size=2
        ).digest()
        return 1.0 if h[0] & 1 == 0 else -1.0

    plane_bits = []
    for p in range(n_planes):
        # plane components are CONSTANT per (seed, plane, i) — derive
        # them driver-side and fold them in as literals (constant-
        # folded by Catalyst) instead of re-hashing per row
        comps = F.array(*[F.lit(comp(p, i)) for i in range(dim)])
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


def _assign_lists(
    df: DataFrame, centroids, vec_col: str, out_col: str, nprobe: int = 1
):
    """Attach the id(s) of the ``nprobe`` nearest centroids (cosine) to
    every row via one numpy matmul per Arrow batch. Returns df +
    ``out_col`` (exploded → one row per probed list)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from typing import Iterator

    cmat = np.asarray(centroids, dtype=np.float64)
    cmat = cmat / np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
    bc = df.sparkSession.sparkContext.broadcast(cmat)
    fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.IntegerType()))
    ]
    out_schema = T.StructType(fields)
    cols = [f.name for f in df.schema.fields]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        topn = min(nprobe, c.shape[0])
        for pdf in batches:
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            if m.size == 0:
                pdf[out_col] = pd.Series([], dtype=object)
                yield pdf
                continue
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ c.T
            # nprobe nearest lists, nearest first (argpartition + sort)
            idx = np.argpartition(-sims, topn - 1, axis=1)[:, :topn]
            order = np.take_along_axis(sims, idx, axis=1).argsort(axis=1)[:, ::-1]
            probed = np.take_along_axis(idx, order, axis=1).astype(np.int32)
            pdf[out_col] = pd.Series(list(probed))
            yield pdf

    return df.mapInPandas(assign, out_schema)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    iters: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the corpus is coarsely
    quantized into ``n_lists`` inverted lists; each query probes its
    ``nprobe`` nearest lists and computes exact cosine only there.

    Deterministic throughout: coarse centroids start from the
    ``n_lists`` corpus vectors with smallest ``xxhash64(id, seed)``
    (an order-free pseudo-random sample) and are refined with
    ``iters`` Lloyd steps where the per-list mean is a distributed
    aggregation (``sum(element_at(vec, i))`` per dimension — dim agg
    expressions, one shuffle of n_lists × dim scalars).

    Scale shape: assignment is one numpy matmul per Arrow batch over a
    broadcast (n_lists × dim) matrix — the corpus never shuffles; the
    search join moves only rows in probed lists (≈ nprobe/n_lists of
    the corpus per query batch). Returns (query_id, vec_id, sim, rank).
    """
    import numpy as np

    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    )
    seeds = (
        base.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)))
        .limit(n_lists)
        .select("vec")
        .collect()
    )
    centroids = [list(r["vec"]) for r in seeds]

    for _ in range(max(iters, 0)):
        assigned = _assign_lists(base, centroids, "vec", "_lists", nprobe=1)
        assigned = assigned.select(
            "vec", F.element_at("_lists", 1).alias("list_id")
        )
        sums = (
            assigned.groupBy("list_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("vec", i + 1).cast("double")).alias(
                        f"s{i}"
                    )
                    for i in range(dim)
                ],
            )
            .collect()
        )
        new_c = list(centroids)  # empty lists keep their old centroid
        for r in sums:
            new_c[r["list_id"]] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        centroids = new_c

    corpus = _assign_lists(base, centroids, "vec", "_lists", nprobe=1).select(
        "vec_id", "vec", F.element_at("_lists", 1).alias("list_id")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    probes = _assign_lists(q, centroids, "qvec", "_lists", nprobe=nprobe).select(
        "query_id", "qvec", F.explode("_lists").alias("list_id")
    )
    sim = (
        corpus.join(F.broadcast(probes), "list_id")
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

    # partition count sized to the corpus (known — it was collected for
    # the broadcast): each Arrow task has fixed worker overhead, so a
    # small corpus should not fan out to every core
    par = max(
        1,
        min(df.sparkSession.sparkContext.defaultParallelism, len(ids) // 2000),
    )
    pruned = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).repartition(par)
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
