"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (it validates schema files); these extend
the engine's uniqueness class (SURVEY.md §2.2 V3) from key equality to
content equality/similarity, the standard web-corpus dedup ladder:

- exact:      normalize → md5 → hash-groupBy (one shuffle of
              (hash, key) pairs; map-side combine)
- minhash:    shingles → K minhashes → B bands → band-bucket join —
              candidate pairs only ever meet inside a bucket, so the
              shuffle is bounded by bucket sizes, not n²
- simhash:    64-bit weighted-bit fingerprint; near-dups differ in ≤ k
              bits; bucketed by 16-bit chunks (Charikar 2002 /
              Manku et al. 2007, public algorithms)
- ngram jaccard: exact similarity on candidate pairs (verification
              stage after LSH, or standalone at small scale)

All hashing is xxhash64/md5 JVM-side; per-row Python appears nowhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_text(c) -> F.Column:
    """Normalization shared by every dedup flavor: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_duplicates(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup: ``(text_md5, keeper, n_copies)`` for every
    duplicate group; keeper = min key (deterministic).

    Scale: groupBy on the 128-bit digest — uniform keys, no skew, one
    shuffle of pre-aggregated pairs.
    """
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.md5(_norm_text(F.col(text_col))).alias("text_md5"),
            F.col(key_col).alias("k"),
        )
        .groupBy("text_md5")
        .agg(
            F.min("k").alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def exact_dedup_keep_first(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id"
) -> DataFrame:
    """Return ``df`` minus later copies of duplicated content (min-key
    copy wins). One shuffle on the digest; survivors keep all columns."""
    w = Window.partitionBy(F.md5(_norm_text(F.col(text_col)))).orderBy(
        F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- MinHash + LSH ----------------------------------------------------------


def shingles(c, n: int = 5) -> F.Column:
    """Character n-gram shingle set of the normalized text (JVM-side:
    sequence + transform + substring; distinct via array_distinct)."""
    t = _norm_text(c)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(n))))


def minhash_signature(shingle_col, num_hashes: int = 64) -> F.Column:
    """K independent minhashes: min over shingles of xxhash64(shingle,
    seed_i). Array of K longs, all JVM expressions.

    ONE traversal of the shingle array: per shingle compute all K
    hashes, fold with an element-wise ``least`` into the running
    minimum vector. (The naive form — K separate
    ``array_min(transform(...))`` — inlines the shingle subexpression
    K times; higher-order functions are interpreted, so that K-fold
    recomputation was a ~100× slowdown at bench scale.)"""
    long_max = (1 << 63) - 1
    init = F.array_repeat(F.lit(long_max).cast("long"), num_hashes)

    def hashes_of(s):
        return F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)])

    return F.aggregate(
        shingle_col,
        init,
        lambda acc, s: F.zip_with(acc, hashes_of(s), lambda a, b: F.least(a, b)),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs via banding: docs agreeing on ALL
    rows of ≥1 band collide. Returns ``(key_a, key_b, n_bands)`` with
    key_a < key_b.

    Scale shape: the exploded (band_id, band_hash) stream shuffles once
    into buckets; the self-join happens per bucket (bounded by bucket
    population, not n²). A hot bucket (boilerplate pages) is the skew
    risk — AQE skew-join handles it, and callers can pre-filter
    boilerplate.
    """
    rows_per_band = num_hashes // bands
    # signatures are CPU-bound interpreted higher-order expressions —
    # spread them across all cores even when the source has few input
    # splits (a handful of parquet row-groups would otherwise serialize
    # the whole corpus onto 1-2 tasks)
    par = df.sparkSession.sparkContext.defaultParallelism
    banded = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(key_col).alias("k"), F.col(text_col).alias("_t"))
        .repartition(par)
        .select("k", minhash_signature(shingles(F.col("_t"), shingle_n), num_hashes).alias("sig"))
    )
    band_hash = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                ).alias("bucket"),
            ),
        )
    )
    buckets = banded.select("k", band_hash.alias("bh")).select(
        "k", F.col("bh.band").alias("band"), F.col("bh.bucket").alias("bucket")
    )
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .groupBy(
            F.col("l.k").alias("key_a"), F.col("r.k").alias("key_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    shingle_n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Verification stage: exact n-gram Jaccard on candidate pairs.
    ``candidates`` = (key_a, key_b); joins the shingle sets back (two
    co-partitioned joins) and computes |∩|/|∪| via array ops."""
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.select(F.col(key_col).alias("k"), F.col(text_col).alias("_t"))
        .repartition(par)
        .select("k", shingles(F.col("_t"), shingle_n).alias("sh"))
    )
    a = sh.select(F.col("k").alias("key_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("k").alias("key_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.join(a, "key_a")
        .join(b, "key_b")
        .select(
            "key_a",
            "key_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash -----------------------------------------------------------------


def simhash_bits(text_col, token_split: str = r"\s+") -> F.Column:
    """64-bit SimHash over whitespace tokens as an ``array<int>`` of 64
    bits (index 0 = least significant), entirely JVM array expressions.

    Per-bit majority vote of token hashes (Charikar 2002): ONE pass
    over the token array — the accumulator is the 64-long vote vector,
    each token contributes ±1 per bit via ``zip_with`` — instead of 64
    separate passes. Token weight = 1; term frequency folds in via
    repeated tokens.

    The fingerprint stays an array (not a packed long): chunk bucketing
    hashes slices of it and Hamming distance is an element-wise
    aggregate, so packing would only add sign-bit gymnastics.
    """
    tokens = F.split(_norm_text(text_col), token_split)
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    zero64 = F.array_repeat(F.lit(0).cast("long"), 64)

    def bits_of(h):
        # shift amounts must be int literals (shiftrightunsigned takes a
        # Python int), so unroll the 64 bit positions
        return F.array(
            *[
                F.when(
                    F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) != 0,
                    F.lit(1),
                )
                .otherwise(F.lit(-1))
                .cast("long")
                for i in range(64)
            ]
        )

    votes = F.aggregate(
        hashes, zero64, lambda acc, h: F.zip_with(acc, bits_of(h), lambda a, b: a + b)
    )
    return F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))


def simhash_hex(bits_col) -> F.Column:
    """Pack the 64-bit array into a 16-char hex string (display /
    stable output), 4 × 16-bit chunks, most-significant chunk first."""
    chunk_vals = [
        F.aggregate(
            # reverse within the chunk so the aggregate builds MSB-first
            F.reverse(F.slice(bits_col, 16 * i + 1, 16)),
            F.lit(0).cast("long"),
            lambda acc, b: acc * 2 + b,
        )
        for i in range(3, -1, -1)
    ]
    return F.concat(
        *[F.lpad(F.lower(F.hex(v)), 4, "0") for v in chunk_vals]
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on each of the four 16-bit
    chunks (pigeonhole: ≤3 differing bits → ≥1 identical chunk), join
    within buckets, verify Hamming distance exactly.

    Returns ``(key_a, key_b, hamming)``.
    """
    fp = df.filter(F.col(text_col).isNotNull()).select(
        F.col(key_col).alias("k"), simhash_bits(F.col(text_col)).alias("fp")
    )
    chunks = fp.select(
        "k",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.xxhash64(F.slice("fp", 16 * i + 1, 16)).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("k", "fp", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    l, r = chunks.alias("l"), chunks.alias("r")
    hamming = F.aggregate(
        F.zip_with(F.col("l.fp"), F.col("r.fp"), lambda a, b: F.abs(a - b)),
        F.lit(0),
        lambda acc, d: acc + d,
    )
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .select(
            F.col("l.k").alias("key_a"),
            F.col("r.k").alias("key_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
