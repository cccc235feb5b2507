"""Exact substring-window deduplication report.

Detects token spans that occur verbatim in more than one document —
the exact-substring dedup signal of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better"), whose suffix-array
formulation is replaced here by the shape a shared-nothing engine can
execute: fixed-length token WINDOWS (stride 1) hashed in-row, with
corpus-wide document frequency per window hash. A window present in
≥ 2 distinct documents marks its span as duplicated text. No
reference analogue (the reference validates schema metadata, not
corpora); part of the LLM-training-pipeline operator set.

Scale shape at 10^12 docs:

- Window hashes are computed INSIDE the row by the same Arrow UDF the
  decontamination operator uses (`decontam.token_ngram_md5_udf`) — no
  token explode before hashing, one Arrow crossing per batch.
- Within-doc duplicate windows are collapsed in-row
  (``array_distinct``) BEFORE the explode, so the (doc, hash) stream
  carries each (doc, window) pair once and the document-frequency
  aggregation's map-side combine sees pre-deduplicated input.
- The corpus-wide document frequency is ONE hash-granular shuffle
  with map-side combine; the join back from hot hashes to documents
  is a plain shuffle equi-join on the hash (the hot set is
  corpus-scale — a broadcast would be the `dedup_clusters` round-3
  mistake), skew on ultra-hot boilerplate hashes absorbed by AQE's
  skew-join splitting; the final per-doc rollup is doc-granular.
  That is 3 bounded exchanges — the minimum for corpus-wide exact
  window frequency (the quadratic all-pairs alternative is
  impossible, and the suffix-array alternative is not shardable
  without a global sort of the whole corpus text).

The hash is md5 of the space-joined lowercased whitespace tokens —
the decontamination contract — so a SQL engine rebuilds the identical
window universe (`__spark_entry__.oracle_sql['substring_dedup']`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark import StorageLevel

from py_schemax_spark.operators.decontam import token_ngram_md5_udf
from py_schemax_spark.operators.dedup import _track_persisted


def substring_dedup_report(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 12,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-window report.

    Returns one row per input row:
    ``(key, n_windows, n_distinct, n_dup, dup_bp)`` — total token
    windows of length ``n`` (stride 1), distinct windows, distinct
    windows whose hash occurs in ≥ ``min_docs`` distinct documents,
    and ``floor(10000 * n_dup / n_distinct)`` (0 when the document has
    no windows). Integer-exact by construction. Documents shorter
    than ``n`` tokens have no windows and are never flagged — use a
    document-level dedup (``exact_dedup``/MinHash) for those.
    """
    udf = token_ngram_md5_udf(n)
    # one UDF evaluation per row: both sizes derive from the same
    # array, and the hashed table is persisted because the plan reads
    # it twice (document-frequency side + per-doc join-back) — without
    # the persist the Arrow hashing pass would run over the corpus
    # twice (the shared-stage pattern of `dedup.py`'s shingle tables)
    docs = (
        df.select(F.col(key_col), udf(F.col(text_col)).alias("_all"))
        .select(
            key_col,
            F.size("_all").alias("n_windows"),
            F.array_distinct("_all").alias("_hs"),
        )
        .select(
            key_col,
            "n_windows",
            F.size("_hs").alias("n_distinct"),
            F.col("_hs"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ex = docs.select(key_col, F.explode("_hs").alias("h"))
    # document frequency per window hash: after the in-row distinct,
    # count(*) IS the distinct-doc count — no count_distinct shuffle
    hot = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("h")
    )
    per_doc = (
        ex.join(hot, "h")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    out = (
        docs.drop("_hs")
        .join(per_doc, key_col, "left")
        .select(
            key_col,
            "n_windows",
            "n_distinct",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.when(
                F.col("n_distinct") > 0,
                F.floor(
                    F.coalesce("n_dup", F.lit(0)) * 10000
                    / F.col("n_distinct")
                ),
            )
            .otherwise(0)
            .cast("long")
            .alias("dup_bp"),
        )
    )
    return _track_persisted(out, [docs])
