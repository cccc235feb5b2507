"""Inverted-index construction — the retrieval side of the toolkit.

tf-idf keywords (`operators/keywords.py`) score documents; retrieval
needs the transpose: term → postings. This builder emits one row per
surviving term — ``(term, df, postings, truncated)`` — with the same
token contract as `keywords`/`decontam` (lowercase, explicit ASCII
whitespace split) so the index and the scorers agree on what a term
is.

Scale shape (two term-granular exchanges, both with bounded state):

1. **df pass** — distinct (term, doc) pairs → ``groupBy(term)``
   count. Map-side combine applies (count, not collect), so the
   shuffle carries (term, partial-count) pairs.
2. **df gates BEFORE postings** — terms outside ``[min_df,
   max_df]`` (stopwords at web scale have df ≈ corpus size) never
   reach the collect stage: the surviving-term set left-semi-joins
   the pair stream FIRST. Collecting a stopword's postings list at
   10^12 docs would materialize a corpus-sized array in one task —
   the gate makes that structurally impossible, the same
   hot-population principle as the LSH bucket caps.
3. **postings pass** — ``sort_array(collect_list(...))`` per
   surviving term, CAPPED at ``max_postings`` (deterministic: sorted
   ascending, lowest keys kept, ``truncated`` flags the cut — a
   silently complete-looking index is a retrieval hole).

No reference analogue (the reference has no data plane); pairs with
`keywords` (scoring) and `sources/bucketed.py` (persist the index
bucketed by term for shuffle-free query joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_schemax_spark.operators.chunking import WS_CLASS


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
    max_postings: int = 10_000,
) -> DataFrame:
    """``(term, df, postings, truncated)`` for every term whose
    document frequency lies in ``[min_df, max_df]``. ``postings`` is
    the ascending-sorted document-key array, capped at
    ``max_postings`` (``truncated`` true when cut); ``df`` is always
    the TRUE document frequency, so idf stays exact even for
    truncated terms.

    The per-term collect state is bounded by ``max_df`` (the gate
    runs before the collect) — at web scale ALWAYS set ``max_df``:
    with it unset, one stopword's postings collect is corpus-sized
    regardless of the output cap."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    pairs = (
        df.filter(F.col(text_col).isNotNull())
        # materialize the split before the HOF filter (SURVEY §7 rule)
        .withColumn("_raw", F.split(F.lower(F.col(text_col)), WS_CLASS))
        .select(
            F.col(key_col).alias("_doc"),
            F.explode(
                F.array_distinct(
                    F.filter(F.col("_raw"), lambda t: t != "")
                )
            ).alias("term"),
        )
    )
    dfreq = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    surviving = dfreq.filter(F.col("df") >= min_df)
    if max_df is not None:
        surviving = surviving.filter(F.col("df") <= max_df)

    capped = (
        pairs.join(surviving, "term")
        .groupBy("term", "df")
        .agg(
            F.slice(
                F.sort_array(F.collect_list("_doc")), 1, max_postings
            ).alias("postings")
        )
    )
    return capped.select(
        "term",
        F.col("df").cast("bigint").alias("df"),
        "postings",
        (F.col("df") > F.size("postings")).alias("truncated"),
    )
