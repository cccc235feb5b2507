"""Per-document keyword extraction (tf-idf family), fully distributed.

The corpus-curation complement of ``unigram_logprob_scores``: that
operator broadcasts a BOUNDED top-k vocabulary and scores in-row; this
one needs every term's document frequency (rare terms are exactly the
informative ones), so it cannot use a vocabulary cutoff. It therefore
runs the honest distributed shape — no driver collect, no broadcast,
no cutoff:

1. one ``(doc, term)``-granular aggregation builds per-doc term
   frequencies (map-side combine collapses within-doc repeats);
2. document frequencies are a second aggregation OVER THE TF TABLE
   (one row per (doc, term) — already deduplicated, so the df count
   is a plain ``count``, not a ``countDistinct``); the tf table is
   persisted because it feeds both this and the join;
3. the tf table joins df counts on ``term`` (AQE handles hot-term
   skew — the df side is one row per term);
4. per-doc top-k is a window over ``doc`` — the only doc-granular
   exchange.

Every exchange carries at most (doc, term)-pair granularity; nothing
is token-granular past step 1's map side.

Ranking contract (chosen integer-exact so a SQL engine reproduces the
selected rows byte-for-byte): keywords are ordered by *rarity-weighted
frequency* ``score_exact = tf * (total_docs // df)`` (BIGINT, integer
division) descending, then ``df`` ascending, then ``term`` ascending.
This is monotone in tf and in 1/df — the tf-idf ordering's shape —
with no float in the sort key, so rank boundaries cannot move by a
ULP between engines. The textbook ``tfidf = tf * ln(N/df)`` rides
along as an informational double (rounded to 4 decimals, like the
unigram score), never as a ranking criterion.

Tokens are the ``decontam`` normalization: lowercased, split on the
explicit ASCII whitespace class, empties dropped. Null-text and
token-less documents emit no rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from py_schemax_spark.operators.chunking import WS_CLASS


def tfidf_topk_terms(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` keywords per document. Returns
    ``(key_col, rank, term, tf, df, score_exact, tfidf)`` — ``rank``
    counts from 1 in the integer-exact ranking order (module
    docstring); ``tf`` is the term's in-doc count, ``df`` its
    document frequency, ``tfidf`` the rounded textbook score."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    toks = (
        df.select(F.col(key_col), F.col(text_col))
        .filter(F.col(text_col).isNotNull())
        # materialize the split before the HOF filter (SURVEY §7 rule)
        .withColumn("_raw", F.split(F.lower(F.col(text_col)), WS_CLASS))
        .select(
            F.col(key_col),
            F.explode(F.filter(F.col("_raw"), lambda t: t != "")).alias(
                "term"
            ),
        )
    )
    tf = (
        toks.groupBy(key_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # total_docs counts docs that contribute terms (the tf table's
    # distinct docs) — the N in idf. Computed INSIDE the plan as a
    # one-row aggregate over the persisted tf, broadcast-cross-joined
    # into the scoring projection: no separate driver-side
    # distinct().count() job (round-3 verdict nit — this used to be
    # an extra job over the tf table before the plan even ran).
    ndocs = tf.agg(
        F.countDistinct(F.col(key_col)).cast("bigint").alias("_total_docs")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col(key_col),
            "term",
            "tf",
            "df",
            # `div` is Spark's integral division — exact, unlike
            # casting a double quotient (which can sit a ULP below an
            # integer)
            (F.col("tf") * F.expr("_total_docs div df"))
            .cast("bigint")
            .alias("score_exact"),
            F.round(
                F.col("tf")
                * F.log(F.col("_total_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(key_col).orderBy(
        F.desc("score_exact"), F.asc("df"), F.asc("term")
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(key_col, "rank", "term", "tf", "df", "score_exact", "tfidf")
    )
    from py_schemax_spark.operators.dedup import _track_persisted

    return _track_persisted(out, [tf])
