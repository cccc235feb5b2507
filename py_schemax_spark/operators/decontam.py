"""Benchmark decontamination: flag training documents that share token
n-grams with an evaluation/benchmark set.

A training corpus that contains benchmark text inflates downstream
eval scores; the standard guard (e.g. GPT-3 appendix C, PaLM §7) is
exact n-gram overlap — a document is contaminated if any of its token
n-grams (n≈8-13) also occurs in the benchmark. No reference analogue
(the reference validates schema files, not corpora); this is part of
the LLM-training-pipeline operator set the north star adds on top of
the reference's constraint vocabulary.

Scale shape (the part that must survive 10^12 docs):

- Each side's n-gram hashes are computed INSIDE the row by an
  Arrow-batched UDF (``token_ngram_md5_udf``) — no token explode, no
  per-doc window, so the corpus never shuffles at token granularity.
  The JVM alternative (posexplode + ``lead(tok, k)`` over a per-doc
  window) is codegen'd but costs a token-scale shuffle + sort; the
  HOF alternative (``transform`` slicing a computed array) is
  interpreted and re-evaluates the child per element (SURVEY §7).
- The benchmark side is aggregated to DISTINCT hashes (benchmarks are
  MB-scale against a 100-TB corpus) and broadcast — the only join is
  a broadcast hash join against the exploded doc hashes.
- The one exchange is the final ``groupBy(doc key)``; exploded hash
  rows of one doc stay inside their input partition, so the partial
  aggregation collapses them map-side before the shuffle.

The hash is ``md5`` of the space-joined, lowercased whitespace tokens
— chosen (over xxhash) so a SQL engine reproduces it verbatim:
``md5(array_to_string(list_slice(toks, i, i+n-1), ' '))`` in DuckDB is
the exact oracle twin (see ``__spark_entry__.oracle_sql['decontam']``).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

# Explicit whitespace class = RE2's \s EXACTLY ([\t\n\f\r ]): Python
# Unicode \s would also split on U+00A0/U+2028, and even re.ASCII \s
# (like Java \s) additionally includes \x0B where RE2 does not — the
# oracle's token universe is the canonical one, so spell it out.
_WS = re.compile(r"[ \t\n\r\f]+")


def _ngram_hashes(text: str | None, n: int) -> list[str]:
    """All token n-gram md5 hex digests of ``text`` (empty list for
    null/short text). Tokens: lowercased, whitespace-split, empties
    dropped — the normalization a SQL twin can reproduce exactly."""
    if text is None:
        return []
    toks = [w for w in _WS.split(text.lower()) if w]
    return [
        hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
        for i in range(len(toks) - n + 1)
    ]


def token_ngram_md5_udf(n: int = 8):
    """Arrow UDF factory: text → ``array<string>`` of token n-gram md5
    hashes. Per-row Python is unavoidable here (variable-length string
    hashing has no numpy kernel), but the work is O(tokens) per row
    with no shuffle — the batch crosses to Python once via Arrow."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def hashes(texts: pd.Series) -> pd.Series:
        return pd.Series([_ngram_hashes(t, n) for t in texts])

    return hashes


def benchmark_ngram_hashes(
    benchmark: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """DISTINCT n-gram hashes of the benchmark set — the small side of
    the decontamination join (one column ``h``)."""
    udf = token_ngram_md5_udf(n)
    return (
        benchmark.select(F.explode(udf(F.col(text_col))).alias("h"))
        .distinct()
    )


def contamination_report(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Per-document contamination vs ``benchmark``: returns
    ``(key_col, n_total, n_overlap, contaminated)`` for EVERY input
    row — ``n_total`` the document's token n-gram count, ``n_overlap``
    how many of those occur anywhere in the benchmark, ``contaminated``
    = any overlap. Filter ``contaminated`` to drop, or threshold
    ``n_overlap / n_total`` for a softer policy.

    Documents shorter than ``n`` tokens have no n-grams: n_total = 0,
    never contaminated (standard n-gram decontamination semantics).
    """
    udf = token_ngram_md5_udf(n)
    bench = F.broadcast(
        benchmark_ngram_hashes(
            benchmark, text_col=bench_text_col or text_col, n=n
        ).withColumn("_hit", F.lit(1))
    )
    docs = df.select(
        F.col(key_col), udf(F.col(text_col)).alias("_hashes")
    )
    ex = docs.select(
        key_col, F.explode_outer("_hashes").alias("h")
    )
    return (
        ex.join(bench, "h", "left")
        .groupBy(key_col)
        .agg(
            # count("h") skips the explode_outer null of an
            # n-gram-less doc, so it lands at n_total = 0
            F.count("h").alias("n_total"),
            F.count("_hit").alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )
