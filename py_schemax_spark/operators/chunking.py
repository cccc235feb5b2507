"""Token-window document chunking (training-sample preparation).

LLM training pipelines cut documents into fixed token windows with
overlap before tokenization/packing (the "sliding window" split every
data loader applies to documents longer than the context length). No
reference analogue (the reference has no data plane); part of the
north star's training-pipeline toolkit.

Contract (chosen so a SQL engine reproduces it byte-for-byte):

- *tokens* are the non-empty substrings of the text split on the
  explicit ASCII whitespace class ``[ \\t\\n\\r\\f]+`` — the engine's
  cross-engine token contract (``\\s`` differs between Java regex,
  Python, and RE2 on ``\\x0B`` and Unicode spaces; see textstats);
- ``stride = chunk_tokens - overlap_tokens`` (``0 <= overlap < chunk``
  enforced);
- a document with ``n > 0`` tokens emits
  ``1 + ceil(max(n - chunk_tokens, 0) / stride)`` chunks; chunk ``i``
  covers tokens ``[i*stride, min(i*stride + chunk_tokens, n))`` — full
  coverage, the final chunk may be short;
- ``chunk_text`` is the chunk's tokens joined with a single space
  (whitespace-normalizing, like every whitespace tokenization);
- null-text and zero-token documents emit no chunks.

Scale shape: a pure projection + generator — ZERO shuffles. The token
array is materialized as a column attribute before any higher-order
function touches it (SURVEY §7: a lambda over a computed ``split()``
child re-evaluates the child per element — quadratic in tokens/doc),
so per-doc work is linear and the whole plan fuses into the scan.
Output size is bounded by ``n / stride`` chunks per doc; with
``overlap < chunk/2`` the blow-up factor is < 2x the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the cross-engine token delimiter (see module docstring) and its
# complement (a maximal non-delimiter run = one token)
WS_CLASS = r"[ \t\n\r\f]+"
NON_WS_RUN = r"[^ \t\n\r\f]+"


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
) -> DataFrame:
    """Split every document into fixed token windows with overlap.

    Returns ``(key_col, chunk_id, n_tokens, chunk_text)`` — one row
    per chunk, ``chunk_id`` counting from 0 within each document,
    ``n_tokens`` the chunk's own token count (short only for the last
    chunk). See the module docstring for the exact contract.
    """
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            "require 0 <= overlap_tokens < chunk_tokens, got "
            f"overlap={overlap_tokens} chunk={chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens

    n = F.size("_toks")
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    toks = (
        df.select(F.col(key_col), F.col(text_col))
        .filter(F.col(text_col).isNotNull())
        # materialize the split BEFORE the HOF filter (SURVEY §7 rule)
        .withColumn("_raw", F.split(F.col(text_col), WS_CLASS))
        .withColumn("_toks", F.filter(F.col("_raw"), lambda t: t != ""))
        .filter(n > 0)
        .select(F.col(key_col), "_toks", n_chunks.alias("_nc"), n.alias("_n"))
    )
    start = F.col("chunk_id") * F.lit(stride)
    return (
        toks.select(
            F.col(key_col),
            "_toks",
            "_n",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            F.col(key_col),
            F.col("chunk_id"),
            F.least(F.lit(chunk_tokens), F.col("_n") - start).alias(
                "n_tokens"
            ),
            F.array_join(
                F.slice(F.col("_toks"), start + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )


def pack_chunks(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    budget_tokens: int = 256,
    order_col: str | None = None,
) -> DataFrame:
    """Concat-then-chunk sequence packing plan: assign every document
    a bin so that documents are packed back-to-back in ``order_col``
    order (default: ``key_col``) into fixed ``budget_tokens`` windows
    — the standard "concatenate the corpus, then cut context-length
    windows" packing used by LLM data loaders, expressed as offsets
    instead of materialized concatenation.

    Returns ``(key_col, n_tokens, start_token, bin_id, bin_offset)``:
    ``start_token`` is the document's offset in the global token
    stream (an exclusive running sum over the order), ``bin_id =
    start_token // budget_tokens`` is the window its FIRST token lands
    in, ``bin_offset`` the position within that window. A document
    whose tokens straddle a boundary continues into the next window —
    exactly the concat-then-chunk semantics (no padding, no document
    re-ordering).

    Scale shape: a global prefix sum, computed the scalable way — NOT
    one global window (a single-partition sort of the whole corpus).
    Three steps: (1) a range exchange on the order key spreads the
    corpus into order-contiguous partitions; (2) a partition-local
    window computes local running sums (each partition sorts only its
    own slice); (3) per-partition token totals — one tiny row per
    partition — collect to the driver, turn into exclusive prefix
    offsets, and broadcast-join back. The result is boundary-invariant
    (the prefix sum does not depend on where range partitioning cut
    the corpus), so sampling-based range bounds cannot change the
    answer. Token counts are codegen'd ``regexp_count`` arithmetic —
    the token array is never built.
    """
    order = order_col or key_col
    # token count = number of maximal non-delimiter runs — exactly the
    # chunker's split+filter tokens, as one codegen'd regexp count
    # (null text → 0 via regexp_count's null propagation + coalesce)
    n_tokens = F.coalesce(
        F.regexp_count(F.col(text_col), F.lit(NON_WS_RUN)), F.lit(0)
    )
    base = df.select(
        F.col(key_col),
        # one constant group: the global prefix sum is the degenerate
        # single-group case of the shared per-group machinery
        F.lit("").alias("_grp"),
        F.col(order).alias("_ord"),
        n_tokens.alias("n_tokens"),
    )
    # lazy import: mixing imports this module's token contract
    from py_schemax_spark.operators.mixing import grouped_exclusive_cumsum

    budget = int(budget_tokens)
    if budget <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    with_cum, _totals, pinned = grouped_exclusive_cumsum(
        base, order_cols=["_ord"], key_col=key_col
    )
    out = (
        with_cum.select(
            F.col(key_col),
            "n_tokens",
            F.col("cum_before").alias("start_token"),
        )
        .select(
            F.col(key_col),
            "n_tokens",
            "start_token",
            # `div`, not a cast double quotient: start_token is a
            # global token offset that exceeds 2^53 at corpus scale,
            # where long->double loses exactness and bin_id would
            # disagree with the exact integer % below (and with the
            # SQL oracle's `//`)
            F.expr(f"start_token div {budget}").alias("bin_id"),
            F.expr(f"start_token % {budget}").alias("bin_offset"),
        )
    )
    from py_schemax_spark.operators.dedup import _track_persisted

    return _track_persisted(out, pinned)
