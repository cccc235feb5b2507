"""Deterministic training-shard planning + sharded JSONL export.

The last step of every curation pipeline: write the surviving corpus
as a fixed set of budget-bounded shards (the file unit a training
loader streams) in a DETERMINISTIC global order, so two runs of the
same pipeline produce byte-identical shard membership regardless of
cluster size or partitioning. No reference analogue (the reference
validates schema metadata, `/root/reference/validator.py`); this
extends the LLM-pipeline operator set of SURVEY.md §2.4.

Design:

- Global order = ``(md5(key), key)`` — the engine-wide deterministic
  order contract (`operators/sampling.py`, `operators/mixing.py`):
  content-independent, uniformly shuffled, reproducible by any SQL
  engine.
- Shard assignment = ``exclusive_prefix_sum(size) // budget`` in that
  order. A document straddling a budget boundary belongs to the shard
  where it STARTS, so a shard may overflow by at most one document —
  the standard loader-friendly convention (shards are never split
  mid-document). Assignment is a pure function of the corpus content,
  proven partitioning-invariant in tests.
- The prefix sum reuses `mixing.grouped_exclusive_cumsum` with a
  single constant group — per-partition totals collected (bounded:
  one row per partition) and exclusive offsets broadcast back; NEVER
  a global single-partition window (SURVEY §7).
- `write_jsonl_shards` repartitions BY SHARD and writes
  ``partitionBy(shard)`` JSON-lines — exactly one data file per
  shard directory (asserted in tests), the small-file story at
  10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_shards(
    df: DataFrame,
    key_col: str = "doc_id",
    size_col: str = "n_units",
    max_units_per_shard: int = 1_000_000,
) -> DataFrame:
    """``(key, size, offset, shard_id)`` — deterministic shard plan.

    ``offset`` is the exclusive running total of ``size_col`` in
    ``(md5(key), key)`` order; ``shard_id = offset // budget``.
    Null sizes are treated as 0 (a document with nothing to emit
    still belongs to a shard so its membership is stable).
    """
    if max_units_per_shard <= 0:
        raise ValueError(
            f"max_units_per_shard must be positive, got "
            f"{max_units_per_shard}"
        )
    from py_schemax_spark.operators.mixing import grouped_exclusive_cumsum

    base = df.select(
        F.col(key_col),
        F.coalesce(F.col(size_col).cast("long"), F.lit(0)).alias("_sz"),
        F.md5(F.col(key_col).cast("string")).alias("_ord"),
        F.lit("_all").alias("_grp"),
    )
    with_cum, _totals, pinned = grouped_exclusive_cumsum(
        base, ["_ord"], key_col, group_col="_grp", value_col="_sz"
    )
    result = with_cum.select(
        F.col(key_col),
        F.col("_sz").alias(size_col),
        F.col("cum_before").cast("long").alias("offset"),
        # integral div — floor(a/b) through a double loses exactness
        # past 2^53 (the sequence_gaps lesson)
        F.expr(f"cum_before div {int(max_units_per_shard)}")
        .cast("long").alias("shard_id"),
    )
    from py_schemax_spark.operators.dedup import _track_persisted

    return _track_persisted(result, pinned)


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    mode: str = "error",
) -> None:
    """Write ``df`` as JSON-lines, one directory and ONE data file per
    shard: repartition by the shard column first so every shard's rows
    land in a single task before ``partitionBy`` splits directories —
    without it each of K tasks emits a sliver file into every shard
    directory (K×shards small files at cluster scale)."""
    (
        df.repartition(F.col(shard_col))
        .write.mode(mode)
        .partitionBy(shard_col)
        .json(path)
    )
