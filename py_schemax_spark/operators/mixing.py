"""Corpus mixing: deterministic sampling to per-group token budgets.

Training mixtures are specified as token counts per source/language
("300B tokens web, 30B code, …" — GPT-3 table 2.2, LLaMA table 1, The
Pile §1). Turning a raw corpus into that mixture means: for each
group, keep a uniform-at-random subset totalling ≈ the group's token
budget — reproducibly, so reruns and resumes pick the identical
subset. No reference analogue (the reference has no data plane); part
of the north star's training-pipeline toolkit.

Contract (chosen so a SQL window reproduces it exactly):

- documents in a group are ordered by ``(md5(key), key)`` — a
  deterministic shuffle that is stable across engines, runs,
  partition counts, and row order (``rand(seed)`` is none of those);
- ``cum_before`` is the group's exclusive running token sum in that
  order; a document is **kept** iff ``cum_before < budget(group)`` —
  every nonempty group with a positive budget keeps ≥1 document, and
  the kept total overshoots the budget by at most one document;
- groups without a configured budget get ``default_budget`` (0 =
  dropped); a null group value is one ordinary group under
  ``default_budget``; null text counts 0 tokens but still occupies a
  slot (kept rows with 0 tokens don't consume budget).

Scale shape: a per-group prefix sum, computed the scalable way — NOT
``Window.partitionBy(group)`` (a handful of language-sized partitions
would put the whole English web on one task). Same two-level scheme
as ``pack_chunks``: (1) a range exchange on ``(group, md5, key)``
makes partitions order-contiguous; (2) a partition-local window sums
within ``(partition, group)``; (3) per-(partition, group) totals —
one tiny row each — collect to the driver, fold into exclusive
per-group offsets, broadcast back. Boundary-invariant, so the single
SQL window is the exact oracle. Token counts are codegen'd
``regexp_count`` — the token array is never built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_schemax_spark.operators.chunking import NON_WS_RUN


def sample_to_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    text_col: str = "text",
    key_col: str = "doc_id",
    default_budget: int = 0,
    passthrough: bool = False,
) -> DataFrame:
    """Per-document mixture verdict: ``(key_col, group_col, n_tokens,
    cum_before, kept)`` for every input row (callers filter on
    ``kept``). ``passthrough=True`` carries every input column through
    the range exchange instead (heavier shuffle payload, one pass)."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"negative budget for group {g!r}: {b}")
    if default_budget < 0:
        raise ValueError(f"negative default_budget: {default_budget}")

    n_tokens = F.coalesce(
        F.regexp_count(F.col(text_col), F.lit(NON_WS_RUN)), F.lit(0)
    )
    base_cols = list(df.columns) if passthrough else [key_col]
    base = df.select(
        *[F.col(x) for x in base_cols],
        # group values travel as strings (budgets keys are strings and
        # the broadcast offset table needs one concrete type)
        F.col(group_col).cast("string").alias("_grp"),
        F.md5(F.col(key_col).cast("string")).alias("_h"),
        n_tokens.alias("n_tokens"),
    )
    # (1) order-contiguous partitions per group; (_grp, _h, key) is a
    # total order (key unique per the engine's key contract). persist
    # pins _pid to ONE materialized partitioning for both branches.
    ranged = base.repartitionByRange(
        F.col("_grp"), F.col("_h"), F.col(key_col)
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    # (2) partition-local exclusive running sum within the group
    wlocal = (
        Window.partitionBy("_pid", "_grp")
        .orderBy(F.col("_h"), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_local", F.coalesce(F.sum("n_tokens").over(wlocal), F.lit(0))
    )
    # (3) per-(partition, group) totals -> exclusive group offsets
    # (driver sees partitions x groups rows — bounded, never the data)
    totals = (
        ranged.groupBy("_pid", "_grp")
        .agg(F.sum("n_tokens").alias("_tot"))
        .collect()
    )
    running: dict[object, int] = {}
    offsets = []
    for r in sorted(
        totals, key=lambda r: (r["_grp"] is not None, r["_grp"], r["_pid"])
    ):
        g = r["_grp"]
        offsets.append((r["_pid"], g, running.get(g, 0)))
        running[g] = running.get(g, 0) + (r["_tot"] or 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets, "_opid int, _ogrp string, _off bigint"
    )
    budget = F.lit(default_budget)
    for g, b in budgets.items():
        budget = F.when(F.col("_grp") == g, F.lit(int(b))).otherwise(budget)
    cum = F.col("_local") + F.col("_off")
    out = (
        local.join(
            F.broadcast(off_df),
            (F.col("_pid") == F.col("_opid"))
            & F.col("_grp").eqNullSafe(F.col("_ogrp")),
        )
        .select(
            *(
                [F.col(x) for x in base_cols]
                if passthrough
                # non-passthrough keeps the (stringified) group value
                # as its own output column
                else [F.col(key_col), F.col("_grp").alias(group_col)]
            ),
            F.col("n_tokens"),
            cum.alias("cum_before"),
            (cum < budget).alias("kept"),
        )
    )
    from py_schemax_spark.operators.dedup import _track_persisted

    return _track_persisted(out, [ranged])
