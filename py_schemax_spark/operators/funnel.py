"""Ordered-funnel analysis over the events table.

Sequential conversion ("view → click → purchase") is the standard
event-stream companion of `sessionize`: how many users perform the
funnel's steps IN ORDER, as a subsequence of their event history. No
reference analogue (the reference validates schema metadata); this
rounds out the events-table operator set (SURVEY.md §2.4).

Semantics — subsequence matching under a TOTAL deterministic order:

- a user's events are ordered by ``(ts, order_col)`` (the tiebreaker
  makes equal-timestamp histories engine-stable); events with null
  ``ts`` are excluded (an unordered event cannot participate in an
  ordered funnel);
- the user's stage = length of the longest PREFIX of ``steps``
  matched greedily left-to-right (greedy-first matching is optimal
  for subsequence existence, so "reached stage k" is
  order-of-evaluation-free);
- repeated step types re-use the next occurrence (steps may repeat:
  ``('view', 'view')`` means two views).

Scale shape: ONE user-granular shuffle (`collect_list` + in-row
``sort_array``/``aggregate`` HOFs — the `sessionize` cost model: a
user's history fits a task; a "user" with millions of events is a bot
to cap upstream with `cap_per_group`). `funnel_report` reduces the
stage table to ``len(steps)`` rows with one bounded aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """``(user, stage)`` — how far down ``steps`` each user got
    (0 = never performed the first step)."""
    if not steps:
        raise ValueError("funnel_stages: steps must be non-empty")
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("_ts"),
                F.col(order_col).alias("_ord"),
                F.col(type_col).alias("_type"),
            )
        )
    )
    stage = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, e: F.when(
            (acc < k)
            & (e["_type"] == F.element_at(steps_lit, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("user"))
        .agg(stage.cast("long").alias("stage"))
    )


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """``(stage, n_users)`` for stage 1..len(steps): users whose
    history reaches AT LEAST that stage — the funnel chart's bars."""
    stages = funnel_stages(
        events, steps, user_col, ts_col, order_col, type_col
    )
    k = len(steps)
    row = stages.agg(
        *[
            F.sum((F.col("stage") >= s).cast("long")).alias(f"_s{s}")
            for s in range(1, k + 1)
        ]
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("long").alias("stage"),
                        F.coalesce(F.col(f"_s{s}"), F.lit(0))
                        .cast("long").alias("n_users"),
                    )
                    for s in range(1, k + 1)
                ]
            )
        ).alias("_r")
    ).select("_r.stage", "_r.n_users")
