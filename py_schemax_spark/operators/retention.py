"""Cohort retention over the events table.

The third leg of the events trio (`sessionize`, `funnel_report`,
retention): bucket users by the DAY of their first event (the
cohort), then count how many are active again N days later. No
reference analogue; rounds out the events-table operator set
(SURVEY.md §2.4).

Scale shape: one user-granular aggregation for the cohort day
(map-side combine), one user-granular join back (the same exchange
key — AQE/bucketing co-locates it), then one bounded aggregation to
``(cohort_day, offset)`` whose output is ≤ days² rows. Day arithmetic
is pure integer ``datediff`` — engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """``(cohort_day, offset_days, n_users)`` — distinct users from
    each first-seen-day cohort active again ``offset_days`` later
    (offset 0 = the cohort's own size). Null-ts events are excluded;
    a null ``user_col`` is a valid (single) cohort member — real
    event streams carry anonymous traffic — and counts via the
    null-safe distinct below."""
    ev = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("user"),
        F.to_date(F.col(ts_col)).alias("day"),
    )
    first = ev.groupBy("user").agg(F.min("day").alias("cohort_day"))
    # eqNullSafe: a plain equi-join would silently drop the anonymous
    # (null-user) cohort the groupBy just built
    joined = ev.join(
        first.withColumnRenamed("user", "_fuser"),
        F.col("user").eqNullSafe(F.col("_fuser")),
    ).select(
        "user",
        "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day"))
        .cast("long").alias("offset_days"),
    )
    if max_offset_days is not None:
        joined = joined.filter(F.col("offset_days") <= max_offset_days)
    return (
        joined.groupBy("cohort_day", "offset_days")
        # count_distinct skips nulls; the null user is one real member
        .agg(
            (
                F.count_distinct(F.col("user"))
                + F.max((F.col("user").isNull()).cast("long"))
            ).cast("long").alias("n_users")
        )
    )
