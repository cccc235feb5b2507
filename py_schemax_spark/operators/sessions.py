"""Sessionization: split each user's event stream into sessions at
inactivity gaps.

The standard event-analytics primitive (and the batch twin of
Structured Streaming's ``session_window``): consecutive events of the
same user belong to one session while the gap between them is ≤
``gap``; a larger gap starts a new session.

Scale shape: ONE exchange. The gap detection is a window over
``partitionBy(user)`` (lag + cumulative sum, computed in a single
window pass since both use the same frame ordering), and the
follow-up ``groupBy(user, session_idx)`` reuses the window's hash
partitioning — ``HashPartitioning(user)`` satisfies the clustered
distribution of ``(user, session_idx)``, so Catalyst inserts no
second shuffle (plan-asserted in tests).

Determinism: events order by ``(ts, event_id)`` within a user (ties
on ``ts`` broken by id), and gaps compare exact integer microseconds
(``unix_micros``), so a SQL engine reproduces session boundaries
bit-for-bit (``epoch_us`` in DuckDB). Events with a null timestamp
cannot be placed in any gap sequence and are excluded (documented;
count them upstream with a ``nullable`` constraint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
    value_col: str | None = None,
) -> DataFrame:
    """Per-user sessions: returns one row per session —
    ``(user_col, session_idx, session_start, session_end, n_events[,
    total_value])`` with ``session_idx`` counting from 1 in time
    order. ``value_col`` (optional) adds a per-session sum rounded to
    2 decimals."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # NTZ columns cast through TIMESTAMP in the (UTC) session zone —
    # gap DIFFERENCES are zone-invariant, so this stays deterministic
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(gap_seconds) * 1_000_000
    new_session = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    evts = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("_new", new_session)
        .withColumn("session_idx", F.sum("_new").over(run))
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return evts.groupBy(user_col, "session_idx").agg(*aggs)
