"""Streaming sessionization via the built-in ``session_window``.

The batch engine sessionizes with a lag-window prefix sum
(``operators/sessions.py``); the streaming twin uses Structured
Streaming's native session window — gap-merged event-time windows
with watermark-bounded state — rather than a hand-rolled
``applyInPandasWithState`` session machine. Built-in state management
(RocksDB-capable state store, watermark eviction, merge-on-late-event
inside the horizon) beats a custom Python operator on every axis the
north star cares about, so the custom-state budget is spent where
Spark has no primitive (``stateful_first_seen``), not here.

Boundary-semantics note (pytested): the batch operator starts a new
session when the inter-event gap EXCEEDS ``gap_seconds`` (ties stay);
``session_window`` treats an event at exactly ``prev + gap`` as a new
session (its half-open window no longer overlaps). Real event-time
data has microsecond timestamps, so the exact-tie set is measure
zero; the batch/stream parity test plants data away from the tie.

Scale shape: state is per-(user, open-window) and bounded by the
watermark horizon; output is append-mode (a session emits once, when
the watermark passes its close) — the right contract for a downstream
sink. One hash exchange on the user key, exactly like the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Per-user gap sessions on a stream: one APPEND row per closed
    session — ``(user_col, session_start, session_end, n_events[,
    total_value])`` with the same column meanings as the batch
    ``sessionize`` (start/end are the first/last EVENT timestamps,
    not the padded window bounds). No global ``session_idx`` — an
    unbounded stream has no total order to index sessions in; join on
    ``(user, session_start)`` instead."""
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return (
        stream_df.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{int(gap_seconds)} seconds"),
        )
        .agg(*aggs)
        .drop("session_window")
    )
