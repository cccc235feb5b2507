"""Streaming validation (Structured Streaming).

No reference analogue (the reference is batch-only over files); this
is the continuous-ingest path the north-star table implies: pages
arrive as new files/partitions of the Iceberg/parquet table, and the
same compiled row constraints evaluate incrementally.

Design:
- the SAME ``compile_row_constraints`` plan as batch runs inside the
  stream (constraints compiled once, reused every micro-batch —
  identical verdict semantics batch vs stream);
- event-time windowed violation counts with a watermark bound state
  for late data (``warc_ts`` is event time);
- row-local constraint classes are stateless projections + windowed
  aggregation; the one genuinely stateful streaming semantic —
  first-seen-wins duplicate suppression — is a custom
  ``applyInPandasWithState`` operator with watermark-bounded state
  (``stateful_first_seen``). Unbounded cross-history checks
  (uniqueness over all time, drift) stay batch jobs over the table
  snapshot: the table IS the queryable history.

Test/drive with ``trigger(availableNow=True)`` + a memory sink;
production uses the same plan with a file/kafka source and a parquet
sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_schemax_spark.operators.violations import row_violations
from py_schemax_spark.specs.model import TableSpec


def stream_row_violations(
    stream_df: DataFrame, spec: TableSpec, key_col: str | None = None
) -> DataFrame:
    """Row-constraint violations on a streaming DataFrame — same
    compiled projection as the batch path (stateless, so it runs
    unchanged under Structured Streaming)."""
    return row_violations(stream_df, spec, key_col=key_col)


def stateful_first_seen(
    stream_df: DataFrame,
    key_col: str = "url",
    event_time_col: str = "warc_ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    emit each key's FIRST occurrence only — the streaming twin of
    uniqueness attribution (first occurrence wins, later duplicates
    suppressed), with state bounded by the event-time watermark.

    State per key = the first-seen event time (epoch micros). An
    event-time timeout expires state one watermark horizon after the
    first sighting, so the state store holds only keys inside the
    horizon — re-crawls beyond it are treated as fresh (by design: the
    TABLE is the queryable history; unbounded cross-history uniqueness
    is a batch job — see module docstring).

    Returns ``(key, first_ts)`` in update mode.
    """
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("first_ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("first_us", T.LongType())]
    )

    def fn(key, pdf_iter, state: GroupState):
        min_ts = None
        for pdf in pdf_iter:
            t = pdf[event_time_col].min()
            if min_ts is None or t < min_ts:
                min_ts = t
        if state.hasTimedOut:
            state.remove()
            return
        if not state.exists and min_ts is not None:
            first_us = int(pd.Timestamp(min_ts).value // 1000)
            state.update((first_us,))
            # expire one horizon past the watermark frontier
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(wm, first_us // 1000) + 1)
            yield pd.DataFrame(
                {"key": [key[0]], "first_ts": [pd.Timestamp(min_ts)]}
            )
        # seen already → suppress (no output)

    return (
        stream_df.withWatermark(event_time_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_violation_counts(
    stream_df: DataFrame,
    spec: TableSpec,
    event_time_col: str = "warc_ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str | None = None,
) -> DataFrame:
    """Per-(event-time window, constraint) violation counts with a
    watermark: late rows beyond ``watermark`` are dropped and state is
    bounded — the streaming analogue of the per-partition summary
    (verdict.partition_summary)."""
    key = key_col or spec.key_column
    v = row_violations(
        stream_df, spec, key_col=key,
        partition_expr=F.col(event_time_col),
    )
    # 'part' carries the event time through the violation projection;
    # the (single) watermark is declared on the re-derived timestamp
    return (
        v.withColumn("event_time", F.col("part").cast("timestamp"))
        .withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window_duration).alias("win"),
            F.col("constraint_id"),
        )
        .agg(F.count(F.lit(1)).alias("violation_count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "constraint_id",
            "violation_count",
        )
    )
