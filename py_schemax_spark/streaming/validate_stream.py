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
- only stateless projections + windowed aggregation — no
  ``applyInPandasWithState`` needed for the constraint classes that
  are row-local. Set-wise checks (uniqueness/drift) stay batch jobs
  over the table snapshot: uniqueness over an unbounded stream is
  unbounded state by definition, and the table IS the queryable
  history.

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
