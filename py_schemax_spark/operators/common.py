"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def check_passthrough_collisions(
    df: DataFrame, produced: list[str], api: str
) -> None:
    """``passthrough=True`` appends fixed output (and internal)
    column names to every input column; a clash would either shadow
    the user's column or fail later with an opaque
    AMBIGUOUS_REFERENCE. Reject it at the API boundary instead."""
    clash = sorted(set(produced) & set(df.columns))
    if clash:
        raise ValueError(
            f"{api}(passthrough=True): input column(s) {clash} collide "
            "with columns this operator produces — rename them first"
        )
