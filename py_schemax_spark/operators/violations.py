"""Row-level violation production (SURVEY.md §2.2 V1/V8/V9).

One narrow projection evaluates EVERY row constraint at once
(array-of-whens + array_compact + explode), so constraint count does
not multiply scans — the plan stays a single whole-stage-codegen'd
pass over the (column-pruned) input regardless of how many constraints
the spec declares. This mirrors the reference's collect-all-errors
semantics (Pydantic ``e.errors()``, validator.py:106) instead of
first-error short-circuit.

Scale notes (100 TB):
- the scan projects only the columns any constraint touches (column
  pruning is preserved because we select key + the struct array before
  exploding);
- explode multiplies only VIOLATING rows, which are assumed rare; the
  common row contributes an empty array and is dropped for free;
- no shuffle at all — violations are emitted partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_schemax_spark.plans.compiler import (
    compile_row_constraints,
    violation_struct_array,
)
from py_schemax_spark.specs.model import TableSpec

#: fixed verdict contract — analogue of ValidationErrorSchema
#: (reference schema/validation.py:11-17)
VIOLATION_COLUMNS = ("key", "constraint_id", "observed", "expected")


def row_violations(
    df: DataFrame,
    spec: TableSpec,
    key_col: str | None = None,
    partition_expr=None,
    extra_constraints: list | None = None,
) -> DataFrame:
    """All row-expressible constraint violations as
    ``(<key>, constraint_id, observed, expected[, part])``.

    The key column keeps its real name (``url`` for pages, ``doc_id``
    for documents) so downstream joins/sinks stay natural.
    ``partition_expr`` (a Column) propagates the physical-partition
    value as a ``part`` column for per-partition verdicts.
    ``extra_constraints`` lets the runner FUSE additional row-local
    RowConstraints (extraction invariant, literal-dim referential)
    into this same single-scan projection.
    """
    key = key_col or spec.key_column
    constraints = compile_row_constraints(df, spec) + list(
        extra_constraints or []
    )
    arr = violation_struct_array(constraints)
    part = (
        [partition_expr.cast("string").alias("part")]
        if partition_expr is not None
        else []
    )
    exploded = (
        df.select(F.col(key).cast("string").alias(key), arr.alias("_v"), *part)
        .select(key, F.explode("_v").alias("v"), *(["part"] if part else []))
        .select(
            key,
            F.col("v.constraint_id").alias("constraint_id"),
            F.col("v.observed").alias("observed"),
            F.col("v.expected").alias("expected"),
            *(["part"] if part else []),
        )
    )
    return exploded
