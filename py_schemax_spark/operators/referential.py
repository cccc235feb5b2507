"""Referential-integrity checks as broadcast anti-joins (SURVEY.md §2.2 V4).

Data-level re-expression of the reference's DependencyValidator
(``validator.py:226-316``): there, every path in ``depends_on`` /
``dependents`` must exist on disk (existence probe at 295-309). Here,
every value of a fact column must exist in a dimension table
(``lang`` → lang_dim, url-domain → domain_dim, ...).

Scale shape: the dimension is tiny (≤ thousands of rows), so we force
``F.broadcast`` — the anti-join is a map-side hash probe with ZERO
shuffle of the 100 TB fact side. Nulls are excluded (they are the
``nullable`` constraint's job), mirroring how the reference reports
missing-field and bad-type separately (validator.py:231-263) from
existence (295-309).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_schemax_spark.specs.model import TableSpec


def referential_violations(
    df: DataFrame,
    spec: TableSpec,
    dims: dict[str, DataFrame],
    key_col: str | None = None,
    partition_expr=None,
) -> DataFrame:
    """Violation rows for every column with a ``references`` constraint.

    ``dims`` maps dimension-table name → DataFrame. A referenced
    dimension missing from ``dims`` raises — that is a run-configuration
    error (the analogue of the reference's file_not_found on a
    depends_on path, validator.py:295-309, except fatal because the
    dimension is engine config, not user data).
    """
    key = key_col or spec.key_column
    pcol = (
        [partition_expr.cast("string").alias("part")]
        if partition_expr is not None
        else []
    )
    parts = []
    for cs in spec.columns:
        if cs.references is None or cs.name not in df.columns:
            continue
        ref = cs.references
        if ref.table not in dims:
            raise KeyError(
                f"column '{cs.name}' references unknown dimension "
                f"'{ref.table}' — available: {sorted(dims)}"
            )
        # no .distinct(): anti-join semantics are unaffected by duplicate
        # keys on the build side, and dropping it removes the only
        # exchange in the whole plan (the dim fits one broadcast block)
        dim = dims[ref.table].select(F.col(ref.column).alias("_dim_value"))
        cid = f"{cs.name}.references"
        parts.append(
            df.select(key, cs.name, *pcol)
            .filter(F.col(cs.name).isNotNull())
            .join(
                F.broadcast(dim),
                F.col(cs.name) == F.col("_dim_value"),
                "left_anti",
            )
            .select(
                F.col(key).cast("string").alias(key),
                F.lit(cid).alias("constraint_id"),
                F.col(cs.name).cast("string").alias("observed"),
                F.lit(f"{cs.name} in {ref.table}.{ref.column}").alias("expected"),
                *(["part"] if pcol else []),
            )
        )
    if not parts:
        extra = [F.lit("").alias("part")] if pcol else []
        return (
            df.select(F.col(key).cast("string").alias(key))
            .limit(0)
            .select(
                key,
                F.lit("").alias("constraint_id"),
                F.lit("").alias("observed"),
                F.lit("").alias("expected"),
                *extra,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
