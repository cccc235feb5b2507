"""Per-column statistics in one aggregation pass (SURVEY.md §2.2 V1).

Data-level analogue of the reference's schema-conformance rule
(``PydanticSchemaValidator``, validator.py:98-121): instead of walking
one document with Pydantic, ONE aggregation computes — for every column
the spec declares — null count, min/max, length stats, and distinct
cardinality, in a single scan.

Scale shape (the "one salted aggregation pass" of the north star):

- default path: ``df.agg(...)`` — Spark's hash aggregate already does
  partial (map-side) aggregation per partition, then merges the ~K
  partial rows in one final task. For a GLOBAL aggregate this is
  optimal: the shuffle carries bytes proportional to #columns, not
  #rows, at any data size.
- salted path (``salt > 1``): an explicit two-phase
  ``groupBy(pmod(hash(key), salt))`` partial → final merge. The final
  merge of distinct-counts uses HyperLogLog sketch union
  (``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
  Spark ≥ 3.5 datasketches functions) so cardinalities compose
  exactly like the single-pass HLL++. Use when the final single merge
  task would otherwise be a straggler (very wide specs), or to bound
  partial-state memory.

Output is long-format ``(column, metric, value: string)`` — uniform
across types so verdicts union cleanly (the analogue of the uniform
ValidationErrorSchema rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_schemax_spark.specs.model import TableSpec

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType,
            T.DecimalType)


def _metrics_for(df: DataFrame, spec: TableSpec, exact_distinct: bool
                 ) -> list[tuple[str, str, Column]]:
    """(column, metric, agg expression) triples for one-pass agg."""
    out: list[tuple[str, str, Column]] = []
    present = set(df.columns)
    for cs in spec.columns:
        if cs.name not in present:
            continue
        c = F.col(cs.name)
        out.append((cs.name, "count", F.count(c)))
        out.append(
            (cs.name, "null_count",
             F.sum(F.when(c.isNull(), 1).otherwise(0)))
        )
        dt = df.schema[cs.name].dataType
        if not isinstance(dt, T.BinaryType):
            out.append((cs.name, "min", F.min(c).cast("string")))
            out.append((cs.name, "max", F.max(c).cast("string")))
            distinct = (
                F.count_distinct(c) if exact_distinct
                else F.approx_count_distinct(c)
            )
            out.append((cs.name, "distinct", distinct))
        if isinstance(dt, (T.StringType, T.BinaryType)):
            out.append((cs.name, "min_length", F.min(F.length(c))))
            out.append((cs.name, "max_length", F.max(F.length(c))))
            out.append(
                (cs.name, "avg_length", F.round(F.avg(F.length(c)), 4))
            )
        if isinstance(dt, _NUMERIC):
            out.append((cs.name, "sum", F.round(F.sum(c), 4).cast("string")))
            out.append((cs.name, "avg", F.round(F.avg(c), 4).cast("string")))
    return out


def column_stats(
    df: DataFrame,
    spec: TableSpec,
    exact_distinct: bool = False,
    salt: int = 1,
) -> DataFrame:
    """Long-format per-column stats: ``(column, metric, value)``.

    ``exact_distinct=True`` swaps HLL++ for exact count_distinct (used
    by the DuckDB-oracle parity queries; HLL estimates are
    engine-specific). ``salt>1`` selects the explicit two-phase salted
    plan described in the module docstring.
    """
    triples = _metrics_for(df, spec, exact_distinct)
    if salt <= 1:
        aggs = [
            expr.cast("string").alias(f"{col} {metric}")
            for col, metric, expr in triples
        ]
        row = df.agg(*aggs)
    else:
        row = _salted_stats(df, spec, triples, salt)
    # unpivot the single row → long format
    stack_args: list[Column] = []
    for col, metric, _ in triples:
        stack_args.append(F.lit(col))
        stack_args.append(F.lit(metric))
        stack_args.append(F.col(f"`{col} {metric}`"))
    n = len(triples)
    return row.select(
        F.stack(F.lit(n), *stack_args).alias("column", "metric", "value")
    )


def _salted_stats(df, spec, triples, salt: int) -> DataFrame:
    """Two-phase: partial per salt bucket, then exact merge.

    count/null_count merge by sum; min/max by min/max; distinct by HLL
    sketch union; averages are recomposed from merged sums and counts.
    """
    key = spec.key_column
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(salt)).alias("_salt")

    partial: list[Column] = []
    final: list[Column] = []
    for col, metric, _ in triples:
        a = f"{col} {metric}"
        c = F.col(col)
        q = f"`{a}`"
        if metric in ("count", "null_count"):
            partial.append(
                (F.count(c) if metric == "count"
                 else F.sum(F.when(c.isNull(), 1).otherwise(0))).alias(a)
            )
            final.append(F.sum(q).cast("string").alias(a))
        elif metric in ("min", "min_length"):
            src = F.length(c) if metric.endswith("length") else c
            partial.append(F.min(src).alias(a))
            final.append(F.min(q).cast("string").alias(a))
        elif metric in ("max", "max_length"):
            src = F.length(c) if metric.endswith("length") else c
            partial.append(F.max(src).alias(a))
            final.append(F.max(q).cast("string").alias(a))
        elif metric == "distinct":
            # hll_sketch_agg accepts int/bigint/string/binary only —
            # normalize other types through a string cast (cardinality
            # is preserved; the estimate is approximate either way)
            partial.append(F.hll_sketch_agg(c.cast("string")).alias(a))
            final.append(
                F.hll_sketch_estimate(F.hll_union_agg(q)).cast("string").alias(a)
            )
        elif metric in ("avg", "avg_length", "sum"):
            src = F.length(c) if metric == "avg_length" else c
            partial.append(F.sum(src).alias(f"{a} s"))
            partial.append(F.count(src).alias(f"{a} n"))
            if metric == "sum":
                final.append(
                    F.round(F.sum(f"`{a} s`"), 4).cast("string").alias(a)
                )
            else:
                final.append(
                    F.round(
                        F.sum(f"`{a} s`") / F.sum(f"`{a} n`"), 4
                    ).cast("string").alias(a)
                )
    return df.groupBy(bucket).agg(*partial).agg(*final)
