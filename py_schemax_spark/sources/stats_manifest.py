"""Mergeable per-snapshot column-stats manifests.

The incremental half of the stats story: a daily crawl ingest should
not rescan history to refresh corpus-level statistics. Each run emits
a small MANIFEST of per-column mergeable aggregates — counts and
null counts (additive), typed min/max (extremal), and an HLL sketch
for distinct cardinality (`hll_sketch_agg`, the same datasketches
family the salted stats path merges with) — and any set of manifests
folds into exact combined counts/extrema plus a sketch-union distinct
estimate WITHOUT touching the underlying data again.

Determinism note (pytested): HLL register merges are max-based, so
the union of two halves' sketches produces the IDENTICAL estimate a
single pass over the whole table produces — incremental and batch
agree exactly, not just approximately.

Scale shape: the manifest build is ONE aggregation over the snapshot
(map-side partials, shuffle bytes ∝ #columns); a manifest is
O(#columns) rows of scalars + KB-sized sketches, so merging a year of
dailies is driver-trivial while staying a DataFrame op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType,
    T.DecimalType, T.ByteType,
)
# Integral extrema travel as bigint (`min_int`/`max_int`): a double
# loses exactness above 2^53 (snowflake-style 64-bit ids), breaking
# the "extrema exact" merge contract (ADVICE r04). The double pair is
# reserved for fractional types. Scale-0 decimals up to precision 18
# (NUMBER(18,0)-style ids — int64 holds 18 full digits) route to the
# bigint pair too; wider scale-0 decimals exceed int64 and stay on
# the double path with the loss documented here.
_INTEGRAL = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)


def _is_integral(dt: T.DataType) -> bool:
    if isinstance(dt, _INTEGRAL):
        return True
    return (
        isinstance(dt, T.DecimalType)
        and dt.scale == 0
        and dt.precision <= 18
    )


def stats_manifest(
    df: DataFrame,
    columns: list[str] | None = None,
    snapshot_id: str = "",
) -> DataFrame:
    """One manifest row per column: ``(snapshot_id, column, dtype,
    cnt, nulls, min_int, max_int, min_num, max_num, min_str, max_str,
    hll)``.

    Integral columns fill ``min_int``/``max_int`` (bigint — exact at
    any int64 magnitude); fractional columns fill ``min_num``/
    ``max_num`` (double); string/date/timestamp columns fill the
    string pair (dates render ISO, so lexicographic ==
    chronological). Binary columns track counts and distinct only.
    """
    cols = columns if columns is not None else list(df.columns)
    aggs = []
    metas = []
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_c{i}"))
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_n{i}")
        )
        is_int = _is_integral(dt)
        is_num = isinstance(dt, _NUMERIC) and not is_int
        is_bin = isinstance(dt, T.BinaryType)
        if is_int:
            aggs.append(F.min(col).cast("long").alias(f"_mn{i}"))
            aggs.append(F.max(col).cast("long").alias(f"_mx{i}"))
        elif is_num:
            aggs.append(F.min(col).cast("double").alias(f"_mn{i}"))
            aggs.append(F.max(col).cast("double").alias(f"_mx{i}"))
        elif not is_bin:
            aggs.append(F.min(col).cast("string").alias(f"_mn{i}"))
            aggs.append(F.max(col).cast("string").alias(f"_mx{i}"))
        # hll_sketch_agg accepts int/bigint/string/binary only —
        # fractional/temporal columns sketch their canonical string
        # rendering (stable across snapshots: same engine, same cast)
        if isinstance(
            dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                 T.StringType, T.BinaryType)
        ):
            sketch_in = col
        else:
            sketch_in = col.cast("string")
        aggs.append(F.hll_sketch_agg(sketch_in).alias(f"_h{i}"))
        metas.append((i, c, dt.simpleString(), is_int, is_num, is_bin))
    row = df.agg(*aggs)
    structs = []
    for i, name, dtype, is_int, is_num, is_bin in metas:
        structs.append(
            F.struct(
                F.lit(snapshot_id).alias("snapshot_id"),
                F.lit(name).alias("column"),
                F.lit(dtype).alias("dtype"),
                F.col(f"_c{i}").cast("long").alias("cnt"),
                F.coalesce(F.col(f"_n{i}"), F.lit(0)).cast("long")
                .alias("nulls"),
                (
                    F.col(f"_mn{i}").cast("long") if is_int
                    else F.lit(None).cast("long")
                ).alias("min_int"),
                (
                    F.col(f"_mx{i}").cast("long") if is_int
                    else F.lit(None).cast("long")
                ).alias("max_int"),
                (
                    F.col(f"_mn{i}").cast("double") if is_num
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"_mx{i}").cast("double") if is_num
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.lit(None).cast("string")
                    if (is_int or is_num or is_bin)
                    else F.col(f"_mn{i}").cast("string")
                ).alias("min_str"),
                (
                    F.lit(None).cast("string")
                    if (is_int or is_num or is_bin)
                    else F.col(f"_mx{i}").cast("string")
                ).alias("max_str"),
                F.col(f"_h{i}").alias("hll"),
            )
        )
    return row.select(
        F.explode(F.array(*structs)).alias("_s")
    ).select("_s.*")


def merge_stats_manifests(manifests: DataFrame) -> DataFrame:
    """Fold any union of manifest rows into combined per-column stats:
    ``(column, dtype, cnt, nulls, min_int, max_int, min_num, max_num,
    min_str, max_str, approx_distinct)``. Counts are EXACT sums,
    extrema exact min/max (integral extrema stay bigint end-to-end, so
    64-bit ids above 2^53 merge exactly); distinct is the HLL union
    estimate (identical to a single-pass estimate over the
    concatenated data — see module docstring)."""
    return (
        manifests.groupBy("column", "dtype")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("nulls").cast("long").alias("nulls"),
            F.min("min_int").alias("min_int"),
            F.max("max_int").alias("max_int"),
            F.min("min_num").alias("min_num"),
            F.max("max_num").alias("max_num"),
            F.min("min_str").alias("min_str"),
            F.max("max_str").alias("max_str"),
            F.hll_sketch_estimate(F.hll_union_agg("hll"))
            .cast("long").alias("approx_distinct"),
        )
    )
