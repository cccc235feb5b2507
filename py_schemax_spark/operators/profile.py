"""Column-profile validation operators: categorical drift, exact
heavy hitters, and robust (MAD) outlier detection.

No reference analogue — the reference (`/root/reference/validator.py`)
checks one file's declared metadata; these are the data-profile checks
a crawl-ingest validator runs per snapshot (did the language mix move?
which values dominate a column? which rows are numerically absurd?).
All three are integer-exact by construction so a SQL engine reproduces
them hash-identically.

Scale shapes at 10^12 rows:

- ``categorical_tv`` and ``heavy_hitters`` reduce the corpus to
  per-VALUE counts first (ONE shuffle with map-side combine); every
  later step runs over distinct values, which for categorical columns
  (lang, source, tld, content-type) is bounded by construction. Like
  ``integrity.exact_ks_2samp``, cross-products ride decimal(20,0) so
  ~1e18-row snapshots cannot overflow.
- ``mad_outliers`` needs a median of medians-of-deviations; both
  medians run over the per-value count table (bounded distinct values
  for the length/score/count columns this targets — for unbounded
  float domains, bucket first). The flagging pass is then a single
  broadcast of two scalars into a corpus projection: no second corpus
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# decimal(20,0) per side keeps cross-products inside decimal(38,0)
# (see integrity._DEC — BIGINT products overflow past ~3e9 rows/side)
_DEC = "decimal(20,0)"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    hh_k: int = 10,
    mad_k: int = 5,
    key_col: str | None = None,
    hh_mode: str = "exact",
) -> dict:
    """Spec-less table profile — the discovery pass a user runs BEFORE
    writing a constraint spec. Returns a bounded driver-side dict:
    table row count, then per column: null count, basic min/max, exact
    heavy hitters (> 1/hh_k share, ≤ hh_k-1 rows by construction), and
    for numeric columns the MAD-outlier count at ``mad_k``.

    One combined aggregation computes row count + per-column
    null/min/max in a SINGLE corpus pass (map-side combined); heavy
    hitters and MAD add per-column passes over per-value count tables.
    Every returned object is O(columns × hh_k) — nothing row-scale
    ever reaches the driver.
    """
    numeric = {"tinyint", "smallint", "int", "bigint", "float",
               "double", "long", "integer", "short", "byte"}
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    cols = columns or [
        c for c, t in fields.items() if t != "binary"
    ]
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"unknown column(s): {', '.join(unknown)}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"__nulls_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    base = df.agg(*aggs).collect()[0]

    out: dict = {"n_rows": base["__n"], "columns": {}}
    for c in cols:
        info: dict = {
            "type": fields[c],
            "null_count": int(base[f"__nulls_{c}"] or 0),
            "min": base[f"__min_{c}"],
            "max": base[f"__max_{c}"],
        }
        if hh_mode == "sketch":
            # Misra-Gries candidates + exact confirm: identical rows
            # to the exact path, but the corpus is never shuffled at
            # value granularity (high-cardinality columns)
            from py_schemax_spark.operators.sketches import (
                approx_heavy_hitters,
            )

            hh_df = approx_heavy_hitters(df, c, k=hh_k)
        elif hh_mode == "exact":
            hh_df = heavy_hitters(df, c, k=hh_k)
        else:
            raise ValueError(
                f"unknown hh_mode {hh_mode!r} (exact | sketch)"
            )
        info["heavy_hitters"] = [
            {"value": r["value"], "cnt": r["cnt"],
             "share_bp": r["share_bp"]}
            for r in hh_df.orderBy(F.desc("cnt"), "value").collect()
        ]
        if fields[c] in numeric:
            key = key_col or cols[0]
            info["mad_outliers"] = mad_outliers(
                df, c, key, k=mad_k
            ).count()
        out["columns"][c] = info
    return out


# Spark simpleString → spec type (the reference's SupportedDataTypes
# vocabulary, /root/reference/py_schemax/model.py:20-26, plus the
# engine's binary extension)
_SPARK_TO_SPEC = {
    "string": "string",
    "tinyint": "integer", "smallint": "integer", "int": "integer",
    "bigint": "integer", "long": "integer", "short": "integer",
    "byte": "integer", "integer": "integer",
    "float": "float", "double": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "datetime", "timestamp_ntz": "datetime",
    "binary": "binary",
}

_INT_SPARK_TYPES = {
    "tinyint", "smallint", "int", "bigint", "long", "short", "byte",
    "integer",
}


def infer_spec(
    profile: dict,
    fqn: str,
    key: str | None = None,
    extra_columns: list[tuple[str, str]] | None = None,
) -> dict:
    """Draft a constraint-spec dict from a `profile_table` report —
    the closing move of the discovery pass (profile → eyeball → emit →
    tighten). Pure function of the profile dict (no Spark).

    Inference is strictly observational, so a table ALWAYS passes the
    spec inferred from itself (tested): ``nullable`` only where nulls
    were observed, numeric ``minimum``/``maximum`` from the observed
    (inclusive) range. Columns whose Spark type has no spec analogue
    (arrays, maps, decimals) are skipped with a ``skipped`` entry
    rather than guessed at. The caller tightens from there — the draft
    is a floor, not a verdict.

    ``extra_columns`` are (name, spark_type) pairs present in the table
    but NOT profiled (a ``--columns`` subset run). Schema conformance
    is extra="forbid", so a spec that omits them would fail on the very
    table it was inferred from; they are declared as permissive
    type-only entries (``nullable: true``, no bounds — nothing was
    observed) to keep the closure property for any column selection.
    """
    cols = []
    skipped = []
    for name, info in profile["columns"].items():
        spark_t = info["type"]
        spec_t = _SPARK_TO_SPEC.get(spark_t)
        if spec_t is None:
            skipped.append({"name": name, "type": spark_t})
            continue
        col: dict = {
            "name": name,
            "type": spec_t,
            "nullable": info["null_count"] > 0,
        }
        if (
            spark_t in _INT_SPARK_TYPES
            and info["min"] is not None
            and info["max"] is not None
        ):
            col["minimum"] = int(info["min"])
            col["maximum"] = int(info["max"])
        elif (
            spark_t in ("float", "double")
            and info["min"] is not None
            and info["max"] is not None
        ):
            col["minimum"] = float(info["min"])
            col["maximum"] = float(info["max"])
        cols.append(col)
    for name, spark_t in extra_columns or []:
        spec_t = _SPARK_TO_SPEC.get(spark_t)
        if spec_t is None:
            skipped.append({"name": name, "type": spark_t})
            continue
        cols.append({"name": name, "type": spec_t, "nullable": True})
    spec: dict = {"fqn": fqn, "columns": cols}
    if key is not None:
        spec["key"] = key
    if skipped:
        spec["metadata"] = {"skipped_columns": skipped}
    return spec


def categorical_tv(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Total-variation distance between two categorical snapshots,
    in basis points.

    ``group_col`` must be boolean-like (0/1 after int cast); rows with
    a null group are dropped, null VALUES count as a category (a
    null-rate shift between snapshots is drift). Returns ONE row
    ``(n_a, n_b, n_values, tv_bp)`` where
    ``tv_bp = floor(10000 * 1/2 * sum_v |p_a(v) - p_b(v)|)`` computed
    as exact integers (``sum_v |c_a*n_b - c_b*n_a|`` over the common
    category grid, divided by ``2*n_a*n_b`` with integral ``div``) —
    the categorical companion of `integrity.exact_ks_2samp` for
    columns where an ordered CDF makes no sense (lang, source, tld).
    """
    g = F.col(group_col).cast("int")
    counts = (
        df.filter(g.isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(
            F.sum(F.when(g == 0, 1).otherwise(0)).cast(_DEC).alias("_ca"),
            F.sum(F.when(g == 1, 1).otherwise(0)).cast(_DEC).alias("_cb"),
        )
    )
    totals = counts.agg(
        F.sum("_ca").cast(_DEC).alias("_na"),
        F.sum("_cb").cast(_DEC).alias("_nb"),
        F.count(F.lit(1)).alias("_nv"),
    )
    joined = counts.crossJoin(F.broadcast(totals))
    dev = F.abs(
        F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na")
    )
    return joined.select(dev.alias("_d"), "_na", "_nb", "_nv").agg(
        F.max("_na").cast("long").alias("n_a"),
        F.max("_nb").cast("long").alias("n_b"),
        F.max("_nv").cast("long").alias("n_values"),
        F.expr(
            "CAST((sum(_d) * 10000) div (2 * max(_na) * max(_nb)) AS BIGINT)"
        ).alias("tv_bp"),
    )


def heavy_hitters(
    df: DataFrame, value_col: str, k: int = 10
) -> DataFrame:
    """EXACT heavy hitters: values occurring in more than ``1/k`` of
    rows (the deterministic ground truth a Misra-Gries / count-min
    sketch approximates; at most ``k-1`` rows can qualify, so the
    output is bounded by construction). Null values count (a column
    that went >10% null IS a heavy hitter worth seeing).

    Returns ``(value, cnt, n_total, share_bp)`` with value rendered as
    a string (nulls as NULL) and ``share_bp = floor(10000*cnt/n)``.
    One count shuffle with map-side combine; the total rides a window
    over the (≤ distinct-values sized) count table, not a second job.
    """
    counts = df.groupBy(
        F.col(value_col).cast("string").alias("value")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy()
    tot = counts.select(
        "value", "cnt", F.sum("cnt").over(w).alias("n_total")
    )
    return tot.filter(F.col("cnt") * k > F.col("n_total")).select(
        "value",
        "cnt",
        "n_total",
        F.expr("CAST((cnt * 10000) div n_total AS BIGINT)").alias(
            "share_bp"
        ),
    )


def _lower_median(counts: DataFrame, value_col: str, cnt_col: str):
    """Lower median over a per-value count table: the smallest value
    whose cumulative count reaches ceil(n/2). Runs on the BOUNDED
    count table (one ordered window over distinct values) and returns
    a 1-row DataFrame ``(med)`` — exact, engine-agnostic (no
    interpolation, no even/odd averaging)."""
    w = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = counts.select(
        F.col(value_col).alias("_v"),
        F.sum(cnt_col).over(w).alias("_cum"),
        F.sum(cnt_col).over(Window.partitionBy()).alias("_n"),
    )
    return (
        cum.filter(F.col("_cum") * 2 >= F.col("_n"))
        .agg(F.min("_v").alias("med"))
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 5,
) -> DataFrame:
    """Robust outliers by median absolute deviation: rows where
    ``|v - med| > k * mad`` with ``med`` the lower median of
    ``value_col`` and ``mad`` the lower median of ``|v - med|``.

    Both medians are exact lower medians over per-value count tables
    (see `_lower_median`) so the verdict is integer-exact for integer
    columns — unlike mean/stddev z-scores, one absurd value cannot
    drag the threshold. When ``mad = 0`` (over half the rows share one
    value) the check degenerates to ``v != med``, the strictest
    reading — callers wanting slack should pre-bucket.

    Returns the violating rows ``(key, value, med, mad)``. Null values
    never violate. Plan: one count shuffle + two bounded windows to
    derive the scalars, then ONE corpus projection against the
    crossJoin-broadcast scalar row — the corpus is never shuffled.
    """
    vals = df.filter(F.col(value_col).isNotNull())
    counts = vals.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    med_df = _lower_median(counts, "_v", "_c")
    dev_counts = (
        counts.crossJoin(F.broadcast(med_df))
        .groupBy(F.abs(F.col("_v") - F.col("med")).alias("_d"))
        .agg(F.sum("_c").alias("_c"))
    )
    mad_df = (
        _lower_median(dev_counts, "_d", "_c")
        .withColumnRenamed("med", "mad")
    )
    scalars = med_df.crossJoin(mad_df)
    return (
        vals.crossJoin(F.broadcast(scalars))
        .filter(
            F.abs(F.col(value_col) - F.col("med")) > F.lit(k) * F.col("mad")
        )
        .select(
            F.col(key_col).alias("key"),
            F.col(value_col).alias("value"),
            "med",
            "mad",
        )
    )
