"""Distribution-drift checks (SURVEY.md §2.4 / north_star).

No reference analogue — the reference validates metadata, not data
distributions; this is the gap-class operator the north star
prescribes: per-partition t-digest quantile sketches, merged treewise,
compared with PSI / KS statistics against a baseline snapshot.

Plan shape at 100 TB:

1. **partial sketch** — ``mapInPandas`` over the (column-pruned) scan:
   each input partition folds its Arrow batches into ONE t-digest and
   emits a single (sketch, n) row. Data reduction is ~10^6:1 before
   any shuffle; the shuffle that follows carries only #partitions
   sketch rows (KBs each).
2. **treewise merge** — rounds of ``groupBy(bucket).applyInPandas``
   with fan-in ``fan``: 10^5 partition sketches → 10^5/fan → ... → ≤
   fan rows, so no single reducer ever deserializes more than ``fan``
   sketches (the treeAggregate pattern, expressed relationally so AQE
   can still coalesce).
3. **driver finalize** — merge the ≤ fan survivors, compute PSI/KS vs
   the baseline quantile grid, threshold per spec. Driver handles only
   KB-sized sketches, never data.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from py_schemax_spark.functions.tdigest import TDigest, ks, merge_all, psi
from py_schemax_spark.specs.model import TableSpec

_SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("sketch", T.BinaryType()),
        T.StructField("n", T.LongType()),
    ]
)

BASELINE_SCHEMA = T.StructType(
    [
        T.StructField("column_name", T.StringType()),
        T.StructField("quantiles", T.ArrayType(T.DoubleType())),
        T.StructField("n", T.LongType()),
        T.StructField("snapshot_id", T.StringType()),
    ]
)

_N_QUANTILES = 101  # q = 0.00 .. 1.00 grid stored in baselines


def _drift_expr(spec_col) -> Column:
    """Numeric expression a drift check sketches: the raw value for
    numeric columns, the string length for text (``on="length"``)."""
    c = F.col(spec_col.name)
    if spec_col.drift and spec_col.drift.on == "length":
        return F.length(c).cast("double")
    return c.cast("double")


def sketch_column(
    df: DataFrame, expr: Column, compression: float = 200.0
) -> DataFrame:
    """Stage 1: one t-digest per input partition via mapInPandas
    (zero shuffle; Arrow-batched; nulls dropped inside numpy)."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        td = TDigest(compression)
        n = 0
        for pdf in batches:
            vals = pdf["_v"].to_numpy(dtype="float64", na_value=np.nan)
            td.add(vals)
            n += int(np.count_nonzero(~np.isnan(vals)))
        if n:
            yield pd.DataFrame({"sketch": [td.to_bytes()], "n": [n]})

    return df.select(expr.alias("_v")).mapInPandas(fold, _SKETCH_SCHEMA)


def merge_sketches(
    sketches: DataFrame, fan: int = 32, compression: float = 200.0
) -> list[TDigest]:
    """Stage 2+3: treewise reduction rounds until ≤ ``fan`` sketch rows
    remain, then collect them (KBs) for the driver-side finalize."""

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ds = [TDigest.from_bytes(b) for b in pdf["sketch"]]
        merged = merge_all(ds, compression)
        return pd.DataFrame(
            {"sketch": [merged.to_bytes()], "n": [int(pdf["n"].sum())]}
        )

    # plan the number of merge rounds from the partition count — no
    # count() actions (each would be a full Spark job); each round
    # reduces row count by ~fan, so rounds = ceil(log_fan(#partitions))
    import math

    n = max(sketches.rdd.getNumPartitions(), 1)
    rounds = 0
    while n > fan:
        rounds += 1
        n = math.ceil(n / fan)
    cur = sketches
    for _ in range(rounds):
        cur = (
            cur.withColumn(
                "_b", F.pmod(F.xxhash64("sketch"), F.lit(fan))
            )
            .groupBy("_b")
            .applyInPandas(
                lambda pdf: merge_group(pdf.drop(columns=["_b"])),
                _SKETCH_SCHEMA,
            )
        )
    rows = cur.collect()
    return [TDigest.from_bytes(r["sketch"]) for r in rows]


def sketch_to_quantiles(digest: TDigest) -> list[float]:
    return [float(x) for x in digest.quantiles(np.linspace(0, 1, _N_QUANTILES))]


def build_baseline(
    df: DataFrame,
    spec: TableSpec,
    snapshot_id: str = "baseline",
    compression: float = 200.0,
    fan: int = 32,
) -> DataFrame:
    """Materialize the baseline snapshot (FIXTURES.md §3): one quantile
    grid per drift-checked column, computed from a clean run."""
    spark = df.sparkSession
    rows = []
    for cs in spec.columns:
        if cs.drift is None:
            continue
        parts = sketch_column(df, _drift_expr(cs), compression)
        digest = merge_all(merge_sketches(parts, fan, compression), compression)
        rows.append(
            (
                cs.name,
                sketch_to_quantiles(digest),
                int(digest.total_weight),
                snapshot_id,
            )
        )
    return spark.createDataFrame(rows, BASELINE_SCHEMA)


def drift_verdicts(
    df: DataFrame,
    spec: TableSpec,
    baseline: DataFrame,
    compression: float = 200.0,
    fan: int = 32,
) -> list[dict]:
    """Compare current data against the baseline snapshot.

    Returns one verdict dict per drift-checked column:
    ``{column, psi, ks, psi_threshold, ks_threshold, drifted}`` —
    thresholding happens driver-side on KB-size sketches.
    """
    base = {
        r["column_name"]: (np.asarray(r["quantiles"]), r["n"])
        for r in baseline.collect()
    }
    out: list[dict] = []
    for cs in spec.columns:
        if cs.drift is None:
            continue
        if cs.name not in base:
            out.append(
                {
                    "column": cs.name,
                    "psi": None,
                    "ks": None,
                    "psi_threshold": cs.drift.psi_threshold,
                    "ks_threshold": cs.drift.ks_threshold,
                    "drifted": True,
                    "error": "no baseline snapshot for column",
                }
            )
            continue
        parts = sketch_column(df, _drift_expr(cs), compression)
        digest = merge_all(merge_sketches(parts, fan, compression), compression)
        bq, _bn = base[cs.name]
        p = psi(bq, digest)
        k = ks(bq, digest)
        out.append(
            {
                "column": cs.name,
                "psi": p,
                "ks": k,
                "psi_threshold": cs.drift.psi_threshold,
                "ks_threshold": cs.drift.ks_threshold,
                "drifted": bool(
                    p > cs.drift.psi_threshold or k > cs.drift.ks_threshold
                ),
            }
        )
    return out


def drift_violations(
    spark: SparkSession, verdicts: list[dict], key_name: str = "url"
) -> DataFrame:
    """Render drift verdicts in the standard violation-row contract so
    they merge with row/uniqueness/referential violations. Drift is
    table-level, so the key is the synthetic ``__table__:<column>``."""
    rows = [
        (
            f"__table__:{v['column']}",
            f"{v['column']}.drift",
            f"psi={v['psi']:.4f} ks={v['ks']:.4f}"
            if v.get("psi") is not None
            else "no baseline",
            f"psi<={v['psi_threshold']} ks<={v['ks_threshold']}",
        )
        for v in verdicts
        if v["drifted"]
    ]
    schema = T.StructType(
        [
            T.StructField(key_name, T.StringType()),
            T.StructField("constraint_id", T.StringType()),
            T.StructField("observed", T.StringType()),
            T.StructField("expected", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
