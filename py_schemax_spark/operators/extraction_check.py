"""Extraction-invariant check: ``extract(html) == text`` byte-for-byte
per row (BASELINE.json input_hint — the engine's per-row invariant vs
the reference harness).

Row-local (resumable under checkpointing) and the only check class
whose cost is dominated by Python — but Arrow-batched Python: the
pandas UDF decodes whole record batches, so throughput scales linearly
with cores, unlike any per-row UDF. The scan for this check is the
only one that reads the ``html`` payload bytes at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_schemax_spark.specs.model import TableSpec


def extraction_violations(
    df: DataFrame,
    spec: TableSpec,
    key_col: str | None = None,
    partition_expr=None,
) -> DataFrame:
    """Rows whose extracted text differs from the stored text →
    ``(<key>, 'extraction', observed, expected)``. Null html with null
    text is consistent (no violation); unextractable html (corrupt
    payload → extractor returns null) against non-null text IS one."""
    assert spec.extraction is not None
    src, tgt = spec.extraction.source, spec.extraction.target
    key = key_col or spec.key_column
    pcol = (
        [partition_expr.cast("string").alias("part")]
        if partition_expr is not None
        else []
    )
    from py_schemax_spark.functions.extraction import extract_mismatch_udf

    cid = f"{src}.extraction"
    return (
        df.select(F.col(key).cast("string").alias(key), src, tgt, *pcol)
        # compare inside the Arrow batch: null = byte-identical, so the
        # common clean row ships ~1 null byte back instead of its whole
        # extracted text (see extract_mismatch_udf)
        .withColumn("_mx", extract_mismatch_udf(F.col(src), F.col(tgt)))
        .filter(F.col("_mx").isNotNull())
        .select(
            key,
            F.lit(cid).alias("constraint_id"),
            F.substring(F.col("_mx"), 1, 256).alias("observed"),
            F.lit(f"extract({src}) == {tgt} (byte-identical)").alias(
                "expected"
            ),
            *(["part"] if pcol else []),
        )
    )
