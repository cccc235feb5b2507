"""Table readers (SURVEY.md §2.1 S1/S2): the data-level analogue of
the reference's file-path sources (cli.py:79, utils.py:9-18).

- ``read_table``: Iceberg when a catalog is configured (the production
  target per BASELINE.json), parquet directory otherwise — same
  DataFrame either way, so every operator is storage-agnostic.
- ``partition_predicate``: partition-pruning filter from CLI-style
  ``--partitions day=2024-01-02,2024-01-03`` selections — the
  analogue of validating a subset of files, executed as an Iceberg/
  parquet partition-prune (zero I/O on excluded partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, uri: str) -> DataFrame:
    """``iceberg:<table_name>`` → catalog table (requires the Iceberg
    runtime jar + catalog conf on the cluster; absent in this sandbox,
    so gated); anything else → parquet path."""
    if uri.startswith("iceberg:"):
        name = uri[len("iceberg:"):]
        try:
            return spark.read.format("iceberg").load(name)
        except Exception as exc:  # jar/catalog not on classpath
            raise RuntimeError(
                f"Iceberg source requested ({name}) but the Iceberg "
                "runtime/catalog is not configured on this cluster"
            ) from exc
    if uri.startswith("stream:"):
        # streaming file source over a growing parquet directory; the
        # schema must be supplied by the caller via readStream options
        raise ValueError("use spark.readStream directly for stream: URIs")
    if uri.startswith("csv:"):
        # header-ed CSV with schema inference — the lingua franca for
        # dimension tables and blocklists; production runs should
        # supply a spec-typed schema (inference is one extra pass)
        return (
            spark.read.option("header", "true")
            .option("inferSchema", "true")
            .csv(uri[len("csv:"):])
        )
    if uri.startswith("jsonl:"):
        # JSON-lines directories — e.g. the training shards
        # `sources/shards.write_jsonl_shards` exports, closing the
        # loop: curate → shards → validate the shards. Schema is
        # inferred (one extra pass); pass an explicit spec-typed
        # schema via spark.read.schema(...).json for production runs.
        return spark.read.json(uri[len("jsonl:"):])
    if uri.startswith("warc:"):
        # raw Common-Crawl WARC/WET files — distributed record split +
        # codegen'd header/payload extraction (sources/warc.py); specs
        # then validate url/warc_ts/payload like any other table
        from py_schemax_spark.sources.warc import read_warc

        return read_warc(spark, uri[len("warc:"):])
    return spark.read.parquet(uri)


def partition_predicate(selections: dict[str, list[str]]):
    """AND of per-column IN-lists, e.g. {"day": ["2024-01-02"]} —
    applied before any operator so the scan prunes partitions."""
    pred = F.lit(True)
    for col, values in selections.items():
        pred = pred & F.col(col).isin(values)
    return pred
