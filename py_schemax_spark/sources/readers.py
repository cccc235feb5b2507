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


def parse_iceberg_uri(uri: str) -> tuple[str, str | None]:
    """``iceberg:<table>[@<snapshot_id>]`` → (table, snapshot or
    None). The ``@snapshot`` pin is how a resumable run reads the SAME
    immutable snapshot on every restart: the first attempt resolves
    the table's current snapshot-id, records it in the checkpoint
    manifest, and every retry re-reads ``iceberg:tbl@<sid>`` — new
    commits between attempts cannot shift the data under completed
    partitions (the parquet-dir stand-in gets the same property from
    `checkpoint.snapshot_id_for`'s mtime hash, which INVALIDATES on
    change instead of pinning)."""
    body = uri[len("iceberg:"):]
    if "@" in body:
        name, sid = body.rsplit("@", 1)
        if not sid or not name:
            raise ValueError(f"malformed iceberg URI: {uri!r}")
        return name, sid
    return body, None


def read_table(spark: SparkSession, uri: str) -> DataFrame:
    """``iceberg:<table_name>[@<snapshot_id>]`` → catalog table,
    optionally pinned to a snapshot (requires the Iceberg runtime jar
    + catalog conf on the cluster; absent in this sandbox, so gated);
    anything else → parquet path."""
    if uri.startswith("iceberg:"):
        name, sid = parse_iceberg_uri(uri)
        try:
            reader = spark.read.format("iceberg")
            if sid is not None:
                reader = reader.option("snapshot-id", sid)
            return reader.load(name)
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


def pin_iceberg_snapshot(spark: SparkSession, uri: str) -> str:
    """Resolve an unpinned ``iceberg:<table>`` URI to
    ``iceberg:<table>@<current_snapshot_id>`` (already-pinned URIs and
    non-Iceberg URIs pass through unchanged). A resumable run calls
    this ONCE at start and stores the pinned URI alongside its
    checkpoint manifest, so every restart reads the identical
    immutable snapshot — commits landing between attempts cannot
    shift data under partitions already marked done. Reads the
    ``<table>.snapshots`` metadata table (KB-scale), so the pin costs
    one metadata query, no data scan. Gated like `read_table`: raises
    RuntimeError when the Iceberg runtime is absent."""
    if not uri.startswith("iceberg:"):
        return uri
    name, sid = parse_iceberg_uri(uri)
    if sid is not None:
        return uri
    # Resolve the CURRENT snapshot from the main-branch ref — NOT
    # max(committed_at) over `.snapshots`: after a rollback, or with
    # WAP-staged snapshots / other branches, the newest-committed
    # snapshot is not what the table presents. `.refs` is
    # authoritative; `.history` restricted to is_current_ancestor is
    # the fallback for runtimes without the refs metadata table.
    row = None
    err: Exception | None = None
    try:
        row = (
            spark.read.format("iceberg").load(f"{name}.refs")
            .filter("name = 'main' AND type = 'BRANCH'")
            .select("snapshot_id")
            .first()
        )
    except Exception as exc:
        err = exc
    if row is None:
        try:
            row = (
                spark.read.format("iceberg").load(f"{name}.history")
                .filter("is_current_ancestor")
                .orderBy(F.desc("made_current_at"))
                .select("snapshot_id")
                .first()
            )
        except Exception as exc:
            err = exc
    if row is None:
        raise RuntimeError(
            f"cannot pin snapshot for iceberg table {name}: Iceberg "
            "runtime/catalog not configured on this cluster, or the "
            "table has no snapshots"
        ) from err
    return f"iceberg:{name}@{row['snapshot_id']}"
