"""Bucketed parquet tables: the shuffle-elimination sink.

At 10^12 documents the repeated cost center is the hash exchange on
the validation key (``url``): uniqueness counts, snapshot diffs
(``row_diff`` / ``snapshot_reconcile``), and checkpoint-resume joins
all re-shuffle the corpus on the same key every run. Writing the table
BUCKETED on that key pays the shuffle once at ingest and never again:
Spark records the bucket spec in the catalog, a scan of the table
reports ``HashPartitioning(key, n_buckets)`` as its output
partitioning, and every downstream equi-join / aggregation on the key
plans with ZERO Exchange (plan-asserted in ``tests/test_bucketed.py``).

Rules the planner holds us to (and the writer enforces loudly):

- bucket pruning/co-location only works through the catalog —
  ``saveAsTable``, not ``save`` (a pathless ``parquet`` write drops
  the bucket spec);
- both join sides need the SAME bucket count (Spark only coalesces
  mismatched counts when ``bucketing.coalesceBucketsInJoin`` is on,
  and only by integer ratio); the reader helper exposes the recorded
  spec so callers can match it;
- one file per bucket per write task — write with a pre-shuffle
  (``repartition`` on the keys, done here) or small-file counts
  explode at scale.

On a real deployment the same API maps onto Iceberg's ``bucket(N,
url)`` partition transform (storage-partitioned joins); parquet +
in-memory catalog is the sandbox-faithful equivalent.

No reference analogue (the reference never persists anything); this is
north-star infrastructure for the resumable 10^12-doc validation run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed on ``key_cols``.

    ``path`` makes it an external table (tests point this at a
    tmpdir); without it the session warehouse dir is used. ``sort_cols``
    additionally sorts within each bucket file (merge-join-friendly
    and better page compression for the sorted key).

    The explicit ``repartition`` on the keys before the write bounds
    the file count at ``n_buckets`` files total instead of
    ``n_buckets × write_tasks`` — at 10^12 rows the latter is a
    small-file catastrophe for every later scan.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must name at least one column")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = (
        df.repartition(n_buckets, *keys)
        .write.format("parquet")
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort_cols:
        sorts = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(sorts[0], *sorts[1:])
    if path:
        w = w.option("path", path)
    w.mode(mode).saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int]:
    """The recorded bucket columns and count for ``table`` — callers
    match this when writing the other side of a co-located join.
    Raises ``ValueError`` if the table is not bucketed (a silent
    non-bucketed join would quietly reintroduce the corpus shuffle
    this module exists to remove)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        raise ValueError(f"table {table!r} is not bucketed")
    cols = [
        c.strip().strip("`")
        for c in info["Bucket Columns"].strip("[]").split(",")
    ]
    return cols, int(info["Num Buckets"])
