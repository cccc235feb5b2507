"""Standalone mirror of the driver correctness gate at any SF.

Usage: python tools/check_parity.py [sf_dir] [--only q1,q2,...]
(sf_dir defaults to sf0.01)

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the oracle on DuckDB over the same parquet; compares
column names, row counts, and order-insensitive normalized values.
Non-oracled queries get the weaker rows-only check (runs, >=0 rows,
stable schema).
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from py_schemax_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _normalize(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return str(v)


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark(app_name="parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from py_schemax_spark.operators.dedup import release_all_intermediates

    queries = entrymod.queries()
    if only is not None:
        missing = only - set(queries)
        if missing:
            print(f"unknown queries: {sorted(missing)}")
            return 1
        queries = {k: v for k, v in queries.items() if k in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, q in queries.items():
        t0 = time.time()
        try:
            sdf = q(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(_normalize(r[c]) for c in scols) for r in sdf.collect()
            )
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            release_all_intermediates()
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows, {time.time()-t0:.1f}s")
            continue
        cur = con.execute(oracles[name])
        names = [d[0] for d in cur.description]
        order = sorted(range(len(names)), key=lambda i: names[i])
        drows = sorted(
            tuple(_normalize(r[i]) for i in order) for r in cur.fetchall()
        )
        dcols = sorted(names)
        if scols != dcols:
            failures.append((name, f"cols {scols} vs {dcols}"))
            print(f"FAIL  {name}: cols {scols} vs {dcols}")
        elif len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
        elif srows != drows:
            diffs = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            failures.append((name, f"values differ: {diffs}"))
            print(f"FAIL  {name}: values differ: {diffs}")
        else:
            print(f"ok    {name}: {len(srows)} rows, {time.time()-t0:.1f}s")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
