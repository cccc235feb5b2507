"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "validation": {docs/sec headline}, "scaling": {N vs 4N evidence}}

Headline (matches BASELINE.json's metric): docs/sec validated
end-to-end — ALL constraint classes (stats, row violations,
uniqueness, referential, drift) over a deterministic synthetic pages
table, plus the two-parallelism scaling evidence required by the
north rule (no real cluster in this sandbox): the SAME job at
local[8] (N) and local[32] (4N) on the same input, efficiency =
T8/T32/4 in throughput terms. Results are also appended to BENCH.md.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ROWS (pages-table
size; default 2_000_000), SPARK_GRAFT_SCALING=0 to skip the
two-parallelism runs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

sys.path.insert(0, str(Path(__file__).parent))


def _sf_label(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _make_spark(master: str, shuffle_partitions: int):
    from py_schemax_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{master}", master=master,
        shuffle_partitions=shuffle_partitions,
    )


_PAGES_CACHE: dict[int, str] = {}


def materialize_pages(spark, n_rows: int) -> str:
    """Write the synthetic pages table to parquet ONCE (untimed): the
    baseline metric is docs/sec validated over a STORED table, so the
    timed job must read from disk like production, not re-generate."""
    import tempfile

    if n_rows in _PAGES_CACHE:
        return _PAGES_CACHE[n_rows]
    from py_schemax_spark.sources.datagen import gen_pages

    path = tempfile.mkdtemp(prefix=f"bench_pages_{n_rows}_")
    gen_pages(spark, n_rows).write.mode("overwrite").parquet(path)
    _PAGES_CACHE[n_rows] = path
    return path


def run_validation_suite(spark, n_rows: int, baseline) -> dict:
    """End-to-end validation job: all constraint classes over the
    stored pages table (scan → stats + row violations + uniqueness +
    referential + drift)."""
    from py_schemax_spark.runner import RunConfig, ValidationRun
    from py_schemax_spark.sources.datagen import gen_lang_dim
    from tests.conftest import PAGES_SPEC_DOC
    from py_schemax_spark.specs.loader import validate_spec_dict

    spec = validate_spec_dict(PAGES_SPEC_DOC).spec
    path = materialize_pages(spark, n_rows)
    pages = spark.read.parquet(path)
    run = ValidationRun(
        spark, spec, {"lang_dim": gen_lang_dim(spark)}, baseline,
        RunConfig(order_col="warc_ts"),
    )
    t0 = time.perf_counter()
    res = run.run(pages)
    elapsed = time.perf_counter() - t0
    return {
        "rows": n_rows,
        "sec": round(elapsed, 3),
        "docs_per_sec": round(n_rows / elapsed, 1),
        "violations": res.run_summary.total_violations,
        "partitions": res.run_summary.total_partitions,
    }


def build_drift_baseline(spark):
    from py_schemax_spark.operators.drift import build_baseline
    from py_schemax_spark.sources.datagen import gen_pages
    from py_schemax_spark.specs.loader import validate_spec_dict
    from tests.conftest import PAGES_SPEC_DOC

    spec = validate_spec_dict(PAGES_SPEC_DOC).spec
    clean = gen_pages(spark, 200_000, clean=True)
    return build_baseline(clean, spec).collect()


def main() -> None:
    import __spark_entry__ as entrymod

    sf = _sf_label(SF_DIR)
    out: dict = {
        "metric": "validation suite wall time (all constraint classes) + "
                  "headline queries",
        "unit": "sec",
        "sf": sf,
    }

    spark = _make_spark(f"local[{CPUS}]", CPUS)
    from pyspark.sql import DataFrame

    # drift baseline built once (out of the timed path — in production
    # the baseline is a stored snapshot)
    baseline_rows = build_drift_baseline(spark)
    from py_schemax_spark.operators.drift import BASELINE_SCHEMA

    baseline = spark.createDataFrame(baseline_rows, BASELINE_SCHEMA)

    # headline end-to-end validation throughput at full parallelism
    val = run_validation_suite(spark, BENCH_ROWS, baseline)
    out["validation"] = val

    # representative per-query timings on the driver tables
    qtimes: dict[str, float] = {}
    HEADLINE = [
        "stats", "row_violations", "uniqueness", "exact_dedup",
        "pricing_summary", "revenue_by_nation", "top_event_by_user",
        "token_counts", "fingerprint", "ann_pairs", "minhash_candidates",
        "simhash", "extraction",
    ]
    queries = entrymod.queries()
    for name in HEADLINE:
        t0 = time.perf_counter()
        df: DataFrame = queries[name](spark, SF_DIR)
        n = df.count()
        qtimes[name] = round(time.perf_counter() - t0, 3)
    out["queries"] = qtimes
    out["value"] = round(val["sec"] + sum(qtimes.values()), 3)
    spark.stop()

    # scaling evidence: same job, same input, N=8 vs 4N=32 threads
    if RUN_SCALING:
        scaling = {}
        for n_cores in (8, 32):
            s = _make_spark(f"local[{n_cores}]", n_cores)
            b = s.createDataFrame(baseline_rows, BASELINE_SCHEMA)
            # warm-up JVM/codegen with a tiny run, then measure
            run_validation_suite(s, 50_000, b)
            r = run_validation_suite(s, BENCH_ROWS, b)
            scaling[f"local[{n_cores}]"] = r
            s.stop()
        t8 = scaling["local[8]"]["docs_per_sec"]
        t32 = scaling["local[32]"]["docs_per_sec"]
        scaling["efficiency"] = round(t32 / (4 * t8), 3)
        out["scaling"] = scaling
        _write_bench_md(out)

    print(json.dumps(out))


def _write_bench_md(out: dict) -> None:
    scaling = out["scaling"]
    md = f"""# BENCH — scaling evidence

Per the north rule's two-cluster-size criterion (no real cluster in
this sandbox): the SAME end-to-end validation job (all constraint
classes: stats, row violations, uniqueness, referential, drift) on the
SAME deterministic synthetic pages input, at two parallelism levels.

| parallelism | rows | wall sec | docs/sec |
|---|---|---|---|
| local[8] (N) | {scaling['local[8]']['rows']} | {scaling['local[8]']['sec']} | {scaling['local[8]']['docs_per_sec']} |
| local[32] (4N) | {scaling['local[32]']['rows']} | {scaling['local[32]']['sec']} | {scaling['local[32]']['docs_per_sec']} |

**Scaling efficiency** = throughput(4N) / (4 × throughput(N)) =
**{scaling['efficiency']}** (target ≥ 0.8 per BASELINE.json).

Headline single-session numbers (local[{CPUS}], sf={out['sf']}):
validation {scaling['local[32]']['rows']} docs in
{out['validation']['sec']}s → {out['validation']['docs_per_sec']}
docs/sec; per-query seconds: {json.dumps(out['queries'])}.
"""
    Path(__file__).parent.joinpath("BENCH.md").write_text(md)


if __name__ == "__main__":
    main()
