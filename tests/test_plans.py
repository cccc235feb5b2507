"""Physical-plan quality gates — the 100 TB concerns, asserted on
`.explain` output so regressions that silently de-optimize the plan
(lost pushdown, lost pruning, accidental shuffle) fail CI.

(SURVEY.md §4.2: pushdown/pruning/codegen/broadcast are free ONLY if
the plan stays declarative — these tests pin that.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.referential import referential_violations
from py_schemax_spark.operators.stats import column_stats
from py_schemax_spark.operators.violations import row_violations
from py_schemax_spark.sources.datagen import gen_pages
from py_schemax_spark.sources.readers import partition_predicate
from py_schemax_spark.specs.loader import validate_spec_dict


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pages")
    gen_pages(spark, 2000).withColumn("day", F.to_date("warc_ts")) \
        .write.partitionBy("day").mode("overwrite").parquet(path)
    return path


def test_row_violations_prunes_unconstrained_columns(spark, pages_parquet):
    """The scan must NOT read `html` (the dominant bytes) when no
    constraint touches it — column pruning reaching the parquet reader."""
    spec = validate_spec_dict(
        {
            "fqn": "t", "key": "url",
            "columns": [
                {"name": "url", "type": "string", "nullable": False},
                {"name": "text", "type": "string", "min_length": 1},
            ],
        }
    ).spec
    df = spark.read.parquet(pages_parquet)
    plan = _plan(row_violations(df, spec))
    scan_line = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_line, plan
    assert "html" not in scan_line[0]
    assert "url" in scan_line[0] and "text" in scan_line[0]


def test_partition_predicate_prunes_at_scan(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).filter(
        partition_predicate({"day": ["2024-01-01"]})
    )
    plan = _plan(df.select("url"))
    # partition filters appear as PartitionFilters on the scan node
    assert "PartitionFilters" in plan
    assert "2024-01-01" in plan or "19723" in plan  # date literal or epoch-day


def test_value_filter_pushed_to_parquet(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).filter(F.col("lang") == "en")
    plan = _plan(df.select("url", "lang"))
    assert "PushedFilters" in plan
    assert "IsNotNull(lang)" in plan or "EqualTo(lang,en)" in plan


def test_referential_is_broadcast_no_fact_shuffle(spark, pages_parquet, lang_dim):
    spec = validate_spec_dict(
        {
            "fqn": "t", "key": "url",
            "columns": [
                {"name": "url", "type": "string"},
                {"name": "lang", "type": "string",
                 "references": {"table": "lang_dim", "column": "lang"}},
            ],
        }
    ).spec
    df = spark.read.parquet(pages_parquet)
    plan = _plan(referential_violations(df, spec, {"lang_dim": lang_dim}))
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    # zero shuffles anywhere: fact side probes the broadcast in place
    assert "Exchange hashpartitioning" not in plan, plan


def test_referential_large_dim_never_shuffles_fact_rows(
    spark, pages_parquet, lang_dim
):
    """Forced distinct-keys strategy: the only exchanges in the plan
    carry DISTINCT values (`_v`) / dim keys (`_dim_value`) — never the
    fact's key column — and the violating rows are tagged by a
    broadcast left-semi probe, so full fact rows stay in place."""
    spec = validate_spec_dict(
        {
            "fqn": "t", "key": "url",
            "columns": [
                {"name": "url", "type": "string"},
                {"name": "lang", "type": "string",
                 "references": {"table": "lang_dim", "column": "lang"}},
            ],
        }
    ).spec
    df = spark.read.parquet(pages_parquet)
    out = referential_violations(
        df, spec, {"lang_dim": lang_dim}, max_broadcast_rows=0
    )
    plan = _plan(out)
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    # the invalid-set tag join is a broadcast probe
    assert "BroadcastHashJoin" in plan, plan
    # no exchange ever partitions on the fact key (full rows in place)
    assert "hashpartitioning(url" not in plan, plan


def test_stats_is_single_scan_partial_agg(spark, pages_parquet, pages_spec):
    df = spark.read.parquet(pages_parquet)
    plan = _plan(column_stats(df, pages_spec))
    # exactly one FileScan: all metrics in one pass
    assert plan.count("FileScan") == 1
    # partial + final aggregation (map-side combine before the merge;
    # Spark picks Hash/Sort/ObjectHashAggregate by aggregate kinds)
    assert "Aggregate" in plan, plan


def test_row_violations_no_shuffle(spark, pages_parquet, pages_spec):
    """Row constraints are partition-local: the plan must contain NO
    exchange at all."""
    df = spark.read.parquet(pages_parquet)
    plan = _plan(row_violations(df, pages_spec))
    assert "Exchange" not in plan, plan


def test_uniqueness_single_shuffle(spark, pages_parquet, pages_spec):
    from py_schemax_spark.operators.uniqueness import uniqueness_violations

    df = spark.read.parquet(pages_parquet)
    plan = _plan(uniqueness_violations(df, pages_spec, order_col="warc_ts"))
    # one hash exchange for the window partitioning, nothing more
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_blocked_all_pairs_has_no_collect_and_single_shuffle(spark):
    """The scale path must be one shuffle (groupBy block-pair) feeding
    one FlatMapGroupsInPandas — and crucially NO driver-side collect
    is reachable from the plan (the broadcast path's scale-killer)."""
    import numpy as np

    from py_schemax_spark.operators.similarity import all_pairs_above_blocked

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = all_pairs_above_blocked(df, 0.3, n_blocks=3)
    plan = _plan(out)
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1, plan


def test_brute_force_topk_corpus_never_shuffles_before_scoring(spark):
    """Scoring happens map-side (MapInPandas over the corpus); the only
    exchange is the per-query window over batch-local top-k rows."""
    import numpy as np

    from py_schemax_spark.operators.similarity import brute_force_topk

    rng = np.random.default_rng(8)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(df, q, k=5)
    plan = _plan(out)
    assert "MapInPandas" in plan
    # exactly one exchange total: the window's hashpartition on
    # query_id over the (k*|Q| per batch) candidates — the corpus
    # itself reaches the scorer shuffle-free
    assert plan.count("Exchange") == 1, plan


def test_all_pairs_strategy_gate_never_full_counts(spark):
    """Round-3: the broadcast-vs-blocked strategy choice must not run a
    full count() over the corpus (at 100 TB that is an extra job over
    the entire input). With an approx_rows hint NO job runs for the
    gate; without it, the probe is a bounded limit(max+1) scan — the
    input DataFrame's own .count is never invoked."""
    from py_schemax_spark.operators.similarity import all_pairs_above_np

    rows = [(i, [float(i), 1.0, 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def boom():
        raise AssertionError("gate ran a full count() on the corpus")

    df.count = boom  # instance-level: limit(...).count() is unaffected
    # hint path: strategy picked with zero jobs
    out_hint = all_pairs_above_np(df, -1.1, approx_rows=30)
    assert out_hint.count() == 30 * 29 // 2
    big = all_pairs_above_np(df, -1.1, approx_rows=10_000_000, n_blocks=3)
    assert big.count() == 30 * 29 // 2  # blocked path, identical result
    # probe path: bounded limit scan, not df.count()
    out_probe = all_pairs_above_np(df, -1.1, max_broadcast_rows=10,
                                   n_blocks=3)
    assert out_probe.count() == 30 * 29 // 2


def test_asof_join_single_shuffle_no_join_node(spark):
    """The as-of join must compile to the union-and-carry shape: ONE
    exchange (the window partitioning over `by`) and NO join operator
    — a range-join formulation would explode to O(|L|·|R|) per key."""
    from py_schemax_spark.operators.joins import asof_join

    left = spark.range(1000).select(
        (F.col("id") % 7).alias("by"),
        F.col("id").cast("timestamp").alias("ts"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(
        (F.col("id") % 7).alias("by"),
        (F.col("id") * 10).cast("timestamp").alias("ts"),
        F.col("id").alias("rv"),
    )
    plan = _plan(asof_join(left, right, on="ts", by="by",
                           right_cols=["rv"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_pii_scan_pure_projection_no_exchange_no_python(spark):
    """PII counting/redaction must stay a codegen'd JVM projection —
    no shuffle, no Python/Arrow UDF evaluation node."""
    from py_schemax_spark.operators.pii import pii_scan

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )
    plan = _plan(pii_scan(df))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "*(1)" in plan  # whole-stage-codegen stage marker


def test_repetition_profile_two_exchanges_no_join(spark):
    """explode → (key,tok) agg → per-key window → final agg must reuse
    the window's key partitioning: exactly two exchanges, no join.
    (The source is round-robin-repartitioned first — a Range source's
    RangePartitioning satisfies the per-key distributions outright and
    Catalyst correctly elides EVERY shuffle, hiding the shape under
    test.)"""
    from py_schemax_spark.operators.textstats import repetition_profile

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a b c a "), F.col("id").cast("string")).alias("text"),
    ).repartition(5)
    plan = _plan(repetition_profile(df))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan
