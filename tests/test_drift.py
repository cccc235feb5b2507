"""t-digest + drift operator tests (SURVEY.md §7 hard-point (a):
merge correctness and determinism across partition counts)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from py_schemax_spark.functions.tdigest import TDigest, ks, merge_all, psi
from py_schemax_spark.operators.drift import (
    build_baseline,
    drift_verdicts,
    merge_sketches,
    sketch_column,
)
from py_schemax_spark.sources.datagen import gen_pages


def test_tdigest_quantile_accuracy():
    rng = np.random.default_rng(7)
    data = rng.lognormal(3, 1, 100_000)
    td = TDigest(200)
    td.add(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        true = np.quantile(data, q)
        assert abs(td.quantile(q) - true) / true < 0.05, q


def test_tdigest_merge_matches_single_digest():
    rng = np.random.default_rng(8)
    data = rng.normal(0, 1, 50_000)
    single = TDigest(200)
    single.add(data)
    parts = []
    for chunk in np.array_split(data, 13):
        t = TDigest(200)
        t.add(chunk)
        parts.append(t)
    merged = merge_all(parts)
    for q in (0.05, 0.5, 0.95):
        assert abs(merged.quantile(q) - single.quantile(q)) < 0.05


def test_tdigest_serialization_roundtrip():
    td = TDigest(100)
    td.add(np.arange(1000, dtype=float))
    rt = TDigest.from_bytes(td.to_bytes())
    assert np.allclose(rt.means, td.means)
    assert np.allclose(rt.weights, td.weights)
    assert rt.compression == td.compression


def test_psi_ks_sensitivity():
    rng = np.random.default_rng(9)
    base = TDigest(200)
    base.add(rng.normal(100, 15, 100_000))
    bq = base.quantiles(np.linspace(0, 1, 101))
    same = TDigest(200)
    same.add(rng.normal(100, 15, 50_000))
    shifted = TDigest(200)
    shifted.add(rng.normal(120, 15, 50_000))
    assert psi(bq, same) < 0.02 < psi(bq, shifted)
    assert ks(bq, same) < 0.02 < ks(bq, shifted)


def test_sketch_pipeline_determinism_across_partition_counts(spark):
    """Same data, different parallelism → drift verdict must agree
    within sketch tolerance (hard-point (a))."""
    df4 = gen_pages(spark, 4000, clean=True, num_partitions=4)
    df16 = gen_pages(spark, 4000, clean=True, num_partitions=16)
    expr = F.length("text").cast("double")
    d4 = merge_all(merge_sketches(sketch_column(df4, expr), fan=4))
    d16 = merge_all(merge_sketches(sketch_column(df16, expr), fan=4))
    assert d4.total_weight == d16.total_weight
    for q in (0.1, 0.5, 0.9):
        a, b = d4.quantile(q), d16.quantile(q)
        assert abs(a - b) / max(a, 1) < 0.02, (q, a, b)


def test_drift_verdicts_same_and_shifted(spark, pages_spec):
    clean = gen_pages(spark, 3000, clean=True)
    baseline = build_baseline(clean, pages_spec)
    same = drift_verdicts(
        gen_pages(spark, 3000, seed=99, clean=True), pages_spec, baseline
    )
    assert len(same) == 1 and not same[0]["drifted"]

    truncated = gen_pages(spark, 3000, seed=98, clean=True).withColumn(
        "text", F.substring("text", 1, 15)
    )
    shifted = drift_verdicts(truncated, pages_spec, baseline)
    assert shifted[0]["drifted"]
    assert shifted[0]["psi"] > 0.2 or shifted[0]["ks"] > 0.1


def test_missing_baseline_column_is_drifted(spark, pages_spec):
    empty = spark.createDataFrame(
        [], "column_name string, quantiles array<double>, n long, snapshot_id string"
    )
    verdicts = drift_verdicts(
        gen_pages(spark, 500, clean=True), pages_spec, empty
    )
    assert verdicts[0]["drifted"] and verdicts[0]["error"]
