"""Shard planning + JSONL export (sources/shards.py).

Mirrors the reference's test strategy (SURVEY.md §5): pure-Python
reference recomputation, boundary exactness, partitioning invariance,
and a filesystem contract check (one data file per shard).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.sources.shards import plan_shards, write_jsonl_shards

ROWS = [(i, (i * 37) % 90 + 1) for i in range(60)] + [(60, None)]


def _expected(budget):
    order = sorted(
        ROWS, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(),
                             r[0])
    )
    out, cum = {}, 0
    for k, sz in order:
        sz = sz or 0
        out[k] = (sz, cum, cum // budget)
        cum += sz
    return out


@pytest.fixture(scope="module")
def sized_df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, n_units long")


def test_plan_matches_python_reference(spark, sized_df):
    got = {
        r["doc_id"]: (r["n_units"], r["offset"], r["shard_id"])
        for r in plan_shards(
            sized_df, max_units_per_shard=200
        ).collect()
    }
    assert got == _expected(200)


def test_partitioning_invariance(spark, sized_df):
    a = sorted(
        map(tuple, plan_shards(sized_df, max_units_per_shard=200)
            .collect())
    )
    b = sorted(
        map(tuple, plan_shards(
            sized_df.repartition(13), max_units_per_shard=200
        ).collect())
    )
    assert a == b


def test_straddling_doc_belongs_to_starting_shard(spark):
    # sizes 150,150 with budget 200: second doc starts at offset 150
    # (shard 0) even though it crosses into shard 1's range
    df = spark.createDataFrame(
        [(1, 150), (2, 150), (3, 150)], "doc_id long, n_units long"
    )
    got = {
        r["doc_id"]: (r["offset"], r["shard_id"])
        for r in plan_shards(df, max_units_per_shard=200).collect()
    }
    offs = sorted(v[0] for v in got.values())
    assert offs == [0, 150, 300]
    by_off = {v[0]: v[1] for v in got.values()}
    assert by_off[0] == 0 and by_off[150] == 0 and by_off[300] == 1


def test_null_size_is_zero_and_stable(spark, sized_df):
    got = {
        r["doc_id"]: r["n_units"]
        for r in plan_shards(sized_df, max_units_per_shard=200)
        .collect()
    }
    assert got[60] == 0


def test_budget_validation(spark, sized_df):
    with pytest.raises(ValueError):
        plan_shards(sized_df, max_units_per_shard=0)


def test_write_jsonl_one_file_per_shard(spark, sized_df, tmp_path):
    plan = plan_shards(sized_df, max_units_per_shard=500)
    out = str(tmp_path / "shards")
    write_jsonl_shards(plan, out)
    dirs = sorted(glob.glob(os.path.join(out, "shard_id=*")))
    assert len(dirs) >= 2
    total = 0
    for d in dirs:
        parts = [p for p in glob.glob(os.path.join(d, "part-*"))
                 if not p.endswith(".crc")]
        assert len(parts) == 1  # ONE data file per shard
        with open(parts[0]) as fh:
            for line in fh:
                json.loads(line)
                total += 1
    assert total == len(ROWS)


def test_roundtrip_read_back(spark, sized_df, tmp_path):
    plan = plan_shards(sized_df, max_units_per_shard=500)
    expect = sorted(
        (r["doc_id"], r["n_units"], r["offset"], r["shard_id"])
        for r in plan.collect()
    )
    out = str(tmp_path / "rt")
    write_jsonl_shards(plan, out)
    back = spark.read.json(out)
    got = sorted(
        (r["doc_id"], r["n_units"], r["offset"], int(r["shard_id"]))
        for r in back.collect()
    )
    assert got == expect


def test_jsonl_uri_reads_exported_shards(spark, sized_df, tmp_path):
    from py_schemax_spark.sources.readers import read_table

    plan = plan_shards(sized_df, max_units_per_shard=500)
    out = str(tmp_path / "uri")
    write_jsonl_shards(plan, out)
    back = read_table(spark, f"jsonl:{out}")
    assert back.count() == len(ROWS)
    assert "shard_id" in back.columns


def test_csv_uri_reader(spark, tmp_path):
    from py_schemax_spark.sources.readers import read_table

    p = tmp_path / "dim.csv"
    p.write_text("lang,name\nen,English\nde,German\n")
    df = read_table(spark, f"csv:{p}")
    assert sorted(r["lang"] for r in df.collect()) == ["de", "en"]
    assert df.columns == ["lang", "name"]
