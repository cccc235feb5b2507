"""Cardinality constraint class (spec-declared min_rows/max_rows on
references) — loader validation, operator rows, runner verdicts,
checkpoint parity, CLI exposure.

Mirrors the reference's test strategy (SURVEY.md §5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_schemax_spark.operators.referential import cardinality_violations
from py_schemax_spark.runner import RunConfig, ValidationRun
from py_schemax_spark.specs.loader import validate_spec_dict


def _spec(min_rows=1, max_rows=3):
    refs = {"table": "lang_dim", "column": "lang"}
    if min_rows is not None:
        refs["min_rows"] = min_rows
    if max_rows is not None:
        refs["max_rows"] = max_rows
    res = validate_spec_dict(
        {
            "fqn": "t.pages",
            "key": "url",
            "columns": [
                {"name": "url", "type": "string", "nullable": False},
                {"name": "lang", "type": "string", "references": refs},
            ],
        }
    )
    assert res.valid, res.errors
    return res.spec


@pytest.fixture(scope="module")
def fact(spark):
    rows = [(f"https://x/{i}", lang) for i, lang in enumerate(
        ["en", "en", "de", "de", "de", "de", None]
    )]
    return spark.createDataFrame(rows, "url string, lang string")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("en",), ("de",), ("fr",)], "lang string"
    )


def test_loader_parses_bounds():
    spec = _spec(2, 5)
    ref = spec.columns[1].references
    assert (ref.min_rows, ref.max_rows) == (2, 5)


def test_loader_rejects_bad_bounds():
    for refs in (
        {"table": "d", "column": "c", "min_rows": -1},
        {"table": "d", "column": "c", "max_rows": "many"},
        {"table": "d", "column": "c", "min_rows": True},
        {"table": "d", "column": "c", "min_rows": 5, "max_rows": 2},
    ):
        res = validate_spec_dict(
            {
                "fqn": "t.t",
                "key": "url",
                "columns": [
                    {"name": "url", "type": "string"},
                    {"name": "lang", "type": "string",
                     "references": refs},
                ],
            }
        )
        assert not res.valid
        assert any("min_rows" in e.message for e in res.errors)


def test_operator_rows_hand_computed(spark, fact, dim):
    got = {
        r["url"]: (r["constraint_id"], r["observed"])
        for r in cardinality_violations(
            fact, _spec(1, 3), {"lang_dim": dim}
        ).collect()
    }
    # fr: 0 fact rows (too_few); de: 4 (too_many); en: 2 (ok)
    assert got == {
        "fr": ("lang.cardinality", "too_few: 0 rows"),
        "de": ("lang.cardinality", "too_many: 4 rows"),
    }


def test_operator_noop_without_bounds(spark, fact, dim):
    assert (
        cardinality_violations(
            fact, _spec(None, None), {"lang_dim": dim}
        ).count() == 0
    )


def test_runner_verdict_and_table_attribution(spark, fact, dim):
    res = ValidationRun(
        spark, _spec(1, 3), {"lang_dim": dim}, None, RunConfig()
    ).run(fact)
    assert "cardinality" in res.checks_run
    assert res.exit_code == 1
    rows = [
        r for r in res.violations.collect()
        if r["constraint_id"] == "lang.cardinality"
    ]
    assert len(rows) == 2
    # clean bounds -> class passes (null lang rows don't count)
    res2 = ValidationRun(
        spark, _spec(0, 4), {"lang_dim": dim}, None, RunConfig()
    ).run(fact)
    assert all(
        r["constraint_id"] != "lang.cardinality"
        for r in res2.violations.collect()
    )


def test_runner_skips_class_without_bounds(spark, fact, dim):
    res = ValidationRun(
        spark, _spec(None, None), {"lang_dim": dim}, None, RunConfig()
    ).run(fact)
    assert "cardinality" not in res.checks_run


def test_checkpoint_run_matches_plain(spark, fact, dim, tmp_path):
    spec = _spec(1, 3)
    plain = ValidationRun(
        spark, spec, {"lang_dim": dim}, None, RunConfig()
    ).run(fact)
    ck = ValidationRun(
        spark, spec, {"lang_dim": dim}, None,
        RunConfig(checkpoint_dir=str(tmp_path / "ck")),
    ).run(fact)
    assert ck.exit_code == plain.exit_code == 1
    want = sorted(
        (r["url"], r["observed"])
        for r in plain.violations.collect()
        if r["constraint_id"] == "lang.cardinality"
    )
    got = sorted(
        (r["url"], r["observed"])
        for r in ck.violations.collect()
        if r["constraint_id"] == "lang.cardinality"
    )
    assert got == want


def test_cli_check_selection_accepts_cardinality(spark, fact, dim,
                                                 tmp_path):
    from py_schemax_spark.cli import main

    src = str(tmp_path / "fact")
    fact.write.parquet(src)
    dimp = str(tmp_path / "dim")
    dim.write.parquet(dimp)
    specf = tmp_path / "spec.yaml"
    specf.write_text(
        "fqn: t.pages\nkey: url\ncolumns:\n"
        "  - {name: url, type: string, nullable: false}\n"
        "  - name: lang\n    type: string\n"
        "    references: {table: lang_dim, column: lang,"
        " min_rows: 1, max_rows: 3}\n"
    )
    rc = main(
        ["validate", src, "--spec", str(specf),
         "--dim", f"lang_dim={dimp}", "--check", "cardinality"],
        spark=spark,
    )
    assert rc == 1
