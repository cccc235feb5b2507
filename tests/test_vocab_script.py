"""Corpus vocabulary report (textstats.vocab_stats), Unicode script
mix (textstats.script_profile), and spec inference
(profile.infer_spec + `profile --emit-spec`)."""

from __future__ import annotations

import pytest

from py_schemax_spark.operators.textstats import (
    script_profile,
    vocab_stats,
)


def test_vocab_stats_hand_computed(spark):
    # tokens: the(3) cat(2) sat(1) on(1) mat(1)  → 8 tokens, 5 types,
    # 3 hapax, max cnt 3
    df = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "THE cat\ton the"),
            (2, "mat"),
            (3, None),
            (4, "   "),
        ],
        schema="doc_id long, text string",
    )
    r = vocab_stats(df).collect()[0]
    assert r["n_tokens"] == 8
    assert r["n_types"] == 5
    assert r["n_hapax"] == 3
    assert r["max_type_cnt"] == 3
    assert r["ttr_bp"] == (5 * 10000) // 8
    assert r["hapax_bp"] == (3 * 10000) // 5
    assert r["top_share_bp"] == (3 * 10000) // 8


def test_vocab_stats_python_twin_on_corpus(spark, sf_dir="/root/testdata/sf0.001"):
    import re
    from collections import Counter

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = vocab_stats(df).collect()[0]
    counts = Counter()
    for row in df.select("text").collect():
        if row["text"] is None:
            continue
        for t in re.split(r"[ \t\n\r\f]+", row["text"].lower()):
            if t:
                counts[t] += 1
    assert r["n_tokens"] == sum(counts.values())
    assert r["n_types"] == len(counts)
    assert r["n_hapax"] == sum(1 for c in counts.values() if c == 1)
    assert r["max_type_cnt"] == max(counts.values())


def test_script_profile_dominant_and_mixed(spark):
    rows = [
        (0, "pure latin text here"),
        (1, "привет мир"),
        (2, "hello 你好世界吗吗"),  # 5 latin vs 6 cjk
        (3, None),
        (4, "12345 .,;!"),
        (5, "ab аб"),  # tie 2 latin / 2 cyrillic
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[0]["dominant"] == "latin" and not out[0]["mixed"]
    assert out[1]["dominant"] == "cyrillic" and not out[1]["mixed"]
    assert out[2]["dominant"] == "cjk" and out[2]["mixed"]
    assert out[2]["n_latin"] == 5 and out[2]["n_cjk"] == 6
    assert out[3]["n_scripted"] == 0 and out[3]["dominant"] is None
    assert not out[3]["mixed"]
    assert out[4]["dominant"] is None  # digits/punct are unscripted
    # count tie: first declared class (latin) wins — the oracle's CASE
    # chain ordering
    assert out[5]["dominant"] == "latin" and out[5]["mixed"]


def test_script_profile_zero_exchanges(spark):
    df = spark.createDataFrame(
        [(0, "x")], schema="doc_id long, text string"
    )
    plan = (
        script_profile(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# spec inference


def _mk_table(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.5, True, None),
            (2, "beta", -3.25, False, "x"),
            (3, None, 99.0, True, "y"),
        ],
        schema=(
            "id long, name string, score double, flag boolean, "
            "opt string"
        ),
    )


def test_infer_spec_closure_table_passes_its_own_spec(spark):
    from py_schemax_spark.operators.profile import (
        infer_spec,
        profile_table,
    )
    from py_schemax_spark.operators.violations import row_violations
    from py_schemax_spark.specs.loader import validate_spec_dict

    df = _mk_table(spark)
    prof = profile_table(df, key_col="id")
    draft = infer_spec(prof, fqn="t.inferred", key="id")
    res = validate_spec_dict(draft)
    assert res.valid, res.errors
    spec = res.spec
    # observational floor: the profiled table always passes it
    assert row_violations(df, spec).count() == 0

    cols = {c["name"]: c for c in draft["columns"]}
    assert cols["id"]["type"] == "integer"
    assert cols["id"]["minimum"] == 1 and cols["id"]["maximum"] == 3
    assert cols["id"]["nullable"] is False
    assert cols["name"]["nullable"] is True  # a null was observed
    assert cols["score"]["type"] == "float"
    assert cols["score"]["minimum"] == -3.25
    assert cols["flag"]["type"] == "boolean"
    assert draft["key"] == "id"


def test_infer_spec_skips_unmappable_types(spark):
    from py_schemax_spark.operators.profile import infer_spec

    prof = {
        "n_rows": 1,
        "columns": {
            "ok": {"type": "string", "null_count": 0,
                   "min": "a", "max": "b", "heavy_hitters": []},
            "arr": {"type": "array<string>", "null_count": 0,
                    "min": None, "max": None, "heavy_hitters": []},
        },
    }
    draft = infer_spec(prof, fqn="t.x")
    names = [c["name"] for c in draft["columns"]]
    assert names == ["ok"]
    assert draft["metadata"]["skipped_columns"] == [
        {"name": "arr", "type": "array<string>"}
    ]


def test_profile_cli_emit_spec_and_sketch_mode(spark, tmp_path):
    import yaml

    from py_schemax_spark.cli import main
    from py_schemax_spark.specs.loader import load_spec

    table = str(tmp_path / "t.parquet")
    _mk_table(spark).write.parquet(table)
    spec_path = str(tmp_path / "draft.yaml")
    code = main(
        [
            "profile", table, "--key-col", "id",
            "--emit-spec", spec_path, "--fqn", "t.cli",
            "--hh-mode", "sketch",
        ],
        spark=spark,
    )
    assert code == 0
    with open(spec_path, encoding="utf-8") as fh:
        draft = yaml.safe_load(fh)
    assert draft["fqn"] == "t.cli" and draft["key"] == "id"
    res = load_spec(spec_path)
    assert res.valid, res.errors


def test_emit_spec_column_subset_still_passes_schema(spark, tmp_path):
    """--columns subset: unprofiled table columns must be DECLARED
    (permissive type-only entries) — schema conformance is
    extra="forbid", so the closure property (a table passes the spec
    inferred from itself) must hold for any column selection."""
    import yaml

    from py_schemax_spark.cli import main
    from py_schemax_spark.plans.compiler import schema_conformance
    from py_schemax_spark.specs.loader import load_spec

    table = str(tmp_path / "t.parquet")
    df = _mk_table(spark)
    df.write.parquet(table)
    spec_path = str(tmp_path / "subset.yaml")
    code = main(
        [
            "profile", table, "--columns", "id,name",
            "--emit-spec", spec_path, "--fqn", "t.subset",
        ],
        spark=spark,
    )
    assert code == 0
    res = load_spec(spec_path)
    assert res.valid, res.errors
    # every table column is declared; unprofiled ones are permissive
    with open(spec_path, encoding="utf-8") as fh:
        draft = yaml.safe_load(fh)
    cols = {c["name"]: c for c in draft["columns"]}
    assert set(cols) == {"id", "name", "score", "flag", "opt"}
    assert cols["score"] == {
        "name": "score", "type": "float", "nullable": True,
    }
    assert "minimum" not in cols["score"]
    errs = schema_conformance(df, res.spec)
    assert errs == [], errs


def test_profile_table_sketch_mode_matches_exact(spark):
    from py_schemax_spark.operators.profile import profile_table

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = profile_table(df, columns=["lang"], hh_k=5, hh_mode="exact")
    b = profile_table(df, columns=["lang"], hh_k=5, hh_mode="sketch")
    assert a["columns"]["lang"]["heavy_hitters"] == (
        b["columns"]["lang"]["heavy_hitters"]
    )
    with pytest.raises(ValueError):
        profile_table(df, columns=["lang"], hh_mode="bogus")
