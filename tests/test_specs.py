"""Spec loader + validation tests — the analogue of the reference's
tests/test_validator.py:15-85 (file errors) and
tests/test_pydantic_schema.py (model shape, defaults, union membership,
extra-field rejection). No Spark needed."""

import json

import pytest

from py_schemax_spark.specs.loader import load_spec, validate_spec_dict
from py_schemax_spark.specs.model import SUPPORTED_TYPES, merge_results


def _err_types(res):
    return {e.type for e in res.errors}


def _err_at(res, typ):
    return [e.error_at for e in res.errors if e.type == typ]


# --- file-level errors (reference validator.py:33-90) ----------------------


def test_file_not_found(tmp_path):
    res = load_spec(str(tmp_path / "missing.json"))
    assert not res.valid
    assert res.error_count == 1
    assert res.errors[0].type == "file_not_found"
    assert res.errors[0].error_at == "$"


def test_unsupported_format(tmp_path):
    p = tmp_path / "spec.txt"
    p.write_text("whatever")
    res = load_spec(str(p))
    assert not res.valid
    assert res.errors[0].type == "unsupported_format"


def test_parse_error_json(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text("{not json")
    res = load_spec(str(p))
    assert not res.valid
    assert res.errors[0].type == "parse_error"


def test_parse_error_yaml(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("a: [unclosed")
    res = load_spec(str(p))
    assert not res.valid
    assert res.errors[0].type == "parse_error"


def test_loads_valid_json_and_yaml(tmp_path):
    doc = {
        "fqn": "db.t",
        "columns": [{"name": "a", "type": "string", "min_length": 1}],
    }
    pj = tmp_path / "s.json"
    pj.write_text(json.dumps(doc))
    res = load_spec(str(pj))
    assert res.valid and res.spec.fqn == "db.t"

    py = tmp_path / "s.yaml"
    py.write_text("fqn: db.t\ncolumns:\n  - name: a\n    type: string\n")
    res2 = load_spec(str(py))
    assert res2.valid and res2.spec.columns[0].name == "a"


# --- structural validation (reference test_validator.py:88-351) -----------


def test_missing_required_top_level():
    res = validate_spec_dict({"columns": []})
    assert not res.valid
    assert "missing" in _err_types(res)
    assert "$.fqn" in _err_at(res, "missing")


def test_extra_forbidden_top_level():
    res = validate_spec_dict({"fqn": "x", "columns": [], "bogus": 1})
    assert "extra_forbidden" in _err_types(res)
    assert "$.bogus" in _err_at(res, "extra_forbidden")


def test_unknown_column_type_is_union_tag_invalid():
    res = validate_spec_dict(
        {"fqn": "x", "columns": [{"name": "a", "type": "decimal"}]}
    )
    assert "union_tag_invalid" in _err_types(res)
    assert "$.columns[0].type" in _err_at(res, "union_tag_invalid")
    # message lists the allowed tags (reference validator.py:170-176)
    msg = [e.message for e in res.errors if e.type == "union_tag_invalid"][0]
    for t in SUPPORTED_TYPES:
        assert t in msg


def test_missing_type_is_union_tag_not_found():
    res = validate_spec_dict({"fqn": "x", "columns": [{"name": "a"}]})
    assert "union_tag_not_found" in _err_types(res)


def test_per_type_attr_rejection():
    # integer column with string-only attr `pattern` → extra_forbidden
    res = validate_spec_dict(
        {"fqn": "x", "columns": [{"name": "a", "type": "integer",
                                  "pattern": "x"}]}
    )
    assert "extra_forbidden" in _err_types(res)
    assert "$.columns[0].pattern" in _err_at(res, "extra_forbidden")


def test_wrong_value_types_collected_not_first_error():
    res = validate_spec_dict(
        {
            "fqn": "x",
            "columns": [
                {"name": "a", "type": "string", "min_length": "three",
                 "nullable": "yes"}
            ],
        }
    )
    # BOTH errors collected (whole-document error collection,
    # reference validator.py:106)
    assert "int_parsing" in _err_types(res)
    assert "bool_type" in _err_types(res)


def test_all_six_types_accepted():
    cols = [{"name": f"c_{t}", "type": t} for t in SUPPORTED_TYPES]
    res = validate_spec_dict({"fqn": "x", "columns": cols})
    assert res.valid
    assert len(res.spec.columns) == 6


def test_defaults_mirror_reference():
    # nullable default True, unique/primary_key default False
    # (reference models.py:12-20)
    res = validate_spec_dict(
        {"fqn": "x", "columns": [{"name": "a", "type": "string"}]}
    )
    c = res.spec.columns[0]
    assert c.nullable is True and c.unique is False and c.primary_key is False


def test_dynamic_required_attributes():
    # the reference's runtime tightening (model.py:30-112): description
    # becomes required per config
    doc = {"fqn": "x", "columns": [{"name": "a", "type": "string"}]}
    ok = validate_spec_dict(doc)
    assert ok.valid
    tightened = validate_spec_dict(
        doc, column_required_attributes=["description"]
    )
    assert not tightened.valid
    assert "$.columns[0].description" in _err_at(tightened, "missing")


def test_top_level_required_attributes():
    doc = {"fqn": "x", "columns": [{"name": "a", "type": "string"}]}
    tightened = validate_spec_dict(doc, required_attributes=["version"])
    assert not tightened.valid
    assert "$.version" in _err_at(tightened, "missing")


def test_merge_results_semantics():
    # AND of valid, concat errors, first non-empty path
    # (reference utils.py:21-41)
    a = validate_spec_dict({"fqn": "x", "columns": []}, file_path="a.json")
    b = validate_spec_dict({"columns": []}, file_path="b.json")
    m = merge_results(a, b)
    assert m.file_path == "a.json"
    assert not m.valid
    assert m.error_count == b.error_count


def test_references_and_drift_parsed():
    res = validate_spec_dict(
        {
            "fqn": "x",
            "columns": [
                {"name": "lang", "type": "string",
                 "references": {"table": "lang_dim", "column": "lang"}},
                {"name": "text", "type": "string",
                 "drift": {"on": "length", "psi_threshold": 0.3}},
            ],
        }
    )
    assert res.valid
    assert res.spec.columns[0].references.table == "lang_dim"
    assert res.spec.columns[1].drift.on == "length"
    assert res.spec.columns[1].drift.psi_threshold == 0.3
    assert res.spec.columns[1].drift.ks_threshold == 0.1  # default


# --- spec evolution diff -----------------------------------------------------


def _ts(cols, version=None):
    res = validate_spec_dict(
        {"fqn": "t", "version": version, "columns": cols}
    )
    assert res.valid, res.errors
    return res.spec


def test_spec_diff_classifies_breaking_vs_compatible():
    from py_schemax_spark.specs.diff import spec_diff

    old = _ts(
        [
            {"name": "url", "type": "string", "min_length": 5,
             "max_length": 100, "nullable": False},
            {"name": "lang", "type": "string"},
            {"name": "score", "type": "integer", "minimum": 0},
            {"name": "gone", "type": "string"},
        ],
        version="1",
    )
    new = _ts(
        [
            # tightened min_length (breaking), loosened max (ok)
            {"name": "url", "type": "string", "min_length": 10,
             "max_length": 200, "nullable": False},
            # tightened: now non-nullable + unique
            {"name": "lang", "type": "string", "nullable": False,
             "unique": True},
            # loosened minimum, type changed (breaking)
            {"name": "score", "type": "float", "minimum": -5},
            # added nullable (ok) / added non-nullable (breaking)
            {"name": "extra_ok", "type": "string"},
            {"name": "extra_req", "type": "string", "nullable": False},
        ],
        version="2",
    )
    changes = spec_diff(old, new)
    by_at = {}
    for c in changes:
        by_at.setdefault(c["error_at"], []).append(c)

    assert by_at["$.url.min_length"][0]["breaking"] is True
    assert by_at["$.url.max_length"][0]["breaking"] is False
    assert by_at["$.lang.nullable"][0]["breaking"] is True
    assert by_at["$.lang.unique"][0]["breaking"] is True
    assert by_at["$.score.type"][0]["type"] == "type_changed"
    assert by_at["$.score.minimum"][0]["breaking"] is False
    assert by_at["$.extra_ok"][0]["breaking"] is False
    assert by_at["$.extra_req"][0]["breaking"] is True
    assert by_at["$.gone"][0]["type"] == "column_removed"
    assert by_at["$.gone"][0]["breaking"] is True
    # breaking changes sort first
    flags = [c["breaking"] for c in changes]
    assert flags == sorted(flags, reverse=True)


def test_spec_diff_identical_specs_empty():
    from py_schemax_spark.specs.diff import spec_diff

    s = _ts([{"name": "a", "type": "string", "pattern": "^x"}])
    assert spec_diff(s, s) == []


def test_cli_diff_subcommand(tmp_path, capsys):
    from py_schemax_spark.cli import main

    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps({
        "fqn": "t", "version": "1",
        "columns": [{"name": "url", "type": "string"}],
    }))
    new.write_text(json.dumps({
        "fqn": "t", "version": "2",
        "columns": [{"name": "url", "type": "string", "nullable": False}],
    }))
    code = main(["diff", str(old), str(new)])
    out = capsys.readouterr().out
    assert code == 1
    assert "❌ $.url.nullable" in out
    assert "1 breaking" in out

    code = main(["diff", str(old), str(old)])
    assert code == 0
    assert "0 breaking" in capsys.readouterr().out

    code = main(["diff", str(old), str(tmp_path / "missing.json")])
    assert code == 2
