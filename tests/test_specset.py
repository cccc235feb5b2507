"""Cross-spec validators (V3 metadata-level, V4 existence, V5 cycles)
and the check-specs CLI — the analogue of the reference's FQN tests
(tests/test_validator.py:353-416) and dependency tests (419-548)."""

from __future__ import annotations

import json

import pytest

from py_schemax_spark.cli import main
from py_schemax_spark.specs.depgraph import SpecSetValidator
from py_schemax_spark.specs.loader import load_spec


def _write(tmp_path, name, doc):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def _basic(fqn, **extra):
    return {"fqn": fqn, "columns": [{"name": "a", "type": "string"}], **extra}


def test_duplicate_fqn_first_wins(tmp_path):
    a = _write(tmp_path, "a.json", _basic("db.t"))
    b = _write(tmp_path, "b.json", _basic("db.t"))
    v = SpecSetValidator()
    ra = v.validate_unique_fqn(load_spec(a))
    rb = v.validate_unique_fqn(load_spec(b))
    assert ra.valid
    assert not rb.valid
    assert rb.errors[0].type == "duplicate_fqn"
    assert "a.json" in rb.errors[0].message  # points at the first file


def test_dependency_existence(tmp_path):
    a = _write(tmp_path, "a.json", _basic("db.a"))
    b = _write(
        tmp_path, "b.json",
        _basic("db.b", depends_on=[a, str(tmp_path / "missing.json")]),
    )
    v = SpecSetValidator()
    rb = v.validate_dependencies(load_spec(b))
    assert not rb.valid
    assert rb.errors[0].type == "file_not_found"
    assert rb.errors[0].error_at == "$.depends_on[1]"


def test_cycle_detection(tmp_path):
    # a -> b -> c -> a (the reference's deliberate cycle fixture,
    # tests/fixtures/dependent_schemas/invalid_dependency_c.yaml)
    a_path = str(tmp_path / "a.json")
    b_path = str(tmp_path / "b.json")
    c_path = str(tmp_path / "c.json")
    _write(tmp_path, "a.json", _basic("db.a", depends_on=[b_path]))
    _write(tmp_path, "b.json", _basic("db.b", depends_on=[c_path]))
    _write(tmp_path, "c.json", _basic("db.c", depends_on=[a_path]))
    v = SpecSetValidator()
    for p in (a_path, b_path, c_path):
        v.validate_dependencies(load_spec(p))
    errs = v.validate_no_cycles()
    assert len(errs) == 1
    assert errs[0].type == "circular_dependency"


def test_no_cycle_when_acyclic(tmp_path):
    a = _write(tmp_path, "a.json", _basic("db.a"))
    b = _write(tmp_path, "b.json", _basic("db.b", depends_on=[a]))
    v = SpecSetValidator()
    v.validate_dependencies(load_spec(a))
    v.validate_dependencies(load_spec(b))
    assert v.validate_no_cycles() == []


# --- check-specs CLI (no Spark needed) -------------------------------------


def test_check_specs_cli_valid_and_invalid(tmp_path, capsys):
    good = _write(tmp_path, "good.json", _basic("db.good"))
    bad = _write(tmp_path, "bad.json",
                 {"fqn": "db.bad", "columns": [{"name": "x", "type": "nope"}]})
    assert main(["check-specs", good]) == 0
    assert main(["check-specs", good, bad]) == 1
    out = capsys.readouterr().out
    assert "❌" in out and "bad.json" in out


def test_check_specs_cli_json_and_fail_never(tmp_path, capsys):
    bad = _write(tmp_path, "bad.json", {"columns": []})
    code = main(["check-specs", bad, "--output-format", "json",
                 "--fail-never"])
    assert code == 0
    out_lines = [
        json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln
    ]
    assert out_lines[0]["valid"] is False
    assert out_lines[0]["error_count"] >= 1


def test_check_specs_cli_fail_fast_stops(tmp_path, capsys):
    bad = _write(tmp_path, "bad.json", {"columns": []})
    good = _write(tmp_path, "good.json", _basic("db.good"))
    code = main(["check-specs", bad, good, "--fail-fast", "--verbose"])
    assert code == 1
    out = capsys.readouterr().out
    assert "good.json" not in out  # never reached


def test_check_specs_cli_detects_cycle(tmp_path, capsys):
    a_path = str(tmp_path / "a.json")
    b_path = str(tmp_path / "b.json")
    _write(tmp_path, "a.json", _basic("db.a", depends_on=[b_path]))
    _write(tmp_path, "b.json", _basic("db.b", depends_on=[a_path]))
    code = main(["check-specs", a_path, b_path])
    assert code == 1
    assert "Circular dependency" in capsys.readouterr().out


def test_check_specs_cli_verbose_shows_valid(tmp_path, capsys):
    good = _write(tmp_path, "good.json", _basic("db.good"))
    main(["check-specs", good, "--verbose"])
    assert "✅" in capsys.readouterr().out
