"""Spec-file loading + validation.

Re-implements the reference's file-validation surface at the spec level:

- existence check → ``file_not_found`` (reference validator.py:36-49)
- suffix dispatch json/yaml → ``unsupported_format`` (validator.py:51-70);
  we additionally accept TOML (the reference consumes TOML for config,
  config.py:187-217, so the parser is in-vocabulary)
- parse failure → ``parse_error`` (validator.py:71-84)
- structural validation of the parsed dict against the constraint
  vocabulary with ALL errors collected (not first-error), JSONPath
  locations (validator.py:130-142) and human messages
  (validator.py:144-180)

The "dynamic required attributes" feature (reference model.py:30-112,
config.py:152-184): pass ``required_attributes`` /
``column_required_attributes`` to tighten which keys must be present —
resolved here at load time instead of rebuilding Pydantic models.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Iterable, Optional

from py_schemax_spark.specs.model import (
    COMMON_ATTRS,
    EXT_ATTRS,
    SUPPORTED_TYPES,
    TYPE_ATTRS,
    CheckSpec,
    ColumnSpec,
    DriftSpec,
    ExtractionSpec,
    ReferenceSpec,
    SpecError,
    SpecValidationResult,
    TableSpec,
)

try:  # PyYAML ships with pyspark environments; gate anyway
    import yaml

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False

try:
    import tomllib  # py311+

    _HAVE_TOML = True
except ImportError:  # pragma: no cover
    _HAVE_TOML = False


# --- message rewriting (analogue of validator.py:144-180) -------------

_NUMERIC_FIELDS = {"min_length", "max_length", "minimum", "maximum", "precision"}
_STR_FIELDS = {"name", "description", "pattern", "format", "timezone", "fqn",
               "version"}
_BOOL_FIELDS = {"unique", "primary_key", "nullable"}

_CHECK_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.-]*$")


def _msg_missing(key: str) -> str:
    return f"Field '{key}' is required but missing."


def _msg_extra(key: str) -> str:
    return f"Field '{key}' is not allowed here."


def _msg_type(key: str, expected: str) -> str:
    return f"Field '{key}' must be of type '{expected}'."


def _msg_bad_tag(value: Any) -> str:
    return (
        f"'{value}' is not a supported type, should be one of "
        f"{list(SUPPORTED_TYPES)}."
    )


# --- structural validation ---------------------------------------------


def validate_spec_dict(
    data: Any,
    file_path: str = "<dict>",
    required_attributes: Iterable[str] = (),
    column_required_attributes: Iterable[str] = (),
) -> SpecValidationResult:
    """Validate a parsed spec document against the constraint vocabulary.

    Collects ALL errors (like Pydantic's e.errors() at the reference's
    validator.py:106,117), with JSONPath ``error_at`` locations in the
    reference's format (``$.columns[0].pattern``, validator.py:130-142)
    and rejects unknown keys (extra="forbid", models.py:7,113).
    """
    errors: list[SpecError] = []
    req_top = set(required_attributes)
    req_col = set(column_required_attributes)

    if not isinstance(data, dict):
        return SpecValidationResult(
            file_path=file_path,
            valid=False,
            errors=(SpecError("model_type", "$", "Spec document must be a mapping."),),
        )

    top_allowed = {
        "fqn", "name", "description", "version", "columns", "metadata",
        "tags", "depends_on", "dependents", "key", "extraction",
        "checks",
    }
    for k in data:
        if k not in top_allowed:
            errors.append(SpecError("extra_forbidden", f"$.{k}", _msg_extra(k)))
    for k in {"fqn", "columns"} | req_top:
        if k not in data:
            errors.append(SpecError("missing", f"$.{k}", _msg_missing(k)))

    for k in ("fqn", "name", "description", "version"):
        if k in data and data[k] is not None and not isinstance(data[k], str):
            errors.append(SpecError("string_type", f"$.{k}", _msg_type(k, "string")))
    for k in ("tags", "depends_on", "dependents"):
        if k in data and data[k] is not None:
            v = data[k]
            if not isinstance(v, list) or not all(isinstance(x, str) for x in v):
                errors.append(
                    SpecError("list_type", f"$.{k}", _msg_type(k, "list[string]"))
                )

    columns: list[ColumnSpec] = []
    raw_cols = data.get("columns")
    if raw_cols is not None and not isinstance(raw_cols, list):
        errors.append(
            SpecError("list_type", "$.columns", _msg_type("columns", "list"))
        )
        raw_cols = []
    for i, col in enumerate(raw_cols or []):
        loc = f"$.columns[{i}]"
        if not isinstance(col, dict):
            errors.append(SpecError("model_type", loc, "Column must be a mapping."))
            continue
        ctype = col.get("type")
        if ctype is None:
            errors.append(
                SpecError("union_tag_not_found", f"{loc}.type", _msg_missing("type"))
            )
            continue
        if ctype not in SUPPORTED_TYPES and ctype != "binary":
            errors.append(
                SpecError("union_tag_invalid", f"{loc}.type", _msg_bad_tag(ctype))
            )
            continue
        allowed = COMMON_ATTRS | TYPE_ATTRS[ctype] | EXT_ATTRS
        col_errs = len(errors)
        for k in col:
            if k not in allowed:
                errors.append(
                    SpecError("extra_forbidden", f"{loc}.{k}", _msg_extra(k))
                )
        for k in {"name"} | (req_col & allowed):
            if k not in col:
                errors.append(SpecError("missing", f"{loc}.{k}", _msg_missing(k)))
        for k, v in col.items():
            if v is None or k in ("type", "references", "drift", "required"):
                continue
            if k in _NUMERIC_FIELDS and not isinstance(v, (int, float)):
                errors.append(
                    SpecError("int_parsing", f"{loc}.{k}", _msg_type(k, "number"))
                )
            elif k in _STR_FIELDS and not isinstance(v, str):
                errors.append(
                    SpecError("string_type", f"{loc}.{k}", _msg_type(k, "string"))
                )
            elif k in _BOOL_FIELDS and not isinstance(v, bool):
                errors.append(
                    SpecError("bool_type", f"{loc}.{k}", _msg_type(k, "boolean"))
                )
        ref = col.get("references")
        if ref is not None and (
            not isinstance(ref, dict) or "table" not in ref or "column" not in ref
        ):
            errors.append(
                SpecError(
                    "model_type",
                    f"{loc}.references",
                    "Field 'references' must be a mapping with 'table' and 'column'.",
                )
            )
            ref = None
        if ref is not None:
            mn, mx = ref.get("min_rows"), ref.get("max_rows")
            bad_bound = any(
                v is not None and (not isinstance(v, int)
                                   or isinstance(v, bool) or v < 0)
                for v in (mn, mx)
            )
            if bad_bound or (
                mn is not None and mx is not None and mx < mn
            ):
                errors.append(
                    SpecError(
                        "model_type",
                        f"{loc}.references",
                        "Fields 'min_rows'/'max_rows' must be "
                        "non-negative integers with max_rows >= "
                        "min_rows.",
                    )
                )
                ref = None
        drift = col.get("drift")
        if drift is not None and not isinstance(drift, dict):
            errors.append(
                SpecError("model_type", f"{loc}.drift", _msg_type("drift", "mapping"))
            )
            drift = None
        if len(errors) > col_errs:
            continue
        if "name" not in col:
            continue
        columns.append(
            ColumnSpec(
                name=col["name"],
                type=ctype,
                nullable=col.get("nullable", True),
                unique=col.get("unique", False),
                primary_key=col.get("primary_key", False),
                description=col.get("description"),
                min_length=col.get("min_length"),
                max_length=col.get("max_length"),
                pattern=col.get("pattern"),
                minimum=col.get("minimum"),
                maximum=col.get("maximum"),
                precision=col.get("precision"),
                format=col.get("format"),
                timezone=col.get("timezone"),
                references=ReferenceSpec(
                    ref["table"], ref["column"],
                    min_rows=ref.get("min_rows"),
                    max_rows=ref.get("max_rows"),
                ) if ref else None,
                drift=DriftSpec(
                    on=drift.get("on", "value"),
                    psi_threshold=drift.get("psi_threshold", 0.2),
                    ks_threshold=drift.get("ks_threshold", 0.1),
                )
                if drift is not None
                else None,
            )
        )

    extraction = data.get("extraction")
    if extraction is not None and not isinstance(extraction, dict):
        errors.append(
            SpecError("model_type", "$.extraction",
                      _msg_type("extraction", "mapping"))
        )
        extraction = None

    checks: list[CheckSpec] = []
    raw_checks = data.get("checks")
    if raw_checks is not None and not isinstance(raw_checks, list):
        errors.append(
            SpecError("list_type", "$.checks", _msg_type("checks", "list"))
        )
        raw_checks = []
    seen_check_names: set[str] = set()
    for i, chk in enumerate(raw_checks or []):
        loc = f"$.checks[{i}]"
        if not isinstance(chk, dict):
            errors.append(
                SpecError("model_type", loc, "Check must be a mapping.")
            )
            continue
        n_before = len(errors)
        for k in chk:
            if k not in ("name", "when", "expect"):
                errors.append(
                    SpecError("extra_forbidden", f"{loc}.{k}", _msg_extra(k))
                )
        for k in ("name", "expect"):
            if k not in chk or chk[k] is None:
                errors.append(
                    SpecError("missing", f"{loc}.{k}", _msg_missing(k))
                )
        for k in ("name", "when", "expect"):
            if chk.get(k) is not None and not isinstance(chk[k], str):
                errors.append(
                    SpecError("string_type", f"{loc}.{k}",
                              _msg_type(k, "string"))
                )
        name = chk.get("name")
        if isinstance(name, str) and not _CHECK_NAME_RE.match(name):
            errors.append(
                SpecError(
                    "string_pattern_mismatch", f"{loc}.name",
                    "Check name must match [A-Za-z_][A-Za-z0-9_.-]* "
                    "(it becomes the constraint_id 'check.<name>').",
                )
            )
        elif isinstance(name, str) and name in seen_check_names:
            errors.append(
                SpecError(
                    "value_error", f"{loc}.name",
                    f"Duplicate check name '{name}' "
                    "(constraint_ids must be unique).",
                )
            )
        if len(errors) > n_before:
            continue
        seen_check_names.add(name)
        checks.append(
            CheckSpec(name=name, expect=chk["expect"], when=chk.get("when"))
        )

    if errors:
        return SpecValidationResult(
            file_path=file_path, valid=False, errors=tuple(errors)
        )
    spec = TableSpec(
        fqn=data["fqn"],
        columns=tuple(columns),
        name=data.get("name"),
        description=data.get("description"),
        version=data.get("version"),
        metadata=data.get("metadata") or {},
        tags=tuple(data.get("tags") or ()),
        depends_on=tuple(data.get("depends_on") or ()),
        dependents=tuple(data.get("dependents") or ()),
        key=data.get("key"),
        extraction=ExtractionSpec(
            source=extraction.get("source", "html"),
            target=extraction.get("target", "text"),
        )
        if extraction is not None
        else None,
        checks=tuple(checks),
    )
    return SpecValidationResult(file_path=file_path, valid=True, spec=spec)


# --- file loading (S1-S7 analogues) -------------------------------------


def load_spec(
    path: str,
    required_attributes: Iterable[str] = (),
    column_required_attributes: Iterable[str] = (),
) -> SpecValidationResult:
    """Load + validate one spec file; never raises for user errors.

    Error taxonomy mirrors FileValidator (reference validator.py:33-90):
    file_not_found / unsupported_format / parse_error, each a single
    error record at ``$`` with valid=False.
    """
    p = Path(path)
    if not p.is_file():
        return SpecValidationResult(
            file_path=path,
            valid=False,
            errors=(
                SpecError("file_not_found", "$", f"File '{path}' does not exist."),
            ),
        )
    suffix = p.suffix.lower()
    try:
        if suffix == ".json":
            data = json.loads(p.read_text(encoding="utf-8"))
        elif suffix in (".yml", ".yaml") and _HAVE_YAML:
            data = yaml.safe_load(p.read_text(encoding="utf-8"))
        elif suffix == ".toml" and _HAVE_TOML:
            with open(p, "rb") as f:
                data = tomllib.load(f)
        else:
            return SpecValidationResult(
                file_path=path,
                valid=False,
                errors=(
                    SpecError(
                        "unsupported_format",
                        "$",
                        f"Unsupported file format '{suffix}', expected one of "
                        "['.json', '.yml', '.yaml', '.toml'].",
                    ),
                ),
            )
    except Exception as exc:  # json.JSONDecodeError / yaml.YAMLError / toml
        return SpecValidationResult(
            file_path=path,
            valid=False,
            errors=(
                SpecError("parse_error", "$", f"Failed to parse file: {exc}"),
            ),
        )
    return validate_spec_dict(
        data,
        file_path=path,
        required_attributes=required_attributes,
        column_required_attributes=column_required_attributes,
    )
