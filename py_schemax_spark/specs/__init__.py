from py_schemax_spark.specs.model import (
    ColumnSpec,
    ReferenceSpec,
    DriftSpec,
    TableSpec,
    SUPPORTED_TYPES,
    SpecError,
    SpecValidationResult,
)
from py_schemax_spark.specs.loader import load_spec, validate_spec_dict

__all__ = [
    "ColumnSpec",
    "ReferenceSpec",
    "DriftSpec",
    "TableSpec",
    "SUPPORTED_TYPES",
    "SpecError",
    "SpecValidationResult",
    "load_spec",
    "validate_spec_dict",
]
