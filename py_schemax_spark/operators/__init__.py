from py_schemax_spark.operators.violations import (
    row_violations,
    VIOLATION_COLUMNS,
)
from py_schemax_spark.operators.uniqueness import (
    duplicate_keys,
    uniqueness_violations,
)
from py_schemax_spark.operators.referential import referential_violations
from py_schemax_spark.operators.stats import column_stats

__all__ = [
    "row_violations",
    "VIOLATION_COLUMNS",
    "duplicate_keys",
    "uniqueness_violations",
    "referential_violations",
    "column_stats",
]
