from py_schemax_spark.plans.compiler import (
    RowConstraint,
    compile_row_constraints,
    violation_struct_array,
)

__all__ = ["RowConstraint", "compile_row_constraints", "violation_struct_array"]
