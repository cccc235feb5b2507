from py_schemax_spark.functions.extraction import (
    extract_text_py,
    extract_text_udf,
    render_html_expr,
)

__all__ = ["extract_text_py", "extract_text_udf", "render_html_expr"]
