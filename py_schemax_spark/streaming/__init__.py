from py_schemax_spark.streaming.validate_stream import (
    stream_row_violations,
    windowed_violation_counts,
)

__all__ = ["stream_row_violations", "windowed_violation_counts"]
