from py_schemax_spark.streaming.sessions_stream import stream_sessionize
from py_schemax_spark.streaming.validate_stream import (
    stream_row_violations,
    windowed_violation_counts,
)

__all__ = [
    "stream_row_violations",
    "stream_sessionize",
    "windowed_violation_counts",
]
