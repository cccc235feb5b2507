"""Deterministic ``pages`` table derived from the driver-provided
``documents`` parquet — the oracle-checkable twin of the synthetic
generator in ``datagen.py``.

Both this Spark derivation and the SQL CTE below (run by DuckDB on the
same parquet) produce IDENTICAL rows, which lets the driver's
correctness gate verify pages-shaped operators (extraction invariant,
row violations, uniqueness, referential) against an independent
engine. Shape per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang
string)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from py_schemax_spark.functions.extraction import render_html_expr

_EPOCH_2024 = 1704067200


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(_EPOCH_2024) + F.col("doc_id") * F.lit(97)
        ).alias("warc_ts"),
        render_html_expr(F.col("text")).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# DuckDB CTE producing the same pages (html kept as VARCHAR — DuckDB
# string ops; byte content identical since text is UTF-8 both sides).
PAGES_SQL_CTE = """
pages AS (
  SELECT
    'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
    TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 97 SECOND AS warc_ts,
    '<html><head><title>d</title></head><body><article>'
      || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
      || '</article></body></html>' AS html_str,
    text,
    lang
  FROM documents
)
"""

# inverse of the template, as DuckDB SQL over html_str
EXTRACT_SQL = (
    "replace(replace(replace("
    "substr(html_str, 51, length(html_str) - 50 - 24)"
    ", '&gt;', '>'), '&lt;', '<'), '&amp;', '&')"
)
