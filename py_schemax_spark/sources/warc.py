"""WARC source/sink — the Common-Crawl container format.

The north star's input is "an Iceberg table of Common-Crawl-style web
pages"; this module covers the step BEFORE that table exists: reading
raw WARC/WET files distributed, with no per-row Python. Record
splitting rides Spark's text datasource with a multi-character
``lineSep`` (which becomes Hadoop's ``textinputformat.record.delimiter``
— files split at block boundaries and records reassemble across
splits, so a 100-GB WARC file parallelizes like any text file).
Header fields and payloads are extracted with codegen'd JVM
expressions (``regexp_extract`` / binary ``substring``).

Framing contract:

- records are split on ``\\r\\n\\r\\nWARC/1.0\\r\\n`` (end-of-block
  CRLFCRLF + the next record's version line) — a payload that contains
  a bare ``WARC/1.0`` does NOT break framing, only the full 4+10-byte
  sequence does;
- the payload is sliced to EXACTLY ``Content-Length`` BYTES (binary
  substring over the UTF-8 encoding — WARC lengths are bytes, and the
  corpus contains multibyte text), so trailing record framing never
  leaks into the payload;
- ``parse_ok`` is false when the record looks mis-framed (no
  Content-Length, or leftover bytes beyond the declared length — the
  signature of a payload that contained the delimiter). Mis-framed
  records surface as data violations downstream instead of silently
  corrupting neighbours; a recovering parser (warcio-style stateful
  scan via ``mapPartitions`` over raw bytes) is the escalation path if
  a real corpus ever needs it.

The writer emits WET-style ``conversion`` records (text payloads) and
is the round-trip twin used by tests: pages → WARC → pages is
byte-identical on (url, warc_ts, text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_DELIM = "\r\n\r\nWARC/1.0\r\n"


def _header(headers, name: str):
    """Value of one WARC/HTTP header line ('' when absent)."""
    return F.regexp_extract(headers, rf"(?m)^{name}: *([^\r\n]*)", 1)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC/WET files into
    ``(url, warc_ts, rec_type, record_id, content_type, content_length,
    payload, parse_ok)``. One row per record; header fields null when
    missing; ``payload`` is the Content-Length-sliced text (see module
    framing contract)."""
    raw = spark.read.option("lineSep", RECORD_DELIM).text(path)
    # the first record of each file carries its own version line (the
    # delimiter only consumes it for records 2..n)
    rec = raw.select(
        F.regexp_replace("value", r"\AWARC/1\.0\r\n", "").alias("rec")
    )
    headers = F.substring_index("rec", "\r\n\r\n", 1)
    parsed = rec.select(
        headers.alias("h"),
        # everything after the first CRLFCRLF, in BYTES (multibyte
        # text means char offsets != byte offsets)
        F.expr(
            "substring(encode(rec, 'UTF-8'), "
            "octet_length(substring_index(rec, '\r\n\r\n', 1)) + 5)"
        ).alias("body"),
    ).select(
        F.nullif(_header(F.col("h"), "WARC-Target-URI"), F.lit("")).alias(
            "url"
        ),
        # offset pattern X (matches the mandatory 'Z'), NOT a literal
        # 'Z': a quoted Z parses the wall time in the SESSION timezone,
        # shifting every warc_ts by the session offset on real
        # Common-Crawl files (WARC dates are UTC instants by spec)
        F.to_timestamp(
            F.nullif(_header(F.col("h"), "WARC-Date"), F.lit("")),
            "yyyy-MM-dd'T'HH:mm:ssX",
        ).alias("warc_ts"),
        F.nullif(_header(F.col("h"), "WARC-Type"), F.lit("")).alias(
            "rec_type"
        ),
        F.nullif(_header(F.col("h"), "WARC-Record-ID"), F.lit("")).alias(
            "record_id"
        ),
        F.nullif(_header(F.col("h"), "Content-Type"), F.lit("")).alias(
            "content_type"
        ),
        F.nullif(_header(F.col("h"), "Content-Length"), F.lit(""))
        .cast("bigint")
        .alias("content_length"),
        F.col("body"),
    )
    payload = F.decode(
        F.expr("substring(body, 1, content_length)"), "UTF-8"
    )
    # leftover beyond the declared length must be pure record framing
    # (CRLFs); anything else means the splitter cut inside a payload
    # that contained the delimiter, or the length header lies
    leftover = F.decode(
        F.expr("substring(body, cast(content_length as int) + 1)"), "UTF-8"
    )
    parse_ok = (
        F.col("content_length").isNotNull()
        & (F.octet_length("body") >= F.col("content_length"))
        & (F.regexp_replace(leftover, "[\r\n]", "") == "")
    )
    return parsed.select(
        "url",
        "warc_ts",
        "rec_type",
        "record_id",
        "content_type",
        "content_length",
        F.when(parse_ok, payload).alias("payload"),
        F.coalesce(parse_ok, F.lit(False)).alias("parse_ok"),
    )


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> None:
    """Write WET-style ``conversion`` records (one per input row; null
    text becomes an empty payload; null url/warc_ts become empty
    header values, which ``read_warc`` maps back to null — without the
    coalesce, ``concat`` null-propagation would turn the ENTIRE record
    string null and the text writer would silently drop the row).
    Record framing matches ``read_warc``: the text writer's ``lineSep``
    supplies the CRLFCRLF block terminator, Content-Length is the
    payload's UTF-8 BYTE length."""
    payload = F.coalesce(F.col(text_col), F.lit(""))
    url = F.coalesce(F.col(url_col), F.lit(""))
    # render the INSTANT in UTC (WARC spec) via pure epoch arithmetic:
    # date_format prints session-timezone wall time, and
    # convert_timezone round-trips through session WALL time — which
    # is ambiguous in the DST fall-back hour, shifting instants
    # written from a non-UTC session by an hour. Epoch seconds →
    # (days, seconds-of-day) integer math → tz-free DATE formatting
    # has no wall-time step at all.
    e = F.unix_timestamp(F.col(ts_col)).cast("long")
    tod = ((e % 86400) + 86400) % 86400
    days = ((e - tod) / 86400).cast("int")
    two = lambda c: F.lpad(c.cast("long").cast("string"), 2, "0")  # noqa: E731
    ts_utc = F.coalesce(
        F.concat(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), days),
                "yyyy-MM-dd",
            ),
            F.lit("T"),
            two(tod / 3600), F.lit(":"),
            two((tod % 3600) / 60), F.lit(":"),
            two(tod % 60),
        ),
        F.lit(""),
    )
    record = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: conversion\r\n"),
        F.lit("WARC-Target-URI: "), url, F.lit("\r\n"),
        F.lit("WARC-Date: "),
        F.when(ts_utc == "", F.lit("")).otherwise(
            F.concat(ts_utc, F.lit("Z"))
        ),
        F.lit("\r\n"),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(url, payload)),
        F.lit(">\r\n"),
        F.lit("Content-Type: text/plain\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
    )
    (
        df.select(record.alias("value"))
        .write.mode("overwrite")
        .option("lineSep", "\r\n\r\n")
        .text(path)
    )
