"""WARC source round-trip, framing edge cases, and mis-frame
detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_schemax_spark.sources.datagen import gen_pages
from py_schemax_spark.sources.warc import read_warc, write_warc


def _roundtrip(spark, df, tmp_path, name="w"):
    p = str(tmp_path / name)
    write_warc(df, p)
    return read_warc(spark, p)


def test_warc_roundtrip_byte_identical(spark, tmp_path):
    # multibyte vocab (café/naïve) exercises byte-based Content-Length
    pages = gen_pages(spark, 2000, clean=True).select(
        "url", "warc_ts", "text"
    )
    back = _roundtrip(spark, pages, tmp_path)
    assert back.filter(~F.col("parse_ok")).count() == 0
    want = sorted(
        (r["url"], r["warc_ts"], r["text"] or "") for r in pages.collect()
    )
    got = sorted(
        (r["url"], r["warc_ts"], r["payload"]) for r in back.collect()
    )
    assert got == want


def test_warc_multifile_and_header_fields(spark, tmp_path):
    pages = gen_pages(spark, 500, clean=True).select(
        "url", "warc_ts", "text"
    ).repartition(7)
    back = _roundtrip(spark, pages, tmp_path)
    assert back.count() == 500
    r = back.first()
    assert r["rec_type"] == "conversion"
    assert r["content_type"] == "text/plain"
    assert r["record_id"].startswith("<urn:md5:")
    assert r["content_length"] == len(r["payload"].encode("utf-8"))


def test_warc_payload_with_bare_version_line_is_fine(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("https://a.example/1", "see WARC/1.0 spec for details"),
            ("https://a.example/2", "plain"),
        ],
        "url string, text string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    back = _roundtrip(spark, df, tmp_path)
    got = {r["url"]: (r["payload"], r["parse_ok"]) for r in back.collect()}
    assert got["https://a.example/1"] == (
        "see WARC/1.0 spec for details", True
    )
    assert got["https://a.example/2"] == ("plain", True)


def test_warc_payload_containing_full_delimiter_is_flagged(spark, tmp_path):
    evil = "before\r\n\r\nWARC/1.0\r\nafter"
    df = spark.createDataFrame(
        [("https://a.example/evil", evil), ("https://a.example/ok", "fine")],
        "url string, text string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    back = _roundtrip(spark, df, tmp_path)
    rows = back.collect()
    # the splitter cannot recover the evil record, but it must FLAG the
    # damage (parse_ok=false somewhere) and keep the clean record exact
    ok = {r["url"]: r for r in rows if r["url"] == "https://a.example/ok"}
    assert ok["https://a.example/ok"]["payload"] == "fine"
    assert ok["https://a.example/ok"]["parse_ok"] is True
    assert any(not r["parse_ok"] for r in rows)


def test_warc_null_url_and_ts_rows_survive(spark, tmp_path):
    # concat null-propagation must not turn the record string null —
    # the text writer silently drops null values, vanishing the row
    df = spark.createDataFrame(
        [
            (None, None, "no headers"),
            ("https://a.example/ok", "2024-01-02 03:04:05", "fine"),
        ],
        "url string, ts string, text string",
    ).select("url", F.to_timestamp("ts").alias("warc_ts"), "text")
    back = _roundtrip(spark, df, tmp_path)
    rows = back.collect()
    assert len(rows) == 2
    by_payload = {r["payload"]: r for r in rows}
    nul = by_payload["no headers"]
    assert nul["url"] is None and nul["warc_ts"] is None
    assert nul["parse_ok"] is True
    assert by_payload["fine"]["url"] == "https://a.example/ok"


def test_warc_dates_are_utc_across_session_timezones(spark, tmp_path):
    # WARC-Date is a UTC instant by spec: the written literal must be
    # UTC regardless of session timezone, and the read side must parse
    # the offset (not treat 'Z' as session-local wall time)
    import glob

    conf = spark.conf
    orig = conf.get("spark.sql.session.timeZone")
    epoch = 1704085200  # 2024-01-01T05:00:00Z
    try:
        df = spark.createDataFrame(
            [("https://a.example/tz", "body text")],
            "url string, text string",
        ).withColumn("warc_ts", F.timestamp_seconds(F.lit(epoch)))
        conf.set("spark.sql.session.timeZone", "America/New_York")
        p = str(tmp_path / "tzw")
        write_warc(df, p)
        raw = b"".join(
            open(f, "rb").read() for f in glob.glob(f"{p}/part-*")
        )
        assert b"WARC-Date: 2024-01-01T05:00:00Z" in raw
        conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        r = (
            read_warc(spark, p)
            .select(F.unix_timestamp("warc_ts").alias("e"))
            .first()
        )
        assert r["e"] == epoch
    finally:
        conf.set("spark.sql.session.timeZone", orig)


def test_warc_dates_exact_in_dst_fallback_overlap(spark, tmp_path):
    # instants in the repeated DST hour are ambiguous as WALL time:
    # a wall-time round trip (convert_timezone) resolves 01:30 to the
    # earlier offset and shifts the second occurrence by an hour. The
    # epoch-arithmetic renderer must emit both instants exactly.
    import glob
    from datetime import datetime, timezone

    conf = spark.conf
    orig = conf.get("spark.sql.session.timeZone")
    # America/New_York falls back 2026-11-01: wall 01:30 happens at
    # 05:30Z (EDT) and again at 06:30Z (EST)
    e1 = int(datetime(2026, 11, 1, 5, 30, tzinfo=timezone.utc).timestamp())
    e2 = int(datetime(2026, 11, 1, 6, 30, tzinfo=timezone.utc).timestamp())
    try:
        conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.createDataFrame(
            [("https://a.example/1", e1, "x"), ("https://a.example/2", e2, "y")],
            "url string, e long, text string",
        ).select("url", F.timestamp_seconds("e").alias("warc_ts"), "text")
        p = str(tmp_path / "dstw")
        write_warc(df, p)
        raw = b"".join(
            open(f, "rb").read() for f in glob.glob(f"{p}/part-*")
        )
        assert b"WARC-Date: 2026-11-01T05:30:00Z" in raw
        assert b"WARC-Date: 2026-11-01T06:30:00Z" in raw
    finally:
        conf.set("spark.sql.session.timeZone", orig)


def test_warc_null_text_and_missing_length(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.example/null", None)], "url string, text string"
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    back = _roundtrip(spark, df, tmp_path)
    r = back.first()
    assert r["payload"] == "" and r["parse_ok"] is True
    # hand-written record with no Content-Length header
    p = str(tmp_path / "manual")
    import os

    os.makedirs(p, exist_ok=True)
    with open(f"{p}/part-0.warc", "wb") as f:
        f.write(
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: https://m.example/x\r\n\r\nbody\r\n\r\n"
        )
    r = read_warc(spark, p).first()
    assert r["url"] == "https://m.example/x"
    assert r["parse_ok"] is False and r["payload"] is None
