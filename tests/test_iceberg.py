"""Env-gated Iceberg integration test (north star names Iceberg as the
production source; the runtime jar is not baked into this sandbox, so
the whole module auto-skips unless ``SCHEMAX_ICEBERG_JAR`` points at an
``iceberg-spark-runtime-4.0_2.13`` jar).

What it proves where the jar exists: a local hadoop catalog table
written through the Iceberg DSv2 connector round-trips through
``read_table("iceberg:...")`` and a full validation class (row
constraints) end-to-end — i.e. the gated branch in
``sources/readers.py`` is the ONLY Iceberg-specific line the engine
needs; every operator downstream is storage-agnostic.

Without the jar, the companion test below still pins the gate's
failure contract: a clear RuntimeError naming the table, never a raw
py4j stack.
"""

from __future__ import annotations

import os

import pytest

from py_schemax_spark.sources.readers import read_table

ICEBERG_JAR = os.environ.get("SCHEMAX_ICEBERG_JAR")


@pytest.mark.skipif(
    not ICEBERG_JAR or not os.path.exists(ICEBERG_JAR),
    reason="SCHEMAX_ICEBERG_JAR not set (iceberg runtime not in sandbox)",
)
def test_iceberg_roundtrip_and_validate(tmp_path):
    """Needs its OWN session: the catalog conf and the jar must be set
    before the JVM starts, so the shared session fixture cannot host
    this."""
    from pyspark.sql import SparkSession

    from py_schemax_spark.runner import RunConfig, ValidationRun
    from py_schemax_spark.specs.loader import validate_spec_dict

    warehouse = str(tmp_path / "wh")
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-it")
        .config("spark.jars", ICEBERG_JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        from py_schemax_spark.sources.datagen import gen_pages

        gen_pages(spark, 500).writeTo("local.db.pages").using(
            "iceberg"
        ).createOrReplace()
        df = read_table(spark, "iceberg:local.db.pages")
        assert df.count() == 500
        spec = validate_spec_dict(
            {
                "fqn": "local.db.pages",
                "key": "url",
                "columns": [
                    {"name": "url", "type": "string", "nullable": False},
                    {"name": "warc_ts", "type": "datetime"},
                    {"name": "html", "type": "binary"},
                    {
                        "name": "text",
                        "type": "string",
                        "min_length": 1,
                        "nullable": False,
                    },
                    {"name": "lang", "type": "string"},
                ],
            }
        ).spec
        res = ValidationRun(
            spark, spec, config=RunConfig(checks=("schema", "rows"))
        ).run(df)
        # gen_pages plants dirt deterministically — the run must see it
        assert res.run_summary.total_rows == 500
        assert res.run_summary.total_violations > 0
    finally:
        spark.stop()


def test_iceberg_gate_fails_clearly_without_runtime(spark):
    """Sandbox path: requesting an iceberg: table without the runtime
    must raise the engine's own RuntimeError naming the table — the
    deploy-risk surface the README documents — not leak a raw py4j
    AnalysisException."""
    with pytest.raises(RuntimeError, match="local.db.pages"):
        read_table(spark, "iceberg:local.db.pages")


def test_parse_iceberg_uri_and_pin_passthrough():
    from py_schemax_spark.sources.readers import parse_iceberg_uri

    assert parse_iceberg_uri("iceberg:local.db.pages") == (
        "local.db.pages", None
    )
    assert parse_iceberg_uri("iceberg:local.db.pages@123456789") == (
        "local.db.pages", "123456789"
    )
    with pytest.raises(ValueError, match="malformed"):
        parse_iceberg_uri("iceberg:local.db.pages@")
    with pytest.raises(ValueError, match="malformed"):
        parse_iceberg_uri("iceberg:@42")


def test_pin_iceberg_snapshot_passthrough_paths(spark):
    """Pinned and non-Iceberg URIs pass through without touching the
    (absent) catalog; unpinned URIs hit the gate's clear error."""
    from py_schemax_spark.sources.readers import pin_iceberg_snapshot

    assert pin_iceberg_snapshot(spark, "/tmp/x.parquet") == "/tmp/x.parquet"
    assert (
        pin_iceberg_snapshot(spark, "iceberg:db.t@99")
        == "iceberg:db.t@99"
    )
    with pytest.raises(RuntimeError, match="cannot pin snapshot"):
        pin_iceberg_snapshot(spark, "iceberg:db.t")


def test_snapshot_id_for_iceberg_pin_contract(tmp_path):
    """The checkpoint manifest keys on the PINNED snapshot (stable
    across restarts and later commits); an unpinned iceberg URI is
    rejected rather than resumed against a moving snapshot. The
    parquet stand-in keeps its invalidate-on-change mtime hash."""
    from py_schemax_spark.checkpoint import snapshot_id_for

    assert (
        snapshot_id_for("iceberg:db.pages@42") == "iceberg:db.pages@42"
    )
    with pytest.raises(ValueError, match="unpinned"):
        snapshot_id_for("iceberg:db.pages")
    d = tmp_path / "pq"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x")
    a = snapshot_id_for(str(d))
    assert a == snapshot_id_for(str(d))  # stable while unchanged
    import os

    os.utime(d / "part-0.parquet", (2_000_000_000, 2_000_000_000))
    assert snapshot_id_for(str(d)) != a  # invalidates on change


@pytest.mark.skipif(
    not ICEBERG_JAR or not os.path.exists(ICEBERG_JAR),
    reason="SCHEMAX_ICEBERG_JAR not set (iceberg runtime not in sandbox)",
)
def test_iceberg_snapshot_pinned_resume(tmp_path):
    """With the jar: pin → append new commit → the pinned URI still
    reads the ORIGINAL snapshot (resume-across-snapshots), and the
    checkpoint manifest keyed on the pin accepts the completed parts.
    """
    from pyspark.sql import SparkSession

    from py_schemax_spark.checkpoint import snapshot_id_for
    from py_schemax_spark.sources.readers import pin_iceberg_snapshot

    warehouse = str(tmp_path / "wh")
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-pin-it")
        .config("spark.jars", ICEBERG_JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.local",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    try:
        from py_schemax_spark.sources.datagen import gen_pages

        gen_pages(spark, 200).writeTo("local.db.pin_pages").using(
            "iceberg"
        ).createOrReplace()
        pinned = pin_iceberg_snapshot(spark, "iceberg:local.db.pin_pages")
        assert "@" in pinned
        sid_key = snapshot_id_for(pinned)
        # a new commit lands between run attempts
        gen_pages(spark, 100).writeTo("local.db.pin_pages").append()
        assert read_table(spark, "iceberg:local.db.pin_pages").count() == 300
        assert read_table(spark, pinned).count() == 200  # pinned
        # re-pinning the pinned URI is a no-op; the manifest key is
        # unchanged across the commit
        assert pin_iceberg_snapshot(spark, pinned) == pinned
        assert snapshot_id_for(pinned) == sid_key
    finally:
        spark.stop()


def test_validate_cli_pins_iceberg_before_checkpoint(
    spark, tmp_path, capsys
):
    """`validate iceberg:tbl --checkpoint-dir …` must resolve the
    snapshot pin BEFORE reading; without the runtime that surfaces as
    the pin gate's clear error + exit 2, never a py4j traceback."""
    from py_schemax_spark.cli import main

    spec = tmp_path / "s.yaml"
    spec.write_text(
        "fqn: t\nkey: url\ncolumns:\n- name: url\n  type: string\n"
    )
    rc = main(
        [
            "validate", "iceberg:local.db.missing",
            "--spec", str(spec),
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ],
        spark=spark,  # shared session (main would stop its own)
    )
    assert rc == 2
    err = capsys.readouterr().err
    assert "cannot pin snapshot" in err


def test_pinned_source_uri_reuses_recorded_pin(spark, tmp_path):
    """The checkpoint-dir pin file is the resume contract: a recorded
    pin is reused verbatim WITHOUT touching the catalog (no runtime in
    this sandbox — a catalog query would raise), and non-iceberg /
    pre-pinned URIs pass through."""
    import json

    from py_schemax_spark.checkpoint import pinned_source_uri

    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "source_pins.json").write_text(
        json.dumps({"iceberg:db.t": "iceberg:db.t@777"})
    )
    assert (
        pinned_source_uri(spark, "iceberg:db.t", str(ck))
        == "iceberg:db.t@777"
    )
    assert pinned_source_uri(spark, "/tmp/x", str(ck)) == "/tmp/x"
    assert (
        pinned_source_uri(spark, "iceberg:db.t@9", str(ck))
        == "iceberg:db.t@9"
    )
    # unrecorded + no runtime → the pin gate's clear error
    with pytest.raises(RuntimeError, match="cannot pin snapshot"):
        pinned_source_uri(spark, "iceberg:db.other", str(ck))


def test_violations_dir_scoped_by_snapshot_and_spec(tmp_path):
    """Rows persisted under a previous snapshot or spec version must
    land in a SIBLING dir — the read-back unions everything under the
    scoped dir, and cross-snapshot union double-counted violations."""
    from py_schemax_spark.checkpoint import CheckpointManifest

    a = CheckpointManifest(str(tmp_path), "snapA", "spec1")
    b = CheckpointManifest(str(tmp_path), "snapB", "spec1")
    c = CheckpointManifest(str(tmp_path), "snapA", "spec2")
    dirs = {a.violations_dir, b.violations_dir, c.violations_dir}
    assert len(dirs) == 3
    for d in dirs:
        assert d.startswith(str(tmp_path))


def test_manifest_preserves_foreign_snapshot_rows(tmp_path):
    """mark_done under snapshot B must not erase snapshot A's rows —
    a later resume against A (manual pin) still needs them."""
    from py_schemax_spark.checkpoint import CheckpointManifest

    a = CheckpointManifest(str(tmp_path), "snapA", "spec1")
    a.mark_done("p1", {"row_count": 10, "violation_count": 0,
                       "valid": True})
    b = CheckpointManifest(str(tmp_path), "snapB", "spec1")
    b.mark_done("p1", {"row_count": 12, "violation_count": 1,
                       "valid": False})
    a2 = CheckpointManifest(str(tmp_path), "snapA", "spec1")
    assert a2.completed_parts == {"p1"}
    assert a2.record("p1")["row_count"] == 10
    b2 = CheckpointManifest(str(tmp_path), "snapB", "spec1")
    assert b2.record("p1")["violation_count"] == 1
