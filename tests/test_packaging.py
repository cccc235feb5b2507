"""Deployment-path test: the engine must run from the --py-files zip
alone (north rule: spark-submit --py-files on a multi-executor
cluster). A subprocess python with ONLY the zip on sys.path builds a
session, runs a validation, and must produce the same verdict counts
as the in-process run — proving the artifact is self-contained (pure
Python, no repo-relative file access at runtime)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

from tools.package import build

DRIVER = """
import json, sys
zip_path, pages_path = sys.argv[1], sys.argv[2]
sys.path.insert(0, zip_path)
import py_schemax_spark
assert zip_path in py_schemax_spark.__file__, py_schemax_spark.__file__
from py_schemax_spark.session import get_spark
from py_schemax_spark.runner import RunConfig, ValidationRun
from py_schemax_spark.specs.loader import validate_spec_dict
spark = get_spark(master="local[2]", shuffle_partitions=2)
# ship the zip to executors exactly as spark-submit --py-files would
spark.sparkContext.addPyFile(zip_path)
spec = validate_spec_dict({
    "fqn": "t", "key": "url",
    "columns": [
        {"name": "url", "type": "string", "nullable": False, "unique": True},
        {"name": "warc_ts", "type": "datetime"},
        {"name": "html", "type": "binary"},
        {"name": "text", "type": "string", "min_length": 1,
         "nullable": False},
        {"name": "lang", "type": "string"},
    ],
    "extraction": {"source": "html", "target": "text"},
}).spec
df = spark.read.parquet(pages_path)
res = ValidationRun(spark, spec, config=RunConfig(
    checks=("schema", "rows", "extraction", "uniqueness"),
    order_col="warc_ts")).run(df)
print(json.dumps({
    "violations": res.run_summary.total_violations,
    "rows": res.run_summary.total_rows,
    "exit": res.exit_code,
}))
spark.stop()
"""


def test_runs_from_py_files_zip(spark, tmp_path):
    from py_schemax_spark.runner import RunConfig, ValidationRun
    from py_schemax_spark.sources.datagen import write_pages
    from py_schemax_spark.specs.loader import validate_spec_dict

    pages = str(tmp_path / "pages")
    write_pages(spark, pages, 2000)

    zip_path = build(str(tmp_path / "py_schemax_spark.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    proc = subprocess.run(
        [sys.executable, str(driver), zip_path, pages],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path),  # NOT the repo root — the zip must suffice
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(proc.stdout.strip().splitlines()[-1])

    spec = validate_spec_dict({
        "fqn": "t", "key": "url",
        "columns": [
            {"name": "url", "type": "string", "nullable": False,
             "unique": True},
            {"name": "warc_ts", "type": "datetime"},
            {"name": "html", "type": "binary"},
            {"name": "text", "type": "string", "min_length": 1,
             "nullable": False},
            {"name": "lang", "type": "string"},
        ],
        "extraction": {"source": "html", "target": "text"},
    }).spec
    res = ValidationRun(
        spark, spec,
        config=RunConfig(
            checks=("schema", "rows", "extraction", "uniqueness"),
            order_col="warc_ts",
        ),
    ).run(spark.read.parquet(pages))
    assert got["rows"] == res.run_summary.total_rows == 2000
    assert got["violations"] == res.run_summary.total_violations
    assert got["exit"] == res.exit_code == 1


def test_zip_contains_only_package(tmp_path):
    import zipfile

    zip_path = build(str(tmp_path / "z.zip"))
    names = zipfile.ZipFile(zip_path).namelist()
    assert all(n.startswith("py_schemax_spark/") for n in names)
    assert "py_schemax_spark/runner.py" in names
    assert not any(n.endswith(("conftest.py", "bench.py")) for n in names)
