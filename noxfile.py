"""Multi-Python test matrix + coverage floor — the parity surface for
the reference's nox setup (reference noxfile.py:13-37: pytest-cov with
--cov-fail-under=80 across 3.11/3.12/3.13). Sessions are leaner here
because the heavy dependency is the Spark runtime itself: each session
installs the package (pulls pyspark/pyarrow/pandas/numpy from
pyproject.toml) plus the dev extras, then runs the suite under the
same >=80% line-coverage floor tools/run_coverage.py enforces.

The sandbox this repo is developed in has a single 3.11 interpreter
and no network, so `nox` itself cannot run there — `python
tools/run_coverage.py` is the in-sandbox equivalent of the `tests`
session; CI (ci.yml) runs the full matrix.
"""

import nox

PYTHON_VERSIONS = ["3.11", "3.12", "3.13"]

COV_ARGS = (
    "--cov=py_schemax_spark",
    "--cov-report=term-missing",
    "--cov-report=xml",
    "--cov-fail-under=80",
)


@nox.session(python=PYTHON_VERSIONS)
def tests(session):
    """Full suite under the coverage floor (JVM required: Spark
    local-mode sessions start inside the tests)."""
    session.install(".")
    session.install("pytest", "pytest-cov", "hypothesis", "duckdb")
    session.run("pytest", "tests/", "-q", *COV_ARGS, *session.posargs)


@nox.session(python=PYTHON_VERSIONS)
def tests_no_cov(session):
    """Faster: same suite without the coverage harness."""
    session.install(".")
    session.install("pytest", "hypothesis", "duckdb")
    session.run("pytest", "tests/", "-q", *session.posargs)


@nox.session(python="3.11")
def install_test(session):
    """Wheel install + console-script smoke: the `pip install .` →
    `schemax-spark validate` path every user starts at."""
    session.install("build")
    session.run("python", "-m", "build", "--wheel")
    import glob

    wheels = sorted(glob.glob("dist/*.whl"))
    if not wheels:
        session.error("no wheel built")
    session.install(wheels[-1])
    session.run("schemax-spark", "--version")
    session.run("schemax-spark", "validate", "--help")


nox.options.sessions = ["tests"]
