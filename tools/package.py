"""Build the ``--py-files`` deployment artifact.

The north rule's deployment mode is ``spark-submit --py-files`` on a
multi-executor cluster; the engine is pure Python (no JVM extensions,
no custom Catalyst rules), so the artifact is one zip of the package.

Usage:  python tools/package.py [out.zip]     (default: dist/py_schemax_spark.zip)
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str | None = None) -> str:
    out_path = Path(out) if out else REPO / "dist" / "py_schemax_spark.zip"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "py_schemax_spark"
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return str(out_path)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
