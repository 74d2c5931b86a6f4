"""Self-shipping: make the package importable on executors regardless of how
the driver was launched.

`spark-submit --py-files pageeval.zip` is the production path; but when a
harness hands us an already-built SparkSession from an arbitrary cwd, Python
workers would fail to unpickle the Arrow kernels (`ModuleNotFoundError`).
`ensure_shipped(spark)` zips the package once per session and registers it
with `SparkContext.addPyFile` — idempotent and a no-op overhead after the
first call.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

_SHIPPED_SESSIONS: set[int] = set()


def ensure_shipped(spark) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"pageeval_pkg_{os.getpid()}_{key}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, arcname=str(Path(pkg_dir.name) / py.relative_to(pkg_dir)))
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)
