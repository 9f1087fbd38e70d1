"""Ship this package to executors of an externally-created SparkSession.

Mutating os.environ['PYTHONPATH'] after the JVM launched is a no-op (the
JVM snapshotted its env), so for sessions we did not build via
``session.get_spark`` the package is shipped as a zip through
``SparkContext.addPyFile`` — the runtime equivalent of
``spark-submit --py-files``. Idempotent per process.
"""

from __future__ import annotations

import os
import tempfile
import zipfile


def ship_package(spark) -> None:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"pi_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)
