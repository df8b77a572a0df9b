"""Ship this package to executor Python workers.

UDF closures reference package modules by name; workers import them at
deserialization time. On a real cluster that means ``--py-files`` /
``spark.submit.pyFiles``; for programmatic use we zip the package once
and ``addPyFile`` it lazily, so the engine works regardless of the
driver's working directory or deploy mode. Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)
_shipped_ctx_ids: set[int] = set()


def ensure_package_shipped(spark: SparkSession | None = None) -> None:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        return
    sc = spark.sparkContext
    ctx_id = id(sc)
    if ctx_id in _shipped_ctx_ids:
        return
    zpath = os.path.join(
        tempfile.gettempdir(), f"{_PKG_NAME}_{os.getpid()}_{ctx_id}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(_PKG_DIR):
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(dirpath, fname)
                        arc = os.path.join(
                            _PKG_NAME, os.path.relpath(full, _PKG_DIR)
                        )
                        z.write(full, arc)
    sc.addPyFile(zpath)
    _shipped_ctx_ids.add(ctx_id)
