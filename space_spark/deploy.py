"""Self-shipping: make the space_spark package importable on executors.

Closures sent to ``mapInArrow``/RDD tasks reference classes in this package
(e.g. the record-field blob writer), which cloudpickle serializes BY
REFERENCE — executors must be able to ``import space_spark``. On a real
cluster that normally means ``--py-files``/pip; we make it automatic by
zipping the package once per SparkContext and calling ``addPyFile``, which
Spark distributes to every executor (works identically on local[N] and a
1000-executor cluster)."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set = set()


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"space_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for name in files:
                    if not name.endswith(".py"):
                        continue
                    abs_f = os.path.join(root, name)
                    rel = os.path.join(
                        "space_spark", os.path.relpath(abs_f, pkg_dir)
                    )
                    zf.write(abs_f, rel)
    sc.addPyFile(zip_path)
    # Streaming planner workers resolve the python-includes list against
    # the job-artifact dir <userFilesRoot>/streaming_job — Spark 4.1's
    # PythonStreamingSourceRunner.init hardcodes
    # writeSparkFiles(Some("streaming_job"), ...) — while addPyFile only
    # populates the root. Nothing ever copies pyfiles into that subdir,
    # so mirror the zip there ourselves, or `readStream.format("space")`
    # raises ModuleNotFoundError whenever the driver cwd can't import the
    # package (batch reads meanwhile work fine).
    try:
        import shutil

        from pyspark.core.files import SparkFiles

        streaming_dir = os.path.join(
            SparkFiles.getRootDirectory(), "streaming_job"
        )
        os.makedirs(streaming_dir, exist_ok=True)
        shutil.copy2(zip_path, streaming_dir)
    except Exception:
        pass  # non-local drivers: ship via --py-files instead
    _SHIPPED.add(key)
