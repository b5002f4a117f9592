"""Ship the package to executor Python workers (``--py-files`` equivalent).

Python UDFs (pandas UDFs, applyInPandasWithState functions) are
cloudpickled by reference to this package, so executor workers must be able
to import it — regardless of the driver's cwd or sys.path. In production
that is ``spark-submit --py-files ssp_spark.zip``; for library use,
:func:`ensure_package_shipped` builds the zip once per process and
registers it with ``SparkContext.addPyFile``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

__all__ = ["ensure_package_shipped", "build_package_zip"]

_ZIP_CACHE: dict[str, str] = {}


def build_package_zip() -> str:
    """Zip this package into a temp file (cached per process)."""
    if "zip" in _ZIP_CACHE:
        return _ZIP_CACHE["zip"]
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, path = tempfile.mkstemp(prefix="ssp_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                z.write(full, rel)
    _ZIP_CACHE["zip"] = path
    return path


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers."""
    sc = spark.sparkContext
    marker = "_ssp_spark_shipped"
    if getattr(sc, marker, False):
        return
    sc.addPyFile(build_package_zip())
    setattr(sc, marker, True)
