"""Ship the quality_filter package to executor Python workers.

The pandas-UDF closures (langid / perplexity) are pickled by reference to
their defining modules, so every executor's Python worker must be able to
``import quality_filter`` — the ``spark-submit --py-files`` requirement of
BASELINE.json.  ``ensure_shipped`` makes that automatic for interactive /
driver-script use: it zips the package once per session and registers it
with ``SparkContext.addPyFile`` (the programmatic equivalent of
``--py-files``).  When the job *is* launched with ``--py-files`` this is a
no-op-cost duplicate registration.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED_KEY = "quality_filter._shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_KEY, False):
        return
    pkg_dir = Path(__file__).resolve().parent
    if not pkg_dir.is_dir():
        # zipimport: __file__ is <archive>.zip/quality_filter/shipping.py —
        # the glob below would silently build an EMPTY zip.  The archive
        # the driver imported from IS the shippable artifact; register it.
        archive = next((p for p in pkg_dir.parents if p.is_file()), None)
        if archive is not None:
            sc.addPyFile(str(archive))
            setattr(sc, _SHIPPED_KEY, True)
            return
        raise RuntimeError(
            "quality_filter package directory not found; cannot ship to executors"
        )
    zip_path = os.path.join(
        tempfile.gettempdir(), f"quality_filter_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
            for py in sorted(pkg_dir.glob("*.py")):
                zf.write(py, arcname=f"quality_filter/{py.name}")
            # packaged data (verbatim prompt templates) rides along so
            # executor-side code can load it too
            for dat in sorted(pkg_dir.glob("data/**/*.txt")):
                zf.write(
                    dat,
                    arcname=f"quality_filter/{dat.relative_to(pkg_dir)}",
                )
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_KEY, True)
