"""SparkSession construction + package shipping.

On a real cluster the engine deploys as ``spark-submit --py-files
nobletools_spark.zip job.py`` (north_rule). In notebooks / tests /
driver-side embedding, ``ship_package(spark)`` reproduces that contract
at runtime: it zips the installed package once and registers it with
``sc.addPyFile`` so every Python worker can import ``nobletools_spark``
regardless of the driver's cwd. Idempotent per session.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_nobletools_spark_shipped"


def package_zip_path() -> str:
    """Build (once per process) a zip of the nobletools_spark package."""
    import nobletools_spark

    pkg_dir = os.path.dirname(os.path.abspath(nobletools_spark.__file__))
    out = os.path.join(tempfile.gettempdir(),
                       f"nobletools_spark-{os.getpid()}.zip")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "nobletools_spark",
                        os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        os.replace(tmp, out)
    return out


def ship_package(spark) -> None:
    """Make nobletools_spark importable on executors (--py-files analog)."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(package_zip_path())
    setattr(sc, _SHIPPED_ATTR, True)


def get_spark(cores: int | str = "*", shuffle_partitions: int | None = None,
              app_name: str = "nobletools_spark", driver_mem: str = "48g",
              ui: bool = False):
    """Local-mode session tuned per the scale guidance: AQE on, Arrow on,
    shuffle partitions sized to cores (not the 200 default)."""
    from pyspark.sql import SparkSession

    n = os.cpu_count() if cores in ("*", None) else int(cores)
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or max(int(n or 8), 8)))
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
