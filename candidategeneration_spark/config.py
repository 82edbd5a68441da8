"""Session + deployment helpers.

The engine's UDF kernels (``mapInPandas`` / ``applyInPandas`` functions)
live in this package, so executor Python workers must be able to import it.
On a real cluster that's ``spark-submit --py-files cg_spark.zip`` (the
north-star deployment mode); for interactive / driver-embedded use,
:func:`ensure_on_executors` builds the same zip on the fly and ships it with
``SparkContext.addPyFile`` — idempotent per application.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_ATTACHED: set[str] = set()


def package_zip(path: str | None = None) -> str:
    """Write the package as a --py-files-able zip; returns the zip path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    if path is None:
        path = os.path.join(tempfile.gettempdir(),
                            f"{pkg_name}-pyfiles.zip")
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    os.replace(tmp, path)
    return path


def ensure_on_executors(spark: SparkSession) -> None:
    """Ship this package to executors once per application (idempotent)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _ATTACHED:
        return
    sc.addPyFile(package_zip())
    _ATTACHED.add(app)


def get_spark(master: str | None = None, shuffle_partitions: int | None = None,
              app_name: str = "candidategeneration-spark") -> SparkSession:
    """Opinionated session: AQE on, Arrow on, shuffle partitions sized to
    the parallelism level (≈ cores at local scale; 2-3× executor cores on a
    real cluster — callers override for 100 TB runs)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(cpus) if cpus.isdigit() else (os.cpu_count() or 4)
        shuffle_partitions = max(8, n)
    # local mode runs "executors" inside the driver JVM; the 1g default heap
    # thrashes once cached postings + concurrent task memory exceed it (we
    # measured the stats stage REGRESSING 17s→29s from 4 to 16 cores under
    # the default). Only effective before the gateway JVM starts — i.e. the
    # first session of the process — which is exactly the bench/CLI shape.
    # Default = half of physical RAM capped at 24g (a fixed 24g could
    # exceed a small container's cgroup limit and get the JVM OOM-killed
    # instead of spilling); SPARK_GRAFT_DRIVER_MEM overrides.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if driver_mem is None:
        try:
            total_g = (os.sysconf("SC_PAGE_SIZE")
                       * os.sysconf("SC_PHYS_PAGES")) >> 30
        except (ValueError, OSError):
            total_g = 8
        driver_mem = f"{max(1, min(24, total_g // 2))}g"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Pin the session timezone: timestamp-rendering functions
        # (date_format, dayofweek) must agree with the DuckDB oracle,
        # which treats parquet timestamp[us] as naive/UTC regardless of
        # the host's /etc/localtime.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
    )
    spark = b.getOrCreate()
    ensure_on_executors(spark)
    return spark
