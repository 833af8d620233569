"""SparkSession factory tuned for the engine.

Local-mode testing runs on ``local[N]``; the same config block is what
we'd ship to a real cluster via ``spark-submit --py-files`` (AQE on,
shuffle partitions sized to cores, Arrow enabled for the pandas-UDF
slow path).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_ZIP: str | None = None


def _package_zip() -> str:
    """Zip this package for ``SparkContext.addPyFile`` — the local-mode
    equivalent of ``spark-submit --py-files``.  Python workers do NOT
    inherit a driver-side ``sys.path.insert`` (a pandas-UDF closure
    referencing any module-level function of this package would die
    with ModuleNotFoundError when the driver runs outside the repo),
    and on a real cluster the executors need the code shipped anyway.
    Built once per process, cached."""
    global _PKG_ZIP
    if _PKG_ZIP is None or not os.path.exists(_PKG_ZIP):
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        root = os.path.dirname(pkg_dir)
        fd, path = tempfile.mkstemp(suffix=".zip", prefix="kcjfs_pkg_")
        os.close(fd)
        with zipfile.ZipFile(path, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
        _PKG_ZIP = path
    return _PKG_ZIP


def ensure_package_shipped(spark: SparkSession) -> None:
    """Best-effort ``addPyFile`` of this package onto an EXISTING
    session.  Operators whose Arrow-batch closures reference
    module-level package functions (the codec kernels, the GEMM
    rounding shim) are pickled BY REFERENCE, so the Python workers
    must be able to import the package — guaranteed for ``get_spark``
    sessions, but harness-provided sessions (the correctness driver,
    a user's own builder) may lack it.  Same zip path per process ⇒
    repeat calls are no-ops; failures are swallowed because a session
    whose workers can already import the package needs nothing."""
    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass


def get_spark(
    app_name: str = "kafka_connect_jdbc_flatten_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    db_timezone: str = "UTC",
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``.  Shuffle
    partitions default to the core count — on a real cluster this is
    instead sized to ``executors * cores * 2-3`` and AQE coalesces
    down at runtime.

    ``db_timezone`` is the ``db.timezone`` parity knob
    (``JdbcSinkConfig.java:218-223`` / binding
    ``GenericDatabaseDialect.java:1612-1649``): the reference binds
    DATE/TIME/TIMESTAMP values through a Calendar in this zone; on
    Spark the same role is played by ``spark.sql.session.timeZone`` —
    it controls how TIMESTAMP (instant) values render, parse from
    strings, and split into date/time parts.  Stored instants are
    zone-independent either way.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        default_parts = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        default_parts = cores
    if shuffle_partitions is None:
        shuffle_partitions = default_parts

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", db_timezone)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package to the Python workers (--py-files equivalent);
    # same path per process ⇒ repeat calls are a no-op
    spark.sparkContext.addPyFile(_package_zip())
    return spark
