"""Shared helpers for the functions layer."""

from __future__ import annotations

from pyspark.sql import DataFrame

_SIZE_SUFFIX = {
    "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
}


def _size_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value (``'4194304b'``, ``'128MB'``,
    bare digits) to bytes."""
    s = str(v).strip().lower()
    for suf in ("kb", "mb", "gb", "b", "k", "m", "g"):
        if s.endswith(suf):
            return int(float(s[: -len(suf)])) * _SIZE_SUFFIX[suf]
    return int(float(s))


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Ensure at least ``defaultParallelism * min_factor`` partitions.

    Compute-heavy per-row operators (shingling, MinHash, SimHash,
    cosine) are bottlenecked by INPUT partitioning when the source is
    a small parquet file (1 row-group ⇒ 1 task ⇒ 1 core, regardless of
    cluster size).  A round-robin repartition costs one tiny shuffle
    and unlocks full parallelism.  At real scale (file count ≫ cores)
    this is a no-op — we never reduce partitioning.

    The partition-count probe via ``df.rdd`` forces a plan→RDD
    conversion; at real scale we short-circuit it with the scan's
    file list (metadata-only).  Split packing charges each file only
    ``files.openCostInBytes`` (4 MB) against a ``maxPartitionBytes``
    (128 MB) budget, so up to ~32 tiny files can share one task —
    ``≥ target`` files therefore does NOT guarantee ``≥ target``
    tasks, and spread()'s callers are CPU-bound per row, where the
    byte-bounded-task rationale doesn't apply (r5 advisory).  The
    short-circuit now requires ``target × 32`` files — enough that
    even maximal packing still yields ≥ target tasks — and smaller
    file counts fall through to the exact RDD probe, which is cheap
    at exactly those sizes.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    try:
        open_cost = _size_bytes(spark.conf.get("spark.sql.files.openCostInBytes"))
        max_bytes = _size_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        pack = max(1, max_bytes // max(open_cost, 1))
        if len(df.inputFiles()) >= target * pack:
            return df
    except Exception:
        pass  # non-file-backed plans (streaming, local relations)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
