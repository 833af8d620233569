"""Shared helpers for the functions layer."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
    file list (metadata-only): ≥ target files means the input is
    already wide — either it splits into ≥ target tasks, or split
    packing (``files.openCostInBytes``) has bounded each task's bytes
    and a round-robin shuffle of the whole input would cost more than
    it buys.  The RDD probe then only runs on small inputs, where it
    is trivially cheap.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass  # non-file-backed plans (streaming, local relations)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
