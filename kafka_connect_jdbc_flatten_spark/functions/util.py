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
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
