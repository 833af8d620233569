"""Skew an existing changelog feed: remap a deterministic ~1/denom of
envelopes onto ONE hot conv_id (zipfian-head evidence, r3 verdict #5 —
"one conv_id taking ~10% of events").

The remap keys on ``pmod(xxhash64(seq), denom) == 0`` so it is
deterministic, partitioning-invariant, and independent of the original
key distribution; seq/offset are untouched so micro-batch slicing and
LWW order are identical to the uniform feed.  key/value/before
conv_ids are rewritten consistently (whole-image semantics: the hot
key's final state is simply its max-seq image's turns).

Usage: skew_feed.py <src> <dst> [denom=10] [n_files=1024]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, functions as F


def main():
    src, dst = sys.argv[1], sys.argv[2]
    denom = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_files = int(sys.argv[4]) if len(sys.argv) > 4 else 1024
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("skew-feed")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(src)
    hot = F.pmod(F.xxhash64(F.col("seq")), F.lit(denom)) == 0

    def remap(col):
        return F.when(hot, F.lit("hot_0")).otherwise(col)

    out = (
        base.withColumn(
            "key", F.struct(remap(F.col("key.conv_id")).alias("conv_id"))
        )
        .withColumn(
            "value",
            F.when(
                F.col("value").isNotNull(),
                F.struct(
                    remap(F.col("value.conv_id")).alias("conv_id"),
                    F.col("value.turns").alias("turns"),
                ),
            ),
        )
        .withColumn(
            "before",
            F.when(
                F.col("before").isNotNull(),
                F.struct(
                    remap(F.col("before.conv_id")).alias("conv_id"),
                    F.col("before.turns").alias("turns"),
                ),
            ),
        )
    )
    out.repartitionByRange(n_files, "seq").write.mode("overwrite").parquet(dst)
    got = spark.read.parquet(dst)
    n = got.count()
    n_hot = got.filter(F.col("key.conv_id") == "hot_0").count()
    print(f"rows: {n} hot: {n_hot} ({100.0 * n_hot / n:.2f}%)")
    spark.stop()


if __name__ == "__main__":
    main()
