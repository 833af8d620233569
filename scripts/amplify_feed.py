"""Amplify an existing changelog feed K× by deterministic seq/key
shifting (same transform as scaling_bench.prepare_feed, applied to an
already-amplified feed).  Usage: amplify_feed.py <src> <dst> [K=4]"""

import sys

from pyspark.sql import SparkSession, functions as F


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("amplify-feed")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(src)
    mx = base.agg(F.max("seq")).collect()[0][0] + 1
    copies = []
    for i in range(k):
        kshift = F.lit(f"x{i}_")
        c = (
            base.withColumn("seq", F.col("seq") + F.lit(i * mx))
            .withColumn("offset", F.col("offset") + F.lit(i * mx))
            .withColumn(
                "key",
                F.struct(F.concat(kshift, F.col("key.conv_id")).alias("conv_id")),
            )
            .withColumn(
                "value",
                F.when(
                    F.col("value").isNotNull(),
                    F.struct(
                        F.concat(kshift, F.col("value.conv_id")).alias("conv_id"),
                        F.col("value.turns").alias("turns"),
                    ),
                ),
            )
            .withColumn(
                "before",
                F.when(
                    F.col("before").isNotNull(),
                    F.struct(
                        F.concat(kshift, F.col("before.conv_id")).alias("conv_id"),
                        F.col("before.turns").alias("turns"),
                    ),
                ),
            )
        )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartitionByRange(256 * k, "seq").write.mode("overwrite").parquet(dst)
    print("rows:", spark.read.parquet(dst).count())
    spark.stop()


if __name__ == "__main__":
    main()
