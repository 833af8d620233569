"""Stage-isolated profiling for semantic_dedup (guide §1.4: noop-sink
timing, labelled jobs).  NOT part of the frozen bench — numbers feed
OPTIMIZATION_r06.md only.

Usage: python scripts/profile_semantic.py <emb_parquet_dir_or_file> [reps]

Times, separately:
  * assignment only (expr argmin) → noop
  * pairs (expr)                  → noop
  * pairs (arrow grouped GEMM)    → noop
  * full semantic_dedup (as the gate runs it) → count
and prints pair-set equality between the two pair impls.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    src = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("semantic-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_connect_jdbc_flatten_spark.functions.semantic import (
        _assign_expr,
        _pairs_expr,
        _pairs_grouped_arrow,
        semantic_dedup,
    )
    from kafka_connect_jdbc_flatten_spark.functions.similarity import (
        ivf_train_centroids,
    )
    from kafka_connect_jdbc_flatten_spark.functions.util import spread

    emb = spark.read.parquet(src)
    n = emb.count()
    k, threshold = 8, 0.4
    print(f"n={n} k={k} threshold={threshold}", flush=True)

    cents = ivf_train_centroids(emb, k=k, iters=0)
    assigned = spread(emb).select(
        F.col("vec_id"),
        F.col("embedding"),
        _assign_expr("embedding", cents).alias("__cid"),
    )
    sizes = sorted(
        (r["__cid"], r["count"]) for r in assigned.groupBy("__cid").count().collect()
    )
    print("cluster sizes:", sizes, flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timeit(label, fn):
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        print(f"{label}: {best:.3f}s (best of {reps})", flush=True)
        return best

    timeit("assign-expr", lambda: noop(assigned))
    pe = _pairs_expr(assigned, "vec_id", "embedding", threshold, 4)
    pa = _pairs_grouped_arrow(assigned, "vec_id", "embedding", threshold, 4)
    n_pairs = pe.count()
    print(f"pairs over threshold: {n_pairs}", flush=True)
    timeit("pairs-expr", lambda: noop(pe))
    timeit("pairs-arrow", lambda: noop(pa))

    # pair-set + cos equality between impls
    diff = (
        pe.withColumnRenamed("cos", "cos_e")
        .join(pa.withColumnRenamed("cos", "cos_a"), ["id1", "id2"], "full")
        .filter(
            F.col("cos_e").isNull()
            | F.col("cos_a").isNull()
            | (F.col("cos_e") != F.col("cos_a"))
        )
        .count()
    )
    print(f"pair impl divergence rows: {diff}", flush=True)

    timeit(
        "full semantic_dedup (expr pairs)",
        lambda: semantic_dedup(emb, k=k, threshold=threshold, iters=0).count(),
    )
    timeit(
        "full semantic_dedup (arrow pairs = gate config)",
        lambda: semantic_dedup(
            emb, k=k, threshold=threshold, iters=0, pair_impl="arrow"
        ).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
