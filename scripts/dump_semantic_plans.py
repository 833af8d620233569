"""Dump .explain('formatted') for the semantic_dedup STAGES that
round 6 changed — the final gate DataFrame's plan is truncated by the
connected-components localCheckpoint, so the evidence lives in the
pair-stage and edge-construction subtrees.

Usage: python scripts/dump_semantic_plans.py <out_dir> <suffix>

Writes:
  semantic_pairs_expr_<suffix>.txt   — the equi-join pair plan
  semantic_pairs_gate_<suffix>.txt   — the pair impl the GATE uses
                                       (expr before r6, grouped Arrow after)
  semantic_cc_edges_<suffix>.txt     — the CC edge construction over
                                       those pairs (union-of-two-
                                       subtrees before, explode after)
Run once in a round-start worktree with suffix 'before' and once at
the head with suffix 'after'.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def explain_str(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("semantic-plan-dump")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import inspect

    from kafka_connect_jdbc_flatten_spark.functions import cluster as CL
    from kafka_connect_jdbc_flatten_spark.functions import semantic as SEM
    from kafka_connect_jdbc_flatten_spark.functions.similarity import (
        ivf_train_centroids,
    )
    from kafka_connect_jdbc_flatten_spark.functions.util import spread

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cents = ivf_train_centroids(emb, k=8, iters=0)
    assigned = spread(emb).select(
        F.col("vec_id"),
        F.col("embedding"),
        SEM._assign_expr("embedding", cents).alias("__cid"),
    )

    pairs_expr = SEM._pairs_expr(assigned, "vec_id", "embedding", 0.4, 4)
    # which pair impl does the current tree's GATE run?  Read it off
    # the entry point source so the dump self-describes.
    import __spark_entry__ as E

    gate_src = inspect.getsource(E.q_semantic_dedup)
    if 'pair_impl="arrow"' in gate_src:
        if hasattr(SEM, "_dedup_grouped_arrow"):
            pairs_gate = SEM._dedup_grouped_arrow(
                assigned, "vec_id", "embedding", 0.4, 4
            )
            gate_label = (
                "FUSED grouped-arrow GEMM + in-kernel union-find "
                "(applyInPandas) — no distributed CC loop"
            )
        else:
            pairs_gate = SEM._pairs_grouped_arrow(
                assigned, "vec_id", "embedding", 0.4, 4
            )
            gate_label = "grouped-arrow GEMM (applyInPandas)"
    else:
        pairs_gate = pairs_expr
        gate_label = "expr equi-join"

    # the CC edge construction exactly as this tree's cluster.py builds
    # it (re-created here because connected_components materializes its
    # loop eagerly and checkpoints away the lineage).  Built over a
    # PAIR-shaped frame — when the gate fuses closure into the kernel,
    # the generic CC still serves dedup_clusters and the expr path.
    pairs_for_cc = (
        SEM._pairs_grouped_arrow(assigned, "vec_id", "embedding", 0.4, 4)
        if hasattr(SEM, "_pairs_grouped_arrow") and "id1" not in pairs_gate.columns
        else pairs_gate
    )
    cc_src = inspect.getsource(CL.connected_components)
    if "F.explode" in cc_src:
        edges = (
            pairs_for_cc.select(
                F.explode(
                    F.array(
                        F.struct(F.col("id1").alias("a"), F.col("id2").alias("b")),
                        F.struct(F.col("id2").alias("a"), F.col("id1").alias("b")),
                    )
                ).alias("__e")
            )
            .select("__e.a", "__e.b")
            .distinct()
        )
        edges_label = "explode(array(fwd, rev)) — pairs evaluated once"
    else:
        fwd = pairs_for_cc.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
        edges = fwd.union(
            fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
        edges_label = "union(fwd, reversed) — pairs subtree planned twice"

    for name, df, note in [
        ("semantic_pairs_expr", pairs_expr, "expr equi-join pair stage"),
        ("semantic_pairs_gate", pairs_gate, f"gate pair stage: {gate_label}"),
        ("semantic_cc_edges", edges, f"CC edge construction: {edges_label}"),
    ]:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {note}\n\n")
            f.write(explain_str(df))
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
