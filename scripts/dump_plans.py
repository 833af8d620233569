"""Dump .explain('formatted') for named entry-point queries.

Usage: python scripts/dump_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: the
bench headline set).  Run from the repo root whose __spark_entry__
should be used — the round-6 before/after plan evidence in plans/r06/
comes from running this at the round-start commit and at the head.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT = [
    "semantic_dedup",
    "dedup_clusters",
    "unigram_logprob",
    "dedup_minhash_lsh",
    "chunk_dedup",
    "dedup_exact",
    "flatten_explode_prefixes",
    "simhash_values",
    "ann_brute_topk",
    "asof_join",
    "multimodal_meta",
    "text_quality",
    "token_counts",
    "incremental_tail",
    "lww_salted",
]


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("plan-dump")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
