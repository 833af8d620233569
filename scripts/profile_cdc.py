"""Phase-level timing of the bench's CDC MERGE-apply replay (guide
§1: find where the time goes before touching anything).  Mirrors
bench.py's fixture prep and replay loop exactly, with wall timers
wrapped around the phases inside apply_batch:

  reduce   — lww_reduce_auto (winner agg + broadcast semi, persisted)
  write    — the union write job in _apply_mor_union
  commit   — per-table manifest commit_segment calls
  foreign  — tombstone fan-out scan
  total    — apply_batch wall

Usage: python scripts/profile_cdc.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_MICROBATCHES = 4


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .appName("cdc-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    codec = os.environ.get("CDCPROF_CODEC")
    if codec:
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        print(f"parquet codec: {codec}", flush=True)
    if os.environ.get("CDCPROF_COMMITTER_V2"):
        spark.sparkContext._jsc.hadoopConfiguration().set(
            "mapreduce.fileoutputcommitter.algorithm.version", "2")
        print("committer v2", flush=True)

    import __spark_entry__ as E
    from kafka_connect_jdbc_flatten_spark.lake import table as table_mod
    from kafka_connect_jdbc_flatten_spark.operators import merge as merge_mod
    from kafka_connect_jdbc_flatten_spark.sources.changelog import (
        transcript_changelog,
    )

    phases = {"reduce": 0.0, "write": 0.0, "commit": 0.0, "foreign": 0.0}

    real_reduce = merge_mod.lww_reduce_auto

    def timed_reduce(*a, **k):
        t0 = time.time()
        out = real_reduce(*a, **k)
        phases["reduce"] += time.time() - t0
        return out

    merge_mod.lww_reduce_auto = timed_reduce

    real_commit = table_mod.LakeTable.commit_segment

    def timed_commit(self, *a, **k):
        t0 = time.time()
        out = real_commit(self, *a, **k)
        phases["commit"] += time.time() - t0
        return out

    table_mod.LakeTable.commit_segment = timed_commit

    real_foreign = merge_mod.CdcApplier._delete_from_foreign_tables

    def timed_foreign(self, *a, **k):
        t0 = time.time()
        out = real_foreign(self, *a, **k)
        phases["foreign"] += time.time() - t0
        return out

    merge_mod.CdcApplier._delete_from_foreign_tables = timed_foreign

    # time the union write by wrapping the DataFrameWriter.parquet call
    # is awkward; instead wrap _apply_mor_union and subtract commit time
    real_union = merge_mod.CdcApplier._apply_mor_union
    union_total = [0.0]

    def timed_union(self, *a, **k):
        t0 = time.time()
        out = real_union(self, *a, **k)
        union_total[0] += time.time() - t0
        return out

    merge_mod.CdcApplier._apply_mor_union = timed_union

    tmp = tempfile.mkdtemp(prefix="kcjfs_cdcprof_")
    try:
        feed = os.path.join(tmp, "changelog")
        changelog = transcript_changelog(spark, SF_DIR)
        changelog.repartitionByRange(CPUS, "seq").write.mode("overwrite").parquet(
            feed
        )
        feed_df = spark.read.parquet(feed)
        n_events = feed_df.count()
        mn, mx = feed_df.agg(F.min("seq"), F.max("seq")).collect()[0]
        step = (mx - mn + N_MICROBATCHES) // N_MICROBATCHES
        bounds = [mn + step * i for i in range(1, N_MICROBATCHES)]

        slices = []
        lo = None
        for i in range(N_MICROBATCHES):
            hi = bounds[i] if i < len(bounds) else None
            b = feed_df
            if lo is not None:
                b = b.filter(F.col("seq") >= lo)
            if hi is not None:
                b = b.filter(F.col("seq") < hi)
            slices.append((b, b.count()))
            lo = hi

        # warmup like bench.py
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        warm_wh = os.path.join(tmp, "warm_wh")
        warm = merge_mod.CdcApplier(spark, warm_wh, E._transcript_plan(), n_buckets=32)
        warm.apply_batch(feed_df.filter(F.col("seq") <= mn + step // 8), batch_id=0)
        shutil.rmtree(warm_wh, ignore_errors=True)

        print(f"events={n_events} batches={N_MICROBATCHES}", flush=True)
        for rep in range(reps):
            for k in phases:
                phases[k] = 0.0
            union_total[0] = 0.0
            wh = os.path.join(tmp, f"wh{rep}")
            applier = merge_mod.CdcApplier(
                spark, wh, E._transcript_plan(), n_buckets=32
            )
            t0 = time.time()
            per_batch = []
            for i, (batch, n) in enumerate(slices):
                tb = time.time()
                applier.apply_batch(batch, batch_id=i, n_rows_hint=n)
                per_batch.append(round(time.time() - tb, 3))
            total = time.time() - t0
            phases["write"] = union_total[0] - phases["commit"]
            print(
                f"rep{rep}: total={total:.3f}s batches={per_batch} "
                + " ".join(f"{k}={v:.3f}" for k, v in phases.items()),
                flush=True,
            )
            shutil.rmtree(wh, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
