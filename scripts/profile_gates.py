"""Time EVERY queries() gate at a given SF dir (guide §1: measure
before judging).  Breadth evidence for the optimization round — the
frozen bench times only the 15-query headline set; this sweep surfaces
hotspots in the other 55 gates.

Usage: python scripts/profile_gates.py [sf_dir] [reps]

Prints per-gate best-of-reps seconds (construction + count), sorted
descending.  Queries that drive writes/streaming time their full
round trip, same as the driver's correctness harness does.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("gate-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    times: dict[str, float] = {}
    for name, fn in qs.items():
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"gate:{name}")
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001 — surface, keep sweeping
                print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
                best = float("nan")
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        times[name] = best
        print(f"{name}: {best:.3f}s", flush=True)
    print("\n=== sorted (desc) ===", flush=True)
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{dt:8.3f}  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
