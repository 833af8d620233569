"""Two-parallelism-level scaling evidence for the training-data text
layer (chunk-level exact-substring dedup, corpus-unigram LM scoring,
and the streaming corpus ingest),
mirroring scripts/scaling_bench.py's methodology for the CDC replay:
the IDENTICAL job runs at local[N] and local[4N] on the SAME amplified
corpus; efficiency = thr(4N) / (4 · thr(N)); per-level best-of-R
because this host shows ~2× wall-clock noise.

The corpus is sf0.1 ``documents`` amplified AMP× by prepending a
replica token to the text (shifts every chunk boundary, so replicas
do NOT collapse to one chunk set — the dedup work stays realistic)
and offsetting doc ids.  Fully synthetic, deterministic.

Usage:
    python scripts/text_scaling_bench.py [N=1] [AMP=32] [REPS=2]
    python scripts/text_scaling_bench.py --worker <cpus> <feed_dir>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _session(cpus: int, app: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        # IDENTICAL config at every level — only the core count varies
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName(app)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def prepare_corpus(amp: int) -> str:
    from pyspark.sql import functions as F

    spark = _session(32, "text-scaling-prep")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.lit(f"r{i} "), F.col("text")).alias("text"),
        )
        for i in range(amp)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    out = tempfile.mkdtemp(prefix="kcjfs_textfeed_")
    # ≥128 input splits so the scan can use every core at both levels
    df.repartition(128).write.mode("overwrite").parquet(out)
    spark.stop()
    return out


def worker(cpus: int, feed: str) -> None:
    from pyspark.sql import functions as F

    from kafka_connect_jdbc_flatten_spark.functions import dedup as D
    from kafka_connect_jdbc_flatten_spark.functions import lm as LM

    spark = _session(cpus, f"text-scaling-{cpus}")
    docs = spark.read.parquet(feed)
    n_docs = docs.count()
    # untimed JVM/codegen warm-up on a slice (both ops)
    D.chunk_dedup(docs.limit(500), "text", "doc_id", 20).count()
    LM.unigram_logprob(docs.limit(500), "text", "doc_id").count()

    t = time.time()
    kept = (
        D.chunk_dedup(docs, "text", "doc_id", 20)
        .agg(F.sum("n_kept").alias("k"), F.sum("n_chunks").alias("c"))
        .collect()[0]
    )
    t_chunk = time.time() - t

    t = time.time()
    n_scored = LM.unigram_logprob(docs, "text", "doc_id").count()
    t_lm = time.time() - t

    # streaming corpus ingest: fingerprint dedup state + quality gate +
    # bucketed lake append over the same feed (fresh warehouse +
    # checkpoint per run; one availableNow batch — the dedup shuffle,
    # state store, and segment write are the measured work)
    import shutil

    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        StreamingCorpusIngest,
    )

    root = tempfile.mkdtemp(prefix="kcjfs_cstream_")
    t = time.time()
    ing = StreamingCorpusIngest(
        spark,
        feed,
        os.path.join(root, "wh"),
        os.path.join(root, "ckpt"),
        schema=docs.schema,
        min_quality=0.2,
        n_buckets=64,
    )
    ing.run_available(timeout_sec=3600)
    n_ingested = ing.read().count()
    t_stream = time.time() - t
    shutil.rmtree(root, ignore_errors=True)

    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": n_docs,
                "chunk_sec": round(t_chunk, 2),
                "chunks_kept": int(kept.k),
                "chunks_total": int(kept.c),
                "lm_sec": round(t_lm, 2),
                "lm_docs": n_scored,
                "stream_sec": round(t_stream, 2),
                "stream_docs": n_ingested,
                "docs_per_sec_chunk": round(n_docs / t_chunk, 1),
                "docs_per_sec_lm": round(n_docs / t_lm, 1),
                "docs_per_sec_stream": round(n_docs / t_stream, 1),
            }
        )
    )


def run_level(cpus: int, feed: str, reps: int) -> dict:
    best = None
    runs = []
    for r in range(reps):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), feed],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"worker failed at cpus={cpus}")
        rec = json.loads(lines[-1])
        runs.append(rec)
        print(
            f"  local[{cpus}] rep {r}: chunk {rec['chunk_sec']}s "
            f"lm {rec['lm_sec']}s stream {rec['stream_sec']}s",
            flush=True,
        )
        if best is None or rec["chunk_sec"] + rec["lm_sec"] + rec["stream_sec"] < (
            best["chunk_sec"] + best["lm_sec"] + best["stream_sec"]
        ):
            best = rec
    best["all_runs"] = [
        (r["chunk_sec"], r["lm_sec"], r["stream_sec"]) for r in runs
    ]
    return best


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    amp = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    feed = sys.argv[4] if len(sys.argv) > 4 else None
    if feed is None:
        t0 = time.time()
        print(f"preparing corpus: sf0.1 documents × {amp} ...", flush=True)
        feed = prepare_corpus(amp)
        print(f"corpus ready in {time.time()-t0:.0f}s at {feed}", flush=True)
    lo = run_level(n, feed, reps)
    hi = run_level(n * 4, feed, reps)
    result = {
        "workload": "chunk_dedup(k=20) + unigram_logprob + streaming corpus ingest over amplified documents",
        "docs": lo["docs"],
        "n_cpus": n,
        "n4_cpus": n * 4,
        "chunk_eff": round(
            hi["docs_per_sec_chunk"] / (4 * lo["docs_per_sec_chunk"]), 3
        ),
        "lm_eff": round(hi["docs_per_sec_lm"] / (4 * lo["docs_per_sec_lm"]), 3),
        "stream_eff": round(
            hi["docs_per_sec_stream"] / (4 * lo["docs_per_sec_stream"]), 3
        ),
        "lo": lo,
        "hi": hi,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
