"""spark-submit entry point.

The north rule requires the job to run via ``spark-submit --py-files``
on a multi-executor cluster.  Package the library as a zip and submit:

    cd /root/repo && python -m zipfile -c /tmp/kcjfs.zip kafka_connect_jdbc_flatten_spark
    spark-submit --master local[32] --py-files /tmp/kcjfs.zip \
        scripts/submit_ingest.py ingest \
        --changelog-dir /data/binlog --warehouse /data/wh \
        --checkpoint /data/ckpt --buckets 64

(on a real cluster: ``--master yarn``/``k8s://...`` with
``--num-executors N``; nothing in the job is local-mode-specific —
all state lives in the warehouse/checkpoint paths.)

Subcommands:

* ``ingest``   — tail the changelog directory with Structured
  Streaming (availableNow catch-up by default, or continuous with
  ``--follow``), flatten + MERGE into the warehouse, print lineage.
* ``gen-feed`` — materialize the deterministic synthetic changelog
  fixture from a testdata sf directory into binlog segment files.
* ``corpus-prep`` — batch training-corpus prep (quality ∧ dedup ∧
  cluster filter, optional decontamination / PII / packing manifest).
* ``corpus-stream`` — continuous corpus ingest: stateful fingerprint
  dedup (salted / RocksDB options) → quality gate → exactly-once
  lake append.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from pyspark.sql import SparkSession

    # master/memory come from spark-submit; sane defaults for direct
    # `python -m kafka_connect_jdbc_flatten_spark.cli` runs
    b = SparkSession.builder.appName(app)
    if "--master" not in " ".join(sys.argv):
        b = b.config("spark.sql.adaptive.enabled", "true")
    return b.getOrCreate()


def cmd_ingest(args: argparse.Namespace) -> int:
    from .operators.merge import CdcApplier  # noqa: F401 (import check)
    from .plans import compile_flatten_plan
    from .sources.changelog import (
        TRANSCRIPT_KEY_SCHEMA,
        TRANSCRIPT_VALUE_SCHEMA,
        transcript_flatten_config,
    )
    from .streaming.pipeline import StreamingIngest

    spark = _spark("kcjfs-ingest")
    plan = compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA,
        TRANSCRIPT_VALUE_SCHEMA,
        transcript_flatten_config(coordinates=args.coordinates),
        value_record_name="Conversation",
        key_record_name="ConversationKey",
    )
    ing = StreamingIngest(
        spark,
        args.changelog_dir,
        args.warehouse,
        plan,
        args.checkpoint,
        n_buckets=args.buckets,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    ing.run_available(timeout_sec=args.timeout)
    summary = {
        "batches": len(ing.batch_stats),
        "rows": sum(s["rows"] for s in ing.batch_stats),
        "tables": {
            name: ing.read(name).count()
            for name in ing.applier.tables
        },
    }
    print(json.dumps(summary))
    return 0


def cmd_gen_feed(args: argparse.Namespace) -> int:
    from .sources.changelog import transcript_changelog, write_changelog_chunks

    spark = _spark("kcjfs-gen-feed")
    changelog = transcript_changelog(spark, args.sf_dir)
    paths = write_changelog_chunks(changelog, args.out, n_chunks=args.chunks)
    print(json.dumps({"chunks": paths, "events": changelog.count()}))
    return 0


def cmd_corpus_stream(args: argparse.Namespace) -> int:
    """Continuous corpus ingest as a submit-able job: document stream
    → stateful fingerprint dedup (optionally salted for hot
    fingerprints, optionally RocksDB-backed state) → quality gate →
    exactly-once lake append (``streaming/corpus.py``)."""
    from pyspark.sql import functions as F  # noqa: F401

    from .streaming.corpus import StreamingCorpusIngest, use_rocksdb_state

    spark = _spark("kcjfs-corpus-stream")
    if args.rocksdb_state:
        use_rocksdb_state(spark)
    schema = spark.read.parquet(args.docs_dir).schema
    ing = StreamingCorpusIngest(
        spark,
        args.docs_dir,
        args.warehouse,
        args.checkpoint,
        schema=schema,
        text_col=args.text_col,
        id_col=args.id_col,
        min_quality=args.min_quality,
        redact=args.redact_pii,
        ts_col=args.ts_col,
        watermark=args.watermark,
        salt_buckets=args.salt_buckets,
        n_buckets=args.buckets,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    stats = ing.run_available(timeout_sec=args.timeout)
    summary = {
        "batches": len(stats),
        "docs_in": sum(s["docs_in"] for s in stats),
        "rows": ing.read().count(),
    }
    print(json.dumps(summary))
    return 0


def cmd_corpus_prep(args: argparse.Namespace) -> int:
    """Training-corpus prep as a submit-able job: quality filter ∧
    exact-dedup winner ∧ near-dup cluster representative (the min-id
    member that passes quality — see ``functions/corpus.py``),
    optional benchmark decontamination, PII redaction, and
    sequence-packing manifest.  Writes the kept-docs manifest as
    parquet."""
    from pyspark.sql import functions as F

    from .functions import corpus as CORPUS
    from .functions import pack as PK

    spark = _spark("kcjfs-corpus-prep")
    raw_docs = spark.read.parquet(args.docs)
    docs = raw_docs
    if args.redact_pii:
        # redaction applies to the TRAINING view only; the
        # decontamination probe below runs on `raw_docs`, since a
        # redacted span would break exactly the 8-gram overlaps the
        # check exists to find (bench text is never redacted)
        from .functions.text import redact_pii

        docs = docs.withColumn(args.text_col, redact_pii(args.text_col))
    kept = CORPUS.corpus_keep(
        docs, args.text_col, args.id_col, min_quality=args.min_quality
    )
    n_contaminated = 0
    if args.bench:
        # drop docs sharing n-grams with the held-out set (anti-join on
        # the flagged ids — the bench gram probe is broadcast inside)
        from .functions.decontam import contaminated_docs

        bench = spark.read.parquet(args.bench)
        bad = contaminated_docs(
            raw_docs, bench, args.text_col, args.id_col,
            bench_text_col=args.bench_text_col or args.text_col,
            n=args.bench_ngram,
        ).persist()  # consumed twice: the count and the anti-join
        n_contaminated = bad.count()
        kept = kept.join(
            bad.select(F.col(args.id_col).alias("doc_id")),
            on="doc_id", how="left_anti",
        )
    chunk_stats = None
    if args.chunk_dedup_tokens:
        # exact-substring hygiene among the SURVIVING docs: duplicated
        # token chunks are dropped keep-first and the text rewritten;
        # docs whose every chunk was seen elsewhere drop out entirely.
        # Runs after quality/near-dup/decontam so dropped docs cannot
        # claim chunk ownership, and the cleaned text (not the raw
        # docs table) is what the packing stage consumes.
        from .functions.dedup import chunk_dedup

        kept_text = docs.select(
            F.col(args.id_col).alias("doc_id"), F.col(args.text_col)
        ).join(kept.select("doc_id"), "doc_id", "left_semi")
        cd = chunk_dedup(
            kept_text, args.text_col, "doc_id", args.chunk_dedup_tokens
        ).persist()  # consumed twice: the stats agg and the kept join
        row = cd.agg(
            F.sum("n_chunks").alias("total"),
            F.sum("n_kept").alias("kept"),
            F.sum((F.col("n_kept") == 0).cast("long")).alias("emptied"),
        ).collect()[0]
        chunk_stats = {
            "chunks_total": int(row.total or 0),
            "chunks_kept": int(row.kept or 0),
            "docs_emptied": int(row.emptied or 0),
        }
        kept = kept.join(
            cd.filter(F.col("n_kept") > 0).select(
                "doc_id", F.col("clean_text").alias(args.text_col)
            ),
            "doc_id",
        )
    if args.id_col != "doc_id":
        kept = kept.withColumnRenamed("doc_id", args.id_col)
    kept.write.mode("overwrite").parquet(args.out)
    # count the WRITTEN parquet (metadata-only) — re-counting `kept`
    # would re-derive the whole quality/dedup/decontam/chunk lineage
    summary = {
        "input_docs": raw_docs.count(),
        "kept_docs": spark.read.parquet(args.out).count(),
    }
    if chunk_stats is not None:
        summary["chunk_dedup"] = chunk_stats
        cd.unpersist()
    if args.bench:
        summary["contaminated_docs"] = int(n_contaminated)
        bad.unpersist()
    if args.redact_pii:
        summary["pii_redacted"] = True
    if args.pack_max_tokens:
        kept_out = spark.read.parquet(args.out)
        if args.chunk_dedup_tokens:
            # the kept parquet already carries the chunk-deduped text
            pack_src = kept_out
        else:
            pack_src = kept_out.join(
                docs.select(args.id_col, args.text_col), args.id_col
            )
        manifest = PK.pack_manifest(
            pack_src.withColumnRenamed(args.id_col, "doc_id"),
            "doc_id",
            max_tokens=args.pack_max_tokens,
            n_shards=args.pack_shards,
            text_col=args.text_col,
        )
        manifest.write.mode("overwrite").parquet(args.out + "_pack")
        # DISTINCT training windows (r2 advisory: summing per-doc window
        # spans double-counts windows straddled by multiple docs).
        # Offsets tile each shard contiguously from 0 (pinned by the
        # packing tests), so every window ≤ the shard's max is occupied:
        # count = Σ_shard (max(last_window) + 1) — one tiny aggregate,
        # no explode.
        # `or 0`: an empty manifest (every doc filtered out) makes the
        # SUM NULL, and int(None) would raise (r3 advisory)
        summary["windows"] = int(
            manifest.groupBy("shard")
            .agg(F.max("last_window").alias("mw"))
            .agg(F.sum(F.col("mw") + 1))
            .collect()[0][0]
            or 0
        )
    print(json.dumps(summary))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kcjfs")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="changelog tail → flatten → MERGE")
    pi.add_argument("--changelog-dir", required=True)
    pi.add_argument("--warehouse", required=True)
    pi.add_argument("--checkpoint", required=True)
    pi.add_argument("--buckets", type=int, default=32)
    pi.add_argument("--max-files-per-trigger", type=int, default=None)
    pi.add_argument("--timeout", type=int, default=3600)
    pi.add_argument("--coordinates", action="store_true")
    pi.set_defaults(fn=cmd_ingest)

    pg = sub.add_parser("gen-feed", help="materialize synthetic binlog fixture")
    pg.add_argument("--sf-dir", required=True)
    pg.add_argument("--out", required=True)
    pg.add_argument("--chunks", type=int, default=4)
    pg.set_defaults(fn=cmd_gen_feed)

    pc = sub.add_parser(
        "corpus-prep",
        help="quality + dedup + cluster filter → kept-docs manifest",
    )
    pc.add_argument("--docs", required=True, help="documents parquet path")
    pc.add_argument("--out", required=True)
    pc.add_argument("--id-col", default="doc_id")
    pc.add_argument("--text-col", default="text")
    pc.add_argument("--min-quality", type=float, default=0.5)
    pc.add_argument("--pack-max-tokens", type=int, default=None)
    pc.add_argument("--pack-shards", type=int, default=8)
    pc.add_argument(
        "--bench", default=None,
        help="held-out benchmark parquet; docs sharing n-grams with it "
        "are dropped (decontamination)",
    )
    pc.add_argument("--bench-text-col", default=None)
    pc.add_argument("--bench-ngram", type=int, default=8)
    pc.add_argument(
        "--redact-pii", action="store_true",
        help="scrub email/IPv4/phone spans before filtering/packing",
    )
    pc.add_argument(
        "--chunk-dedup-tokens", type=int, default=None,
        help="exact-substring dedup of surviving docs at this token-"
        "chunk size; cleaned text is written and packed",
    )
    pc.set_defaults(fn=cmd_corpus_prep)

    ps = sub.add_parser(
        "corpus-stream",
        help="streaming document ingest: dedup + quality gate → lake",
    )
    ps.add_argument("--docs-dir", required=True, help="document parquet dir")
    ps.add_argument("--warehouse", required=True)
    ps.add_argument("--checkpoint", required=True)
    ps.add_argument("--id-col", default="doc_id")
    ps.add_argument("--text-col", default="text")
    ps.add_argument("--min-quality", type=float, default=None)
    ps.add_argument("--ts-col", default=None,
                    help="event-time col: dedup within --watermark only")
    ps.add_argument("--watermark", default="1 hour")
    ps.add_argument(
        "--salt-buckets", type=int, default=None,
        help="two-phase (fp, salt)->fp dedup for duplicate-heavy feeds",
    )
    ps.add_argument("--buckets", type=int, default=64)
    ps.add_argument("--max-files-per-trigger", type=int, default=None)
    ps.add_argument("--timeout", type=int, default=3600)
    ps.add_argument(
        "--redact-pii", action="store_true",
        help="scrub email/IPv4/phone spans before the lake append",
    )
    ps.add_argument(
        "--rocksdb-state", action="store_true",
        help="RocksDB state store (unbounded corpus-lifetime dedup)",
    )
    ps.set_defaults(fn=cmd_corpus_stream)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
