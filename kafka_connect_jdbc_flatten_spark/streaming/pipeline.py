"""Structured Streaming ingest: changelog tail → flatten → MERGE.

The reference's runtime loop is Connect polling ``SourceTask.poll``
every ``poll.interval.ms`` and pushing batches into ``SinkTask.put``
(``JdbcSourceTask.java:342-376``, ``JdbcSinkTask.java:62-74``).  Here
the loop is a Structured Streaming query over a binlog-segment
directory (stand-in for ``readStream.format("kafka")`` — same
micro-batch shape, swap the source line in production):

* ``maxFilesPerTrigger`` ≈ ``batch.max.rows`` backpressure
  (``JdbcSourceConnectorConfig.java:93-97``)
* ``trigger(processingTime=...)`` ≈ ``poll.interval.ms``
  (``:87-91``); ``availableNow`` = bounded replay
* checkpointLocation = Connect's offset storage
  (``TimestampIncrementingOffset.java:54-84``) — restart resumes
  exactly where the last committed micro-batch ended
* exactly-once = checkpoint (at-least-once re-delivery) + the lake
  table's batch-id dedup + idempotent MERGE

Per-partition lineage: each micro-batch records
``max(offset) per partition`` into ``_lineage/`` next to the
warehouse, plus row counters — the observable equivalent of the
reference's per-partition offset map.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import CdcApplier
from ..plans.flatten_plan import FlattenPlan
from ..sources.changelog import CHANGELOG_SCHEMA


class StreamingIngest:
    def __init__(
        self,
        spark: SparkSession,
        changelog_dir: str,
        warehouse: str,
        plan: FlattenPlan,
        checkpoint_dir: str,
        n_buckets: int = 16,
        max_files_per_trigger: int | None = None,
        schema=None,
        compact_every: int | None = 16,
    ):
        self.spark = spark
        self.changelog_dir = changelog_dir
        self.warehouse = warehouse
        self.checkpoint_dir = checkpoint_dir
        self.schema = schema or CHANGELOG_SCHEMA
        self.max_files_per_trigger = max_files_per_trigger
        self.applier = CdcApplier(spark, warehouse, plan, n_buckets)
        # bound merge-on-read amplification: fold delta segments back
        # into the base every `compact_every` micro-batches (Iceberg's
        # rewrite_data_files maintenance, inline for a single writer)
        self.compact_every = compact_every
        self.lineage_dir = os.path.join(warehouse, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)
        self.batch_stats: list[dict] = []

    # ------------------------------------------------------------------
    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        # per-partition lineage + counters in ONE aggregate job
        lineage_rows = (
            batch_df.groupBy("partition")
            .agg(
                F.max("offset").alias("max_offset"),
                F.min("offset").alias("min_offset"),
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("deletes"),
            )
            .collect()
        )
        n_rows = sum(r["rows"] for r in lineage_rows)
        stats = self.applier.apply_batch(batch_df, batch_id=batch_id)
        if self.compact_every and (batch_id + 1) % self.compact_every == 0:
            # compact + vacuum incl. the shared _commits/ segment dir
            self.applier.maintain()
        record = {
            "batch_id": batch_id,
            "rows": n_rows,
            "partitions": {
                str(r["partition"]): {
                    "max_offset": r["max_offset"],
                    "min_offset": r["min_offset"],
                    "rows": r["rows"],
                    "deletes": r["deletes"],
                }
                for r in lineage_rows
            },
            "tables": stats,
            "wall_sec": round(time.time() - t0, 3),
        }
        self.batch_stats.append(record)
        tmp = os.path.join(self.lineage_dir, f".batch-{batch_id}.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.rename(tmp, os.path.join(self.lineage_dir, f"batch-{batch_id}.json"))

    # ------------------------------------------------------------------
    def run_available(self, timeout_sec: int | None = None) -> list[dict]:
        """Process everything currently in the changelog dir, then stop
        (bounded replay / catch-up run).  Restart-safe via checkpoint."""
        reader = self.spark.readStream.schema(self.schema)
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.option("recursiveFileLookup", "true").parquet(
            self.changelog_dir
        )
        q = (
            stream.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
        if q.exception() is not None:
            raise q.exception()
        return self.batch_stats

    def lineage(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.lineage_dir)):
            if f.startswith("batch-") and f.endswith(".json"):
                with open(os.path.join(self.lineage_dir, f)) as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda r: r["batch_id"])

    def read(self, table_name: str) -> DataFrame:
        return self.applier.read(table_name)
