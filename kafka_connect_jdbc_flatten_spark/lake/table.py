"""LakeTable — minimal lake-table format with atomic snapshot commits.

The reference gets transactionality from JDBC (`connection.commit()`,
``JdbcDbWriter.java:224``) and table DDL from auto-create/evolve
(``DbStructure.java:107-234``).  On Spark the idiomatic target is
Iceberg/Delta; those jars aren't available in this sandbox, so this
module implements the minimal subset the engine needs with the same
guarantees — it is deliberately shaped like Iceberg so a production
deployment swaps it for ``df.writeTo(...)`` / ``MERGE INTO`` with no
plan changes:

* **Snapshot isolation / atomic commit** — every commit writes a new
  immutable manifest ``_manifest/v{N}.json`` and atomically renames a
  pointer file ``_manifest/CURRENT``.  Readers resolve CURRENT once;
  a crash mid-commit leaves the old snapshot intact (rename is atomic
  on POSIX; on object stores this maps to Iceberg's metadata swap).
* **Hash-bucket layout** — rows are bucketed by
  ``pmod(xxhash64(key_cols), n_buckets)`` (same idea as Iceberg's
  ``bucket(N, conv_id)`` partition transform).  MERGE rewrites only
  the buckets a batch touches (copy-on-write), so write amplification
  is bounded by batch key spread, not table size.  At 100 TB you size
  ``n_buckets`` so a bucket ≈ a few GB; skewed hot keys spread with
  the salt column handled upstream (``operators.skew``).
* **Additive schema evolution** — new nullable columns append to the
  manifest schema; old files are read with the merged schema (missing
  columns → null).  Non-nullable additions without defaults are
  rejected, mirroring ``DbStructure.java:177-187``.
* **Exactly-once sink** — the manifest records
  ``last_committed_batch_id`` per writer; re-delivery of an already
  committed micro-batch (Structured Streaming ``foreachBatch`` replay
  after crash) is detected and skipped, giving exactly-once on top of
  at-least-once delivery.

Single-writer per table (one streaming query), like one Connect sink
task per table set; manifests are versioned so a concurrent-commit
race fails loudly rather than silently losing a snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "__bucket"
SEQ_COL = "__seq"
MOR_DELETE_COL = "__mor_del"
SEG_COL = "__seg"
# replace-mode reconcile broadcasts the delta winner map only while the
# delta segments' on-disk bytes stay under this cap (a free upper bound
# on winner-map rows); larger deltas take a shuffle join
MOR_BROADCAST_DELTA_BYTES = 256 * 1024 * 1024


class ConcurrentCommitError(RuntimeError):
    pass


class SchemaEvolutionError(ValueError):
    pass


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._manifest_dir = os.path.join(self.path, "_manifest")
        self._data_dir = os.path.join(self.path, "data")

    # ------------------------------------------------------------------ DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
        properties: dict | None = None,
        bucket_cols: list[str] | None = None,
    ) -> "LakeTable":
        """CREATE TABLE — auto-create analogue (``DbStructure.java:107-121``).

        ``bucket_cols`` (default = ``key_cols``) is the hash-layout
        key, recorded in the manifest: every bucket-pruned rewrite
        (merge, delete) validates its scope against it, so a caller
        can never silently read/rewrite the wrong buckets (r3 review:
        ``overwrite()`` bucketing by row PK while merges bucket by the
        key scope left tombstoned rows alive forever)."""
        t = cls(spark, path)
        os.makedirs(t._manifest_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        if os.path.exists(os.path.join(t._manifest_dir, "CURRENT")):
            raise FileExistsError(f"table already exists at {path}")
        manifest = {
            "version": 0,
            "schema": schema.json(),
            "key_cols": list(key_cols),
            "bucket_cols": list(bucket_cols or key_cols),
            "n_buckets": n_buckets,
            "files": {},  # bucket(str) -> [file paths]
            "last_committed_batch_id": {},  # writer_id -> batch_id
            "properties": properties or {},
            "snapshots": [],
        }
        t._write_manifest(manifest)
        return t

    @classmethod
    def create_if_not_exists(
        cls, spark, path, schema, key_cols, n_buckets=16, properties=None,
        bucket_cols=None,
    ):
        t = cls(spark, path)
        if os.path.exists(os.path.join(t._manifest_dir, "CURRENT")):
            return t
        return cls.create(
            spark, path, schema, key_cols, n_buckets, properties, bucket_cols
        )

    @classmethod
    def exists(cls, spark, path) -> bool:
        return os.path.exists(os.path.join(path, "_manifest", "CURRENT"))

    # ----------------------------------------------------------- manifests
    def _current_version(self) -> int:
        with open(os.path.join(self._manifest_dir, "CURRENT")) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        """Current manifest, or a PINNED historical snapshot when
        ``version`` is given (manifest files are immutable and never
        rewritten, so every committed version stays addressable —
        Iceberg's metadata time travel)."""
        v = self._current_version() if version is None else int(version)
        mpath = os.path.join(self._manifest_dir, f"v{v}.json")
        if not os.path.exists(mpath):
            raise ValueError(f"no snapshot v{v} for table {self.path}")
        with open(mpath) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        v = manifest["version"]
        mpath = os.path.join(self._manifest_dir, f"v{v}.json")
        tmp = mpath + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, mpath)
        cur_tmp = os.path.join(self._manifest_dir, f"CURRENT.tmp.{uuid.uuid4().hex}")
        with open(cur_tmp, "w") as f:
            f.write(str(v))
        os.rename(cur_tmp, os.path.join(self._manifest_dir, "CURRENT"))

    def _commit(self, base_version: int, manifest: dict) -> None:
        """Optimistic-concurrency commit: fail if someone moved CURRENT."""
        if self._current_version() != base_version:
            raise ConcurrentCommitError(
                f"table {self.path} moved past v{base_version}"
            )
        manifest["version"] = base_version + 1
        manifest["snapshots"] = (manifest.get("snapshots") or [])[-99:]
        manifest["snapshots"].append(
            {"version": manifest["version"], "wall_ms": int(time.time() * 1000)}
        )
        self._write_manifest(manifest)

    # --------------------------------------------------------------- reads
    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.manifest()["schema"]))

    @property
    def key_cols(self) -> list[str]:
        return self.manifest()["key_cols"]

    def snapshots(self) -> list[dict]:
        """Committed snapshot history ``[{version, wall_ms}, ...]``
        (ascending; the manifest carries the last 99)."""
        return list(self.manifest().get("snapshots") or [])

    def read_as_of(self, wall_ms: int, buckets: list[int] | None = None) -> DataFrame:
        """Time-travel read at the newest snapshot committed at or
        before ``wall_ms`` (Iceberg's ``TIMESTAMP AS OF``)."""
        eligible = [s for s in self.snapshots() if s["wall_ms"] <= wall_ms]
        if not eligible:
            raise ValueError(
                f"no snapshot of {self.path} at or before wall_ms={wall_ms}"
            )
        return self.read(buckets=buckets, version=eligible[-1]["version"])

    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """Snapshot read; ``buckets`` restricts to those partitions
        (partition pruning — only the touched buckets' files are
        scanned).  When merge-on-read delta segments exist they are
        reconciled here (latest segment wins per scope / per key, see
        ``merge(strategy="mor")``).

        ``version`` pins a historical snapshot (``VERSION AS OF``):
        manifests are immutable, so the read plan is identical — only
        the file list differs.  Data files of old snapshots survive
        until ``vacuum(retain_last=...)`` drops them; reading past the
        retention raises with guidance instead of failing mid-scan."""
        m = self.manifest(version)
        if version is not None:
            missing = [
                f
                for fl in m["files"].values()
                for f in fl
                if not os.path.exists(f)
            ] or [
                f
                for seg in m.get("segments", [])
                for fl in seg["files"].values()
                for f in fl
                if not os.path.exists(f)
            ]
            if missing:
                raise ValueError(
                    f"snapshot v{version} of {self.path} has been vacuumed "
                    f"({len(missing)} data files gone); keep more history "
                    "with vacuum(retain_last=N)"
                )
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        read_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField(BUCKET_COL, T.IntegerType(), True),
                T.StructField(MOR_DELETE_COL, T.BooleanType(), True),
            ]
        )
        segments = m.get("segments", [])

        def _files(file_map: dict) -> list[str]:
            return [
                f
                for b, fl in file_map.items()
                if buckets is None or int(b) in buckets
                for f in fl
            ]

        parts = []
        base_files = _files(m["files"])
        if base_files:
            # explicit schema ⇒ old files lacking newly-evolved columns
            # (or the MOR delete flag) read as null (additive evolution)
            parts.append(
                self.spark.read.schema(read_schema)
                .parquet(*base_files)
                .withColumn(SEG_COL, F.lit(0))
            )
        for i, seg in enumerate(segments):
            fl = _files(seg["files"])
            if fl:
                parts.append(
                    self.spark.read.schema(read_schema)
                    .parquet(*fl)
                    .withColumn(SEG_COL, F.lit(i + 1))
                )
        empty = self.spark.createDataFrame(
            [],
            T.StructType(
                list(schema.fields)
                + [T.StructField(BUCKET_COL, T.IntegerType(), True)]
            ),
        )
        if not parts:
            return empty
        allrows = parts[0]
        for p in parts[1:]:
            allrows = allrows.unionByName(p)
        if not segments:
            return allrows.drop(MOR_DELETE_COL, SEG_COL)
        return self._reconcile(allrows, m)

    def read_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """CDC egress: the keyed row-level diff between two snapshots —
        what a downstream consumer must apply to move from
        ``from_version`` to ``to_version`` (default: current).  The
        read-side complement of the ingest path (Iceberg's
        changelog/incremental scan).

        Output: ``_op ∈ {c,u,d}`` + the key columns + the TO-snapshot
        image of ``compare_cols`` (null for ``d`` rows).  Unchanged
        rows are absent.  Requires key-unique snapshots (lww/replace
        tables — the CDC apply invariant); ``compare_cols`` defaults to
        every non-key data column and is also the change predicate, so
        callers exclude bookkeeping columns (e.g. the batch seq) to
        diff on payload alone.

        Scale shape: ONE full-outer equi-join on the key columns
        between two bucket-pruned snapshot reads — both sides hash the
        same key layout, no driver-side state."""
        m_to = self.manifest(to_version)
        keys = m_to["key_cols"]
        data_cols = [
            f.name
            for f in T.StructType.fromJson(json.loads(m_to["schema"])).fields
            if f.name not in keys
        ]
        cols = list(compare_cols) if compare_cols is not None else data_cols
        bad = sorted(set(cols) - set(data_cols))
        if bad:
            raise ValueError(f"compare_cols {bad} not data columns of {self.path}")
        # columns added by auto-evolve AFTER from_version don't exist in
        # the older snapshot — read them as typed nulls, exactly how the
        # evolved read treats pre-evolution files (additive evolution)
        to_fields = {
            f.name: f.dataType
            for f in T.StructType.fromJson(json.loads(m_to["schema"])).fields
        }
        bdf = self.read(version=from_version)
        before = bdf.select(
            *keys,
            F.struct(
                *[
                    F.col(c) if c in bdf.columns
                    else F.lit(None).cast(to_fields[c]).alias(c)
                    for c in cols
                ]
            ).alias("__before"),
        )
        after = self.read(version=to_version if to_version is not None
                          else self._current_version()).select(
            *keys, F.struct(*[F.col(c) for c in cols]).alias("__after")
        )
        joined = before.join(after, on=keys, how="full_outer")
        op = (
            F.when(F.col("__before").isNull(), F.lit("c"))
            .when(F.col("__after").isNull(), F.lit("d"))
            .when(~F.col("__before").eqNullSafe(F.col("__after")), F.lit("u"))
        )
        return (
            joined.withColumn("_op", op)
            .filter(F.col("_op").isNotNull())
            .select("_op", *keys, *[F.col("__after")[c].alias(c) for c in cols])
        )

    def apply_changes(
        self,
        changes: DataFrame,
        batch_id: int | None = None,
        writer_id: str = "default",
    ) -> dict:
        """Consume a :meth:`read_changes` diff on a downstream replica:
        upsert the ``c``/``u`` rows, tombstone the ``d`` keys — the
        consumer half of the egress loop (Iceberg changelog consumer /
        the reference's sink applied to a lake replica,
        ``JdbcDbWriter.java:130-198``).

        Requires the diff to carry EVERY data column of this table
        (i.e. produced with the default ``compare_cols``): applying a
        partial-column diff with whole-row LWW would null the
        un-compared columns.  That validation runs BEFORE any schema
        evolution (against the post-evolution expected column set,
        computed without committing), so a rejected diff leaves the
        replica untouched — metadata included (r4 advisory).  Columns
        the SOURCE auto-evolved that this replica lacks then trigger
        the same additive evolution here (``evolve_schema`` — the
        apply path mirrors the ingest path's auto-evolve, S10), so an
        evolving upstream never wedges its replicas.

        Scale shape + atomicity: upserts AND tombstones land as ONE
        ``lww`` MOR delta segment — the ``d`` keys become delete-
        flagged marker rows (keys + typed nulls, the shape
        ``delete_where_keys``' mor path writes) in the same commit.
        O(diff) IO with no full-table rewrite, no mixed-segment-mode
        compaction between halves, and readers never observe a
        transient upserts-applied / deletes-pending state (r4
        advisory).  Replays of the same ``batch_id`` are no-ops (one
        writer ledger entry), so foreachBatch re-delivery of a diff
        stream is exactly-once.
        """
        m = self.manifest()
        keys = m["key_cols"]
        have = {f.name.lower() for f in self.schema.fields}
        extras = [
            f
            for f in changes.schema.fields
            if f.name != "_op" and f.name.lower() not in have
        ]
        # validate against the POST-evolution expected columns without
        # committing the evolution yet — a malformed diff must not
        # leave a schema-evolution side effect on the replica
        expected = [f.name for f in self.schema.fields] + [f.name for f in extras]
        data_cols = [c for c in expected if c not in keys]
        missing = sorted(set(["_op", *keys, *data_cols]) - set(changes.columns))
        if missing:
            raise ValueError(
                f"changes lack columns {missing}; produce the diff with the "
                "default compare_cols (all data columns) so LWW apply "
                "cannot null un-compared columns"
            )
        if extras:
            self.evolve_schema(
                T.StructType(
                    list(self.schema.fields)
                    + [T.StructField(f.name, f.dataType, True) for f in extras]
                )
            )
        batch = changes.select(
            *keys, *data_cols, (F.col("_op") == "d").alias("__apply_del")
        )
        return self.merge(
            batch,
            mode="lww",
            delete_col="__apply_del",
            batch_id=batch_id,
            writer_id=f"{writer_id}#changes",
            strategy="mor",
        )

    @staticmethod
    def _delta_bytes(segments: list) -> int:
        """On-disk bytes of the delta segments — a free driver-side
        upper bound on reconcile key-map rows, shared by the update
        and replace broadcast guards."""
        return sum(
            os.path.getsize(f)
            for seg in segments
            for fl in seg["files"].values()
            for f in fl
            if os.path.exists(f)
        )

    def _reconcile(self, allrows: DataFrame, m: dict) -> DataFrame:
        """Merge-on-read reconciliation.

        * ``replace`` segments: for each scope key that appears in any
          delta segment, ONLY the rows of its newest segment survive
          (whole-image replacement at read time); scope keys never
          touched by a delta keep their base rows.  The winner map is
          only delta-touched keys — broadcastable because compaction
          bounds the delta span.
        * ``lww`` segments: row-level winner per ``key_cols`` on
          ``(segment, seq)``.
        Rows whose winning image is a delete marker drop out.
        """
        segments = m.get("segments", [])
        modes = {s["mode"] for s in segments}
        not_deleted = ~F.coalesce(F.col(MOR_DELETE_COL), F.lit(False))
        if modes == {"append"}:
            # insert mode: every row survives, duplicates included
            # (``BufferedRecords.java:342-357`` INSERT path)
            return allrows.filter(not_deleted).drop(SEG_COL, MOR_DELETE_COL)
        if modes == {"update"}:
            # update mode: row-level winner per key, but ONLY keys that
            # already existed in the base survive — unknown keys are
            # silently ignored like SQL UPDATE (insert.mode=update,
            # ``JdbcSinkConfig.java:133-139``).  Sound because keys only
            # come into existence via the base: any other-mode commit
            # compacts first, folding segments into the base.
            #
            # The winner reduction is restricted to keys that appear in
            # a DELTA segment (r2 advisory): base rows for keys the
            # update batches never touched pass through UNCHANGED —
            # including legitimate duplicates created earlier under
            # insert.mode=insert and since compacted into the base.
            # SQL UPDATE modifies matching rows; it never deduplicates
            # rows it didn't match.
            #
            # Multiplicity (r3 advisory): SQL UPDATE modifies EACH
            # matching row — duplicate base rows for a touched key must
            # all survive, each rewritten with the winning delta image's
            # values, not be collapsed to one winner row.  So the winner
            # is reduced over DELTA rows only and its non-key values are
            # joined back onto every matching base row (an equi-join on
            # the key preserves base-row multiplicity exactly); a
            # winning delete marker drops all matching rows, which is
            # DELETE semantics.
            from ..operators.lww import lww_reduce_agg

            keys = m["key_cols"]
            base_rows = allrows.filter(F.col(SEG_COL) == 0)
            delta_rows = allrows.filter(F.col(SEG_COL) > 0)
            winner = lww_reduce_agg(delta_rows, keys, [SEG_COL, SEQ_COL])
            val_cols = [c for c in allrows.columns if c not in keys]
            winner_vals = winner.select(
                *keys, *[F.col(c).alias(f"__u_{c}") for c in val_cols]
            )
            delta_keys = winner.select(*keys)
            # same byte-bound broadcast guard as the replace reconcile:
            # delta segment bytes bound the winner-map size
            if self._delta_bytes(segments) <= MOR_BROADCAST_DELTA_BYTES:
                winner_vals = F.broadcast(winner_vals)
                delta_keys = F.broadcast(delta_keys)
            untouched = base_rows.join(delta_keys, on=keys, how="left_anti")
            # inner join: unknown delta keys (no base row) vanish —
            # SQL UPDATE silently ignores them
            updated = base_rows.join(winner_vals, on=keys, how="inner").select(
                *keys, *[F.col(f"__u_{c}").alias(c) for c in val_cols]
            )
            return (
                untouched.unionByName(updated)
                .filter(not_deleted)
                .drop(SEG_COL, MOR_DELETE_COL)
            )
        if modes == {"replace"}:
            scopes = [tuple(s["scope_keys"]) for s in segments]
            if len(set(scopes)) != 1:
                raise ValueError("mixed replace scopes; compact() first")
            scope = list(scopes[0])
            delta_keys = (
                allrows.filter(F.col(SEG_COL) > 0)
                .groupBy(*scope)
                .agg(F.max(SEG_COL).alias("__ws"))
            )
            # broadcast ONLY while the delta is provably small: on-disk
            # segment bytes (driver-side metadata, no Spark job) bound
            # the winner-map row count.  A single unbounded backfill
            # batch touches every scope key — forcing the broadcast
            # there would OOM the driver exactly like the r01 LWW bug;
            # past the cap the same join runs as a shuffle join.
            if self._delta_bytes(segments) <= MOR_BROADCAST_DELTA_BYTES:
                delta_keys = F.broadcast(delta_keys)
            out = (
                allrows.join(delta_keys, on=scope, how="left")
                .filter(F.col(SEG_COL) == F.coalesce(F.col("__ws"), F.lit(0)))
                .filter(not_deleted)
                .drop("__ws", SEG_COL, MOR_DELETE_COL)
            )
            return out
        if modes == {"lww"}:
            from ..operators.lww import lww_reduce_agg

            winner = lww_reduce_agg(
                allrows, m["key_cols"], [SEG_COL, SEQ_COL]
            )
            return winner.filter(not_deleted).drop(SEG_COL, MOR_DELETE_COL)
        raise ValueError(f"mixed segment modes {modes}; compact() between them")

    def last_batch_id(self, writer_id: str) -> int:
        return self.manifest()["last_committed_batch_id"].get(writer_id, -1)

    # -------------------------------------------------------------- writes
    def _align(self, df: DataFrame) -> DataFrame:
        """Pad a batch missing newly-evolved columns with typed nulls —
        a pre-evolution (narrower-schema) writer stays valid after
        auto-evolve, mirroring the reference's tolerance of extra DB
        columns (``DbStructure.java:134-137``)."""
        for f in self.schema.fields:
            if f.name not in df.columns:
                if not f.nullable:
                    raise SchemaEvolutionError(
                        f"batch lacks non-optional column {f.name!r}"
                    )
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df

    def _bucket_expr(self, key_cols=None):
        m = self.manifest()
        kc = key_cols or m.get("bucket_cols") or m["key_cols"]
        return F.pmod(F.xxhash64(*[F.col(c) for c in kc]), F.lit(m["n_buckets"])).cast(
            "int"
        )

    def _check_layout_scope(self, scope: list[str], m: dict) -> None:
        """Bucket-pruned rewrites must hash with the table's recorded
        layout key, or the touched-bucket probe reads the wrong files
        and rows silently survive deletes/merges.

        Manifests created before ``bucket_cols`` existed don't record
        their physical layout, and it is NOT ``key_cols``: the pre-
        ``bucket_cols`` write path bucketed by the MERGE scope (the
        key-derived PKs) while ``key_cols`` held the row PK — child
        tables (row PK ⊃ key scope) would fail this check on every
        merge forever after an upgrade (r3 advisory).  The first
        validated rewrite's scope IS that historical layout (every
        write path passes the same scope the old code bucketed by),
        so backfill ``bucket_cols`` from it: the caller commits the
        manifest it validated, making the migration durable one-time.
        """
        layout = m.get("bucket_cols")
        if layout is None:
            m["bucket_cols"] = list(scope)
            return
        if list(scope) != list(layout):
            raise ValueError(
                f"scope {list(scope)} does not match table bucket layout "
                f"{list(layout)} at {self.path}; rewriting by a different "
                "hash key would miss existing rows"
            )

    def with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(BUCKET_COL, self._bucket_expr())

    def _write_bucket_files(self, df: DataFrame, commit_id: str) -> dict[str, list[str]]:
        """Write new state for the touched buckets; returns bucket→files.

        The bucket id is duplicated into a partition column so the
        directory layout is per-bucket, while the data column survives
        in the parquet files (manifest reads use explicit file lists,
        which bypass Hive partition discovery).
        """
        out_dir = os.path.join(self._data_dir, f"commit-{commit_id}")
        part_col = BUCKET_COL + "_p"
        (
            df.withColumn(part_col, F.col(BUCKET_COL))
            .repartition(F.col(BUCKET_COL))
            .write.partitionBy(part_col)
            .mode("overwrite")
            .parquet(out_dir)
        )
        new_files: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{part_col}="):
                continue
            b = entry.split("=", 1)[1]
            bdir = os.path.join(out_dir, entry)
            new_files[b] = [
                os.path.join(bdir, f)
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            ]
        return new_files

    def overwrite(self, df: DataFrame, batch_id: int | None = None, writer_id: str = "default") -> None:
        """Replace the whole table (bootstrap/backfill path)."""
        base = self._current_version()
        m = self.manifest()
        commit_id = uuid.uuid4().hex[:12]
        new_files = self._write_bucket_files(self.with_bucket(df), commit_id)
        m["files"] = new_files
        m["segments"] = []
        # overwrite rewrites EVERY bucket with _bucket_expr()'s hash —
        # record that layout on legacy manifests lacking bucket_cols so
        # a later _check_layout_scope backfill can't stamp a different
        # scope than the bytes on disk are hashed by
        m.setdefault("bucket_cols", m["key_cols"])
        if batch_id is not None:
            m["last_committed_batch_id"][writer_id] = batch_id
        self._commit(base, m)

    def merge(
        self,
        batch: DataFrame,
        mode: str = "lww",
        scope_keys: list[str] | None = None,
        seq_col: str | None = SEQ_COL,
        delete_col: str | None = None,
        batch_id: int | None = None,
        writer_id: str = "default",
        strategy: str = "mor",
    ) -> dict:
        """MERGE a (pre-flattened) batch into the table.

        Strategies:

        * ``mor`` (merge-on-read, default) — write ONLY the batch as a
          new delta segment (O(batch) IO per commit); ``read()``
          reconciles (newest segment wins per scope/key) and
          ``compact()`` folds segments back into the base.  This is
          the CDC-ingest shape (Iceberg MOR / position-delete
          equivalent): at 10^10 events a copy-on-write that rewrites
          every touched bucket per micro-batch is O(table·batches).
        * ``cow`` (copy-on-write) — rewrite the touched buckets so the
          base is always reconciled; auto-compacts first if delta
          segments exist.  Best for read-heavy tables with rare
          batches.

        Modes:

        * ``lww`` — row-level MERGE keyed on ``key_cols``: keep the
          winning row per key; rows whose winning image has
          ``delete_col = true`` are dropped (tombstone,
          ``BufferedRecords.java:91-103``).  Winner order differs by
          strategy ON PURPOSE: ``cow`` reconciles eagerly on
          ``seq_col`` alone (re-applying any prefix of the changelog
          can never regress a key — MERGE condition ≈
          ``src.seq >= tgt.seq``), while ``mor`` delta segments
          reconcile on ``(commit order, seq)`` — the apply order IS
          the authority, matching the reference's buffer-flush
          ordering where the last flushed statement wins
          (``BufferedRecords.java`` flush order), and ``CdcApplier``
          reduces each batch to one image per key on ``seq`` first,
          so segment order and seq order agree on the CDC path
          (pinned by ``test_mor_out_of_order_seq_within_lww``).
        * ``replace`` — whole-image replacement, the reference's
          flatten-upsert (delete-then-insert,
          ``BufferedRecords.java:264-270, 377-415``): every existing
          row whose ``scope_keys`` appear in the batch is deleted,
          then the batch rows (minus tombstoned scopes) are inserted.
          Child rows of a shrunk array disappear, matching the
          1/1/1 upsert-replay golden
          (``JdbcSinkTaskTestPostgresArray.java:1708-1874``).

        Exactly-once: if ``batch_id`` ≤ the manifest's recorded id for
        ``writer_id`` the merge is a no-op (foreachBatch re-delivery).
        """
        if strategy == "mor":
            return self._merge_mor(
                batch, mode, scope_keys, delete_col, batch_id, writer_id
            )
        if strategy != "cow":
            raise ValueError(f"unknown merge strategy {strategy!r}")
        if self.manifest().get("segments"):
            self.compact()

        base = self._current_version()
        m = self.manifest()
        if batch_id is not None and batch_id <= m["last_committed_batch_id"].get(writer_id, -1):
            return {"skipped": True, "reason": "batch already committed"}

        table_cols = [f.name for f in self.schema.fields]
        scope = scope_keys or m["key_cols"]
        self._check_layout_scope(scope, m)

        batch = self._align(batch).withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(*[F.col(c) for c in scope]), F.lit(m["n_buckets"])).cast("int"),
        ).persist()  # consumed by the touched-bucket probe AND the write
        # Which buckets does this batch touch?  Tiny aggregate (≤ n_buckets
        # rows) — the lake-format analogue of partition pruning.
        touched = [r[0] for r in batch.select(BUCKET_COL).distinct().collect()]
        if not touched:
            batch.unpersist()
            if batch_id is not None:
                m["last_committed_batch_id"][writer_id] = batch_id
                self._commit(base, m)
            return {"skipped": True, "reason": "empty batch"}

        old = self.read(buckets=touched)

        if mode == "replace":
            # keys present in the batch (including tombstoned scopes)
            batch_scopes = batch.select(*scope, BUCKET_COL).distinct()
            keep_old = old.join(batch_scopes.select(*scope), on=scope, how="left_anti")
            inserts = batch
            if delete_col is not None and delete_col in batch.columns:
                inserts = inserts.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
            new_state = keep_old.select(*table_cols, BUCKET_COL).unionByName(
                inserts.select(*table_cols, BUCKET_COL)
            )
        elif mode == "lww":
            keys = m["key_cols"]
            sc = seq_col or SEQ_COL
            b = batch
            if delete_col is None or delete_col not in b.columns:
                b = b.withColumn("__is_delete", F.lit(False))
            else:
                b = b.withColumn(
                    "__is_delete", F.coalesce(F.col(delete_col), F.lit(False))
                )
            o = old.withColumn("__is_delete", F.lit(False))
            allrows = o.select(*table_cols, BUCKET_COL, "__is_delete").unionByName(
                b.select(*table_cols, BUCKET_COL, "__is_delete")
            )
            from ..operators.lww import lww_reduce

            winner = lww_reduce(allrows, keys, [sc])
            new_state = winner.filter(~F.col("__is_delete")).drop("__is_delete")
        elif mode == "append":
            # insert mode: pure append, duplicates tolerated
            new_state = old.select(*table_cols, BUCKET_COL).unionByName(
                batch.select(*table_cols, BUCKET_COL)
            )
        elif mode == "update":
            # modify-only: every OLD row whose row key appears in the
            # batch is rewritten with the winning batch image's values —
            # SQL UPDATE modifies EACH matching row, so duplicate base
            # rows (earlier insert-mode history) keep their multiplicity
            # instead of collapsing to one winner (r3 advisory); unknown
            # keys are silently ignored (PostgreSqlDatabaseDialect
            # update path, insert.mode=update).  Matching is on
            # key_cols (row PK); bucketing stays on ``scope`` so the
            # layout matches every other write path.
            from ..operators.lww import lww_reduce_agg

            keys = m["key_cols"]
            sc = seq_col or SEQ_COL
            winner = lww_reduce_agg(batch, keys, [sc])
            is_del_w = (
                F.coalesce(F.col(delete_col), F.lit(False))
                if delete_col is not None and delete_col in batch.columns
                else F.lit(False)
            )
            val_cols = [c for c in table_cols if c not in keys]
            winner_vals = winner.select(
                *keys,
                is_del_w.alias("__w_del"),
                *[F.col(c).alias(f"__u_{c}") for c in val_cols],
            )
            keep_old = old.join(
                winner_vals.select(*keys), on=keys, how="left_anti"
            )
            # inner join on the row key preserves old-row multiplicity;
            # a winning tombstone drops all matching rows (DELETE)
            updated = (
                old.join(winner_vals, on=keys, how="inner")
                .filter(~F.col("__w_del"))
                .select(
                    *keys,
                    *[F.col(f"__u_{c}").alias(c) for c in val_cols],
                    F.col(BUCKET_COL),
                )
            )
            new_state = keep_old.select(*table_cols, BUCKET_COL).unionByName(
                updated.select(*table_cols, BUCKET_COL)
            )
        else:
            raise ValueError(f"unknown merge mode {mode!r}")

        commit_id = uuid.uuid4().hex[:12]
        new_files = self._write_bucket_files(new_state, commit_id)
        batch.unpersist()
        files = dict(m["files"])
        for tb in touched:
            files.pop(str(tb), None)
        for b_, fl in new_files.items():
            files[b_] = fl
        m["files"] = files
        if batch_id is not None:
            m["last_committed_batch_id"][writer_id] = batch_id
        self._commit(base, m)
        return {
            "skipped": False,
            "touched_buckets": len(touched),
            "version": m["version"],
        }

    def _merge_mor(
        self,
        batch: DataFrame,
        mode: str,
        scope_keys: list[str] | None,
        delete_col: str | None,
        batch_id: int | None,
        writer_id: str,
    ) -> dict:
        """Merge-on-read commit: the batch lands as a delta segment.

        No old-state read, no probe job, no table rewrite — one
        bucketed write of the batch plus the manifest swap.  Delete
        markers persist in the ``__mor_del`` column; ``read()``
        resolves winners, ``compact()`` folds the log.
        """
        if mode not in ("replace", "lww", "append", "update"):
            raise ValueError(f"unknown merge mode {mode!r}")
        base = self._current_version()
        m = self.manifest()
        if batch_id is not None and batch_id <= m["last_committed_batch_id"].get(writer_id, -1):
            return {"skipped": True, "reason": "batch already committed"}
        existing_modes = {s["mode"] for s in m.get("segments", [])}
        if existing_modes and existing_modes != {mode}:
            self.compact()
            base = self._current_version()
            m = self.manifest()

        table_cols = [f.name for f in self.schema.fields]
        scope = scope_keys or m["key_cols"]
        self._check_layout_scope(scope, m)
        out = self._align(batch).withColumn(
            BUCKET_COL,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in scope]), F.lit(m["n_buckets"])
            ).cast("int"),
        )
        if delete_col is not None and delete_col in batch.columns:
            out = out.withColumn(
                MOR_DELETE_COL, F.coalesce(F.col(delete_col), F.lit(False))
            )
        else:
            out = out.withColumn(MOR_DELETE_COL, F.lit(False))
        out = out.select(*table_cols, BUCKET_COL, MOR_DELETE_COL)

        commit_id = uuid.uuid4().hex[:12]
        new_files = self._write_bucket_files(out, commit_id)
        return self.commit_segment(new_files, mode, scope, batch_id, writer_id)

    def commit_segment(
        self,
        files_by_bucket: dict[str, list[str]],
        mode: str,
        scope_keys: list[str],
        batch_id: int | None = None,
        writer_id: str = "default",
        _base: int | None = None,
    ) -> dict:
        """Append already-written data files as a delta segment (the
        metadata half of a MOR commit — lets a caller write MANY
        tables' segments in one Spark job, then commit each manifest)."""
        base = self._current_version() if _base is None else _base
        m = self.manifest()
        if batch_id is not None and batch_id <= m["last_committed_batch_id"].get(writer_id, -1):
            return {"skipped": True, "reason": "batch already committed"}
        self._check_layout_scope(list(scope_keys), m)
        existing_modes = {s["mode"] for s in m.get("segments", [])}
        if existing_modes and existing_modes != {mode}:
            self.compact()
            base = self._current_version()
            m = self.manifest()
            # re-validate against the re-read manifest: on a legacy
            # manifest the first check backfilled ``bucket_cols`` into
            # the now-discarded copy of ``m``; committing without it
            # would let a later writer backfill a DIFFERENT layout
            # unchallenged and bucket-prune against the wrong files
            self._check_layout_scope(list(scope_keys), m)
        if not files_by_bucket:
            if batch_id is not None:
                m["last_committed_batch_id"][writer_id] = batch_id
                self._commit(base, m)
            return {"skipped": True, "reason": "empty batch"}
        m.setdefault("segments", []).append(
            {
                "id": uuid.uuid4().hex[:12],
                "mode": mode,
                "scope_keys": list(scope_keys),
                "files": files_by_bucket,
            }
        )
        if batch_id is not None:
            m["last_committed_batch_id"][writer_id] = batch_id
        self._commit(base, m)
        return {
            "skipped": False,
            "strategy": "mor",
            "segments": len(m["segments"]),
            "version": m["version"],
        }

    def compact(self) -> dict:
        """Fold delta segments into the base (the maintenance half of
        merge-on-read — Iceberg's rewrite_data_files).  Read
        amplification returns to zero; safe to run any time.

        Bucket-scoped (r3 review): only buckets referenced by a delta
        segment are read + rewritten — untouched base buckets keep
        their existing files byte-for-byte.  Sound because every
        reconcile is bucket-local: rows joinable by the reconcile keys
        (scope for replace, row PK for lww/update — both hash-equal
        under the recorded ``bucket_cols`` layout, which every segment
        commit validates) always share a bucket, so a bucket with no
        delta files reconciles to exactly its base rows.  At 100 TB
        this turns the one remaining O(table) maintenance pass into
        O(delta-touched buckets)."""
        m = self.manifest()
        segments = m.get("segments")
        if not segments:
            return {"skipped": True, "reason": "no segments"}
        base = self._current_version()
        touched = sorted({int(b) for seg in segments for b in seg["files"]})
        state = self.read(buckets=touched)  # reconciled, carries BUCKET_COL
        commit_id = uuid.uuid4().hex[:12]
        new_files = self._write_bucket_files(state, commit_id)
        files = dict(m["files"])
        for tb in touched:
            files.pop(str(tb), None)
        for b_, fl in new_files.items():
            files[b_] = fl
        m["files"] = files
        m["segments"] = []
        self._commit(base, m)
        return {
            "skipped": False,
            "version": m["version"],
            "touched_buckets": len(touched),
        }

    def delete_where_keys(
        self,
        keys_df: DataFrame,
        scope_keys: list[str],
        batch_id: int | None = None,
        writer_id: str = "default",
        strategy: str = "cow",
    ) -> dict:
        """Tombstone apply: delete every row matching the key set —
        the reference wipes matching rows from all topic tables
        (``JdbcDbWriter.java:130-198``).

        ``strategy="mor"`` commits a marker-only replace segment
        (scope keys + nulls, delete-flagged — the same shape the CDC
        apply's tombstone markers use) instead of rewriting the
        touched buckets: O(keys) IO per delete instead of O(touched
        buckets), the shape a wide tombstone fan-out wants at scale.
        Falls back to copy-on-write when the schema has a non-nullable
        non-scope column (the marker row can't be padded)."""
        if strategy == "mor":
            from pyspark.sql import functions as _F

            del_col = "__dwk_delete"
            batch = (
                keys_df.select(*scope_keys)
                .distinct()
                .withColumn(SEQ_COL, _F.lit(None).cast("long"))
                .withColumn(del_col, _F.lit(True))
            )
            try:
                return self.merge(
                    batch,
                    mode="replace",
                    scope_keys=list(scope_keys),
                    delete_col=del_col,
                    batch_id=batch_id,
                    writer_id=writer_id,
                    strategy="mor",
                )
            except SchemaEvolutionError:
                pass  # non-nullable non-scope column → COW below
        elif strategy != "cow":
            raise ValueError(f"unknown delete strategy {strategy!r}")
        if self.manifest().get("segments"):
            self.compact()  # the COW rewrite below only touches base files
        m = self.manifest()
        base = self._current_version()
        if batch_id is not None and batch_id <= m["last_committed_batch_id"].get(writer_id, -1):
            return {"skipped": True, "reason": "batch already committed"}
        table_cols = [f.name for f in self.schema.fields]
        self._check_layout_scope(list(scope_keys), m)
        keys_df = keys_df.select(*scope_keys).distinct().withColumn(
            BUCKET_COL,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in scope_keys]), F.lit(m["n_buckets"])
            ).cast("int"),
        )
        touched = [r[0] for r in keys_df.select(BUCKET_COL).distinct().collect()]
        if not touched:
            return {"skipped": True, "reason": "no keys"}
        old = self.read(buckets=touched)
        new_state = old.join(
            keys_df.select(*scope_keys), on=scope_keys, how="left_anti"
        ).select(*table_cols, BUCKET_COL)
        commit_id = uuid.uuid4().hex[:12]
        new_files = self._write_bucket_files(new_state, commit_id)
        files = dict(m["files"])
        for tb in touched:
            files.pop(str(tb), None)
        for b_, fl in new_files.items():
            files[b_] = fl
        m["files"] = files
        if batch_id is not None:
            m["last_committed_batch_id"][writer_id] = batch_id
        self._commit(base, m)
        return {"skipped": False, "touched_buckets": len(touched)}

    # ----------------------------------------------------------- evolution
    def evolve_schema(self, new_schema: T.StructType) -> list[str]:
        """Additive evolution (auto-evolve, ``DbStructure.java:127-234``).

        Extra existing columns are tolerated; missing-in-table columns
        are added if nullable, else rejected (same rule as
        ``DbStructure.java:177-187``).  Case-insensitive matching as in
        ``DbStructure.java:236-281``.
        """
        base = self._current_version()
        m = self.manifest()
        cur = T.StructType.fromJson(json.loads(m["schema"]))
        have = {f.name.lower() for f in cur.fields}
        added = []
        fields = list(cur.fields)
        for f in new_schema.fields:
            if f.name.lower() in have:
                continue
            if not f.nullable:
                raise SchemaEvolutionError(
                    f"cannot add non-optional column {f.name!r} without a "
                    "default (DbStructure.java:177-187)"
                )
            fields.append(f)
            added.append(f.name)
        if added:
            m["schema"] = T.StructType(fields).json()
            self._commit(base, m)
        return added

    # -------------------------------------------------------------- maint
    def vacuum(self, retain_last: int = 1) -> int:
        """Delete data files unreferenced by the ``retain_last`` newest
        snapshots (default 1 = current only — Iceberg's
        ``expire_snapshots``).  Versions inside the retention window
        stay time-travel-readable after the vacuum."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        cur = self._current_version()
        live: set[str] = set()
        for v in range(max(0, cur - int(retain_last) + 1), cur + 1):
            try:
                m = self.manifest(v)
            except ValueError:
                continue
            live |= {os.path.abspath(p) for fl in m["files"].values() for p in fl}
            for seg in m.get("segments", []):
                live |= {
                    os.path.abspath(p) for fl in seg["files"].values() for p in fl
                }
        removed = 0
        for root, _dirs, fs in os.walk(self._data_dir):
            for f in fs:
                p = os.path.abspath(os.path.join(root, f))
                if p.endswith(".parquet") and p not in live:
                    os.remove(p)
                    removed += 1
        # drop empty commit dirs
        for entry in os.listdir(self._data_dir):
            d = os.path.join(self._data_dir, entry)
            if os.path.isdir(d) and not any(os.scandir(d)):
                shutil.rmtree(d, ignore_errors=True)
        return removed


def gc_unreferenced(roots: list[str], tables: list["LakeTable"]) -> int:
    """Warehouse-level GC: delete parquet files under ``roots`` not
    referenced by ANY table's current snapshot (base files or delta
    segments), then prune empty directories.

    Needed because the union write path lands multi-table segment
    files under a shared ``warehouse/_commits/`` directory OUTSIDE
    every table's data dir — per-table ``vacuum()`` never walks there,
    so after ``compact()`` those files would be orphaned forever
    (unbounded disk growth on the default streaming path).
    """
    live: set[str] = set()
    for t in tables:
        m = t.manifest()
        live |= {os.path.abspath(p) for fl in m["files"].values() for p in fl}
        for seg in m.get("segments", []):
            live |= {
                os.path.abspath(p) for fl in seg["files"].values() for p in fl
            }
    removed = 0
    for root in roots:
        if not os.path.isdir(root):
            continue
        for r, _dirs, fs in os.walk(root):
            for f in fs:
                p = os.path.abspath(os.path.join(r, f))
                if p.endswith(".parquet") and p not in live:
                    os.remove(p)
                    removed += 1
        # a commit dir holding no live parquet anymore is dead wholesale
        # (only _SUCCESS markers and empty partition dirs remain)
        for entry in os.listdir(root):
            d = os.path.join(root, entry)
            if not os.path.isdir(d):
                continue
            has_live = any(
                os.path.abspath(os.path.join(r, f)) in live
                for r, _dirs, fs in os.walk(d)
                for f in fs
            )
            if not has_live:
                shutil.rmtree(d, ignore_errors=True)
    return removed
