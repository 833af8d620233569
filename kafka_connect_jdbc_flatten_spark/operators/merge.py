"""CDC apply — flatten a changelog micro-batch and MERGE it into lake
tables.

Spark-side equivalent of the reference's sink write path
(``JdbcDbWriter.write`` → per-table ``BufferedRecords`` → flush +
``connection.commit()``, ``JdbcDbWriter.java:60-225``), with the
ordering machinery replaced by a per-key last-writer-wins reduction
and the JDBC transaction replaced by the lake table's atomic snapshot
commit.

Semantics preserved:

* **upsert = whole-image replacement** — a new record image fully
  replaces the previous image in every target table, including child
  rows of shrunk arrays (delete-then-insert,
  ``BufferedRecords.java:264-270, 377-415``; golden 1/1/1 counts
  ``JdbcSinkTaskTestPostgresArray.java:1708-1874``).
* **tombstones delete from every table of the topic**
  (``JdbcDbWriter.java:130-198``) using the key-derived PK columns
  only (``keyFieldNamesInKey``, ``BufferedRecords.java:399-415``).
* **per-key op order** — the reference flushes buffers to keep JDBC
  statement order; we reduce each batch to the newest envelope per
  record key on the binlog total order ``(seq)`` before flattening,
  so at most one image per key reaches MERGE.
* **exactly-once** — batch ids recorded in each table's manifest make
  re-delivered micro-batches no-ops.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark.errors.exceptions.captured import AnalysisException

from ..lake.table import BUCKET_COL, MOR_DELETE_COL, SEQ_COL, LakeTable
from ..plans.flatten_plan import ARRAY, MAP, FlattenPlan, TableSpec
from .explode import flatten_table, has_rows_expr
from .lww import lww_reduce_auto

DELETE_COL = "__is_delete"


def _union_compatible(plan: FlattenPlan) -> bool:
    """True iff every column name shared by two target tables has the
    SAME dataType.  ``unionByName`` silently widens compatible numerics
    (int ∪ long → long) and the widened parquet would be durably
    committed as a segment a later ``read()`` (explicit narrower
    schema) cannot read — so differing types must route to per-table
    merges BEFORE writing, not via a caught AnalysisException."""
    types: dict[str, object] = {}
    for spec in plan.tables:
        for f in spec.spark_schema.fields:
            prev = types.setdefault(f.name, f.dataType)
            if prev != f.dataType:
                return False
    return True


class CdcApplier:
    """Applies CDC envelope batches to one lake table per TableSpec.

    Envelope contract (see ``sources.changelog``): columns
    ``topic, partition, offset, timestamp, timestamp_type, key, value,
    op, seq`` where ``op ∈ {c,u,d}`` (``d`` may also arrive as a null
    ``value`` = tombstone) and ``seq`` is the binlog position.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        plan: FlattenPlan,
        n_buckets: int = 16,
        max_broadcast_keys: int = 8_000_000,
    ):
        if not plan.tables:
            raise ValueError("plan has no target tables")
        self.spark = spark
        self.warehouse = warehouse
        self.plan = plan
        self.max_broadcast_keys = max_broadcast_keys
        self._union_ok = _union_compatible(plan)
        self.tables: dict[str, LakeTable] = {}
        for spec in plan.tables:
            schema = T.StructType(
                list(spec.spark_schema.fields)
                + [T.StructField(SEQ_COL, T.LongType(), True)]
            )
            keys = list(spec.merge_keys) or [c.out_name for c in spec.columns]
            path = os.path.join(warehouse, spec.table_name)
            if not plan.config.auto_create and not LakeTable.exists(spark, path):
                raise ValueError(
                    f"Table {spec.table_name} is missing and auto-creation "
                    "is disabled (auto.create=false, DbStructure.java:105-110)"
                )
            # the topic is stamped into the manifest so warehouse-wide
            # operations (tombstone fan-out, GC) can scope by topic
            # exactly, independent of table renames or prefix collisions;
            # bucket_cols records the hash layout (the MERGE scope = the
            # key-derived PKs) so every bucket-pruned rewrite — including
            # overwrite() bootstraps — provably hashes the same way
            scope = list(spec.key_merge_keys) or keys
            self.tables[spec.table_name] = LakeTable.create_if_not_exists(
                spark, path, schema, keys, n_buckets,
                properties={"topic": plan.config.topic},
                bucket_cols=scope,
            )

    # ------------------------------------------------------------------
    def apply_batch(
        self,
        changelog: DataFrame,
        batch_id: int | None = None,
        strategy: str = "mor",
        writer_suffix: str = "",
        n_rows_hint: int | None = None,
    ) -> dict:
        """Flatten + MERGE one micro-batch.  Returns per-table stats.

        ``writer_suffix`` namespaces the exactly-once batch-id ledger —
        the schema-drift path applies one micro-batch as several
        per-schema sub-batches, each needing its own dedup key.
        ``n_rows_hint`` (batch row count, if the caller already knows
        it) makes the LWW broadcast-size guard free."""
        plan = self.plan
        key_cols = [c for c in plan.key_pk_columns]
        if not key_cols:
            raise ValueError(
                "CDC apply requires key-derived PKs (pk_mode=flatten + "
                "pk.fields on the key) — same constraint as "
                "FlattenTransformation.java:166-175"
            )

        # Project to the columns the apply actually needs BEFORE
        # reducing: `.persist()` below is a column-pruning barrier, so
        # without this the scan deserializes envelope bytes — the
        # `before` image, and the Kafka coordinates when no table
        # selects them — that nothing downstream reads.
        base_cols = {"key", "value", "op", "seq"}
        if any(
            c.source[0] == "coord" for spec in self.plan.tables for c in spec.columns
        ):
            base_cols |= {"topic", "partition", "offset", "timestamp", "timestamp_type"}
        needed = [c for c in changelog.columns if c in base_cols]
        changelog = changelog.select(*needed)

        imode = self.plan.config.insert_mode
        if imode == "insert":
            # insert.mode=insert (JdbcSinkConfig.java:133-139): every
            # record appended as-is — no LWW collapse, duplicates
            # tolerated; tombstones are ignored (delete requires the
            # upsert/update paths).  One appended row per flattened
            # record = the reference's insert-count validation shape
            # (BufferedRecords.java:228-239).
            return self._apply_insert(changelog, batch_id, strategy, writer_suffix)
        if imode not in ("upsert", "update"):
            raise ValueError(f"unknown insert_mode {imode!r}")
        # one image per key per batch: LWW on the binlog order.
        # Broadcast-winner form while the winner set fits a broadcast:
        # the wide envelope rows (after images) are NEVER shuffled —
        # only (key, seq) pairs move (a column-pruned two-column scan),
        # the body is kept by a broadcast-semi probe.  On a 423 MB/s-
        # disk sandbox the shuffling forms were IO-bound and didn't
        # scale 8→32 cores at all; this form leaves the scan
        # embarrassingly parallel.  Beyond ``max_broadcast_keys``
        # distinct keys (unbounded backfill batches) the guard falls
        # back to the max_by aggregate form — one shuffle instead of a
        # driver-sized broadcast.  The reduced set is persisted:
        # every target table's flatten + its tombstone scan reads it
        # instead of re-running the reduction 2×n_tables times.
        reduced, _n_rows = lww_reduce_auto(
            changelog, ["key"], ["seq"], self.max_broadcast_keys, n_rows_hint
        )
        is_del = F.col("op").eqNullSafe("d") | F.col("value").isNull()
        upserts = reduced.filter(~is_del)
        # tombstones are a sliver of a CDC batch but every target table
        # derives its delete rows from them — cache the sliver so the
        # per-table scans don't each re-read the full winner cache
        deletes = reduced.filter(is_del).persist()

        if imode == "update":
            # insert.mode=update: modify-only, unknown keys silently
            # ignored (SQL UPDATE semantics,
            # PostgreSqlDatabaseDialect update path)
            stats = self._apply_update(
                upserts, deletes, batch_id, strategy, writer_suffix
            )
            stats.update(
                self._delete_from_foreign_tables(deletes, batch_id, writer_suffix)
            )
            deletes.unpersist()
            reduced.unpersist()
            return stats

        stats: dict[str, dict] = {}
        if strategy == "mor" and self._union_ok:
            applied = False
            try:
                stats = self._apply_mor_union(
                    upserts, deletes, batch_id, writer_suffix
                )
                applied = True
            except AnalysisException:
                # backstop only — _union_ok already routed same-name/
                # different-type plans to the per-table path below.
                # The backstop covers ONLY the union write/commit: the
                # foreign-delete fan-out runs OUTSIDE it (r3 review —
                # an exception there after the segments durably
                # committed would otherwise trigger a full, duplicate
                # per-table re-apply).
                pass
            if applied:
                stats.update(
                    self._delete_from_foreign_tables(
                        deletes, batch_id, writer_suffix
                    )
                )
                deletes.unpersist()
                reduced.unpersist()
                return stats

        def _merge_one(spec: TableSpec) -> tuple[str, dict]:
            table = self.tables[spec.table_name]
            batch_rows = self._batch_rows(spec, upserts, deletes)
            scope = list(spec.key_merge_keys) or list(spec.merge_keys)
            return spec.table_name, table.merge(
                batch_rows,
                mode="replace",
                scope_keys=scope,
                delete_col=DELETE_COL,
                batch_id=batch_id,
                writer_id=spec.table_name + writer_suffix,
                strategy=strategy,
            )

        # Target tables are independent — submit their MERGEs as
        # concurrent Spark jobs (the reference flags this as possible
        # but applies serially, FlattenTransformation.java:89-91 /
        # JdbcDbWriter.java:217-223; on Spark the scheduler interleaves
        # the stages, hiding each table's fixed job latency).
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(plan.tables)) as pool:
            for name, st in pool.map(_merge_one, plan.tables):
                stats[name] = st
        stats.update(
            self._delete_from_foreign_tables(deletes, batch_id, writer_suffix)
        )
        deletes.unpersist()
        reduced.unpersist()
        return stats

    def _delete_from_foreign_tables(
        self, deletes: DataFrame, batch_id: int | None, writer_suffix: str
    ) -> dict:
        """Tombstones wipe matching rows from EVERY table of the topic
        (``JdbcDbWriter.java:130-198``) — including tables only ANOTHER
        schema fingerprint's plan knows.  Under drift a tombstone is
        carried with whatever value schema its producer last used; a
        key inserted under a LATER schema has child rows in tables this
        plan has never seen.  Foreign tables are discovered from the
        warehouse catalog by topic prefix; the delete key is the
        key-derived PK, which propagates to every table of the topic
        with the same names (key-PK propagation) and is also every
        table's bucketing scope under CDC apply, so the bucket-pruned
        ``delete_where_keys`` rewrite is layout-consistent."""
        if not self.plan.config.delete_enabled:
            return {}
        from ..sources.monitor import TableMonitor

        cfg = self.plan.config
        topic_part = cfg.case(
            cfg.topic.replace(".", cfg.delimiter).lower()
        ).lower()
        delim = cfg.delimiter.lower()

        # manifest-property lookups are cached: the topic property is
        # immutable (stamped at create), and re-reading every warehouse
        # table's manifest per tombstone-bearing micro-batch would be
        # O(tables) driver file IO on the hot path (r3 review)
        cache: dict[str, bool] = getattr(self, "_same_topic_cache", None)
        if cache is None:
            cache = self._same_topic_cache = {}

        def _same_topic(name: str) -> bool:
            # exact scoping via the manifest's topic property (stamped
            # at create time) — a name-prefix test alone both matches a
            # DIFFERENT topic whose delimiter-joined name shares the
            # prefix (topic "shop" vs "shop.orders" under "_") and
            # misses same-topic tables renamed out of the prefix via
            # rename_tables.  Tables created before the property existed
            # fall back to the prefix test.
            if name in cache:
                return cache[name]
            try:
                props = LakeTable(
                    self.spark, os.path.join(self.warehouse, name)
                ).manifest().get("properties") or {}
            except OSError:
                return False  # not cached: transient read failure
            if "topic" in props:
                same = props["topic"] == cfg.topic
            else:
                same = name.lower() == topic_part or name.lower().startswith(
                    topic_part + delim
                )
            cache[name] = same
            return same

        foreign = [
            n
            for n in TableMonitor(self.warehouse).list_tables()
            if n not in self.tables and _same_topic(n)
        ]
        if not foreign:
            return {}
        keys_df = deletes.select(*self._key_exprs(None)).distinct()
        if keys_df.limit(1).count() == 0:
            return {}
        scope = [c.out_name for c in self.plan.key_pk_columns]
        stats = {}
        for name in foreign:
            table = LakeTable(self.spark, os.path.join(self.warehouse, name))
            # per-table error isolation (r3 advisory): this fan-out runs
            # AFTER the main tables' segments are durably committed, so
            # an incompatible foreign table (layout mismatch, corrupt
            # manifest) raising here would crash-loop the stream — on
            # retry the main tables skip via the batch ledger and the
            # foreign call re-raises forever.  Surface the failure in
            # stats instead; the table's own ledger wasn't stamped, so
            # a later batch's tombstones (or an operator fix) retry it.
            try:
                # MOR marker segment: O(keys) per foreign table instead
                # of a copy-on-write bucket rewrite — the fan-out can
                # touch every drifted fingerprint's tables per batch,
                # which at scale made tombstones O(tables × buckets)
                stats[name] = table.delete_where_keys(
                    keys_df, scope, batch_id=batch_id,
                    writer_id=name + writer_suffix, strategy="mor",
                )
            except Exception as e:  # noqa: BLE001 — isolate per table
                stats[name] = {"error": f"{type(e).__name__}: {e}"}
        return stats

    def _apply_insert(
        self,
        changelog: DataFrame,
        batch_id: int | None,
        strategy: str,
        writer_suffix: str,
    ) -> dict:
        """insert.mode=insert: flatten every non-tombstone envelope and
        APPEND — duplicate keys accumulate, exactly like repeated JDBC
        INSERTs."""
        from concurrent.futures import ThreadPoolExecutor

        is_del = F.col("op").eqNullSafe("d") | F.col("value").isNull()
        inserts = changelog.filter(~is_del).persist()
        inserts.count()

        def _append_one(spec: TableSpec) -> tuple[str, dict]:
            flat = flatten_table(inserts, spec, carry_cols=("seq",)).withColumnRenamed(
                "seq", SEQ_COL
            )
            # bucket by the TABLE LAYOUT (the key scope), like every
            # other write path — appending under a different hash key
            # (the old row-PK scope) stored rows in buckets a later
            # bucket-pruned delete/replace would never read (the
            # layout-mismatch class the _check_layout_scope guard
            # exists for; it caught this site)
            scope = list(spec.key_merge_keys) or list(spec.merge_keys) or None
            return spec.table_name, self.tables[spec.table_name].merge(
                flat,
                mode="append",
                scope_keys=scope,
                batch_id=batch_id,
                writer_id=spec.table_name + writer_suffix,
                strategy=strategy,
            )

        stats: dict[str, dict] = {}
        with ThreadPoolExecutor(max_workers=len(self.plan.tables)) as pool:
            for name, st in pool.map(_append_one, self.plan.tables):
                stats[name] = st
        inserts.unpersist()
        return stats

    def _apply_update(
        self,
        upserts: DataFrame,
        deletes: DataFrame,
        batch_id: int | None,
        strategy: str,
        writer_suffix: str,
    ) -> dict:
        """insert.mode=update: row-level modify of EXISTING keys only;
        tombstones still wipe matching keys when delete_enabled."""
        from concurrent.futures import ThreadPoolExecutor

        plan = self.plan
        has_deletes = (
            plan.config.delete_enabled and deletes.limit(1).count() > 0
        )

        def _update_one(spec: TableSpec) -> tuple[str, dict]:
            table = self.tables[spec.table_name]
            flat = flatten_table(upserts, spec, carry_cols=("seq",)).withColumnRenamed(
                "seq", SEQ_COL
            )
            # bucket on the key scope like every other write path —
            # row-level matching on key_cols happens inside the merge
            st = table.merge(
                flat,
                mode="update",
                scope_keys=list(spec.key_merge_keys) or list(spec.merge_keys),
                batch_id=batch_id,
                writer_id=spec.table_name + writer_suffix,
                strategy=strategy,
            )
            if has_deletes:
                scope = list(spec.key_merge_keys) or list(spec.merge_keys)
                st_del = table.delete_where_keys(
                    deletes.select(*self._key_exprs(spec)),
                    scope_keys=scope,
                    batch_id=batch_id,
                    writer_id=spec.table_name + writer_suffix + "#del",
                )
                st = {"update": st, "delete": st_del}
            return spec.table_name, st

        stats: dict[str, dict] = {}
        with ThreadPoolExecutor(max_workers=len(plan.tables)) as pool:
            for name, st in pool.map(_update_one, plan.tables):
                stats[name] = st
        return stats

    def _batch_rows(self, spec: TableSpec, upserts: DataFrame, deletes: DataFrame) -> DataFrame:
        """Flattened upsert rows ∪ scope marker rows for one table.

        Marker rows (key PKs + nulls, flagged for delete) come from
        tombstones AND from upsert envelopes that flatten to ZERO rows
        for this table: whole-image replacement is delete-then-insert
        (``BufferedRecords.java:264-270``), so an upsert whose array
        shrank to EMPTY/null must still scope the child table's old
        rows for deletion (r3 review: the stale-child bug).  The
        zero-row set is derived by the ``has_rows_expr`` predicate — a
        scan-local column expression mirroring the explode chain — so
        only actually-shrunk envelopes pay a marker row, instead of
        every envelope writing one through the sink (r3 "Next round"
        #1: the blanket markers cost ~1.2 s/batch at sf0.1 and, being
        filtered on every read, taxed reads too)."""
        flat = flatten_table(upserts, spec, carry_cols=("seq",)).withColumn(
            DELETE_COL, F.lit(False)
        )
        del_rows = deletes.select(
            *self._key_exprs(spec),
            F.col("seq"),
            F.lit(True).alias(DELETE_COL),
        )
        if any(c.kind in (ARRAY, MAP) for c in spec.chain):
            # only generator tables can flatten an envelope to ZERO
            # rows (the root table yields exactly one row per image,
            # so its scope is always present in `flat`)
            del_rows = del_rows.unionByName(
                upserts.filter(~has_rows_expr(spec)).select(
                    *self._key_exprs(spec),
                    F.col("seq"),
                    F.lit(True).alias(DELETE_COL),
                )
            )
        key_names = set(spec.key_merge_keys)
        sel = []
        for cs in spec.columns:
            if cs.out_name in key_names:
                sel.append(F.col(cs.out_name).cast(cs.dtype).alias(cs.out_name))
            else:
                sel.append(F.lit(None).cast(cs.dtype).alias(cs.out_name))
        del_full = del_rows.select(*sel, F.col("seq"), F.col(DELETE_COL))
        return flat.withColumnRenamed("seq", SEQ_COL).unionByName(
            del_full.withColumnRenamed("seq", SEQ_COL)
        )

    def _apply_mor_union(
        self,
        upserts: DataFrame,
        deletes: DataFrame,
        batch_id: int | None,
        writer_suffix: str = "",
    ) -> dict:
        """All tables' delta segments in ONE write job.

        Each target table's batch rows get a ``__tbl`` discriminator
        and union by name (missing columns → null; parquet nulls cost
        ~nothing), then a single shuffle on (table, bucket) writes
        every segment file.  Per micro-batch this collapses
        ``n_tables`` write jobs (plus their plan/schedule latency, the
        dominant cost of small triggers) into one; the per-table
        manifest commits stay independent, so exactly-once semantics
        per table are unchanged (a crash between commits is healed by
        per-writer batch-id dedup on replay).
        """
        plan = self.plan
        tbl_part, bucket_part = "__tbl_p", BUCKET_COL + "_p"
        if batch_id is not None and all(
            batch_id
            <= self.tables[s.table_name].last_batch_id(s.table_name + writer_suffix)
            for s in plan.tables
        ):
            return {
                s.table_name: {"skipped": True, "reason": "batch already committed"}
                for s in plan.tables
            }

        parts = []
        for spec in plan.tables:
            t = self.tables[spec.table_name]
            scope = list(spec.key_merge_keys) or list(spec.merge_keys)
            n_buckets = t.manifest()["n_buckets"]
            rows = (
                self._batch_rows(spec, upserts, deletes)
                .withColumn(
                    BUCKET_COL,
                    F.pmod(
                        F.xxhash64(*[F.col(c) for c in scope]), F.lit(n_buckets)
                    ).cast("int"),
                )
                .withColumn(
                    MOR_DELETE_COL, F.coalesce(F.col(DELETE_COL), F.lit(False))
                )
                .drop(DELETE_COL)
                .withColumn("__tbl", F.lit(spec.table_name))
            )
            parts.append(rows)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p, allowMissingColumns=True)

        commit_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.warehouse, "_commits", f"commit-{commit_id}")
        (
            big.withColumn(tbl_part, F.col("__tbl"))
            .withColumn(bucket_part, F.col(BUCKET_COL))
            .repartition(F.col("__tbl"), F.col(BUCKET_COL))
            .write.partitionBy(tbl_part, bucket_part)
            .mode("overwrite")
            .parquet(out_dir)
        )
        from urllib.parse import unquote

        plan_names = {s.table_name for s in plan.tables}
        files_by_table: dict[str, dict[str, list[str]]] = {}
        if os.path.isdir(out_dir):
            for d1 in os.listdir(out_dir):
                if not d1.startswith(f"{tbl_part}="):
                    continue
                # Spark Hive-escapes special partition values as %XX —
                # a renamed table containing such a character would
                # otherwise parse to a name matching NO plan table, and
                # the batch would commit an empty segment while its
                # data files get GC'd (r3 review: silent data loss)
                tname = unquote(d1.split("=", 1)[1])
                if tname not in plan_names:
                    raise RuntimeError(
                        f"union write produced partition {tname!r} matching "
                        f"no plan table {sorted(plan_names)} — refusing to "
                        "commit a segment that would orphan its files"
                    )
                for d2 in os.listdir(os.path.join(out_dir, d1)):
                    if not d2.startswith(f"{bucket_part}="):
                        continue
                    b = d2.split("=", 1)[1]
                    bdir = os.path.join(out_dir, d1, d2)
                    fl = [
                        os.path.join(bdir, f)
                        for f in os.listdir(bdir)
                        if f.endswith(".parquet")
                    ]
                    if fl:
                        files_by_table.setdefault(tname, {})[b] = fl

        stats = {}
        for spec in plan.tables:
            scope = list(spec.key_merge_keys) or list(spec.merge_keys)
            stats[spec.table_name] = self.tables[spec.table_name].commit_segment(
                files_by_table.get(spec.table_name, {}),
                mode="replace",
                scope_keys=scope,
                batch_id=batch_id,
                writer_id=spec.table_name + writer_suffix,
            )
        return stats

    def _key_exprs(self, spec: TableSpec):
        exprs = []
        for c in self.plan.key_pk_columns:
            fname = c.source[1]
            base = F.col("key") if fname is None else F.col("key").getField(fname)
            exprs.append(base.cast(c.dtype).alias(c.out_name))
        return exprs

    def maintain(self) -> dict:
        """Periodic maintenance: compact every table's delta log, then
        vacuum per-table data dirs AND the shared ``_commits/`` dir the
        union write path lands segments in (per-table vacuum never
        walks it — without this the compacted segments' files leak
        forever).

        The ``_commits/`` GC live-set is built from EVERY committed
        table under the warehouse — discovered from disk via the
        catalog listing, NOT from this applier's plan tables.  Under
        schema drift, appliers for different schema fingerprints share
        the warehouse with different table sets (an added array creates
        a new child table); scoping the live-set to one applier's
        tables would treat the other tables' still-referenced segment
        files as orphans and delete them (permanent data loss, r2
        advisory).  Same hole after restart: tables whose schema hasn't
        been re-seen have no resident applier but must stay protected.
        """
        from ..lake.table import gc_unreferenced
        from ..sources.monitor import TableMonitor

        stats = {"compacted": 0, "vacuumed_files": 0}
        for table in self.tables.values():
            if not table.compact().get("skipped"):
                stats["compacted"] += 1
            stats["vacuumed_files"] += table.vacuum()
        all_tables = {
            name: LakeTable(self.spark, os.path.join(self.warehouse, name))
            for name in TableMonitor(self.warehouse).list_tables()
        }
        for name, table in self.tables.items():
            all_tables.setdefault(name, table)
        stats["vacuumed_files"] += gc_unreferenced(
            [os.path.join(self.warehouse, "_commits")],
            list(all_tables.values()),
        )
        return stats

    def read(self, table_name: str) -> DataFrame:
        return self.tables[table_name].read().drop("__bucket", SEQ_COL)
