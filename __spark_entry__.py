"""Driver contract: flagship entry + per-operator queries with DuckDB
oracles.

Operator ids reference SURVEY.md §2 (S* sources, F* flatten, A* apply)
plus the training-data layer (functions/).  Each ``queries()`` entry
has a matching ``oracle_sql()`` ANSI-SQL string computing the same
result from the same parquet tables, except the explicitly-listed
approximate/streaming-internal ops (see ``oracle_sql`` docstring).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.config import FlattenConfig
from kafka_connect_jdbc_flatten_spark.functions import cluster as CL
from kafka_connect_jdbc_flatten_spark.functions import corpus as CORPUS
from kafka_connect_jdbc_flatten_spark.functions import decontam as DECON
from kafka_connect_jdbc_flatten_spark.functions import dedup as D
from kafka_connect_jdbc_flatten_spark.functions import lm as LM
from kafka_connect_jdbc_flatten_spark.functions import pack as PK
from kafka_connect_jdbc_flatten_spark.functions import sample as SMP
from kafka_connect_jdbc_flatten_spark.functions import similarity as SIM
from kafka_connect_jdbc_flatten_spark.functions import text as TX
from kafka_connect_jdbc_flatten_spark.functions.multimodal import (
    attach_fake_blob,
    attach_png_blob,
    attach_wav_blob,
    decode_png_meta,
    decode_wav_meta,
    fake_decode_meta,
    frame_sample,
)
from kafka_connect_jdbc_flatten_spark.operators.explode import flatten_table
from kafka_connect_jdbc_flatten_spark.operators.lww import (
    lww_reduce,
    lww_reduce_agg,
)
from kafka_connect_jdbc_flatten_spark.operators.merge import CdcApplier
from kafka_connect_jdbc_flatten_spark.operators.skew import salted_lww_reduce
from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan
from kafka_connect_jdbc_flatten_spark.sources.changelog import (
    TRANSCRIPT_KEY_SCHEMA,
    TRANSCRIPT_VALUE_SCHEMA,
    transcript_changelog,
    transcript_flatten_config,
    write_changelog_chunks,
)
from kafka_connect_jdbc_flatten_spark.sources.incremental import (
    IncrementalCriteria,
)
from kafka_connect_jdbc_flatten_spark.streaming.pipeline import StreamingIngest

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _transcript_plan():
    return compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA,
        TRANSCRIPT_VALUE_SCHEMA,
        transcript_flatten_config(),
        value_record_name="Conversation",
        key_record_name="ConversationKey",
    )


_RUN_DIRS: list[str] = []


def _cleanup_run_dirs() -> None:
    for d in _RUN_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_run_dirs)


def _tmp(tag: str) -> str:
    """Per-run scratch dir, cleaned at process exit — NOT per query:
    queries return LAZY DataFrames over their warehouse (no driver-side
    collect of result tables), so the files must outlive the query
    function."""
    d = tempfile.mkdtemp(prefix=f"kcjfs_{tag}_")
    _RUN_DIRS.append(d)
    return d


# The final-state oracle shared by batch CDC, streaming CDC and entry():
# replaying the synthetic changelog (sources/changelog.py derivation)
# must land exactly the per-user turn sequence, minus tombstoned
# conversations (user_id % 10 == 7).
FINAL_STATE_SQL = """
SELECT CAST(user_id AS VARCHAR) AS conv_id,
       (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INT
         AS turn_idx,
       event_type AS role,
       props AS text,
       event_type AS tool,
       ts
FROM events
WHERE user_id % 10 != 7
"""

TURNS_TABLE = "transcripts_conversation_turns"

# State after replaying only envelopes with seq <= max(event_id)//2 —
# the LWW winner per conversation among the prefix batch is the
# max-(ts, seq) envelope, and its whole image carries every turn at or
# before it in (ts, event_id) order.  No tombstone has seq <= the
# cutoff (tombstone seq = user_id + max_seq + 1), so no user is absent
# for deletion reasons.
PREFIX_STATE_SQL = """
WITH cutoff AS (SELECT max(event_id) // 2 AS s FROM events),
win AS (
  SELECT user_id, event_id AS wid, ts AS wts
  FROM events, cutoff
  WHERE event_id <= s
  QUALIFY row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT CAST(e.user_id AS VARCHAR) AS conv_id,
       (row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1)::INT
         AS turn_idx,
       e.event_type AS role,
       e.props AS text,
       e.event_type AS tool,
       e.ts
FROM events e JOIN win w ON e.user_id = w.user_id
WHERE e.ts < w.wts OR (e.ts = w.wts AND e.event_id <= w.wid)
"""

# CDC egress between the two snapshots above: rows present only in the
# final state are inserts, rows only in the prefix state are deletes
# (the tombstoned conversations), payload-changed rows are updates —
# the emitted image is the TO-snapshot one (null for deletes).
EGRESS_CHANGES_SQL = f"""
WITH p AS ({PREFIX_STATE_SQL}), f AS ({FINAL_STATE_SQL})
SELECT CASE WHEN p.conv_id IS NULL THEN 'c'
            WHEN f.conv_id IS NULL THEN 'd'
            ELSE 'u' END AS _op,
       coalesce(p.conv_id, f.conv_id) AS conv_id,
       coalesce(p.turn_idx, f.turn_idx) AS turn_idx,
       f.role, f.text, f.tool, f.ts
FROM p FULL OUTER JOIN f
  ON p.conv_id = f.conv_id AND p.turn_idx = f.turn_idx
WHERE p.conv_id IS NULL OR f.conv_id IS NULL
   OR p.role IS DISTINCT FROM f.role
   OR p.text IS DISTINCT FROM f.text
   OR p.tool IS DISTINCT FROM f.tool
   OR p.ts IS DISTINCT FROM f.ts
"""


# =====================================================================
# CDC / flatten pipeline queries (SURVEY §2.1-2.3)
# =====================================================================
def q_cdc_replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full changelog replay → flatten (F1-F8) → LWW (A2) →
    whole-image MERGE with tombstones (A5, A6) → final turns table."""
    wh = _tmp("cdc")
    plan = _transcript_plan()
    applier = CdcApplier(spark, wh, plan, n_buckets=8)
    applier.apply_batch(transcript_changelog(spark, sf_dir), batch_id=0)
    return applier.read(TURNS_TABLE)


def q_pk_mode_record_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same replay under ``pk.mode=record_key`` (FieldsMetadata.java:
    272-330): no dotted pk.fields — ALL record-key struct fields become
    the PK of every table, so the turns table merges on ``conv_id``
    alone and each envelope whole-image-replaces the conversation.
    Final state must equal the flatten-mode replay."""
    import dataclasses as _dc

    wh = _tmp("rkey")
    cfg = _dc.replace(
        transcript_flatten_config(),
        pk_mode="record_key",
        pk_fields=(),
        rename_fields={"conversation.conv_id": "conv_id_img"},
    )
    plan = compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA,
        TRANSCRIPT_VALUE_SCHEMA,
        cfg,
        value_record_name="Conversation",
        key_record_name="ConversationKey",
    )
    applier = CdcApplier(spark, wh, plan, n_buckets=8)
    applier.apply_batch(transcript_changelog(spark, sf_dir), batch_id=0)
    return applier.read(TURNS_TABLE)


def q_cdc_streaming_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same replay through Structured Streaming (checkpointed file-tail
    of binlog segments, foreachBatch apply — S2, S4, A1-A6)."""
    root = _tmp("stream")
    plan = _transcript_plan()
    changelog = transcript_changelog(spark, sf_dir)
    feed = os.path.join(root, "feed")
    write_changelog_chunks(changelog, feed, n_chunks=2)
    ing = StreamingIngest(
        spark,
        feed,
        os.path.join(root, "wh"),
        plan,
        os.path.join(root, "ckpt"),
        n_buckets=8,
    )
    ing.run_available(timeout_sec=600)
    return ing.read(TURNS_TABLE)


def q_flatten_explode_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure flatten path (F1-F8, no merge): every upsert envelope's
    after-image explodes into per-turn rows, binlog seq carried."""
    plan = _transcript_plan()
    spec = next(t for t in plan.tables if t.table_name == TURNS_TABLE)
    changelog = transcript_changelog(spark, sf_dir).filter(F.col("op") != "d")
    return flatten_table(changelog, spec, carry_cols=("seq",))


FLATTEN_PREFIXES_SQL = """
WITH t AS (
  SELECT user_id, event_id, ts, event_type, props,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT CAST(a.user_id AS VARCHAR) AS conv_id,
       (b.rn - 1)::INT AS turn_idx,
       b.event_type AS role,
       b.props AS text,
       b.event_type AS tool,
       b.ts AS ts,
       a.event_id AS seq
FROM t a JOIN t b ON a.user_id = b.user_id AND b.rn <= a.rn
"""


_EVENT_ATTRS_KEY = T.LongType()
_EVENT_ATTRS_VALUE = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _event_attrs_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        F.lit("events").alias("topic"),
        F.pmod("event_id", F.lit(4)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit("CreateTime").alias("timestamp_type"),
        F.col("event_id").alias("key"),
        F.struct(
            F.col("event_id"),
            F.create_map(
                F.lit("role"), F.col("event_type"), F.lit("text"), F.col("props")
            ).alias("attrs"),
        ).alias("value"),
    )


def _event_attrs_plan(coordinates: bool = False):
    # a primitive key schema's container path is always "root"
    # (getContainerPathname, FlattenTransformation.java:744-757)
    cfg = FlattenConfig(
        topic="events",
        pk_mode="flatten",
        coordinates=coordinates,
        pk_fields=("root.key",),
        rename_fields={
            "root.key": "event_id",
            "eventattrs.event_id": "event_id_img",
        },
    )
    return compile_flatten_plan(
        _EVENT_ATTRS_KEY,
        _EVENT_ATTRS_VALUE,
        cfg,
        value_record_name="EventAttrs",
        key_record_name="EventKey",
    )


def q_flatten_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map explosion + key propagation (F7): map<string,string> value →
    one row per entry with the ``<path>_key`` column."""
    plan = _event_attrs_plan()
    spec = next(t for t in plan.tables if t.table_name.endswith("_attrs"))
    return flatten_table(_event_attrs_changelog(spark, sf_dir), spec)


MAP_EXPLODE_SQL = """
SELECT event_id, event_type AS attrs, 'role' AS eventattrs_attrs_key FROM events
UNION ALL
SELECT event_id, props AS attrs, 'text' AS eventattrs_attrs_key FROM events
"""


def q_flatten_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka coordinate columns on every table (F4 coordinates,
    ``FlattenTransformation.java:100-113``)."""
    plan = _event_attrs_plan(coordinates=True)
    spec = next(t for t in plan.tables if not t.table_name.endswith("_attrs"))
    return flatten_table(_event_attrs_changelog(spark, sf_dir), spec)


COORDINATES_SQL = """
SELECT event_id,
       event_id AS event_id_img,
       'events' AS kafkatopic,
       (event_id % 4)::INT AS kafkapartition,
       event_id AS kafkaoffset,
       ts AS kafkatimestamp,
       'CreateTime' AS kafkatimestamp_type
FROM events
"""


_SALES_VALUE = T.StructType(
    [
        T.StructField(
            "order",
            T.StructType(
                [
                    T.StructField("o_orderkey", T.LongType(), True),
                    T.StructField(
                        "lines",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("l_linenumber", T.IntegerType(), True),
                                    T.StructField("l_quantity", T.DoubleType(), True),
                                ]
                            ),
                            True,
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)


def q_flatten_pk_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-PK propagation into child tables (F10) + container
    whitelist pruning (F11): the order key is captured at its struct
    and written path-prefixed into the exploded lines table; the
    whitelist compiles ONLY the child table."""
    orders = _read(spark, sf_dir, "orders")
    lineitem = _read(spark, sf_dir, "lineitem")
    nested = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber"), F.col("l_quantity")
                )
            ).alias("lines")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.lit("sales").alias("topic"),
            F.lit(0).alias("partition"),
            F.col("o_orderkey").alias("offset"),
            F.col("o_orderdate").alias("timestamp"),
            F.lit("CreateTime").alias("timestamp_type"),
            F.col("o_orderkey").alias("key"),
            F.struct(
                F.struct(F.col("o_orderkey"), F.col("lines")).alias("order")
            ).alias("value"),
        )
    )
    cfg = FlattenConfig(
        topic="sales",
        pk_propagate_value_fields=("salesorder.order.o_orderkey",),
        containers_whitelist=frozenset(
            ["salesorder.order.lines.lines"]
        ),
    )
    plan = compile_flatten_plan(
        None, _SALES_VALUE, cfg, value_record_name="SalesOrder"
    )
    assert len(plan.tables) == 1, "whitelist must prune the parent tables"
    return flatten_table(nested, plan.tables[0])


PK_PROPAGATION_SQL = """
SELECT l_linenumber,
       l_quantity,
       l_orderkey AS salesorder_order_o_orderkey
FROM lineitem
"""


def q_flatten_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-container struct grouping (F3): structs below the main
    container do not split tables — their leaves project as nested
    field access in the same table."""
    ev = _read(spark, sf_dir, "events")
    changelog = ev.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit("CreateTime").alias("timestamp_type"),
        F.col("event_id").alias("key"),
        F.struct(
            F.col("event_id"),
            F.struct(
                F.col("value"), F.col("event_type"), F.col("user_id")
            ).alias("metrics"),
        ).alias("value"),
    )
    value_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField(
                "metrics",
                T.StructType(
                    [
                        T.StructField("value", T.DoubleType(), True),
                        T.StructField("event_type", T.StringType(), True),
                        T.StructField("user_id", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    cfg = FlattenConfig(topic="events")
    plan = compile_flatten_plan(None, value_schema, cfg, value_record_name="Evt")
    assert len(plan.tables) == 1
    return flatten_table(changelog, plan.tables[0])


NESTED_STRUCT_SQL = """
SELECT event_id, value, event_type, user_id FROM events
"""


def q_poller_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch poll loop (S2/S4): timestamp+incrementing mode drains the
    table in batch.max.rows pages with resumable offsets; the union of
    all polls must be exactly the table (no skip, no dup)."""
    from kafka_connect_jdbc_flatten_spark.sources.poller import TablePoller

    ev = _read(spark, sf_dir, "events")
    poller = TablePoller(
        mode="timestamp+incrementing",
        ts_col="ts",
        inc_col="event_id",
        batch_max_rows=4000,
    )
    out = None
    for batch in poller.poll_all(ev):
        out = batch if out is None else out.unionByName(batch)
    return out.select(*EVENT_COLS)


POLLER_DRAIN_SQL = "SELECT event_id, ts, user_id, event_type, value, props FROM events"


def q_query_mode_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``query``-mode source (S7b, ``JdbcSourceConnectorConfig.java:229``):
    the reference polls a custom SELECT instead of a table.  Here any
    DataFrame IS the polled object, so query mode = polling a derived
    relation (projection + join) with the same timestamp+incrementing
    criteria and resumable offsets as a plain table: poll one
    4000-row page, then resume from the serialized offset and return
    the remainder — exactly the rows past the page boundary in
    (ts, event_id) total order."""
    from kafka_connect_jdbc_flatten_spark.sources.poller import TablePoller

    ev = _read(spark, sf_dir, "events")
    users = (
        ev.select((F.col("user_id") % 7).alias("uid"))
        .distinct()
        .withColumn(
            "tier", F.concat(F.lit("t"), (F.col("uid") % 3).cast("string"))
        )
    )
    derived = (
        ev.withColumn("uid", F.col("user_id") % 7)
        .join(users, "uid")
        .select("event_id", "ts", "event_type", "tier")
    )
    p1 = TablePoller(
        mode="timestamp+incrementing",
        ts_col="ts",
        inc_col="event_id",
        batch_max_rows=4000,
    )
    p1.poll(derived)  # first page; advances the serialized offset
    p2 = TablePoller(
        mode="timestamp+incrementing",
        ts_col="ts",
        inc_col="event_id",
        batch_max_rows=1_000_000_000,
        offset=dict(p1.offset),
    )
    return p2.poll(derived)


QUERY_MODE_TAIL_SQL = """
WITH u AS (SELECT DISTINCT user_id % 7 AS uid FROM events),
     ut AS (SELECT uid, 't' || CAST(uid % 3 AS VARCHAR) AS tier FROM u),
     d AS (SELECT e.event_id, e.ts, e.event_type, ut.tier
           FROM events e JOIN ut ON e.user_id % 7 = ut.uid),
     b AS (SELECT ts, event_id FROM d ORDER BY ts, event_id LIMIT 1 OFFSET 3999)
SELECT d.event_id, d.ts, d.event_type, d.tier FROM d, b
WHERE (d.ts = b.ts AND d.event_id > b.event_id) OR d.ts > b.ts
"""


def q_record_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record validation (A9, ``RecordValidator.java:45-132``): a
    declarative split of the changelog into (valid, violations) under
    both delete modes.  Fixture derives deterministically from
    ``events``: every 7th record is a tombstone (null value), every
    11th has a null key — so all three violation branches (tombstone
    with null key; null value with deletes disabled; null key) are
    exercised and oracle-checked."""
    from kafka_connect_jdbc_flatten_spark.operators.validate import (
        VIOLATION_COL,
        split_valid,
    )

    ev = _read(spark, sf_dir, "events")
    changelog = ev.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.when(
            F.col("event_id") % 11 != 0,
            F.struct(F.col("event_id").alias("id")),
        ).alias("key"),
        F.when(
            F.col("event_id") % 7 != 0,
            F.struct(F.col("event_type"), F.col("value")),
        ).alias("value"),
    )
    parts = []
    for mode, enabled in (("deletes_on", True), ("deletes_off", False)):
        valid, bad = split_valid(changelog, delete_enabled=enabled)
        parts.append(
            valid.select(
                F.lit(mode).alias("mode"),
                F.col("offset").alias("rec_offset"),
                F.lit(None).cast("string").alias("violation"),
            )
        )
        parts.append(
            bad.select(
                F.lit(mode).alias("mode"),
                F.col("offset").alias("rec_offset"),
                F.col(VIOLATION_COL).alias("violation"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


RECORD_VALIDATION_SQL = """
SELECT 'deletes_on' AS mode, event_id AS rec_offset,
       CASE WHEN event_id % 7 = 0 AND event_id % 11 = 0
            THEN 'tombstone with null key (RecordValidator.java:60-74)'
       END AS violation
FROM events
UNION ALL
SELECT 'deletes_off', event_id,
       CASE WHEN event_id % 7 = 0
            THEN 'null value with delete.enabled=false (RecordValidator.java:83-97)'
            WHEN event_id % 11 = 0 THEN 'null key'
       END
FROM events
"""


def q_flatten_uppercase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten.uppercase=true forces upper-cased identifiers
    (``FlattenTransformation.java:723-725``)."""
    cfg = FlattenConfig(
        topic="events",
        uppercase=True,
        pk_mode="flatten",
        pk_fields=("root.key",),
        rename_fields={
            "root.key": "EVENT_ID",
            "eventattrs.event_id": "EVENT_ID_IMG",
        },
    )
    plan = compile_flatten_plan(
        _EVENT_ATTRS_KEY,
        _EVENT_ATTRS_VALUE,
        cfg,
        value_record_name="EventAttrs",
        key_record_name="EventKey",
    )
    spec = next(t for t in plan.tables if t.table_name.endswith("_ATTRS"))
    assert spec.table_name == "EVENTS_EVENTATTRS_ATTRS"
    return flatten_table(_event_attrs_changelog(spark, sf_dir), spec)


UPPERCASE_SQL = """
SELECT event_id AS EVENT_ID, event_type AS ATTRS,
       'role' AS EVENTATTRS_ATTRS_KEY FROM events
UNION ALL
SELECT event_id, props, 'text' FROM events
"""


def q_table_name_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """table.name.format parity (round 5): destination names pass
    through the ``${topic}`` template AFTER rename + case forcing
    (``JdbcDbWriter.java:88,103,233-241``) — a reference user with
    ``table.name.format=dw_${topic}`` carries their config over.  The
    flattened rows are tagged with the resolved destination name so
    the naming rule itself is oracle-checked."""
    cfg = FlattenConfig(
        topic="events",
        table_name_format="dw_${topic}",
        rename_tables={"events_eventattrs_attrs": "attr_map"},
        pk_mode="flatten",
        pk_fields=("root.key",),
        rename_fields={"root.key": "evt_id"},
    )
    plan = compile_flatten_plan(
        _EVENT_ATTRS_KEY,
        _EVENT_ATTRS_VALUE,
        cfg,
        value_record_name="EventAttrs",
        key_record_name="EventKey",
    )
    spec = next(t for t in plan.tables if t.table_name == "dw_attr_map")
    return flatten_table(_event_attrs_changelog(spark, sf_dir), spec).select(
        "*", F.lit(spec.table_name).alias("dest_table")
    )


TABLE_NAME_FORMAT_SQL = """
SELECT event_id AS evt_id, event_type AS attrs,
       'role' AS eventattrs_attrs_key, 'dw_attr_map' AS dest_table
FROM events
UNION ALL
SELECT event_id, props, 'text', 'dw_attr_map' FROM events
"""


def q_incremental_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CDC tail criteria (S2/S3): resume after the 100th
    change in (ts, seq) order — ``WHERE (ts = last AND seq > lastSeq)
    OR ts > last``."""
    ev = _read(spark, sf_dir, "events")
    boundary = (
        ev.orderBy("ts", "event_id").offset(99).limit(1).collect()[0]
    )
    crit = IncrementalCriteria(ts_col="ts", inc_col="event_id")
    return ev.filter(crit.predicate(boundary["ts"], boundary["event_id"]))


INCREMENTAL_TAIL_SQL = """
WITH b AS (SELECT ts, event_id FROM events ORDER BY ts, event_id LIMIT 1 OFFSET 99)
SELECT e.* FROM events e, b
WHERE (e.ts = b.ts AND e.event_id > b.event_id) OR e.ts > b.ts
"""


def q_incremental_tail_multits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-timestamp-column criteria (S3, round 5): a nullable
    ``updated_at`` beside ``created_at`` — every ts occurrence in the
    predicate/order is ``COALESCE(updated_at, created_at)``, the
    reference's ``coalesceTimestampColumns``
    (``TimestampIncrementingCriteria.java:283-293``).  The two-column
    fixture derives deterministically from ``events`` (updated_at =
    ts + 1h on every third event)."""
    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.col("event_id") % 3 == 0, F.col("ts") + F.expr("INTERVAL 1 HOUR")
        ).alias("updated_at"),
        F.col("ts").alias("created_at"),
    )
    crit = IncrementalCriteria(
        ts_col=["updated_at", "created_at"], inc_col="event_id"
    )
    boundary = (
        ev.orderBy(crit.ts_expr(), "event_id")
        .offset(99)
        .limit(1)
        .select(crit.ts_expr().alias("eff"), "event_id")
        .collect()[0]
    )
    return ev.filter(crit.predicate(boundary["eff"], boundary["event_id"]))


INCREMENTAL_TAIL_MULTITS_SQL = """
WITH t AS (
  SELECT event_id,
         CASE WHEN event_id % 3 = 0 THEN ts + INTERVAL 1 HOUR END AS updated_at,
         ts AS created_at
  FROM events
),
b AS (
  SELECT COALESCE(updated_at, created_at) AS eff, event_id
  FROM t ORDER BY eff, event_id LIMIT 1 OFFSET 99
)
SELECT t.event_id, t.updated_at, t.created_at FROM t, b
WHERE (COALESCE(t.updated_at, t.created_at) = b.eff AND t.event_id > b.event_id)
   OR COALESCE(t.updated_at, t.created_at) > b.eff
"""


# =====================================================================
# Keyed reductions (A2 LWW replacement + skew handling)
# =====================================================================
LWW_SQL = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def q_lww_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return lww_reduce(ev, ["user_id"], ["ts", "event_id"]).select(*EVENT_COLS)


def q_lww_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by-form LWW: map-side combine collapses duplicates before
    the shuffle (preferred at scale)."""
    ev = _read(spark, sf_dir, "events")
    return lww_reduce_agg(ev, ["user_id"], ["ts", "event_id"]).select(*EVENT_COLS)


def q_lww_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted LWW — identical result, hot keys
    spread over n_salts tasks before coalescing."""
    ev = _read(spark, sf_dir, "events")
    return salted_lww_reduce(ev, ["user_id"], ["ts", "event_id"], n_salts=8).select(
        *EVENT_COLS
    )


def q_changelog_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch metrics aggregation (the reference's update-count
    accounting, ``BufferedRecords.java:271-279``)."""
    return (
        transcript_changelog(spark, sf_dir)
        .groupBy("op")
        .agg(F.count(F.lit(1)).alias("n"))
    )


OP_COUNTS_SQL = """
WITH firsts AS (
  SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT 'c' AS op, count(DISTINCT user_id)::BIGINT AS n FROM events
UNION ALL
SELECT 'u', (count(*) - count(DISTINCT user_id))::BIGINT FROM events
UNION ALL
SELECT 'd', count(DISTINCT user_id)::BIGINT FROM events WHERE user_id % 10 = 7
"""


def q_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (sort/limit): TakeOrderedAndProject — per-partition
    top-k then driver merge, no full sort."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
        .select("event_id", "user_id", "value")
    )


TOPK_SQL = """
SELECT event_id, user_id, value FROM events
ORDER BY value DESC, event_id ASC LIMIT 100
"""


def q_parent_child_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent↔child reassembly join on propagated PKs — the use-case
    the reference's coordinate/PK propagation exists for
    (``README.md:32-34``).  Child side aggregated per conv, parent
    (small) broadcast."""
    wh = _tmp("join")
    plan = _transcript_plan()
    applier = CdcApplier(spark, wh, plan, n_buckets=8)
    applier.apply_batch(transcript_changelog(spark, sf_dir), batch_id=0)
    root = applier.read("transcripts_conversation").select("conv_id")
    turns = applier.read(TURNS_TABLE)
    agg = turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
    )
    return F.broadcast(root).join(agg, "conv_id")


PARENT_CHILD_SQL = """
SELECT CAST(user_id AS VARCHAR) AS conv_id,
       count(*)::BIGINT AS n_turns,
       (count(*) - 1)::INT AS max_turn_idx
FROM events
WHERE user_id % 10 != 7
GROUP BY user_id
"""


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive auto-evolve (S10): batch 2 arrives with a new optional
    column; old rows read as null (``DbStructure.java:127-234``)."""
    from kafka_connect_jdbc_flatten_spark.lake.table import SEQ_COL, LakeTable

    wh = _tmp("evolve")
    ev = _read(spark, sf_dir, "events")
    t = LakeTable.create(
        spark,
        os.path.join(wh, "t"),
        T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("value", T.DoubleType(), True),
                T.StructField(SEQ_COL, T.LongType(), True),
            ]
        ),
        ["event_id"],
        n_buckets=4,
    )
    b1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value")
    t.merge(b1.withColumn("__seq", F.col("event_id")), mode="lww", batch_id=0)
    evolved = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    t.evolve_schema(evolved)
    b2 = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "value", "props"
    )
    t.merge(b2.withColumn("__seq", F.col("event_id")), mode="lww", batch_id=1)
    return t.read().select("event_id", "value", "props")


SCHEMA_EVOLUTION_SQL = """
SELECT event_id, value,
       CASE WHEN event_id % 2 = 1 THEN props END AS props
FROM events
"""


def _drift_envelopes(spark: SparkSession, sf_dir: str, with_text: bool):
    """Schema-carrying envelopes over events: old value schema
    {event_id, role} (even ids) vs evolved schema + optional `text`
    (odd ids) — the reference's evolution fixture pair shape
    (``value_wo_array.avsc`` → ``value.avsc``)."""
    from kafka_connect_jdbc_flatten_spark.sources.changelog import (
        to_schema_carrying,
    )

    ev = _read(spark, sf_dir, "events").filter(
        F.col("event_id") % 2 == (1 if with_text else 0)
    )
    fields = [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("role", T.StringType(), True),
    ]
    val = [F.col("event_id"), F.col("event_type").alias("role")]
    if with_text:
        fields.append(T.StructField("text", T.StringType(), True))
        val.append(F.col("props").alias("text"))
    typed = ev.select(
        F.lit("evt").alias("topic"),
        F.pmod("event_id", F.lit(2)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit("CreateTime").alias("timestamp_type"),
        F.col("event_id").alias("key"),
        F.struct(*val).alias("value"),
        F.lit("c").alias("op"),
        F.col("event_id").alias("seq"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    return to_schema_carrying(typed, T.StructType(fields))


def q_schema_evolution_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic MID-STREAM schema-drift handling (the reference's
    headline auto-evolve, ``BufferedRecords.java:104-126``): chunk 1
    carries the old value schema, chunk 2 an added optional field; the
    streaming ingest detects the change per micro-batch, recompiles the
    plan, ALTER-ADDs the column and routes it."""
    from kafka_connect_jdbc_flatten_spark.streaming.pipeline import (
        SchemaDriftIngest,
    )

    root = _tmp("drift")
    feed = os.path.join(root, "feed")
    _drift_envelopes(spark, sf_dir, with_text=False).coalesce(1).write.parquet(
        os.path.join(feed, "chunk-00001")
    )
    _drift_envelopes(spark, sf_dir, with_text=True).coalesce(1).write.parquet(
        os.path.join(feed, "chunk-00002")
    )
    cfg = FlattenConfig(
        topic="evt",
        pk_mode="flatten",
        pk_fields=("root.key",),
        rename_fields={"root.key": "event_id", "evt.event_id": "event_id_img"},
    )
    ing = SchemaDriftIngest(
        spark,
        feed,
        os.path.join(root, "wh"),
        cfg,
        T.LongType(),
        os.path.join(root, "ckpt"),
        value_record_name="Evt",
        key_record_name="EvtKey",
        n_buckets=8,
        max_files_per_trigger=1,
    )
    ing.run_available(timeout_sec=600)
    assert any(e["added"] == ["text"] for e in ing.evolutions), ing.evolutions
    return ing.read("evt_evt").select("event_id", "role", "text")


SCHEMA_EVOLUTION_STREAMING_SQL = """
SELECT event_id,
       event_type AS role,
       CASE WHEN event_id % 2 = 1 THEN props END AS text
FROM events
"""


def q_incremental_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arrival safety delay (S5): the end bound is pulled back by
    timestamp.delay.interval.ms so in-flight transactions with earlier
    timestamps are never skipped
    (``TimestampIncrementingTableQuerier.java:208-214``)."""
    import datetime

    ev = _read(spark, sf_dir, "events")
    end = ev.agg(F.max("ts")).collect()[0][0]  # scalar aggregate only
    crit = IncrementalCriteria(ts_col="ts", inc_col=None)
    return ev.filter(
        crit.predicate(
            datetime.datetime(1970, 1, 1), None, end_ts=end, delay_ms=3_600_000
        )
    ).select(*EVENT_COLS)


INCREMENTAL_DELAY_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
WHERE ts > TIMESTAMP '1970-01-01 00:00:00'
  AND ts < (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
"""


def q_windowed_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling event-time windows over the change feed
    (streaming/windows.py), run in batch mode — identical results, the
    watermark node is eliminated on batch plans."""
    from kafka_connect_jdbc_flatten_spark.streaming.windows import (
        change_rate_windows,
    )

    # the envelope's Kafka `partition` column is renamed in the GATE
    # output: `partition` is a reserved word in several engines and the
    # oracle-lint bans reserved-word output columns (r02 divergence
    # class)
    return change_rate_windows(
        transcript_changelog(spark, sf_dir), window="1 hour", watermark="1 hour"
    ).withColumnRenamed("partition", "part_id")


_FLAT_VALUE = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _flat_changelog(
    spark: SparkSession, sf_dir: str, seq_offset: int = 0, v_scale: float = 1.0
) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        (F.col("event_id") + F.lit(seq_offset)).alias("offset"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit("CreateTime").alias("timestamp_type"),
        F.col("event_id").alias("key"),
        F.struct(
            F.col("event_id"), (F.col("value") * F.lit(v_scale)).alias("v")
        ).alias("value"),
        F.lit("c").alias("op"),
        (F.col("event_id") + F.lit(seq_offset)).cast("long").alias("seq"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def _flat_plan(insert_mode: str):
    cfg = FlattenConfig(
        topic="events",
        pk_mode="flatten",
        insert_mode=insert_mode,
        pk_fields=("root.key",),
        rename_fields={
            "root.key": "event_id",
            "evtv.event_id": "event_id_img",
        },
    )
    return compile_flatten_plan(
        T.LongType(),
        _FLAT_VALUE,
        cfg,
        value_record_name="EvtV",
        key_record_name="EvtKey",
    )


def q_insert_mode_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """insert.mode=insert (A3, JdbcSinkConfig.java:133-139): every
    record appended, duplicate keys tolerated — the same feed applied
    twice yields exactly 2 rows per event."""
    wh = _tmp("ins")
    applier = CdcApplier(spark, wh, _flat_plan("insert"), n_buckets=8)
    feed = _flat_changelog(spark, sf_dir).unionByName(
        _flat_changelog(spark, sf_dir, seq_offset=10**12)
    )
    applier.apply_batch(feed, batch_id=0)
    return applier.read("events_evtv").select("event_id", "v")


INSERT_MODE_SQL = """
SELECT event_id, value AS v FROM events
UNION ALL
SELECT event_id, value AS v FROM events
"""


def q_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """insert.mode=update (A3): only rows whose key already exists are
    modified; unknown keys are silently ignored (SQL UPDATE semantics,
    PostgreSqlDatabaseDialect update path).  Seed = even event_ids via
    upsert; update batch touches ALL events with doubled values — odd
    ids must not appear."""
    wh = _tmp("upd")
    seed_applier = CdcApplier(spark, wh, _flat_plan("upsert"), n_buckets=8)
    seed = _flat_changelog(spark, sf_dir).filter(F.col("key") % 2 == 0)
    seed_applier.apply_batch(seed, batch_id=0)

    upd_applier = CdcApplier(spark, wh, _flat_plan("update"), n_buckets=8)
    updates = _flat_changelog(spark, sf_dir, seq_offset=10**12, v_scale=2.0)
    upd_applier.apply_batch(updates, batch_id=1)
    return upd_applier.read("events_evtv").select("event_id", "v")


UPDATE_MODE_SQL = """
SELECT event_id, value * 2 AS v FROM events WHERE event_id % 2 = 0
"""


WINDOWED_RATES_SQL = """
WITH ch AS (
  SELECT (user_id % 4)::INT AS part_id, ts, 0 AS is_del, event_id AS seq
  FROM events
  UNION ALL
  SELECT (user_id % 4)::INT,
         max(ts),
         1,
         user_id + (SELECT max(event_id) FROM events) + 1
  FROM events WHERE user_id % 10 = 7 GROUP BY user_id
)
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
       part_id,
       count(*)::BIGINT AS n_events,
       sum(is_del)::BIGINT AS n_deletes,
       max(seq)::BIGINT AS max_seq
FROM ch GROUP BY 1, 2, 3
"""


# =====================================================================
# Standard analytics (SURVEY §2.4: agg / join / top-k over fact tables)
# =====================================================================
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: filtered scan → hash aggregate
    with map-side partial agg; sums rounded 2dp so the float totals
    hash-match the oracle despite summation-order differences."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped 3-way join + top-10: the filtered customer dim
    broadcasts (no shuffle of the fact side for that join); revenue
    ties break on l_orderkey so the LIMIT is deterministic."""
    cust = _read(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# =====================================================================
# Training-data layer: text analysis
# =====================================================================
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    feats = TX.text_quality(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])


def text_quality_sql() -> str:
    feats = TX.text_quality_sql("text")
    cols = ",\n       ".join(f"{sql} AS {n}" for n, sql in feats.items())
    return f"SELECT doc_id, {cols} FROM documents"


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count_ws("text").alias("n_tokens_ws"),
        TX.token_count_re("text").alias("n_tokens_re"),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       {TX.token_count_ws_sql('text')} AS n_tokens_ws,
       {TX.token_count_re_sql('text')} AS n_tokens_re
FROM documents
"""


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (dup-line fraction,
    top bigram/trigram share).  Spark computes the top-gram count via
    an O(n log n) sorted-run fold; the oracle uses the O(d·n)
    filter-per-distinct form — same value, different plan."""
    docs = _read(spark, sf_dir, "documents")
    feats = TX.repetition_features(F.col("text"))
    return docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])


def repetition_sql() -> str:
    feats = TX.repetition_features_sql("text")
    cols = ",\n       ".join(f"{sql} AS {n}" for n, sql in feats.items())
    return f"SELECT doc_id, {cols} FROM documents"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.lang_id("text").alias("lang_pred"))


LANG_ID_SQL = f"SELECT doc_id, {TX.lang_id_sql('text')} AS lang_pred FROM documents"


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.fingerprint("text").alias("fp128"),
        TX.fingerprint64("text").alias("fp64"),
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       {TX.fingerprint_sql('text')} AS fp128,
       {TX.fingerprint64_sql('text')} AS fp64
FROM documents
"""


# =====================================================================
# Training-data layer: dedup
# =====================================================================
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_read(spark, sf_dir, "documents"), "text", "doc_id")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs word-3-gram Jaccard ≥ 0.5 via inverted index."""
    return D.ngram_jaccard_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.5
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32)+LSH(8×4) candidates, exact-Jaccard verified ≥ 0.5.
    Fully deterministic (md5-derived hashes) — exact SQL mirror."""
    return D.minhash_lsh_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, n_hashes=32, bands=8, threshold=0.5,
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters over the MinHash-LSH pair graph
    (distributed min-label + pointer-jumping connected components) with
    canonical-member keep flags — the partition a training pipeline
    actually consumes, not just pairs.  Deterministic ⇒ exact oracle
    (recursive-CTE closure in DuckDB)."""
    return CL.dedup_clusters(
        _read(spark, sf_dir, "documents"), "text", "doc_id",
        n=3, n_hashes=32, bands=8, threshold=0.5,
    )


DEDUP_CLUSTERS_SQL = CL.dedup_clusters_sql(
    "documents", "text", "doc_id", n=3, n_hashes=32, bands=8, threshold=0.5
)

# training-mix rates: keep half the English, all German, a quarter of
# the rest — arbitrary but fixed; the point is per-stratum thresholds
SAMPLE_RATES = {"en": 0.5, "de": 1.0}
SAMPLE_DEFAULT = 0.25


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling by predicted language:
    salted-md5 bucket per doc, per-stratum integer thresholds.  The
    same rows survive at any parallelism (north-rule property) and the
    selection reproduces bit-for-bit in DuckDB."""
    docs = _read(spark, sf_dir, "documents")
    return SMP.stratified_sample(
        docs, TX.lang_id("text"), SAMPLE_RATES, "doc_id",
        default_rate=SAMPLE_DEFAULT,
    ).select("doc_id", "stratum", "bucket")


STRATIFIED_SAMPLE_SQL = SMP.stratified_sample_sql(
    "documents",
    TX.lang_id_sql("text"),
    SAMPLE_RATES,
    "doc_id",
    select="doc_id, stratum, bucket",
    default_rate=SAMPLE_DEFAULT,
)


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-then-chunk packing manifest: docs hash-bucketed
    into 8 independent shards, per-shard running token offsets map each
    doc to its fixed-size training windows.  Distributed prefix sum —
    (shard, sub) cell cumsums + broadcast subshard base offsets, no
    single-task-per-shard window — with an exact integer-arithmetic
    DuckDB mirror (r02 driver divergence fixed: BIGINT casts, ``//``
    floor-div, ``tok_offset`` not the reserved word ``offset``)."""
    docs = _read(spark, sf_dir, "documents")
    return PK.pack_manifest(docs, "doc_id", max_tokens=512, n_shards=8)


SEQUENCE_PACKING_SQL = PK.pack_manifest_sql(
    "documents", "doc_id", max_tokens=512, n_shards=8
)


def q_sequence_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-slice emitter over the packing manifest: one row per
    (doc, training window) with the doc-relative token range inside
    that window — the join target a training loader uses to assemble
    fixed-length batches.  Pure integer arithmetic past the
    distributed prefix sum; exact DuckDB mirror."""
    docs = _read(spark, sf_dir, "documents")
    return PK.pack_windows(docs, "doc_id", max_tokens=512, n_shards=8)


SEQUENCE_WINDOWS_SQL = PK.pack_windows_sql(
    "documents", "doc_id", max_tokens=512, n_shards=8
)


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus prep composite: quality-score filter
    + exact-dedup winners + near-dup cluster representative, in one
    shared plan (``functions/corpus.py`` — the same definition the CLI
    job runs).  The cluster representative is the min-id member that
    PASSES the quality filter (r2 advisory: the unconditional min-id
    canonical silently lost whole clusters whose canonical member was
    low-quality)."""
    docs = _read(spark, sf_dir, "documents")
    return CORPUS.corpus_keep(docs, "text", "doc_id", min_quality=0.5)


CORPUS_PREP_SQL = CORPUS.corpus_keep_sql(
    "documents", "text", "doc_id", min_quality=0.5
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing ≥1 distinct
    word-8-gram with the held-out set (deterministic subset
    doc_id % 53 == 0 stands in for an eval benchmark).  Bench gram-set
    broadcast + scan-local doc-side explode — no corpus-wide shuffle
    (functions/decontam.py)."""
    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 53 == 0)
    return DECON.contaminated_docs(docs, bench, "text", "doc_id", n=8)


DECONTAMINATE_SQL = DECON.contaminated_docs_sql(
    "documents",
    "SELECT text FROM documents WHERE doc_id % 53 = 0",
    "text",
    "doc_id",
    n=8,
)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (email / IPv4 / phone patterns with identical Java-
    regex and RE2 semantics): the corpus text is deterministically
    seeded with synthetic PII (the testdata contains none), then
    redacted; n_pii counts spans pattern-by-pattern on the
    progressively redacted text.  Pure codegen'd regexp chain —
    scan-local, no shuffle, no Python."""
    docs = _read(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-000-"),
            F.col("doc_id").cast("string"),
            F.lit(" at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )
    return seeded.select(
        "doc_id",
        TX.redact_pii("text").alias("redacted"),
        TX.pii_count("text").alias("n_pii"),
    )


_PII_SEEDED = (
    "(text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or +1 555-000-' || CAST(doc_id AS VARCHAR) || "
    "' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7')"
)
PII_REDACTION_SQL = f"""
SELECT doc_id,
       {TX.redact_pii_sql(_PII_SEEDED)} AS redacted,
       {TX.pii_count_sql(_PII_SEEDED)} AS n_pii
FROM documents
"""


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: per-source token shares vs a target
    mixture (src0 pinned to 30%, src1 to 20%, rest share the remaining
    mass equally); weight = target/actual is the up/down-sampling
    factor.  One map-side-combined aggregate + tiny-frame window
    (functions/sample.py::mixture_weights)."""
    docs = _read(spark, sf_dir, "documents")
    return SMP.mixture_weights(
        docs, "source", text_col="text", target={"src0": 0.3, "src1": 0.2}
    )


MIXTURE_WEIGHTS_SQL = SMP.mixture_weights_sql(
    "documents", "source", text_col="text", target={"src0": 0.3, "src1": 0.2}
)


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact-substring dedup (distributed approximation of
    Lee et al. 2022's suffix-array ExactSubstr): 20-token chunks,
    corpus-wide keep-first on the 60-bit chunk hash, in-order text
    reconstruction.  Shuffles 8-byte hash keys only
    (functions/dedup.py::chunk_dedup)."""
    docs = _read(spark, sf_dir, "documents")
    return D.chunk_dedup(docs, "text", "doc_id", chunk_tokens=20)


CHUNK_DEDUP_SQL = D.chunk_dedup_sql("documents", "text", "doc_id", chunk_tokens=20)


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-unigram LM quality score: mean token
    log-probability under the corpus's own frequency table.  Two
    map-side-combined aggregates + a vocab equi-join; the per-doc sum
    folds pre-rounded terms in token-sorted order so the oracle is
    bit-exact (functions/lm.py::unigram_logprob)."""
    docs = _read(spark, sf_dir, "documents")
    return LM.unigram_logprob(docs, "text", "doc_id")


UNIGRAM_LOGPROB_SQL = LM.unigram_logprob_sql("documents", "text", "doc_id")


def q_unigram_logprob_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM scoring (the CCNet reference-corpus setup): the
    model is fit on doc_id % 3 != 0, every doc is scored under it
    with add-0.5 smoothing so out-of-vocabulary tokens are finite.
    Same plan shapes as self-scoring plus a left join for OOV
    (functions/lm.py)."""
    docs = _read(spark, sf_dir, "documents")
    model = docs.filter(F.col("doc_id") % 3 != 0)
    return LM.unigram_logprob(docs, "text", "doc_id", model=model, alpha=0.5)


UNIGRAM_LOGPROB_HELDOUT_SQL = LM.unigram_logprob_sql(
    "documents",
    "text",
    "doc_id",
    model_sql="SELECT text FROM documents WHERE doc_id % 3 <> 0",
    alpha=0.5,
)


def q_simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", D.simhash("text").alias("simhash"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32) pairs with Hamming ≤ 3 via pigeonhole chunk-LSH
    (exact: max_hamming < chunks ⇒ no recall loss)."""
    return D.simhash_neardup_pairs(
        _read(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3
    )


# =====================================================================
# Training-data layer: embedding similarity
# =====================================================================
def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, _queries_df(spark, sf_dir), k=10)


ANN_BRUTE_SQL = SIM.brute_force_topk_sql(
    "embeddings",
    "SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 5",
    k=10,
)


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over int8-quantized vectors (4× storage shrink) —
    exact for the quantized representation, so it carries a full
    DuckDB oracle; recall vs the f32 top-k is asserted in tests."""
    emb = _read(spark, sf_dir, "embeddings")
    return SIM.quantized_topk(emb, _queries_df(spark, sf_dir), k=10)


ANN_QUANTIZED_SQL = SIM.quantized_topk_sql(
    "embeddings",
    "SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 5",
    k=10,
)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed top-k — the 100 TB scale path.  Gated here in
    its exact degenerate configuration (n_planes=0 ⇒ every vector in
    one bucket ⇒ candidates = all pairs ⇒ brute force), which runs the
    FULL LSH plumbing — posexplode bucketing, (table, bucket)
    equi-join, bare-pair candidate dedup, vector re-join, exact
    rerank — under the brute-force DuckDB oracle; the same full-probe
    trick that gates ``ann_ivf_topk``.  Approximate configurations
    (n_planes>0) are recall-tested in tests/test_windows.py."""
    emb = _read(spark, sf_dir, "embeddings")
    return SIM.lsh_topk(
        emb, _queries_df(spark, sf_dir), k=10, dim=64, n_planes=0, n_tables=1
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer + probe-list
    candidate join + exact rerank.  Run FULL-probe here
    (nprobe == n_centroids), which is exactly brute force — the oracle
    validates the whole IVF plumbing (train, assign, probe ordering,
    rerank); partial-probe recall is asserted in
    tests/test_functions.py."""
    emb = _read(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(
        emb, _queries_df(spark, sf_dir), k=10,
        n_centroids=8, nprobe=8, iters=2, dim=64,
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    return SIM.embedding_neardup_pairs(emb, threshold=0.4)


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: sign-LSH candidates + exact
    cosine verify.  Gated in the exact degenerate configuration
    (n_planes=0 ⇒ single bucket ⇒ candidates = all id1<id2 pairs),
    which exercises the full candidate-generation / bare-pair-dedup /
    vector-re-join / verify pipeline under the exact all-pairs DuckDB
    oracle.  Approximate configurations (the production 6×8 defaults)
    keep their precision-1 + recall tests in tests/test_windows.py."""
    emb = _read(spark, sf_dir, "embeddings")
    return SIM.embedding_neardup_pairs_lsh(
        emb, threshold=0.4, dim=64, n_planes=0, n_tables=1
    )


EMB_NEARDUP_SQL = SIM.embedding_neardup_pairs_sql("embeddings", threshold=0.4)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (functions/semantic.py): k-means
    cluster the embeddings, cosine-pair strictly within clusters, close
    pairs into duplicate groups, keep the min-id representative.  Gated
    at the deterministic ``iters=0`` config (centroids = the k
    lowest-id vectors — the quantizer's init), which runs the full
    assignment/pair/closure pipeline with SQL-expressible centroids;
    Lloyd-iterated configs are numpy-cross-checked in
    tests/test_semantic.py.

    Assignment stays on the exact-oracle expression argmin (cluster
    MEMBERSHIP is bit-pinned to the DuckDB mirror); the within-cluster
    quadratic pair stage runs the tiled grouped-Arrow GEMM — one
    vector shuffle + BLAS instead of a self-join evaluating an
    interpreted array fold per candidate pair (r6: 31 s → 1.7 s at
    20 k vectors, pair sets identical; equality of the two pair impls
    is additionally asserted per-cos in tests/test_semantic.py and the
    gate hash-checked against the unchanged oracle SQL)."""
    from kafka_connect_jdbc_flatten_spark.functions.semantic import semantic_dedup

    emb = _read(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=8, threshold=0.4, iters=0, pair_impl="arrow")


def _semantic_dedup_sql() -> str:
    from kafka_connect_jdbc_flatten_spark.functions.semantic import (
        semantic_dedup_sql,
    )

    return semantic_dedup_sql("embeddings", k=8, threshold=0.4)


# =====================================================================
# Training-data layer: multimodal plumbing
# =====================================================================
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched (mapInPandas) metadata extraction over binary
    payloads — deterministic fake decode, real plumbing."""
    docs = attach_fake_blob(_read(spark, sf_dir, "documents"), "text")
    return fake_decode_meta(docs)


MULTIMODAL_META_SQL = """
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       lower(hex(encode(substring(text, 1, 4)))) AS head_hex,
       md5(text) AS content_md5
FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame sampling through mapInPandas (row-exploding Arrow
    batches — the video-decode shape)."""
    docs = attach_fake_blob(_read(spark, sf_dir, "documents"), "text")
    return frame_sample(docs, every_ms=1000)


MULTIMODAL_FRAMES_SQL = """
WITH d AS (
  SELECT doc_id,
         greatest(octet_length(encode(text)) // 10, 1) AS dur
  FROM documents
)
SELECT doc_id,
       unnest(range(((dur + 999) // 1000)::INT))::INT AS frame_idx,
       (unnest(range(((dur + 999) // 1000)::INT)) * 1000)::BIGINT AS frame_ts_ms
FROM d
"""


def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no optional deps: every document row gets a
    deterministic synthetic PNG (gray, ``width = 4 + doc_id % 13``,
    ``height = 3 + doc_id % 7``, flat pixel ``i = (doc_id*7 + i) %
    256``, scanline filter ``row % 5`` so all five unfilter paths
    run), and the pure-stdlib codec (`functions/png.py` — zlib
    inflate, chunk CRC checks, Sub/Up/Average/Paeth reversal) decodes
    it back inside Arrow ``mapInPandas`` batches.  The DuckDB oracle
    cannot decode PNG — it computes the SAME statistics from the
    closed-form pixel rule, so any decode bug (wrong filter reversal,
    wrong stride, wrong inflate handling) breaks the integer-exact
    ``px_sum`` hash match.  The codec is additionally pixel-exact
    against Spark's independent JVM ImageIO decoder
    (tests/test_functions.py)."""
    docs = attach_png_blob(_read(spark, sf_dir, "documents"))
    return decode_png_meta(docs).drop("px_md5")


PNG_DECODE_SQL = """
WITH d AS (
  SELECT doc_id,
         (4 + doc_id % 13)::INT AS width,
         (3 + doc_id % 7)::INT AS height
  FROM documents
)
SELECT d.doc_id,
       d.width,
       d.height,
       1::INT AS channels,
       8::INT AS bit_depth,
       SUM((d.doc_id * 7 + r.i) % 256)::BIGINT AS px_sum,
       COUNT(*)::BIGINT AS n_px
FROM d, UNNEST(range(0, d.width * d.height)) AS r(i)
GROUP BY 1, 2, 3
"""


def q_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end: synthetic closed-form PNG →
    `resize_png` (decode → stride-2 nearest-neighbor downsample →
    re-ENCODE, all inside the Arrow batches) → `decode_png_meta` on
    the resized blobs.  Both codec directions run on the workers; the
    DuckDB oracle recomputes the downsampled integer pixel statistics
    directly from the closed-form rule (kept pixel (y, x) came from
    source flat index 2y·w + 2x)."""
    from kafka_connect_jdbc_flatten_spark.functions.multimodal import (
        resize_png,
    )

    docs = attach_png_blob(_read(spark, sf_dir, "documents"))
    return decode_png_meta(resize_png(docs, factor=2)).drop("px_md5")


PNG_RESIZE_SQL = """
WITH d AS (
  SELECT doc_id,
         (4 + doc_id % 13)::INT AS width,
         (3 + doc_id % 7)::INT AS height
  FROM documents
),
r AS (
  SELECT doc_id, width,
         ((width + 1) // 2)::INT AS w2,
         ((height + 1) // 2)::INT AS h2
  FROM d
)
SELECT r.doc_id,
       r.w2 AS width,
       r.h2 AS height,
       1::INT AS channels,
       8::INT AS bit_depth,
       SUM((r.doc_id * 7 + (u.i // r.w2) * 2 * r.width + (u.i % r.w2) * 2) % 256)::BIGINT AS px_sum,
       COUNT(*)::BIGINT AS n_px
FROM r, UNNEST(range(0, r.w2 * r.h2)) AS u(i)
GROUP BY 1, 2, 3
"""


def q_png_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image feature extraction: decode each closed-form PNG and
    emit an exact 8-bin intensity histogram (one row per non-empty
    bin).  The DuckDB oracle bins the closed-form pixel rule directly
    — any decode or binning bug breaks the integer-exact counts."""
    from kafka_connect_jdbc_flatten_spark.functions.multimodal import (
        png_histogram,
    )

    docs = attach_png_blob(_read(spark, sf_dir, "documents"))
    return png_histogram(docs, n_bins=8)


PNG_HISTOGRAM_SQL = """
WITH d AS (
  SELECT doc_id,
         (4 + doc_id % 13)::INT AS width,
         (3 + doc_id % 7)::INT AS height
  FROM documents
)
SELECT d.doc_id,
       (((d.doc_id * 7 + r.i) % 256) // 32)::INT AS bin,
       COUNT(*)::BIGINT AS n
FROM d, UNNEST(range(0, d.width * d.height)) AS r(i)
GROUP BY 1, 2
"""


def q_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no optional deps: every document row gets a
    deterministic synthetic PCM WAV (mono 16-bit 8 kHz, ``n_frames =
    64 + doc_id % 129``, sample ``i = ((doc_id*31 + i*17) % 65536) -
    32768``) and the pure-stdlib RIFF parser (`functions/wav.py`,
    byte-exact against Python's independent stdlib ``wave`` module)
    decodes it back inside Arrow ``mapInPandas`` batches.  The DuckDB
    oracle recomputes the same integer sample statistics from the
    closed form, so a parsing bug (wrong chunk walk, wrong dtype,
    wrong frame split) breaks the exact ``amp_sum`` hash match."""
    docs = attach_wav_blob(_read(spark, sf_dir, "documents"))
    return decode_wav_meta(docs).drop("pcm_md5")


WAV_DECODE_SQL = """
WITH d AS (
  SELECT doc_id, (64 + doc_id % 129)::BIGINT AS n_frames
  FROM documents
)
SELECT d.doc_id,
       8000::INT AS sample_rate,
       1::INT AS channels,
       16::INT AS bits,
       d.n_frames,
       (d.n_frames * 1000) // 8000 AS duration_ms,
       SUM((d.doc_id * 31 + r.i * 17) % 65536 - 32768)::BIGINT AS amp_sum
FROM d, UNNEST(range(0, d.n_frames)) AS r(i)
GROUP BY 1, 5
"""


def q_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction: decode the closed-form PCM and
    emit frame count, amplitude extremes, and the strict-sign
    zero-crossing count — all exact integers; the DuckDB oracle
    recomputes them from the sample rule (crossings via an
    i→i+1 self-join)."""
    from kafka_connect_jdbc_flatten_spark.functions.multimodal import (
        wav_features,
    )

    docs = attach_wav_blob(_read(spark, sf_dir, "documents"))
    return wav_features(docs)


WAV_FEATURES_SQL = """
WITH d AS (
  SELECT doc_id, (64 + doc_id % 129)::BIGINT AS n FROM documents
),
s AS (
  SELECT d.doc_id, r.i,
         (d.doc_id * 31 + r.i * 17) % 65536 - 32768 AS v
  FROM d, UNNEST(range(0, d.n)) AS r(i)
),
agg AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_frames,
         MIN(v)::BIGINT AS amp_min, MAX(v)::BIGINT AS amp_max
  FROM s GROUP BY 1
),
zc AS (
  SELECT a.doc_id,
         SUM(CASE WHEN a.v * b.v < 0 THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
  FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY 1
)
SELECT agg.doc_id, agg.n_frames, agg.amp_min, agg.amp_max,
       coalesce(zc.zero_crossings, 0)::BIGINT AS zero_crossings
FROM agg LEFT JOIN zc ON agg.doc_id = zc.doc_id
"""


def q_avi_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling: every document row gets a
    closed-form uncompressed BGR24 AVI (25 fps, up to 9 frames, width
    5 exercises DIB row padding); `sample_avi_frames` parses the RIFF
    container, keeps frames whose real container timestamp (f ×
    us_per_frame // 1000) lands on an 80 ms boundary, and emits the
    decoded shape + exact pixel sum per kept frame.  The DuckDB
    oracle recomputes timing and statistics from the closed form — a
    container-walk, row-padding, or bottom-up-flip bug shifts every
    byte and breaks the integer-exact px_sum."""
    from kafka_connect_jdbc_flatten_spark.functions.multimodal import (
        attach_avi_blob,
        sample_avi_frames,
    )

    docs = attach_avi_blob(_read(spark, sf_dir, "documents"))
    return sample_avi_frames(docs, every_ms=80)


def q_avi_frame_sample_zlib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compressed-stream branch's positive path (round 5): the
    same frame sampling over the ZLIB stream variant (zlib-deflated
    DIB bytes in ``00dc`` chunks, stdlib-only) — decoded pixels are
    identical, so the SAME closed-form oracle must hash-match, proving
    the decompress→DIB path end-to-end.  Other codecs still raise
    honestly."""
    from kafka_connect_jdbc_flatten_spark.functions.multimodal import (
        attach_avi_blob,
        sample_avi_frames,
    )

    docs = attach_avi_blob(_read(spark, sf_dir, "documents"), compression="zlib")
    return sample_avi_frames(docs, every_ms=80)


AVI_FRAME_SAMPLE_SQL = """
WITH d AS (
  SELECT doc_id,
         (3 + doc_id % 7)::INT AS n_frames,
         (4 + doc_id % 5)::INT AS width,
         (2 + doc_id % 3)::INT AS height
  FROM documents
),
fr AS (
  SELECT d.doc_id, d.width, d.height,
         g.f::INT AS frame_idx,
         ((g.f * 40000) // 1000)::BIGINT AS frame_ts_ms
  FROM d, UNNEST(range(0, d.n_frames)) AS g(f)
  WHERE ((g.f * 40000) // 1000) % 80 = 0
)
SELECT fr.doc_id, fr.frame_idx, fr.frame_ts_ms, fr.height, fr.width,
       SUM((fr.doc_id * 13 + fr.frame_idx * 101 + r.i) % 256)::BIGINT AS px_sum
FROM fr, UNNEST(range(0, fr.width * fr.height * 3)) AS r(i)
GROUP BY 1, 2, 3, 4, 5
"""


def q_streaming_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming document ingest (extension layer meets the streaming
    runtime): file-source micro-batches → stateful streaming
    ``dropDuplicates`` on the content fingerprint → exactly-once lake
    append (``streaming/corpus.py``).  The surviving ROW per
    fingerprint is stream-order-dependent (first seen), but its
    NORMALIZED text is fingerprint-determined, so the (fp, norm_text)
    projection is deterministic and DuckDB-checkable."""
    from kafka_connect_jdbc_flatten_spark.functions.text import normalize_text
    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        StreamingCorpusIngest,
    )

    root = _tmp("corpstream")
    feed = os.path.join(root, "feed")
    (
        _read(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(2)
        .write.parquet(feed)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    ing = StreamingCorpusIngest(
        spark,
        feed,
        os.path.join(root, "wh"),
        os.path.join(root, "ckpt"),
        schema=schema,
        max_files_per_trigger=1,  # force multiple micro-batches
        n_buckets=8,
    )
    ing.run_available(timeout_sec=600)
    return ing.read().select(
        F.col("fp"), normalize_text("text").alias("norm_text")
    )


STREAMING_CORPUS_SQL = """
SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text
FROM documents
"""


# =====================================================================
# Driver contract
# =====================================================================
def _two_phase_replay(spark: SparkSession, sf_dir: str):
    """Replay the changelog in two seq-split batches, returning the
    turns LakeTable plus the snapshot versions after each batch —
    shared harness of the time-travel and CDC-egress gates."""
    wh = _tmp("tt")
    applier = CdcApplier(spark, wh, _transcript_plan(), n_buckets=8)
    cl = transcript_changelog(spark, sf_dir)
    cutoff = (
        int(
            _read(spark, sf_dir, "events")
            .agg(F.max("event_id"))
            .collect()[0][0]
        )
        // 2
    )
    applier.apply_batch(cl.filter(F.col("seq") <= cutoff), batch_id=0)
    turns = applier.tables[TURNS_TABLE]
    v1 = turns.manifest()["version"]
    applier.apply_batch(cl.filter(F.col("seq") > cutoff), batch_id=1)
    v2 = turns.manifest()["version"]
    return turns, v1, v2


def q_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (Iceberg VERSION AS OF): pin the turns
    table's version after the prefix batch, apply the rest of the
    feed, then read the PINNED version — must equal the prefix-replay
    state even though the current table has moved on (tombstones
    applied, prefixes extended)."""
    turns, v1, _v2 = _two_phase_replay(spark, sf_dir)
    from kafka_connect_jdbc_flatten_spark.lake.table import (
        BUCKET_COL,
        SEQ_COL,
    )

    return turns.read(version=v1).drop(BUCKET_COL, SEQ_COL)


def q_cdc_egress_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC egress (Iceberg changelog scan): the keyed row-level diff
    between the two replay snapshots — inserts for turns that only
    exist after the second batch, deletes for tombstoned
    conversations; payload columns compared WITHOUT the bookkeeping
    seq so whole-image rewrites of unchanged turns stay silent."""
    turns, v1, v2 = _two_phase_replay(spark, sf_dir)
    return turns.read_changes(
        v1, v2, compare_cols=["role", "text", "tool", "ts"]
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment (operators/asof.py): each event picks
    up the newest same-or-earlier order-day aggregate of its user —
    checked against DuckDB's NATIVE ASOF JOIN, an independent
    implementation of the same semantics.  The dimension is
    pre-reduced to one row per (user, day) so the match is
    deterministic; a third of the users are filtered out of the
    dimension to exercise the LEFT OUTER misses."""
    from kafka_connect_jdbc_flatten_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    dim = (
        _read(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 3 != 1)
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
        )
        .agg(
            F.max("o_totalprice").alias("last_price"),
            F.count(F.lit(1)).cast("long").alias("n_same_day"),
        )
    )
    return asof_join(
        ev,
        dim,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderdate", "last_price", "n_same_day"],
    ).withColumnRenamed("o_orderdate", "last_order_ts")


ASOF_JOIN_SQL = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_totalprice) AS last_price,
         count(*)::BIGINT AS n_same_day
  FROM orders
  WHERE o_custkey % 3 != 1
  GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       r.o_orderdate AS last_order_ts, r.last_price, r.n_same_day
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: full CDC replay to final transcript state."""
    return q_cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # CDC / flatten core (SURVEY §2)
        "cdc_replay_final_state": q_cdc_replay_final_state,
        "cdc_streaming_resume": q_cdc_streaming_resume,
        "pk_mode_record_key": q_pk_mode_record_key,
        "flatten_explode_prefixes": q_flatten_explode_prefixes,
        "flatten_map_explode": q_flatten_map_explode,
        "flatten_coordinates": q_flatten_coordinates,
        "flatten_pk_propagation": q_flatten_pk_propagation,
        "flatten_nested_struct": q_flatten_nested_struct,
        "incremental_tail": q_incremental_tail,
        "incremental_tail_multits": q_incremental_tail_multits,
        "poller_drain": q_poller_drain,
        "query_mode_tail": q_query_mode_tail,
        "record_validation": q_record_validation,
        "flatten_uppercase": q_flatten_uppercase,
        "table_name_format": q_table_name_format,
        "lww_window": q_lww_window,
        "lww_aggregate": q_lww_aggregate,
        "lww_salted": q_lww_salted,
        "changelog_op_counts": q_changelog_op_counts,
        "topk_events": q_topk_events,
        "pricing_summary": q_pricing_summary,
        "shipping_priority": q_shipping_priority,
        "parent_child_join": q_parent_child_join,
        "schema_evolution": q_schema_evolution,
        "schema_evolution_streaming": q_schema_evolution_streaming,
        "incremental_delay": q_incremental_delay,
        "windowed_rates": q_windowed_rates,
        "insert_mode_append": q_insert_mode_append,
        "update_mode": q_update_mode,
        # training-data layer
        "text_quality": q_text_quality,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "repetition_features": q_repetition,
        "doc_fingerprint": q_fingerprint,
        "dedup_exact": q_dedup_exact,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "stratified_sample": q_stratified_sample,
        "sequence_packing": q_sequence_packing,
        "sequence_windows": q_sequence_windows,
        "corpus_prep": q_corpus_prep,
        "decontaminate": q_decontaminate,
        "pii_redaction": q_pii_redaction,
        "mixture_weights": q_mixture_weights,
        "chunk_dedup": q_chunk_dedup,
        "unigram_logprob": q_unigram_logprob,
        "unigram_logprob_heldout": q_unigram_logprob_heldout,
        "simhash_values": q_simhash_values,
        "dedup_simhash": q_dedup_simhash,
        "ann_brute_topk": q_ann_brute_topk,
        "ann_quantized_topk": q_ann_quantized_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_neardup": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "semantic_dedup": q_semantic_dedup,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_frames": q_multimodal_frames,
        "png_decode": q_png_decode,
        "png_resize": q_png_resize,
        "png_histogram": q_png_histogram,
        "wav_decode": q_wav_decode,
        "wav_features": q_wav_features,
        "avi_frame_sample": q_avi_frame_sample,
        "avi_frame_sample_zlib": q_avi_frame_sample_zlib,
        "streaming_corpus_ingest": q_streaming_corpus_ingest,
        # lake snapshot layer (round-4 continuation)
        "time_travel_read": q_time_travel_read,
        "cdc_egress_changes": q_cdc_egress_changes,
        "asof_join": q_asof_join,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles — every query carries one.  The two sign-LSH
    queries are gated in exact degenerate configurations (n_planes=0),
    mirrored by the brute-force / all-pairs SQL; their approximate
    configurations stay recall-tested in pytest."""
    return {
        "cdc_replay_final_state": FINAL_STATE_SQL,
        "cdc_streaming_resume": FINAL_STATE_SQL,
        "pk_mode_record_key": FINAL_STATE_SQL,
        "flatten_explode_prefixes": FLATTEN_PREFIXES_SQL,
        "flatten_map_explode": MAP_EXPLODE_SQL,
        "flatten_coordinates": COORDINATES_SQL,
        "flatten_pk_propagation": PK_PROPAGATION_SQL,
        "flatten_nested_struct": NESTED_STRUCT_SQL,
        "incremental_tail": INCREMENTAL_TAIL_SQL,
        "incremental_tail_multits": INCREMENTAL_TAIL_MULTITS_SQL,
        "poller_drain": POLLER_DRAIN_SQL,
        "query_mode_tail": QUERY_MODE_TAIL_SQL,
        "record_validation": RECORD_VALIDATION_SQL,
        "flatten_uppercase": UPPERCASE_SQL,
        "table_name_format": TABLE_NAME_FORMAT_SQL,
        "lww_window": LWW_SQL,
        "lww_aggregate": LWW_SQL,
        "lww_salted": LWW_SQL,
        "changelog_op_counts": OP_COUNTS_SQL,
        "topk_events": TOPK_SQL,
        "pricing_summary": PRICING_SUMMARY_SQL,
        "shipping_priority": SHIPPING_PRIORITY_SQL,
        "parent_child_join": PARENT_CHILD_SQL,
        "schema_evolution": SCHEMA_EVOLUTION_SQL,
        "schema_evolution_streaming": SCHEMA_EVOLUTION_STREAMING_SQL,
        "incremental_delay": INCREMENTAL_DELAY_SQL,
        "windowed_rates": WINDOWED_RATES_SQL,
        "insert_mode_append": INSERT_MODE_SQL,
        "update_mode": UPDATE_MODE_SQL,
        "text_quality": text_quality_sql(),
        "token_counts": TOKEN_COUNTS_SQL,
        "lang_id": LANG_ID_SQL,
        "repetition_features": repetition_sql(),
        "doc_fingerprint": FINGERPRINT_SQL,
        "dedup_exact": D.exact_dedup_sql("documents", "text", "doc_id"),
        "ngram_jaccard": D.ngram_jaccard_pairs_sql(
            "documents", "text", "doc_id", n=3, threshold=0.5
        ),
        "dedup_minhash_lsh": D.minhash_lsh_pairs_sql(
            "documents", "text", "doc_id", n=3, n_hashes=32, bands=8, threshold=0.5
        ),
        "dedup_clusters": DEDUP_CLUSTERS_SQL,
        "stratified_sample": STRATIFIED_SAMPLE_SQL,
        "sequence_packing": SEQUENCE_PACKING_SQL,
        "sequence_windows": SEQUENCE_WINDOWS_SQL,
        "corpus_prep": CORPUS_PREP_SQL,
        "decontaminate": DECONTAMINATE_SQL,
        "pii_redaction": PII_REDACTION_SQL,
        "mixture_weights": MIXTURE_WEIGHTS_SQL,
        "chunk_dedup": CHUNK_DEDUP_SQL,
        "unigram_logprob": UNIGRAM_LOGPROB_SQL,
        "unigram_logprob_heldout": UNIGRAM_LOGPROB_HELDOUT_SQL,
        "simhash_values": f"SELECT doc_id, {D.simhash_sql('text')} AS simhash FROM documents",
        "dedup_simhash": D.simhash_neardup_pairs_sql(
            "documents", "text", "doc_id", max_hamming=3
        ),
        "ann_brute_topk": ANN_BRUTE_SQL,
        "ann_quantized_topk": ANN_QUANTIZED_SQL,
        "ann_lsh_topk": ANN_BRUTE_SQL,  # n_planes=0 ⇒ exact brute force
        "ann_ivf_topk": ANN_BRUTE_SQL,  # full probe ≡ exact brute force
        "embedding_neardup": EMB_NEARDUP_SQL,
        "embedding_neardup_lsh": EMB_NEARDUP_SQL,  # n_planes=0 ⇒ all pairs
        "semantic_dedup": _semantic_dedup_sql(),
        "multimodal_meta": MULTIMODAL_META_SQL,
        "multimodal_frames": MULTIMODAL_FRAMES_SQL,
        "png_decode": PNG_DECODE_SQL,
        "png_resize": PNG_RESIZE_SQL,
        "png_histogram": PNG_HISTOGRAM_SQL,
        "wav_decode": WAV_DECODE_SQL,
        "wav_features": WAV_FEATURES_SQL,
        "avi_frame_sample": AVI_FRAME_SAMPLE_SQL,
        "avi_frame_sample_zlib": AVI_FRAME_SAMPLE_SQL,  # same decoded pixels
        "streaming_corpus_ingest": STREAMING_CORPUS_SQL,
        "time_travel_read": PREFIX_STATE_SQL,
        "cdc_egress_changes": EGRESS_CHANGES_SQL,
        "asof_join": ASOF_JOIN_SQL,
    }
