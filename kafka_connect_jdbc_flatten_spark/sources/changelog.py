"""Deterministic synthetic CDC changelog (replayed-binlog fixture).

Builds the nested transcript envelope feed (FIXTURES.md §2) from the
driver-generated ``events`` parquet — deterministic, seeded by the
driver, no external data.  Each event of a conversation produces one
change envelope whose ``after`` image carries the transcript *prefix*
up to that turn (multi-turn conversations growing over time); selected
conversations receive a final tombstone.  The final state after full
replay is therefore exactly derivable with plain SQL — which is what
the DuckDB oracle checks.

Derivation (mirrored 1:1 by the oracle SQL in ``__spark_entry__``):

* ``conv_id``   = ``cast(user_id as string)``
* ``turn_idx``  = ``row_number() over (partition by user_id order by ts,
  event_id) - 1``
* ``role``/``tool`` = ``event_type``, ``text`` = ``props``
* envelope ``seq`` = ``event_id`` (globally unique binlog position),
  ``op`` = ``c`` for the first turn, ``u`` for later prefixes
* conversations with ``user_id % 10 == 7`` get a trailing tombstone
  (``op='d'``, null value) with ``seq`` past every event

Source-side operators covered: S2 (incremental tail — ``seq`` ranges),
S5 (late-arrival delay — the generator can shuffle within a jitter
window), S6 (schema'd conversion).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import FlattenConfig

TURN_SCHEMA = T.StructType(
    [
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TRANSCRIPT_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turns", T.ArrayType(TURN_SCHEMA, True), True),
    ]
)

TRANSCRIPT_KEY_SCHEMA = T.StructType(
    [T.StructField("conv_id", T.StringType(), False)]
)

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestamp_type", T.StringType(), True),
        T.StructField("key", TRANSCRIPT_KEY_SCHEMA, False),
        T.StructField("before", TRANSCRIPT_VALUE_SCHEMA, True),
        T.StructField("value", TRANSCRIPT_VALUE_SCHEMA, True),
        T.StructField("op", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def transcript_flatten_config(coordinates: bool = False) -> FlattenConfig:
    """Config whose flattened turn table matches BASELINE input_hint:
    ``transcripts(conv_id, turn_idx, role, text, tool, ts)``."""
    return FlattenConfig(
        topic="transcripts",
        pk_mode="flatten",
        insert_mode="upsert",
        delete_enabled=True,
        coordinates=coordinates,
        pk_fields=(
            "conversationkey.conv_id",
            "conversation.turns.turns.turn_idx",
        ),
        rename_fields={
            "conversationkey.conv_id": "conv_id",
            "conversation.turns.turns.turn_idx": "turn_idx",
            # the after-image's own conv_id copy would collide with the
            # key-derived conv_id column in the conversation root table
            "conversation.conv_id": "conv_id_img",
        },
    )


def _turns_base(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.col("user_id"),
        F.col("event_id"),
        F.col("ts"),
        F.struct(
            (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
            F.col("event_type").alias("role"),
            F.col("props").alias("text"),
            F.col("event_type").alias("tool"),
            F.col("ts").cast("timestamp").alias("ts"),
        ).alias("turn"),
    )


def transcript_changelog(
    spark: SparkSession,
    sf_dir: str,
    n_partitions: int = 4,
    tombstone_mod: int = 10,
    tombstone_rem: int = 7,
) -> DataFrame:
    """Events parquet → ordered CDC envelope DataFrame.

    One envelope per event carrying the transcript prefix as ``after``
    (plus the previous prefix as ``before``); a trailing tombstone for
    conversations where ``user_id % tombstone_mod == tombstone_rem``.
    ``partition`` = ``pmod(user_id, n_partitions)`` — the per-partition
    lineage column (key-partitioned like a Kafka topic).
    """
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base = _turns_base(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prefix = base.select(
        "user_id",
        "event_id",
        "ts",
        F.collect_list("turn").over(w).alias("after_turns"),
    ).withColumn(
        "before_turns",
        F.when(
            F.size("after_turns") > 1,
            F.slice("after_turns", 1, F.size("after_turns") - 1),
        ),
    )
    upserts = prefix.select(
        F.lit("transcripts").alias("topic"),
        F.pmod(F.col("user_id"), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit("CreateTime").alias("timestamp_type"),
        F.struct(F.col("user_id").cast("string").alias("conv_id")).alias("key"),
        F.when(
            F.col("before_turns").isNotNull(),
            F.struct(
                F.col("user_id").cast("string").alias("conv_id"),
                F.col("before_turns").alias("turns"),
            ),
        ).alias("before"),
        F.struct(
            F.col("user_id").cast("string").alias("conv_id"),
            F.col("after_turns").alias("turns"),
        ).alias("value"),
        F.when(F.size("after_turns") == 1, F.lit("c")).otherwise(F.lit("u")).alias("op"),
        F.col("event_id").cast("long").alias("seq"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    max_seq = events.agg(F.max("event_id")).collect()[0][0] or 0
    tombs = (
        events.filter(
            F.pmod(F.col("user_id"), F.lit(tombstone_mod)) == F.lit(tombstone_rem)
        )
        .groupBy("user_id")
        .agg(F.max("event_id").alias("last_id"), F.max("ts").alias("last_ts"))
        .select(
            F.lit("transcripts").alias("topic"),
            F.pmod(F.col("user_id"), F.lit(n_partitions)).cast("int").alias("partition"),
            (F.col("user_id") + F.lit(max_seq + 1)).alias("offset"),
            F.col("last_ts").cast("timestamp").alias("timestamp"),
            F.lit("CreateTime").alias("timestamp_type"),
            F.struct(F.col("user_id").cast("string").alias("conv_id")).alias("key"),
            F.lit(None).cast(TRANSCRIPT_VALUE_SCHEMA).alias("before"),
            F.lit(None).cast(TRANSCRIPT_VALUE_SCHEMA).alias("value"),
            F.lit("d").alias("op"),
            (F.col("user_id") + F.lit(max_seq + 1)).cast("long").alias("seq"),
            F.col("last_ts").cast("timestamp").alias("ts"),
        )
    )
    return upserts.unionByName(tombs)


def schema_carrying_envelope_schema(key_schema: T.DataType) -> T.StructType:
    """Envelope for a SCHEMA-CARRYING feed: the value travels as a JSON
    string next to its own Spark-schema JSON — the Connect
    ``SinkRecord(valueSchema, value)`` shape, which is what lets the
    sink detect a schema change per record and auto-evolve
    (``BufferedRecords.java:104-126``).  A fixed-schema file stream can
    then carry records of MANY value schemas in one feed."""
    return T.StructType(
        [
            T.StructField("topic", T.StringType(), False),
            T.StructField("partition", T.IntegerType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("timestamp", T.TimestampType(), True),
            T.StructField("timestamp_type", T.StringType(), True),
            T.StructField("key", key_schema, False),
            T.StructField("value", T.StringType(), True),
            T.StructField("value_schema", T.StringType(), True),
            T.StructField("op", T.StringType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )


def to_schema_carrying(
    changelog: DataFrame, value_schema: T.StructType
) -> DataFrame:
    """Typed envelope → schema-carrying envelope: serialize ``value``
    to JSON and attach the schema it was written with.  Tombstones
    (null value) keep a null payload but still carry the schema id."""
    cols = []
    for c in changelog.columns:
        if c == "before":
            continue  # schema-carrying feeds ship after-images only
        if c == "value":
            cols.append(F.to_json(F.col("value")).alias("value"))
            cols.append(F.lit(value_schema.json()).alias("value_schema"))
        else:
            cols.append(F.col(c))
    return changelog.select(*cols)


def write_changelog_chunks(
    changelog: DataFrame, out_dir: str, n_chunks: int = 4
) -> list[str]:
    """Write the changelog as ``n_chunks`` seq-ordered parquet files —
    binlog segments that the Structured Streaming file source tails in
    order (the replayed-binlog fixture of BASELINE.json)."""
    os.makedirs(out_dir, exist_ok=True)
    ranked = changelog.withColumn(
        "__chunk",
        F.ntile(n_chunks).over(Window.orderBy("seq")),
    ).cache()
    paths = []
    for i in range(1, n_chunks + 1):
        p = os.path.join(out_dir, f"chunk-{i:05d}")
        ranked.filter(F.col("__chunk") == i).drop("__chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        paths.append(p)
    ranked.unpersist()
    return paths
