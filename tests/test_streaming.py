"""Streaming ingest tests: checkpoint resume, exactly-once across
restart, streaming-vs-batch final-state equality, lineage."""

import shutil

from pyspark.sql import functions as F

from kafka_connect_jdbc_flatten_spark.operators.merge import CdcApplier
from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan
from kafka_connect_jdbc_flatten_spark.sources.changelog import (
    TRANSCRIPT_KEY_SCHEMA,
    TRANSCRIPT_VALUE_SCHEMA,
    transcript_changelog,
    transcript_flatten_config,
    write_changelog_chunks,
)
from kafka_connect_jdbc_flatten_spark.streaming.pipeline import StreamingIngest

SF = "/root/testdata/sf0.001"
TURNS = "transcripts_conversation_turns"


def make_plan():
    return compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA,
        TRANSCRIPT_VALUE_SCHEMA,
        transcript_flatten_config(),
        value_record_name="Conversation",
        key_record_name="ConversationKey",
    )


def test_streaming_matches_batch_and_resumes(spark, tmp_path):
    plan = make_plan()
    changelog = transcript_changelog(spark, SF).cache()

    # ---- batch reference: replay everything in one go ----------------
    ref = CdcApplier(spark, str(tmp_path / "ref_wh"), plan, n_buckets=8)
    ref.apply_batch(changelog, batch_id=0)
    expected = ref.read(TURNS)

    # ---- streaming phase 1: only the first half of the binlog --------
    feed = tmp_path / "feed"
    chunks = write_changelog_chunks(changelog, str(tmp_path / "staging"), n_chunks=4)
    feed.mkdir()
    for c in chunks[:2]:
        shutil.copytree(c, feed / c.split("/")[-1])

    ing = StreamingIngest(
        spark,
        str(feed),
        str(tmp_path / "wh"),
        plan,
        str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
    )
    ing.run_available(timeout_sec=300)
    n_batches_1 = len(ing.batch_stats)
    assert n_batches_1 >= 2  # one micro-batch per chunk file
    mid_count = ing.read(TURNS).count()
    assert mid_count > 0

    # ---- phase 2: new binlog segments arrive; NEW ingest instance
    #      (process restart) resumes from checkpoint ---------------------
    for c in chunks[2:]:
        shutil.copytree(c, feed / c.split("/")[-1])
    ing2 = StreamingIngest(
        spark,
        str(feed),
        str(tmp_path / "wh"),
        plan,
        str(tmp_path / "ckpt"),
        n_buckets=8,
        max_files_per_trigger=1,
    )
    ing2.run_available(timeout_sec=300)
    # resumed: did NOT reprocess phase-1 batches
    assert all(s["batch_id"] >= n_batches_1 for s in ing2.batch_stats)

    got = ing2.read(TURNS)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0

    # ---- lineage covers every batch with per-partition offsets -------
    lin = ing2.lineage()
    assert [r["batch_id"] for r in lin] == list(range(len(lin)))
    assert all(r["partitions"] for r in lin)
    max_seen = max(
        p["max_offset"] for r in lin for p in r["partitions"].values()
    )
    assert max_seen == changelog.agg(F.max("offset")).collect()[0][0]
    changelog.unpersist()


def test_rerun_after_completion_is_noop(spark, tmp_path):
    plan = make_plan()
    changelog = transcript_changelog(spark, SF)
    write_changelog_chunks(changelog, str(tmp_path / "feed"), n_chunks=2)
    kw = dict(n_buckets=8)
    ing = StreamingIngest(
        spark, str(tmp_path / "feed"), str(tmp_path / "wh"), plan,
        str(tmp_path / "ckpt"), **kw
    )
    ing.run_available(timeout_sec=300)
    count1 = ing.read(TURNS).count()
    v1 = ing.applier.tables[TURNS].manifest()["version"]
    ing3 = StreamingIngest(
        spark, str(tmp_path / "feed"), str(tmp_path / "wh"), plan,
        str(tmp_path / "ckpt"), **kw
    )
    ing3.run_available(timeout_sec=300)
    assert ing3.batch_stats == []  # nothing new to process
    assert ing3.read(TURNS).count() == count1
    assert ing3.applier.tables[TURNS].manifest()["version"] == v1


def _evt_envelopes(spark, with_text: bool, with_tags: bool = False):
    """Schema-carrying envelopes over the events table: old schema
    {event_id, role} (even ids), new schema adds optional `text`
    (odd ids) — the evolution fixture pair shape
    (value_wo_array.avsc → value.avsc).  ``with_tags`` additionally
    adds an ARRAY field, so the drifted plan gains a whole child
    table (the value_wo_array.avsc → value.avsc table-set change)."""
    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.sources.changelog import (
        to_schema_carrying,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    parity = 1 if with_text else 0
    ev = ev.filter(F.col("event_id") % 2 == parity)
    fields = [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("role", T.StringType(), True),
    ]
    val = [F.col("event_id"), F.col("event_type").alias("role")]
    if with_text:
        fields.append(T.StructField("text", T.StringType(), True))
        val.append(F.col("props").alias("text"))
    if with_tags:
        fields.append(T.StructField("tags", T.ArrayType(T.LongType()), True))
        val.append(
            F.array(F.col("event_id"), F.col("event_id") + 1).alias("tags")
        )
    vschema = T.StructType(fields)
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
    return to_schema_carrying(typed, vschema), vschema


def _drift_cfg():
    from kafka_connect_jdbc_flatten_spark.config import FlattenConfig

    return FlattenConfig(
        topic="evt",
        pk_mode="flatten",
        pk_fields=("root.key",),
        rename_fields={"root.key": "event_id", "evt.event_id": "event_id_img"},
    )


def test_schema_drift_mid_stream_auto_evolves(spark, tmp_path):
    """Chunk 1 arrives with the old value schema, chunk 2 with an added
    optional field: the ingest must detect the change, recompile the
    plan, ALTER-ADD the column, and route it — old rows read as null
    (BufferedRecords.java:104-126, DbStructure.java:127-234)."""
    import os

    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.streaming.pipeline import (
        SchemaDriftIngest,
    )

    old_env, _ = _evt_envelopes(spark, with_text=False)
    new_env, _ = _evt_envelopes(spark, with_text=True)
    feed = tmp_path / "feed"
    feed.mkdir()
    old_env.coalesce(1).write.parquet(str(feed / "chunk-00001"))
    new_env.coalesce(1).write.parquet(str(feed / "chunk-00002"))

    ing = SchemaDriftIngest(
        spark,
        str(feed),
        str(tmp_path / "wh"),
        _drift_cfg(),
        T.LongType(),
        str(tmp_path / "ckpt"),
        value_record_name="Evt",
        key_record_name="EvtKey",
        n_buckets=4,
        max_files_per_trigger=1,
    )
    ing.run_available(timeout_sec=300)
    # the evolution was detected and logged
    assert any(e["added"] == ["text"] for e in ing.evolutions), ing.evolutions
    out = ing.read("evt_evt")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert out.count() == ev.count()
    # old-schema rows read as null, new-schema rows carry the value
    assert out.filter((F.col("event_id") % 2 == 0) & F.col("text").isNotNull()).count() == 0
    assert out.filter((F.col("event_id") % 2 == 1) & F.col("text").isNull()).count() == 0
    # checkpoint resume with a THIRD schema chunk (another new field)
    ev3 = spark.read.parquet(f"{SF}/events.parquet").limit(0)
    # re-running with nothing new is a no-op
    ing2 = SchemaDriftIngest(
        spark, str(feed), str(tmp_path / "wh"), _drift_cfg(), T.LongType(),
        str(tmp_path / "ckpt"), value_record_name="Evt",
        key_record_name="EvtKey", n_buckets=4,
    )
    ing2.run_available(timeout_sec=300)
    assert ing2.batch_stats == []


def test_schema_drift_both_schemas_in_one_microbatch(spark, tmp_path):
    """Both schema generations inside ONE micro-batch: per-schema
    groups apply in binlog order with per-group exactly-once ids."""
    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.streaming.pipeline import (
        SchemaDriftIngest,
    )

    old_env, _ = _evt_envelopes(spark, with_text=False)
    new_env, _ = _evt_envelopes(spark, with_text=True)
    feed = tmp_path / "feed"
    feed.mkdir()
    old_env.unionByName(new_env).coalesce(1).write.parquet(
        str(feed / "chunk-00001")
    )
    ing = SchemaDriftIngest(
        spark, str(feed), str(tmp_path / "wh"), _drift_cfg(), T.LongType(),
        str(tmp_path / "ckpt"), value_record_name="Evt",
        key_record_name="EvtKey", n_buckets=4,
    )
    stats = ing.run_available(timeout_sec=300)
    assert stats and stats[0]["schemas"] == 2
    out = ing.read("evt_evt")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert out.count() == ev.count()
    assert out.filter((F.col("event_id") % 2 == 1) & F.col("text").isNull()).count() == 0


def test_drift_gc_preserves_other_schemas_child_tables(spark, tmp_path):
    """r2 advisory (high): warehouse GC live-set must span EVERY table
    on disk, not one applier's plan tables.  Old schema arrives first;
    the new schema adds an ARRAY → a brand-new child table whose
    segments land in the shared _commits/ dir.  With compact_every=1
    the OLD-schema applier's maintenance runs while the child table's
    segments are still pending — a plan-scoped live-set would GC them
    as orphans (permanent data loss / PATH_NOT_FOUND on read)."""
    import os

    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.streaming.pipeline import (
        SchemaDriftIngest,
    )

    old_env, _ = _evt_envelopes(spark, with_text=False)
    new_env, _ = _evt_envelopes(spark, with_text=True, with_tags=True)
    feed = tmp_path / "feed"
    feed.mkdir()
    old_env.coalesce(1).write.parquet(str(feed / "chunk-00001"))
    new_env.coalesce(1).write.parquet(str(feed / "chunk-00002"))

    ing = SchemaDriftIngest(
        spark, str(feed), str(tmp_path / "wh"), _drift_cfg(), T.LongType(),
        str(tmp_path / "ckpt"), value_record_name="Evt",
        key_record_name="EvtKey", n_buckets=4, max_files_per_trigger=1,
        compact_every=1,
    )
    ing.run_available(timeout_sec=300)
    child = [t for t in os.listdir(tmp_path / "wh") if t.endswith("_tags")]
    assert child, os.listdir(tmp_path / "wh")
    # every manifest-referenced file of the child table must still exist
    from kafka_connect_jdbc_flatten_spark.lake.table import LakeTable

    tbl = LakeTable(spark, str(tmp_path / "wh" / child[0]))
    m = tbl.manifest()
    referenced = [
        f for fl in m["files"].values() for f in fl
    ] + [f for s in m.get("segments", []) for fl in s["files"].values() for f in fl]
    missing = [f for f in referenced if not os.path.exists(f)]
    assert not missing, missing[:5]
    # and the data itself is intact: 2 tags per odd event
    n_new = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("event_id") % 2 == 1
    ).count()
    assert tbl.read().count() == 2 * n_new


def test_auto_evolve_disabled_raises_on_drift(spark, tmp_path):
    """auto.evolve=false: a mid-stream schema change that needs an
    ALTER must fail loudly instead of evolving
    (DbStructure.java:190-197)."""
    import dataclasses

    import pytest
    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.streaming.pipeline import (
        SchemaDriftIngest,
    )

    old_env, _ = _evt_envelopes(spark, with_text=False)
    new_env, _ = _evt_envelopes(spark, with_text=True)
    feed = tmp_path / "feed"
    feed.mkdir()
    old_env.coalesce(1).write.parquet(str(feed / "chunk-00001"))
    new_env.coalesce(1).write.parquet(str(feed / "chunk-00002"))

    cfg = dataclasses.replace(_drift_cfg(), auto_evolve=False)
    ing = SchemaDriftIngest(
        spark, str(feed), str(tmp_path / "wh"), cfg, T.LongType(),
        str(tmp_path / "ckpt"), value_record_name="Evt",
        key_record_name="EvtKey", n_buckets=4, max_files_per_trigger=1,
    )
    with pytest.raises(Exception, match="auto-evolution is disabled"):
        ing.run_available(timeout_sec=300)


def test_auto_create_disabled_raises_on_missing_table(spark, tmp_path):
    """auto.create=false: a plan whose target table does not exist must
    fail instead of creating it (DbStructure.java:105-110); with the
    table pre-created the same config applies cleanly."""
    import dataclasses

    import pytest

    from kafka_connect_jdbc_flatten_spark.operators.merge import CdcApplier
    from kafka_connect_jdbc_flatten_spark.plans import compile_flatten_plan
    from kafka_connect_jdbc_flatten_spark.sources.changelog import (
        TRANSCRIPT_KEY_SCHEMA,
        TRANSCRIPT_VALUE_SCHEMA,
        transcript_changelog,
        transcript_flatten_config,
    )

    cfg = dataclasses.replace(transcript_flatten_config(), auto_create=False)
    plan = compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA, TRANSCRIPT_VALUE_SCHEMA, cfg,
        value_record_name="Conversation", key_record_name="ConversationKey",
    )
    wh = str(tmp_path / "wh")
    with pytest.raises(ValueError, match="auto-creation is disabled"):
        CdcApplier(spark, wh, plan, n_buckets=4)
    # pre-create via a default-config applier, then auto_create=False works
    default_plan = compile_flatten_plan(
        TRANSCRIPT_KEY_SCHEMA, TRANSCRIPT_VALUE_SCHEMA,
        transcript_flatten_config(),
        value_record_name="Conversation", key_record_name="ConversationKey",
    )
    CdcApplier(spark, wh, default_plan, n_buckets=4)
    ap = CdcApplier(spark, wh, plan, n_buckets=4)
    ap.apply_batch(
        transcript_changelog(spark, "/root/testdata/sf0.001"), batch_id=0
    )
    assert ap.read("transcripts_conversation_turns").count() > 0


def test_tombstone_under_old_schema_wipes_newer_schema_child_table(
    spark, tmp_path
):
    """r02 stretch probe: a tombstone CARRIED with an older schema
    fingerprint must still wipe the key from tables only a LATER
    fingerprint's plan knows (the reference deletes from every table
    of the topic, JdbcDbWriter.java:130-198).  chunk1 inserts under
    the tags-bearing schema (parent + child table); chunk2 delivers
    tombstones serialized with the pre-tags schema."""
    import dataclasses
    import os

    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.streaming.pipeline import (
        SchemaDriftIngest,
    )

    new_env, _ = _evt_envelopes(spark, with_text=True, with_tags=True)
    _, old_schema = _evt_envelopes(spark, with_text=False)
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("event_id") % 2 == 1
    )
    big = 10**9
    tomb = ev.filter(F.col("event_id") % 3 == 0).select(
        F.lit("evt").alias("topic"),
        F.pmod("event_id", F.lit(2)).cast("int").alias("partition"),
        (F.col("event_id") + big).alias("offset"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit("CreateTime").alias("timestamp_type"),
        F.col("event_id").alias("key"),
        F.lit(None).cast("string").alias("value"),
        F.lit(old_schema.json()).alias("value_schema"),
        F.lit("d").alias("op"),
        (F.col("event_id") + big).cast("long").alias("seq"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    new_env.coalesce(1).write.parquet(str(feed / "chunk-00001"))
    tomb.coalesce(1).write.parquet(str(feed / "chunk-00002"))

    cfg = dataclasses.replace(_drift_cfg(), delete_enabled=True)
    ing = SchemaDriftIngest(
        spark, str(feed), str(tmp_path / "wh"), cfg, T.LongType(),
        str(tmp_path / "ckpt"), value_record_name="Evt",
        key_record_name="EvtKey", n_buckets=4, max_files_per_trigger=1,
    )
    ing.run_available(timeout_sec=300)
    child = [t for t in os.listdir(tmp_path / "wh") if t.endswith("_tags")]
    assert child, os.listdir(tmp_path / "wh")
    from kafka_connect_jdbc_flatten_spark.lake.table import LakeTable

    tags = LakeTable(spark, str(tmp_path / "wh" / child[0])).read()
    kept = ev.filter(F.col("event_id") % 3 != 0).count()
    gone = tags.filter(F.col("event_id") % 3 == 0).count()
    assert gone == 0, f"{gone} child rows survived an old-schema tombstone"
    assert tags.count() == 2 * kept
    # parent wiped too
    parent = ing.read("evt_evt")
    assert parent.filter(F.col("event_id") % 3 == 0).count() == 0


def test_drift_restart_gc_and_cross_fingerprint_tombstones(spark, tmp_path):
    """r3 stretch: kill SchemaDriftIngest between a fingerprint's first
    batch and its maintain(), resume from checkpoint in a FRESH process
    (empty applier dict), and let maintenance run while only the OLD
    fingerprint is resident — the GC live-set (discovered from disk,
    r3 fix) must protect the non-resident fingerprint's still-pending
    segment files.  Then tombstone keys whose tables span both
    fingerprints and verify the fan-out still wipes the newer
    fingerprint's child table after the restart."""
    import dataclasses
    import os

    from pyspark.sql import types as T

    from kafka_connect_jdbc_flatten_spark.lake.table import LakeTable
    from kafka_connect_jdbc_flatten_spark.sources.changelog import (
        to_schema_carrying,
    )
    from kafka_connect_jdbc_flatten_spark.streaming.pipeline import (
        SchemaDriftIngest,
    )

    old_env, old_schema = _evt_envelopes(spark, with_text=False)
    new_env, _ = _evt_envelopes(spark, with_text=True, with_tags=True)
    feed = tmp_path / "feed"
    feed.mkdir()
    old_env.coalesce(1).write.parquet(str(feed / "chunk-00001"))
    new_env.coalesce(1).write.parquet(str(feed / "chunk-00002"))

    cfg = dataclasses.replace(_drift_cfg(), delete_enabled=True)
    kw = dict(
        value_record_name="Evt", key_record_name="EvtKey", n_buckets=4,
        max_files_per_trigger=1,
    )
    # process 1: NO maintenance (killed before the new fingerprint's
    # first maintain) — the tags child table's segments stay pending
    # in the shared _commits/ dir
    ing1 = SchemaDriftIngest(
        spark, str(feed), str(tmp_path / "wh"), cfg, T.LongType(),
        str(tmp_path / "ckpt"), compact_every=None, **kw,
    )
    ing1.run_available(timeout_sec=300)
    child = [t for t in os.listdir(tmp_path / "wh") if t.endswith("_tags")]
    assert child, os.listdir(tmp_path / "wh")
    tags_tbl = LakeTable(spark, str(tmp_path / "wh" / child[0]))
    assert tags_tbl.manifest().get("segments"), "expected pending segments"

    # chunk 3: OLD-schema re-images of every even key (no deletes, so
    # the foreign fan-out does not compact the tags table first)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    big = 10**9
    upd = to_schema_carrying(
        ev.filter(F.col("event_id") % 2 == 0).select(
            F.lit("evt").alias("topic"),
            F.pmod("event_id", F.lit(2)).cast("int").alias("partition"),
            (F.col("event_id") + big // 2).alias("offset"),
            F.col("ts").cast("timestamp").alias("timestamp"),
            F.lit("CreateTime").alias("timestamp_type"),
            F.col("event_id").alias("key"),
            F.struct(
                F.col("event_id"), F.lit("upd").alias("role")
            ).alias("value"),
            F.lit("u").alias("op"),
            (F.col("event_id") + big // 2).cast("long").alias("seq"),
            F.col("ts").cast("timestamp").alias("ts"),
        ),
        old_schema,
    )
    upd.coalesce(1).write.parquet(str(feed / "chunk-00003"))
    # chunk 4: OLD-schema tombstones for every key % 3 == 0 (both
    # parities — odd keys' tables exist only under the NEW fingerprint)
    tomb = ev.filter(F.col("event_id") % 3 == 0).select(
        F.lit("evt").alias("topic"),
        F.pmod("event_id", F.lit(2)).cast("int").alias("partition"),
        (F.col("event_id") + big).alias("offset"),
        F.col("ts").cast("timestamp").alias("timestamp"),
        F.lit("CreateTime").alias("timestamp_type"),
        F.col("event_id").alias("key"),
        F.lit(None).cast("string").alias("value"),
        F.lit(old_schema.json()).alias("value_schema"),
        F.lit("d").alias("op"),
        (F.col("event_id") + big).cast("long").alias("seq"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    tomb.coalesce(1).write.parquet(str(feed / "chunk-00004"))

    # process 2: fresh instance (empty applier dict), same checkpoint,
    # maintenance EVERY batch — chunk 3's batch instantiates ONLY the
    # old fingerprint's applier, and its maintain() runs while the tags
    # segments are pending
    ing2 = SchemaDriftIngest(
        spark, str(feed), str(tmp_path / "wh"), cfg, T.LongType(),
        str(tmp_path / "ckpt"), compact_every=1, **kw,
    )
    ing2.run_available(timeout_sec=300)
    assert len(ing2.appliers) == 1, "only the old fingerprint was re-seen"

    # every manifest-referenced tags file survived the resident-set GC
    m = tags_tbl.manifest()
    referenced = [f for fl in m["files"].values() for f in fl] + [
        f for s in m.get("segments", []) for fl in s["files"].values() for f in fl
    ]
    missing = [f for f in referenced if not os.path.exists(f)]
    assert not missing, missing[:5]

    odds_kept = ev.filter(
        (F.col("event_id") % 2 == 1) & (F.col("event_id") % 3 != 0)
    ).count()
    evens_kept = ev.filter(
        (F.col("event_id") % 2 == 0) & (F.col("event_id") % 3 != 0)
    ).count()
    tags = tags_tbl.read()
    assert tags.filter(F.col("event_id") % 3 == 0).count() == 0
    assert tags.count() == 2 * odds_kept
    parent = ing2.read("evt_evt")
    assert parent.filter(F.col("event_id") % 3 == 0).count() == 0
    assert parent.count() == odds_kept + evens_kept
    # the post-restart re-image applied (whole-image LWW across restart)
    assert parent.filter(
        (F.col("event_id") % 2 == 0) & (F.col("role") != "upd")
    ).count() == 0


# ---------------------------------------------------------------- corpus
def _docs_chunk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streaming_corpus_dedup_quality_and_exactly_once(spark, tmp_path):
    """StreamingCorpusIngest: stateful fingerprint dedup across
    micro-batches AND across restart (checkpointed state), quality
    gate, exactly-once lake append via the batch ledger."""
    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        StreamingCorpusIngest,
    )

    feed = str(tmp_path / "feed")
    good = "the quick brown fox jumps over the lazy dog again and again today"
    # chunk 1: two distinct docs + an intra-chunk duplicate of doc 1
    _docs_chunk(
        spark,
        [(1, good), (2, good + " more words here"), (3, good)],
    ).coalesce(1).write.mode("append").parquet(feed)
    # chunk 2: a cross-chunk duplicate (normalized: case/whitespace
    # differences hash identically) + a low-quality doc + a new doc
    _docs_chunk(
        spark,
        [
            (4, "  " + good.upper() + "  "),
            (5, "!!! ??? ..."),
            (6, good + " and a genuinely new sentence appears"),
        ],
    ).coalesce(1).write.mode("append").parquet(feed)

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )

    ing = StreamingCorpusIngest(
        spark, feed, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
        schema=schema, min_quality=0.3, max_files_per_trigger=1, n_buckets=4,
    )
    stats = ing.run_available(timeout_sec=600)
    assert len(stats) >= 2  # maxFilesPerTrigger=1 → one batch per file
    out = {r.doc_id: r for r in ing.read().collect()}
    # distinct fingerprints: good, good+more, good+new — low-quality 5
    # gated out, duplicates 3 and 4 dropped by the stream state
    assert set(out) == {1, 2, 6}
    assert len({r.fp for r in out.values()}) == 3
    assert all(r.quality_score >= 0.3 for r in out.values())

    # ---- restart: same checkpoint; duplicates of PRE-restart docs and
    # a redelivered file must not reappear (state + ledger survive)
    _docs_chunk(
        spark,
        [(7, good), (8, "another brand new document with plenty of words")],
    ).coalesce(1).write.mode("append").parquet(feed)
    ing2 = StreamingCorpusIngest(
        spark, feed, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
        schema=schema, min_quality=0.3, max_files_per_trigger=1, n_buckets=4,
    )
    ing2.run_available(timeout_sec=600)
    out2 = {r.doc_id for r in ing2.read().collect()}
    assert out2 == {1, 2, 6, 8}  # 7 is a cross-RESTART duplicate of 1
    # exactly one row per fingerprint even after compaction
    ing2.table.compact()
    assert {r.doc_id for r in ing2.read().collect()} == out2


def test_streaming_corpus_watermarked_dedup(spark, tmp_path):
    """ts_col routes through dropDuplicatesWithinWatermark: duplicates
    inside the watermark window are dropped; the pipeline still
    appends exactly one row per surviving doc."""
    import datetime

    import pyspark.sql.types as T

    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        StreamingCorpusIngest,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [
            (1, "some sufficiently long and wordy document body", t0),
            (2, "some sufficiently long and wordy document body",
             t0 + datetime.timedelta(minutes=5)),
            (3, "a different long and wordy document body entirely",
             t0 + datetime.timedelta(minutes=6)),
        ],
        schema,
    ).coalesce(1).write.parquet(feed)
    ing = StreamingCorpusIngest(
        spark, feed, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
        schema=schema, ts_col="ts", watermark="1 hour", n_buckets=4,
    )
    ing.run_available(timeout_sec=600)
    got = sorted(r.doc_id for r in ing.read().collect())
    assert got == [1, 3]


def test_streaming_corpus_watermark_expires_dedup_state(spark, tmp_path):
    """State lifecycle (r4 verdict #8): with ts_col set, fingerprint
    state is BOUNDED by the watermark — an old fingerprint's entry is
    expired once the watermark passes it, so the same content
    re-arriving much later is re-admitted (the documented recall trade
    of windowed dedup), and the expiry is visible in the harvested
    stateOperators metrics (rows_removed > 0)."""
    import datetime

    import pyspark.sql.types as T

    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        StreamingCorpusIngest,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = tmp_path / "feed"
    feed.mkdir()
    body = "some sufficiently long and wordy document body"

    def mk(spark_, rows, sub):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(feed / sub)
        )

    args = dict(
        schema=schema, ts_col="ts", watermark="10 minutes", n_buckets=4
    )
    # batch 1: the fingerprint enters state
    mk(spark, [(1, body, t0)], "b1")
    ing = StreamingCorpusIngest(
        spark, str(feed), str(tmp_path / "wh"), str(tmp_path / "ckpt"), **args
    )
    ing.run_available(timeout_sec=600)
    # batch 2: an unrelated late doc advances the watermark far past
    # t0 + 10min — fp(body)'s state entry must be evicted
    mk(spark, [(2, "a different long and wordy document body entirely",
                t0 + datetime.timedelta(hours=2))], "b2")
    ing2 = StreamingCorpusIngest(
        spark, str(feed), str(tmp_path / "wh"), str(tmp_path / "ckpt"), **args
    )
    ing2.run_available(timeout_sec=600)
    removed = sum(s["rows_removed"] or 0 for s in ing2.state_stats)
    assert removed > 0, ing2.state_stats  # the watermark expired state
    # batch 3: the SAME content re-arrives beyond the window -> state
    # was dropped, so it is re-admitted (bounded-state semantics)
    mk(spark, [(3, body, t0 + datetime.timedelta(hours=2, minutes=1))], "b3")
    ing3 = StreamingCorpusIngest(
        spark, str(feed), str(tmp_path / "wh"), str(tmp_path / "ckpt"), **args
    )
    ing3.run_available(timeout_sec=600)
    got = sorted(r.doc_id for r in ing3.read().collect())
    assert got == [1, 2, 3]
    # metrics landed in lineage
    import glob

    assert glob.glob(str(tmp_path / "wh" / "_corpus_lineage" / "state-*.json"))


def test_streaming_corpus_salted_dedup(spark, tmp_path):
    """salt_buckets chains (fp, salt) → fp dedup: a duplicate-heavy
    feed (one hot document) still yields exactly one row per distinct
    fingerprint, across micro-batches and restart."""
    import pyspark.sql.types as T

    import pytest

    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        StreamingCorpusIngest,
    )

    feed = str(tmp_path / "feed")
    hot = "the same boilerplate page text scraped from everywhere daily"
    # batch 1: hot doc under many ids + one unique doc
    _docs_chunk(
        spark,
        [(i, hot) for i in range(1, 9)]
        + [(20, "a unique long and wordy document body number twenty")],
    ).coalesce(1).write.mode("append").parquet(feed)
    # batch 2: more hot copies + another unique doc
    _docs_chunk(
        spark,
        [(i, hot) for i in range(30, 36)]
        + [(40, "another unique long and wordy document body forty")],
    ).coalesce(1).write.mode("append").parquet(feed)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    ing = StreamingCorpusIngest(
        spark, feed, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
        schema=schema, salt_buckets=4, max_files_per_trigger=1, n_buckets=4,
    )
    ing.run_available(timeout_sec=600)
    rows = ing.read().collect()
    assert len(rows) == 3  # hot fp once + the two uniques
    assert len({r.fp for r in rows}) == 3
    assert sum(r.text == hot for r in rows) == 1

    # restart with a cross-restart duplicate of the hot doc: phase-1
    # AND phase-2 state both resume from the checkpoint
    _docs_chunk(
        spark,
        [(50, hot), (51, "yet another distinct wordy document body")],
    ).coalesce(1).write.mode("append").parquet(feed)
    ing2 = StreamingCorpusIngest(
        spark, feed, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
        schema=schema, salt_buckets=4, max_files_per_trigger=1, n_buckets=4,
    )
    ing2.run_available(timeout_sec=600)
    rows2 = ing2.read().collect()
    assert sorted(r.doc_id for r in rows2 if r.text != hot) == [20, 40, 51]
    assert sum(r.text == hot for r in rows2) == 1

    with pytest.raises(ValueError, match="salt_buckets"):
        StreamingCorpusIngest(
            spark, feed, str(tmp_path / "wh2"), str(tmp_path / "ckpt2"),
            schema=schema, ts_col="ts", salt_buckets=4,
        )


def test_streaming_corpus_rocksdb_state(spark, tmp_path):
    """The RocksDB state-store provider (the 100 TB unwindowed-dedup
    configuration) runs the same pipeline with identical results."""
    import pyspark.sql.types as T

    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        ROCKSDB_PROVIDER,
        StreamingCorpusIngest,
        use_rocksdb_state,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        use_rocksdb_state(spark)
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
        feed = str(tmp_path / "feed")
        _docs_chunk(
            spark,
            [(i, f"wordy document body number {i % 3}") for i in range(12)],
        ).coalesce(1).write.parquet(feed)
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("text", T.StringType(), True),
            ]
        )
        ing = StreamingCorpusIngest(
            spark, feed, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
            schema=schema, n_buckets=4,
        )
        ing.run_available(timeout_sec=600)
        rows = ing.read().collect()
        assert len(rows) == 3
        assert len({r.fp for r in rows}) == 3
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_streaming_corpus_dedup_plan_shape(spark, tmp_path):
    """Plan pins: salted config = exactly two stateful Deduplicate
    operators, (fp, _salt) then (fp); unsalted = one."""
    import pyspark.sql.types as T

    from kafka_connect_jdbc_flatten_spark.streaming.corpus import (
        StreamingCorpusIngest,
    )

    feed = str(tmp_path / "feed")
    _docs_chunk(spark, [(1, "a wordy doc")]).coalesce(1).write.parquet(feed)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    salted = StreamingCorpusIngest(
        spark, feed, str(tmp_path / "wh"), str(tmp_path / "ckpt"),
        schema=schema, salt_buckets=8, n_buckets=4,
    ).dedup_stream()
    plan = salted._jdf.queryExecution().analyzed().toString()
    assert plan.count("Deduplicate") == 2
    # top-down print: the final fp-only dedup sits ABOVE the
    # (fp, _salt) phase-1 dedup
    import re

    dedups = re.findall(r"Deduplicate \[[^\]]*\]", plan)
    assert "_salt" not in dedups[0] and "_salt" in dedups[1], dedups

    plain = StreamingCorpusIngest(
        spark, feed, str(tmp_path / "wh2"), str(tmp_path / "ckpt2"),
        schema=schema, n_buckets=4,
    ).dedup_stream()
    plan2 = plain._jdf.queryExecution().analyzed().toString()
    assert plan2.count("Deduplicate") == 1
