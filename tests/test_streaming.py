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
