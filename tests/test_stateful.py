"""applyInPandasWithState cross-batch dedup tests."""

import datetime
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.streaming.stateful import (
    dedup_by_position,
)

TS = datetime.datetime(2024, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def write_chunk(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)


def run_stream(spark, feed_dir, ckpt, sink):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(feed_dir)
    )
    out = dedup_by_position(stream, ["conv_id"], "seq")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
    if q.exception() is not None:
        raise q.exception()
    return spark.read.parquet(sink)


def test_cross_batch_dedup_drops_replayed_positions(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    # chunk 1: c1 seq 1,2 (2 twice: intra-batch dup), c2 seq 1
    write_chunk(
        spark,
        str(feed / "chunk-1"),
        [("c1", 1, "a"), ("c1", 2, "b"), ("c1", 2, "b-dup"), ("c2", 1, "x")],
    )
    # chunk 2: REPLAYED c1 seq 1-2 (producer retry) + new c1 seq 3, c2 seq 2
    write_chunk(
        spark,
        str(feed / "chunk-2"),
        [("c1", 1, "a-replay"), ("c1", 2, "b-replay"), ("c1", 3, "c"), ("c2", 2, "y")],
    )
    got = run_stream(spark, str(feed), str(tmp_path / "ckpt"), str(tmp_path / "out"))
    rows = {(r.conv_id, r.seq): r.text for r in got.collect()}
    assert rows == {
        ("c1", 1): "a",
        ("c1", 2): "b",
        ("c1", 3): "c",
        ("c2", 1): "x",
        ("c2", 2): "y",
    }


def test_state_survives_restart(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    write_chunk(spark, str(feed / "chunk-1"), [("c1", 5, "v5")])
    got1 = run_stream(spark, str(feed), str(tmp_path / "ckpt"), str(tmp_path / "out"))
    assert got1.count() == 1
    # new query instance, same checkpoint + sink: old positions dropped
    write_chunk(
        spark, str(feed / "chunk-2"), [("c1", 5, "v5-replay"), ("c1", 6, "v6")]
    )
    got2 = run_stream(spark, str(feed), str(tmp_path / "ckpt"), str(tmp_path / "out"))
    rows = {(r.conv_id, r.seq): r.text for r in got2.collect()}
    assert rows == {("c1", 5): "v5", ("c1", 6): "v6"}
