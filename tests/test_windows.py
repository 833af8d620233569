"""Watermarked windowed aggregation + similarity LSH near-dup tests."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_jdbc_flatten_spark.streaming.windows import (
    change_rate_windows,
)

SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def t(minute):
    return datetime.datetime(2024, 1, 1, 10, minute)


def test_windowed_rates_with_watermark(spark, tmp_path):
    feed = str(tmp_path / "feed")
    # chunk 1: window [10:00, 10:10) on partitions 0/1
    spark.createDataFrame(
        [(0, "c", 1, t(1)), (0, "u", 2, t(5)), (1, "d", 3, t(9))], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(feed + "/c1")
    # chunk 2: events one hour later — watermark passes the first window
    spark.createDataFrame(
        [(0, "u", 4, datetime.datetime(2024, 1, 1, 11, 5))], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(feed + "/c2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(feed)
    )
    out = change_rate_windows(stream, window="10 minutes", watermark="10 minutes")
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.exception() is not None:
        raise q.exception()
    got = {
        (r.window_start.minute, r.partition): (r.n_events, r.n_deletes, r.max_seq)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # the closed 10:00 window emitted for both partitions; the 11:05
    # window is still open (watermark hasn't passed its end)
    assert got == {(0, 0): (2, 0, 2), (0, 1): (1, 1, 3)}


def test_embedding_neardup_lsh_recall(spark):
    from kafka_connect_jdbc_flatten_spark.functions.similarity import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # sf0.001 embeddings are near-orthogonal randoms (max cos ≈ 0.5),
    # so test at τ=0.45 with a low-threshold parameterization
    # (expected SRP recall 1-(1-p⁴)⁸ ≈ 0.79 at τ=0.45, higher above)
    threshold = 0.45
    exact = {
        (r.id1, r.id2) for r in embedding_neardup_pairs(emb, threshold).collect()
    }
    approx = {
        (r.id1, r.id2)
        for r in embedding_neardup_pairs_lsh(
            emb, threshold, dim=64, n_planes=4, n_tables=8
        ).collect()
    }
    assert approx <= exact  # exact verify ⇒ precision 1
    assert exact, "fixture should contain pairs at this threshold"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, (recall, len(exact))
