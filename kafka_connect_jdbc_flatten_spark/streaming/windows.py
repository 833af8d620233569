"""Watermarked event-time windowed aggregation over the change feed.

The reference has no windowed aggregation (SURVEY §2.4) — its only
late-data control is the poll-side safety delay
(``timestamp.delay.interval.ms``, ``TimestampIncrementingTableQuerier
.java:208-214``).  At 10^10-event scale an ingest pipeline needs
stream-side observability with the same late-data semantics, so this
module provides the canonical Spark form: ``withWatermark`` (events
later than the delay are dropped, exactly the reference's guarantee)
plus tumbling event-time windows, emitted append-mode once the
watermark passes the window end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def change_rate_windows(
    changelog: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-partition change-event rates in tumbling event-time windows.

    Output: (window_start, window_end, partition, n_events, n_deletes,
    max_seq) — the streaming analogue of the per-batch lineage records,
    but aligned to event time with late rows beyond ``watermark``
    dropped (the reference's timestamp.delay semantics).
    """
    return (
        changelog.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("partition"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("op") == "d", 1).otherwise(0)).alias("n_deletes"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "partition",
            "n_events",
            "n_deletes",
            "max_seq",
        )
    )
