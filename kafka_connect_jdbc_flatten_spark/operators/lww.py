"""Last-writer-wins reduction per key.

Replaces the reference's order-preserving flush machinery — the sink
flushes its buffer whenever an upsert sees the same key twice or a
tombstone follows a non-delete (``BufferedRecords.java:82-210``) so
that JDBC statement order preserves per-key op order.  Under MERGE
semantics we instead reduce each micro-batch to the newest image per
key *before* a single MERGE: strictly fewer writes, no ordering
hazard, and idempotent on re-delivery (at-least-once ⇒ exactly-once).

Order is the binlog total order ``(ts, seq)`` — the same total order
the source enforces with ``ORDER BY ts, inc``
(``TimestampIncrementingCriteria.java:315-319``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_reduce(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str] = ("ts", "seq"),
) -> DataFrame:
    """Keep only the last change per key within a batch.

    Implemented as a window ``row_number`` (one shuffle on ``keys`` —
    the same shuffle the subsequent merge join needs, so AQE reuses
    the exchange).  Skewed hot keys are handled upstream by salting
    (``operators.skew``) or AQE skew-join.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lww_reduce_agg(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str] = ("ts", "seq"),
) -> DataFrame:
    """Alternative LWW via ``max_by`` on a packed struct.

    Partial (map-side) aggregation applies, so for high-cardinality
    keys with few duplicates this beats the window form at scale —
    the combiner collapses duplicates before the shuffle.
    """
    others = [c for c in df.columns if c not in keys]
    # order cols under reserved aliases so a column that is both an
    # order col and a payload col doesn't make getField ambiguous
    packed = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
        *[F.col(c) for c in others],
    )
    agg = df.groupBy(*keys).agg(F.max(packed).alias("__w"))
    return agg.select(*keys, *[F.col(f"__w.{c}").alias(c) for c in others])


def lww_reduce_broadcast(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str] = ("ts", "seq"),
) -> DataFrame:
    """LWW without shuffling the payload: aggregate ONLY
    ``(keys, max(order_cols))`` (map-side combined — bytes shuffled are
    keys + order tuple, never the row body), broadcast the winner set,
    and keep matching rows with a broadcast-hash LEFT SEMI join.

    This is the scale form for wide rows (CDC envelopes carrying
    before/after images): the window form shuffles every byte of every
    duplicate; the max_by form still moves one full row per key per
    map task; this form moves none — the big side stays a narrow scan.
    Requires (a) the order tuple to be unique per key (binlog ``seq``
    is), else ties all survive, and (b) a winner set that fits in a
    broadcast (distinct keys per micro-batch — bounded by trigger
    size; ~50 MB per 10⁶ keys).
    """
    packed = F.struct(
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)]
    )
    winners = (
        df.groupBy(*keys)
        .agg(F.max(packed).alias("__w"))
        .select(
            *keys,
            *[F.col(f"__w.__o{i}").alias(c) for i, c in enumerate(order_cols)],
        )
    )
    return df.join(F.broadcast(winners), on=[*keys, *order_cols], how="left_semi")
