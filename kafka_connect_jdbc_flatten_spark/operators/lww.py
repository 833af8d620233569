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
    Requires a winner set that fits in a broadcast (distinct keys per
    micro-batch — bounded by trigger size; ~50 MB per 10⁶ keys); use
    ``lww_reduce_auto`` when key cardinality is unbounded.

    Exact redelivered duplicates (at-least-once / overlapping binlog
    segments — the case ``streaming.stateful`` documents) tie on
    ``(keys, order_cols)`` and BOTH pass the semi join, so ties are
    collapsed to one row afterwards, matching the window form.
    """
    out = _broadcast_semi(df, list(keys), list(order_cols))
    # collapse (key, order) ties — identical redelivered records — to a
    # single image; the dedup shuffle only carries winner rows (≤1 per
    # key + redelivered twins), not the whole batch
    return out.dropDuplicates([*keys, *order_cols])


def _broadcast_semi(
    df: DataFrame, keys: list[str], order_cols: list[str]
) -> DataFrame:
    """Winner agg on (keys, order) only + broadcast LEFT SEMI probe —
    ties at the winning tuple are NOT collapsed here."""
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


def lww_reduce_auto(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str] = ("ts", "seq"),
    max_broadcast_keys: int = 8_000_000,
    n_rows: int | None = None,
) -> tuple[DataFrame, int]:
    """Cardinality-guarded LWW: broadcast-winner form while the winner
    set provably fits a broadcast, ``max_by`` aggregate form beyond it.

    The first-level guard is the batch ROW count — a strict upper
    bound on distinct keys.  Callers that already know the batch size
    (the streaming ingest computes per-partition lineage counts
    anyway) pass it as ``n_rows`` and the guard costs NOTHING;
    otherwise one narrow count scan runs.  A CDC feed typically
    carries MANY events per key (turn appends to one conversation),
    so when the row count alone exceeds the cap a second-level
    ``approx_count_distinct`` probe — one column-pruned scan of the
    key columns — checks the real key cardinality before giving up
    on the broadcast form; only a batch whose (HLL-estimated, safety
    -margined) key count genuinely exceeds the cap pays the aggregate
    path's wide shuffle.  At ~50 MB per 10⁶ keys the 8 M default caps
    the winner broadcast at ~400 MB — comfortable for a CDC driver
    while still routing an unbounded high-cardinality backfill to the
    aggregate path instead of OOMing.

    (key, order) ties — redelivered identical records — are detected
    from the CACHED reduced set (a narrow aggregate over cached rows)
    and only tie keys pay a dedup shuffle; the wide winner bodies are
    never re-shuffled wholesale.

    Returns ``(reduced_df, n_rows)`` — ``reduced_df`` is persisted and
    already materialized; the caller unpersists it when done.
    """
    if n_rows is None:
        n_rows = df.count()
    if n_rows > max_broadcast_keys:
        key_col = (
            F.col(keys[0]) if len(keys) == 1 else F.struct(*[F.col(k) for k in keys])
        )
        n_keys = df.agg(
            F.approx_count_distinct(key_col, 0.02).alias("c")
        ).collect()[0][0]
        if n_keys * 1.1 > max_broadcast_keys:  # 1.1 = HLL rsd margin
            out = lww_reduce_agg(df, list(keys), list(order_cols)).persist()
            out.count()
            return out, n_rows

    semi = _broadcast_semi(df, list(keys), list(order_cols)).persist()
    tie_keys = (
        semi.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select(*keys)
        .persist()
    )
    n_ties = tie_keys.count()  # materializes semi; agg runs on the cache
    if n_ties == 0:
        out = semi
    else:
        clean = semi.join(F.broadcast(tie_keys), on=list(keys), how="left_anti")
        deduped = semi.join(
            F.broadcast(tie_keys), on=list(keys), how="left_semi"
        ).dropDuplicates([*keys, *order_cols])
        out = clean.unionByName(deduped).persist()
        out.count()
        semi.unpersist()
    tie_keys.unpersist()
    return out, n_rows
