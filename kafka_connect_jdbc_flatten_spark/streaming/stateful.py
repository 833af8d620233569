"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's only cross-batch state is the per-table resumable
offset map (``TimestampIncrementingOffset.java:54-84``); Structured
Streaming's checkpoint subsumes it.  What checkpoints do NOT give you
is semantic dedup when the upstream redelivers or overlaps binlog
segments (e.g. a producer retry writes seq ranges twice into the
topic).  ``dedup_by_position`` closes that hole: per record key it
remembers the highest binlog position applied and drops anything at or
below it — state lives in the state store, scales with distinct keys,
and survives restarts via the checkpoint.

Arrow-batched (``applyInPandasWithState``): the per-group function
sees pandas DataFrames, never Python rows.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("max_seq", T.LongType(), True)])


def dedup_by_position(
    stream: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    output_schema: T.StructType | None = None,
) -> DataFrame:
    """Streaming cross-batch dedup: keep only rows whose ``seq_col``
    exceeds the highest value ever seen for the key; monotone state.

    Within one micro-batch the group's rows are filtered against the
    running maximum in seq order, so intra-batch duplicates drop too.
    Exactly-once effect: replays/overlaps of any binlog prefix are
    no-ops downstream (complements the sink's batch-id dedup, which
    only guards whole-micro-batch redelivery).
    """
    import pandas as pd

    out_schema = output_schema or stream.schema

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (max_seq,) = state.get if state.exists else (None,)
        if max_seq is None:
            max_seq = -(1 << 62)
        for pdf in pdfs:
            pdf = pdf.sort_values(seq_col, kind="stable")
            keep = pdf[pdf[seq_col] > max_seq].drop_duplicates(
                subset=[seq_col], keep="first"
            )
            if len(keep):
                max_seq = int(keep[seq_col].max())
                yield keep
        state.update((max_seq,))

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
