"""Incremental CDC tail criteria — the reference's source-side offset
predicate re-expressed as a Catalyst filter.

``TimestampIncrementingCriteria`` builds
``WHERE ts < :end AND ((ts = :lastTs AND inc > :lastInc) OR ts > :lastTs)
ORDER BY ts, inc`` — a total order over updates so a restart never
re-emits or skips rows (``TimestampIncrementingCriteria.java:291-320``;
incrementing-only ``:322-329``, timestamp-only ``:331-339``).  The
late-arrival guard subtracts ``timestamp.delay.interval.ms`` from the
end bound (``TimestampIncrementingTableQuerier.java:208-214``).

In Spark the same predicate is a pushdown-able filter over ``(ts,
seq)``; in streaming mode the checkpointed offsets make it implicit —
this class exists for batch "poll" reads and for parity tests against
the DuckDB oracle.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class IncrementalCriteria:
    """Modes mirror ``JdbcSourceConnectorConfig.java:155-159``:
    ``bulk | incrementing | timestamp | timestamp+incrementing``."""

    ts_col: str | None = "ts"
    inc_col: str | None = "seq"

    def predicate(
        self,
        last_ts: datetime.datetime | None,
        last_inc: int | None,
        end_ts: datetime.datetime | None = None,
        delay_ms: int = 0,
    ) -> Column:
        ts, inc = self.ts_col, self.inc_col
        if ts and inc:
            # TimestampIncrementingCriteria.java:291-320
            c = (
                (F.col(ts) == F.lit(last_ts)) & (F.col(inc) > F.lit(last_inc))
            ) | (F.col(ts) > F.lit(last_ts))
        elif inc:
            # :322-329
            c = F.col(inc) > F.lit(last_inc)
        elif ts:
            # :331-339
            c = F.col(ts) > F.lit(last_ts)
        else:  # bulk
            return F.lit(True)
        if ts and end_ts is not None:
            end = end_ts - datetime.timedelta(milliseconds=delay_ms)
            c = c & (F.col(ts) < F.lit(end))
        return c

    def apply(self, df: DataFrame, last_ts=None, last_inc=None, end_ts=None, delay_ms=0) -> DataFrame:
        out = df.filter(self.predicate(last_ts, last_inc, end_ts, delay_ms))
        order = [c for c in (self.ts_col, self.inc_col) if c]
        return out.orderBy(*order) if order else out

    def sql_where(self, last_ts=None, last_inc=None, end_ts=None, delay_ms=0) -> str:
        """The equivalent ANSI-SQL WHERE clause (for the DuckDB oracle)."""
        ts, inc = self.ts_col, self.inc_col
        parts = []
        if ts and inc:
            parts.append(
                f"(({ts} = TIMESTAMP '{last_ts}' AND {inc} > {last_inc}) "
                f"OR {ts} > TIMESTAMP '{last_ts}')"
            )
        elif inc:
            parts.append(f"{inc} > {last_inc}")
        elif ts:
            parts.append(f"{ts} > TIMESTAMP '{last_ts}'")
        else:
            parts.append("TRUE")
        if ts and end_ts is not None:
            end = end_ts - datetime.timedelta(milliseconds=delay_ms)
            parts.append(f"{ts} < TIMESTAMP '{end}'")
        return " AND ".join(parts)
