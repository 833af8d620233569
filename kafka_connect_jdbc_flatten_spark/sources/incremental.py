"""Incremental CDC tail criteria — the reference's source-side offset
predicate re-expressed as a Catalyst filter.

``TimestampIncrementingCriteria`` builds
``WHERE ts < :end AND ((ts = :lastTs AND inc > :lastInc) OR ts > :lastTs)
ORDER BY ts, inc`` — a total order over updates so a restart never
re-emits or skips rows (``TimestampIncrementingCriteria.java:291-320``;
incrementing-only ``:322-329``, timestamp-only ``:331-339``).  The
late-arrival guard subtracts ``timestamp.delay.interval.ms`` from the
end bound (``TimestampIncrementingTableQuerier.java:208-214``).

``ts_col`` accepts a LIST of timestamp columns: every occurrence of
``ts`` in the predicate/order becomes ``COALESCE(ts1, ts2, …)`` —
the reference's multi-column mode (``coalesceTimestampColumns``,
``TimestampIncrementingCriteria.java:283-293``; the offset extractor
takes the first non-null column in configured order, ``:218-226``).
The common real-world shape is a nullable ``updated_at`` beside a
non-null ``created_at``.

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
    ``bulk | incrementing | timestamp | timestamp+incrementing``.
    ``ts_col`` may be one column name or a sequence of them
    (COALESCE semantics, first non-null wins)."""

    ts_col: str | tuple[str, ...] | list[str] | None = "ts"
    inc_col: str | None = "seq"

    @property
    def ts_cols(self) -> tuple[str, ...]:
        """The timestamp column list (empty tuple in ts-less modes)."""
        if self.ts_col is None:
            return ()
        if isinstance(self.ts_col, str):
            return (self.ts_col,)
        return tuple(self.ts_col)

    def ts_expr(self) -> Column:
        """The effective timestamp: the column itself, or
        ``COALESCE(ts1, ts2, …)`` in multi-column mode
        (``coalesceTimestampColumns``)."""
        cols = self.ts_cols
        if not cols:
            raise ValueError("no timestamp columns configured")
        if len(cols) == 1:
            return F.col(cols[0])
        return F.coalesce(*[F.col(c) for c in cols])

    def _ts_sql(self) -> str:
        cols = self.ts_cols
        if len(cols) == 1:
            return cols[0]
        return f"COALESCE({', '.join(cols)})"

    def predicate(
        self,
        last_ts: datetime.datetime | None,
        last_inc: int | None,
        end_ts: datetime.datetime | None = None,
        delay_ms: int = 0,
    ) -> Column:
        ts, inc = bool(self.ts_cols), self.inc_col
        if ts and inc:
            # TimestampIncrementingCriteria.java:291-320
            t = self.ts_expr()
            c = (
                (t == F.lit(last_ts)) & (F.col(inc) > F.lit(last_inc))
            ) | (t > F.lit(last_ts))
        elif inc:
            # :322-329
            c = F.col(inc) > F.lit(last_inc)
        elif ts:
            # :331-339
            c = self.ts_expr() > F.lit(last_ts)
        else:  # bulk
            return F.lit(True)
        if ts and end_ts is not None:
            end = end_ts - datetime.timedelta(milliseconds=delay_ms)
            c = c & (self.ts_expr() < F.lit(end))
        return c

    def order_exprs(self) -> list[Column]:
        """ORDER BY columns of the total order (COALESCE-ed ts first,
        then the incrementing column)."""
        out = []
        if self.ts_cols:
            out.append(self.ts_expr())
        if self.inc_col:
            out.append(F.col(self.inc_col))
        return out

    def apply(self, df: DataFrame, last_ts=None, last_inc=None, end_ts=None, delay_ms=0) -> DataFrame:
        out = df.filter(self.predicate(last_ts, last_inc, end_ts, delay_ms))
        order = self.order_exprs()
        return out.orderBy(*order) if order else out

    def sql_where(self, last_ts=None, last_inc=None, end_ts=None, delay_ms=0) -> str:
        """The equivalent ANSI-SQL WHERE clause (for the DuckDB oracle)."""
        ts, inc = (self._ts_sql() if self.ts_cols else None), self.inc_col
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
