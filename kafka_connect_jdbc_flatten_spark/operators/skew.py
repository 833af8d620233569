"""Skew handling: salted two-phase reduction for hot keys.

The reference never sees skew (a hot key is just a hot JDBC statement
batch, ``BufferedRecords.java:206-208``); on Spark a hot ``conv_id``
concentrates an entire window/merge partition on one task.  Per the
north rule, hot keys are salted before the merge shuffle and coalesced
on apply:

* phase 1 — append ``salt = pmod(hash(order_cols), n_salts)`` and
  reduce per ``(key, salt)``: the hot key's rows spread over
  ``n_salts`` tasks, each emitting ONE survivor;
* phase 2 — reduce the ≤ ``n_salts`` survivors per key (tiny).

Equivalent to an AQE skew-split but deterministic and available to
any keyed reduction, not just joins.  ``spark.sql.adaptive.enabled``
remains the backstop for the merge join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lww import lww_reduce_agg


def salted_lww_reduce(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str] = ("ts", "seq"),
    n_salts: int = 16,
) -> DataFrame:
    """Last-writer-wins per key, skew-safe.

    Result is identical to ``lww_reduce(df, keys, order_cols)`` —
    max of maxes == global max under the total order — but the first
    shuffle key has ``n_salts``× the cardinality, so a 10⁸-row hot
    conv_id becomes ``n_salts`` partial reductions instead of one
    straggler task.  Uses the ``max_by`` aggregation form so map-side
    combine already collapses duplicates before either shuffle.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    salted = df.withColumn("__salt", salt.cast("int"))
    phase1 = lww_reduce_agg(salted, [*keys, "__salt"], list(order_cols))
    return lww_reduce_agg(phase1.drop("__salt"), list(keys), list(order_cols))
