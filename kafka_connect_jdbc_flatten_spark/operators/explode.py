"""Flatten executor — TableSpec → DataFrame pipeline.

Executes the compiled plan from ``plans.flatten_plan`` as a chain of
``getField`` projections and ``explode_outer`` generators — the
Spark-native replacement for the reference's per-record closure chains
(``FlattenTransformation.java:372-382, 426-641``).  Everything stays
inside whole-stage codegen: no Python runs per row.

Input contract: a changelog DataFrame with columns

    topic STRING, partition INT, offset LONG,
    timestamp TIMESTAMP, timestamp_type STRING,   -- Kafka coordinates
    key <primitive|struct>,                        -- record key
    value STRUCT                                   -- nested record value

(extra columns are carried through untouched if listed in
``carry_cols`` — used for op/seq CDC metadata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.flatten_plan import ARRAY, MAP, STRUCT, FlattenPlan, TableSpec

COORD_COLS = ("topic", "partition", "offset", "timestamp", "timestamp_type")


def flatten_table(
    df: DataFrame,
    spec: TableSpec,
    value_col: str = "value",
    key_col: str = "key",
    carry_cols: tuple[str, ...] = (),
    drop_null_items: bool = True,
) -> DataFrame:
    """Produce the flat DataFrame for one target table.

    Navigation mirrors ``getMainContainerFunction``
    (``FlattenTransformation.java:372-382``): struct → field access,
    array → ``explode_outer``, map → ``explode_outer`` of entries with
    the key captured for ``<path>_key`` columns
    (``FlattenTransformation.java:449-472``).

    ``drop_null_items`` drops rows whose exploded item is null — the
    reference emits no child record for a null/empty array or map
    (its flatMap over items yields nothing,
    ``FlattenTransformation.java:449-456``); ``explode_outer`` instead
    emits one null row, which we filter.  We still use the *outer*
    explode so sibling generators don't suppress each other's parents.
    """
    cur: Column = F.col(value_col)
    out = df
    # per-chain-index captured expressions
    map_key_cols: dict[int, Column] = {}
    chain_exprs: dict[int, Column] = {}
    null_guards: list[Column] = []

    gen = 0
    chain_exprs[0] = cur
    for i, cont in enumerate(spec.chain):
        if i == 0:
            # root struct container == the value itself
            continue
        src = cur if cont.is_element else cur.getField(cont.name)
        if cont.kind == STRUCT:
            cur = src
        elif cont.kind == ARRAY:
            alias = f"__x{gen}"
            gen += 1
            out = out.select("*", F.explode_outer(src).alias(alias))
            cur = F.col(alias)
            null_guards.append(cur.isNotNull())
        elif cont.kind == MAP:
            kalias, valias = f"__k{gen}", f"__v{gen}"
            gen += 1
            out = out.select("*", F.explode_outer(src).alias(kalias, valias))
            map_key_cols[i] = F.col(kalias)
            cur = F.col(valias)
            null_guards.append(F.col(kalias).isNotNull())
        chain_exprs[i] = cur

    if drop_null_items and null_guards:
        guard = null_guards[0]
        for g in null_guards[1:]:
            guard = guard & g
        out = out.filter(guard)

    select: list[Column] = []
    for c in spec.columns:
        kind = c.source[0]
        if kind == "key":
            fname = c.source[1]
            expr = F.col(key_col) if fname is None else F.col(key_col).getField(fname)
        elif kind == "leaf":
            expr = cur
            for step in c.source[1]:
                expr = expr.getField(step)
        elif kind == "map_key":
            expr = map_key_cols[c.source[1]]
        elif kind == "chain_field":
            idx, fname = c.source[1], c.source[2]
            expr = chain_exprs[idx].getField(fname)
        elif kind == "coord":
            expr = F.col(COORD_COLS[c.source[1]])
        else:  # pragma: no cover
            raise ValueError(f"unknown column source {c.source}")
        select.append(expr.cast(c.dtype).alias(c.out_name))
    for cc in carry_cols:
        select.append(F.col(cc))
    return out.select(*select)


def has_rows_expr(spec: TableSpec, value_col: str = "value") -> Column:
    """Boolean column: does ``flatten_table`` yield ≥1 row for this
    envelope's value?

    Mirrors the chain navigation and null-item guards above as a pure
    expression (JVM-side ``exists`` higher-order functions, no explode,
    no shuffle): an ARRAY contributes rows iff it has a non-null element
    whose residual chain does; a MAP iff it has any entry whose VALUE's
    residual chain does (``explode_outer`` guards only the never-null
    entry key, so a null map value with no deeper generator still
    yields a row); a null/absent container contributes nothing.

    Used by the CDC apply to derive the shrunk-to-empty scope set —
    whole-image replacement must still delete the child rows of an
    array that shrank to empty/null (``BufferedRecords.java:264-270``)
    even though the new image flattens to ZERO child rows — without
    writing a scope-marker row per envelope through the sink (r3
    review: the markers cost ~1.2 s/batch on the sf0.1 replay)."""

    def rest(cur: Column, idx: int) -> Column:
        if idx >= len(spec.chain):
            return F.lit(True)
        cont = spec.chain[idx]
        src = cur if cont.is_element else cur.getField(cont.name)
        if cont.kind == STRUCT:
            return rest(src, idx + 1)
        if cont.kind == ARRAY:
            return F.coalesce(
                F.exists(src, lambda x: x.isNotNull() & rest(x, idx + 1)),
                F.lit(False),
            )
        return F.coalesce(
            F.exists(F.map_values(src), lambda v: rest(v, idx + 1)),
            F.lit(False),
        )

    return rest(F.col(value_col), 1)


def flatten_records(
    df: DataFrame,
    plan: FlattenPlan,
    value_col: str = "value",
    key_col: str = "key",
    carry_cols: tuple[str, ...] = (),
    drop_null_items: bool = True,
) -> dict[str, DataFrame]:
    """Flatten a changelog micro-batch into {table_name: flat DataFrame}.

    One declarative pipeline per target table — the reference routes
    row-at-a-time into per-table buffers (``JdbcDbWriter.java:62-124``);
    we instead emit N independent column pipelines over the same scan
    (Spark reuses the shuffle-free scan; each table's MERGE is an
    independent job that can run concurrently).
    """
    return {
        spec.table_name: flatten_table(
            df, spec, value_col, key_col, carry_cols, drop_null_items
        )
        for spec in plan.tables
    }
