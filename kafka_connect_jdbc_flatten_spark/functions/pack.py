"""Sequence packing: map documents to fixed-size training windows.

Pretraining consumes fixed-length token windows, not documents: docs
are concatenated (in a deterministic order) and the stream is chunked
every ``max_tokens``.  The operator emits the *packing manifest* —
for each document, which window(s) of which shard its tokens land in
— which is exactly what a downstream tokenizer/loader needs to build
batches without re-scanning the corpus.

Scale design:

* **Shard-parallel.**  A single global concatenation order would
  serialize the cumsum; instead docs are hash-bucketed into
  ``n_shards`` independent streams (salted md5 — deterministic and
  partitioning-invariant, same property as ``sample.py``), and each
  shard packs independently.  At 100 TB pick n_shards ≈ cluster
  parallelism; the window function then runs per shard key, a
  bounded sort per partition, no global shuffle barrier beyond the
  one hash exchange.
* **Pure window arithmetic** — running token offset via
  ``sum() over (partition by shard order by id rows unbounded
  preceding → 1 preceding)``; window indices are integer division on
  the offsets.  No state, no UDF; reproduced bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sample import sample_bucket, sample_bucket_sql
from .text import token_count_ws, token_count_ws_sql


def pack_manifest(
    df: DataFrame,
    id_col: str,
    max_tokens: int,
    n_shards: int = 8,
    tokens: Column | None = None,
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Packing manifest: ``(doc_id, shard, n_tokens, offset,
    first_window, last_window)``.

    ``offset`` = token position where the doc starts inside its
    shard's concatenated stream; a doc occupies windows
    ``floor(offset / max_tokens) .. floor((offset + n_tokens - 1) /
    max_tokens)`` (straddling allowed — concat-then-chunk packing).
    Zero-token docs are dropped (they occupy no window).
    """
    toks = tokens if tokens is not None else token_count_ws(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        (sample_bucket(id_col, salt) % n_shards).alias("shard"),
        toks.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("offset")
    return base.select("doc_id", "shard", "n_tokens", off).select(
        "doc_id",
        "shard",
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / max_tokens).alias("first_window"),
        F.floor((F.col("offset") + F.col("n_tokens") - 1) / max_tokens).alias(
            "last_window"
        ),
    )


def pack_manifest_sql(
    table: str,
    id_col: str,
    max_tokens: int,
    n_shards: int = 8,
    tokens_expr: str | None = None,
    text_col: str = "text",
    salt: str = "pack",
) -> str:
    toks = tokens_expr if tokens_expr is not None else token_count_ws_sql(text_col)
    bucket = sample_bucket_sql(id_col, salt)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, ({bucket} % {n_shards}) AS shard,
         CAST({toks} AS BIGINT) AS n_tokens
  FROM {table}
  WHERE {toks} > 0
),
offs AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS "offset"
  FROM base
)
SELECT doc_id, shard, n_tokens, "offset",
       CAST(FLOOR("offset" / {max_tokens}) AS BIGINT) AS first_window,
       CAST(FLOOR(("offset" + n_tokens - 1) / {max_tokens}) AS BIGINT)
         AS last_window
FROM offs
"""
