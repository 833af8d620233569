"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

Standard pretraining hygiene (the GPT-3/PaLM-style n-gram overlap
check): any training doc containing an n-gram (n≈8-13; here
configurable, set semantics over normalized text — same shingling as
the dedup layer) that also appears in a benchmark document is
contaminated and must be dropped or audited before training.

Scale design (100 TB corpus, MB-scale benchmark):

* The benchmark side is TINY relative to the corpus — its distinct
  shingle-hash set (one 64-bit hash per distinct n-gram) is built
  with a map-side-combined distinct and **broadcast**; the corpus
  side is a scan-local explode joined broadcast-hash on the gram
  hash.  No corpus-wide shuffle of text or grams: the only exchange
  is the final per-doc hit-count aggregate, which moves one
  ``(doc_id, count)`` pair per contaminated doc per task.
* Gram comparison is on the md5-derived 60-bit hash
  (``_hash64_expr``), not the gram string — 8 bytes per probe key
  and identical in the DuckDB mirror, so the oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash64_expr, _hash64_sql, word_shingles, word_shingles_sql
from .util import spread

# broadcast the bench gram set only while it plausibly fits every
# executor (same guard class as MOR_BROADCAST_DELTA_BYTES /
# ARROW_ALLPAIRS_MATRIX_BYTES): an arbitrary user parquet passed as
# --bench is data-plane input, not config
BENCH_GRAM_BROADCAST_BYTES = 256 * 1024 * 1024
_BENCH_GRAM_EST_BYTES = 24  # 8-byte hash + hashed-relation row overhead


def contaminated_docs(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
    broadcast_cap_bytes: int = BENCH_GRAM_BROADCAST_BYTES,
) -> DataFrame:
    """``(doc_id, n_hits)`` for every training doc sharing ≥
    ``min_hits`` distinct word ``n``-grams with any benchmark doc.

    ``n_hits`` counts the doc's DISTINCT contaminated grams (set
    semantics, like the shingles themselves).

    The bench gram set is broadcast only below ``broadcast_cap_bytes``
    (estimated from its distinct-gram count); past the cap the probe
    falls back to a shuffled equi-join on the 8-byte hash — slower but
    safe for a benchmark set of any size.
    """
    bench_text = bench_text_col or text_col
    bench_grams = (
        spread(bench)
        .select(F.explode(word_shingles(bench_text, n)).alias("g"))
        .select(_hash64_expr(F.col("g")).alias("gh"))
        .distinct()
    )
    doc_grams = (
        spread(docs)
        .select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("g"))
        .select(id_col, _hash64_expr(F.col("g")).alias("gh"))
    )
    # the guard count re-scans the bench set (tiny by assumption; when
    # it isn't, one extra scan is cheap next to the shuffle join it
    # correctly routes to)
    if bench_grams.count() * _BENCH_GRAM_EST_BYTES <= broadcast_cap_bytes:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, on="gh", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def contaminated_docs_sql(
    docs_table: str,
    bench_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
) -> str:
    """DuckDB mirror.  ``bench_sql`` is a sub-select producing the
    benchmark rows (e.g. ``SELECT text FROM documents WHERE ...``)."""
    bench_text = bench_text_col or text_col
    bg = word_shingles_sql(f"b.{bench_text}", n)
    dg = word_shingles_sql(f"d.{text_col}", n)
    return f"""
WITH bench_grams AS (
  SELECT DISTINCT {_hash64_sql('g.gram')} AS gh
  FROM ({bench_sql}) b, UNNEST({bg}) AS g(gram)
),
doc_grams AS (
  SELECT d.{id_col} AS {id_col}, {_hash64_sql('g.gram')} AS gh
  FROM {docs_table} d, UNNEST({dg}) AS g(gram)
)
SELECT {id_col}, count(*)::BIGINT AS n_hits
FROM doc_grams JOIN bench_grams USING (gh)
GROUP BY 1 HAVING count(*) >= {min_hits}
"""
