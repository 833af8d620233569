"""Corpus-prep composite: quality filter ∧ exact-dedup winner ∧
near-dup cluster representative, as one shared plan used by both the
``corpus_prep`` gate query and the ``corpus-prep`` CLI job (a single
definition so the Spark job, the CLI, and the DuckDB oracle cannot
drift apart).

Cluster-representative rule (r2 advisory): the representative of a
near-dup cluster is the MINIMUM doc_id among members that PASS the
quality filter — not the unconditional min-id member.  With the
unconditional rule, a cluster whose canonical member failed
min-quality vanished wholesale even when a high-quality member
existed.  If no member passes quality the cluster contributes no
drops (every member is already gone via the quality filter).

Self-consistency note: the representative is always an exact-dedup
winner — identical texts score identically, so the min-id
quality-passing member of a cluster is also the min-id member of its
exact-text group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import dedup_clusters, dedup_clusters_sql
from .dedup import exact_dedup, exact_dedup_sql
from .text import lang_id, lang_id_sql, text_quality, text_quality_sql


def corpus_keep(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
) -> DataFrame:
    """Kept-docs manifest ``(doc_id, lang, quality_score)``.

    Shapes: scoring is scan-local column math; the exact-winner check
    a broadcastable semi-join on doc_id; the near-dup drop list a
    groupBy over cluster ids (bounded by cluster count) anti-joined
    back — no all-pairs, no driver loops.
    """
    feats = text_quality(F.col(text_col))
    scored = df.select(
        F.col(id_col).alias("doc_id"),
        lang_id(text_col).alias("lang"),
        feats["quality_score"].alias("quality_score"),
    )
    qpass = scored.filter(F.col("quality_score") >= min_quality)
    winners = exact_dedup(df, text_col, id_col).select(
        F.col("winner_id").alias("doc_id")
    )
    clusters = dedup_clusters(df, text_col, id_col)
    drops = cluster_drop_ids(clusters, qpass.select("doc_id"))
    return qpass.join(winners, "doc_id", "left_semi").join(
        drops, "doc_id", "left_anti"
    )


def cluster_drop_ids(clusters: DataFrame, qpass_ids: DataFrame) -> DataFrame:
    """Near-dup drop list given ``(doc_id, cluster_id)`` membership and
    the set of quality-passing doc_ids: every member except the
    representative (min doc_id among quality-passing members).  A
    cluster with no quality-passing member contributes no drops."""
    reps = (
        clusters.join(qpass_ids, "doc_id", "left_semi")
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("rep_id"))
    )
    return (
        clusters.join(reps, "cluster_id")
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select("doc_id")
    )


def corpus_keep_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    n: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> str:
    """DuckDB mirror of :func:`corpus_keep` (recursive-CTE closure)."""
    clusters = dedup_clusters_sql(
        table, text_col, id_col, n=n, n_hashes=n_hashes, bands=bands,
        threshold=threshold,
    )
    lang = lang_id_sql(text_col)
    score = text_quality_sql(text_col)["quality_score"]
    winners = exact_dedup_sql(table, text_col, id_col)
    return f"""
WITH clusters AS ({clusters}),
winners AS (SELECT winner_id AS doc_id FROM ({winners})),
scored AS (
  SELECT {id_col} AS doc_id, {lang} AS lang, {score} AS quality_score
  FROM {table}
),
qpass AS (SELECT doc_id FROM scored WHERE quality_score >= {min_quality}),
reps AS (
  SELECT c.cluster_id, min(c.doc_id) AS rep_id
  FROM clusters c JOIN qpass q ON q.doc_id = c.doc_id
  GROUP BY c.cluster_id
),
drops AS (
  SELECT c.doc_id
  FROM clusters c JOIN reps r ON r.cluster_id = c.cluster_id
  WHERE c.doc_id != r.rep_id
)
SELECT s.doc_id, s.lang, s.quality_score
FROM scored s
JOIN winners w ON w.doc_id = s.doc_id
LEFT JOIN drops d ON d.doc_id = s.doc_id
WHERE d.doc_id IS NULL AND s.quality_score >= {min_quality}
"""
