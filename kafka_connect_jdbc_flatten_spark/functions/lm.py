"""Corpus-level unigram language-model quality scoring.

The CCNet-style statistical quality filter: fit a unigram LM on the
corpus itself (token frequencies), then score each document by its
mean token log-probability.  Documents far below the corpus mean are
rare-token-heavy (gibberish, boilerplate soup, wrong-script text) and
are dropped before training; this complements the per-row heuristics
in :mod:`.text` (``text_quality``) with a statistic no single row can
compute.

Scale design (100 TB corpus):

* Two map-side-combined aggregates — ``(doc, token)`` counts and the
  global token frequency table — both shuffling only ``(hash, count)``
  pairs, never text bodies.  The vocabulary (≪ corpus) joins back to
  the per-doc counts on the token key; stopword skew is harmless
  because the frequency side holds exactly one row per token.
* The per-document sum folds ``count × log p`` **in token-sorted
  order** (``array_sort`` over collected structs / ``list(... ORDER
  BY tok)``), with each term pre-rounded, so both engines add
  bit-identical doubles in an identical order — the oracle is exact,
  not approximately-equal (the r02 lesson).  Per-doc state is bounded
  by the document's distinct-token count.

No analogue in the reference (it has no corpus-level statistics); this
is part of the training-data extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _sql_ws_tokens, ws_tokens


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
    term_dp: int = 9,
) -> DataFrame:
    """Score each document by mean unigram log-probability under the
    corpus's own token distribution.

    Output: ``(id_col, n_tokens, avg_logprob)`` — one row per
    document with at least one whitespace token; ``avg_logprob`` is
    ``(1/n) Σ ln(count(tok)/total)``, rounded to ``round_dp``.
    """
    toks = docs.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("tok")
    )
    dt = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("n_dt"))
    # freq from the token stream, NOT from dt: the dt subtree is not
    # reused across plan branches, so deriving freq from it would pay
    # the (doc, tok) shuffle twice; this branch shuffles only
    # map-side-combined (tok, count) partials per task.
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("n_total"))
    terms = (
        dt.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("tok"),
            F.col("n_dt"),
            F.round(
                F.log(F.col("cnt").cast("double") / F.col("n_total")), term_dp
            ).alias("term"),
        )
    )
    agg = terms.groupBy(id_col).agg(
        F.sum("n_dt").cast("long").alias("n_tokens"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("tok"),
                        (F.col("n_dt").cast("double") * F.col("term")).alias("val"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["val"],
        ).alias("lp_sum"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        F.round(
            F.col("lp_sum") / F.col("n_tokens").cast("double"), round_dp
        ).alias("avg_logprob"),
    )


def unigram_logprob_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 4,
    term_dp: int = 9,
) -> str:
    """DuckDB mirror of :func:`unigram_logprob` (same pre-rounded
    terms summed in the same token-sorted order)."""
    tk = _sql_ws_tokens(text_col)
    return f"""
WITH toks AS (SELECT {id_col}, t.tok FROM {table}, UNNEST({tk}) AS t(tok)),
dt AS (SELECT {id_col}, tok, count(*)::BIGINT AS n_dt FROM toks GROUP BY 1, 2),
freq AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY 1),
total AS (SELECT sum(cnt)::DOUBLE AS n_total FROM freq),
terms AS (
  SELECT {id_col}, tok, n_dt, round(ln(cnt / n_total), {term_dp}) AS term
  FROM dt JOIN freq USING (tok), total
),
agg AS (
  SELECT {id_col}, sum(n_dt)::BIGINT AS n_tokens,
         list_aggregate(list(n_dt::DOUBLE * term ORDER BY tok), 'sum') AS lp_sum
  FROM terms GROUP BY 1
)
SELECT {id_col}, n_tokens,
       round(lp_sum / n_tokens::DOUBLE, {round_dp}) AS avg_logprob
FROM agg
"""
