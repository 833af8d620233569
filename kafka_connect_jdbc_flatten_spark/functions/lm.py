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
    model: DataFrame | None = None,
    model_text_col: str | None = None,
    alpha: float = 0.0,
) -> DataFrame:
    """Score each document by mean unigram log-probability.

    With the default ``model=None`` the LM is fit on ``docs`` itself
    (every token has count ≥ 1, no smoothing needed).  Passing
    ``model`` scores ``docs`` under a reference corpus — the CCNet
    setup (score web text under a Wikipedia-style LM); held-out
    scoring requires ``alpha > 0`` (add-alpha smoothing) so
    out-of-vocabulary tokens get ``ln(alpha / (total + alpha·(V+1)))``
    instead of ``ln 0``; in-vocab tokens get
    ``ln((count + alpha) / (total + alpha·(V+1)))``.

    Output: ``(id_col, n_tokens, avg_logprob)`` — one row per
    document with at least one whitespace token, rounded to
    ``round_dp``.
    """
    toks = docs.select(
        F.col(id_col), F.explode(ws_tokens(F.col(text_col))).alias("tok")
    )
    dt = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("n_dt"))
    if model is None:
        model_toks = toks
        join_how = "inner"  # self-scoring: every token is in-vocab
    else:
        if not alpha > 0.0:
            raise ValueError(
                "held-out scoring needs alpha > 0 (OOV tokens otherwise "
                "hit ln 0); pass e.g. alpha=0.5"
            )
        mtc = model_text_col or text_col
        model_toks = model.select(
            F.explode(ws_tokens(F.col(mtc))).alias("tok")
        )
        join_how = "left"
    # freq from the token stream, NOT from dt: the dt subtree is not
    # reused across plan branches, so deriving freq from it would pay
    # the (doc, tok) shuffle twice; this branch shuffles only
    # map-side-combined (tok, count) partials per task.
    freq = model_toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # freq is vocab-sized (≪ corpus); localCheckpoint materializes it
    # once so the totals branch and the scoring join share one token
    # scan instead of re-exploding the corpus (lazy: computed on the
    # first action, reused after)
    freq = freq.localCheckpoint(eager=False)
    total = freq.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("n_vocab"),
    )
    a = float(alpha)
    terms = (
        dt.join(freq, "tok", join_how)
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("tok"),
            F.col("n_dt"),
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(a))
                    / (F.col("n_total") + F.lit(a) * (F.col("n_vocab") + F.lit(1.0)))
                ),
                term_dp,
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
    model_sql: str | None = None,
    model_text_col: str | None = None,
    alpha: float = 0.0,
) -> str:
    """DuckDB mirror of :func:`unigram_logprob` (same pre-rounded
    terms summed in the same token-sorted order, and the identical
    smoothing arithmetic so the self-scoring ``alpha = 0`` case stays
    bit-exact).  ``model_sql`` is a sub-select producing the model
    corpus rows for held-out scoring."""
    tk = _sql_ws_tokens(text_col)
    if model_sql is None:
        model_from = "toks"
        join_how = "JOIN"
    else:
        if not alpha > 0.0:
            raise ValueError("held-out scoring needs alpha > 0")
        mtk = _sql_ws_tokens(f"m.{model_text_col or text_col}")
        model_from = (
            f"(SELECT t.tok FROM ({model_sql}) m, UNNEST({mtk}) AS t(tok))"
        )
        join_how = "LEFT JOIN"
    a = repr(float(alpha))
    num = f"(coalesce(cnt, 0)::DOUBLE + {a})"
    den = f"(n_total + {a} * (n_vocab + 1.0))"
    return f"""
WITH toks AS (SELECT {id_col}, t.tok FROM {table}, UNNEST({tk}) AS t(tok)),
dt AS (SELECT {id_col}, tok, count(*)::BIGINT AS n_dt FROM toks GROUP BY 1, 2),
freq AS (SELECT tok, count(*)::BIGINT AS cnt FROM {model_from} GROUP BY 1),
total AS (SELECT sum(cnt)::DOUBLE AS n_total, count(*)::DOUBLE AS n_vocab FROM freq),
terms AS (
  SELECT {id_col}, dt.tok AS tok, n_dt,
         round(ln({num} / {den}), {term_dp}) AS term
  FROM dt {join_how} freq ON dt.tok = freq.tok, total
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
