"""Deterministic stratified sampling for training-data mixes.

A pretraining pipeline rarely takes a corpus whole: it mixes strata
(language, quality band, source) at different rates.  ``sample()``
must be (a) deterministic across runs and cluster sizes — re-running
the job, or running it at 4× the executors, must select the SAME
rows (Spark's ``DataFrame.sample`` is seed-stable only per
partitioning, so it fails this); (b) a pure per-row predicate, so
Catalyst can push it into the scan and no shuffle or state is needed.

Mechanism: hash-bucket each row by ``md5(salt || id)`` into
``mod`` buckets and keep rows whose bucket falls below the stratum's
integer threshold ``int(rate · mod)``.  Selection is reproducible
bit-for-bit in DuckDB (same md5 arithmetic as the dedup layer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_MOD = 1_000_000


def sample_bucket(
    id_col: Column | str, salt: str = "smp", mod: int = SAMPLE_MOD
) -> Column:
    """Uniform deterministic bucket in [0, mod): 60-bit md5 prefix of
    the salted id.  Salting decorrelates this hash from every other
    md5-derived hash in the engine (fingerprints, MinHash)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % mod


def sample_bucket_sql(id_expr: str, salt: str = "smp", mod: int = SAMPLE_MOD) -> str:
    h = (
        f"CAST(('0x' || substring(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT)"
    )
    return f"({h} % {mod})"


def stratified_sample(
    df: DataFrame,
    stratum: Column | str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "smp",
    mod: int = SAMPLE_MOD,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value → keep fraction; strata not listed
    use ``default_rate``.  The filter is a scalar CASE over the
    stratum expression plus one md5 — fully codegen'd, pushdown-able,
    shuffle-free, and independent of partitioning (the north-rule
    property: the same rows survive at N and 4N executors).

    Output: input columns + ``stratum`` + ``bucket``.
    """
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    thr = F.lit(int(default_rate * mod))
    for value, rate in sorted(rates.items()):
        thr = F.when(s == value, F.lit(int(rate * mod))).otherwise(thr)
    return (
        df.withColumn("stratum", s)
        .withColumn("bucket", sample_bucket(id_col, salt, mod))
        .filter(F.col("bucket") < thr)
    )


def stratified_sample_sql(
    table: str,
    stratum_expr: str,
    rates: dict[str, float],
    id_expr: str,
    select: str,
    default_rate: float = 0.0,
    salt: str = "smp",
    mod: int = SAMPLE_MOD,
) -> str:
    """DuckDB mirror.  ``select`` = projected output columns (should
    include ``stratum`` / ``bucket`` aliases to match the Spark side)."""
    cases = " ".join(
        f"WHEN '{value}' THEN {int(rate * mod)}"
        for value, rate in sorted(rates.items())
    )
    thr = f"(CASE {stratum_expr} {cases} ELSE {int(default_rate * mod)} END)"
    bucket = sample_bucket_sql(id_expr, salt, mod)
    return (
        f"SELECT {select} FROM ("
        f"SELECT *, {stratum_expr} AS stratum, {bucket} AS bucket FROM {table}"
        f") WHERE bucket < {thr}"
    )


def mixture_weights(
    df: DataFrame,
    domain_col: str,
    tokens: Column | None = None,
    text_col: str = "text",
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Per-domain sampling weights to hit a target token mixture —
    the data-mixing step of a pretraining pipeline (DoReMi/Pile-style
    domain reweighting, computed from corpus statistics).

    Output: ``(domain, n_docs, n_tokens, actual_frac, target_frac,
    weight)`` where ``weight = target_frac / actual_frac`` is the
    per-domain sampling (or epoch-repeat) factor; weight > 1 means the
    domain is under-represented and must be up-sampled.  A domain
    observed with ZERO tokens (all-empty text) gets ``weight`` NULL in
    both engines — there is no finite factor that reaches a token
    share from nothing.

    ``target`` maps domain → desired token share; domains absent from
    the map share the REMAINING mass equally.  With no map at all the
    target is uniform over observed domains.  Fractions are rounded to
    6 dp (engine-portable floats).

    Scale shape: ONE map-side-combined aggregate over the corpus
    (per-domain token sums — the shuffle moves one pair per domain per
    task), then arithmetic over the tiny domain frame (a window over
    ≤ thousands of rows).  The heavy input scan is the same scan a
    token-count pass already does.
    """
    from .text import token_count_ws

    toks = tokens if tokens is not None else token_count_ws(text_col)
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks.cast("long")).alias("n_tokens"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    if target:
        fixed = sum(target.values())
        named = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        n_rest = F.sum(
            F.when(F.col("domain").isin(*target.keys()), 0).otherwise(1)
        ).over(w)
        tgt = F.coalesce(
            F.element_at(named, F.col("domain")),
            F.lit(max(0.0, 1.0 - fixed))
            / F.greatest(n_rest, F.lit(1)).cast("double"),
        )
    else:
        tgt = F.lit(1.0) / F.count(F.lit(1)).over(w).cast("double")
    # explicit zero guards — Spark's non-ANSI x/0 -> NULL is an engine
    # quirk, not a contract; make NULL the DOCUMENTED value in both
    # engines: actual_frac NULL iff the corpus has zero tokens, weight
    # NULL iff THIS domain has zero tokens (an all-empty-text domain
    # cannot be resampled to a token share)
    actual = F.when(
        total > 0, F.col("n_tokens").cast("double") / total.cast("double")
    )
    return per.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(actual, 6).alias("actual_frac"),
        F.round(tgt, 6).alias("target_frac"),
        F.round(F.when(F.col("n_tokens") > 0, tgt / actual), 6).alias("weight"),
    )


def mixture_weights_sql(
    table: str,
    domain_col: str,
    tokens_expr: str | None = None,
    text_col: str = "text",
    target: dict[str, float] | None = None,
) -> str:
    """DuckDB mirror of :func:`mixture_weights` (same rounding)."""
    from .text import token_count_ws_sql

    toks = tokens_expr if tokens_expr is not None else token_count_ws_sql(text_col)
    if target:
        fixed = sum(target.values())
        cases = " ".join(
            f"WHEN domain = '{k}' THEN CAST({v} AS DOUBLE)"
            for k, v in target.items()
        )
        in_list = ", ".join(f"'{k}'" for k in target)
        rest = (
            f"CAST(SUM(CASE WHEN domain IN ({in_list}) THEN 0 ELSE 1 END) "
            f"OVER () AS BIGINT)"
        )
        tgt = (
            f"(CASE {cases} ELSE CAST({max(0.0, 1.0 - fixed)} AS DOUBLE) / "
            f"CAST(greatest({rest}, 1) AS DOUBLE) END)"
        )
    else:
        tgt = "(CAST(1.0 AS DOUBLE) / CAST(COUNT(*) OVER () AS DOUBLE))"
    total = "CAST(SUM(n_tokens) OVER () AS BIGINT)"
    return f"""
WITH per AS (
  SELECT {domain_col} AS domain, count(*)::BIGINT AS n_docs,
         CAST(SUM(CAST({toks} AS BIGINT)) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY 1
)
SELECT domain, n_docs, n_tokens,
       round(CASE WHEN {total} > 0
             THEN CAST(n_tokens AS DOUBLE) / {total} END, 6) AS actual_frac,
       round({tgt}, 6) AS target_frac,
       round(CASE WHEN n_tokens > 0
             THEN {tgt} / (CAST(n_tokens AS DOUBLE) / {total}) END, 6) AS weight
FROM per
"""
