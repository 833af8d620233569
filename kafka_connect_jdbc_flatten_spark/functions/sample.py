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
