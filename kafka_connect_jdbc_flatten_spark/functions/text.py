"""Text analysis for training-data pipelines.

All operators are pure column expressions (JVM-side, vectorized,
whole-stage codegen — the fast path mandated by the engine's
no-per-row-Python rule).  Each has a DuckDB-SQL mirror generated from
the SAME constants so the driver's oracle check covers them exactly.

Scale notes: every function here is a narrow map — no shuffle, no
skew exposure; at 100 TB these run at parquet-scan speed and column
pruning keeps the scan to the text column only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/number/punct tokenizer — identical semantics in Java
# regex (Spark) and RE2-ish (DuckDB) for this subset: no lookarounds,
# no unicode classes.
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

PUNCT_RE = r"[^a-zA-Z0-9\s]"
ALPHA_RE = r"[a-zA-Z]"

# Tiny deterministic stopword inventories per language (public common
# words).  Order of LANGS is the deterministic tie-break order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
    "no": ("og", "det", "er", "som", "en", "til", "av", "ikke", "den", "med"),
}
LANGS = tuple(LANG_STOPWORDS)

EN_STOPWORDS = LANG_STOPWORDS["en"]


# --------------------------------------------------------------------- Spark
def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens; empty/blank text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def re_tokens(col: Column | str) -> Column:
    """BPE-ish regex tokens (letters / digit runs / single punct)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_RE), 0)


def token_count_ws(col: Column | str) -> Column:
    return F.size(ws_tokens(col)).cast("long")


def token_count_re(col: Column | str) -> Column:
    return F.size(re_tokens(col)).cast("long")


def _count_re(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def text_quality(col: Column | str) -> dict[str, Column]:
    """Quality-feature columns: length, ratios, stopword density and a
    composite [0,1] score.  Deterministic and SQL-mirrorable."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("long")
    toks = ws_tokens(c)
    n_tokens = F.size(toks).cast("long")
    n_alpha = _count_re(c, ALPHA_RE)
    n_punct = _count_re(c, PUNCT_RE)
    lower_toks = F.transform(toks, lambda t: F.lower(t))
    n_stop = F.size(
        F.filter(lower_toks, lambda t: t.isin(*EN_STOPWORDS))
    ).cast("long")
    denom = F.greatest(n_chars, F.lit(1)).cast("double")
    tok_denom = F.greatest(n_tokens, F.lit(1)).cast("double")
    alpha_ratio = F.round(n_alpha / denom, 6)
    punct_ratio = F.round(n_punct / denom, 6)
    stop_ratio = F.round(n_stop / tok_denom, 6)
    # composite: favour alpha-rich, lightly punctuated, stopword-bearing,
    # reasonably long docs (cap length credit at 500 chars)
    score = F.round(
        0.4 * alpha_ratio
        + 0.2 * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 4.0, F.lit(1.0))
        + 0.2 * F.least(n_chars.cast("double") / 500.0, F.lit(1.0)),
        6,
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def lang_id(col: Column | str) -> Column:
    """n-gram-free heuristic language id: argmax of per-language
    stopword hit counts over whitespace tokens, deterministic
    tie-break by LANGS order, 'und' (undetermined) when no hits."""
    c = F.col(col) if isinstance(col, str) else col
    lower_toks = F.transform(ws_tokens(c), lambda t: F.lower(t))
    counts = {
        lang: F.size(F.filter(lower_toks, lambda t: t.isin(*words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in reversed(LANGS):
        expr = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
    return expr


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lower-case, collapse
    internal whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit document fingerprint (md5 hex of the
    normalized text).  Used as the exact-dedup key."""
    return F.md5(normalize_text(col))


def fingerprint64(col: Column | str) -> Column:
    """64-bit rolling-hash-style fingerprint: first 15 hex chars of the
    md5, base-16 → long (matches the DuckDB mirror exactly)."""
    return F.conv(F.substring(fingerprint(col), 1, 15), 16, 10).cast("long")


# -------------------------------------------------------------------- oracle
def _sql_ws_tokens(col: str) -> str:
    return (
        f"CASE WHEN trim({col}) = '' THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array(trim({col}), '\\s+') END"
    )


def token_count_ws_sql(col: str) -> str:
    return f"len({_sql_ws_tokens(col)})::BIGINT"


def token_count_re_sql(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_RE}'))::BIGINT"


def _sql_count_re(col: str, pattern: str) -> str:
    return f"len(regexp_extract_all({col}, '{pattern}'))::BIGINT"


def text_quality_sql(col: str) -> dict[str, str]:
    toks = _sql_ws_tokens(col)
    stop_in = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    n_chars = f"length({col})::BIGINT"
    n_tokens = f"len({toks})::BIGINT"
    n_alpha = _sql_count_re(col, ALPHA_RE)
    n_punct = _sql_count_re(col, PUNCT_RE)
    n_stop = f"len(list_filter(list_transform({toks}, t -> lower(t)), t -> t IN ({stop_in})))::BIGINT"
    denom = f"greatest({n_chars}, 1)::DOUBLE"
    tok_denom = f"greatest({n_tokens}, 1)::DOUBLE"
    alpha_ratio = f"round({n_alpha} / {denom}, 6)"
    punct_ratio = f"round({n_punct} / {denom}, 6)"
    stop_ratio = f"round({n_stop} / {tok_denom}, 6)"
    score = (
        f"round(0.4 * {alpha_ratio} + "
        f"0.2 * (1.0 - least({punct_ratio} * 4.0, 1.0)) + "
        f"0.2 * least({stop_ratio} * 4.0, 1.0) + "
        f"0.2 * least({n_chars}::DOUBLE / 500.0, 1.0), 6)"
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def lang_id_sql(col: str) -> str:
    toks = f"list_transform({_sql_ws_tokens(col)}, t -> lower(t))"
    counts = {}
    for lang, words in LANG_STOPWORDS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        counts[lang] = f"len(list_filter({toks}, t -> t IN ({in_list})))"
    best = "greatest(" + ", ".join(counts.values()) + ")"
    expr = "'und'"
    for lang in reversed(LANGS):
        expr = (
            f"CASE WHEN {counts[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def normalize_text_sql(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def fingerprint_sql(col: str) -> str:
    return f"md5({normalize_text_sql(col)})"


def fingerprint64_sql(col: str) -> str:
    return f"CAST(('0x' || substring({fingerprint_sql(col)}, 1, 15)) AS BIGINT)"
