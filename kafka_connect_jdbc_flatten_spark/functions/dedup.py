"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:

* **Signatures are computed without a shuffle** — shingling, hashing,
  MinHash folding and SimHash bit-voting are all per-row array
  expressions (whole-stage codegen).  The only shuffles are the ones
  the semantics require: the candidate-pair join (on band bucket /
  hash chunk — short keys, combiner-friendly) and the final
  group/distinct.
* **Hot-shingle skew** — the exact Jaccard inverted index caps shingle
  document frequency (``max_df``): ultra-common shingles contribute
  O(df²) candidate pairs and no discriminative signal, the classic
  skew bomb.  LSH band buckets are bounded the same way.
* **Determinism** — every hash derives from md5 (first 15 hex chars →
  int), so the DuckDB oracle reproduces results bit-for-bit; MinHash
  permutation constants come from a fixed LCG (seed inlined below).

Spark has an MLlib ``MinHashLSH``; we implement our own on column
expressions to keep determinism + SQL-mirrorability + no ML pipeline
dependency (fit/transform state is overkill for a stateless hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import (
    _sql_ws_tokens,
    fingerprint,
    normalize_text,
    normalize_text_sql,
    ws_tokens as _ws_tokens,
)
from .util import spread

# Mersenne prime 2^31-1: (a*h + b) % P stays < 2^62 — safe for int64
# arithmetic in BOTH Spark and DuckDB (DuckDB raises on overflow).
MINHASH_P = 2_147_483_647


def _lcg(seed: int):
    x = seed
    while True:
        x = (1103515245 * x + 12345) % (1 << 31)
        yield x


def minhash_coeffs(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs, a ∈ [1, P-1], b ∈ [0, P-1]."""
    g = _lcg(seed)
    return [((next(g) % (MINHASH_P - 1)) + 1, next(g) % MINHASH_P) for _ in range(n_hashes)]


# ------------------------------------------------------------------ shingles
def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (set semantics).
    Shorter-than-n docs yield their whole normalized text as the one
    shingle so they can still exact-match."""
    toks = F.split(normalize_text(col), " ")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(F.when(k >= 1, grams).otherwise(whole))


def word_shingles_sql(col: str, n: int = 3) -> str:
    toks = f"string_split({normalize_text_sql(col)}, ' ')"
    k = f"(len({toks}) - {n - 1})"
    grams = (
        f"list_transform(range(1, greatest({k}, 0) + 1), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' '))"
    )
    whole = f"[array_to_string({toks}, ' ')]"
    return f"list_distinct(CASE WHEN {k} >= 1 THEN {grams} ELSE {whole} END)"


def _hash64_expr(c: Column) -> Column:
    """md5-derived 60-bit integer hash of a string column (portable)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _hash64_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


# -------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one winner per
    duplicate group (lowest id), plus group size.

    Hash-groupBy with map-side partial aggregation — the shuffle moves
    one (fingerprint, min_id, count) triple per group per task, not
    the text.  Output: (fp, winner_id, n_dups).
    """
    return (
        spread(df).select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("winner_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def exact_dedup_sql(table: str, text_col: str, id_col: str) -> str:
    fp = f"md5({normalize_text_sql(text_col)})"
    return (
        f"SELECT {fp} AS fp, min({id_col}) AS winner_id, "
        f"count(*) AS n_dups FROM {table} GROUP BY 1"
    )


# ------------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard ≥ threshold (exact).

    Inverted-index plan: explode distinct shingles, drop shingles
    with document frequency > ``max_df`` (skew/noise control — a
    shingle appearing in d docs generates d·(d-1)/2 candidate rows),
    self-join on shingle, count shared shingles per pair, then
    jaccard = inter / (|A| + |B| - inter).

    Returns (id1, id2, jaccard) with id1 < id2, jaccard rounded to 6dp.
    """
    sh = spread(df).select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("sh")
    )
    sizes = sh.select("id", F.size("sh").alias("sz"))
    ex = sh.select("id", F.explode("sh").alias("s"))
    if max_df is not None:
        # broadcast the SMALL side: shingles with df > max_df are the
        # few hot ones (at corpus scale the df ≤ max_df set is nearly
        # the whole vocabulary — broadcasting it was the r01 inversion);
        # anti-join drops candidates touching a hot shingle
        dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        hot = dfreq.filter(F.col("df") > max_df).select("s")
        ex = ex.join(F.broadcast(hot), "s", "left_anti").select("id", "s")
    # persisted: both sides of the self-join scan it
    ex = ex.persist()
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
        .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def ngram_jaccard_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> str:
    sh = word_shingles_sql(text_col, n)
    df_filter = (
        f", df_ok AS (SELECT s FROM ex GROUP BY s HAVING count(*) <= {max_df})"
        if max_df is not None
        else ""
    )
    ex_src = "ex JOIN df_ok USING (s)" if max_df is not None else "ex"
    return f"""
WITH sh AS (SELECT {id_col} AS id, {sh} AS sh FROM {table}),
sizes AS (SELECT id, len(sh) AS sz FROM sh),
ex AS (SELECT id, unnest(sh) AS s FROM sh)
{df_filter},
fex AS (SELECT id, s FROM {ex_src}),
inter AS (
  SELECT a.id AS id1, b.id AS id2, count(*) AS inter
  FROM fex a JOIN fex b ON a.s = b.s AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id1, id2,
       round(inter / (s1.sz + s2.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes s1 ON s1.id = id1
JOIN sizes s2 ON s2.id = id2
WHERE round(inter / (s1.sz + s2.sz - inter), 6) >= {threshold}
"""


# ---------------------------------------------------------------- MinHash+LSH
def minhash_signature(
    col: Column | str, n: int = 3, n_hashes: int = 32, seed: int = 42
) -> Column:
    """MinHash signature as array<long>, computed per row with NO
    shuffle: per-shingle hash array folded element-wise with
    ``least`` (map-side only; the classic explode+groupBy plan would
    shuffle every shingle)."""
    sh = word_shingles(col, n)
    coeffs = minhash_coeffs(n_hashes, seed)
    init = F.array(*[F.lit(MINHASH_P).cast("long") for _ in range(n_hashes)])

    def perm_hashes(s: Column) -> Column:
        h = _hash64_expr(s) % MINHASH_P
        return F.array(
            *[(F.lit(a) * h + F.lit(b)) % MINHASH_P for a, b in coeffs]
        )

    return F.aggregate(
        F.transform(sh, perm_hashes),
        init,
        lambda acc, x: F.zip_with(acc, x, lambda p, q: F.least(p, q)),
    )


def minhash_signature_sql(
    col: str, n: int = 3, n_hashes: int = 32, seed: int = 42
) -> str:
    sh = word_shingles_sql(col, n)
    h = f"({_hash64_sql('s')} % {MINHASH_P})"
    coeffs = minhash_coeffs(n_hashes, seed)
    terms = ", ".join(
        f"list_aggregate(list_transform({sh}, s -> ({a} * {h} + {b}) % {MINHASH_P}), 'min')"
        for a, b in coeffs
    )
    return f"[{terms}]"


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    bands=8 × rows=4 over 32 hashes ⇒ P(candidate) = 1-(1-j⁴)⁸ — ≈0.96
    at j=0.7, ≈0.3 at j=0.4: a standard high-recall curve for
    threshold 0.5.  Candidates then pass an EXACT verify (shingle-set
    Jaccard via array_intersect), so precision is 1 and the only
    approximation is banding recall.

    Shuffle profile: one exchange on (band_idx, band_key) for the
    candidate join, one on (id1, id2) for the distinct — both short
    keys; the signature itself is shuffle-free.
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    # persisted: consumed by banding once and the verify join twice —
    # without it the md5/minhash expressions run 3×
    base = spread(df).select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, n).alias("sh"),
        minhash_signature(text_col, n, n_hashes, seed).alias("sig"),
    ).persist()
    band_arr = F.array(
        *[
            F.concat_ws(
                "_",
                F.transform(
                    F.slice(F.col("sig"), j * rows + 1, rows),
                    lambda x: x.cast("string"),
                ),
            )
            for j in range(bands)
        ]
    )
    banded = base.select(
        "id", F.posexplode(band_arr).alias("band", "bkey")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    s1 = base.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = base.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    verified = (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.size(F.array_intersect("sh1", "sh2"))
                / (
                    F.size("sh1")
                    + F.size("sh2")
                    - F.size(F.array_intersect("sh1", "sh2"))
                ),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def minhash_lsh_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signature_sql(text_col, n, n_hashes, seed)
    sh = word_shingles_sql(text_col, n)
    band_rows = " UNION ALL ".join(
        f"SELECT id, {j} AS band, array_to_string("
        f"list_transform(sig[{j * rows + 1}:{(j + 1) * rows}], x -> x::VARCHAR), '_') AS bkey "
        "FROM base"
        for j in range(bands)
    )
    return f"""
WITH base AS (SELECT {id_col} AS id, {sh} AS sh, {sig} AS sig FROM {table}),
banded AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
),
verified AS (
  SELECT id1, id2,
         round(len(list_intersect(s1.sh, s2.sh)) /
               (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh))), 6)
           AS jaccard
  FROM cand
  JOIN base s1 ON s1.id = id1
  JOIN base s2 ON s2.id = id2
)
SELECT id1, id2, jaccard FROM verified WHERE jaccard >= {threshold}
"""


# -------------------------------------------------------------------- SimHash
SIMHASH_BITS = 32


def simhash(col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over whitespace tokens of the normalized text: for each
    bit, majority vote of token-hash bits (+1/-1), tie → 0.  Returns a
    non-negative long.

    Pure per-row expression (no shuffle), written as TWO array folds —
    one pass accumulating all ``bits`` vote counters, one pass packing
    sign bits — instead of ``bits`` independent filter scans, which
    blows Janino's 64 KB codegen method limit and falls back to
    interpreted eval."""
    toks = F.split(normalize_text(col), " ")
    # two-step transform keeps the md5 hash computed ONCE per token:
    # inside votes() the hash is a lambda-variable reference, not a
    # repeated subexpression
    hashes = F.transform(toks, _hash64_expr)

    def votes(h: Column) -> Column:
        return F.array(
            *[
                (F.shiftright(h, k).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                for k in range(bits)
            ]
        )

    counters = F.aggregate(
        F.transform(hashes, votes),
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    powers = F.array(*[F.lit(1 << k).cast("long") for k in range(bits)])
    return F.aggregate(
        F.zip_with(
            counters,
            powers,
            lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_sql(col: str, bits: int = SIMHASH_BITS) -> str:
    toks = f"string_split({normalize_text_sql(col)}, ' ')"
    hashes = f"list_transform({toks}, s -> {_hash64_sql('s')})"
    total = f"len({hashes})"
    terms = []
    for k in range(bits):
        ones = f"len(list_filter({hashes}, h -> ((h >> {k}) & 1) = 1))"
        terms.append(f"(CASE WHEN {ones} * 2 > {total} THEN 1::BIGINT ELSE 0 END << {k})")
    return "(" + " + ".join(terms) + ")"


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    chunks: int = 4,
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ max_hamming.

    Pigeonhole LSH: split the hash into ``chunks`` blocks — any pair
    within distance < chunks must agree on ≥1 whole block, so a join
    per block finds all candidates exactly (no recall loss when
    ``max_hamming < chunks``); then verify bit_count(xor) exactly.
    """
    assert bits % chunks == 0
    w = bits // chunks
    mask = (1 << w) - 1
    base = spread(df).select(F.col(id_col).alias("id"), simhash(text_col, bits).alias("sh"))
    chunk_arr = F.array(
        *[F.shiftright("sh", j * w).bitwiseAND(F.lit(mask)) for j in range(chunks)]
    )
    pieces = base.select("id", "sh", F.posexplode(chunk_arr).alias("cidx", "cval"))
    a, b = pieces.alias("a"), pieces.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.cidx") == F.col("b.cidx"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return cand


def simhash_neardup_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    chunks: int = 4,
) -> str:
    assert bits % chunks == 0
    w = bits // chunks
    mask = (1 << w) - 1
    sh = simhash_sql(text_col, bits)
    chunk_rows = " UNION ALL ".join(
        f"SELECT id, sh, {j} AS cidx, (sh >> {j * w}) & {mask} AS cval FROM base"
        for j in range(chunks)
    )
    return f"""
WITH base AS (SELECT {id_col} AS id, {sh} AS sh FROM {table}),
pieces AS ({chunk_rows})
SELECT DISTINCT a.id AS id1, b.id AS id2,
       bit_count(xor(a.sh, b.sh)) AS hamming
FROM pieces a JOIN pieces b
  ON a.cidx = b.cidx AND a.cval = b.cval AND a.id < b.id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
"""


# ------------------------------------------------------ chunk-level dedup
# Distributed approximation of exact-substring dedup (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): instead
# of a corpus-wide suffix array (inherently sequential), split each
# document into fixed-size token chunks and drop every chunk whose
# exact text occurs earlier in the corpus, then reconstruct the
# surviving document text.  Chunk granularity trades recall on
# arbitrary-offset substrings for a fully data-parallel plan.

CHUNK_POS_SHIFT = 1 << 20  # chunk_idx < 1M per doc (20 M tokens at k=20)
# ids must fit the encoding `id * 2^20 + idx` without int64 overflow;
# |id| < 2^42 leaves headroom (2^42 * 2^20 = 2^62 < 2^63)
CHUNK_MAX_ABS_ID = 1 << 42


def _chunk_pos_expr(id_col: str):
    """Keep-first position ``id * 2^20 + chunk_idx`` with a runtime
    bounds guard: out-of-range ids / chunk indexes RAISE (in both
    engines — see the SQL mirror) instead of silently wrapping, since
    a wrapped position corrupts the keep-first winner choice."""
    ok = (
        F.col(id_col).between(-CHUNK_MAX_ABS_ID, CHUNK_MAX_ABS_ID - 1)
        & (F.col("chunk_idx") < CHUNK_POS_SHIFT)
    )
    pos = F.col(id_col).cast("long") * CHUNK_POS_SHIFT + F.col("chunk_idx")
    return F.when(ok, pos).otherwise(
        F.raise_error(
            F.lit(
                "chunk_dedup: doc id or chunk index outside the encodable "
                f"range (|id| < 2^42, chunk_idx < {CHUNK_POS_SHIFT}); remap "
                "ids to a dense integral surrogate first"
            )
        )
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
) -> DataFrame:
    """Drop duplicated token chunks corpus-wide (keep-first by
    ``(doc_id, chunk_idx)``) and reconstruct the remaining text.

    Output: ``(id_col, clean_text, n_chunks, n_kept)`` — one row per
    document that produced at least one chunk; a fully-duplicated doc
    survives with ``clean_text = ''`` and ``n_kept = 0``.

    Scale design: chunking is scan-local (split + slice column
    exprs).  Chunk TEXT is shuffled exactly once, by doc id, for the
    reconstruction regroup; the corpus-wide keep-first decision moves
    only 8-byte keys — a map-side-combined ``min`` aggregate on the
    60-bit chunk hash, an equi-join of the keys-only chunk stream
    back on that hash, and a per-doc kept-index set (bounded by doc
    length) joined to the text stream on doc id.  The final groupBy
    reuses that join's partitioning, so no second text exchange.
    Keep-first ordering is encoded as a single BIGINT ``doc_id * 2^20
    + chunk_idx`` so the winner aggregate is a plain ``min`` (exact
    in both engines) — which requires an INTEGRAL ``id_col`` with
    ``|id| < 2^42`` and < 2^20 chunks per doc; non-integral id types
    are refused at plan time and out-of-range values raise at runtime
    (both engines) instead of silently corrupting the winner choice.
    Reconstruction is token-normalized: chunks are re-joined with
    single spaces.
    """
    k = int(chunk_tokens)
    if k < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    id_type = df.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # a non-numeric id would cast to NULL under Spark's non-ANSI
        # cast, making every `pos` NULL and silently dropping EVERY
        # chunk — refuse at plan time instead
        raise ValueError(
            f"chunk_dedup requires an integral {id_col!r} column for the "
            f"keep-first position encoding, got {id_type.simpleString()}; "
            "remap ids to a dense integral surrogate (e.g. "
            "zipWithUniqueId / row_number) before deduplicating"
        )
    toks = _ws_tokens(F.col(text_col))
    n_chunks = ((F.size(toks) + F.lit(k - 1)) / F.lit(k)).cast("long")
    chunks_arr = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1)).cast("int")),
            lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * k + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ch = spread(df).select(
        F.col(id_col), F.posexplode(chunks_arr).alias("chunk_idx", "chunk")
    )
    # keys-only stream: (doc, idx, hash, keep-first position) — no text
    keys = ch.select(
        id_col,
        "chunk_idx",
        _hash64_expr(F.col("chunk")).alias("chash"),
        _chunk_pos_expr(id_col).alias("pos"),
    )
    winner = keys.groupBy("chash").agg(F.min("pos").alias("wpos"))
    kept_idx = (
        keys.join(winner, "chash")
        .filter(F.col("pos") == F.col("wpos"))
        .groupBy(id_col)
        .agg(F.collect_set("chunk_idx").alias("keep_idx"))
    )
    joined = ch.join(kept_idx, id_col, "left").select(
        id_col,
        "chunk_idx",
        "chunk",
        F.array_contains(
            F.coalesce("keep_idx", F.array().cast("array<int>")), F.col("chunk_idx")
        ).alias("is_kept"),
    )
    return joined.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_kept"), F.struct("chunk_idx", "chunk")
                        )
                    )
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
    )


def chunk_dedup_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 20,
) -> str:
    """DuckDB mirror of :func:`chunk_dedup` (same hash, same
    keep-first encoding, same token-normalized reconstruction)."""
    k = int(chunk_tokens)
    tk = _sql_ws_tokens(text_col)
    return f"""
WITH base AS (SELECT {id_col}, {tk} AS tk FROM {table}),
ch AS (
  SELECT {id_col}, i - 1 AS chunk_idx,
         array_to_string(tk[((i - 1) * {k} + 1):((i - 1) * {k} + {k})], ' ') AS chunk
  FROM base, UNNEST(range(1, (len(tk) + {k - 1}) // {k} + 1)) AS r(i)
),
h AS (
  SELECT {id_col}, chunk_idx, chunk, {_hash64_sql('chunk')} AS chash,
         CASE WHEN {id_col} BETWEEN -{CHUNK_MAX_ABS_ID} AND {CHUNK_MAX_ABS_ID - 1}
                   AND chunk_idx < {CHUNK_POS_SHIFT}
              THEN {id_col}::BIGINT * {CHUNK_POS_SHIFT} + chunk_idx
              ELSE error('chunk_dedup: id/idx outside encodable range') END AS pos
  FROM ch
),
winner AS (SELECT chash, min(pos) AS wpos FROM h GROUP BY 1),
kept AS (SELECT h.* FROM h JOIN winner ON h.chash = winner.chash AND h.pos = winner.wpos),
tot AS (SELECT {id_col}, count(*)::BIGINT AS n_chunks FROM h GROUP BY 1),
rec AS (
  SELECT {id_col}, array_to_string(list(chunk ORDER BY chunk_idx), ' ') AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY 1
)
SELECT t.{id_col} AS {id_col}, coalesce(r.clean_text, '') AS clean_text,
       t.n_chunks, coalesce(r.n_kept, 0)::BIGINT AS n_kept
FROM tot t LEFT JOIN rec r ON t.{id_col} = r.{id_col}
"""
