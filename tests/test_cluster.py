"""Connected-components near-dup clustering + stratified sampling."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_connect_jdbc_flatten_spark.functions import cluster as CL
from kafka_connect_jdbc_flatten_spark.functions import sample as SMP
from kafka_connect_jdbc_flatten_spark.functions import text as TX


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id1 long, id2 long")


def test_cc_chain_collapses_to_min(spark):
    """A 10-node path graph needs transitive closure (adjacent pairs
    only) — pointer jumping must converge it to one cluster."""
    cc = CL.connected_components(
        _pairs(spark, [(i, i + 1) for i in range(9)])
    )
    rows = {r.id: r.cluster_id for r in cc.collect()}
    assert rows == {i: 0 for i in range(10)}


def test_cc_two_components_and_orientation(spark):
    """Components stay separate; edge orientation (id2 < id1) and
    duplicate edges don't matter."""
    cc = CL.connected_components(
        _pairs(spark, [(5, 3), (3, 5), (3, 7), (20, 21)])
    )
    rows = {r.id: r.cluster_id for r in cc.collect()}
    assert rows == {3: 3, 5: 3, 7: 3, 20: 20, 21: 20}


def test_cc_empty_pairs(spark):
    cc = CL.connected_components(_pairs(spark, []))
    assert cc.collect() == []


def test_dedup_clusters_matches_duckdb_closure(spark):
    """End-to-end on real documents: Spark LSH pairs → distributed CC
    must equal DuckDB's recursive-CTE closure over the same pair SQL."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in CL.dedup_clusters(docs, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            CL.dedup_clusters_sql("documents", "text", "doc_id")
        ).fetchall()
    }
    assert got == want
    assert len(got) > 0  # fixture actually contains near-dups


def test_stratified_sample_partition_invariant(spark):
    """The SAME rows must survive regardless of partitioning — the
    property Spark's own sample() lacks and the north rule needs."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {"en": 0.5, "de": 1.0}
    pick = lambda df: {
        r.doc_id
        for r in SMP.stratified_sample(
            df, TX.lang_id("text"), rates, "doc_id", default_rate=0.25
        ).select("doc_id").collect()
    }
    a = pick(docs.repartition(1))
    b = pick(docs.repartition(16, "doc_id"))
    assert a == b
    assert 0 < len(a) < docs.count()


def test_stratified_sample_rate_edges(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    full = SMP.stratified_sample(
        docs, F.lit("x"), {"x": 1.0}, "doc_id", default_rate=0.0
    )
    none = SMP.stratified_sample(
        docs, F.lit("x"), {"x": 0.0}, "doc_id", default_rate=1.0
    )
    assert full.count() == docs.count()
    assert none.count() == 0


def test_stratified_sample_rate_is_approximately_honored(spark):
    """Uniform bucket hash: a 50% rate keeps ~half (binomial bound)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    kept = SMP.stratified_sample(
        docs, F.lit("x"), {"x": 0.5}, "doc_id"
    ).count()
    assert abs(kept / n - 0.5) < 0.15, (kept, n)


def test_pack_manifest_matches_duckdb(spark):
    """Packing manifest must replicate bit-for-bit in DuckDB (shard
    hash, per-shard offsets, window spans)."""
    import duckdb as _dd

    from kafka_connect_jdbc_flatten_spark.functions import pack as PK

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        tuple(r)
        for r in PK.pack_manifest(docs, "doc_id", max_tokens=512, n_shards=4)
        .collect()
    }
    con = _dd.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            PK.pack_manifest_sql("documents", "doc_id", max_tokens=512, n_shards=4)
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_pack_manifest_offsets_are_contiguous_per_shard(spark):
    """Within a shard, doc token intervals tile the stream exactly:
    sorted by tok_offset, each doc starts where the previous ended
    (order-agnostic form of the tiling invariant — the stream order
    itself is (sub, doc_id), not doc_id)."""
    from kafka_connect_jdbc_flatten_spark.functions import pack as PK

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = (
        PK.pack_manifest(docs, "doc_id", max_tokens=128, n_shards=2)
        .orderBy("shard", "tok_offset")
        .collect()
    )
    pos = {}
    for r in rows:
        assert r.tok_offset == pos.get(r.shard, 0), r
        pos[r.shard] = r.tok_offset + r.n_tokens
        assert r.first_window == r.tok_offset // 128
        assert r.last_window == (r.tok_offset + r.n_tokens - 1) // 128


def test_pack_manifest_window_is_distributed_and_partition_invariant(spark):
    """r02 verdict #3: no single-task-per-shard window cumsum.  The
    executed plan's big window must be partitioned by (shard, sub) —
    n_shards·n_subs cells — and the manifest must be identical at any
    input partitioning."""
    from kafka_connect_jdbc_flatten_spark.functions import pack as PK

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = PK.pack_manifest(docs, "doc_id", max_tokens=128, n_shards=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [
        ln for ln in plan.splitlines() if "Window" in ln and "windowspec" in ln.lower()
    ] or [ln for ln in plan.splitlines() if ln.strip().startswith(("Window", "+- Window", ":- Window")) or "Window [" in ln]
    big = [ln for ln in win_lines if "n_tokens" in ln and "doc_id" in ln]
    assert big, plan
    assert all("sub" in ln for ln in big), big
    a = {tuple(r) for r in out.collect()}
    b = {
        tuple(r)
        for r in PK.pack_manifest(
            docs.repartition(16, "text"), "doc_id", max_tokens=128, n_shards=2
        ).collect()
    }
    assert a == b and len(a) > 0


def test_repetition_features_match_duckdb(spark):
    """Spark's sorted-run fold and DuckDB's filter-per-distinct form
    must agree on every repetition metric."""
    import duckdb as _dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = TX.repetition_features(F.col("text"))
    got = {
        r.doc_id: (r.dup_line_frac, r.top_bigram_frac, r.top_trigram_frac)
        for r in docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])
        .collect()
    }
    con = _dd.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    sql_feats = TX.repetition_features_sql("text")
    cols = ", ".join(f"{s} AS {n}" for n, s in sql_feats.items())
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(f"SELECT doc_id, {cols} FROM documents").fetchall()
    }
    assert got == want
    assert any(v != (0.0, 0.0, 0.0) for v in got.values())


def test_cc_random_graphs_match_union_find(spark):
    """Distributed CC must agree with a driver-side union-find on
    deterministic pseudo-random graphs of varying shape (chains,
    cliques, stars, isolated pairs)."""
    import hashlib

    def h(i, j):
        return int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)

    for seed in range(4):
        n = 40 + seed * 17
        edges = [
            (h(seed, 2 * k) % n, h(seed, 2 * k + 1) % n) for k in range(n // 2)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # union-find ground truth
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {a for e in edges for a in e}
        want = {x: find(x) for x in touched}
        # canonical label = min node of the component
        comp_min: dict[int, int] = {}
        for x in touched:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        want = {x: comp_min[find(x)] for x in touched}

        got = {
            r.id: r.cluster_id
            for r in CL.connected_components(
                _pairs(spark, [(int(a), int(b)) for a, b in edges])
            ).collect()
        }
        assert got == want, (seed, got, want)


def test_cli_corpus_prep_end_to_end(spark, tmp_path):
    """corpus-prep subcommand: kept manifest + packing manifest written,
    kept set equals the entry-point composite query."""
    import json as _json

    from kafka_connect_jdbc_flatten_spark import cli

    out = str(tmp_path / "kept")
    rc = cli.main([
        "corpus-prep",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--pack-max-tokens", "256",
        "--pack-shards", "2",
    ])
    assert rc == 0
    kept = spark.read.parquet(out)
    assert 0 < kept.count() <= 500
    pack = spark.read.parquet(out + "_pack")
    assert pack.count() == kept.count()
    assert set(pack.columns) >= {"doc_id", "shard", "tok_offset", "first_window"}


def test_cli_corpus_stream_end_to_end(spark, tmp_path, capsys):
    """corpus-stream subcommand: streaming dedup + quality gate +
    lake append driven entirely from the CLI surface (salted path)."""
    import json as _json

    from kafka_connect_jdbc_flatten_spark import cli
    from kafka_connect_jdbc_flatten_spark.lake.table import LakeTable

    wh = str(tmp_path / "wh")
    rc = cli.main([
        "corpus-stream",
        "--docs-dir", "/root/testdata/sf0.001/documents.parquet",
        "--warehouse", wh,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--min-quality", "0.2",
        "--salt-buckets", "4",
        "--buckets", "4",
    ])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["batches"] >= 1
    table = LakeTable(spark, wh + "/documents_clean")
    rows = table.read()
    n = rows.count()
    assert 0 < n <= summary["docs_in"]
    assert n == summary["rows"]
    # corpus-wide fingerprint dedup held
    assert rows.select("fp").distinct().count() == n


def test_cluster_rep_is_min_quality_passing_member(spark):
    """r2 advisory (low): the cluster representative must be chosen
    among QUALITY-PASSING members — an unconditional min-id canonical
    loses the whole cluster when the canonical member is low-quality."""
    from kafka_connect_jdbc_flatten_spark.functions import corpus as CORPUS

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    # cluster 1: min member (1) fails quality → rep = 2, drop only 3;
    # cluster 10: NO member passes → no drops (quality filter already
    # removes them all)
    qpass = spark.createDataFrame([(2,), (3,)], "doc_id long")
    drops = sorted(
        r.doc_id
        for r in CORPUS.cluster_drop_ids(clusters, qpass).collect()
    )
    assert drops == [1, 3]


def test_corpus_keep_matches_duckdb(spark):
    """The shared corpus-prep composition and its SQL mirror agree
    bit-for-bit (same composition the CLI job and gate query run)."""
    import duckdb as _dd

    from kafka_connect_jdbc_flatten_spark.functions import corpus as CORPUS

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r.doc_id, r.lang, round(r.quality_score, 6))
        for r in CORPUS.corpus_keep(docs, "text", "doc_id", 0.5).collect()
    }
    con = _dd.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        (r[0], r[1], round(r[2], 6))
        for r in con.execute(
            CORPUS.corpus_keep_sql("documents", "text", "doc_id", 0.5)
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_pack_manifest_properties_random_corpora(spark):
    """Property check over random corpora (random token counts incl.
    zeros, sparse/duplicate-free ids): the manifest (a) drops exactly
    the zero-token docs, (b) tiles every shard stream exactly, (c)
    computes window spans by integer division, and (d) matches the
    DuckDB mirror bit-for-bit."""
    import random

    import duckdb as _dd

    from kafka_connect_jdbc_flatten_spark.functions import pack as PK

    rng = random.Random(7)
    for trial in range(3):
        ids = rng.sample(range(10_000), 120)
        rows = [
            (i, " ".join("w" for _ in range(rng.choice([0, 1, 2, 7, 63, 130]))))
            for i in ids
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = PK.pack_manifest(
            df, "doc_id", max_tokens=64, n_shards=3, n_subs=4
        ).collect()
        nonzero = {i for i, t in rows if t}
        assert {r.doc_id for r in got} == nonzero
        pos: dict = {}
        for r in sorted(got, key=lambda r: (r.shard, r.tok_offset)):
            assert r.tok_offset == pos.get(r.shard, 0), r
            pos[r.shard] = r.tok_offset + r.n_tokens
            assert r.first_window == r.tok_offset // 64
            assert r.last_window == (r.tok_offset + r.n_tokens - 1) // 64
        con = _dd.connect()
        con.register("docs_tbl", __import__("pandas").DataFrame(
            rows, columns=["doc_id", "text"]
        ))
        want = con.execute(
            PK.pack_manifest_sql("docs_tbl", "doc_id", max_tokens=64,
                                 n_shards=3, n_subs=4)
        ).fetchall()
        assert {tuple(r) for r in got} == {tuple(r) for r in want}


def test_pack_windows_slices_and_duckdb_parity(spark):
    """Window slices must (a) partition each doc's tokens exactly
    (ranges tile [0, n_tokens) in win_idx order), (b) fill every
    window to max_tokens except each shard's last, and (c) match the
    DuckDB mirror bit-for-bit."""
    import duckdb as _dd

    from kafka_connect_jdbc_flatten_spark.functions import pack as PK

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    man = {r.doc_id: r for r in PK.pack_manifest(docs, "doc_id", 128, 2).collect()}
    wins = PK.pack_windows(docs, "doc_id", 128, 2).collect()
    # (a) per-doc tiling
    per_doc: dict = {}
    for r in wins:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(man)
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.win_idx)
        pos = 0
        for r in rows:
            assert r.tok_start == pos and r.tok_end > r.tok_start, r
            pos = r.tok_end
        assert pos == man[doc_id].n_tokens
    # (b) window fill: sum of slice lengths per (shard, win) == 128
    # for all but each shard's final window
    fill: dict = {}
    for r in wins:
        fill[(r.shard, r.win_idx)] = fill.get((r.shard, r.win_idx), 0) + (
            r.tok_end - r.tok_start
        )
    last = {}
    for (s, w) in fill:
        last[s] = max(last.get(s, -1), w)
    for (s, w), tot in fill.items():
        if w < last[s]:
            assert tot == 128, (s, w, tot)
        else:
            assert 0 < tot <= 128
    # (b2) window-relative placement (r3 review): within each window,
    # slices ordered by win_start tile [0, fill) contiguously from 0 —
    # a loader can place slices with NO knowledge of the stream order
    per_win: dict = {}
    for r in wins:
        per_win.setdefault((r.shard, r.win_idx), []).append(r)
    for (s, w), rows in per_win.items():
        rows.sort(key=lambda r: r.win_start)
        pos = 0
        for r in rows:
            assert r.win_start == pos, (s, w, r)
            pos += r.tok_end - r.tok_start
        assert pos == fill[(s, w)]
    # (c) DuckDB parity
    con = _dd.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            PK.pack_windows_sql("documents", "doc_id", 128, 2)
        ).fetchall()
    }
    assert {tuple(r) for r in wins} == want


def test_cli_corpus_prep_with_decontam_and_pii(spark, tmp_path):
    """corpus-prep with --bench and --redact-pii: contaminated docs
    (n-gram overlap with the held-out parquet) are dropped from the
    kept set and the summary reports the count.  The decontamination
    probe runs on the RAW text (r4 review: redacting first would break
    exactly the 8-gram overlaps the check exists to find); redaction
    applies to the kept training view."""
    from kafka_connect_jdbc_flatten_spark import cli
    from kafka_connect_jdbc_flatten_spark.functions.decontam import (
        contaminated_docs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench_path = str(tmp_path / "bench")
    docs.filter(F.col("doc_id") % 53 == 0).write.parquet(bench_path)
    out = str(tmp_path / "kept")
    rc = cli.main([
        "corpus-prep",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--bench", bench_path,
        "--bench-ngram", "8",
        "--redact-pii",
    ])
    assert rc == 0
    kept = spark.read.parquet(out)
    bad_ids = {
        r.doc_id
        for r in contaminated_docs(
            docs, docs.filter(F.col("doc_id") % 53 == 0), n=8
        ).collect()
    }
    assert bad_ids  # fixture has near-duplicates of the bench subset
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert not (got & bad_ids)
    # without decontamination the kept set would include some of them
    rc = cli.main([
        "corpus-prep",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(tmp_path / "kept_all"),
    ])
    assert rc == 0
    base = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "kept_all"))
        .select("doc_id").collect()
    }
    assert base & bad_ids
    assert got == base - bad_ids


def test_cli_corpus_prep_with_chunk_dedup(spark, tmp_path, capsys):
    """corpus-prep --chunk-dedup-tokens: surviving docs' text is
    rewritten with corpus-wide duplicate chunks removed, the packing
    stage consumes the CLEANED text, and the summary reports chunk
    stats."""
    import json as _json

    from kafka_connect_jdbc_flatten_spark import cli
    from kafka_connect_jdbc_flatten_spark.functions.text import ws_tokens

    out = str(tmp_path / "kept")
    rc = cli.main([
        "corpus-prep",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--chunk-dedup-tokens", "5",
        "--pack-max-tokens", "64",
        "--pack-shards", "2",
    ])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    st = summary["chunk_dedup"]
    assert st["chunks_kept"] < st["chunks_total"]  # fixture has dups
    kept = spark.read.parquet(out)
    assert "text" in kept.columns and kept.count() == summary["kept_docs"]
    # no 5-token chunk appears twice across the cleaned corpus
    from pyspark.sql import functions as FF
    toks = kept.select(
        "doc_id", FF.posexplode(ws_tokens("text")).alias("p", "tok")
    )
    chunks = (
        toks.withColumn("c", (FF.col("p") / 5).cast("int"))
        .groupBy("doc_id", "c")
        .agg(
            FF.concat_ws(" ", FF.transform(
                FF.array_sort(FF.collect_list(FF.struct("p", "tok"))),
                lambda s: s["tok"],
            )).alias("chunk"),
            FF.count(FF.lit(1)).alias("n"),
        )
        .filter(FF.col("n") == 5)  # only full chunks are dedup units
    )
    dup = chunks.groupBy("chunk").count().filter(FF.col("count") > 1).count()
    assert dup == 0
    # packing ran over the cleaned text: manifest token counts match
    pack = spark.read.parquet(out + "_pack")
    assert pack.count() == kept.count()
    n_pack = pack.agg(FF.sum("n_tokens")).collect()[0][0]
    n_clean = kept.select(FF.size(ws_tokens("text")).alias("n")).agg(
        FF.sum("n")
    ).collect()[0][0]
    assert n_pack == n_clean
