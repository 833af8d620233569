"""SemDeDup-style semantic dedup (functions/semantic.py): numpy
reference-model cross-check (assignment + within-cluster pairs +
components, with Lloyd-iterated centroids), DuckDB-mirror parity at
the iters=0 gate config, partition invariance, and the plan pin
(assignment is scan-local — no shuffle before the cluster-id join)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_connect_jdbc_flatten_spark.functions.semantic import (
    semantic_dedup,
    semantic_dedup_sql,
)
from kafka_connect_jdbc_flatten_spark.functions.similarity import (
    ivf_train_centroids,
)

DIM = 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, DIM))
    rows = []
    vid = 0
    for i in range(40):
        v = base[i] / np.linalg.norm(base[i])
        rows.append((vid, [float(x) for x in v.astype(np.float32)]))
        vid += 1
        if i % 4 == 0:  # a near-duplicate: tiny perturbation
            d = v + rng.normal(scale=0.01, size=DIM)
            d = d / np.linalg.norm(d)
            rows.append((vid, [float(x) for x in d.astype(np.float32)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_model(rows, cents, threshold, round_dp=4):
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    C = np.array(cents, dtype=np.float64)
    # same expanded score: c.c - 2 v.c; ties -> lowest centroid id
    score = (C * C).sum(axis=1)[None, :] - 2.0 * (V @ C.T)
    cid = score.argmin(axis=1)
    # within-cluster pairs, rounded cosine >= threshold
    import itertools

    norm = np.sqrt((V * V).sum(axis=1))
    adj = {int(i): set() for i in ids}
    for x, y in itertools.combinations(range(len(ids)), 2):
        if cid[x] != cid[y]:
            continue
        cos = round(float(V[x] @ V[y] / (norm[x] * norm[y])), round_dp)
        if cos >= threshold:
            adj[int(ids[x])].add(int(ids[y]))
            adj[int(ids[y])].add(int(ids[x]))
    out = {}
    seen = set()
    for i in sorted(adj):
        if i in seen or not adj[i]:
            continue
        comp, stack = set(), [i]
        while stack:
            n = stack.pop()
            if n in comp:
                continue
            comp.add(n)
            stack.extend(adj[n] - comp)
        rep = min(comp)
        for n in comp:
            out[n] = rep
        seen |= comp
    return out


def test_semantic_dedup_matches_numpy_model_with_lloyd_iters(spark, emb):
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    cents = ivf_train_centroids(emb, k=4, iters=2, dim=DIM)
    expected = _numpy_model(rows, cents, threshold=0.98)
    got = {
        r.vec_id: r.cluster_rep
        for r in semantic_dedup(emb, k=4, threshold=0.98, iters=2).collect()
    }
    assert got == expected
    # every injected near-dup pair lands in a component
    assert len(got) >= 11  # 10 perturbed + their originals at minimum


def test_semantic_dedup_duckdb_parity_iters0(spark, emb):
    import duckdb

    pdf = emb.toPandas()
    con = duckdb.connect()
    con.register("embeddings", pdf)
    sql = semantic_dedup_sql("embeddings", k=4, threshold=0.98)
    orows = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    srows = {
        r.vec_id: (r.cluster_rep, r.keep)
        for r in semantic_dedup(emb, k=4, threshold=0.98, iters=0).collect()
    }
    assert srows == orows and len(srows) > 0


def test_semantic_dedup_partition_invariance(spark, emb):
    a = semantic_dedup(emb.repartition(1), k=4, threshold=0.98, iters=1)
    b = semantic_dedup(emb.repartition(7, "vec_id"), k=4, threshold=0.98, iters=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_semantic_assignment_is_scan_local(spark, emb):
    """The nearest-centroid expression must not shuffle: the only
    exchanges in the pair subtree are the __cid equi-join's."""
    from kafka_connect_jdbc_flatten_spark.functions.semantic import _assign_expr

    cents = ivf_train_centroids(emb, k=4, iters=0, dim=DIM)
    plan = (
        emb.select("vec_id", _assign_expr("embedding", cents).alias("cid"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_semantic_arrow_impls_match_expr_k8(spark, emb):
    """r4 verdict #1: the Arrow argmin assignment and the grouped-GEMM
    pair kernel must reproduce the expression forms exactly at the
    gate config (identical argmin ordering math, HALF_UP rounding)."""
    base = sorted(
        map(tuple, semantic_dedup(
            emb, k=4, threshold=0.98, iters=1,
            assign_impl="expr", pair_impl="expr",
        ).collect())
    )
    for ai, pi in [("arrow", "expr"), ("expr", "arrow"), ("arrow", "arrow")]:
        got = sorted(
            map(tuple, semantic_dedup(
                emb, k=4, threshold=0.98, iters=1,
                assign_impl=ai, pair_impl=pi,
            ).collect())
        )
        assert got == base, (ai, pi)


@pytest.fixture(scope="module")
def emb300(spark):
    """300 deterministic vectors with injected exact duplicates — big
    enough for a k=256 assignment."""
    rng = np.random.default_rng(23)
    rows = []
    for i in range(290):
        v = rng.normal(size=DIM)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    for j in range(10):  # exact duplicates of the first ten
        rows.append((290 + j, rows[j][1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_arrow_impls_match_expr_k256(spark, emb300):
    base = sorted(
        map(tuple, semantic_dedup(
            emb300, k=256, threshold=0.999, iters=0,
            assign_impl="expr", pair_impl="expr",
        ).collect())
    )
    got = sorted(
        map(tuple, semantic_dedup(
            emb300, k=256, threshold=0.999, iters=0,
            assign_impl="arrow", pair_impl="arrow",
        ).collect())
    )
    assert got == base and len(base) >= 20  # 10 dup pairs minimum


def test_grouped_gemm_tiling_matches_untiled(spark, emb300, monkeypatch):
    """r6: the grouped Arrow kernels tile the per-cluster GEMM so peak
    memory is O(block·n), not O(n²).  Forcing a tiny tile budget (many
    blocks per cluster) must not change a single output row vs the
    expr pair path — tiling is a pure memory-shape change."""
    from kafka_connect_jdbc_flatten_spark.functions import semantic as SEM

    base = sorted(
        map(tuple, semantic_dedup(
            emb300, k=4, threshold=0.999, iters=0,
            assign_impl="expr", pair_impl="expr",
        ).collect())
    )
    # ~75 rows/cluster at k=4; 2 KiB tiles → block of ~3 rows → ~25
    # tiles per cluster, exercising block boundaries and the fused
    # union-find across tiles
    monkeypatch.setattr(SEM, "_GEMM_TILE_BYTES", 2 << 10)
    got = sorted(
        map(tuple, semantic_dedup(
            emb300, k=4, threshold=0.999, iters=0,
            assign_impl="expr", pair_impl="arrow",
        ).collect())
    )
    assert got == base and len(base) >= 20


def test_assignment_plan_is_bounded_at_semdedup_scale_k(spark):
    """k=1024 × dim=256 — the literal-centroid expression would embed
    262 144 plan literals (Catalyst/Janino blow up long before data
    does); the auto-selected Arrow path's plan must be CONSTANT in k
    and still compute the right assignment."""
    from kafka_connect_jdbc_flatten_spark.functions.similarity import (
        ASSIGN_EXPR_MAX_TERMS,
        assign_nearest_arrow,
    )

    k, dim = 1024, 256
    assert k * dim > ASSIGN_EXPR_MAX_TERMS
    rng = np.random.default_rng(7)
    C = rng.normal(size=(k, dim))
    # 40 data vectors, each an exact copy of a known centroid -> the
    # nearest-centroid answer is that centroid's id
    pick = rng.integers(0, k, size=40)
    rows = [
        (int(i), [float(x) for x in C[pick[i]]]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = assign_nearest_arrow(
        df, [list(map(float, c)) for c in C], "embedding",
        keep_cols=["vec_id"], out_col="cid",
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 20_000  # no k·dim literal explosion
    got = {r.vec_id: r.cid for r in assigned.collect()}
    assert got == {int(i): int(pick[i]) for i in range(40)}


def test_hot_cluster_presplit_bounds_sizes_and_keeps_exact_dups(spark):
    """split_above: a pathological mega-cluster is split by secondary
    sign-LSH bits into bounded sub-clusters; exact duplicates share
    every LSH bit, so they stay co-bucketed and are still found."""
    from kafka_connect_jdbc_flatten_spark.functions.semantic import (
        _presplit_hot_clusters,
    )
    from kafka_connect_jdbc_flatten_spark.functions.similarity import (
        ivf_train_centroids,
    )

    rng = np.random.default_rng(5)
    rows = []
    # 192 diverse vectors in one half-space (one hot k-means cluster)
    for i in range(192):
        v = rng.normal(size=DIM)
        v[0] = abs(v[0]) + 4.0  # dominant +x component
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    # 4 exact-dup pairs inside the hot region
    for j in range(4):
        rows.append((200 + j, rows[j][1]))
    # a few vectors far away (second cluster)
    for i in range(8):
        v = rng.normal(size=DIM)
        v[0] = -abs(v[0]) - 4.0
        v = v / np.linalg.norm(v)
        rows.append((300 + i, [float(x) for x in v.astype(np.float32)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = ivf_train_centroids(df, k=2, iters=1, dim=DIM)
    from kafka_connect_jdbc_flatten_spark.functions.semantic import _assign_expr

    assigned = df.select(
        "vec_id", "embedding", _assign_expr("embedding", cents).alias("__cid")
    )
    before = {r["__cid"]: r["count"] for r in assigned.groupBy("__cid").count().collect()}
    hot_before = max(before.values())
    assert hot_before >= 150  # the fixture really is skewed

    split = _presplit_hot_clusters(assigned, "embedding", split_above=48, dim=DIM)
    after = {r["__cid"]: r["count"] for r in split.groupBy("__cid").count().collect()}
    assert max(after.values()) < hot_before  # skew reduced
    assert len(after) > len(before)  # sub-clusters exist
    # end-to-end: the exact dups are still detected under the pre-split
    out = {
        r.vec_id: r.cluster_rep
        for r in semantic_dedup(
            df, k=2, threshold=0.9999, iters=1, split_above=48
        ).collect()
    }
    for j in range(4):
        assert out.get(200 + j) == out.get(j) == j
