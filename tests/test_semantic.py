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
