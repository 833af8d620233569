"""SemDeDup-style semantic deduplication over an embedding column.

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): k-means the
embeddings, compute pairwise cosine ONLY within each cluster, connect
pairs above a similarity threshold into duplicate groups, and keep one
representative per group.  The cluster step is what makes it tractable
— the quadratic pair search runs inside clusters of ~n/k vectors
instead of across the corpus.

Spark shape (100 TB corpus):

* **Training** reuses the IVF coarse quantizer
  (:func:`.similarity.ivf_train_centroids`): deterministic lowest-id
  init + Lloyd iterations as DataFrame jobs, optionally over a
  ``train_fraction`` sample — only ``k·dim`` floats reach the driver.
* **Assignment is a scan-local expression** — an ``array_sort`` argmin
  over literal centroids, no shuffle, whole-stage-codegen'd.  The
  score is the expanded form ``c·c − 2·(v·c)`` (the ``v·v`` term is
  constant per vector and cannot change its argmin), each dot a
  summation-order-exact fold, so the DuckDB oracle reproduces the
  assignment bit-for-bit with ``list_dot_product``.
* **Pairs**: one equi-join on the cluster id with ``id1 < id2`` —
  quadratic strictly within clusters (the SemDeDup contract; size k
  with the corpus so clusters stay bounded).  A pathological hot
  cluster is visible as join skew; raise ``k`` or pre-split on a
  secondary LSH bit before resorting to salting.
* **Grouping**: the pointer-jumping distributed connected components
  of :func:`.cluster.connected_components` (O(log n) rounds, lineage
  truncated per round).

The exact-oracle gate runs ``iters=0`` (centroids = the k lowest-id
vectors — the quantizer's deterministic init), which exercises the
full assignment/pair/closure pipeline with SQL-expressible centroids;
Lloyd-iterated configs are cross-checked against a Python reference
model in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cluster import connected_components
from .similarity import cosine, dot, ivf_train_centroids
from .util import spread


def _assign_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id as a pure column expression: argmin over
    ``c·c − 2·(v·c)`` with ties to the lowest centroid id."""
    pairs = []
    for i, c in enumerate(centroids):
        c2 = 0.0
        for x in c:
            c2 += float(x) * float(x)
        lit = F.array(*[F.lit(float(x)) for x in c])
        score = F.lit(c2) - F.lit(2.0) * dot(F.col(vec_col), lit)
        pairs.append(F.struct(score.alias("d"), F.lit(i).alias("i")))
    return F.array_sort(F.array(*pairs))[0]["i"]


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
    train_fraction: float = 1.0,
) -> DataFrame:
    """Semantic near-duplicate groups: ``(id_col, cluster_rep, keep)``
    for every vector belonging to a within-cluster cosine-≥-threshold
    component.  ``cluster_rep`` is the minimum member id (the kept
    representative); vectors with no semantic duplicate are absent —
    anti-join the corpus against ``keep = 0`` rows to drop dups."""
    cents = ivf_train_centroids(
        embeddings,
        k=k,
        iters=iters,
        vec_col=vec_col,
        id_col=id_col,
        train_fraction=train_fraction,
    )
    assigned = spread(embeddings).select(
        F.col(id_col),
        F.col(vec_col),
        _assign_expr(vec_col, cents).alias("__cid"),
    )
    a = assigned.select(
        F.col("__cid"), F.col(id_col).alias("id1"), F.col(vec_col).alias("__v1")
    )
    b = assigned.select(
        F.col("__cid"), F.col(id_col).alias("id2"), F.col(vec_col).alias("__v2")
    )
    pairs = (
        a.join(b, on="__cid")
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine(F.col("__v1"), F.col("__v2")), round_dp).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("id").alias(id_col),
        F.col("cluster_id").alias("cluster_rep"),
        (F.col("id") == F.col("cluster_id")).cast("int").alias("keep"),
    )


def semantic_dedup_sql(
    table: str,
    k: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> str:
    """DuckDB mirror of :func:`semantic_dedup` with ``iters=0``:
    centroids are the k lowest-id vectors, assignment replays the
    identical ``c·c − 2·(v·c)`` arithmetic via ``list_dot_product``
    (same left-to-right double fold as the Spark ``aggregate``), the
    within-cluster pair predicate matches
    :func:`.similarity.embedding_neardup_pairs_sql`, and the
    component closure is the recursive-CTE reachability of
    :func:`.cluster.dedup_clusters_sql`."""
    v = f"e.{vec_col}::DOUBLE[]"
    cv = f"c.cvec::DOUBLE[]"
    dot_ab = f"list_dot_product(a.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[])"
    na = f"sqrt(list_dot_product(a.{vec_col}::DOUBLE[], a.{vec_col}::DOUBLE[]))"
    nb = f"sqrt(list_dot_product(b.{vec_col}::DOUBLE[], b.{vec_col}::DOUBLE[]))"
    cos = f"round({dot_ab} / ({na} * {nb}), {round_dp})"
    return f"""
WITH RECURSIVE cents AS (
  SELECT row_number() OVER (ORDER BY {id_col}) - 1 AS cid,
         {vec_col} AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {k})
),
assign AS (
  SELECT e.{id_col}, e.{vec_col}, c.cid
  FROM {table} e CROSS JOIN cents c
  QUALIFY row_number() OVER (
    PARTITION BY e.{id_col}
    ORDER BY list_dot_product({cv}, {cv}) - 2 * list_dot_product({v}, {cv}),
             c.cid) = 1
),
p AS (
  SELECT a.{id_col} AS id1, b.{id_col} AS id2
  FROM assign a JOIN assign b
    ON a.cid = b.cid AND a.{id_col} < b.{id_col}
  WHERE {cos} >= {threshold}
),
edges AS (
  SELECT id1 AS a, id2 AS b FROM p
  UNION
  SELECT id2, id1 FROM p
),
reach(id, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT id AS {id_col}, min(r) AS cluster_rep,
       CAST(id = min(r) AS INT) AS keep
FROM reach GROUP BY id
"""
