"""Near-duplicate clustering: connected components over a pair graph
and canonical-document selection.

The dedup operators (``functions/dedup.py``) emit *pairs*; a training
pipeline needs the *partition* they induce — which documents form one
duplicate cluster, and which single member to keep.  Pairs (a,b),(b,c)
must collapse to one cluster {a,b,c} even though (a,c) was never
emitted, so a transitive closure is required (cf. the reference's
whole-image replacement which similarly resolves groups, not pairs —
``BufferedRecords.java:264-270`` resolves per-key groups before apply).

Scale design (100 TB / 10^9 nodes):

* **No driver-side graph.**  Labels live in a DataFrame; every
  iteration is two shuffle joins on the node id (short keys).  The
  driver sees only a per-iteration convergence counter.
* **O(log n) convergence** — plain min-label flooding needs
  O(diameter) rounds (a 10^6-long chain would need 10^6 shuffles);
  each round here does neighbor-min *plus pointer jumping*
  (``lbl ← lbl[lbl]``), which halves label-tree depth per round, the
  classic Shiloach-Vishkin / "hash-to-min" trick from the MapReduce
  connected-components literature.
* **Near-dup graphs are shallow**: LSH clusters are cliques-ish, so
  typical convergence is 2-3 rounds; the log bound is the worst case.
* Labels only ever decrease, so the loop is monotone and the
  convergence test (#changed == 0) is exact, not heuristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_lsh_pairs, minhash_lsh_pairs_sql


def connected_components(
    pairs: DataFrame,
    id1_col: str = "id1",
    id2_col: str = "id2",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given as edge
    pairs.  Returns ``(id, cluster_id)`` for every node that appears
    in at least one pair; ``cluster_id`` = the minimum node id of the
    component (deterministic canonical label).

    Each iteration: (1) every node takes the min label among itself
    and its neighbors; (2) pointer-jump ``lbl ← lbl[lbl]``.  Stops
    when no label changed.
    """
    # both edge directions from ONE evaluation of the pairs subtree:
    # union(fwd, fwd.reversed) plans the (often expensive) pair
    # computation as two independent subtrees and runs it twice —
    # at the semantic-dedup gate the within-cluster cosine stage was
    # the whole query cost, paid 2× (r6 measurement: 31 s × 2 at 20 k
    # vectors).  explode(array(fwd, rev)) emits both directions from a
    # single pass instead (guide §2.4: remove duplicated subtrees).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id1_col).alias("a"), F.col(id2_col).alias("b")
                    ),
                    F.struct(
                        F.col(id2_col).alias("a"), F.col(id1_col).alias("b")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .distinct()
        .persist()
    )

    labels = (
        edges.select(F.col("a").alias("id")).distinct()
        .withColumn("lbl", F.col("id"))
        .persist()
    )
    if labels.limit(1).count() == 0:
        edges.unpersist()
        return labels.select("id", F.col("lbl").alias("cluster_id"))

    for _ in range(max_iters):
        # neighbor-min: min label over each node's neighborhood
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("b"), F.col("lbl").alias("nlbl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nlbl").alias("nmin"))
            .select(F.col("a").alias("id"), "nmin")
        )
        # the previous label rides along as old_lbl so convergence is a
        # plain filter over the checkpointed result instead of an extra
        # jumped⋈labels diff join per round (r6: one fewer shuffle join
        # per round, same exact #changed semantics — labels only ever
        # decrease)
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("lbl").alias("old_lbl"),
            F.least("lbl", F.coalesce("nmin", "lbl")).alias("lbl"),
        )
        # persist: the pointer-jump self-join below reads `stepped` on
        # BOTH sides — unpersisted, the neighbor-min join/aggregate
        # subtree would be planned and executed twice per round (the
        # same duplicated-subtree class as the edges union above)
        stepped = stepped.persist()
        # pointer jumping: adopt my label's label (labels are node ids,
        # so the lookup always hits)
        ref = stepped.select(
            F.col("id").alias("ref_id"), F.col("lbl").alias("ref_lbl")
        )
        # localCheckpoint (not just persist): each round references the
        # previous labels several times, so the LOGICAL plan would grow
        # geometrically and OOM the driver on long-diameter graphs
        # before any data does — truncating lineage per round keeps the
        # plan O(1)
        jumped = (
            stepped.join(ref, stepped["lbl"] == ref["ref_id"], "left")
            .select("id", "old_lbl", F.coalesce("ref_lbl", "lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("lbl") != F.col("old_lbl")).count()
        stepped.unpersist()
        labels.unpersist()
        labels = jumped.select("id", "lbl")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", F.col("lbl").alias("cluster_id"))


def dedup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup pairs → transitive clusters → keep flag.

    Output one row per document that belongs to a non-trivial cluster:
    ``(doc_id, cluster_id, keep)`` where ``cluster_id`` = min doc_id
    of the cluster and ``keep`` = 1 for the canonical member, 0 for
    members a training pipeline drops.  Documents in no cluster are
    implicitly kept (anti-join this output to materialize the corpus).
    """
    pairs = minhash_lsh_pairs(
        df, text_col, id_col, n, n_hashes, bands, threshold, seed
    )
    cc = connected_components(pairs)
    return cc.select(
        F.col("id").alias("doc_id"),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).cast("int").alias("keep"),
    )


def dedup_clusters_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """DuckDB mirror: same pair SQL, closure via recursive CTE
    (reach(id, r) = r reachable from id; cluster = min reachable)."""
    pairs = minhash_lsh_pairs_sql(
        table, text_col, id_col, n, n_hashes, bands, threshold, seed
    )
    return f"""
WITH RECURSIVE p AS ({pairs}),
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
SELECT id AS doc_id, min(r) AS cluster_id,
       CAST(id = min(r) AS INT) AS keep
FROM reach GROUP BY id
"""
