"""Graph operators for dedup pipelines: connected components over
near-duplicate pair sets.

After candidate generation + verification (MinHash/LSH -> Jaccard, or
SimHash banding), production dedup keeps ONE canonical document per
duplicate CLUSTER — the transitive closure of the pair relation, i.e.
connected components with the min doc id as the cluster label.

Scale shape: iterative label propagation with POINTER JUMPING — each
round does (1) a neighbor-min join on the (undirected) edge list and
(2) a label-of-label self-join that halves path lengths, so rounds are
O(log diameter), not O(diameter). Every round is two shuffles on
uniformly-hashed ids; the edge list is persisted once; labels persist
per round and unpersist the previous round (bounded lineage — at
10^12-doc scale add a checkpoint every ~8 rounds). Convergence is an
exact changed-count check, so the loop stops as soon as labels are
stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`;
    component = min node id of the connected component.

    checkpoint_every: when > 0, every Nth round uses RELIABLE
    `checkpoint()` (requires sc.setCheckpointDir) instead of
    localCheckpoint — on a production cluster localCheckpoint blocks
    are lost with their executor, which kills a long CC job; reliable
    checkpoints survive executor loss and also truncate lineage."""
    e = pairs.select(F.col(a).cast("long").alias("u"), F.col(b).cast("long").alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist()
    # localCheckpoint (not just persist) each round: the pointer-jump
    # self-join doubles the LOGICAL plan per iteration, so without
    # truncating lineage Catalyst's analysis cost grows 2^rounds even
    # though the data is cached. (On a production cluster prefer
    # reliable checkpoint() to survive executor loss.)
    labels = (
        edges.select("u").distinct().withColumn("label", F.col("u"))
        .localCheckpoint(eager=True)
    )

    def _truncate(df, rnd):
        if checkpoint_every > 0 and (rnd + 1) % checkpoint_every == 0:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    def _ckpt_rdd(df):
        # the checkpointed Dataset is a LogicalRDD wrapping the RDD that
        # holds the checkpoint blocks; DataFrame.unpersist() only touches
        # the CacheManager, so freeing the previous round means
        # unpersisting THAT rdd (no-op for reliable-checkpoint rounds,
        # whose storage is files)
        try:
            return df._jdf.queryExecution().analyzed().rdd()
        except Exception:
            return None

    prev_rdd = _ckpt_rdd(labels)
    for rnd in range(max_iter):
        # (1) min over neighbor labels
        nbr = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("vlabel")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nlabel"))
        )
        stepped = (
            labels.join(nbr, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
        )
        # (2) pointer jumping: label <- label(label) (path halving)
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("u").alias("label"), F.col("label").alias("ll")
                ).alias("p"),
                "label",
                "left",
            )
            .select("u", F.least(F.col("label"), F.coalesce(F.col("ll"), F.col("label"))).alias("label"))
        )
        jumped = _truncate(jumped, rnd)
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the changed-count above is the last reader of the previous
        # round: free its checkpoint blocks now (one live label table at
        # a time instead of one per round accumulating in storage)
        if prev_rdd is not None:
            prev_rdd.unpersist(False)
        prev_rdd = _ckpt_rdd(jumped)
        labels = jumped
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a: str = "a",
    b: str = "b",
    checkpoint_every: int = 0,
) -> DataFrame:
    """Cluster labels for near-dup pairs: (doc_id, component, is_canonical).
    Canonical = the min doc id of its cluster (the row a dedup keep-list
    retains)."""
    cc = connected_components(pairs, a=a, b=b, checkpoint_every=checkpoint_every)
    return cc.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


def connected_components_sql(pairs_sql: str, a: str = "a", b: str = "b") -> str:
    """DuckDB oracle: transitive closure via recursive CTE (fine at
    oracle scale), component = min reachable node."""
    return f"""
WITH RECURSIVE pr AS ({pairs_sql}),
e AS (
  SELECT {a} AS u, {b} AS v FROM pr
  UNION
  SELECT {b} AS u, {a} AS v FROM pr
),
reach(u, v) AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM e)
  UNION
  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
)
SELECT u AS node, min(v) AS component FROM reach GROUP BY u
"""
