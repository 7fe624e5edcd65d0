"""Distributed k-means document clustering in EXACT integer
arithmetic — the clustering stage of semantic dedup / corpus mapping
(SemDeDup, Abbas et al. 2023 clusters embeddings before intra-cluster
near-dup; public method). Like operators/pagerank.py, every step is
integer math so the result is independent of partitioning and float
summation order, and a DuckDB twin (iterations unrolled as CTE
stages) reproduces assignments bit-for-bit:

- embeddings quantize once to int64 (floor(v * SCALE) on the
  double-cast value — identical IEEE result on both engines);
- init: centroids = the k vectors with the smallest 56-bit md5(id)
  (deterministic pseudo-random scatter, computed as a scale-safe
  top-k; k-means++ adds nothing for the exactness demonstration);
- assign: argmin of exact integer squared L2, ties -> lowest cluster
  id;
- update: element-wise truncated-division mean (toward zero, DuckDB
  // semantics; empty cluster keeps its centroid).

Scale shape (10^9 vectors): per iteration, assignment is MAP-ONLY (a
batched numpy argmin over the k x dim broadcast centroid matrix —
int64 exact, one Arrow batch matmul-like pass, no plan literals), and
the update is one partial-agg shuffle keyed by (cluster, dim) of
long rows; the k x dim sums collect to the driver (tiny) to form the
next broadcast. T iterations = T such rounds — the same
persisted-build/bounded-lineage pattern as pagerank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCALE = 1000


def _quantized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * SCALE).cast("long"),
    )
    return df.select(id_col, q.alias("_qv"))


def _make_assign_udf(C: np.ndarray):
    """argmin integer squared-L2 against the k x dim int64 centroid
    matrix; ties resolve to the lowest cluster id (np.argmin does)."""

    @F.pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.int64)
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def _make_probe_udf(C: np.ndarray, n_probe: int):
    """n_probe nearest centroid ids (integer squared-L2 asc, cid asc on
    ties — stable argsort reproduces the twin's row_number order)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.int64)
        d = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    return probes


def kmeans_assign(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 1,
) -> DataFrame:
    """(id, cluster) after `iterations` exact-integer Lloyd rounds.

    n_probe > 1 returns (id, cluster, probe): each vector lands in its
    `n_probe` nearest clusters (probe = 0-based nearness rank) — the
    SemDeDup boundary re-probe that recovers cross-cluster near-dup
    pairs at n_probe x assignment cost (training is unaffected;
    only the final assignment fans out)."""
    from mundipy_spark.functions import text as tx

    qdf = _quantized(vectors, vec_col, id_col).persist()
    # deterministic pseudo-random init: the k vectors with the SMALLEST
    # 56-bit md5(id) — a top-k (TakeOrdered: per-partition heads merged
    # on the driver, no global window/sort), and hash order scatters
    # the seeds across the space regardless of id locality
    seeded = qdf.withColumn(
        "_h", tx.md5_int_expr(F.col(id_col).cast("string"))
    )
    init = seeded.orderBy("_h", id_col).limit(k).collect()
    init = sorted(init, key=lambda r: (r._h, r[0]))
    C = np.array([r._qv for r in init], dtype=np.int64)
    dim = C.shape[1]
    for _ in range(iterations):
        assigned = qdf.withColumn("_c", _make_assign_udf(C)(F.col("_qv")))
        sums = (
            assigned.select(
                "_c", F.posexplode(F.col("_qv")).alias("_d", "_x")
            )
            .groupBy("_c", "_d")
            .agg(F.sum("_x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        newC = C.copy()
        acc = {}
        for r in sums:
            acc.setdefault(r._c, [np.zeros(dim, dtype=np.int64), 0])
            acc[r._c][0][r._d] = r.s
            acc[r._c][1] = r.n
        for c, (vec_sum, n) in acc.items():
            if n > 0:
                # integer division TRUNCATED TOWARD ZERO: DuckDB's //
                # truncates (-7 // 2 = -3) while Python/numpy floor
                # (-4), so the engine mirrors DuckDB's semantics
                newC[c] = np.sign(vec_sum) * (np.abs(vec_sum) // n)
        C = newC
    if n_probe <= 1:
        out = qdf.withColumn(
            "cluster", _make_assign_udf(C)(F.col("_qv")).cast("long")
        ).select(id_col, "cluster")
    else:
        out = qdf.select(
            id_col,
            F.posexplode(_make_probe_udf(C, n_probe)(F.col("_qv"))).alias(
                "probe", "cluster"
            ),
        ).select(id_col, F.col("cluster").cast("long"), "probe")
    # pin the final assignment BEFORE releasing the quantized cache:
    # `out` is lazy, so unpersisting here would recompute quantization
    # from `vectors` at the caller's action — the most expensive pass
    # (the n_probe fan-out) would lose the cache the loop paid to
    # build, and nondeterministic input lineage (sample/limit) could
    # even be assigned against different vectors than the centroids
    # were trained on. Same pattern as pagerank's final-ranks pin.
    out = out.localCheckpoint(eager=True)
    qdf.unpersist()
    return out


def kmeans_assign_sql(
    vectors_sql: str,
    k: int = 4,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_probe: int = 1,
) -> str:
    """DuckDB twin: quantize, k lowest-id init, `iterations` unrolled
    assign/update rounds, final assignment. Distances and means are
    the same integer arithmetic (// floor division). n_probe > 1 adds
    a `probe` column exactly like kmeans_assign."""
    from mundipy_spark.functions import text as tx

    quant = (
        f"list_transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {SCALE}) AS BIGINT))"
    )
    tx_md5 = tx.md5_int_sql("CAST(vid AS VARCHAR)")

    def dist(qv: str, cent: str) -> str:
        return (
            f"list_sum(list_transform(range(1, len({qv}) + 1),"
            f" i -> ({qv}[i] - {cent}[i]) * ({qv}[i] - {cent}[i])))"
        )

    def argmin(qv: str, cents: str) -> str:
        """index (0-based) of the nearest centroid in table `cents`
        (cluster c, vector cv) — lowest c wins ties."""
        return f"""(
  SELECT c FROM {cents}
  ORDER BY {dist(qv, "cv")} ASC, c ASC LIMIT 1
)"""

    sql = f"""
WITH qv AS (
  SELECT {id_col} AS vid, {quant} AS v FROM ({vectors_sql})
), c0 AS (
  SELECT row_number() OVER (ORDER BY h, vid) - 1 AS c, v AS cv
  FROM (
    SELECT vid, v, {tx_md5} AS h FROM qv ORDER BY h, vid LIMIT {k}
  )
)"""
    prev = "c0"
    for it in range(1, iterations + 1):
        sql += f""",
a{it} AS (
  SELECT vid, v, {argmin("v", prev)} AS c FROM qv
), c{it} AS (
  SELECT p.c,
         coalesce(u.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN (
    SELECT c, list(s ORDER BY d) AS cv FROM (
      SELECT c, d, CAST(sum(x) // count(*) AS BIGINT) AS s
      FROM (
        SELECT a.c, u.i AS d, a.v[u.i] AS x
        FROM a{it} a, UNNEST(range(1, len(a.v) + 1)) u(i)
      ) GROUP BY c, d
    ) GROUP BY c
  ) u ON u.c = p.c
)"""
        prev = f"c{it}"
    if n_probe <= 1:
        sql += f"""
SELECT vid AS {id_col}, CAST({argmin("v", prev)} AS BIGINT) AS cluster
FROM qv
"""
    else:
        sql += f"""
SELECT vid AS {id_col}, CAST(c AS BIGINT) AS cluster,
       CAST(rk - 1 AS INT) AS probe
FROM (
  SELECT qv.vid, ct.c,
         row_number() OVER (
           PARTITION BY qv.vid
           ORDER BY {dist("qv.v", "ct.cv")} ASC, ct.c ASC
         ) AS rk
  FROM qv, {prev} ct
) WHERE rk <= {n_probe}
"""
    return sql
