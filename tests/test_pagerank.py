"""Integer fixed-point PageRank: exactness vs a driver-side simulation,
plausibility vs float PageRank."""

from mundipy_spark.operators import pagerank as pr


def _sim(edges, n_iter=10, dp=85, scale=pr.SCALE):
    """Reference simulation with the operator's exact integer ops."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = ((100 - dp) * scale) // 100 // n
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += rank[a] // deg[a]
        rank = {v: base + (dp * s[v]) // 100 for v in nodes}
    return rank


EDGES = [
    (0, 1),
    (1, 2),
    (2, 0),
    (3, 0),
    (3, 1),
    (0, 1),  # duplicate edge: multigraph counts it twice
    (4, 2),  # 4 is dangling-source only via no inlinks; 5 dangles out
    (2, 5),
]


def test_pagerank_matches_integer_simulation(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r["rank"] for r in pr.pagerank(edges, iterations=10).collect()}
    assert got == _sim(EDGES, 10)


def test_pagerank_checkpoint_path(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r.node: r["rank"] for r in pr.pagerank(edges, 7, checkpoint_every=2).collect()}
    assert a == _sim(EDGES, 7)


def test_pagerank_plausible_vs_float(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r["rank"] for r in pr.pagerank(edges, iterations=25).collect()}
    # float reference (leak variant), same damping
    nodes = sorted({s for s, _ in EDGES} | {d for _, d in EDGES})
    deg = {}
    for s, _ in EDGES:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(25):
        s = {v: 0.0 for v in nodes}
        for a, b in EDGES:
            s[b] += rank[a] / deg[a]
        rank = {v: 0.15 / len(nodes) + 0.85 * s[v] for v in nodes}
    for v in nodes:
        assert abs(got[v] / pr.SCALE - rank[v]) < 1e-6
