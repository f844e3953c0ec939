"""triangle_counts: brute-force parity, hub skew, degenerate inputs."""

from itertools import combinations

from pyspark.sql import functions as F

from cadastre_pg_spark.operators.graph import triangle_counts


def _run(spark, edge_list, n=None):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = (
        spark.createDataFrame([(i,) for i in range(n)], "node long")
        if n is not None
        else None
    )
    df = triangle_counts(edges, nodes)
    return {r.node: r.n_triangles for r in df.collect()}


def _brute(edge_list, n):
    """O(n^3) reference: count triangles per corner on the simple
    undirected graph (self-loops dropped, duplicates collapsed)."""
    adj = {i: set() for i in range(n)}
    for s, d in edge_list:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    counts = {i: 0 for i in range(n)}
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


def test_single_triangle(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 0)], n=4)
    assert got == {0: 1, 1: 1, 2: 1, 3: 0}


def test_duplicate_reversed_and_self_edges_collapse(spark):
    # same triangle stated redundantly + a self-loop: still one triangle
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (1, 1)]
    got = _run(spark, edges, n=3)
    assert got == {0: 1, 1: 1, 2: 1}


def test_matches_brute_force_on_dense_pseudorandom(spark):
    n = 24
    edges = [
        (i, (i * 7 + j * 13 + 1) % n) for i in range(n) for j in range(5)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    assert _run(spark, edges, n) == _brute(edges, n)


def test_hub_star_has_no_triangles(spark):
    # a pure star: d^2 wedges at the hub but zero closures; the
    # degree orientation keeps every oriented out-list length <= 1
    n = 50
    edges = [(0, i) for i in range(1, n)]
    got = _run(spark, edges, n)
    assert got == {i: 0 for i in range(n)}


def test_hub_with_rim_matches_brute(spark):
    # wheel graph: hub + cycle rim -> every rim edge closes a triangle
    n = 12
    rim = [(i, i % (n - 1) + 1) for i in range(1, n)]
    edges = [(0, i) for i in range(1, n)] + rim
    assert _run(spark, edges, n) == _brute(edges, n)


def test_without_nodes_frame_omits_zero_rows(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 0), (3, 4)])
    assert got == {0: 1, 1: 1, 2: 1}
