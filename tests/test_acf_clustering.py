"""acf_lag and clustering_coefficient: NumPy/brute parity, edge cases."""

import math
from datetime import datetime, timedelta

import numpy as np

from cadastre_pg_spark.operators.graph import clustering_coefficient
from cadastre_pg_spark.operators.stats import acf_lag


def _events(spark, series):
    """series: {grp: [v0, v1, ...]} — one event per minute."""
    t0 = datetime(2024, 1, 1)
    rows = [
        (g, t0 + timedelta(minutes=i), float(v))
        for g, vs in series.items()
        for i, v in enumerate(vs)
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def _np_acf(vs, k):
    y = np.floor(np.asarray(vs, dtype=float) * 100.0 + 0.5)
    n = len(y)
    if n <= k:
        return None
    ybar = y.sum() / n
    num = float(((y[:-k] - ybar) * (y[k:] - ybar)).sum())
    den = float(((y - ybar) ** 2).sum())
    if den == 0:
        return None
    return num / den


def test_acf_matches_numpy_definition(spark):
    series = {
        1: [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],        # strong positive lag-1
        2: [5.0, -5.0, 5.0, -5.0, 5.0],            # alternating: negative
        3: [2.5, 2.5, 2.5, 2.5],                   # constant: NULL (den=0)
        4: [7.75],                                  # n <= k: NULL
    }
    out = {r.grp: r for r in acf_lag(_events(spark, series), k=1).collect()}
    for g, vs in series.items():
        want = _np_acf(vs, 1)
        got = out[g].acf
        if want is None:
            assert got is None, g
        else:
            assert got is not None and math.isclose(got, want, rel_tol=1e-12), g


def test_acf_lag2_sufficient_stats_exact(spark):
    vs = [1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 0.5]
    out = acf_lag(_events(spark, {9: vs}), k=2).collect()[0]
    y = [int(np.floor(v * 100.0 + 0.5)) for v in vs]
    assert out.n == len(y)
    assert out.s == sum(y)
    assert out.q == sum(v * v for v in y)
    assert out.p == sum(y[i] * y[i + 2] for i in range(len(y) - 2))
    assert out.sa == sum(y[: len(y) - 2])
    assert out.sb == sum(y[2:])
    want = _np_acf(vs, 2)
    assert math.isclose(out.acf, want, rel_tol=1e-12)


def test_acf_unsorted_input_rows(spark):
    # rows arrive shuffled; the lead window must re-order by ts
    t0 = datetime(2024, 1, 1)
    vs = [4.0, 1.0, 3.0, 2.0, 5.0]
    rows = [(1, t0 + timedelta(minutes=i), v) for i, v in enumerate(vs)]
    rows = [rows[3], rows[0], rows[4], rows[2], rows[1]]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = acf_lag(df, k=1).collect()[0].acf
    assert math.isclose(got, _np_acf(vs, 1), rel_tol=1e-12)


def _cc(spark, edge_list, n):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    return {r.node: r for r in clustering_coefficient(edges, nodes).collect()}


def test_clustering_triangle_plus_tail(spark):
    # 0-1-2 triangle, 3 hangs off 0; 4 isolated
    got = _cc(spark, [(0, 1), (1, 2), (2, 0), (0, 3)], n=5)
    assert got[1].cc == 1.0 and got[2].cc == 1.0
    assert got[0].deg == 3 and got[0].n_triangles == 1
    assert math.isclose(got[0].cc, 2 * 1 / (3 * 2))
    assert got[3].cc is None and got[3].deg == 1
    assert got[4].cc is None and got[4].deg == 0 and got[4].n_triangles == 0


def test_clustering_complete_graph_is_one(spark):
    n = 6
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)]
    got = _cc(spark, edges, n)
    for i in range(n):
        assert got[i].deg == n - 1
        assert got[i].n_triangles == (n - 1) * (n - 2) // 2
        assert got[i].cc == 1.0
