"""group_hull_edges: integer monotone chain vs the supporting-line
edge predicate (the oracle's definition), distributed prune ==
single-pass kernel, degenerate groups."""

import random

from cadastre_pg_spark.kernels.hull import hull_edges_int
from cadastre_pg_spark.operators.overlay import group_hull_edges


def _brute_edges(pts):
    """The SQL oracle's predicate, replayed in Python ints."""
    P = sorted({(int(x), int(y)) for x, y in pts})
    out = set()
    for p1 in P:
        for p2 in P:
            if p1 == p2:
                continue
            ok = True
            for r in P:
                if r == p1 or r == p2:
                    continue
                cr = (p2[0] - p1[0]) * (r[1] - p1[1]) - (p2[1] - p1[1]) * (
                    r[0] - p1[0]
                )
                if cr > 0:
                    continue
                if cr == 0:
                    t = (r[0] - p1[0]) * (p2[0] - p1[0]) + (r[1] - p1[1]) * (
                        p2[1] - p1[1]
                    )
                    l2 = (p2[0] - p1[0]) ** 2 + (p2[1] - p1[1]) ** 2
                    if 0 < t < l2:
                        continue
                ok = False
                break
            if ok:
                out.add((p1, p2))
    return out


def test_kernel_equals_predicate_random_clouds():
    rng = random.Random(7)
    for trial in range(30):
        n = rng.randint(1, 40)
        span = rng.choice([3, 10, 1000])
        pts = [
            (rng.randint(-span, span), rng.randint(-span, span))
            for _ in range(n)
        ]
        assert set(hull_edges_int(pts)) == _brute_edges(pts), (trial, pts)


def test_kernel_collinear_and_degenerate():
    assert hull_edges_int([(1, 1)]) == []
    assert hull_edges_int([(1, 1), (1, 1)]) == []
    assert set(hull_edges_int([(0, 0), (4, 0), (2, 0), (3, 0)])) == {
        ((0, 0), (4, 0)),
        ((4, 0), (0, 0)),
    }
    # vertical collinear
    assert set(hull_edges_int([(0, 0), (0, 5), (0, 2)])) == {
        ((0, 0), (0, 5)),
        ((0, 5), (0, 0)),
    }


def test_kernel_ccw_orientation():
    edges = hull_edges_int([(0, 0), (4, 0), (4, 4), (0, 4), (2, 2)])
    # CCW cycle: signed area of the corner polygon is positive
    corners = [e[0] for e in edges]
    area2 = sum(
        x1 * y2 - x2 * y1
        for (x1, y1), (x2, y2) in zip(corners, corners[1:] + corners[:1])
    )
    assert area2 > 0
    assert (2, 2) not in corners  # interior point pruned


def test_distributed_equals_kernel_per_group(spark):
    rng = random.Random(11)
    rows = []
    expected = {}
    for gi in range(5):
        g = f"g{gi}"
        pts = [
            (rng.randint(-100, 100), rng.randint(-100, 100))
            for _ in range(rng.randint(1, 60))
        ]
        if gi == 3:
            pts = [(i, 2 * i) for i in range(10)]  # collinear group
        if gi == 4:
            pts = [(7, 7)]  # single point group
        expected[g] = set(hull_edges_int(pts))
        rows.extend((g, x, y) for x, y in pts)
    df = spark.createDataFrame(
        rows, "grp string, xq long, yq long"
    ).repartition(7)  # force the per-partition prune stage to matter
    got = {}
    for r in group_hull_edges(df).collect():
        got.setdefault(r.grp, set()).add(((r.x1, r.y1), (r.x2, r.y2)))
    for g, want in expected.items():
        assert got.get(g, set()) == want, g


def test_edge_shoelace_area():
    # square 0..4: doubled area = 32; degenerate segment cancels to 0
    def area2(edges):
        return sum(x1 * y2 - x2 * y1 for (x1, y1), (x2, y2) in edges)

    assert area2(hull_edges_int([(0, 0), (4, 0), (4, 4), (0, 4), (2, 2)])) == 32
    assert area2(hull_edges_int([(0, 0), (4, 0), (2, 0)])) == 0
