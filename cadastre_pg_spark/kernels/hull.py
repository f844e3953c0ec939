"""Andrew monotone-chain convex hull (NumPy).

Fallback when ring reconstruction fails, mirroring the reference's
convex_hull_fallback (edigeo/src/repair/fallback.rs:8-26; trigger
repair/mod.rs:203-213): >=3 points required, else error.
"""

import numpy as np


def convex_hull(xs, ys):
    """Return hull vertex coords (hx, hy) in CCW order, closing vertex
    not repeated. Raises ValueError on <3 distinct points."""
    pts = np.unique(
        np.column_stack(
            [np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64)]
        ),
        axis=0,
    )
    if len(pts) < 3:
        raise ValueError("convex hull needs >= 3 distinct points")
    # pts is lexicographically sorted by np.unique
    def _half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = _half(pts)
    upper = _half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1])
    if len(hull) < 3:
        raise ValueError("degenerate hull (collinear points)")
    return hull[:, 0], hull[:, 1]


def hull_edges_int(pts):
    """STRICT convex hull of integer points as the CCW edge cycle.

    Input: iterable of (x, y) int pairs (duplicates fine). Returns the
    list of directed edges ((x1, y1), (x2, y2)) between CONSECUTIVE
    hull corners in counter-clockwise order — collinear boundary
    points are never corners. Exact: Python ints, no epsilon.

    Degenerate-by-design outputs (shared with the SQL edge predicate):
    1 distinct point -> []; 2 distinct points or all-collinear -> the
    segment's two directed edges (p,q) and (q,p) — each endpoint is a
    corner with the other as its CCW successor.

    The edge SET (not sequence) is the canonical artifact: it is
    order-independent, so a sorted-row compare against the oracle's
    per-edge predicate needs no agreed starting vertex.
    """
    p_sorted = sorted({(int(x), int(y)) for x, y in pts})
    if len(p_sorted) < 2:
        return []

    def _cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def _half(points):
        out = []
        for p in points:
            while len(out) >= 2 and _cross(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = _half(p_sorted)
    upper = _half(p_sorted[::-1])
    corners = lower[:-1] + upper[:-1]
    return list(zip(corners, corners[1:] + corners[:1]))
