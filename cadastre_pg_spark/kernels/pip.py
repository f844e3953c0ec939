"""Exact ray-casting point-in-polygon, vectorized (points x edges).

The engine's refinement kernel for the cell-bucketed spatial join —
replaces the reference's use of geo::Contains
(edigeo/src/repair/topology.rs:3,34) and the PostGIS ST_Contains
workload its GIST index enables (postgres.rs:320-329).

Polygons use the flat representation carried in DataFrames:
``xs: float64[n], ys: float64[n], ring_offsets: int[r+1]`` where
ring 0 is the exterior and the rest are holes. The even-odd (crossing
number) rule over ALL rings handles holes with a single pass.
"""

import numpy as np

_MAX_PAIRS = 4_000_000  # cap on points*edges per vectorized block


def points_in_ring(px, py, rx, ry):
    """Crossing-number parity of points (N,) vs one ring (M,). Returns
    bool (N,). Ring need not repeat its closing vertex (edges wrap)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    if rx[0] == rx[-1] and ry[0] == ry[-1] and len(rx) > 1:
        rx, ry = rx[:-1], ry[:-1]
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    n, m = len(px), len(rx)
    inside = np.zeros(n, dtype=bool)
    # block over points so the (block x M) temp stays bounded
    step = max(1, _MAX_PAIRS // max(m, 1))
    for s in range(0, n, step):
        e = min(n, s + step)
        bx = px[s:e, None]
        by = py[s:e, None]
        cond = (y1[None, :] > by) != (y2[None, :] > by)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (by - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
                x2[None, :] - x1[None, :]
            )
        cross = cond & (bx < xint)
        inside[s:e] = (cross.sum(axis=1) % 2).astype(bool)
    return inside


def points_in_polygon(px, py, xs, ys, ring_offsets):
    """Even-odd containment of points (N,) vs a polygon with holes."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    parity = np.zeros(len(px), dtype=np.int64)
    for i in range(len(ring_offsets) - 1):
        a, b = ring_offsets[i], ring_offsets[i + 1]
        parity += points_in_ring(px, py, xs[a:b], ys[a:b]).astype(np.int64)
    return (parity % 2).astype(bool)


def segments_intersect_bbox(x1, y1, x2, y2, bx0, by0, bx1, by1):
    """Conservative: does each segment's bbox overlap the query bbox?
    (Used by polyfill full/partial classification — overlap is a
    necessary condition for the segment to cross the cell, so cells
    with no overlapping segment bboxes and all corners inside are
    provably interior.)"""
    sminx = np.minimum(x1, x2)
    smaxx = np.maximum(x1, x2)
    sminy = np.minimum(y1, y2)
    smaxy = np.maximum(y1, y2)
    return (sminx <= bx1) & (smaxx >= bx0) & (sminy <= by1) & (smaxy >= by0)
