"""Polygon measures — area, perimeter, centroid (ST_Area / ST_Perimeter
/ ST_Centroid analog over the engine's flat-array geometry model; the
reference exposes these through its geometry walker, geo/src/geom.rs).

Single-process oracle kernel: NO Spark imports (repo invariant —
distributed == kernel is the core test). Summation is a plain
sequential left-to-right Python-float loop, NOT numpy (np.sum is
pairwise) and NOT math.fsum (compensated): the Spark operator folds
with Catalyst's ArrayAggregate and the DuckDB oracle with list_reduce,
both strictly left-to-right over IEEE doubles, so all three produce
BITWISE-identical results only if this kernel adds in the same order.

Geometry model: closed rings (first vertex repeated last) in flat
xs/ys arrays segmented by ring_offsets; ring 0 is the exterior, any
further rings are even-odd holes wound the SAME way as the exterior
(data/synthetic.py star parcels), so:

  area      = (|2A_0| - sum_{r>0} |2A_r|) / 2
  perimeter = sum over ALL rings of edge lengths (holes add interior
              boundary, matching ST_Perimeter)
  centroid  = (w_0 M_0 - sum_{r>0} w_r M_r) / (3 * area2_eff) with
              w_r = sign(2A_r) so each ring's moment is orientation-
              corrected before the even-odd combination

where 2A = sum cross_i (shoelace, cross_i = x_i*y_{i+1} - x_{i+1}*y_i)
and M = sum (x_i + x_{i+1}) * cross_i (and the y twin).
"""

from __future__ import annotations

import math


def ring_measures(xs, ys, start: int, end: int):
    """(area2, perim, mx, my) for one CLOSED ring xs[start:end] —
    sequential left-to-right double accumulation."""
    a2 = 0.0
    perim = 0.0
    mx = 0.0
    my = 0.0
    for i in range(start, end - 1):
        x1, y1 = float(xs[i]), float(ys[i])
        x2, y2 = float(xs[i + 1]), float(ys[i + 1])
        cross = x1 * y2 - x2 * y1
        a2 = a2 + cross
        dx = x2 - x1
        dy = y2 - y1
        perim = perim + math.sqrt(dx * dx + dy * dy)
        mx = mx + (x1 + x2) * cross
        my = my + (y1 + y2) * cross
    return a2, perim, mx, my


def polygon_measures(xs, ys, ring_offsets):
    """(n_rings, area, perimeter, cx, cy) for one polygon; cx/cy are
    None when the effective double area underflows to exactly 0."""
    n_rings = len(ring_offsets) - 1
    area2_eff = 0.0
    perimeter = 0.0
    numx = 0.0
    numy = 0.0
    for r in range(n_rings):
        a2, perim, mx, my = ring_measures(
            xs, ys, int(ring_offsets[r]), int(ring_offsets[r + 1])
        )
        sgn_mx = -mx if a2 < 0 else mx
        sgn_my = -my if a2 < 0 else my
        if r == 0:
            area2_eff = area2_eff + abs(a2)
            numx = numx + sgn_mx
            numy = numy + sgn_my
        else:
            area2_eff = area2_eff + (-abs(a2))
            numx = numx + (-sgn_mx)
            numy = numy + (-sgn_my)
        perimeter = perimeter + perim
    area = area2_eff / 2
    if area2_eff == 0.0:
        return n_rings, area, perimeter, None, None
    return (
        n_rings,
        area,
        perimeter,
        numx / (3.0 * area2_eff),
        numy / (3.0 * area2_eff),
    )
