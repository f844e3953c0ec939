"""Ring reconstruction from unordered arcs + ring topology organization.

Re-implements the semantics of the reference's repair ladder:
- reconstruct_rings (edigeo/src/repair/ring.rs:8-109, tolerance 1e-6):
  keep self-closing arcs first, then greedily stitch remaining arcs by
  endpoint matching (4 orientation cases), auto-close small gaps,
  error if nothing closes.
- organize_rings (edigeo/src/repair/topology.rs:6-63): classify rings
  into outer shells vs holes by single-point containment.
- remove_dead_ends (topology.rs:66-107): iteratively drop arcs whose
  endpoint occurs only once (cul-de-sac pruning), 6-decimal keys.

Per-feature loops are unavoidable (graph walks) but each feature is
small; batches amortize the cost exactly like the reference's
per-archive loop (edigeo/src/lib.rs:133).
"""

import numpy as np

from .pip import points_in_ring

TOL = 1e-6


def _close_enough(p, q, tol=TOL):
    return abs(p[0] - q[0]) <= tol and abs(p[1] - q[1]) <= tol


def reconstruct_rings(arcs, tol=TOL):
    """arcs: list of (k_i, 2) float arrays (unordered, undirected).
    Returns list of closed rings ((m, 2) arrays, first==last).
    Raises ValueError if no ring can be closed."""
    rings = []
    open_arcs = []
    for arc in arcs:
        arc = np.asarray(arc, dtype=np.float64)
        if len(arc) > 3 and _close_enough(arc[0], arc[-1], tol):
            rings.append(arc)  # self-closing
        else:
            open_arcs.append(arc)

    while open_arcs:
        cur = [open_arcs.pop()]
        start = cur[0][0]
        end = cur[0][-1]
        progressed = True
        while progressed and not _close_enough(start, end, tol):
            progressed = False
            for i, arc in enumerate(open_arcs):
                if _close_enough(arc[0], end, tol):
                    cur.append(arc[1:])
                    end = arc[-1]
                elif _close_enough(arc[-1], end, tol):
                    cur.append(arc[::-1][1:])
                    end = arc[0]
                elif _close_enough(arc[-1], start, tol):
                    cur.insert(0, arc[:-1])
                    start = arc[0]
                elif _close_enough(arc[0], start, tol):
                    cur.insert(0, arc[::-1][:-1])
                    start = arc[-1]
                else:
                    continue
                # O(1) removal, mirrors swap_remove (ring.rs)
                open_arcs[i] = open_arcs[-1]
                open_arcs.pop()
                progressed = True
                break
        ring = np.concatenate(cur)
        if not _close_enough(ring[0], ring[-1], tol):
            # auto-close with a (logged) gap — ring.rs:95-104
            ring = np.concatenate([ring, ring[:1]])
        elif not np.array_equal(ring[0], ring[-1]):
            ring = np.concatenate([ring[:-1], ring[:1]])
        if len(ring) >= 4:
            rings.append(ring)

    if not rings:
        raise ValueError("no ring could be closed")
    # normalize: ensure closing vertex repeats exactly
    out = []
    for r in rings:
        if not np.array_equal(r[0], r[-1]):
            r = np.concatenate([r, r[:1]])
        out.append(r)
    return out


def organize_rings(rings):
    """Classify closed rings into (outer, holes[]) polygons by
    single-point containment (topology.rs:6-63). Returns a list of
    (exterior_ring, [hole_rings]) — one entry per polygon; more than
    one entry means MultiPolygon (repair/mod.rs:190-201)."""
    n = len(rings)
    if n == 1:
        return [(rings[0], [])]
    contained_by = [-1] * n
    for i in range(n):
        pi = rings[i][0]
        for j in range(n):
            if i == j:
                continue
            rj = rings[j]
            if points_in_ring([pi[0]], [pi[1]], rj[:, 0], rj[:, 1])[0]:
                contained_by[i] = j
                break
    polys = []
    idx_of = {}
    for i in range(n):
        if contained_by[i] == -1:
            idx_of[i] = len(polys)
            polys.append((rings[i], []))
    for i in range(n):
        j = contained_by[i]
        if j != -1:
            if j in idx_of:
                polys[idx_of[j]][1].append(rings[i])
            else:  # parent itself nested: treat as its own shell
                idx_of[i] = len(polys)
                polys.append((rings[i], []))
    return polys


def remove_dead_ends(arcs, decimals=6):
    """Iteratively drop arcs with a free (count==1) endpoint."""
    arcs = [np.asarray(a, dtype=np.float64) for a in arcs]

    def key(p):
        return (round(float(p[0]), decimals), round(float(p[1]), decimals))

    changed = True
    while changed and arcs:
        counts = {}
        for a in arcs:
            for p in (a[0], a[-1]):
                counts[key(p)] = counts.get(key(p), 0) + 1
        keep = [
            a
            for a in arcs
            if counts[key(a[0])] > 1 and counts[key(a[-1])] > 1
        ]
        changed = len(keep) != len(arcs)
        arcs = keep
    return arcs


def polygon_to_flat(polys):
    """[(exterior, holes[])] -> (xs, ys, ring_offsets) flat arrays."""
    xs, ys, offs = [], [], [0]
    for ext, holes in polys:
        for ring in [ext, *holes]:
            xs.append(ring[:, 0])
            ys.append(ring[:, 1])
            offs.append(offs[-1] + len(ring))
    return (
        np.concatenate(xs) if xs else np.empty(0),
        np.concatenate(ys) if ys else np.empty(0),
        np.asarray(offs, dtype=np.int64),
    )
