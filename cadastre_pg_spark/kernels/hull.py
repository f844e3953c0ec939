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
