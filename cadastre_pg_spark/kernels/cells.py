"""Cell codecs: the engine's replacement for the reference's PostGIS GIST
index (cadastre-pg/src/export/postgres.rs:320-329 — SURVEY.md J9/G7).

Two schemes, both from scratch (no h3/s2 libraries in env):

1. **grid** — an S2/quadkey-style square grid at `level` L over a fixed
   lon/lat bbox. Row-major id ``ix * 2^L + iy`` so the identical cell id
   is expressible in plain SQL (the DuckDB oracle uses the same floor
   arithmetic). A Morton (Z-order) variant provides locality-preserving
   ids for storage ordering.

2. **hex** — an H3-style pointy-top hexagonal grid in Web Mercator
   meters, resolutions 7..11 (edge 4096 m down to 256 m, halving per
   res). Axial coordinates packed into an int64. k-ring / disk expansion
   for kNN candidate generation.

All functions are vectorized over NumPy arrays.
"""

import numpy as np

from .mercator import wgs84_to_mercator

# ---------------------------------------------------------------- grid ----

# France-ish bbox used by the synthetic workload (covers mainland + margins)
GRID_LON0, GRID_LON1 = -5.0, 9.0
GRID_LAT0, GRID_LAT1 = 41.0, 51.0
DEFAULT_LEVEL = 10


def grid_cell(lon, lat, level: int = DEFAULT_LEVEL):
    """Row-major grid cell id at `level`: ix * 2^level + iy.

    SQL-equivalent (the DuckDB oracle runs exactly this):
      floor((lon - lon0) / (lon1-lon0) * 2^L) * 2^L
        + floor((lat - lat0) / (lat1-lat0) * 2^L)
    with clamping to [0, 2^L - 1].
    """
    n = np.int64(1) << level
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    ix = np.floor((lon - GRID_LON0) / (GRID_LON1 - GRID_LON0) * float(n))
    iy = np.floor((lat - GRID_LAT0) / (GRID_LAT1 - GRID_LAT0) * float(n))
    ix = np.clip(ix, 0, float(n - 1)).astype(np.int64)
    iy = np.clip(iy, 0, float(n - 1)).astype(np.int64)
    return ix * n + iy


def grid_cell_xy(lon, lat, level: int = DEFAULT_LEVEL):
    """(ix, iy) integer grid coordinates (clamped)."""
    n = np.int64(1) << level
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    ix = np.floor((lon - GRID_LON0) / (GRID_LON1 - GRID_LON0) * float(n))
    iy = np.floor((lat - GRID_LAT0) / (GRID_LAT1 - GRID_LAT0) * float(n))
    return (
        np.clip(ix, 0, float(n - 1)).astype(np.int64),
        np.clip(iy, 0, float(n - 1)).astype(np.int64),
    )


def grid_cell_from_xy(ix, iy, level: int = DEFAULT_LEVEL):
    n = np.int64(1) << level
    return np.asarray(ix, dtype=np.int64) * n + np.asarray(iy, dtype=np.int64)


def grid_cell_size(level: int = DEFAULT_LEVEL):
    """(width_deg, height_deg) of one cell."""
    n = float(1 << level)
    return (GRID_LON1 - GRID_LON0) / n, (GRID_LAT1 - GRID_LAT0) / n


def _part1by1(v):
    """Interleave zeros between the low 32 bits (Morton helper)."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_cell(lon, lat, level: int = DEFAULT_LEVEL):
    """Z-order (locality-preserving) variant of grid_cell, for storage
    ordering / range scans. Same (ix, iy) mapping as grid_cell."""
    ix, iy = grid_cell_xy(lon, lat, level)
    code = _part1by1(ix.astype(np.uint64)) | (
        _part1by1(iy.astype(np.uint64)) << np.uint64(1)
    )
    return code.astype(np.int64)


def hilbert_cell(lon, lat, level: int = DEFAULT_LEVEL):
    """Hilbert-curve cell code — the stronger locality-preserving
    storage key (consecutive codes are ALWAYS grid-adjacent, unlike
    Morton's diagonal jumps). Same (ix, iy) mapping as grid_cell;
    the standard iterative xy->d transform (rotate/flip per bit
    plane), vectorized: `level` rounds of integer vector ops. Pure
    integer arithmetic — the Spark Column chain and the DuckDB CTE
    chain replay it bit-for-bit."""
    ix, iy = grid_cell_xy(lon, lat, level)
    x = ix.astype(np.int64).copy()
    y = iy.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1 << (level - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant: ry == 0 flips (when rx == 1) then swaps
        flipx = s - 1 - x
        flipy = s - 1 - y
        nx = np.where(ry == 0, np.where(rx == 1, flipy, y), x)
        ny = np.where(ry == 0, np.where(rx == 1, flipx, x), y)
        x, y = nx, ny
        s >>= 1
    return d.astype(np.int64)


# ----------------------------------------------------------------- hex ----

# H3-style resolution ladder: edge length in Web Mercator meters.
HEX_BASE_EDGE = 4096.0
HEX_MIN_RES, HEX_MAX_RES = 7, 11
_SQRT3 = np.sqrt(3.0)

_Q_OFF = np.int64(1) << 25
_COORD_MASK = (np.int64(1) << 26) - np.int64(1)


def hex_edge(res: int) -> float:
    if not (HEX_MIN_RES <= res <= HEX_MAX_RES):
        raise ValueError(f"hex res must be in [{HEX_MIN_RES},{HEX_MAX_RES}]")
    return HEX_BASE_EDGE * 2.0 ** (HEX_MIN_RES - res)


def _axial_round(qf, rf):
    """Cube-round fractional axial coords to the containing hex."""
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_axial(x, y, res: int):
    """Web Mercator (x, y) meters -> axial (q, r) at `res` (pointy-top)."""
    a = hex_edge(res)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / a
    rf = (2.0 / 3.0 * y) / a
    return _axial_round(qf, rf)


def hex_pack(q, r, res: int):
    """(q, r, res) -> int64 id: res<<52 | (q+2^25)<<26 | (r+2^25)."""
    q = np.asarray(q, dtype=np.int64) + _Q_OFF
    r = np.asarray(r, dtype=np.int64) + _Q_OFF
    return (np.int64(res) << np.int64(52)) | (q << np.int64(26)) | r


def hex_unpack(cell):
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> np.int64(52)).astype(np.int64)
    q = ((cell >> np.int64(26)) & _COORD_MASK) - _Q_OFF
    r = (cell & _COORD_MASK) - _Q_OFF
    return q, r, res


def hex_cell(lon, lat, res: int):
    """WGS84 lon/lat -> hex cell id at `res`."""
    x, y = wgs84_to_mercator(lon, lat)
    q, r = hex_axial(x, y, res)
    return hex_pack(q, r, res)


def hex_center(cell):
    """Hex cell id -> Web Mercator (x, y) center."""
    q, r, res = hex_unpack(cell)
    a = HEX_BASE_EDGE * np.exp2(HEX_MIN_RES - res.astype(np.float64))
    x = a * _SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    y = a * 1.5 * r.astype(np.float64)
    return x, y


# axial neighbor directions (pointy-top)
HEX_DIRS = np.array(
    [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64
)


def hex_ring_offsets(k: int):
    """Axial offsets of the ring at exactly distance k (6k cells, k>=1)."""
    if k == 0:
        return np.zeros((1, 2), dtype=np.int64)
    out = []
    q, r = -k, k  # start at direction 4 scaled by k
    for d in range(6):
        dq, dr = HEX_DIRS[d]
        for _ in range(k):
            out.append((q, r))
            q += dq
            r += dr
    return np.asarray(out, dtype=np.int64)


def hex_disk_offsets(k: int):
    """All axial offsets within hex distance k ((3k^2+3k+1) cells)."""
    return np.concatenate([hex_ring_offsets(i) for i in range(k + 1)])


def hex_disk(cell, k: int):
    """For each cell id (N,), the (N, 3k^2+3k+1) disk of cell ids."""
    q, r, res = hex_unpack(cell)
    offs = hex_disk_offsets(k)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    return hex_pack(qq, rr, int(res[0]) if res.size else 0)


def morton_ranges(lon0, lat0, lon1, lat1, level: int = DEFAULT_LEVEL):
    """Merged inclusive Z-code ranges [(lo, hi), ...] covering every
    grid cell that intersects the bbox [lon0,lon1] x [lat0,lat1] —
    the index-scan plan for Morton-clustered storage (the BIGMIN idea
    precomputed: enumerate the rectangle's cells, sort their codes,
    merge consecutive runs). Cost depends only on `level` (at most
    4^level codes for the full grid), never on data size, so the
    caller may hold the ranges driver-side as literal predicates.

    Losslessness: grid_cell_xy's floor mapping is monotone in lon/lat,
    so every point inside the bbox lands in a cell whose (ix, iy) lies
    inside the corner cells' index rectangle — a range filter on these
    codes plus the exact bbox predicate equals the plain bbox scan.
    """
    (ix0,), (iy0,) = grid_cell_xy(lon0, lat0, level)
    (ix1,), (iy1,) = grid_cell_xy(lon1, lat1, level)
    ixs = np.arange(min(ix0, ix1), max(ix0, ix1) + 1, dtype=np.uint64)
    iys = np.arange(min(iy0, iy1), max(iy0, iy1) + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(ixs, iys)
    codes = np.sort(
        (_part1by1(gx.ravel()) | (_part1by1(gy.ravel()) << np.uint64(1)))
        .astype(np.int64)
    )
    breaks = np.flatnonzero(np.diff(codes) > 1)
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [codes.size - 1]))
    return [(int(codes[s]), int(codes[e])) for s, e in zip(starts, ends)]
