"""Normalized geometry hashing for dedup + change detection.

Same normalization as the reference's geometry_hash
(cadastre-pg/src/versioning/diff.rs:13-114): drop the duplicate
closing vertex, rotate each ring to start at its lexicographically
minimal vertex, quantize coords to 1e-6 as int64 little-endian bytes,
hash type tag + canonical bytes. The hash is rotation-invariant but
NOT reflection-invariant — matching the reference's tests
(diff.rs:159-200). Algorithm swapped blake3 -> sha256 (stdlib).
"""

import hashlib

import numpy as np

QUANT = 1e6  # 1e-6 quantization (diff.rs:108-114)


def _quantize(xs, ys):
    xi = np.round(np.asarray(xs, dtype=np.float64) * QUANT).astype(np.int64)
    yi = np.round(np.asarray(ys, dtype=np.float64) * QUANT).astype(np.int64)
    return xi, yi


def normalize_ring(xs, ys):
    """Quantized ring with closing vertex dropped, rotated so the
    lexicographically-min (x, y) vertex is first (diff.rs:73-105)."""
    xi, yi = _quantize(xs, ys)
    if len(xi) > 1 and xi[0] == xi[-1] and yi[0] == yi[-1]:
        xi, yi = xi[:-1], yi[:-1]
    if len(xi) == 0:
        return xi, yi
    # lexicographic argmin over (x, y)
    order = np.lexsort((yi, xi))
    k = order[0]
    return np.roll(xi, -k), np.roll(yi, -k)


def _ring_bytes(xs, ys):
    xi, yi = normalize_ring(xs, ys)
    interleaved = np.empty(2 * len(xi), dtype=np.int64)
    interleaved[0::2] = xi
    interleaved[1::2] = yi
    return interleaved.astype("<i8").tobytes()


def geometry_hash(xs, ys, ring_offsets, geom_type: str = "Polygon") -> bytes:
    """sha256 (32 bytes) over the canonical serialization of the
    geometry in the flat (xs, ys, ring_offsets) representation."""
    h = hashlib.sha256()
    h.update(geom_type.encode("utf-8"))
    offs = np.asarray(ring_offsets, dtype=np.int64)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    for i in range(len(offs) - 1):
        a, b = offs[i], offs[i + 1]
        h.update(b"\x00ring")
        h.update(_ring_bytes(xs[a:b], ys[a:b]))
    return h.digest()


def point_hash(x: float, y: float) -> bytes:
    h = hashlib.sha256()
    h.update(b"Point")
    xi = int(round(x * QUANT))
    yi = int(round(y * QUANT))
    h.update(xi.to_bytes(8, "little", signed=True))
    h.update(yi.to_bytes(8, "little", signed=True))
    return h.digest()
