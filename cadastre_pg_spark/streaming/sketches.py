"""Streaming HyperLogLog — the stream twin of
operators/sketches.hll_distinct: per-group register state updated per
micro-batch, estimate re-emitted on every update. Because HLL
registers are a commutative-idempotent MAX, the stream is
ORDER-INSENSITIVE: any batch arrival order converges to the batch
answer (unlike sessionization, no disorder policy is needed) — the
final emitted estimate per group equals the batch operator exactly,
asserted in tests/test_streaming_hll.py.

State per group is m = 2^p small ints (p=7 -> 128 registers); the
shuffle is the state operator's own hash exchange on the group key.
The value hash is the repo's shared md5-prefix-32 (hashlib here ==
Spark's md5() on UTF-8 bytes), so stream, batch, and the DuckDB
oracle all see identical registers.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cadastre_pg_spark.operators.sketches import hll_alpha_m2

OUTPUT_SCHEMA = "grp string, used_buckets long, est double"


def _state_schema(p: int) -> str:
    return "regs array<integer>"


def _rho(w: int, wbits: int) -> int:
    return wbits - w.bit_length() + 1


def _estimate(regs, p: int) -> tuple[int, float]:
    m = 1 << p
    used = sum(1 for r in regs if r > 0)
    s = sum(1.0 / (1 << r) for r in regs if r > 0)
    est_raw = hll_alpha_m2(p) / (s + (m - used))
    if (m - used) > 0 and est_raw <= 2.5 * m:
        est = float(m) * math.log(float(m) / (m - used))
    else:
        est = est_raw
    # Spark's round() is HALF_UP on the exact decimal expansion;
    # python round() is banker's — replicate HALF_UP for positives
    est = math.floor(est * 1e6 + 0.5) / 1e6
    return used, est


def _make_update(p: int):
    m = 1 << p
    wbits = 32 - p

    def _update(key, pdfs, state: GroupState):
        regs = list(state.get[0]) if state.exists else [0] * m
        for pdf in pdfs:
            for v in pdf["v"]:
                h = int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16)
                b = h & (m - 1)
                r = _rho(h >> p, wbits)
                if r > regs[b]:
                    regs[b] = r
        state.update((regs,))
        used, est = _estimate(regs, p)
        yield pd.DataFrame(
            {"grp": [key[0]], "used_buckets": [used], "est": [est]}
        )

    return _update


def hll_stream(
    grouped_values: DataFrame,
    p: int = 7,
    query_name: str = "hll",
):
    """grouped_values: a STREAMING DataFrame with columns (grp, v).
    Returns the started memory-sink query emitting (grp, used_buckets,
    est) per update; the last row per grp is the current sketch."""
    out = grouped_values.groupBy("grp").applyInPandasWithState(
        _make_update(p),
        OUTPUT_SCHEMA,
        _state_schema(p),
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )


CMS_OUTPUT_SCHEMA = "row integer, counts array<long>"


def _make_cms_update(width: int):
    def _update(key, pdfs, state: GroupState):
        counts = list(state.get[0]) if state.exists else [0] * width
        for pdf in pdfs:
            for b in pdf["b"]:
                counts[int(b)] += 1
        state.update((counts,))
        yield pd.DataFrame({"row": [key[0]], "counts": [counts]})

    return _update


def cms_stream(
    bucketed: DataFrame,
    width: int = 1024,
    query_name: str = "cms",
):
    """Streaming count-min — the stream twin of
    operators/sketches.cms_table. `bucketed` is a STREAMING DataFrame
    of (row, b) from operators.sketches.cms_buckets (the identical JVM
    hash expression the batch sketch uses), one state per sketch row
    (width longs). Counts are commutative, so the stream is
    ORDER-INSENSITIVE: the final emitted counts per row equal the
    batch cms_table exactly, any file arrival order — asserted in
    tests/test_streaming_cms.py.

    Returns the started memory-sink query emitting (row, counts) per
    update; the last row per `row` is the current sketch row.
    """
    out = bucketed.groupBy("row").applyInPandasWithState(
        _make_cms_update(width),
        CMS_OUTPUT_SCHEMA,
        "counts array<long>",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )


MG_OUTPUT_SCHEMA = (
    "grp string, n_seen long, keys array<string>, counts array<long>"
)


def _mg_apply(summary: dict, v: str, k: int):
    """One Misra-Gries update: increment if tracked, insert if a slot
    is free, else decrement every counter (dropping zeros)."""
    if v in summary:
        summary[v] += 1
    elif len(summary) < k:
        summary[v] = 1
    else:
        drop = [u for u in summary if summary[u] == 1]
        for u in summary:
            summary[u] -= 1
        for u in drop:
            del summary[u]


def _make_mg_update(k: int):
    def _update(key, pdfs, state: GroupState):
        if state.exists:
            keys, counts, n = state.get
            summary = dict(zip(list(keys), [int(c) for c in counts]))
            n = int(n)
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            for v in pdf["v"]:
                _mg_apply(summary, str(v), k)
                n += 1
        items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        state.update(
            ([i[0] for i in items], [i[1] for i in items], n)
        )
        yield pd.DataFrame(
            {
                "grp": [key[0]],
                "n_seen": [n],
                "keys": [[i[0] for i in items]],
                "counts": [[i[1] for i in items]],
            }
        )

    return _update


def mg_stream(
    grouped_values: DataFrame,
    k: int = 8,
    query_name: str = "mg",
):
    """Streaming Misra-Gries heavy hitters — the stream twin of
    operators/sketches.heavy_hitters' per-partition candidate stage:
    one k-slot frequency summary per group, updated per micro-batch
    via applyInPandasWithState, re-emitted (sorted by count desc, key
    asc) on every update.

    Unlike the HLL/CMS streams the MG summary is NOT order-insensitive
    — arrival order can shift WHICH tail keys occupy slots — but the
    classical guarantees hold for ANY order and are what the tests
    assert: every tracked count is within n_seen/(k+1) of the true
    count (never above it... never below true - n/(k+1)), and any key
    with true count > n_seen/(k+1) is GUARANTEED tracked. The batch
    operator recounts candidates exactly; at stream scale pair this
    with a stream-static recount join the same way.

    State per group: <= k (key, count) pairs + one long — constant
    memory however long the stream runs (the property that makes MG
    the streaming-top-k workhorse). Returns the started memory-sink
    query; the last row per grp is the current summary.
    """
    out = grouped_values.groupBy("grp").applyInPandasWithState(
        _make_mg_update(k),
        MG_OUTPUT_SCHEMA,
        "keys array<string>, counts array<long>, n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )
