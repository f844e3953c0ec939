"""Streaming Misra-Gries: classical guarantees hold for any arrival
order, state stays <= k slots, and an undersubscribed summary (fewer
than k distinct keys) is exact."""

import shutil
import tempfile
from collections import Counter

from cadastre_pg_spark.streaming.sketches import mg_stream

K = 4


def _stream_final(spark, tmp, name, k=K):
    src = (
        spark.readStream.format("parquet")
        .schema("grp string, v string")
        .option("maxFilesPerTrigger", 1)
        .load(tmp)
    )
    q = mg_stream(src, k=k, query_name=name)
    q.processAllAvailable()
    q.stop()
    final = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        final[r.grp] = (r.n_seen, dict(zip(r.keys, r.counts)))
    return final


def _write_batches(spark, tmp, batches):
    for b in batches:
        spark.createDataFrame(b, "grp string, v string").coalesce(
            1
        ).write.mode("append").parquet(tmp)


def test_mg_guarantees_any_order(spark):
    # skewed stream: 'hot' dominates, 'warm' is above n/(k+1), tail
    # churns through slots
    batch_a = [("g", "hot")] * 12 + [("g", "warm")] * 7 + [
        ("g", f"t{i}") for i in range(5)
    ]
    batch_b = [("g", "hot")] * 8 + [("g", f"u{i}") for i in range(6)] + [
        ("g", "warm")
    ] * 3
    truth = Counter(v for _, v in batch_a + batch_b)
    n = sum(truth.values())
    for order, name in [((0, 1), "mgf"), ((1, 0), "mgr")]:
        tmp = tempfile.mkdtemp(prefix="mg_stream_")
        try:
            _write_batches(
                spark, tmp, [[batch_a, batch_b][i] for i in order]
            )
            final = _stream_final(spark, tmp, name)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        n_seen, summary = final["g"]
        assert n_seen == n
        assert len(summary) <= K
        err = n / (K + 1)
        for key, est in summary.items():
            assert est <= truth[key], (key, est, truth[key])
            assert est >= truth[key] - err, (key, est, truth[key], err)
        # any key with true count > n/(k+1) must be tracked
        for key, c in truth.items():
            if c > err:
                assert key in summary, (key, c, err)


def test_mg_exact_when_undersubscribed(spark):
    """Fewer distinct keys than slots: MG is an exact counter, so
    stream == truth independent of order, per group."""
    batches = [
        [("a", "x")] * 3 + [("a", "y")] + [("b", "z")] * 2,
        [("a", "y")] * 2 + [("b", "z")] + [("b", "w")],
    ]
    tmp = tempfile.mkdtemp(prefix="mg_stream_")
    try:
        _write_batches(spark, tmp, batches)
        final = _stream_final(spark, tmp, "mgx")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert final["a"] == (6, {"x": 3, "y": 3})
    assert final["b"] == (4, {"z": 3, "w": 1})
