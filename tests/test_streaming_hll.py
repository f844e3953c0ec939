"""Streaming HLL == batch HLL, any arrival order."""

import shutil
import tempfile

from cadastre_pg_spark.operators.sketches import hll_distinct
from cadastre_pg_spark.streaming.sketches import hll_stream


def _write_files(spark, tmp, groups_of_rows):
    for i, rows in enumerate(groups_of_rows):
        spark.createDataFrame(rows, "grp string, v string").coalesce(
            1
        ).write.mode("append").parquet(tmp)


def _stream_final(spark, tmp, name):
    src = (
        spark.readStream.format("parquet")
        .schema("grp string, v string")
        .option("maxFilesPerTrigger", 1)
        .load(tmp)
    )
    q = hll_stream(src, p=7, query_name=name)
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # memory sink in update mode appends each update; last per grp wins
    final = {}
    for r in rows:
        final[r.grp] = (r.used_buckets, r.est)
    return final


def test_stream_equals_batch(spark):
    rows = [("a", f"tok{i}") for i in range(3000)] + [
        ("b", f"v{i % 40}") for i in range(200)
    ]
    tmp = tempfile.mkdtemp(prefix="hll_stream_")
    try:
        # 4 files of interleaved slices
        _write_files(spark, tmp, [rows[i::4] for i in range(4)])
        final = _stream_final(spark, tmp, "hll_t1")
        batch = {
            r.grp: (r.used_buckets, r.est)
            for r in hll_distinct(
                spark.createDataFrame(rows, "grp string, v string"),
                "grp",
                "v",
                p=7,
                hash_fn="md5",
            ).collect()
        }
        assert final == batch
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_order_insensitive(spark):
    rows = [("a", f"x{i}") for i in range(1000)]
    t1 = tempfile.mkdtemp(prefix="hll_stream_")
    t2 = tempfile.mkdtemp(prefix="hll_stream_")
    try:
        parts = [rows[0:300], rows[300:900], rows[900:]]
        _write_files(spark, t1, parts)
        _write_files(spark, t2, list(reversed(parts)))
        assert _stream_final(spark, t1, "hll_o1") == _stream_final(
            spark, t2, "hll_o2"
        )
    finally:
        shutil.rmtree(t1, ignore_errors=True)
        shutil.rmtree(t2, ignore_errors=True)
