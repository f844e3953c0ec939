"""Streaming CMS == batch CMS, any arrival order."""

import shutil
import tempfile

from cadastre_pg_spark.operators.sketches import cms_buckets, cms_table
from cadastre_pg_spark.streaming.sketches import cms_stream

W, D = 64, 3


def _stream_final(spark, tmp, name):
    src = (
        spark.readStream.format("parquet")
        .schema("v string")
        .option("maxFilesPerTrigger", 1)
        .load(tmp)
    )
    q = cms_stream(cms_buckets(src, "v", W, D), width=W, query_name=name)
    q.processAllAvailable()
    q.stop()
    final = {}
    for r in spark.sql(f"SELECT * FROM {name}").collect():
        final[r.row] = list(r.counts)  # update mode: last per row wins
    return final


def test_stream_equals_batch_any_order(spark):
    batches = [
        [("a",), ("b",), ("a",)],
        [("c",)] * 5,
        [("a",), ("d",), ("e",), ("b",)],
    ]
    for order, name in [((0, 1, 2), "cmsf"), ((2, 0, 1), "cmsr")]:
        tmp = tempfile.mkdtemp(prefix="cms_stream_")
        try:
            for i in order:
                spark.createDataFrame(batches[i], "v string").coalesce(
                    1
                ).write.mode("append").parquet(tmp)
            final = _stream_final(spark, tmp, name)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        all_rows = [(v,) for b in batches for v in [r[0] for r in b]]
        batch = cms_table(
            spark.createDataFrame(all_rows, "v string"), "v", W, D
        ).collect()
        expect = {r: [0] * W for r in range(D)}
        for r in batch:
            expect[r.row][r.b] = r.n
        assert final == expect
