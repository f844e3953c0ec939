"""Sharded training-corpus sink: deterministic order materialization,
manifest census, loader-side integrity check."""

import pyspark.sql.functions as F
import pytest

from cadastre_pg_spark.operators.corpus import global_shuffle
from cadastre_pg_spark.sources.shards import (
    read_shard,
    verify_shards,
    write_shards,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, " ".join(f"w{i}_{k}" for k in range(1 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )


def test_write_shards_roundtrip_in_training_order(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_shards(corpus, path, n_shards=4).collect()
    assert [m.shard for m in manifest] == [0, 1, 2, 3]
    assert sum(m.n_docs for m in manifest) == 200
    assert sum(m.n_tokens for m in manifest) == sum(1 + i % 7 for i in range(200))
    # each shard reads back exactly in the plan's (h, doc_id) order
    plan = global_shuffle(corpus, n_shards=4).collect()
    want = {
        s: [
            r.doc_id
            for r in sorted((p for p in plan if p.shard == s), key=lambda p: p.pos)
        ]
        for s in range(4)
    }
    for s in range(4):
        got = [r.doc_id for r in read_shard(spark, path, s).collect()]
        assert got == want[s]
        assert len(got) == [m.n_docs for m in manifest if m.shard == s][0]


def test_verify_shards_detects_truncation(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    write_shards(corpus, path, n_shards=4)
    ok = verify_shards(spark, path)
    assert all(r.intact for r in ok.collect())
    # truncate shard 2: rewrite its directory minus its last row
    # (collect first — a lazy limit() would read the files mid-overwrite)
    rows = spark.read.parquet(f"{path}/shard=2").orderBy("pos").collect()
    truncated = spark.createDataFrame(rows[:-1], schema="doc_id long, text string, pos long")
    truncated.write.mode("overwrite").parquet(f"{path}/shard=2")
    bad = {r.shard: r.intact for r in verify_shards(spark, path).collect()}
    assert bad[2] is False
    assert all(v for s, v in bad.items() if s != 2)


# ------------------------------------------------------ JSONL sink ----


def _jsonl_docs(spark, n=60):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string"),
                 F.lit(" body text "),
                 F.col("id").cast("string")).alias("text"),
    )


def test_jsonl_roundtrip_matches_parquet_shards(spark, tmp_path):
    from cadastre_pg_spark.sources.jsonl import read_jsonl, write_jsonl
    from cadastre_pg_spark.sources.shards import write_shards

    docs = _jsonl_docs(spark)
    jdir, pdir = str(tmp_path / "jsonl"), str(tmp_path / "parquet")
    mj = write_jsonl(docs, jdir, n_shards=4).collect()
    mp = write_shards(docs, pdir, n_shards=4).collect()
    # identical routing + census across both formats
    assert sorted(map(tuple, mj)) == sorted(map(tuple, mp))
    back = read_jsonl(spark, jdir)
    assert back.count() == 60
    got = {r.doc_id: r.text for r in back.collect()}
    exp = {r.doc_id: r.text for r in docs.collect()}
    assert got == exp


def test_jsonl_shard_training_order_and_verify(spark, tmp_path):
    from cadastre_pg_spark.sources.jsonl import (
        read_jsonl_shard,
        verify_jsonl,
        write_jsonl,
    )

    docs = _jsonl_docs(spark)
    path = str(tmp_path / "jz")
    write_jsonl(docs, path, n_shards=4)
    v = verify_jsonl(spark, path).collect()
    assert len(v) == 4 and all(r.intact for r in v)
    s0 = read_jsonl_shard(spark, path, 0).collect()
    assert [r.pos for r in s0] == sorted(r.pos for r in s0)


def test_jsonl_verify_detects_truncation(spark, tmp_path):
    import glob
    import os

    from cadastre_pg_spark.sources.jsonl import verify_jsonl, write_jsonl

    docs = _jsonl_docs(spark)
    path = str(tmp_path / "jt")
    write_jsonl(docs, path, n_shards=4)
    victim = glob.glob(os.path.join(path, "shard=2", "*.json.gz"))[0]
    os.remove(victim)
    v = {r.shard: r.intact for r in verify_jsonl(spark, path).collect()}
    assert v[2] in (False, None)  # truncation surfaces, never silent
    assert all(v[s] for s in (0, 1, 3))
