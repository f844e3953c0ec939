"""ANN recall vs the exact brute-force top-k."""

import pyspark.sql.functions as F

from cadastre_pg_spark.operators.similarity import (
    ann_topk,
    ivf_topk,
    ivf_topk_sampled,
    topk_cosine,
)
from conftest import SF_UNIT


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ann_recall(spark):
    emb = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _pairs(topk_cosine(emb, queries, k=5))
    approx = _pairs(ann_topk(emb, queries, k=5))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"hyperplane ANN recall too low: {recall}"


def test_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _pairs(topk_cosine(emb, queries, k=5))
    approx = _pairs(ivf_topk(emb, queries, k=5, n_lists=8, n_probe=4))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF ANN recall too low: {recall}"


def test_ivf_sampled_recall_and_determinism(spark):
    """The sampled-quantizer IVF (the oracle-able driver variant) must
    hold comparable recall to the k-means one and be run-to-run
    bit-deterministic (its whole point)."""
    emb = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _pairs(topk_cosine(emb, queries, k=5))
    out = ivf_topk_sampled(emb, queries, k=5, n_lists=8, n_probe=4)
    got = sorted((r.query_id, r.neighbor_id, r.cosine, r.rank) for r in out.collect())
    recall = len(exact & {(q, n) for q, n, _, _ in got}) / len(exact)
    assert recall >= 0.6, f"sampled IVF recall too low: {recall}"
    again = ivf_topk_sampled(emb, queries, k=5, n_lists=8, n_probe=4)
    assert got == sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rank) for r in again.collect()
    )


def test_label_centroids_match_numpy(spark):
    import numpy as np

    from cadastre_pg_spark.operators.similarity import label_centroids

    embs = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet")
    got = {
        (r.label, r.pos): (r.n_vecs, r.centroid)
        for r in label_centroids(embs).collect()
    }
    rows = embs.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    for label, vecs in by_label.items():
        m = np.mean(np.stack(vecs), axis=0)
        for pos in range(len(m)):
            n, c = got[(label, pos)]
            assert n == len(vecs)
            # decimal-summed mean vs float64 mean: agree well inside 6dp
            assert abs(c - m[pos]) < 1e-6, (label, pos, c, m[pos])
    assert len(got) == len(by_label) * 64
