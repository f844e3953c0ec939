"""Round-4 fifth-batch operators: spearman_corr and
embedding_contamination. Oracle parity is covered by the driver-
contract sweep (match at sf0.01 and sf0.1); these are the behavioral/
known-value/kernel-equality tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.similarity import embedding_contamination
from cadastre_pg_spark.operators.stats import spearman_corr


# ------------------------------------------------------ spearman_corr ----


def _spearman_ref(x, y):
    """Single-process reference: Pearson on average ranks."""

    def avg_ranks(v):
        v = np.asarray(v, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=np.float64)
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return ranks

    rx, ry = avg_ranks(x), avg_ranks(y)
    rx -= rx.mean()
    ry -= ry.mean()
    den = np.sqrt((rx * rx).sum() * (ry * ry).sum())
    return float((rx * ry).sum() / den) if den > 0 else None


def test_spearman_monotone_is_one(spark):
    rows = [("a", float(i), float(i * i * i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = spearman_corr(df, "grp", "x", "y").collect()
    assert len(out) == 1
    assert out[0]["n"] == 20
    assert out[0]["corr"] == 1.0


def test_spearman_reversed_is_minus_one(spark):
    rows = [("a", float(i), float(100 - i)) for i in range(1, 16)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = spearman_corr(df, "grp", "x", "y").collect()
    assert out[0]["corr"] == -1.0


def test_spearman_matches_reference_with_ties(spark):
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 8, 60).astype(float)  # heavy ties
    ys = (xs * 2 + rng.randint(0, 5, 60)).astype(float)
    rows = [("g", float(a), float(b)) for a, b in zip(xs, ys)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = spearman_corr(df, "grp", "x", "y").collect()[0]
    ref = _spearman_ref(xs, ys)
    assert out["corr"] == pytest.approx(ref, abs=2e-6)


def test_spearman_constant_side_is_null(spark):
    rows = [("a", 1.0, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = spearman_corr(df, "grp", "x", "y").collect()
    assert out[0]["corr"] is None


def test_spearman_multigroup_independent(spark):
    rows = [("up", float(i), float(i)) for i in range(10)] + [
        ("dn", float(i), float(-i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r["grp"]: r["corr"] for r in spearman_corr(df, "grp", "x", "y").collect()}
    assert out == {"up": 1.0, "dn": -1.0}


# -------------------------------------------- embedding_contamination ----


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_contamination_exact_match_flags(spark):
    ev = _emb_df(spark, [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])])
    tr = _emb_df(
        spark,
        [
            (1, [2.0, 0.0, 0.0]),  # colinear with eval 100 -> cos 1.0
            (2, [0.0, 0.0, 5.0]),  # orthogonal to both -> cos 0.0
            (3, [1.0, 1.0, 0.0]),  # cos ~0.707107 to both, tie -> 100
        ],
    )
    out = {
        r.vec_id: r.asDict()
        for r in embedding_contamination(tr, ev, threshold=0.9).collect()
    }
    assert out[1]["max_cosine"] == 1.0 and out[1]["contaminated"]
    assert out[1]["nearest_eval_id"] == 100
    assert out[2]["max_cosine"] == 0.0 and not out[2]["contaminated"]
    assert out[3]["max_cosine"] == pytest.approx(0.707107)
    assert out[3]["nearest_eval_id"] == 100  # tie breaks to min eval id
    assert not out[3]["contaminated"]


def test_contamination_distributed_equals_kernel(spark):
    from tests.conftest import SF_UNIT

    emb = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet")
    ev = emb.filter(F.col("vec_id") % 25 == 7)
    tr = emb.filter(F.col("vec_id") % 25 != 7)
    got = {
        r.vec_id: (r.max_cosine, r.nearest_eval_id, r.contaminated)
        for r in embedding_contamination(tr, ev, threshold=0.25).collect()
    }
    pdf = emb.toPandas().sort_values("vec_id")
    evp = pdf[pdf.vec_id % 25 == 7]
    trp = pdf[pdf.vec_id % 25 != 7]
    Q = np.stack(evp.embedding.values).astype(np.float64)
    Q /= np.linalg.norm(Q, axis=1)[:, None]
    E = np.stack(trp.embedding.values).astype(np.float64)
    E /= np.linalg.norm(E, axis=1)[:, None]
    cos = np.round(E @ Q.T, 6)
    mx = cos.max(axis=1)
    qids = evp.vec_id.to_numpy(np.int64)
    near = qids[(cos == mx[:, None]).argmax(axis=1)]
    assert len(got) == len(trp)
    for vid, m, nid in zip(trp.vec_id.to_numpy(np.int64), mx, near):
        gm, gn, gc = got[vid]
        assert gm == m
        assert gn == nid
        assert gc == (m >= 0.25)


def test_contamination_empty_eval_set(spark):
    ev = _emb_df(spark, []).limit(0)
    tr = _emb_df(spark, [(1, [1.0, 0.0])])
    out = embedding_contamination(tr, ev)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id",
        "max_cosine",
        "nearest_eval_id",
        "contaminated",
    ]
