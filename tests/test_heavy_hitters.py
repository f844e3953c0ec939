"""heavy_hitters: exact-output guarantee under real Misra-Gries
pruning (vocab >> k), boundary counts, and the loud candidate guard."""

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.sketches import heavy_hitters


def _corpus(spark, texts, parts=8):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return df.repartition(parts).select(
        F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )


def _brute(spark, texts, min_count):
    toks = _corpus(spark, texts)
    rows = (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .count()
        .filter(F.col("count") >= min_count)
        .collect()
    )
    return {(r.token, r["count"]) for r in rows}


def _zipfish_texts():
    """Vocab of ~2000 tokens, a handful genuinely heavy — forces the
    per-partition summaries to prune (k well under vocab size)."""
    texts = []
    # heavy tokens: hot0 x 600, hot1 x 400, hot2 x 250, hot3 x 120
    heavy = [("hot0", 600), ("hot1", 400), ("hot2", 250), ("hot3", 120)]
    stream = []
    for tok, n in heavy:
        stream.extend([tok] * n)
    # long singleton/doubleton tail interleaved deterministically
    for i in range(2000):
        stream.append(f"tail{i}")
        if i % 3 == 0:
            stream.append(f"tail{i}")
    # shuffle deterministically by striding so heavies spread across docs
    stride = 7
    stream = [stream[(i * stride) % len(stream)] for i in range(len(stream))]
    for i in range(0, len(stream), 25):
        texts.append(" ".join(stream[i : i + 25]))
    return texts


def test_exact_vs_brute_under_pruning(spark):
    texts = _zipfish_texts()
    toks = _corpus(spark, texts)
    # N ~ 4000+ tokens, min_count=100 -> k ~ 40+1 << vocab ~2000:
    # every partition summary REALLY prunes
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(toks, "toks", min_count=100).collect()
    }
    want = _brute(spark, texts, 100)
    assert got == want
    assert {t for t, _ in got} >= {"hot0", "hot1", "hot2"}


def test_boundary_count_included(spark):
    texts = ["a b", "a c", "a d"]  # a appears exactly 3x
    toks = _corpus(spark, texts, parts=2)
    got = {(r.token, r.cnt) for r in heavy_hitters(toks, "toks", 3).collect()}
    assert got == {("a", 3)}


def test_empty_result_and_empty_input(spark):
    toks = _corpus(spark, ["x y z"], parts=2)
    assert heavy_hitters(toks, "toks", 10).count() == 0
    empty = spark.createDataFrame([], "toks array<string>")
    assert heavy_hitters(empty, "toks", 1).count() == 0


def test_explicit_small_k_still_exact_when_guarantee_holds(spark):
    # k chosen by the operator from measured N; passing a LARGER k than
    # needed must not change the exact output
    texts = _zipfish_texts()
    toks = _corpus(spark, texts)
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(toks, "toks", 100, k=500).collect()
    }
    assert got == _brute(spark, texts, 100)


def test_loud_candidate_budget_guard(spark):
    toks = _corpus(spark, ["a b c"] * 50, parts=8)
    with pytest.raises(RuntimeError, match="candidate budget exceeded"):
        heavy_hitters(toks, "toks", min_count=1, max_candidates=10)
