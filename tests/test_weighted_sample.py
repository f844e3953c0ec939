"""weighted_sample (priority sampling) goldens."""

import pytest

from cadastre_pg_spark.operators.corpus import weighted_sample


def _docs(spark, rows, schema="doc_id long, lang string, w double"):
    return spark.createDataFrame(rows, schema)


def test_heavy_weight_always_in(spark):
    # one doc a billion times heavier than 50 others: priority u/1e9
    # beats every u/1 (u in (0,1]), so it must be sampled
    rows = [(0, "en", 1e9)] + [(i, "en", 1.0) for i in range(1, 51)]
    out = weighted_sample(_docs(spark, rows), k=5, weight_col="w")
    ids = {r.doc_id for r in out.collect()}
    assert 0 in ids and len(ids) == 5


def test_deterministic_and_ranked(spark):
    rows = [(i, "en", float(1 + i % 7)) for i in range(40)]
    a = [(r.doc_id, r.rank) for r in
         weighted_sample(_docs(spark, rows), k=8, weight_col="w")
         .orderBy("rank").collect()]
    b = [(r.doc_id, r.rank) for r in
         weighted_sample(_docs(spark, rows), k=8, weight_col="w")
         .orderBy("rank").collect()]
    assert a == b and [r[1] for r in a] == list(range(1, 9))


def test_grouped_k_per_group(spark):
    rows = [(i, "en" if i % 2 else "fr", 1.0 + i) for i in range(30)]
    out = weighted_sample(
        _docs(spark, rows), k=4, weight_col="w", group_col="lang"
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r.rank)
    assert sorted(by["en"]) == [1, 2, 3, 4]
    assert sorted(by["fr"]) == [1, 2, 3, 4]


def test_nonpositive_weight_raises(spark):
    rows = [(1, "en", 0.0), (2, "en", 1.0)]
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_sample(_docs(spark, rows), k=1, weight_col="w").collect()


def test_small_population_returns_all(spark):
    rows = [(1, "en", 2.0), (2, "en", 3.0)]
    out = weighted_sample(_docs(spark, rows), k=10, weight_col="w").collect()
    assert {r.doc_id for r in out} == {1, 2}
