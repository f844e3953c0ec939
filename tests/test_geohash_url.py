"""Geohash encoding and canonical-URL dedup."""

import duckdb
from pyspark.sql import functions as F

from cadastre_pg_spark.functions.geohash import geohash_col, geohash_sql
from cadastre_pg_spark.operators.corpus import canonical_url, url_dedup


def _gh(spark, pts, precision=8):
    df = spark.createDataFrame(pts, "lon double, lat double")
    return [
        r.gh
        for r in df.select(
            geohash_col(F.col("lon"), F.col("lat"), precision).alias("gh")
        ).collect()
    ]


def test_known_geohash_vectors(spark):
    # canonical reference points (classic geohash examples)
    got = _gh(spark, [(10.40744, 57.64911), (2.3488, 48.8534), (-5.6, 42.6)])
    assert got == ["u4pruydq", "u09tvmqr", "ezs42e44"]


def test_clamp_at_domain_edge(spark):
    hi = _gh(spark, [(180.0, 90.0)])[0]
    inside = _gh(spark, [(179.999999, 89.999999)])[0]
    assert hi == inside  # clamped into the last cell, never overflowing


def test_prefix_locality(spark):
    a, b = _gh(spark, [(2.3488, 48.8534), (2.3489, 48.8535)])
    assert a[:6] == b[:6]


def test_sql_twin_bitwise(spark):
    pts = [(-4.9 + 0.37 * i, 41.3 + 0.21 * i) for i in range(40)]
    eng = _gh(spark, pts)
    con = duckdb.connect()
    sql = geohash_sql("lon", "lat")
    con.execute("CREATE TABLE p(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    ora = [r[0] for r in con.execute(f"SELECT {sql} FROM p").fetchall()]
    assert eng == ora


def test_canonical_url_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "https://A.Example.fr/p/1?q=2"),
            (2, "https://a.example.fr/p/1#frag"),
            (3, "https://a.example.fr/p/1///"),
            (4, "https://a.example.fr/p/2"),
        ],
        "page_id long, url string",
    )
    out = df.select(canonical_url(F.col("url")).alias("c")).collect()
    assert [r.c for r in out[:3]] == ["https://a.example.fr/p/1"] * 3
    rows = {r.canon: r for r in url_dedup(df).collect()}
    assert rows["https://a.example.fr/p/1"].survivor_id == 1
    assert rows["https://a.example.fr/p/1"].n_variants == 3
    assert rows["https://a.example.fr/p/2"].n_variants == 1
