"""Config-driven projection, GeoJSON sink, multimodal plumbing."""

import json

import pyspark.sql.functions as F
import pytest

from cadastre_pg_spark.operators.multimodal import (
    attach_media_metadata,
    frame_sample,
    generate_media,
    image_features,
)
from cadastre_pg_spark.sources.config_projection import (
    ConfigError,
    FieldSpec,
    TableSpec,
    route_features,
    validate_specs,
)
from cadastre_pg_spark.sources.geojson import collect_feature_collection


@pytest.fixture
def features(spark):
    rows = [
        (f"{i:04d}", "PARCELLE_ID" if i % 2 == 0 else "batiment_id",
         {"IDU": f"idu{i}", "CONTENANCE": "+1895." if i % 3 == 0 else "042",
          "TEX": f"label {i}"},
         "38")
        for i in range(20)
    ] + [("9999", "UNKNOWN_TYPE", {"IDU": "x"}, "38")]
    return spark.createDataFrame(
        rows, "id string, feature_type string, properties map<string,string>, dep string"
    )


SPECS = [
    TableSpec(
        table="parcelles",
        feature_types=["PARCELLE_id"],
        fields=[
            FieldSpec("IDU", "idu", "text", prefix_dep=True),
            FieldSpec("CONTENANCE", "contenance", "integer"),
            FieldSpec("TEX", "tex", "text"),
        ],
    ),
    TableSpec(
        table="batiments",
        feature_types=["BATIMENT_id"],
        fields=[FieldSpec("TEX", "tex", "text")],
    ),
]


def test_route_and_project(spark, features):
    tables, skipped = route_features(features, SPECS)
    parc = tables["parcelles"].collect()
    assert len(parc) == 10
    r0 = next(r for r in parc if r.id == "380000")
    assert r0.idu == "38idu0"  # dep-prefixed (cli.rs:946-948)
    assert r0.departement == "38"
    assert r0.contenance == 1895  # lenient '+1895.' cast
    r2 = next(r for r in parc if r.id == "380002")
    assert r2.contenance == 42  # '042' -> 42
    assert tables["batiments"].count() == 10
    sk = skipped.collect()
    assert len(sk) == 1 and sk[0].feature_type == "UNKNOWN_TYPE"
    assert sk[0].n_skipped == 1


def test_reserved_and_conflicts():
    with pytest.raises(ConfigError):
        validate_specs(
            [TableSpec("t", ["X"], [FieldSpec("a", "geometry", "text")])]
        )
    with pytest.raises(ConfigError):
        validate_specs(
            [
                TableSpec("t", ["X"], [FieldSpec("a", "b", "text")]),
                TableSpec("t", ["Y"], [FieldSpec("a", "b", "integer")]),
            ]
        )
    with pytest.raises(ConfigError):
        validate_specs([TableSpec("t", ["X"], [FieldSpec("a", "b", "blob")])])


def test_geojson_sink(spark):
    from cadastre_pg_spark.data.parcels import generate_parcels

    parcels = generate_parcels(spark, 5, partitions=1)
    fc = collect_feature_collection(parcels, properties=["dep", "contenance"])
    doc = json.loads(fc)
    assert doc["type"] == "FeatureCollection"
    assert doc["crs"]["properties"]["name"].endswith("4326")
    assert len(doc["features"]) == 5
    f0 = doc["features"][0]
    assert f0["geometry"]["type"] == "Polygon"
    ring = f0["geometry"]["coordinates"][0]
    assert ring[0] == ring[-1]  # closed
    assert "dep" in f0["properties"]


def test_multimodal_plumbing(spark):
    media = generate_media(spark, 60, partitions=4)
    meta = attach_media_metadata(media)
    assert meta.filter(F.col("n_bytes") <= 0).count() == 0
    feats = image_features(media.filter(F.col("kind") == "image"))
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.features) == 16 for r in rows)
    # deterministic: same payload -> same features
    again = {r.media_id: r.features for r in image_features(
        media.filter(F.col("kind") == "image")).collect()}
    assert all(again[r.media_id] == r.features for r in rows)
    frames = frame_sample(media, every_ms=1000)
    fr = frames.collect()
    assert len(fr) > 20  # multiple frames per video
    assert all(len(r.features) == 8 for r in fr)


def test_multimodal_strict_raises(spark):
    media = generate_media(spark, 6, partitions=1)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        image_features(media, strict=True).collect()
