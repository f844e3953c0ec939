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
    load_preset,
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


# a reference-shaped preset (config/presets/full.json structure): the
# top level maps feature_type -> table config; 'id' targets are
# reserved and must be DROPPED by the loader (cli.rs:772), not errored
PRESET = {
    "PARCELLE_id": {
        "table": "parcelles",
        "hash_geom": True,
        "fields": [
            {"source": "IDU", "target": "id", "prefix_dep": True},
            {"source": "IDU", "target": "idu", "prefix_dep": True},
            {"source": "SUPF", "target": "contenance", "data_type": "integer"},
        ],
    },
    "BATIMENT_id": {
        "table": "batiments",
        "fields": [
            {"source": "TEX", "target": "tex"},
            {"source": "DUR", "target": "dur", "data_type": "integer"},
        ],
    },
    # second type into the SAME table with the same surviving layout
    # (id dropped on both) -> merged, hash_geom OR-ed
    "TSURF_id": {
        "table": "batiments",
        "hash_geom": True,
        "fields": [
            {"source": "id_alias", "target": "id"},
            {"source": "TEX", "target": "tex"},
            {"source": "DUR", "target": "dur", "data_type": "integer"},
        ],
    },
}


def test_load_preset_reference_shape(spark, tmp_path):
    path = tmp_path / "preset.json"
    path.write_text(json.dumps(PRESET))
    for src in (PRESET, str(path)):
        specs = {s.table: s for s in load_preset(src)}
        assert set(specs) == {"parcelles", "batiments"}
        p = specs["parcelles"]
        # reserved 'id' target dropped; _ID-suffix tolerance alias added
        assert [f.target for f in p.fields] == ["idu", "contenance"]
        assert p.feature_types == ["PARCELLE_ID", "PARCELLE"]
        assert p.hash_geom is True
        b = specs["batiments"]
        assert b.hash_geom is True  # OR of False (BATIMENT) and True (TSURF)
        assert set(b.feature_types) == {"BATIMENT_ID", "BATIMENT", "TSURF_ID", "TSURF"}


def test_load_preset_routes_features(spark):
    rows = [
        ("0001", "parcelle", {"IDU": "i1", "SUPF": "+10."}, "38"),
        ("0002", "PARCELLE_ID", {"IDU": "i2", "SUPF": "07"}, "38"),
        ("0003", "TSURF", {"TEX": "t", "DUR": "3"}, "38"),
    ]
    features = spark.createDataFrame(
        rows, "id string, feature_type string, properties map<string,string>, dep string"
    )
    tables, skipped = load_preset(PRESET), None
    out, skipped = route_features(features, tables)
    parc = {r.idu: r for r in out["parcelles"].collect()}
    assert set(parc) == {"38i1", "38i2"}  # suffixless type matched too
    assert parc["38i1"].contenance == 10 and parc["38i2"].contenance == 7
    assert out["batiments"].count() == 1
    assert skipped.count() == 0


def test_load_preset_conflicting_layout_raises():
    bad = {
        "A_id": {"table": "t", "fields": [{"source": "x", "target": "a"}]},
        "B_id": {
            "table": "t",
            "fields": [{"source": "x", "target": "a", "data_type": "integer"}],
        },
    }
    with pytest.raises(ConfigError, match="conflicting"):
        load_preset(bad)
    with pytest.raises(ConfigError, match="table"):
        load_preset({"A_id": {"fields": []}})
    with pytest.raises(ConfigError, match="source\\+target"):
        load_preset({"A_id": {"table": "t", "fields": [{"source": "x"}]}})


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


def test_multimodal_decode_injection(spark):
    """A caller-supplied codec drops into the tested batch shape: the
    injected fn sees raw payload bytes and its output lands in the same
    (media_id, features) schema — including under strict mode (the
    stub guard only applies when no codec is injected)."""
    media = generate_media(spark, 12, partitions=2).filter(F.col("kind") == "image")

    def my_decode(payload: bytes, dim: int):
        return [float(len(payload)), float(payload[0])] + [0.0] * (dim - 2)

    rows = image_features(media, strict=True, decode_fn=my_decode).collect()
    assert len(rows) == 4
    src = {r.media_id: r for r in media.collect()}
    for r in rows:
        p = bytes(src[r.media_id].payload)
        assert r.features[0] == float(len(p)) and r.features[1] == float(p[0])
        assert len(r.features) == 16

    def frame_decode(payload: bytes, frame_ms: int):
        return [float(frame_ms), float(len(payload))]

    fr = frame_sample(
        generate_media(spark, 12, partitions=2),
        every_ms=1500,
        strict=True,
        decode_fn=frame_decode,
    ).collect()
    assert fr and all(r.features == [float(r.frame_ms), r.features[1]] for r in fr)
