"""G5 line assembly + S9 multi-type GeoJSON export.

Mirrors the reference semantics: one PAR arc -> LineString, several ->
MultiLineString, parts with < 2 coords dropped, empty feature
quarantined (edigeo/src/repair/mod.rs:123-153); the GeoJSON writer
covers all geometry types the reference's geozero path emits
(cadastre-pg/src/export/geojson.rs:14-97)."""

import json

from pyspark.sql import functions as F

from cadastre_pg_spark.operators.assembly import assemble_lines
from cadastre_pg_spark.sources.geojson import (
    feature_geojson_col,
    geometry_geojson_col,
)

ARC_ROWS = [
    ("road1", 1, [0.0, 1.0, 2.0], [0.0, 0.5, 0.0]),          # single arc
    ("road2", 1, [0.0, 1.0], [0.0, 0.0]),                     # two arcs
    ("road2", 2, [2.0, 3.0, 4.0], [1.0, 1.0, 1.0]),
    ("road3", 1, [5.0], [5.0]),                               # degenerate part
    ("road3", 2, [6.0, 7.0], [6.0, 7.0]),
    ("road4", 1, [9.0], [9.0]),                               # nothing usable
]


def _arcs(spark):
    return spark.createDataFrame(
        ARC_ROWS, "feature_id string, arc_id long, xs array<double>, ys array<double>"
    )


def test_assemble_lines_reference_semantics(spark):
    rows = {r.feature_id: r for r in assemble_lines(_arcs(spark)).collect()}
    assert rows["road1"].geom_type == "LineString"
    assert rows["road1"].xs == [0.0, 1.0, 2.0]
    assert rows["road1"].part_offsets == [0, 3]
    assert rows["road2"].geom_type == "MultiLineString"
    assert rows["road2"].n_parts == 2
    assert rows["road2"].part_offsets == [0, 2, 5]
    assert rows["road2"].xs == [0.0, 1.0, 2.0, 3.0, 4.0]
    # the 1-coordinate part is dropped, the rest survives (ref: filter
    # coords.len() >= 2)
    assert rows["road3"].geom_type == "LineString"
    assert rows["road3"].xs == [6.0, 7.0]
    # no usable part -> quarantined, not crashed
    assert rows["road4"].status == "error:empty"
    assert rows["road4"].geom_type is None


def test_geojson_all_types_roundtrip(spark):
    rows = [
        ("p1", "Point", [2.0], [48.0], [0, 1], None),
        ("mp1", "MultiPoint", [1.0, 2.0], [3.0, 4.0], [0, 2], None),
        ("l1", "LineString", [0.0, 1.0], [0.0, 1.0], [0, 2], None),
        ("ml1", "MultiLineString", [0.0, 1.0, 5.0, 6.0], [0.0, 1.0, 5.0, 6.0], [0, 2, 4], None),
        ("pg1", "Polygon", [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0], [0, 5], None),
        (
            "mpg1",
            "MultiPolygon",
            [0.0, 1.0, 0.0, 0.0, 5.0, 6.0, 5.0, 5.0],
            [0.0, 0.0, 1.0, 0.0, 5.0, 5.0, 6.0, 5.0],
            [0, 4, 8],
            [0, 1, 2],
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "feature_id string, geom_type string, xs array<double>, ys array<double>, "
        "ring_offsets array<int>, poly_offsets array<int>",
    )
    feats = df.select(
        feature_geojson_col(
            "feature_id", [], geometry_geojson_col(poly_offsets="poly_offsets")
        ).alias("j")
    ).collect()
    parsed = {json.loads(r.j)["id"]: json.loads(r.j) for r in feats}
    assert all(p["type"] == "Feature" for p in parsed.values())
    g = {k: p["geometry"] for k, p in parsed.items()}
    assert g["p1"] == {"type": "Point", "coordinates": [2.0, 48.0]}
    assert g["mp1"]["coordinates"] == [[1.0, 3.0], [2.0, 4.0]]
    assert g["l1"]["coordinates"] == [[0.0, 0.0], [1.0, 1.0]]
    assert g["ml1"]["coordinates"] == [[[0.0, 0.0], [1.0, 1.0]], [[5.0, 5.0], [6.0, 6.0]]]
    assert g["pg1"]["coordinates"][0][0] == [0.0, 0.0]
    assert len(g["mpg1"]["coordinates"]) == 2
    assert g["mpg1"]["coordinates"][1][0][0] == [5.0, 5.0]


def test_geometry_collection_roundtrip(spark):
    """The 7th type: a GeometryCollection feature whose members are
    pre-rendered geometry strings (composition — members mix types and
    nesting depths). Matches the reference's geometry enum coverage
    even though the reference never constructs one itself."""
    from cadastre_pg_spark.sources.geojson import geometry_collection_col

    # render two member geometries on child rows, collect into an array
    members = spark.createDataFrame(
        [
            ("gc1", "Point", [2.0], [48.0], [0, 1]),
            ("gc1", "LineString", [0.0, 1.0], [0.0, 1.0], [0, 2]),
        ],
        "feature_id string, geom_type string, xs array<double>, ys array<double>, "
        "ring_offsets array<int>",
    ).select(
        "feature_id", "geom_type", geometry_geojson_col().alias("gj")
    )
    coll = (
        members.groupBy("feature_id")
        .agg(F.sort_array(F.collect_list("gj")).alias("members"))
        .withColumn("geom_type", F.lit("GeometryCollection"))
        # unused-branch columns still need to ANALYZE (the when-chain
        # never evaluates them for collection rows)
        .withColumn("xs", F.array().cast("array<double>"))
        .withColumn("ys", F.array().cast("array<double>"))
        .withColumn("ring_offsets", F.array(F.lit(0)).cast("array<int>"))
    )
    feats = coll.select(
        feature_geojson_col(
            "feature_id", [], geometry_geojson_col(collection="members")
        ).alias("j")
    ).collect()
    parsed = json.loads(feats[0].j)
    g = parsed["geometry"]
    assert g["type"] == "GeometryCollection"
    types = sorted(m["type"] for m in g["geometries"])
    assert types == ["LineString", "Point"]
    pt = next(m for m in g["geometries"] if m["type"] == "Point")
    assert pt["coordinates"] == [2.0, 48.0]
    # direct column use on a members-only table
    direct = coll.select(geometry_collection_col("members").alias("gj")).collect()
    assert json.loads(direct[0].gj)["type"] == "GeometryCollection"


def test_assembled_lines_export_end_to_end(spark, tmp_path):
    from cadastre_pg_spark.sources.geojson import write_geojson_mixed

    lines = assemble_lines(_arcs(spark)).filter(F.col("status") == "ok")
    out = write_geojson_mixed(
        lines,
        str(tmp_path / "lines"),
        properties=["n_parts"],
        offsets="part_offsets",
    )
    import glob

    feats = []
    for f in glob.glob(out + "/part-*"):
        with open(f) as fh:
            feats += [json.loads(line) for line in fh if line.strip()]
    assert len(feats) == 3
    byid = {f["id"]: f for f in feats}
    assert byid["road2"]["geometry"]["type"] == "MultiLineString"
    assert byid["road2"]["properties"]["n_parts"] == 2
    assert byid["road1"]["geometry"]["coordinates"][0] == [0.0, 0.0]
