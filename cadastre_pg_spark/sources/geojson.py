"""GeoJSON sink (reference S9: cadastre-pg/src/export/geojson.rs:14-97,
streaming FeatureCollection writer with CRS header).

Spark-first: each feature row becomes one GeoJSON Feature via
`to_json` over a struct built with JVM expressions (no Python); the
writer emits newline-delimited GeoJSON features (the distributed-
friendly framing) or a single FeatureCollection via a driver-side
header/footer around the part files.
"""

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def polygon_geojson_col(xs="xs", ys="ys", ring_offsets="ring_offsets") -> Column:
    """Flat ring arrays -> GeoJSON Polygon coordinates, JVM-side:
    transform over ring index slices."""
    n_rings = F.size(ring_offsets) - F.lit(1)
    ring_idx = F.sequence(F.lit(0), n_rings - F.lit(1))
    coords = F.transform(
        ring_idx,
        lambda i: F.zip_with(
            F.slice(
                F.col(xs),
                F.col(ring_offsets)[i] + 1,
                F.col(ring_offsets)[i + 1] - F.col(ring_offsets)[i],
            ),
            F.slice(
                F.col(ys),
                F.col(ring_offsets)[i] + 1,
                F.col(ring_offsets)[i + 1] - F.col(ring_offsets)[i],
            ),
            lambda x, y: F.array(x, y),
        ),
    )
    return F.to_json(
        F.struct(
            F.lit("Polygon").alias("type"),
            coords.alias("coordinates"),
        )
    )


def feature_collection_header(srid: int = 4326) -> str:
    """CRS header matching the reference's framing (geojson.rs:14-43)."""
    return json.dumps(
        {
            "type": "FeatureCollection",
            "crs": {
                "type": "name",
                "properties": {"name": f"urn:ogc:def:crs:EPSG::{srid}"},
            },
        }
    )[:-1] + ', "features": ['


def write_geojson_features(
    df: DataFrame,
    out_dir: str,
    id_col: str = "parcel_id",
    properties: list[str] | None = None,
) -> str:
    """Write newline-delimited GeoJSON features (one file per partition,
    Spark text writer owns escaping/commit)."""
    props = properties or []
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.col(id_col).cast("string").alias("id"),
            F.from_json(
                polygon_geojson_col(), "type string, coordinates array<array<array<double>>>"
            ).alias("geometry"),
            F.struct(*[F.col(p) for p in props]).alias("properties"),
        )
    )
    df.select(feature.alias("value")).write.mode("overwrite").text(out_dir)
    return out_dir


def collect_feature_collection(
    df: DataFrame, id_col: str = "parcel_id", properties: list[str] | None = None,
    srid: int = 4326,
) -> str:
    """Small-result convenience: assemble one FeatureCollection string
    (driver-side concat of the distributed per-feature JSON)."""
    props = properties or []
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.col(id_col).cast("string").alias("id"),
            F.from_json(
                polygon_geojson_col(), "type string, coordinates array<array<array<double>>>"
            ).alias("geometry"),
            F.struct(*[F.col(p) for p in props]).alias("properties"),
        )
    )
    rows = [r[0] for r in df.select(feature).collect()]
    return feature_collection_header(srid) + ",".join(rows) + "]}"
