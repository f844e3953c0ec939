"""Config-driven projection & table routing — the reference's schema
system re-expressed as generated DataFrame plans.

Reference: JSON config maps feature_type -> {table, hash_geom,
fields: [{source, target, data_type, prefix_dep}]}
(cadastre-pg/src/config/mod.rs:10-46, presets config/presets/full.json);
projection applied at cli.rs:984-1021, dep prefixing cli.rs:946-948,
lenient numeric cast cli.rs:842-861, type routing cli.rs:749-802 with
unknown types counted + skipped (cli.rs:437-441).

Input rows carry `feature_type` and a `properties MAP<STRING,STRING>`
column (the Feature shape, edigeo/src/types.rs:29-41). Everything is
generated `select` expressions — whole-stage codegen, no UDFs.
"""

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESERVED = {
    "row_id",
    "id",
    "departement",
    "geometry",
    "valid_from",
    "valid_to",
    "geometry_hash",
    "created_at",
    "updated_at",
}

_TYPES = {
    "text": "string",
    "varchar": "string",
    "integer": "long",
    "int": "long",
    "smallint": "long",
    "bigint": "long",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
    "date": "date",
}


@dataclass
class FieldSpec:
    source: str
    target: str
    data_type: str = "text"
    prefix_dep: bool = False


@dataclass
class TableSpec:
    table: str
    feature_types: list[str]
    fields: list[FieldSpec] = field(default_factory=list)
    hash_geom: bool = True


class ConfigError(ValueError):
    pass


def validate_specs(specs: list[TableSpec]) -> None:
    """Reserved-name + conflicting-layout validation (cli.rs:689-702,
    781-788)."""
    layouts: dict[str, tuple] = {}
    for spec in specs:
        for f_ in spec.fields:
            if f_.target.lower() in RESERVED:
                raise ConfigError(f"reserved column name: {f_.target}")
            if f_.data_type.lower() not in _TYPES:
                raise ConfigError(f"unknown data_type: {f_.data_type}")
        layout = tuple((f_.target, f_.data_type) for f_ in spec.fields)
        if spec.table in layouts and layouts[spec.table] != layout:
            raise ConfigError(f"conflicting layouts for table {spec.table}")
        layouts[spec.table] = layout


def load_preset(source) -> list[TableSpec]:
    """Parse the reference's JSON preset shape into TableSpecs — the
    missing mouth of the config system: a user's full.json/light.json/
    bati.json (cadastre-pg/src/config/presets/, loaded at
    cli.rs:677-683) feeds the engine unchanged.

    `source` is a path, a file-like, or an already-parsed dict of
    {feature_type: {table, hash_geom?, fields: [{source, target,
    data_type?, prefix_dep?}]}}. Semantics mirror build_import_specs
    (cli.rs:749-802):
    - fields whose target is a RESERVED column are dropped, not
      errored (the engine builds id/departement/geometry itself);
    - feature types sharing a table merge into one TableSpec; a
      different surviving field layout raises ConfigError;
    - hash_geom is OR-ed across the merged feature types;
    - each type is also registered without a trailing '_ID'
      (normalize tolerance, cli.rs:797-800).
    Defaults mirror the serde defaults (config/mod.rs:30-49):
    data_type 'text', prefix_dep false, hash_geom false."""
    import json

    if isinstance(source, dict):
        raw = source
    elif hasattr(source, "read"):
        raw = json.load(source)
    else:
        with open(source, encoding="utf-8") as fh:
            raw = json.load(fh)
    if not isinstance(raw, dict):
        raise ConfigError("preset root must be a JSON object")

    specs: list[TableSpec] = []
    by_table: dict[str, TableSpec] = {}
    for ftype, cfg in raw.items():
        if not isinstance(cfg, dict) or "table" not in cfg:
            raise ConfigError(f"preset entry {ftype!r} missing 'table'")
        fields = []
        for f_ in cfg.get("fields", []):
            try:
                fs = FieldSpec(
                    source=f_["source"],
                    target=f_["target"],
                    data_type=f_.get("data_type", "text"),
                    prefix_dep=bool(f_.get("prefix_dep", False)),
                )
            except (TypeError, KeyError) as exc:
                raise ConfigError(
                    f"preset entry {ftype!r}: field needs source+target ({exc})"
                ) from exc
            if fs.target.lower() not in RESERVED:
                fields.append(fs)
        names = [ftype.strip().upper()]
        if names[0].endswith("_ID"):
            names.append(names[0][: -len("_ID")])
        table = cfg["table"]
        hash_geom = bool(cfg.get("hash_geom", False))
        spec = by_table.get(table)
        if spec is None:
            spec = TableSpec(
                table=table, feature_types=names, fields=fields, hash_geom=hash_geom
            )
            by_table[table] = spec
            specs.append(spec)
        else:
            if [(x.target, x.data_type, x.source, x.prefix_dep) for x in spec.fields] != [
                (x.target, x.data_type, x.source, x.prefix_dep) for x in fields
            ]:
                raise ConfigError(f"conflicting layouts for table {table}")
            spec.feature_types.extend(names)
            spec.hash_geom = spec.hash_geom or hash_geom
    validate_specs(specs)
    return specs


def lenient_numeric(col):
    """'+1895.' -> 1895, '01' -> 1 (P4; cli.rs:842-861) as SQL exprs."""
    cleaned = F.regexp_replace(
        F.regexp_replace(F.trim(col), r"^\+", ""), r"\.$", ""
    )
    return cleaned.cast("double")


def project_features(
    features: DataFrame, spec: TableSpec, dep_col: str = "dep"
) -> DataFrame:
    """One table's projection: filter to its feature types (normalized
    upper/trim, P10), select config fields out of the properties map
    with target aliases, apply prefix_dep and typed casts."""
    ftype = F.upper(F.trim(F.col("feature_type")))
    df = features.filter(ftype.isin([t.upper() for t in spec.feature_types]))
    cols = [
        F.concat(F.col(dep_col), F.col("id")).alias("id"),
        F.col(dep_col).alias("departement"),
    ]
    for f_ in spec.fields:
        src = F.col("properties").getItem(f_.source)
        t = _TYPES[f_.data_type.lower()]
        if f_.prefix_dep:
            src = F.concat(F.col(dep_col), src)
        if t in ("long", "double"):
            src = lenient_numeric(src)
            if t == "long":
                src = src.cast("long")  # trunc, like the reference
        elif t != "string":
            src = src.cast(t)
        cols.append(src.alias(f_.target))
    return df.select(*cols)


def route_features(
    features: DataFrame, specs: list[TableSpec], dep_col: str = "dep"
) -> tuple[dict[str, DataFrame], DataFrame]:
    """J6 dispatch: feature_type -> table. Unknown types are counted,
    not errored (cli.rs:437-441). Returns ({table: df}, skipped_counts)."""
    validate_specs(specs)
    known = [t.upper() for s in specs for t in s.feature_types]
    out = {s.table: project_features(features, s, dep_col) for s in specs}
    skipped = (
        features.filter(~F.upper(F.trim(F.col("feature_type"))).isin(known))
        .groupBy(F.upper(F.trim(F.col("feature_type"))).alias("feature_type"))
        .agg(F.count(F.lit(1)).alias("n_skipped"))
    )
    return out, skipped
