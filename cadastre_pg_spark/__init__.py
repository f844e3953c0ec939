"""cadastre_pg_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-grounding of DoFabien/cadastre-pg (reference at
/root/reference, Rust EDIGEO->PostGIS ETL) as a cell-indexed spatial
engine over Iceberg-style tables of Common-Crawl-like web pages:

- pure-NumPy geo kernels (projections, cell codecs, point-in-polygon,
  ring stitching, normalized geometry hashing) in ``kernels/``
- Spark DataFrame operators (cell-bucketed broadcast-vs-shuffle spatial
  join, polyfill, kNN via cell-ring expansion, raster<->vector tiling,
  dedup, SCD-2 versioning) in ``operators/``
- per-partition lineage + resumable commit protocol in ``lineage/``

Everything Python-side is vectorized (NumPy inside Arrow pandas UDFs);
no per-row Python in any hot path.
"""

__version__ = "0.1.0"
