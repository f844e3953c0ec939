"""JSON-Lines corpus interchange: the sibling of sources/shards.py
for the format pretraining pipelines actually exchange (one JSON
object per line, gzip-compressed shard files) — parquet shards are
the internal fast path, JSONL is what leaves the cluster or arrives
from a crawler.

Reference lineage: the reference's export side writes one artifact
per département with a per-file census (cadastre-pg/src/export/
postgres.rs COPY batches + report counters); this sink emits one
JSONL shard per deterministic shuffle bucket with the same manifest
census as write_shards, so either format resumes/verifies through
identical loader logic.

Scale shape (100 TB): writing is ONE exchange
(repartition(n_shards, shard) + sortWithinPartitions + partitionBy) —
each task streams its shard in final training order straight into the
.json.gz file; Spark's JSON writer preserves within-file row order.
Reading back ALWAYS takes an explicit schema: schema inference is a
full extra pass over 100 TB and silently widens types, so read_jsonl
refuses to infer.
"""

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.corpus import global_shuffle

from .shards import MANIFEST_DIR

DOC_SCHEMA = "doc_id long, pos long, text string"


def write_jsonl(
    docs: DataFrame,
    path: str,
    n_shards: int = 16,
    salt: str = "gs:",
    hash_fn: str = "xxhash64",
    compression: str = "gzip",
) -> DataFrame:
    """Write `docs` (doc_id, text) to `path` as `n_shards` gzip JSONL
    shard directories in deterministic training order, plus the same
    manifest census write_shards emits (under `path/_manifest`, as
    parquet — the manifest is loader metadata, not interchange).
    Returns the manifest DataFrame."""
    plan = global_shuffle(docs, n_shards=n_shards, salt=salt, hash_fn=hash_fn)
    routed = docs.select("doc_id", "text").join(
        plan.select("doc_id", "shard", "pos"), "doc_id"
    )
    (
        routed.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .select("shard", "doc_id", "pos", "text")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", compression)
        .json(path)
    )
    manifest = (
        routed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
            )
            .cast("long")
            .alias("n_tokens"),
            F.min("pos").cast("long").alias("first_pos"),
            F.max("pos").cast("long").alias("last_pos"),
            F.sum(F.col("pos") * F.pmod(F.col("doc_id"), F.lit(1 << 20)))
            .cast("long")
            .alias("pos_checksum"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(os.path.join(path, MANIFEST_DIR))
    return manifest


def read_jsonl(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Read a JSONL corpus with an ENFORCED schema (no inference pass;
    malformed lines surface as nulls under the default PERMISSIVE
    mode rather than silently re-typing columns). The partitionBy
    `shard` directory column comes back automatically."""
    return spark.read.schema(schema).json(path)


def read_jsonl_shard(
    spark: SparkSession, path: str, shard: int, schema: str = DOC_SCHEMA
) -> DataFrame:
    """One shard back in training order (within-file order is the
    written order; a multi-file shard re-sorts by pos, cheap at
    one-shard granularity)."""
    return (
        spark.read.schema(schema)
        .json(os.path.join(path, f"shard={shard}"))
        .orderBy("pos")
    )


def verify_jsonl(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Recompute the manifest census from the JSONL files and join it
    against the stored manifest — one row per shard with an `intact`
    flag. Truncated, duplicated, or reordered shards all surface as
    count/min/max/checksum drift (same rule as shards.verify_shards,
    so a loader can verify either format with one code path)."""
    data = read_jsonl(spark, path, schema)
    got = data.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("g_docs"),
        F.min("pos").cast("long").alias("g_first"),
        F.max("pos").cast("long").alias("g_last"),
        F.sum(F.col("pos") * F.pmod(F.col("doc_id"), F.lit(1 << 20)))
        .cast("long")
        .alias("g_checksum"),
    )
    stored = spark.read.parquet(os.path.join(path, MANIFEST_DIR))
    return (
        stored.join(got, "shard", "left")
        .select(
            "shard",
            "n_docs",
            "pos_checksum",
            (
                (F.col("g_docs") == F.col("n_docs"))
                & (F.col("g_first") == F.col("first_pos"))
                & (F.col("g_last") == F.col("last_pos"))
                & (F.col("g_checksum") == F.col("pos_checksum"))
            ).alias("intact"),
        )
        .orderBy("shard")
    )
