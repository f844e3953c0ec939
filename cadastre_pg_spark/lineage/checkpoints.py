"""Resumable commit protocol with per-partition lineage + metrics.

The engine's analog of the reference's `_archive_checksums` skip table
(cadastre-pg/src/export/postgres.rs:98-168, probe cli.rs:321-356):
a unit of work (partition) whose (stage, partition_id, content_hash)
is already committed is pruned BEFORE any processing — the Spark form
is an anti-join of the input's partition list against `_checkpoints`,
mirroring the reference skipping whole archives before decompression.

North-rule extensions over the reference: per-partition row/byte
metrics (the reference only counts globally, cli.rs:285-291) and
idempotent output (deterministic per-partition directories +
overwrite) so a replayed task cannot double-count — SURVEY.md §7.4
hard part #3. Without Iceberg jars in the environment this is an
honest Parquet-backed emulation of snapshot commit semantics
(SURVEY.md §7.2): data files land first, the checkpoint row append is
the commit point.

Schema (FIXTURES.md §3): run_id, stage, partition_id, content_hash,
rows, bytes, status, committed_at.
"""

import itertools
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RUN_SEQ = itertools.count()


def new_run_id() -> str:
    """Sortable monotonic run id: zero-padded nanosecond timestamp +
    in-process counter + random suffix. committed() breaks equal
    committed_at timestamps on run_id DESC, so ids from here make
    latest-wins exact even for commits inside the same clock tick
    (current_timestamp is per-query constant at microseconds). Callers
    minting their own run_ids must keep them chronologically sortable
    to retain that guarantee."""
    return f"{time.time_ns():020d}-{next(_RUN_SEQ):06d}-{uuid.uuid4().hex[:8]}"

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("rows", T.LongType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)


class CheckpointLog:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.dir = os.path.join(base_dir, "_checkpoints")

    def read(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.dir)
        except Exception:
            return self.spark.createDataFrame([], CHECKPOINT_SCHEMA)

    def committed(self, stage: str) -> DataFrame:
        """(partition_id, content_hash) of the LATEST committed row per
        partition. The log is append-only, so a partition re-committed
        with new content supersedes its old rows — only the current
        hash counts as done (matching the reference's ON CONFLICT DO
        UPDATE upsert, postgres.rs:98-168). Without this, a partition
        whose content *reverts* to any previously committed hash would
        be skipped while the output dir still holds the newer data.

        Ties on committed_at (two commits inside one clock tick) break
        on run_id DESC — chronological ONLY if run_ids sort by creation
        time. new_run_id() mints ids with that property; use it (or an
        equally sortable scheme) when runs can commit back-to-back."""
        from pyspark.sql import Window

        w = Window.partitionBy("partition_id").orderBy(
            F.col("committed_at").desc(), F.col("run_id").desc()
        )
        return (
            self.read()
            .filter((F.col("stage") == stage) & (F.col("status") == "committed"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("partition_id", "content_hash")
        )

    def append(self, rows_df: DataFrame) -> None:
        rows_df.write.mode("append").parquet(self.dir)


def run_stage(
    spark: SparkSession,
    input_df: DataFrame,
    *,
    stage: str,
    run_id: str,
    partition_col: str,
    base_dir: str,
    process,
    content_hash_col=None,
):
    """Execute `process(df) -> df` over only the NOT-yet-committed
    partitions of input_df, write results partitioned by partition_col
    (idempotent per-partition dirs, overwritten on replay), then commit
    one checkpoint row per partition with row/byte metrics.

    Returns (out_dir, metrics_df). Resume = call again with the same
    stage/base_dir: committed partitions are anti-joined away before
    any processing (the J5 archive-skip semantics)."""
    log = CheckpointLog(spark, base_dir)
    out_dir = os.path.join(base_dir, stage)

    # content-derived partition hash (J5: the reference checksums the
    # archive BYTES, cli.rs:1357-1374): order-independent sum of 32-bit
    # row hashes over all columns — changed data => changed hash =>
    # reprocess, identical data => skip
    if content_hash_col is None:
        row_hash = F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in input_df.columns])),
            F.lit(1 << 32),
        )
        parts = (
            input_df.select(
                F.col(partition_col).cast("int").alias("partition_id"),
                row_hash.alias("rh"),
            )
            .groupBy("partition_id")
            .agg(F.sum("rh").cast("string").alias("content_hash"))
        )
    else:
        parts = (
            input_df.select(
                F.col(partition_col).cast("int").alias("partition_id"),
                content_hash_col.alias("content_hash"),
            )
            .groupBy("partition_id")
            .agg(F.min("content_hash").alias("content_hash"))
        )
    done = log.committed(stage)
    todo = parts.join(done, ["partition_id", "content_hash"], "left_anti")

    pending = input_df.join(
        F.broadcast(todo.select(F.col("partition_id").alias(partition_col))),
        partition_col,
        "left_semi",
    )
    processed = process(pending).withColumn(
        "_pid", F.col(partition_col).cast("int")
    )

    # data files first (idempotent: per-partition dirs, dynamic overwrite).
    # Save/restore the session conf — leaking 'dynamic' would silently
    # change the semantics of unrelated overwrite-partitioned writes.
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    try:
        processed.write.mode("overwrite").partitionBy("_pid").parquet(out_dir)
    finally:
        if prev_mode is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev_mode)

    # metrics from what landed, then the commit-point append (an empty
    # stage may write no files at all — read with the known schema).
    # Only the partition column is read: counting a parquet scan pruned
    # to the directory-derived column is served from file footers, so
    # this is a metadata pass, NOT a re-scan of the stage output.
    try:
        landed_raw = spark.read.schema(processed.schema).parquet(out_dir).select("_pid")
    except Exception:
        landed_raw = spark.createDataFrame([], processed.schema).select("_pid")
    landed = landed_raw.join(
        F.broadcast(todo.select(F.col("partition_id").alias("_pid"))),
        "_pid",
        "left_semi",
    )
    metrics = landed.groupBy(F.col("_pid").alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    commit_rows = (
        todo.join(metrics, "partition_id", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id"),
            F.col("content_hash"),
            F.coalesce(F.col("rows"), F.lit(0)).alias("rows"),
            (F.coalesce(F.col("rows"), F.lit(0)) * F.lit(64)).alias("bytes"),
            F.lit("committed").alias("status"),
            F.current_timestamp().alias("committed_at"),
        )
    )
    log.append(commit_rows)
    return out_dir, commit_rows.select("partition_id", "rows")
