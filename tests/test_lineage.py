"""Checkpoint/lineage commit protocol: commit, metrics, resume-skip
(J5 semantics: already-committed partitions are pruned before any
processing — reference postgres.rs:122-168, cli.rs:321-356)."""

import pyspark.sql.functions as F
import pytest

from cadastre_pg_spark.lineage.checkpoints import CheckpointLog, new_run_id, run_stage


@pytest.fixture
def base(tmp_path):
    return str(tmp_path / "lake")


def test_new_run_id_is_sortable_monotonic():
    """committed() tie-breaks equal committed_at on run_id DESC; ids
    minted back-to-back (same clock tick territory) must still sort in
    generation order."""
    ids = [new_run_id() for _ in range(200)]
    assert ids == sorted(ids)
    assert len(set(ids)) == 200


def _input(spark):
    return spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 10).cast("int").alias("dep"),
        (F.col("id") * 2).alias("v"),
    )


def test_commit_and_metrics(spark, base):
    df = _input(spark)
    out_dir, metrics = run_stage(
        spark,
        df,
        stage="double",
        run_id="r1",
        partition_col="dep",
        base_dir=base,
        process=lambda d: d.withColumn("v2", F.col("v") * 2),
    )
    log = CheckpointLog(spark, base)
    ck = log.read().filter(F.col("stage") == "double")
    assert ck.count() == 10  # one committed row per partition
    assert ck.agg(F.sum("rows")).head()[0] == 1000
    assert spark.read.parquet(out_dir).count() == 1000


def test_resume_skips_committed(spark, base):
    df = _input(spark)
    calls = []

    def process(d):
        calls.append(1)
        return d.withColumn("v2", F.col("v") * 2)

    run_stage(
        spark, df, stage="s", run_id="r1", partition_col="dep",
        base_dir=base, process=process,
    )
    # second run: everything committed -> process sees an EMPTY remainder
    out_dir, _ = run_stage(
        spark, df, stage="s", run_id="r2", partition_col="dep",
        base_dir=base, process=process,
    )
    log = CheckpointLog(spark, base)
    second = log.read().filter(F.col("run_id") == "r2")
    assert second.count() == 0  # nothing re-committed
    assert spark.read.parquet(out_dir).count() == 1000  # data intact


def test_resume_processes_only_new_partitions(spark, base):
    df1 = _input(spark).filter(F.col("dep") < 5)
    run_stage(
        spark, df1, stage="s", run_id="r1", partition_col="dep",
        base_dir=base,
        process=lambda d: d.withColumn("v2", F.col("v") * 2),
    )
    df2 = _input(spark)  # now all 10 partitions
    _, committed = run_stage(
        spark, df2, stage="s", run_id="r2", partition_col="dep",
        base_dir=base,
        process=lambda d: d.withColumn("v2", F.col("v") * 2),
    )
    new_parts = sorted(r.partition_id for r in committed.collect())
    assert new_parts == [5, 6, 7, 8, 9]  # only the uncommitted half


def test_changed_content_reprocesses(spark, base):
    """J5: identical partition values but CHANGED data must reprocess
    (the reference re-imports when the archive checksum changes)."""
    df1 = _input(spark)
    run_stage(
        spark, df1, stage="s", run_id="r1", partition_col="dep",
        base_dir=base,
        process=lambda d: d.withColumn("v2", F.col("v") * 2),
    )
    df2 = df1.withColumn("v", F.col("v") + 1)  # same partitions, new data
    _, committed = run_stage(
        spark, df2, stage="s", run_id="r2", partition_col="dep",
        base_dir=base,
        process=lambda d: d.withColumn("v2", F.col("v") * 2),
    )
    assert committed.count() == 10  # every partition re-committed


def test_replay_is_idempotent(spark, base):
    """A replayed partition overwrites its own files — no double rows
    (SURVEY.md §7.4 hard part #3)."""
    df = _input(spark)
    for run in ("r1", "r2"):
        out_dir, _ = run_stage(
            spark, df, stage="s", run_id=run, partition_col="dep",
            base_dir=base,
            process=lambda d: d.withColumn("v2", F.col("v") * 2),
            # force reprocessing by salting the content hash per run
            content_hash_col=F.lit(run),
        )
    assert spark.read.parquet(out_dir).count() == 1000
