"""End-to-end import pipeline: full run, resume skip, metrics."""

import pyspark.sql.functions as F

from cadastre_pg_spark.pipeline import import_metrics, run_import


def test_import_and_resume(spark, tmp_path):
    base = str(tmp_path / "lake")
    r1 = run_import(spark, base, run_id="r1", n_pages=600, n_parcels=60)
    assert r1["extract"] == 600
    assert r1["placement"] > 0

    # resume: identical input -> nothing recommitted, outputs intact
    r2 = run_import(spark, base, run_id="r2", n_pages=600, n_parcels=60)
    assert r2["extract"] == 0
    assert r2["placement"] == 0
    placed = spark.read.parquet(r1["out_dir"])
    assert placed.count() == r1["placement"]

    # lineage metrics table
    m = {r.stage: r for r in import_metrics(spark, base).collect()}
    assert m["extract"].rows == 600
    assert m["placement"].rows == r1["placement"]
    assert m["extract"].n_partitions == 16


def test_import_extraction_invariant(spark, tmp_path):
    """The committed extract partition carries byte-identical text."""
    import hashlib

    base = str(tmp_path / "lake")
    run_import(spark, base, run_id="r1", n_pages=100, n_parcels=20)
    rows = spark.read.parquet(f"{base}/extract").collect()
    assert len(rows) == 100
    for r in rows[:20]:
        assert hashlib.sha256(r.text.encode()).hexdigest() == r.text_sha


def test_derive_status_reference_matrix():
    """Truth table of report.rs:211-226 finalize()."""
    from cadastre_pg_spark.pipeline import derive_status

    # (has_fatal, has_errors, has_success) -> status
    assert derive_status(True, True, True) == "Failed"
    assert derive_status(True, True, False) == "Failed"
    assert derive_status(True, False, True) == "Failed"
    assert derive_status(True, False, False) == "Failed"
    assert derive_status(False, True, True) == "PartialSuccess"
    assert derive_status(False, True, False) == "Failed"
    assert derive_status(False, False, True) == "Success"
    assert derive_status(False, False, False) == "Success"


def test_finalize_report_statuses(spark, tmp_path):
    from cadastre_pg_spark.pipeline import finalize_report, run_import

    base = str(tmp_path / "imp")
    run_import(spark, base, "runA", n_pages=60, n_parcels=20)
    m, status = finalize_report(spark, base)
    assert status == "Success"
    errs = spark.createDataFrame(
        [("Error", "bad row")], "level string, message string"
    )
    _, status = finalize_report(spark, base, errs)
    assert status == "PartialSuccess"
    fatal = spark.createDataFrame(
        [("Fatal", "boom")], "level string, message string"
    )
    _, status = finalize_report(spark, base, fatal)
    assert status == "Failed"
    # a base dir with nothing committed + errors -> Failed
    _, status = finalize_report(spark, str(tmp_path / "empty"), errs)
    assert status == "Failed"
