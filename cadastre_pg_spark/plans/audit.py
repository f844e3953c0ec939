"""Physical-plan auditing: programmatic access to .explain output so
tests can ASSERT the plan shape (pushdown reached the scan, the build
side broadcast, codegen spans cover the hot path) instead of hoping.
"""

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, needle: str, mode: str = "formatted") -> bool:
    return needle in explain_string(df, mode)


def audit(df: DataFrame) -> dict:
    """Summary booleans the tests / BENCH notes assert on."""
    import re

    s = explain_string(df, "formatted")
    # formatted mode marks codegen stages with a '* ' prefix
    has_codegen = "WholeStageCodegen" in s or bool(
        re.search(r"\n[\s:+|-]*\* \w", s)
    )
    return {
        "broadcast_join": "BroadcastHashJoin" in s,
        # simple/extended modes print "Exchange hashpartitioning(...)",
        # formatted mode prints "Exchange (n)" + "Arguments: hashpartitioning"
        "shuffle_exchange": "hashpartitioning(" in s,
        "codegen": has_codegen,
        "pushed_filters": "PushedFilters: [" in s and not _only_empty_filters(s),
        "columnar_scan": "Scan parquet" in s,
        "aqe": "AdaptiveSparkPlan" in s,
        "arrow_eval": ("MapInPandas" in s) or ("ArrowEvalPython" in s),
    }


def _only_empty_filters(s: str) -> bool:
    import re

    pushed = re.findall(r"PushedFilters: \[(.*?)\]", s)
    return all(p.strip() == "" for p in pushed) if pushed else True


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns each parquet scan actually reads (column pruning check)."""
    import re

    s = explain_string(df, "formatted")
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", s):
        out.append(sorted(c.split(":")[0] for c in m.split(",") if c))
    return out
