"""Degenerate-input robustness audit.

Builds zero-row and one-row variants of every test table (same schemas
as /root/testdata/sf0.001) and runs EVERY registry query against them,
recording crashes. Spark 4 ANSI mode turns 0/0 and empty-group
arithmetic into runtime errors, so any query that divides by a
group count, folds an empty array, or sequences to an empty range
without a gate will surface here rather than on real data.

Usage:  python scripts/degenerate_audit.py [empty|one|both] [--only q1,q2]
Writes a JSON report to /tmp/degenerate_audit.json.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def build_variant(name: str, nrows: int) -> str:
    out_dir = f"/tmp/sf_{name}"
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        dst = f"{out_dir}/{t}.parquet"
        # always rewrite: the slices are 0-1 rows, and a cached file
        # would silently pin a stale schema after a generator change
        # (round-5 advice)
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(tab.slice(0, nrows), dst)
    return out_dir


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))

    variants = []
    if which in ("empty", "both"):
        variants.append(("empty", build_variant("empty", 0)))
    if which in ("one", "both"):
        variants.append(("one", build_variant("one", 1)))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("degenerate-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E

    qs = E.queries()
    report: dict[str, dict[str, str]] = {}
    for vname, vdir in variants:
        res: dict[str, str] = {}
        for qname, fn in sorted(qs.items()):
            if only and qname not in only:
                continue
            try:
                df = fn(spark, vdir)
                n = df.count()
                res[qname] = f"ok:{n}"
            except Exception as exc:  # noqa: BLE001 - audit collects everything
                first = str(exc).split("\n", 1)[0][:300]
                res[qname] = f"FAIL:{type(exc).__name__}:{first}"
                if os.environ.get("AUDIT_TRACE"):
                    traceback.print_exc()
            finally:
                spark.catalog.clearCache()
            print(f"[{vname}] {qname}: {res[qname][:120]}", flush=True)
        report[vname] = res

    with open("/tmp/degenerate_audit.json", "w") as f:
        json.dump(report, f, indent=1)
    for vname, res in report.items():
        fails = {k: v for k, v in res.items() if v.startswith("FAIL")}
        print(f"== {vname}: {len(fails)} failures / {len(res)} queries")
        for k, v in sorted(fails.items()):
            print(f"  {k}: {v[:200]}")


if __name__ == "__main__":
    main()
