"""Auxiliary benchmark runner for optimization work (round 6).

bench.py is FROZEN for measurement; this file reuses its child harness
to run subsets of the suite without the aux throughput blocks, so the
edit-measure loop is minutes, not half an hour.  Results go to a JSON
file named on the command line, never to bench_queries.json.

Usage:
    python bench_extra.py out.json                 # full 232-query suite
    python bench_extra.py out.json q1 q2 ...       # subset
"""

import json
import sys

import bench


def main():
    out_path = sys.argv[1]
    names = sys.argv[2:] or bench.BENCH_QUERIES
    res = bench.run_child(bench.CPUS, names, bench.SF_DIR)
    times = res["times"]
    payload = {
        "sf": bench.SF_DIR,
        "cores": bench.CPUS,
        "total": round(sum(times.values()), 3),
        "times": times,
        "rows": res["rows"],
        "skipped": res.get("skipped", []),
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({"total": payload["total"], "n": len(times),
                      "skipped": payload["skipped"]}))


if __name__ == "__main__":
    main()
