#!/usr/bin/env python
"""Per-query phase profiler (guide §1: measure first).

For each named registry query, times:
  - build: fn(spark, sf_dir) — plan construction plus any side work the
    query performs inside the function (streaming drains, vtable builds);
  - exec_noop: result.write.format("noop") — computes every column of
    every row without the collect/driver transfer (guide §1.4);
  - collect: result.collect() — what bench.py times.

Repeats each phase REPS times (fresh fn() call per rep) and prints the
median, so steady-state memoized staging is what gets measured — same
policy as bench.py. Output: one JSON line per query on stdout.

Usage:
  SPARK_GRAFT_CPUS=32 python scripts/profile_queries.py name1,name2,...
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from energy_emissions_lakehouse_spark.registry import all_queries
from energy_emissions_lakehouse_spark.session import get_spark


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROF_REPS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="eel-profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warm-up (JVM/codegen/python workers), not counted
    queries["pricing_summary"](spark, sf_dir).collect()

    for name in names:
        fn = queries[name]
        fn(spark, sf_dir)  # warm any per-corpus staging out of the timings
        builds, noops, collects = [], [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            builds.append(t1 - t0)
            noops.append(t2 - t1)
            collects.append(t3 - t2)
        med = lambda xs: round(sorted(xs)[len(xs) // 2], 3)  # noqa: E731
        print(
            json.dumps(
                {
                    "name": name,
                    "build": med(builds),
                    "exec_noop": med(noops),
                    "collect": med(collects),
                    "total_benchlike": round(med(builds) + med(collects), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
