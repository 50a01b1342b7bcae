#!/usr/bin/env python
"""Repeated-run probe for stream_* replays (guide §1): run each named
query N times in one fresh session, print every rep's wall time — growth
across reps means session-state buildup, flat-but-wide means host noise.
Also prints the per-batch durationMs breakdown of the LAST replay's
streaming progress when available.

Usage: SPARK_GRAFT_CPUS=32 python scripts/probe_stream_repeat.py name1,name2 [reps]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="eel-stream-probe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries["pricing_summary"](spark, sf_dir).collect()  # warm-up
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).collect()  # staging warm
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            walls.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"name": name, "walls": walls}), flush=True)


if __name__ == "__main__":
    main()
