#!/usr/bin/env python
"""Capture .explain("formatted") for registered queries into plans/<round>/.

Usage:
    PLANS_ROUND=r13 python scripts/capture_plans.py before name1,name2,...
    PLANS_ROUND=r13 python scripts/capture_plans.py after  name1,name2,...

Writes plans/<round>/<name>_<tag>.txt for each query (round defaults to r13). The DataFrame returned
by a registry function is the declared result; for queries that execute
side work inside the function (streaming drains, vtable builds) the
captured plan is the plan of that declared result, which is what the
oracle checks. Uses the same session construction as bench.py so the
plan shape (AQE, shuffle partitions, broadcast thresholds) matches what
the bench times.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from energy_emissions_lakehouse_spark.registry import all_queries
from energy_emissions_lakehouse_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        _REPO_ROOT, "plans", os.environ.get("PLANS_ROUND", "r13")
    )
    os.makedirs(outdir, exist_ok=True)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="eel-plan-capture", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, sf_dir)
            ex = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            ex = f"CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(ex)
        print(f"[plans] wrote {path} ({len(ex)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
