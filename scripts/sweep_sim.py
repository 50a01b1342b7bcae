#!/usr/bin/env python
"""Simulate the driver's correctness sweep: every registered query run on a
fresh session, alphabetically, Spark vs DuckDB oracle at sf0.01 — with
per-query wall time. Round 1's driver truncated after ~50 queries; this
script is the acceptance check that the full sweep now fits the budget.

Usage: python scripts/sweep_sim.py [sf_dir] [--fresh-staging]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from energy_emissions_lakehouse_spark.oracle import compare_query, duckdb_connection
from energy_emissions_lakehouse_spark.registry import all_queries
from energy_emissions_lakehouse_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    if "--fresh-staging" in sys.argv:
        # Driver-cold conditions: throw away the medallion staging cache so
        # the first medallion query pays the one-time build, like a fresh CI.
        from energy_emissions_lakehouse_spark.medallion.staging import staging_dir
        shutil.rmtree(os.path.dirname(staging_dir()), ignore_errors=True)

    t_start = time.perf_counter()
    spark = get_spark(app_name="sweep-sim")
    con = duckdb_connection(sf_dir)
    names = sorted(all_queries())
    times: dict[str, float] = {}
    failures: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        try:
            res = compare_query(spark, con, name, sf_dir)
            ok, detail = res.ok, res.detail
        except Exception as exc:  # noqa: BLE001 — sweep must not stop
            ok, detail = False, f"exception: {exc}"
        times[name] = round(time.perf_counter() - t0, 3)
        status = "ok" if ok else f"FAIL ({detail})"
        print(f"[sweep] {name}: {times[name]}s {status}", file=sys.stderr)
        if not ok:
            failures.append(f"{name}: {detail}")

    total = round(time.perf_counter() - t_start, 3)
    slowest = sorted(times.items(), key=lambda kv: -kv[1])[:15]
    print(json.dumps({
        "total_sec": total,
        "n_queries": len(names),
        "n_failures": len(failures),
        "failures": failures,
        "slowest": slowest,
    }, indent=2))


if __name__ == "__main__":
    main()
