"""Round-13 verdict item 1: the bench's FINAL stdout line must carry real
per-query timings AND stay inside the driver's ~2000-char stdout tail.

History this pins: r08/r09 emitted the full ~10 KB payload as the last
line and the driver's tail-window parse returned null; r10-r12 emitted a
<200-byte pointer line that parsed but carried ZERO per-query numbers,
leaving PERF per_query/scaling empty two rounds running.  The contract
line now packs cost-ranked per-query medians up to a byte budget.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _payload(timings):
    return {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "sf": 0.1,
        "reps": 3,
        "probe_drift": 1.0,
        "probe_drift_flag": False,
    }


def _mk_timings(n):
    # realistic name lengths (registry averages ~25 chars)
    return {
        f"query_family_{i:03d}_variant_name": round(0.05 + (i % 97) * 0.11, 3)
        for i in range(n)
    }


def test_final_line_fits_tail_window_at_registry_scale():
    timings = _mk_timings(300)
    line = json.dumps(bench.final_contract_line(_payload(timings), timings))
    assert len(line) <= bench._FINAL_LINE_BUDGET
    assert bench._FINAL_LINE_BUDGET <= 1900  # hard ceiling: 2000-char tail


def test_final_line_carries_real_numeric_per_query_entries():
    timings = _mk_timings(300)
    out = bench.final_contract_line(_payload(timings), timings)
    assert len(out["queries"]) >= 20  # the heavy head is visible
    assert all(
        isinstance(v, (int, float)) for v in out["queries"].values()
    )  # nothing non-numeric can poison the driver's per-query parse
    assert "_full_payload" not in out["queries"]
    assert out["full_payload"] == "BENCH_SELF.json"
    # selection is most-expensive-first: every included entry costs at
    # least as much as every excluded one
    included = set(out["queries"])
    floor = min(out["queries"].values())
    excluded_max = max(
        (v for k, v in timings.items() if k not in included), default=0.0
    )
    assert excluded_max <= floor
    # totals refer to the FULL set, not the packed subset
    assert out["queries_n"] == 300
    assert out["value"] == round(sum(timings.values()), 3)


def test_final_line_small_registry_includes_everything():
    timings = {"a": 1.0, "b": 2.0}
    out = bench.final_contract_line(_payload(timings), timings)
    assert out["queries"] == {"b": 2.0, "a": 1.0}


def test_final_line_is_deterministic_under_ties():
    timings = {f"q{i}": 0.5 for i in range(40)}
    a = bench.final_contract_line(_payload(timings), timings)
    b = bench.final_contract_line(_payload(timings), timings)
    assert list(a["queries"]) == list(b["queries"]) == sorted(timings)[: len(a["queries"])] or list(
        a["queries"]
    ) == list(b["queries"])
