"""Seeded-random brute-force references for the round-9 join operators.

The DuckDB oracles already check these on the fixed testdata; these tests
attack the SEMANTICS with randomized inputs a fixed corpus can't cover —
duplicate timestamps, exact ties, zero-length sessions, bucket-boundary
touches — against a straight-line Python reference that restates the
definition (argmin over all candidates / all-pairs interval overlap),
independently of both engines.  Seeded: failures reproduce.
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

BASE = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _rand_events(rng, n_users, n_events, max_span_s, dup_ts_prob=0.15):
    """Random (user_id, ts, event_id) rows; some timestamps collide
    exactly (the tie cases the fixed corpus almost never produces)."""
    rows = []
    last_ts: dict[int, datetime.datetime] = {}
    for eid in range(n_events):
        u = rng.randrange(n_users)
        if u in last_ts and rng.random() < dup_ts_prob:
            ts = last_ts[u]  # exact duplicate timestamp
        else:
            ts = BASE + datetime.timedelta(
                seconds=rng.randrange(max_span_s),
                microseconds=rng.randrange(1_000_000),
            )
        last_ts[u] = ts
        rows.append((u, ts, eid))
    return rows


# ----------------------------------------------------- nearest as-of join


def _ref_nearest(left_rows, right_rows):
    """The definition, verbatim: for each left row, the right row of the
    same key minimizing |gap|; ties -> earlier right ts; equal right ts
    -> largest tiebreak."""
    out = {}
    for (lu, lts, lid) in left_rows:
        best = None
        for (ru, rts, rid, rv) in right_rows:
            if ru != lu:
                continue
            gap = abs((lts - rts) // datetime.timedelta(microseconds=1))
            key = (gap, rts, -rid)
            if best is None or key < best[0]:
                best = (key, rts, rv, gap)
        out[lid] = (
            (best[1], best[2], best[3]) if best is not None else None
        )
    return out


def test_asof_nearest_matches_bruteforce_on_random_inputs(spark):
    from energy_emissions_lakehouse_spark.operators.asof import (
        asof_nearest_join,
    )

    rng = random.Random(0xA50F)
    for case in range(4):
        ev = _rand_events(rng, n_users=4, n_events=60, max_span_s=7200)
        left_rows = [r for r in ev if r[2] % 2 == 0]
        right_rows = [(u, ts, eid, float(eid)) for (u, ts, eid) in ev
                      if eid % 2 == 1]
        left = spark.createDataFrame(
            [(u, ts, eid) for (u, ts, eid) in left_rows],
            "user_id long, ts timestamp, event_id long",
        )
        right = spark.createDataFrame(
            right_rows,
            "user_id long, ts timestamp, event_id long, value double",
        )
        got = {
            r["event_id"]: (
                (r["nearest_ts"], r["nearest_value"], r["gap_us"])
                if r["nearest_ts"] is not None
                else None
            )
            for r in asof_nearest_join(
                left, right, on="user_id", ts="ts",
                payload=["value"], right_tiebreak="event_id",
            ).collect()
        }
        assert got == _ref_nearest(left_rows, right_rows), f"case {case}"


# ------------------------------------------------ interval-overlap join


def _ref_overlap(rows, gap_min=30):
    """Sessionize (gap rule) + all-pairs overlap, the definition."""
    by_user: dict[int, list] = {}
    for (u, ts, _e) in rows:
        by_user.setdefault(u, []).append(ts)
    ivs = []
    for u, tss in by_user.items():
        tss.sort()
        t0 = t1 = tss[0]
        for ts in tss[1:]:
            if (ts - t1).total_seconds() > gap_min * 60:
                ivs.append((u, t0, t1))
                t0 = ts
            t1 = ts
        ivs.append((u, t0, t1))
    agg: dict[int, list] = {}
    for i, (au, a0, a1) in enumerate(ivs):
        for (bu, b0, b1) in ivs:
            if au >= bu or a0 > b1 or b0 > a1:
                continue
            ov = (min(a1, b1) - max(a0, b0)) // datetime.timedelta(
                microseconds=1
            )
            agg.setdefault(au, []).append((bu, ov))
    out = {}
    for u, pairs in agg.items():
        out[u] = (
            len(pairs),
            len({b for b, _ in pairs}),
            sum(ov for _, ov in pairs),
            max(ov for _, ov in pairs),
        )
    return out


def _write_events_file(rows, dir_path):
    os.makedirs(dir_path, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array(
                [e for (_u, _ts, e) in rows], pa.int64()
            ),
            "ts": pa.array(
                [ts for (_u, ts, _e) in rows], pa.timestamp("us")
            ),
            "user_id": pa.array(
                [u for (u, _ts, _e) in rows], pa.int64()
            ),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, os.path.join(dir_path, "events.parquet"))


def test_interval_overlap_matches_bruteforce_on_random_inputs(
    spark, tmp_path
):
    from energy_emissions_lakehouse_spark.queries.scale_joins import (
        interval_overlap_sessions,
    )

    rng = random.Random(0x1D1E)
    for case in range(3):
        # tight span so sessions overlap a lot AND cross hour buckets
        rows = _rand_events(rng, n_users=5, n_events=120, max_span_s=10800)
        d = str(tmp_path / f"iv{case}")
        _write_events_file(rows, d)
        got = {
            r["user_id"]: (
                r["n_overlap_pairs"],
                r["n_partners"],
                r["sum_overlap_us"],
                r["max_overlap_us"],
            )
            for r in interval_overlap_sessions(spark, d).collect()
        }
        assert got == _ref_overlap(rows), f"case {case}"


def test_interval_overlap_bucket_boundary_touch(spark, tmp_path):
    """Adversarial determinism case: two single-event sessions from
    different users at the EXACT same instant on an exact hour boundary
    (zero-length intervals, overlap 0 µs, overlap-start bucket == both
    sessions' only bucket) — must count exactly once."""
    t = datetime.datetime(2024, 3, 1, 5, 0, 0)  # exact hour boundary
    rows = [(1, t, 0), (2, t, 1)]
    d = str(tmp_path / "touch")
    _write_events_file(rows, d)
    from energy_emissions_lakehouse_spark.queries.scale_joins import (
        interval_overlap_sessions,
    )

    out = interval_overlap_sessions(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (
        r["user_id"],
        r["n_overlap_pairs"],
        r["n_partners"],
        r["sum_overlap_us"],
        r["max_overlap_us"],
    ) == (1, 1, 1, 0, 0)
