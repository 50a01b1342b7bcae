"""Concurrency soak: N driver threads run MIXED DML (append /
merge-on-read delete / merge-on-read update / compact / vacuum /
clone) against ONE versioned table for many commits, under the real
optimistic protocol (lost slot races re-run the whole op against a
fresh snapshot).  Asserted invariants:

- zero lost updates: each thread owns a disjoint key range and tracks
  the expected end state of its range; the final table must match
  every model exactly (a single silently-dropped commit breaks this);
- linearizable version history: the log is the contiguous range
  0..head with exactly one commit per successful versioning op —
  no gaps, no double-claims;
- maintenance neutrality: compact / vacuum / clone racing the DML
  never change visible content or break the head read.

Scale knobs: EEL_SOAK_THREADS / EEL_SOAK_OPS (per thread).  Defaults
are CI-sized; the BASELINE.md record comes from a larger manual run
(see the soak summary this test prints).

Reference contract generalized: the reference warehouse load's
engine.begin() all-or-nothing transaction
(/root/reference/src/30_load/load_to_postgres.py:73-117) — here under
genuine multi-writer interleaving instead of a single process.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile
import threading
import time

import pytest
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.operators.vtable import (
    ConcurrentCommitError,
    VersionedTable,
)

N_THREADS = int(os.environ.get("EEL_SOAK_THREADS", "3"))
N_OPS = int(os.environ.get("EEL_SOAK_OPS", "14"))
RANGE = 1_000_000  # per-thread key-space stride: ranges never overlap


@pytest.fixture()
def base():
    d = tempfile.mkdtemp(prefix="vtable-soak-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _retry(fn, stats, attempts=120):
    """Run one optimistic op to completion: a lost slot race re-runs
    the WHOLE op (fresh snapshot read), the documented protocol."""
    for _ in range(attempts):
        try:
            return fn()
        except ConcurrentCommitError:
            stats["retries"] += 1
            time.sleep(random.uniform(0.0, 0.03))
    raise AssertionError("soak op starved after 120 slot races")


def test_mixed_dml_soak_single_table(spark, base):
    root = os.path.join(base, "t")
    vt0 = VersionedTable.create(
        spark,
        root,
        spark.range(0).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ),
    )
    assert vt0.latest_version() == 0
    clones_dir = os.path.join(base, "clones")
    os.makedirs(clones_dir)
    results: list[dict] = []
    errors: list[BaseException] = []
    barrier = threading.Barrier(N_THREADS)

    def worker(tid: int) -> None:
        try:
            vt = VersionedTable(spark, root)
            lo = tid * RANGE
            model: dict[int, int] = {}
            stats = {
                "tid": tid,
                "retries": 0,
                "commits": 0,
                "noops": 0,
                "ops": 0,
            }
            barrier.wait()
            for i in range(N_OPS):
                kind = i % 7
                before = vt.latest_version()
                if kind in (0, 1, 2, 3):  # append 4 unique keys
                    keys = [lo + 10 * i + j for j in range(4)]
                    df = spark.createDataFrame(
                        [(k, i) for k in keys], "k bigint, v bigint"
                    )
                    v = _retry(lambda: vt.append(df), stats)
                    for k in keys:
                        model[k] = i
                elif kind == 4:  # MOR update: bump the whole owned range
                    v = _retry(
                        lambda: vt.update_where_mor(
                            f"k >= {lo} AND k < {lo + RANGE}",
                            {"v": F.expr("v + 1000")},
                        ),
                        stats,
                    )
                    model = {k: val + 1000 for k, val in model.items()}
                elif kind == 5:  # MOR delete: drop one known key
                    victim = min(model) if model else lo
                    v = _retry(
                        lambda: vt.delete_where_mor(f"k = {victim}"),
                        stats,
                    )
                    model.pop(victim, None)
                else:  # maintenance: compact / vacuum / clone round-robin
                    which = (i // 7) % 3
                    if which == 0:
                        v = _retry(lambda: vt.compact(), stats)
                    elif which == 1:
                        vt.vacuum(retain_last=2)  # no commit
                        v = vt.latest_version()
                        stats["noops"] += 1
                    else:
                        dest = os.path.join(
                            clones_dir, f"c{tid}-{i}"
                        )
                        clone = vt.clone_to(dest)
                        # the clone must serve ITS head consistently
                        assert clone.read().count() >= 0
                        v = vt.latest_version()
                        stats["noops"] += 1
                if v > before:
                    stats["commits"] += 1
                elif kind in (4, 5) or (kind == 6 and (i // 7) % 3 == 0):
                    stats["noops"] += 1  # commit-free no-op DML/compact
                stats["ops"] += 1
            stats["model"] = model
            stats["lo"] = lo
            results.append(stats)
        except BaseException as exc:  # noqa: BLE001 - surface to pytest
            errors.append(exc)

    t0 = time.time()
    threads = [
        threading.Thread(target=worker, args=(tid,))
        for tid in range(N_THREADS)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    assert not errors, errors[:3]
    assert len(results) == N_THREADS

    vt = VersionedTable(spark, root)
    head = vt.latest_version()
    # ---- linearizable history: contiguous versions, one per commit.
    # compact() may internally no-op its counter edge; trust the log:
    assert vt._versions() == list(range(head + 1))
    total_commits = sum(s["commits"] for s in results)
    assert head == total_commits, (
        f"log has {head} commits but threads recorded {total_commits} — "
        "a commit was lost or double-claimed"
    )
    # ---- zero lost updates: every thread's range matches its model
    rows = {r.k: r.v for r in vt.read().collect()}
    for s in results:
        got = {
            k: v
            for k, v in rows.items()
            if s["lo"] <= k < s["lo"] + RANGE
        }
        assert got == s["model"], (
            f"thread {s['tid']}: table range diverged from model "
            f"(missing={sorted(set(s['model']) - set(got))[:5]}, "
            f"extra={sorted(set(got) - set(s['model']))[:5]})"
        )
    # ---- the head stays fully serveable after the melee
    assert vt.read().count() == sum(len(s["model"]) for s in results)
    retries = sum(s["retries"] for s in results)
    print(
        f"\nSOAK threads={N_THREADS} ops/thread={N_OPS} "
        f"commits={total_commits} retries={retries} "
        f"wall={wall:.1f}s rate={total_commits / wall:.1f} commits/s"
    )


def test_concurrent_evolution_soak_with_midstream_clone(spark, base):
    """Schema evolution racing plain appends — the round-9 extension of
    the soak.  Threads append narrow (k, v) batches; midway, one thread
    runs ONE append_evolve that widens the schema with column w.  The
    commit protocol's guarantees under this interleaving:

    - the version claim SERIALIZES the widening: every narrow append
      either lands wholly before the evolution commit, or its retry
      (slot race) re-validates against the widened schema and is refused
      LOUDLY (schema-on-write ValueError) — never a silent head-schema
      narrowing, never a mixed-schema segment;
    - refused writers switch to wide batches and make progress;
    - a clone taken MID-CHAOS is an exact snapshot: its head equals the
      SOURCE's time travel to the clone's head version, bit for bit
      (the log-snapshot-first protocol means concurrent commits are
      simply absent, never torn).

    Assertions: contiguous history; final schema is wide; every
    append's rows present exactly once with w null iff the batch was
    narrow; the clone == source.read(clone_head)."""
    root = os.path.join(base, "t")
    vt0 = VersionedTable.create(
        spark, root, spark.createDataFrame([(0, 0)], "k bigint, v bigint")
    )
    assert vt0.latest_version() == 0
    n_threads, n_ops = 3, 8
    evolve_gate = threading.Event()
    errors: list = []
    models: list[dict] = []
    stats = {"retries": 0, "schema_refusals": 0}
    clone_state: dict = {}

    def worker(tid: int) -> None:
        try:
            vt = VersionedTable(spark, root)
            lo = (tid + 1) * RANGE
            model: dict[int, tuple] = {}
            wide = False
            for i in range(n_ops):
                if tid == 0 and i == n_ops // 2:
                    # the single evolution commit; slot races re-run it
                    _retry(
                        lambda: vt.append_evolve(
                            spark.createDataFrame(
                                [(lo + 777, 1, 2)],
                                "k bigint, v bigint, w bigint",
                            )
                        ),
                        stats,
                    )
                    model[lo + 777] = (1, 2)
                    wide = True
                    evolve_gate.set()
                    continue
                if tid == 1 and i == n_ops // 2:
                    # mid-chaos clone (after the evolution is in flight
                    # somewhere around us — no ordering guarantee needed)
                    c = vt.clone_to(os.path.join(base, "clone"))
                    clone_state["head"] = c.latest_version()
                    clone_state["rows"] = sorted(
                        (r.asDict().get("k"), r.asDict().get("v"),
                         r.asDict().get("w"))
                        for r in c.read().collect()
                    )
                k = lo + i
                for _ in range(120):
                    try:
                        if wide:
                            vt.append(
                                spark.createDataFrame(
                                    [(k, i, k)],
                                    "k bigint, v bigint, w bigint",
                                )
                            )
                            model[k] = (i, k)
                        else:
                            vt.append(
                                spark.createDataFrame(
                                    [(k, i)], "k bigint, v bigint"
                                )
                            )
                            model[k] = (i, None)
                        break
                    except ConcurrentCommitError:
                        stats["retries"] += 1
                        time.sleep(random.uniform(0.0, 0.02))
                    except ValueError as exc:
                        # the loud schema-on-write refusal after a
                        # concurrent widening: switch to wide batches
                        assert "schema-on-write" in str(exc)
                        stats["schema_refusals"] += 1
                        wide = True
                else:
                    raise AssertionError(f"thread {tid} starved")
            models.append(model)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors[:3]

    vt = VersionedTable(spark, root)
    head = vt.latest_version()
    assert vt._versions() == list(range(head + 1))
    assert "w" in vt.read().columns  # the widening is the head schema
    rows = {
        r.asDict()["k"]: (r.asDict()["v"], r.asDict().get("w"))
        for r in vt.read().collect()
    }
    expected = {0: (0, None)}
    for m in models:
        expected.update(m)
    assert rows == expected  # nothing lost, nothing doubled, w exact

    # the clone froze an exact mid-chaos snapshot == source time travel
    if clone_state:
        src_at = sorted(
            (r.asDict().get("k"), r.asDict().get("v"), r.asDict().get("w"))
            for r in vt.read(clone_state["head"]).collect()
        )
        assert clone_state["rows"] == src_at, "clone != source time travel"
    print(
        f"\nEVOLUTION SOAK commits={head} retries={stats['retries']} "
        f"schema_refusals={stats['schema_refusals']} "
        f"clone_head={clone_state.get('head')}"
    )


def test_concurrent_rename_soak(spark, base):
    """Metadata-only RENAME racing an append storm — the DDL twin of
    the evolution soak.  The version claim serializes the rename:
    an old-name append either lands wholly before it, or its retry is
    refused LOUDLY by schema-on-write and the writer switches to the
    new name.  No silent name reversion, no mixed-name segment, zero
    lost rows; the final read serves every row under the FINAL name
    (pre-rename rows through the coalesce chain)."""
    root = os.path.join(base, "t")
    VersionedTable.create(
        spark, root, spark.createDataFrame([(0, 0)], "k bigint, v bigint")
    )
    n_threads, n_ops = 3, 8
    errors: list = []
    models: list[dict] = []
    stats = {"retries": 0, "schema_refusals": 0}

    def worker(tid: int) -> None:
        try:
            vt = VersionedTable(spark, root)
            lo = (tid + 1) * RANGE
            model: dict[int, int] = {}
            col = "v"
            for i in range(n_ops):
                if tid == 0 and i == n_ops // 2:
                    _retry(lambda: vt.rename_column("v", "val"), stats)
                    col = "val"
                    continue
                k = lo + i
                for _ in range(120):
                    try:
                        vt.append(
                            spark.createDataFrame(
                                [(k, i)], f"k bigint, {col} bigint"
                            )
                        )
                        model[k] = i
                        break
                    except ConcurrentCommitError:
                        stats["retries"] += 1
                        time.sleep(random.uniform(0.0, 0.02))
                    except ValueError as exc:
                        assert "schema-on-write" in str(exc)
                        stats["schema_refusals"] += 1
                        col = "val"  # the rename landed: switch names
                else:
                    raise AssertionError(f"thread {tid} starved")
            models.append(model)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors[:3]

    vt = VersionedTable(spark, root)
    head = vt.latest_version()
    assert vt._versions() == list(range(head + 1))
    assert vt.read().columns == ["k", "val"]  # the rename is the head
    rows = {r.k: r.val for r in vt.read().collect()}
    expected = {0: 0}
    for m in models:
        expected.update(m)
    assert rows == expected, "row lost/doubled or name-bled across rename"
    print(
        f"\nRENAME SOAK commits={head} retries={stats['retries']} "
        f"schema_refusals={stats['schema_refusals']}"
    )
