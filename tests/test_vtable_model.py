"""Model-checked DML sequences: a seeded random program of table
operations runs against BOTH the versioned table and a trivial
in-memory model (a dict of key→value), asserting after EVERY op that
the head read equals the model — and at the end that TIME TRAVEL to
every intermediate version reproduces that version's model snapshot
exactly (the linearizable-history check, content edition: the log is
not just gap-free, each version serves precisely the state the op
sequence had produced).

Ops drawn: append (fresh keys), append (duplicate-key rows — the table
is a multiset, modeled as counts), COW delete_where, MOR
delete_where_mor, COW update_where, MOR update_where_mor, overwrite,
compact, restore (to a random earlier version), plus no-op DML on
never-matching predicates.  Deterministic seed — failures reproduce.

Reference contract: /root/reference/SQL tables are plain multisets
with UPDATE/DELETE semantics; this pins the engine's versioned
implementation to the same observable behavior through every execution
shape (copy-on-write, merge-on-read, rewrite, metadata-only restore).
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.operators.vtable import VersionedTable

N_OPS = int(os.environ.get("EEL_MODEL_OPS", "26"))
SEED = 0xEE1


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="vtable-model-")
    yield os.path.join(d, "t")
    shutil.rmtree(d, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v bigint")


def _snapshot(model: dict[int, list[int]]) -> dict[int, tuple[int, ...]]:
    """Freeze the multiset model {k: sorted values} for later replay."""
    return {k: tuple(sorted(vs)) for k, vs in model.items() if vs}


def _table_state(vt, version=None) -> dict[int, tuple[int, ...]]:
    out: dict[int, list[int]] = {}
    for r in vt.read(version).collect():
        out.setdefault(r.k, []).append(r.v)
    return {k: tuple(sorted(vs)) for k, vs in out.items()}


def test_random_dml_program_matches_model_and_history(spark, root):
    rng = random.Random(SEED)
    model: dict[int, list[int]] = {1: [10], 2: [20], 3: [30]}
    vt = VersionedTable.create(
        spark, root, _df(spark, [(1, 10), (2, 20), (3, 30)])
    )
    # version -> expected state (only versions that changed data)
    history: dict[int, dict[int, tuple[int, ...]]] = {
        0: _snapshot(model)
    }
    next_key = 100
    for step in range(N_OPS):
        op = rng.choice(
            [
                "append",
                "append",
                "append_dup",
                "delete_cow",
                "delete_mor",
                "update_cow",
                "update_mor",
                "overwrite",
                "compact",
                "restore",
                "noop_dml",
            ]
        )
        if op == "append":
            rows = [(next_key + i, (next_key + i) * 7) for i in range(3)]
            next_key += 3
            vt.append(_df(spark, rows))
            for k, v in rows:
                model.setdefault(k, []).append(v)
        elif op == "append_dup":
            live = [k for k, vs in model.items() if vs]
            if not live:
                continue
            k = rng.choice(live)
            vt.append(_df(spark, [(k, k * 11)]))
            model[k].append(k * 11)
        elif op in ("delete_cow", "delete_mor"):
            live = [k for k, vs in model.items() if vs]
            if not live:
                continue
            k = rng.choice(live)
            cond = f"k = {k}"
            v = (
                vt.delete_where(cond)
                if op == "delete_cow"
                else vt.delete_where_mor(cond)
            )
            model[k] = []
        elif op in ("update_cow", "update_mor"):
            live = [k for k, vs in model.items() if vs]
            if not live:
                continue
            k = rng.choice(live)
            cond, setex = f"k = {k}", {"v": F.expr("v + 1")}
            (
                vt.update_where(cond, setex)
                if op == "update_cow"
                else vt.update_where_mor(cond, setex)
            )
            model[k] = [v + 1 for v in model[k]]
        elif op == "overwrite":
            rows = [(next_key, next_key * 3), (next_key + 1, 0)]
            next_key += 2
            vt.overwrite(_df(spark, rows))
            model = {}
            for k, v in rows:
                model.setdefault(k, []).append(v)
        elif op == "compact":
            vt.compact()
        elif op == "restore":
            target = rng.choice(sorted(history))
            vt.restore(target)
            model = {
                k: list(vs) for k, vs in history[target].items()
            }
        elif op == "noop_dml":
            # never-matching predicates: all four DML shapes must be
            # commit-free (the head version may not move)
            head = vt.latest_version()
            assert vt.delete_where_mor("k = -1") == head
            assert vt.update_where_mor("k = -1", {"v": F.lit(0)}) == head
            assert vt.latest_version() == head
        head = vt.latest_version()
        snap = _snapshot(model)
        got = _table_state(vt)
        assert got == snap, f"step {step} op {op}: head != model"
        history[head] = snap
    # ---- time travel: EVERY recorded version replays its exact state
    for v, snap in sorted(history.items()):
        assert _table_state(vt, v) == snap, f"time travel to v{v} diverged"
    # ---- and the change feed spans the whole history without gaps
    assert vt._versions() == list(range(vt.latest_version() + 1))
