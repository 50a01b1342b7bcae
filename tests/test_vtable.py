"""ACID-semantics pins for the versioned parquet table layer
(operators/vtable.py): commit atomicity, snapshot isolation, time
travel, optimistic concurrency, change feed, compaction invariance,
vacuum retention, checkpointed log replay, and crash-orphan
invisibility.  The value parity of the staged 5-version history is
covered by the registered oracles (queries/versioned.py); these tests
pin the PROTOCOL behaviors an oracle cannot see."""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.operators.vtable import (
    CHECKPOINT_EVERY,
    ConcurrentCommitError,
    VersionedTable,
)


@pytest.fixture()
def vt_root():
    d = tempfile.mkdtemp(prefix="vtable-test-")
    yield os.path.join(d, "t")
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, root, n=20) -> VersionedTable:
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    return VersionedTable.create(spark, root, df)


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_create_append_time_travel(spark, vt_root):
    vt = _mk(spark, vt_root, n=5)
    vt.append(
        spark.range(5, 8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    assert vt.read(0).count() == 5
    assert vt.read(1).count() == 8
    assert vt.read().count() == 8  # default = latest
    assert _rows(vt.read(1))[:2] == [(0, 0), (1, 10)]
    with pytest.raises(ValueError, match="unknown version"):
        vt.read(99)


def test_snapshot_isolation_pinned_reader(spark, vt_root):
    """A resolved DataFrame must keep serving ITS snapshot across any
    number of later commits — segments are immutable and the file list
    was pinned at resolution time."""
    vt = _mk(spark, vt_root, n=10)
    pinned = vt.read(0)
    vt.delete_where("k % 2 = 0")
    vt.overwrite(
        spark.range(3).select(F.col("id").alias("k"), F.lit(0).cast("bigint").alias("v"))
    )
    assert pinned.count() == 10
    assert vt.read().count() == 3


def test_concurrent_commit_loser_raises_then_retry_wins(spark, vt_root):
    """Optimistic concurrency: the version slot is claimed atomically;
    the loser gets ConcurrentCommitError and succeeds on retry against
    the new snapshot."""
    vt = _mk(spark, vt_root, n=4)
    batch = spark.range(100, 102).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("v")
    )
    # Simulate a racing writer landing version 1 first.
    racing = VersionedTable(spark, vt_root)
    racing.append(batch)
    seg = vt._write_segment(batch, 1)
    with pytest.raises(ConcurrentCommitError):
        vt._commit(1, "append", add=[seg], remove=[], schema=batch.schema)
    # Retry at the refreshed version succeeds and both appends survive.
    assert vt.append(batch) == 2
    assert vt.read(2).count() == 8


def test_torn_commit_is_impossible_under_final_name(spark, vt_root):
    """The commit payload reaches its final name only via os.link of a
    fully written+fsynced scratch file — every *.json in the log must
    parse, and scratch files never linger."""
    vt = _mk(spark, vt_root, n=3)
    for i in range(3):
        vt.append(
            spark.range(i, i + 1).select(
                F.col("id").alias("k"), F.lit(i).cast("bigint").alias("v")
            )
        )
    log = os.path.join(vt_root, "_log")
    for name in os.listdir(log):
        assert ".tmp-" not in name
        with open(os.path.join(log, name)) as fh:
            json.load(fh)  # parses completely


def test_merge_upsert_source_wins_and_history_preserved(spark, vt_root):
    vt = _mk(spark, vt_root, n=6)
    src = spark.range(4, 9).select(
        F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("v")
    )
    vt.merge_upsert(src, keys=["k"])
    latest = dict(_rows(vt.read()))
    assert latest[0] == 0 and latest[3] == 30  # untouched
    assert all(latest[k] == -1 for k in range(4, 9))  # source won + inserts
    assert _rows(vt.read(0)) == [(k, k * 10) for k in range(6)]  # v0 intact


def test_schema_on_write_rejects_incompatible_batch(spark, vt_root):
    """Delta semantics: a mixed-type segment would poison later reads,
    so append/merge reject it at write time; overwrite may evolve."""
    vt = _mk(spark, vt_root, n=3)
    bad = spark.range(2).select(
        F.col("id").alias("k"), F.lit(0).cast("int").alias("v")
    )
    with pytest.raises(ValueError, match="schema-on-write"):
        vt.append(bad)
    with pytest.raises(ValueError, match="schema-on-write"):
        vt.merge_upsert(bad, keys=["k"])
    assert vt.latest_version() == 0  # nothing committed
    vt.overwrite(bad)  # explicit full replace MAY change the schema
    assert vt.read().schema["v"].dataType.simpleString() == "int"


def test_delete_where_null_predicate_rows_are_kept(spark, vt_root):
    """SQL DELETE semantics: only predicate-TRUE rows go; NULL-predicate
    rows stay."""
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 50)], "k bigint, v bigint"
    )
    vt = VersionedTable.create(spark, vt_root, df)
    vt.delete_where("v > 10")
    assert sorted(r.k for r in vt.read().collect()) == [1, 2]


def test_compaction_is_content_identical_and_collapses_segments(
    spark, vt_root
):
    vt = _mk(spark, vt_root, n=10)
    for i in range(4):
        vt.append(
            spark.range(100 + i, 101 + i).select(
                F.col("id").alias("k"), F.lit(i).cast("bigint").alias("v")
            )
        )
    before_version = vt.latest_version()
    before = _rows(vt.read(before_version))
    n_live_before = len(vt._snapshot(None)[1])
    assert n_live_before == 5  # create + 4 appends
    vt.compact()
    assert _rows(vt.read()) == before
    assert len(vt._snapshot(None)[1]) == 1
    # exactly one parquet part file after a coalesce(1) bin-pack
    seg = vt._snapshot(None)[1][0]
    parts = glob.glob(os.path.join(vt_root, seg, "part-*"))
    assert len(parts) == 1


def test_change_feed_classifies_insert_update_delete_only(spark, vt_root):
    vt = _mk(spark, vt_root, n=6)  # keys 0..5
    vt.delete_where("k = 0")
    vt.merge_upsert(
        spark.createDataFrame([(3, -1), (99, -1)], "k bigint, v bigint"),
        keys=["k"],
    )
    cdf = vt.change_feed(0, vt.latest_version(), keys=["k"])
    got = {
        r.k: (r.change_type, r.v_pre, r.v_post) for r in cdf.collect()
    }
    assert got == {
        0: ("delete", 0, None),
        3: ("update", 30, -1),
        99: ("insert", None, -1),
    }  # unchanged keys 1,2,4,5 absent


def test_vacuum_retains_recent_versions_and_fails_loud_on_old(
    spark, vt_root
):
    vt = _mk(spark, vt_root, n=8)
    vt.delete_where("k < 2")
    vt.delete_where("k < 4")
    deleted = vt.vacuum(retain_last=2)
    assert deleted  # v0's segment no longer referenced
    assert vt.read(1).count() == 6
    assert vt.read(2).count() == 4
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        vt.read(0)


def test_vacuum_sweeps_crash_orphans_but_never_live_segments(
    spark, vt_root
):
    """A writer that crashed after writing its segment but before its
    commit leaves an orphan: invisible to reads, reclaimed by vacuum."""
    vt = _mk(spark, vt_root, n=5)
    orphan = vt._write_segment(
        spark.range(3).select(F.col("id").alias("k"), F.lit(0).cast("bigint").alias("v")),
        version_hint=99,
    )
    assert vt.read().count() == 5  # orphan invisible
    deleted = vt.vacuum(retain_last=1)
    assert orphan in deleted
    assert vt.read().count() == 5


def test_checkpointed_replay_matches_full_replay(spark, vt_root):
    """Past CHECKPOINT_EVERY commits, snapshot resolution uses the
    checkpoint + tail; it must equal a from-genesis fold."""
    vt = _mk(spark, vt_root, n=2)
    for i in range(CHECKPOINT_EVERY + 3):
        vt.append(
            spark.range(10 + i, 11 + i).select(
                F.col("id").alias("k"), F.lit(i).cast("bigint").alias("v")
            )
        )
    v = vt.latest_version()
    assert v > CHECKPOINT_EVERY
    ckpts = [
        n
        for n in os.listdir(os.path.join(vt_root, "_log"))
        if n.endswith(".checkpoint.json")
    ]
    assert ckpts  # a checkpoint actually landed
    assert vt._resolve_live(v) == vt._resolve_live(v, use_checkpoint=False)
    assert vt.read(v).count() == 2 + CHECKPOINT_EVERY + 3


def test_staged_history_build_is_memoized_and_deterministic(spark, sf_dir):
    """The registered queries serve from ONE staged history per corpus
    version; rebuilding fresh yields identical content."""
    from energy_emissions_lakehouse_spark.queries.versioned import (
        staged_vtable,
    )

    vt1 = staged_vtable(spark, sf_dir)
    vt2 = staged_vtable(spark, sf_dir)
    assert vt1.root == vt2.root  # memo hit
    ops = [h["op"] for h in vt1.history()]
    assert ops == ["create", "append", "merge", "delete", "compact"]
    fp1 = sorted(
        (r.o_orderkey, r.o_orderstatus) for r in vt1.read(4).collect()
    )
    vt3 = staged_vtable(spark, sf_dir, fresh=True)
    fp3 = sorted(
        (r.o_orderkey, r.o_orderstatus) for r in vt3.read(4).collect()
    )
    assert fp1 == fp3
