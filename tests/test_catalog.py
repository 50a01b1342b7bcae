"""Multi-table transaction pins for the table catalog
(operators/catalog.py): cross-table snapshot isolation through the
pointer map, crash/abort invisibility, write-write conflict detection,
and disjoint-transaction interleaving.  The value parity of the
registered load query is covered by its oracle
(queries/versioned.py vtable_catalog_txn_load)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from energy_emissions_lakehouse_spark.operators.catalog import (
    CatalogConflictError,
    TableCatalog,
)
from energy_emissions_lakehouse_spark.operators.vtable import VersionedTable


@pytest.fixture()
def cat_base():
    d = tempfile.mkdtemp(prefix="catalog-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk_tables(spark, base):
    a = VersionedTable.create(
        spark,
        os.path.join(base, "a"),
        spark.range(10).select(F.col("id").alias("k")),
    )
    b = VersionedTable.create(
        spark,
        os.path.join(base, "b"),
        spark.range(5).select(F.col("id").alias("k")),
    )
    return a, b


def test_catalog_txn_is_all_or_nothing(spark, cat_base):
    """Catalog readers see either every participant's old version or
    every participant's new version — never a mix; a transaction that
    never commits (crash model) stays invisible forever."""
    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(
        spark, cat_base, {"a": a.root, "b": b.root}
    )
    txn = cat.begin()
    txn.table("a").append(spark.range(10, 20).select(F.col("id").alias("k")))
    txn.table("b").delete_where("k >= 3")
    # mid-transaction: the writes live on PRIVATE branches — neither
    # the catalog cut nor the shared source roots moved
    assert cat.read("a").count() == 10
    assert cat.read("b").count() == 5
    assert VersionedTable(spark, a.root).read().count() == 10
    v1 = txn.commit()
    assert cat.read("a", v1).count() == 20
    assert cat.read("b", v1).count() == 3
    # the pre-txn catalog version still serves the old consistent cut
    assert cat.read("a", 0).count() == 10
    assert cat.read("b", 0).count() == 5
    # the original roots were never written — the txn published BRANCHES
    assert VersionedTable(spark, a.root).read().count() == 10
    assert cat.entries()["a"]["root"] != a.root

    # crash model: writes land on the dead txn's branch only, commit()
    # never runs — the catalog keeps serving the committed cut and no
    # other root is touched
    dead = cat.begin()
    dead.table("a").delete_where("k < 100")  # empties the BRANCH head
    assert cat.read("a").count() == 20  # catalog cut untouched
    assert cat.table("a").read().count() == 20  # published root untouched


def test_catalog_txn_conflicts_and_disjoint_interleave(spark, cat_base):
    """Two transactions touching the SAME table: the second commit
    raises a write-write conflict.  Transactions over DISJOINT tables
    interleave freely (the loser of the version slot retries and
    carries the other's pointers forward)."""
    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    t1 = cat.begin()
    t2 = cat.begin()
    t1.table("a").append(spark.range(100, 101).select(F.col("id").alias("k")))
    t2.table("a").append(spark.range(200, 201).select(F.col("id").alias("k")))
    t1.commit()
    with pytest.raises(CatalogConflictError, match="moved since begin"):
        t2.commit()
    # disjoint: one touches a, the other b — both land
    t3 = cat.begin()
    t4 = cat.begin()
    t3.table("a").append(spark.range(300, 301).select(F.col("id").alias("k")))
    t4.table("b").append(spark.range(400, 401).select(F.col("id").alias("k")))
    v3 = t3.commit()
    v4 = t4.commit()
    assert v4 == v3 + 1
    ents = cat.entries()
    # t4's commit carried t3's fresh pointer forward, not begin()'s
    assert cat.read("a").where("k = 300").count() == 1
    assert cat.read("b").where("k = 400").count() == 1
    assert ents["a"]["version"] == cat.table("a").latest_version()

    # empty transaction: no catalog commit
    assert cat.begin().commit() == cat.latest_version()


def test_catalog_txn_never_publishes_foreign_rows(spark, cat_base):
    """Branch isolation: a committed transaction publishes EXACTLY its
    own writes on top of the cut it branched from — a concurrent
    transaction's rows can never ride along, and the conflicted loser's
    re-run lands its rows exactly once (no double-apply)."""
    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    t1 = cat.begin()
    t2 = cat.begin()
    t1.table("a").append(spark.createDataFrame([(111,)], "k bigint"))
    t2.table("a").append(spark.createDataFrame([(222,)], "k bigint"))
    # t2 commits FIRST: its cut must NOT contain t1's 111
    t2.commit()
    assert cat.read("a").where("k = 111").count() == 0
    assert cat.read("a").where("k = 222").count() == 1
    # t1 is the conflicted loser; its documented re-run lands 111 ONCE
    with pytest.raises(CatalogConflictError):
        t1.commit()
    retry = cat.begin()
    retry.table("a").append(spark.createDataFrame([(111,)], "k bigint"))
    retry.commit()
    got = cat.read("a")
    assert got.where("k = 111").count() == 1
    assert got.where("k = 222").count() == 1
    assert got.count() == 12  # 10 base + exactly one of each


def test_catalog_sweeps_dead_pid_orphan_branches(spark, cat_base):
    """Abandoned branches are swept at catalog open only when their
    creating process is DEAD (the pid embedded in the directory name);
    a live creator's branch survives NO MATTER ITS AGE — branch mtime
    is set at clone time and a long transaction must not be reaped —
    and referenced (committed) branches are never touched."""
    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    txn = cat.begin()
    txn.table("a").append(spark.createDataFrame([(1,)], "k bigint"))
    txn.commit()
    committed_branch = cat.entries()["a"]["root"]
    dead = cat.begin()
    orphan_root = dead.table("b").root  # never committed; OUR live pid
    assert f"-{os.getpid()}-" in os.path.basename(orphan_root)
    # live-creator orphan survives a reopen, age irrelevant
    TableCatalog(spark, cat_base)
    assert os.path.isdir(orphan_root)
    # re-stamp it as a DEAD creator's branch: swept on the next open
    dead_root = orphan_root.replace(f"-{os.getpid()}-", "-999999999-")
    os.rename(orphan_root, dead_root)
    TableCatalog(spark, cat_base)
    assert not os.path.isdir(dead_root)
    assert os.path.isdir(committed_branch)  # referenced: never swept
    assert cat.read("a").count() == 11


def test_catalog_read_only_participant_not_repointed(spark, cat_base):
    """A participant that was only READ is not repointed at commit and
    never conflicts with a concurrent real writer of that table —
    snapshot isolation, not serializability."""
    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    reader_writer = cat.begin()
    n_a = reader_writer.table("a").read().count()  # read-only access
    reader_writer.table("b").append(
        spark.createDataFrame([(int(n_a),)], "k bigint")
    )
    # a concurrent txn WRITES 'a' and commits first
    other = cat.begin()
    other.table("a").append(spark.createDataFrame([(77,)], "k bigint"))
    other.commit()
    v = reader_writer.commit()  # must NOT conflict: it only read 'a'
    ents = cat.entries(v)
    # 'a' still points at the writer's cut; 'b' carries our row
    assert cat.read("a", v).where("k = 77").count() == 1
    assert cat.read("b", v).where(f"k = {n_a}").count() == 1
    # and a genuinely empty transaction stays a no-op
    ro = cat.begin()
    ro.table("a").read().count()
    assert ro.commit() == cat.latest_version()


def test_catalog_branch_truncates_unpublished_head(spark, cat_base):
    """An out-of-band write on the shared root (past the pinned cut)
    must not leak into a transaction's branch: the branch log is
    truncated back to the pin (no restore commit — the branch's change
    feed stays readable across its whole lineage)."""
    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    # unpublished direct write on the shared root, bypassing the catalog
    VersionedTable(spark, a.root).append(
        spark.createDataFrame([(12345,)], "k bigint")
    )
    txn = cat.begin()
    branch = txn.table("a")
    assert branch.latest_version() == 0  # truncated to the pin
    assert branch.read().where("k = 12345").count() == 0
    branch.append(spark.createDataFrame([(500,)], "k bigint"))
    v = txn.commit()
    got = cat.read("a", v)
    assert got.where("k = 12345").count() == 0  # never published by us
    assert got.where("k = 500").count() == 1
    assert got.count() == 11


def test_catalog_unknown_table_and_create_validation(spark, cat_base):
    a, _ = _mk_tables(spark, cat_base)
    with pytest.raises(FileNotFoundError):
        TableCatalog.create(
            spark, os.path.join(cat_base, "c2"),
            {"a": a.root, "ghost": os.path.join(cat_base, "nope")},
        )
    cat = TableCatalog.create(
        spark, os.path.join(cat_base, "c3"), {"a": a.root}
    )
    with pytest.raises(KeyError):
        cat.read("ghost")
    with pytest.raises(KeyError):
        cat.begin().table("ghost")


def test_catalog_concurrent_disjoint_txns_stress(spark, cat_base):
    """Protocol torture: N driver threads each run transactions over
    their OWN table concurrently.  Disjoint transactions must all land
    (slot races retry internally, never conflict), and the final
    catalog pins every table's true head."""
    import threading

    n_tables, n_txns = 4, 3
    tables = {}
    for i in range(n_tables):
        root = os.path.join(cat_base, f"t{i}")
        VersionedTable.create(
            spark, root,
            spark.range(1).select(F.col("id").alias("k")),
        )
        tables[f"t{i}"] = root
    cat = TableCatalog.create(spark, cat_base, tables)
    errors: list = []

    def worker(name: str) -> None:
        try:
            for j in range(n_txns):
                txn = cat.begin()
                txn.table(name).append(
                    spark.createDataFrame([(1000 + j,)], "k bigint")
                )
                txn.commit()
        except Exception as exc:  # pragma: no cover - failure reporting
            errors.append((name, exc))

    threads = [
        threading.Thread(target=worker, args=(f"t{i}",))
        for i in range(n_tables)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    assert cat.latest_version() == n_tables * n_txns  # every txn landed
    ents = cat.entries()
    for name, root in tables.items():
        # every txn branched from the prior cut and appended once, so
        # the published branch head is exactly n_txns commits deep
        assert ents[name]["version"] == cat.table(name).latest_version()
        # the original root was never written (branch isolation)
        assert VersionedTable(spark, root).latest_version() == 0
        # and the catalog cut serves the complete table
        assert cat.read(name).count() == 1 + n_txns


def test_catalog_branch_sweep_is_hostname_aware(spark, cat_base):
    """pid liveness is only meaningful on the creating host: a
    FOREIGN-host branch whose embedded pid happens to be dead HERE must
    NOT be swept while young (on shared storage that pid may be a live
    writer on another machine) — it falls back to the mtime grace
    window; a young SAME-host dead-pid branch is swept immediately; and
    an OLD foreign-host branch is reclaimed once past the window."""
    import time

    from energy_emissions_lakehouse_spark.operators.catalog import (
        BRANCH_GRACE_S,
        _sweep_hostname,
    )

    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    ours = _sweep_hostname()
    orphan = cat.begin().table("b").root  # never committed
    base = os.path.basename(orphan)
    assert f"-{ours}-{os.getpid()}-" in base  # new name embeds host+pid
    # 1) young FOREIGN-host branch with a locally-dead pid: kept
    foreign = orphan.replace(
        f"-{ours}-{os.getpid()}-", "-some_other_host-999999999-"
    )
    os.rename(orphan, foreign)
    TableCatalog(spark, cat_base)
    assert os.path.isdir(foreign), "foreign live txn swept by pid probe"
    # 2) the SAME dead pid stamped with OUR host: swept regardless of age
    local_dead = foreign.replace(
        "-some_other_host-999999999-", f"-{ours}-999999999-"
    )
    os.rename(foreign, local_dead)
    TableCatalog(spark, cat_base)
    assert not os.path.isdir(local_dead)
    # 3) an OLD foreign-host branch falls to the grace window
    orphan2 = cat.begin().table("a").root
    foreign2 = orphan2.replace(
        f"-{ours}-{os.getpid()}-", "-some_other_host-999999999-"
    )
    os.rename(orphan2, foreign2)
    old = time.time() - BRANCH_GRACE_S - 60
    os.utime(foreign2, (old, old))
    TableCatalog(spark, cat_base)
    assert not os.path.isdir(foreign2)


def test_catalog_contended_same_table_txn_soak(spark, cat_base):
    """N threads all transact against the SAME two tables (a counter
    increment reading table 'a' and appending to both) — every commit
    races every other, so progress depends entirely on the
    conflict-retry loop.  Invariants: every logical increment lands
    exactly once (no lost updates under write-write conflicts), the
    catalog history is contiguous, and each published cut is
    consistent across both tables (reader-visible row counts always
    agree, because the pointer map is one commit)."""
    import threading

    n_threads = int(os.environ.get("EEL_SOAK_THREADS", "3"))
    n_txns = 6
    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    errors: list = []
    retry_counts = [0] * n_threads

    def worker(tid: int) -> None:
        try:
            for j in range(n_txns):
                for attempt in range(120):
                    txn = cat.begin()
                    # read-modify-write across BOTH tables: the next
                    # sequence value derives from the pinned cut of 'a'
                    seq = txn.table("a").read().where("k >= 10000").count()
                    assert seq <= n_threads * n_txns  # sane pinned read
                    row = [(10000 + tid * 1000 + j,)]
                    txn.table("a").append(
                        spark.createDataFrame(row, "k bigint")
                    )
                    txn.table("b").append(
                        spark.createDataFrame(row, "k bigint")
                    )
                    try:
                        txn.commit()
                        break
                    except CatalogConflictError:
                        retry_counts[tid] += 1
                else:
                    raise AssertionError(f"thread {tid} txn {j} starved")
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=(t,)) for t in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
    total = n_threads * n_txns
    # every increment landed exactly once, in BOTH tables
    assert cat.read("a").where("k >= 10000").count() == total
    assert cat.read("b").where("k >= 10000").count() == total
    assert cat.latest_version() == total  # one catalog commit per txn
    # consistent cuts: at EVERY catalog version the two tables agree
    for v in range(cat.latest_version() + 1):
        na = cat.read("a", v).where("k >= 10000").count()
        nb = cat.read("b", v).where("k >= 10000").count()
        assert na == nb == v, (v, na, nb)


def test_branch_sweep_toctou_refresh_rescues_midsweep_publish(
    spark, cat_base
):
    """A catalog commit can land between the sweep's referenced-set
    fold and a branch delete: two old foreign-host orphan branches are
    both sweep candidates; from inside the FIRST branch's rmtree a
    commit publishes the SECOND as table 'a''s new root.  The
    per-candidate refresh must rescue the just-published branch —
    before round 9 it was deleted and the catalog head pointed at a
    vanished root."""
    import time

    import energy_emissions_lakehouse_spark.operators.catalog as cat_mod
    from energy_emissions_lakehouse_spark.operators.catalog import (
        BRANCH_GRACE_S,
    )

    a, b = _mk_tables(spark, cat_base)
    cat = TableCatalog.create(spark, cat_base, {"a": a.root, "b": b.root})
    ours_pid = f"-{os.getpid()}-"
    roots = []
    for i in range(2):
        orphan = cat.begin().table("a").root  # clone of 'a', uncommitted
        foreign = orphan.replace(
            os.path.basename(orphan),
            f"zz{i}-other_host-999999999-{os.path.basename(orphan)[-8:]}",
        )
        assert ours_pid in orphan
        os.rename(orphan, foreign)
        old = time.time() - BRANCH_GRACE_S - 60
        os.utime(foreign, (old, old))
        roots.append(foreign)
    first, second = sorted(roots)
    state = {"published": False}
    real_rmtree = shutil.rmtree

    def publish_then_rmtree(path, *a_, **kw):
        if not state["published"] and os.path.realpath(path).startswith(
            os.path.realpath(first)
        ):
            state["published"] = True
            head = cat.latest_version()
            entries = {
                name: dict(ent) for name, ent in cat.entries(head).items()
            }
            entries["a"] = {
                "root": second,
                "version": VersionedTable(spark, second).latest_version(),
            }
            cat._commit(head + 1, entries, op="txn")
        return real_rmtree(path, *a_, **kw)

    cat_mod.shutil.rmtree = publish_then_rmtree
    try:
        TableCatalog(spark, cat_base)  # open triggers the sweep
    finally:
        cat_mod.shutil.rmtree = real_rmtree
    assert state["published"], "injection never fired"
    assert not os.path.isdir(first)  # the true orphan was reclaimed
    assert os.path.isdir(second), "mid-sweep-published branch was reaped"
    # the catalog head serves through the rescued root
    assert cat.read("a").count() == 10
