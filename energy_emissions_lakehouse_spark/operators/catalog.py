"""Multi-table transactions over versioned tables: a catalog of
pinned table versions with one atomic pointer-swap commit.

The reference's warehouse load
(/root/reference/src/30_load/load_to_postgres.py:73-117) replaces and
upserts SEVERAL tables inside ONE Postgres transaction — a consumer
never observes table A loaded and table B not.  Per-table, the vtable
commit log (operators/vtable.py) already gives atomicity; what it
deliberately does not give is atomicity ACROSS tables.  Delta has the
same gap; Iceberg closes it at the CATALOG: a transaction commits by
atomically swapping the catalog's table→snapshot pointers, so readers
that resolve tables through the catalog see either every table's old
version or every table's new version, never a mix.  This module is
that shape, on the same commit-log primitives:

- ``<root>/_catalog/<v020>.json``: one JSON commit per catalog version
  holding the full ``{name: {root, version}}`` pointer map.  Claimed
  atomically via ``os.link`` exactly like a table commit — one writer
  wins a version slot, a half-written map is never visible under its
  final name.
- A transaction (:meth:`TableCatalog.begin`) performs ORDINARY table
  writes (each internally atomic, each optimistically concurrent),
  then commits ONE catalog entry pinning every participant's new head.
  Readers that go through :meth:`TableCatalog.read` get the pinned
  versions — cross-table snapshot isolation by construction, because a
  catalog version IS a consistent cut.
- Crash/abort semantics: a transaction that dies after some table
  commits but before the catalog swap leaves the catalog untouched —
  catalog readers keep seeing the old consistent cut; the orphaned
  table versions remain ordinary time-travelable history (and their
  segments vacuum like any other).  A retry simply re-runs the writes
  on top.  This is exactly Iceberg's catalog-level multi-table commit
  contract.
- Concurrency: catalog commits are optimistic.  ``commit()`` validates
  that no OTHER catalog commit has moved a PARTICIPATING table's
  pointer since ``begin()`` (write-write conflict → raises, like a
  lost table-commit race); non-participating tables' pointers are
  carried forward from the CURRENT head, so disjoint transactions
  interleave freely.

Scale notes (100 TB): the catalog holds O(tables) pointers — bytes of
driver metadata; the data work is whatever the per-table writes cost.
On a real deployment the ``os.link`` claim becomes the catalog
service's conditional-put / compare-and-swap, same as the table log.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from energy_emissions_lakehouse_spark.operators.vtable import (
    ConcurrentCommitError,
    VersionedTable,
    _fmt_version,
)

CATALOG_DIR = "_catalog"


class CatalogConflictError(RuntimeError):
    """Another transaction moved a participating table's pointer."""


class TableCatalog:
    """A versioned name→(table root, pinned version) map with atomic
    multi-table pointer-swap commits (Iceberg catalog shape)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._dir = os.path.join(root, CATALOG_DIR)
        if not os.path.isdir(self._dir):
            raise FileNotFoundError(f"not a catalog (no {CATALOG_DIR}/): {root}")

    # ------------------------------------------------------------------ init
    @classmethod
    def create(
        cls, spark: SparkSession, root: str, tables: dict[str, str]
    ) -> "TableCatalog":
        """Initialize with catalog version 0 pinning each table's
        CURRENT head.  ``tables`` maps name → versioned-table root; every
        root must already be a vtable (the catalog never creates
        tables, it only points at them)."""
        entries = {}
        for name, t_root in tables.items():
            vt = VersionedTable(spark, t_root)  # raises if not a table
            entries[name] = {"root": t_root, "version": vt.latest_version()}
        cat_dir = os.path.join(root, CATALOG_DIR)
        if os.path.isdir(cat_dir):
            raise FileExistsError(f"catalog already exists: {root}")
        os.makedirs(cat_dir, mode=0o700)
        cat = cls(spark, root)
        cat._commit(0, entries, op="create")
        return cat

    # ------------------------------------------------------------- log layer
    def _path(self, version: int) -> str:
        return os.path.join(self._dir, _fmt_version(version) + ".json")

    def _versions(self) -> list[int]:
        return sorted(
            int(n[: -len(".json")])
            for n in os.listdir(self._dir)
            if n.endswith(".json") and n[: -len(".json")].isdigit()
        )

    def latest_version(self) -> int:
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"empty catalog log: {self._dir}")
        return versions[-1]

    def _read(self, version: int) -> dict:
        with open(self._path(version)) as fh:
            return json.load(fh)

    def _commit(self, version: int, entries: dict, op: str) -> None:
        """Atomically claim catalog ``version`` — same scratch-then-link
        protocol as the table log: one writer wins, a torn map is never
        visible under the final name."""
        payload = {
            "version": version,
            "op": op,
            "tables": entries,
            "ts": time.time(),
        }
        final = self._path(version)
        scratch = f"{final}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        with open(scratch, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(scratch, final)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"catalog version {version} of {self.root} was committed "
                "by another writer — re-read and retry"
            ) from None
        finally:
            os.unlink(scratch)

    # --------------------------------------------------------------- reading
    def entries(self, version: int | None = None) -> dict[str, dict]:
        """The pinned ``{name: {root, version}}`` map at a catalog
        version (default: head)."""
        if version is None:
            version = self.latest_version()
        return self._read(version)["tables"]

    def table(self, name: str, version: int | None = None) -> VersionedTable:
        ent = self.entries(version).get(name)
        if ent is None:
            raise KeyError(f"catalog has no table {name!r}")
        return VersionedTable(self.spark, ent["root"])

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read ``name`` at the catalog's pinned table version — the
        consistent-cut read.  Two ``read`` calls against the SAME
        catalog version can never observe a torn multi-table
        transaction, because the pointer map is one immutable commit."""
        ent = self.entries(version).get(name)
        if ent is None:
            raise KeyError(f"catalog has no table {name!r}")
        return VersionedTable(self.spark, ent["root"]).read(ent["version"])

    def history(self) -> list[dict]:
        return [self._read(v) for v in self._versions()]

    # ---------------------------------------------------------- transactions
    def begin(self) -> "CatalogTransaction":
        """Start a multi-table transaction against the current head."""
        return CatalogTransaction(self)


class CatalogTransaction:
    """Write-side of the multi-table commit: perform ordinary vtable
    writes on tables obtained via :meth:`table`, then :meth:`commit`
    swaps every participant's catalog pointer in ONE atomic catalog
    commit.  Nothing is visible through the catalog until then."""

    def __init__(self, catalog: TableCatalog):
        self.catalog = catalog
        self.base_version = catalog.latest_version()
        self.base = catalog.entries(self.base_version)
        self._touched: set[str] = set()

    def table(self, name: str) -> VersionedTable:
        """The writable table handle for a participant.  Writes go to
        the table's OWN log as usual (each internally atomic); the
        catalog pointer moves only at :meth:`commit`."""
        ent = self.base.get(name)
        if ent is None:
            raise KeyError(f"catalog has no table {name!r}")
        self._touched.add(name)
        return VersionedTable(self.catalog.spark, ent["root"])

    def commit(self, retries: int = 16) -> int:
        """Atomically publish every participant's current head in one
        catalog commit.  Optimistic: if ANOTHER transaction moved a
        PARTICIPATING pointer since begin(), raises
        :class:`CatalogConflictError` (write-write conflict — the
        caller re-runs the transaction); pointers of non-participating
        tables are carried forward from the current head so disjoint
        transactions interleave without conflict."""
        if not self._touched:
            return self.base_version  # nothing written: no-op
        new_heads = {
            name: VersionedTable(
                self.catalog.spark, self.base[name]["root"]
            ).latest_version()
            for name in self._touched
        }
        for _ in range(retries):
            head_v = self.catalog.latest_version()
            current = self.catalog.entries(head_v)
            conflicted = [
                name
                for name in self._touched
                if current[name]["version"] != self.base[name]["version"]
            ]
            if conflicted:
                raise CatalogConflictError(
                    f"table(s) {sorted(conflicted)} moved since begin() "
                    f"(catalog v{self.base_version} -> v{head_v}) — "
                    "re-run the transaction against the new snapshot"
                )
            entries = {
                name: dict(ent) for name, ent in current.items()
            }
            for name in self._touched:
                entries[name] = {
                    "root": self.base[name]["root"],
                    "version": new_heads[name],
                }
            try:
                self.catalog._commit(head_v + 1, entries, op="txn")
                return head_v + 1
            except ConcurrentCommitError:
                continue  # a DISJOINT txn won the slot: re-validate, retry
        raise ConcurrentCommitError(
            f"catalog txn: lost {retries} consecutive commit races"
        )
