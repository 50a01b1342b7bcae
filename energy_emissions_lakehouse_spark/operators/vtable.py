"""Versioned parquet tables: a minimal ACID commit-log layer ("vtable").

The sandbox has no Delta/Iceberg/Avro jars (README "Blocked table
formats"), so the warehouse-load surface of the reference
(/root/reference/src/30_load/load_to_postgres.py:73-117 — transactional
replace + upsert into Postgres) has so far been oracle-verified over
plain parquet WITHOUT commit atomicity, snapshot isolation, time travel
or a change feed.  This module closes that gap natively, following the
publicly documented Delta Lake transaction-log protocol
(github.com/delta-io/delta PROTOCOL.md) and the Iceberg snapshot model,
re-expressed in ~pure PySpark + stdlib:

- ``<root>/data/<version>-<uuid>/``: immutable parquet segments, written
  once by a distributed Spark job and NEVER mutated.  A segment is
  invisible until a commit references it, so a crashed writer strands an
  orphan (swept by ``vacuum``), never a torn table.
- ``<root>/_log/<v020>.json``: one JSON commit per version holding the
  ``add``/``remove`` segment lists, the operation, and the schema.  A
  commit is claimed atomically: the payload is fully written to a
  scratch file, then ``os.link``ed to its final name — POSIX ``link``
  fails with EEXIST if the version is taken, so exactly one writer wins
  and readers can never observe a half-written commit.  This is the
  single-node analogue of Delta's conditional-put / rename-commit on
  object stores.
- ``<root>/_log/<v020>.checkpoint.json``: every CHECKPOINT_EVERY commits
  the live-segment state is checkpointed, so snapshot resolution replays
  only the tail instead of the whole log.  Sidecar form (Delta V2
  checkpoints + sidecars, simplified to JSON): the main file carries the
  small folds (txns, DVs, constraints) plus references to immutable
  ``<v020>.<uuid>.sidecar.json`` files of up to SIDECAR_MAX segments'
  metadata each; per checkpoint only the sidecars the tail touched are
  rewritten, so checkpoint-commit cost is O(tail + dirty), not O(live).
  Round-11 inline checkpoints stay readable (upgraded at the next
  checkpoint write).

Concurrency contract (optimistic, Delta-style): writers read a snapshot,
write new segments, then attempt the ``snapshot_version + 1`` commit.  A
lost race first goes through SEMANTIC conflict resolution (Delta's
ConflictChecker): the operation is re-validated against every
interleaved commit and auto-rebased — the same already-written segments
re-attempted at the new head, no data-job re-run — when provably
disjoint (blind appends vs any data commit; DML whose read
probes/removes are disjoint from the interleaved adds/removes, proven
from log stats and partition values; compaction vs appends).  Only TRUE
conflicts surface, as typed :class:`ConcurrentCommitError` subclasses
(:class:`MetadataChangedError`, :class:`ConcurrentAppendError`,
:class:`ConcurrentDeleteReadError`, :class:`ConcurrentDeleteDeleteError`),
and the caller must then re-derive against the new snapshot (orphaned
segments are vacuumable).
Readers resolve a version's segment list eagerly, so a DataFrame handle
is pinned to its snapshot — immutable segments make reads repeatable
regardless of later commits (snapshot isolation by construction).

Scale notes (100 TB): data operations are ordinary distributed Spark
jobs over parquet; only O(#segments) path metadata ever crosses the
driver, exactly like Delta's log.  Commits fold per-segment min/max
column stats from the parquet footers (Iceberg manifests), which powers
file-level range pruning (:meth:`read_pruned`) and the touched-file
MERGE (:meth:`merge_upsert_pruned` — only segments whose key range
overlaps the source are rewritten; ``merge_upsert``/``delete_where``
remain the whole-set copy-on-write forms).  On a real cluster the log
lives on an object store with conditional-put (or a log store service)
instead of POSIX ``link``.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import shutil
import re
import struct
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

LOG_DIR = "_log"
DATA_DIR = "data"
#: Change-data segments (Delta's _change_data): written AT COMMIT TIME by
#: merge/delete when the table was created with ``enable_cdf=True``.
CDF_DIR = "cdf"
#: Deletion-vector files (Delta deletion vectors / Iceberg positional
#: deletes): tiny parquet files of (segment, file, position) identities
#: written by merge-on-read deletes.  A data row is live iff its
#: position is in no active DV — reads apply one broadcast anti-join.
DV_DIR = "dv"
#: Per-segment bloom-filter sidecars (Delta's bloom filter index): one
#: JSON per data segment, named after it, holding a packed bitset per
#: indexed column.  Powers point-lookup file pruning where min/max
#: stats cannot (high-cardinality column, layout clustered by another).
INDEX_DIR = "_index"
#: Column names the DV machinery appends to identified scans — user
#: schemas must not collide (enforced at segment write time).
_DV_IDENTITY_COLS = ("_dv_seg", "_dv_file", "_dv_pos")
#: Column names the change-feed / provenance READ surfaces append to
#: served rows.  Unlike the DV identity triple these are NOT rejected
#: at write time — a CDC-ingest table may legitimately STORE such a
#: column (pinned in tests) — so the appending read surfaces reject
#: the clash at read time instead, like the streaming readChangeFeed.
_FEED_COLS = ("_change_type", "_commit_version")
#: Column types whose Spark cast-to-string equals Python's str() on the
#: probe value — the precondition for bloom indexing (see create()).
_BLOOMABLE_TYPES = {"tinyint", "smallint", "int", "bigint", "string"}
#: CHECK-constraint names must be identifier-shaped: they are embedded in
#: the ``stack()`` literal of :meth:`VersionedTable.validate_constraints`
#: and in error messages — a quote or comma would corrupt both.
_CONSTRAINT_NAME_OK = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)
#: Checkpoint the full live-segment set every N commits (bounds replay).
CHECKPOINT_EVERY = 8
#: max live segments per checkpoint sidecar file (Delta V2 checkpoint
#: sidecars): a drip-feed append workload rewrites ONE file of at most
#: this many entries per checkpoint, whatever the history depth.
SIDECAR_MAX = 512


def _chunks(items: list, n: int):
    for i in range(0, len(items), n):
        yield items[i : i + n]

#: DV fast-path bounds: deletion vectors are read DRIVER-SIDE and applied
#: as per-file position filters (InSet on _metadata.row_index — no per-row
#: string hashing) only while they are metadata-sized.  Past any bound the
#: scan falls back to the broadcast anti-join, which scales with the data.
_DV_DRIVER_MAX_BYTES = 64 << 20
_DV_MAX_FILE_BRANCHES = 256
_DV_MAX_POSITIONS_PER_FILE = 200_000

#: Memoized driver-side DV content, keyed on (root, active dv set).  DV
#: files are immutable once committed (and never vacuumed while active),
#: so the fold can never go stale; a bounded size keeps a long-running
#: session from accumulating dead tables' masks.
_DV_POS_MEMO: dict[tuple, dict | None] = {}
_DV_POS_MEMO_MAX = 64
#: distinguishes "not cached" from a memoized None (fallback) verdict
_DV_MEMO_MISSING = object()


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first.  Optimistic-concurrency
    contract: re-read the latest snapshot, re-derive the operation against
    it, and retry at the new version (the Delta PROTOCOL.md loop).

    Since round 11 the write paths first try SEMANTIC conflict resolution
    (Delta's ConflictChecker, PROTOCOL.md "Concurrency Control"): a lost
    race is re-validated against the interleaved commits and auto-rebased
    when provably disjoint — only TRUE conflicts surface, as one of the
    typed subclasses below, and the caller must then re-derive."""


class MetadataChangedError(ConcurrentCommitError):
    """An interleaved commit changed table metadata (schema shape, partition
    spec, rename/drop/widen chains, constraints, or a restore) — the lost
    operation was derived under metadata that no longer holds (Delta's
    MetadataChangedException / ProtocolChangedException)."""


class ConcurrentAppendError(ConcurrentCommitError):
    """An interleaved commit ADDED files that may match the lost
    operation's read predicate — rows the operation should have seen
    (Delta's ConcurrentAppendException, serializable isolation)."""


class ConcurrentDeleteReadError(ConcurrentCommitError):
    """An interleaved commit REMOVED (or DV-masked) files the lost
    operation read — its scan is stale (Delta's
    ConcurrentDeleteReadException)."""


class ConcurrentDeleteDeleteError(ConcurrentCommitError):
    """An interleaved commit REMOVED files the lost operation also
    removes — both rewrote the same data (Delta's
    ConcurrentDeleteDeleteException)."""


class ConstraintViolationError(ValueError):
    """A write carried rows violating an active CHECK constraint (Delta
    constraints semantics: the batch is rejected WHOLE, the table is
    untouched, and the offending segment is cleaned up before raising)."""


def _fmt_version(version: int) -> str:
    return f"{version:020d}"


# Module-level log helpers, shared with the streaming source
# (sources/vtable_stream.py) so there is exactly ONE implementation of
# "what is a commit file" — a second copy once dropped the isdigit guard
# and crashed on stray JSON in _log/.

def log_versions(root: str) -> list[int]:
    """All committed versions under ``root``, oldest first.  Non-numeric
    .json files (future protocol/metadata files, editor artifacts) are
    ignored by design."""
    out = []
    for name in os.listdir(os.path.join(root, LOG_DIR)):
        if name.endswith(".json") and not name.endswith(".checkpoint.json"):
            stem = name[: -len(".json")]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def read_commit(root: str, version: int) -> dict:
    with open(
        os.path.join(root, LOG_DIR, _fmt_version(version) + ".json")
    ) as fh:
        return json.load(fh)


#: lossless widenings the parquet scan layer performs at read time
#: (verified against Spark 4.1's vectorized reader: a file written
#: narrow is served wide with no rewrite).  Keyed by simpleString.
_WIDEN_OK: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "double"},
    "smallint": {"int", "bigint", "double"},
    "int": {"bigint", "double"},
    "float": {"double"},
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+),(\d+)\)$")

#: Partition-spec transforms (Iceberg hidden-partitioning shape).  Each
#: spec field is {"col": source column, "transform": name, "param": int
#: or None}; the TRANSFORMED value is what segments record and what
#: pruning compares — queries keep filtering on the SOURCE column and
#: never see the partitioning (that is the 'hidden' part).
_SPEC_TRANSFORMS = ("identity", "year", "month", "day", "bucket", "truncate")
#: transforms whose output preserves the source ordering — a range probe
#: [lo, hi] on the source maps to [T(lo), T(hi)] on partition values
_MONOTONE_TRANSFORMS = {"identity", "year", "month", "day", "truncate"}
#: date/timestamp-only transforms
_TEMPORAL_TRANSFORMS = {"year", "month", "day"}


def _spec_key(field: dict) -> str:
    """Canonical field key, e.g. ``month(o_orderdate)`` /
    ``bucket(o_custkey,4)`` — the name segments' pv maps are keyed by."""
    param = field.get("param")
    inner = field["col"] + (f",{param}" if param is not None else "")
    return f"{field['transform']}({inner})"


def _spec_expr(field: dict) -> Column:
    """Spark-side transform expression (what the partitioned write
    splits on).  The bucket hash is the repo's portable md5 primitive —
    ``conv(substr(md5(cast(x as string)),1,15),16,10) % n`` — identical
    to Python's ``int(md5(str(x))[:15], 16) % n`` for integral/string
    columns (enforced at set_partition_spec), so the PLANNER can bucket
    a probe value without a Spark job."""
    c, t, p = F.col(field["col"]), field["transform"], field.get("param")
    if t == "identity":
        return c
    if t == "year":
        return F.year(c)
    if t == "month":
        return F.date_format(c, "yyyy-MM")
    if t == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if t == "bucket":
        return F.pmod(
            F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(int(p)),
        )
    if t == "truncate":
        return c - F.pmod(c, F.lit(int(p)))
    raise ValueError(f"unknown partition transform {t!r}")


def _spec_probe(field: dict, value):
    """Driver-side twin of :func:`_spec_expr`: transform a PROBE value
    the way the write transformed the data, with no Spark job.  None in,
    None out (an open bound stays open).

    STRICT about probe types — raises TypeError (callers scan) rather
    than coercing: ``str()`` of a cross-typed probe can differ from the
    engine's rendering of the stored value (md5("5.0") != md5("5");
    str(datetime) != the stored date string), and a coerced mismatch
    would PRUNE A HOLDING SEGMENT — the one unforgivable direction.
    Bucket probes must be int/str (the same rule as prune_point: those
    are the types whose str(x) provably equals Spark's
    cast-to-string); identity probes must be scalar; temporal
    transforms accept date/datetime/ISO strings (prefix extraction is
    rendering-independent)."""
    import datetime as _dt

    if value is None:
        return None
    t, p = field["transform"], field.get("param")
    if t == "identity":
        if isinstance(value, bool) or not isinstance(
            value, (int, float, str)
        ):
            raise TypeError(
                f"identity partition probe must be scalar, got "
                f"{type(value).__name__}"
            )
        return value
    if t in _TEMPORAL_TRANSFORMS:
        if isinstance(value, (_dt.date, _dt.datetime)):
            iso = value.strftime("%Y-%m-%d")
        elif isinstance(value, str):
            iso = value
        else:
            raise TypeError(
                f"{t} partition probe must be date/datetime/ISO string, "
                f"got {type(value).__name__}"
            )
        return (
            int(iso[:4]) if t == "year"
            else iso[:7] if t == "month"
            else iso[:10]
        )
    if t == "bucket":
        if isinstance(value, bool) or not isinstance(value, (int, str)):
            raise TypeError(
                "bucket partition probe must be int or str "
                f"(portable-hash contract), got {type(value).__name__}"
            )
        digest = hashlib.md5(str(value).encode("utf-8")).hexdigest()
        return int(digest[:15], 16) % int(p)
    if t == "truncate":
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise TypeError(
                "truncate partition probe must be numeric, got "
                f"{type(value).__name__}"
            )
        return value - (value % int(p))
    raise ValueError(f"unknown partition transform {t!r}")


_SIZE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _parse_size_conf(raw) -> int | None:
    """Spark size-conf string ('10485760b', '64MB', '1g', '-1') ->
    bytes; None when unparsable (callers must then take the
    conservative branch, never a hardcoded default)."""
    if raw is None:
        return None
    m = re.match(r"^\s*(-?\d+)\s*([a-zA-Z]*)\s*$", str(raw))
    if not m:
        return None
    mult = _SIZE_SUFFIX.get(m.group(2).lower())
    if mult is None:
        return None
    return int(m.group(1)) * mult


_SPEC_KEY_RE = re.compile(
    r"^(identity|year|month|day|bucket|truncate)\((\w+)(?:,(\d+))?\)$"
)

#: integer widths whose str(x) rendering is identical for the same value
#: — the one type family a spec source may change within and keep its
#: partition-value rendering (md5(str(5)) is width-independent).
_INTEGRAL_TYPES = frozenset(("tinyint", "smallint", "int", "bigint"))


def _spec_type_stable(
    spec: list, old_types: dict, new_types: dict
) -> bool:
    """True when every partition-spec source column exists in
    ``new_types`` AND its new type renders partition values identically
    to the old one (same type, or both within the integer ladder).  A
    type-evolving replace that fails this (e.g. int -> double on a
    bucket source) would record pv values under the NEW rendering
    (md5("5.0")) while :func:`_spec_probe` hashes the probe's rendering
    (md5("5")) — partition_skips could then skip a HOLDING segment.
    Callers must write unpartitioned and reset the spec instead."""
    for field in spec:
        old = old_types.get(field["col"])
        new = new_types.get(field["col"])
        if new is None:
            return False
        if new == old:
            continue
        if old in _INTEGRAL_TYPES and new in _INTEGRAL_TYPES:
            continue
        return False
    return True


def _parse_spec_key(key: str) -> dict | None:
    m = _SPEC_KEY_RE.match(key)
    if not m:
        return None
    return {
        "col": m.group(2),
        "transform": m.group(1),
        "param": int(m.group(3)) if m.group(3) else None,
    }


def partition_skips(
    pv: dict, col: str, lo, hi, is_point: bool = False
) -> bool:
    """True when a segment's recorded partition values PROVE it holds no
    row with ``lo <= col <= hi``.  The transform is decoded from the pv
    KEY itself (``month(o_orderdate)`` etc.), so each segment is judged
    under the spec IT WAS WRITTEN WITH — exactly Iceberg's
    spec-evolution contract, with no era bookkeeping: a segment whose pv
    has no field on ``col`` (pre-spec, or an evolved-away field) is
    never skipped here.  Bucket fields prune only equality probes (hash
    order is meaningless for ranges); anything incomparable falls back
    to scan — pruning may only ever skip provably-disjoint segments."""
    for key, val in (pv or {}).items():
        field = _parse_spec_key(key)
        if field is None or field["col"] != col or val is None:
            continue
        t = field["transform"]
        if t in _MONOTONE_TRANSFORMS:
            try:
                plo = _spec_probe(field, lo)
                phi = _spec_probe(field, hi)
                if plo is not None and val < plo:
                    return True
                if phi is not None and val > phi:
                    return True
            except TypeError:
                continue  # incomparable probe: never skip on it
        elif t == "bucket" and is_point and lo is not None and lo == hi:
            try:
                if val != _spec_probe(field, lo):
                    return True
            except TypeError:
                continue  # cross-typed probe: never skip on it
    return False


def _is_widening(frm, to) -> bool:
    """True when ``frm -> to`` is a LOSSLESS type widening the read
    layer supports (Delta's type-widening matrix, numeric subset):
    byte/short/int up the integer ladder or to double, float->double,
    and decimal(p,s)->decimal(p',s') growing both the integer digits
    (p-s) and the scale monotonically.  Everything else — narrowing,
    cross-family, string/binary — is NOT widening."""
    a, b = frm.simpleString(), to.simpleString()
    if a == b:
        return False
    if b in _WIDEN_OK.get(a, ()):
        return True
    ma, mb = _DECIMAL_RE.match(a), _DECIMAL_RE.match(b)
    if ma and mb:
        p1, s1 = int(ma.group(1)), int(ma.group(2))
        p2, s2 = int(mb.group(1)), int(mb.group(2))
        return s2 >= s1 and (p2 - s2) >= (p1 - s1) and (p2, s2) != (p1, s1)
    return False


def _violation_pred(expr_sql: str) -> Column:
    """A row VIOLATES a CHECK constraint iff the predicate is FALSE.
    SQL-standard CHECK semantics: UNKNOWN (null) passes — so ``NOT NULL``
    must be spelled explicitly (``c IS NOT NULL``), exactly like ANSI
    table constraints and Delta's CHECK."""
    return ~F.coalesce(F.expr(expr_sql), F.lit(True))


def _check_constraint_defs(
    spark: SparkSession, constraints: dict[str, str], schema: StructType
) -> None:
    """Reject malformed constraint DEFINITIONS (names and expressions)
    without touching any data: the expression is analyzed against a
    zero-row local relation of the table schema, so an unresolvable
    column or a parse error surfaces here — cheap enough to run before
    any mkdir/write."""
    for name, expr_sql in constraints.items():
        if not name or not set(name) <= _CONSTRAINT_NAME_OK:
            raise ValueError(
                f"constraint name {name!r} must be a non-empty "
                "[A-Za-z0-9_] identifier (it is embedded in the "
                "validation stack() literal and error messages)"
            )
        if not isinstance(expr_sql, str) or not expr_sql.strip():
            raise ValueError(
                f"constraint {name!r}: expression must be a non-empty "
                "SQL predicate string"
            )
        # empty local relation: full analysis (resolution + type check),
        # zero scan.  collect() forces it; the result is always [].
        spark.createDataFrame([], schema).where(
            _violation_pred(expr_sql)
        ).collect()


class VersionedTable:
    """Handle on a vtable root.  All mutating ops append ONE commit."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._log_dir = os.path.join(root, LOG_DIR)
        if not os.path.isdir(self._log_dir):
            raise FileNotFoundError(
                f"not a versioned table (no {LOG_DIR}/): {root}"
            )

    # ------------------------------------------------------------------ init
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        enable_cdf: bool = False,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 1 << 19,
        bloom_k: int = 5,
        constraints: dict[str, str] | None = None,
        ndv_cols: list[str] | None = None,
    ) -> "VersionedTable":
        """Initialize ``root`` with version 0 = ``df``.  Fails if a log
        already exists (use :meth:`overwrite` to replace content).
        ``enable_cdf`` is the table property (Delta's
        ``delta.enableChangeDataFeed``): merge/delete commits then write
        row-level change segments under ``cdf/`` in the same commit, for
        the streaming change feed (sources/vtable_stream.py).
        ``bloom_cols`` (Delta's bloom-filter index table property): every
        data segment committed from then on gets a per-column bloom
        sidecar under ``_index/`` powering :meth:`read_point` file
        pruning.  Indexable columns are INTEGRAL or STRING only — the
        probe hashes the value's canonical string, which matches Spark's
        cast-to-string exactly for those families; a float/bool/
        timestamp column's Spark rendering differs from Python's, and a
        representation mismatch would prune a segment that HOLDS the
        value (a false NEGATIVE — unlike a false positive, a correctness
        bug), so such columns are rejected at create time.  Sizing rule:
        ``bloom_bits`` ≈ 10× the expected rows per segment gives ~1%
        false-positive rate at ``bloom_k=5``; a false positive only
        costs a scan, never correctness.
        ``constraints`` (Delta's CHECK constraints,
        ``delta.constraints.<name>``): a ``{name: sql_predicate}`` map
        every later write is validated against — see
        :meth:`add_constraint` for the semantics.  The initial ``df``
        must satisfy them too; a violating create tears the whole root
        back down (nothing referenced it yet) so the call is safely
        retryable."""
        # validate BEFORE any mkdir: a rejected create must leave no
        # half-created root (the retry would hit 'already exists')
        clash = [c for c in df.columns if c in _DV_IDENTITY_COLS]
        if clash:
            raise ValueError(
                f"column {clash[0]!r} collides with the reserved "
                f"deletion-vector identity names {_DV_IDENTITY_COLS}"
            )
        if bloom_cols:
            if bloom_bits < 64 or bloom_k < 1:
                raise ValueError("bloom_bits must be >= 64, bloom_k >= 1")
            types = {f.name: f.dataType.simpleString() for f in df.schema}
            bad = [
                c for c in bloom_cols
                if types.get(c) not in _BLOOMABLE_TYPES
            ]
            if bad:
                raise ValueError(
                    f"bloom_cols: {bad[0]!r} is "
                    f"{types.get(bad[0], 'absent')} — bloom indexing "
                    f"supports {sorted(_BLOOMABLE_TYPES)} columns only "
                    "(canonical-string hashing; see create docstring)"
                )
        if ndv_cols:
            # per-commit HLL NDV sketches (Iceberg's Theta-sketch puffin
            # / Delta's dataSkippingStatsColumns analog): each data
            # commit adds one HLL sketch per configured column per
            # segment, folded to a table-level NDV estimate the planner
            # consumes (table_ndv / distinct_filter).  Sketchable types
            # follow hll_sketch_agg's domain.
            types = {f.name: f.dataType.simpleString() for f in df.schema}
            bad = [
                c for c in ndv_cols
                if types.get(c)
                not in ("tinyint", "smallint", "int", "bigint", "string")
            ]
            if bad:
                raise ValueError(
                    f"ndv_cols: {bad[0]!r} is "
                    f"{types.get(bad[0], 'absent')} — NDV sketching "
                    "supports integral and string columns "
                    "(hll_sketch_agg domain)"
                )
            if "__hll__" in types or "__mcv__" in types:
                raise ValueError(
                    "ndv_cols: a column named '__hll__'/'__mcv__' "
                    "collides with a reserved per-segment stats key in "
                    "the commit log — rename it or skip NDV sketching"
                )
        if constraints:
            # still pre-mkdir: bad names/expressions must reject the
            # create before anything lands on disk.  (Whether the DATA
            # satisfies them needs the written segment — that failure
            # path tears the root down below.)
            _check_constraint_defs(spark, constraints, df.schema)
        log_dir = os.path.join(root, LOG_DIR)
        if os.path.isdir(log_dir):
            raise FileExistsError(f"versioned table already exists: {root}")
        os.makedirs(log_dir, mode=0o700)
        os.makedirs(os.path.join(root, DATA_DIR), mode=0o700, exist_ok=True)
        table = cls(spark, root)
        props: dict = {"enableChangeDataFeed": bool(enable_cdf)}
        # pre-seed the property caches: the v0 _commit below runs before
        # commit 0 exists on disk, so the lazy commit-0 read would fail
        table._bloom_props = ([], 0, 0)
        if bloom_cols:
            props["bloomFilterColumns"] = list(bloom_cols)
            props["bloomBits"] = int(bloom_bits)
            props["bloomK"] = int(bloom_k)
            os.makedirs(os.path.join(root, INDEX_DIR), mode=0o700)
            table._bloom_props = (list(bloom_cols), bloom_bits, bloom_k)
        if constraints:
            props["constraints"] = dict(constraints)
        table._ndv_cols = list(ndv_cols or [])
        if ndv_cols:
            props["ndvColumns"] = list(ndv_cols)
        add = [table._write_segment(df, 0)]
        if constraints:
            # data validation needs the written segment (the input plan
            # is computed exactly once); a violation means NOTHING ever
            # referenced this root — tear down what THIS create made
            # (the root directory may pre-exist with unrelated user
            # files, which must survive) so the call is retryable, then
            # raise like any rejected write
            try:
                table._enforce_constraints(add, dict(constraints), "create")
            except ConstraintViolationError:
                for sub in (LOG_DIR, DATA_DIR, INDEX_DIR):
                    shutil.rmtree(
                        os.path.join(root, sub), ignore_errors=True
                    )
                try:
                    os.rmdir(root)  # only if nothing else lives there
                except OSError:
                    pass
                raise
        table._commit(
            0, "create", add=add, remove=[], schema=df.schema,
            extra={"properties": props},
        )
        return table

    @property
    def cdf_enabled(self) -> bool:
        """The table property from the create commit (commit 0)."""
        if not hasattr(self, "_cdf_enabled"):
            self._cdf_enabled = bool(
                self._read_commit(0)
                .get("properties", {})
                .get("enableChangeDataFeed", False)
            )
        return self._cdf_enabled

    @property
    def ndv_cols(self) -> list[str]:
        """Columns with per-commit HLL NDV sketches (create-time table
        property ``ndvColumns``, cached like the bloom props)."""
        if not hasattr(self, "_ndv_cols"):
            self._ndv_cols = list(
                self._read_commit(0)
                .get("properties", {})
                .get("ndvColumns", [])
            )
        return self._ndv_cols

    @property
    def bloom_props(self) -> tuple[list[str], int, int]:
        """(bloom columns, bits, hash count) from the create commit —
        ([], 0, 0) when the table has no bloom index."""
        if not hasattr(self, "_bloom_props"):
            props = self._read_commit(0).get("properties", {})
            self._bloom_props = (
                list(props.get("bloomFilterColumns", [])),
                int(props.get("bloomBits", 0)),
                int(props.get("bloomK", 0)),
            )
        return self._bloom_props

    # ----------------------------------------------------- CHECK constraints
    def constraints(self, version: int | None = None) -> dict[str, str]:
        """The CHECK constraints active at ``version`` (Delta's
        ``delta.constraints.*`` table properties): the newest
        ``set_constraint`` commit at or before it wins, falling back to
        the create-time map.  Constraints are governance metadata, not
        data — :meth:`restore` does NOT revert them (a loosened check
        must not silently re-tighten because someone restored data) —
        though a restore DOES re-validate against checks added since its
        target (see :meth:`restore`).  O(tail) via the checkpointed map,
        like the txn fold; pre-rev checkpoints (no ``constraints`` key)
        fall back to the genesis walk — slower, never wrong."""
        if version is None:
            # only the head-defaulting path needs the O(history) log
            # listing — an explicit version (every checkpoint write)
            # must not pay a listdir over the whole log per call
            versions = self._versions()
            if not versions:
                return {}
            version = versions[-1]
        floor, fallback = -1, None
        ckpt = self._latest_checkpoint(version)
        if ckpt is not None and "constraints" in ckpt:
            floor = ckpt["version"]
            fallback = dict(ckpt["constraints"])
        # contiguous log: the candidate tail is a range (the full list
        # comp was O(history) python work per fold at deep logs)
        for v in range(version, floor, -1):
            entry = self._read_commit(v)
            if "constraints" in entry:
                return dict(entry["constraints"])
            if v == 0:
                return dict(
                    entry.get("properties", {}).get("constraints", {})
                )
        return fallback if fallback is not None else {}

    def _enforce_constraints(
        self, rels: list[str], cons: dict[str, str], op: str
    ) -> None:
        """Validate freshly WRITTEN segments against ``cons`` — one
        aggregate job over the new files only (never the table), all
        constraints folded into a single pass.  This is the Delta shape:
        enforcement cost is O(delta), not O(table); here it is a second
        scan of the just-written parquet rather than inline write-job
        checks, trading one small re-read for keeping every writer on
        the plain DataFrame writer.  On violation the segments are
        deleted (nothing referenced them yet) and the whole batch is
        rejected — the table is untouched."""
        if not cons or not rels:
            return
        seg = self.spark.read.parquet(
            *(os.path.join(self.root, r) for r in rels)
        )
        names = sorted(cons)
        try:
            row = seg.agg(
                *[
                    F.sum(
                        F.when(_violation_pred(cons[n]), 1).otherwise(0)
                    ).alias(n)
                    for n in names
                ]
            ).collect()[0]
        except Exception as exc:
            # e.g. overwrite() evolved the schema out from under a
            # constraint that references a now-dropped column: the check
            # cannot be evaluated, so the write must not land — clean up
            # and reject loudly (Delta requires dropping the constraint
            # before an incompatible schema change, same contract here)
            for r in rels:
                shutil.rmtree(
                    os.path.join(self.root, r), ignore_errors=True
                )
            raise ConstraintViolationError(
                f"{op}: active CHECK constraint(s) {names} could not be "
                "evaluated against the written batch (incompatible "
                "schema change? drop_constraint first) — batch rejected, "
                f"table unchanged [{exc}]"
            ) from exc
        bad = {n: int(row[n]) for n in names if row[n]}
        if bad:
            for r in rels:
                shutil.rmtree(
                    os.path.join(self.root, r), ignore_errors=True
                )
            worst = max(bad, key=bad.get)
            raise ConstraintViolationError(
                f"{op}: {sum(bad.values())} row(s) violate CHECK "
                f"constraint(s) {sorted(bad)} (e.g. {worst!r}: "
                f"{cons[worst]}) — batch rejected, table unchanged"
            )

    def add_constraint(self, name: str, expr_sql: str) -> int:
        """ALTER TABLE ADD CONSTRAINT (Delta CHECK semantics): the
        predicate must hold on EVERY current row — validated with one
        aggregate over the head snapshot before the metadata commit —
        and every later write is validated against it at segment-write
        time.  UNKNOWN passes (ANSI CHECK); spell NOT NULL explicitly."""
        v, live, dvs, entry = self._snapshot_state(None)
        cons = self.constraints(v)
        if name in cons:
            raise ValueError(
                f"constraint {name!r} already exists: {cons[name]!r} "
                "(drop_constraint first to replace it)"
            )
        schema = StructType.fromJson(entry["schema"])
        _check_constraint_defs(self.spark, {name: expr_sql}, schema)
        n_bad = (
            self._scan_segments(v, live, schema, dvs=dvs)
            .where(_violation_pred(expr_sql))
            .limit(1)
            .count()
        )
        if n_bad:
            raise ConstraintViolationError(
                f"add_constraint({name!r}): existing rows violate "
                f"{expr_sql!r} — constraint not added"
            )
        cons[name] = expr_sql
        self._commit(
            v + 1, "set_constraint", add=[], remove=[], schema=schema,
            extra={"constraints": cons, "constraint_added": name},
        )
        return v + 1

    def drop_constraint(self, name: str) -> int:
        """ALTER TABLE DROP CONSTRAINT: metadata-only commit removing the
        named check from the active map."""
        v, _, entry = self._snapshot(None)
        cons = self.constraints(v)
        if name not in cons:
            raise ValueError(
                f"no constraint named {name!r} (have {sorted(cons)})"
            )
        del cons[name]
        self._commit(
            v + 1, "set_constraint", add=[], remove=[],
            schema=StructType.fromJson(entry["schema"]),
            extra={"constraints": cons, "constraint_dropped": name},
        )
        return v + 1

    def validate_constraints(
        self,
        version: int | None = None,
        extra_checks: dict[str, str] | None = None,
    ) -> DataFrame:
        """Audit surface: one row per check — (check_name, n_violations,
        n_rows) over the snapshot.  Active table constraints always
        report 0 (writes enforce them); ``extra_checks`` are what-if
        predicates audited in the SAME single aggregate pass (e.g. "how
        many rows would violate a tightened floor?").  Lazy: one
        groupless aggregate job over the snapshot, then a constant-size
        stack() unpivot — nothing per-row crosses the driver."""
        version, _, _, entry = self._snapshot_state(version)
        cons = {**self.constraints(version), **(extra_checks or {})}
        if not cons:
            raise ValueError("table has no constraints and no extra_checks")
        _check_constraint_defs(
            self.spark, cons, StructType.fromJson(entry["schema"])
        )
        names = sorted(cons)
        agg = self.read(version).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(
                    F.when(_violation_pred(cons[n]), 1).otherwise(0)
                ).alias(f"__c{i}")
                for i, n in enumerate(names)
            ],
        )
        pairs = ", ".join(
            f"'{n}', coalesce(__c{i}, 0L)" for i, n in enumerate(names)
        )
        return agg.selectExpr(
            f"stack({len(names)}, {pairs}) AS (check_name, n_violations)",
            "n_rows",
        )

    def constraint_violations(
        self, expr_sql: str, version: int | None = None
    ) -> DataFrame:
        """The rows of ``version`` violating a what-if predicate (UNKNOWN
        passes, like CHECK) — the row-level companion to
        :meth:`validate_constraints`."""
        return self.read(version).where(_violation_pred(expr_sql))

    # ------------------------------------------------------------- log layer
    def _commit_path(self, version: int) -> str:
        return os.path.join(self._log_dir, _fmt_version(version) + ".json")

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(
            self._log_dir, _fmt_version(version) + ".checkpoint.json"
        )

    def _versions(self) -> list[int]:
        return log_versions(self.root)

    def latest_version(self) -> int:
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"empty commit log: {self._log_dir}")
        return versions[-1]

    def _read_commit(self, version: int) -> dict:
        return read_commit(self.root, version)

    def _commit(
        self,
        version: int,
        op: str,
        add: list[str],
        remove: list[str],
        schema: StructType,
        extra: dict | None = None,
    ) -> None:
        """Atomically claim ``version``.  Full payload lands in a scratch
        file first; ``os.link`` to the final name either wins (EEXIST-free)
        or raises :class:`ConcurrentCommitError` — a reader can never see a
        partially written commit under its final name."""
        # bloom sidecars before the commit is published: a claimed commit
        # always has its index (a crash before the claim only strands
        # sidecar files alongside the orphan segment — vacuum pairs them)
        self._write_bloom_sidecars(add)
        # last-line defense against a mis-configured concurrent vacuum
        # (orphan_grace_s too small) reaping this writer's files between
        # write and commit: publishing a reference to a vanished file
        # would poison EVERY later read of the head — fail loudly here
        # instead.  O(refs) stat calls; the grace window remains the
        # real protection (this check narrows, not closes, the race).
        refs = list(add) + list((extra or {}).get("dv_add", []))
        if extra and extra.get("cdf"):
            refs.append(extra["cdf"])
        gone = [
            rel
            for rel in refs
            if not os.path.exists(os.path.join(self.root, rel))
        ]
        if gone:
            raise FileNotFoundError(
                f"commit {version} of {self.root}: referenced file(s) "
                f"vanished before the commit could publish them {gone} — "
                "a concurrent vacuum with too small an orphan grace "
                "window? (commit refused; the log is untouched)"
            )
        # column-rename chains + dropped-name records ride along on
        # EVERY commit (tiny dicts): snapshot resolution reads one
        # entry, never a fold.  Callers override explicitly —
        # rename_column/drop_column extend them, overwrite resets them
        # (a whole-live-set replace leaves no pre-rename segment live)
        # — everyone else inherits.
        inherit = [
            key
            for key in ("renames", "dropped", "widen", "spec")
            if extra is None or key not in extra
        ]
        if inherit and version > 0:
            # ONE read of the predecessor for both keys, and no OSError
            # swallow: commits are never deleted, so an unreadable
            # version-1 is corruption, not a normal state.  Defaulting
            # to empty chains here would commit with NO renames/dropped
            # records — every later read of a renamed table would stop
            # coalescing retired names and silently serve NULLs for
            # pre-rename segments.
            try:
                prev_entry = self._read_commit(version - 1)
            except OSError as exc:
                raise RuntimeError(
                    f"commit {version} of {self.root}: predecessor commit "
                    f"{version - 1} is unreadable ({exc}) — refusing to "
                    "commit with empty rename/drop chains (the log is "
                    "append-only; an unreadable entry is corruption)"
                ) from exc
            for key in inherit:
                prev = prev_entry.get(key)
                if prev:
                    extra = {**(extra or {}), key: prev}
        # per-added-segment min/max column stats from the parquet
        # footers (Iceberg-manifest analog) — the pruning index; plus,
        # on ndv_cols tables, one HLL sketch per configured column per
        # segment under the "__hll__" key (never a real column name —
        # stats are keyed by column), folded by table_ndv
        # Segments are immutable and uuid-named (never reused), so their
        # stats are too: cache per rel on the handle so a REBASE RETRY
        # (_commit_rebased re-enters here with the same add list, up to
        # 64 times under contention) never re-reads footers, re-stats
        # part files, or re-launches the HLL aggregate job.
        cache = getattr(self, "_add_stats_cache", None)
        if cache is None:
            cache = self._add_stats_cache = {}
        add_stats: dict[str, dict] = {}
        for rel in add:
            st = cache.get(rel)
            if st is None:
                st = self._segment_stats(rel)
                # on-disk bytes per added segment (Delta add-file
                # `size`): O(files) stat calls, no job — the streaming
                # source's maxBytesPerBatch sizes micro-batches from it
                st["__bytes__"] = self._segment_bytes(rel)
                if len(cache) >= 256:
                    cache.pop(next(iter(cache)), None)
                cache[rel] = st
            add_stats[rel] = st
        if add and self.ndv_cols:
            missing = [
                rel for rel in add if "__hll__" not in add_stats[rel]
            ]
            if missing:
                for rel, sketches in self._segment_hll(
                    missing, self.ndv_cols
                ).items():
                    add_stats[rel]["__hll__"] = sketches
            # most-common-value stats on the same tracked columns —
            # the planner's skew signal (join_skew_planned); one
            # O(delta) job like the sketches, cached per rel the same
            # way so rebase retries never re-run it
            mcv_missing = [
                rel for rel in add if "__mcv__" not in add_stats[rel]
            ]
            if mcv_missing:
                for rel, m in self._segment_mcv(
                    mcv_missing, self.ndv_cols
                ).items():
                    add_stats[rel]["__mcv__"] = m
        payload = {
            "version": version,
            "op": op,
            "add": sorted(add),
            "remove": sorted(remove),
            "stats": add_stats,
            "schema": json.loads(schema.json()),
            "ts": time.time(),
            **(extra or {}),
        }
        final = self._commit_path(version)
        scratch = f"{final}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        with open(scratch, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(scratch, final)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} of {self.root} was committed by another "
                f"writer — re-read the snapshot and retry"
            ) from None
        finally:
            # A PUBLISHED commit must never raise from cleanup: if the
            # scratch vanished (a grace-zero vacuum's log-scratch sweep,
            # or an external cleaner), raising here would make the
            # caller retry an op that actually landed — a double-apply.
            # A stranded scratch (unlink failing some other way) is
            # harmless litter vacuum reclaims.
            try:
                os.unlink(scratch)
            except OSError:
                pass
        if version > 0 and version % CHECKPOINT_EVERY == 0:
            # Best-effort: a lost/failed checkpoint only means a longer
            # tail replay, never a wrong snapshot.
            self._write_checkpoint(version)

    def _write_checkpoint(self, version: int) -> None:
        """Sidecar checkpoint (Delta V2 checkpoints + sidecars, Iceberg's
        manifest list + manifests): the main ``<v>.checkpoint.json``
        carries only the SMALL folds — txn map (Delta setTransactions),
        active DV set, CHECK constraints — plus references to immutable
        sidecar files, each holding up to ``SIDECAR_MAX`` live segments'
        metadata ({stats, pv, writing commit} per segment, the Delta
        add-file stats / Iceberg manifest entries).  Per checkpoint only
        the DIRTY sidecars are rewritten — the ones the tail's
        adds/removes touched — so a drip-feed append workload rewrites
        one ~SIDECAR_MAX-entry file per checkpoint regardless of history
        depth.  Round-11's inline form serialized the FULL live-set maps
        every CHECKPOINT_EVERY commits: 6.5 ms -> 217 ms across a
        10k-commit log (SCALE_STRESSORS_r11 deep_history) because the
        payload is O(live) and live grows with the log.  Reads hydrate
        main + sidecars back into the legacy in-memory shape once per
        cached payload (:meth:`_hydrate_checkpoint`), so every consumer
        fold is unchanged; legacy inline checkpoints stay readable and
        are upgraded to sidecar form at the next checkpoint write."""
        sidecars = None
        prev = self._latest_checkpoint(version)
        if prev is not None and "_sidecars" in prev:
            sidecars = self._fold_sidecars_incremental(prev, version)
        if sidecars is None:
            # genesis, legacy-inline predecessor, or a restore in the
            # tail (re-references pre-checkpoint segments whose stats /
            # physical-writer commit the tail entries don't carry):
            # one full fold through the existing checkpointed meta
            # walks, then chunk.  O(live) once; incremental after.
            live = self._resolve_live(version)
            stats, pvs = self._live_segment_meta(version)
            commits = self._live_segment_commits(version)
            segs = {
                rel: {
                    "stats": stats.get(rel, {}),
                    "pv": pvs.get(rel),
                    "commit": commits.get(rel),
                }
                for rel in sorted(live)
            }
            sidecars = [
                {"name": None, "segments": dict(chunk)}
                for chunk in _chunks(sorted(segs.items()), SIDECAR_MAX)
            ]
        # publish dirty sidecars first (immutable, fresh uuid names — a
        # crash before the main rename strands unreferenced litter,
        # never a readable-but-wrong checkpoint)
        try:
            for sc in sidecars:
                if sc["name"] is not None:
                    continue  # clean: reused from the previous checkpoint
                name = (
                    f"{_fmt_version(version)}."
                    f"{uuid.uuid4().hex[:8]}.sidecar.json"
                )
                spath = os.path.join(self._log_dir, name)
                sscratch = (
                    f"{spath}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                )
                with open(sscratch, "w") as fh:
                    json.dump({"segments": sc["segments"]}, fh)
                os.rename(sscratch, spath)
                sc["name"] = name
        except OSError:
            return  # best-effort: skip this checkpoint entirely
        ckpt = {
            "version": version,
            # latest (batch, version) per streaming source, so
            # idempotent_append's replay check stays O(tail)
            "txns": self._resolve_txns(version),
            "dvs": sorted(self._resolve_dvs(version)),
            # the active CHECK-constraint map, so constraints() is
            # O(tail) like every other fold (pre-rev checkpoints
            # lack the key and force the genesis walk — never wrong)
            "constraints": self.constraints(version),
            "sidecars": [
                {"name": sc["name"], "n": len(sc["segments"])}
                for sc in sidecars
            ],
        }
        cpath = self._checkpoint_path(version)
        cscratch = f"{cpath}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            with open(cscratch, "w") as fh:
                json.dump(ckpt, fh)
        except OSError:
            return
        try:
            os.rename(cscratch, cpath)
        except OSError:
            try:
                os.unlink(cscratch)
            except OSError:
                pass
        else:
            # register in this handle's discovery cache so the next
            # fold uses it without a fresh listdir; hydration of the
            # legacy-shape views is lazy (first consumer fold)
            ckpt["_sidecars"] = sidecars
            if hasattr(self, "_ckpt_versions") and (
                version not in self._ckpt_versions
            ):
                import bisect

                bisect.insort(self._ckpt_versions, version)
                if len(self._ckpt_payloads) >= 4:
                    # racing in-process writer threads share this handle
                    # cache: next(iter()) can raise RuntimeError if a
                    # peer inserts mid-eviction — skip on contention,
                    # same soft-cap policy as the DV-position memo
                    try:
                        self._ckpt_payloads.pop(
                            next(iter(self._ckpt_payloads)), None
                        )
                    except RuntimeError:
                        pass
                self._ckpt_payloads[version] = ckpt

    def _fold_sidecars_incremental(
        self, prev: dict, version: int
    ) -> list[dict] | None:
        """New sidecar list for a checkpoint at ``version``, folded from
        the previous checkpoint's sidecars + the commit tail.  Clean
        sidecars are returned with their existing ``name`` (reused,
        never rewritten); touched ones carry ``name: None`` (the writer
        publishes them fresh — sidecar files are immutable).  Returns
        None when the tail contains a restore: its ``add`` re-references
        segments whose stats/pv/physical-writer live in commits BEFORE
        the previous checkpoint, which only the full fold resolves."""
        scs = [dict(sc) for sc in prev["_sidecars"]]
        adds: dict[str, dict] = {}
        removes: set[str] = set()
        for v in range(prev["version"] + 1, version + 1):
            entry = self._read_commit(v)
            if "restored_from" in entry:
                return None
            for rel in entry["remove"]:
                if rel in adds:
                    del adds[rel]  # added and removed within the tail
                else:
                    removes.add(rel)
            for rel in entry["add"]:
                adds[rel] = {
                    "stats": entry.get("stats", {}).get(rel, {}),
                    "pv": (entry.get("pv") or {}).get(rel) or None,
                    "commit": v,
                }
        if removes:
            for i, sc in enumerate(scs):
                hit = removes & sc["segments"].keys()
                if hit:
                    segs = dict(sc["segments"])
                    for rel in hit:
                        del segs[rel]
                    scs[i] = {"name": None, "segments": segs}
            scs = [sc for sc in scs if sc["segments"]]
        if adds:
            items = sorted(adds.items())
            if scs and len(scs[-1]["segments"]) < SIDECAR_MAX:
                room = SIDECAR_MAX - len(scs[-1]["segments"])
                head, items = items[:room], items[room:]
                segs = dict(scs[-1]["segments"])
                segs.update(head)
                scs[-1] = {"name": None, "segments": segs}
            for chunk in _chunks(items, SIDECAR_MAX):
                scs.append({"name": None, "segments": dict(chunk)})
        return scs

    def _hydrate_checkpoint(self, payload: dict) -> dict:
        """Materialize a sidecar checkpoint's legacy-shaped views
        (``live`` / ``stats`` / ``pvs`` / ``seg_commits``) in place, so
        every consumer fold reads the same keys whether the file on disk
        is round-11 inline or sidecar form.  Idempotent and lazy: the
        sidecar files are read once per cached payload, the merged views
        built on first consumer access.  Raises OSError when a
        referenced sidecar is unreadable (externally cleaned) — the
        caller drops this checkpoint and falls back to an older one."""
        if "sidecars" not in payload or "live" in payload:
            return payload
        if "_sidecars" not in payload:
            scs = []
            for ref in payload["sidecars"]:
                with open(
                    os.path.join(self._log_dir, ref["name"])
                ) as fh:
                    scs.append({
                        "name": ref["name"],
                        "segments": json.load(fh)["segments"],
                    })
            payload["_sidecars"] = scs
        stats: dict[str, dict] = {}
        pvs: dict[str, dict] = {}
        seg_commits: dict[str, int] = {}
        for sc in payload["_sidecars"]:
            for rel, meta in sc["segments"].items():
                stats[rel] = meta.get("stats") or {}
                pv = meta.get("pv")
                if pv:
                    pvs[rel] = pv
                c = meta.get("commit")
                if c is not None:
                    seg_commits[rel] = c
        payload["stats"] = stats
        payload["pvs"] = pvs
        payload["seg_commits"] = seg_commits
        payload["live"] = sorted(stats)
        return payload

    #: ops whose commit changes table METADATA — never rebasable across:
    #: the lost writer derived its batch under schema/spec/constraint/
    #: chain state that no longer holds (restore rewires the live set and
    #: may resurrect files a DML thought dead, so it counts too).
    _METADATA_OPS = frozenset((
        "rename", "drop", "widen_type", "set_spec", "set_constraint",
        "restore",
    ))

    def _probe_disjoint(
        self, probes: list[tuple], rel: str, entry: dict
    ) -> bool:
        """True when an interleaved commit's added segment ``rel`` is
        PROVABLY disjoint from at least one of the lost operation's read
        probes ``(col, lo, hi)`` — via the segment's recorded partition
        values first, then its footer min/max stats.  Unprovable ==
        False: the caller must then declare a conflict (the same
        only-skip-what-is-proven rule as read-side pruning)."""
        pv = (entry.get("pv") or {}).get(rel)
        stats = (entry.get("stats") or {}).get(rel) or {}
        for col, lo, hi in probes:
            if lo is None or hi is None:
                continue
            if pv and partition_skips(pv, col, lo, hi, is_point=(lo == hi)):
                return True
            mn_mx = stats.get(col)
            if mn_mx is not None:
                try:
                    if mn_mx[1] < lo or mn_mx[0] > hi:
                        return True
                except TypeError:
                    pass  # cross-typed comparison proves nothing
        return False

    def _check_interleaved(
        self,
        entry: dict,
        vi: int,
        schema_fields: list[tuple],
        blind: bool,
        read_files: frozenset,
        removes: frozenset,
        probes: list[tuple],
        ignore_adds: bool = False,
    ) -> None:
        """Raise the typed conflict if interleaved commit ``entry`` (at
        version ``vi``) invalidates the lost operation; return silently
        when the operation can be rebased past it.  The Delta
        ConflictChecker decision table under SERIALIZABLE isolation:

        - metadata ops / schema-shape change  -> MetadataChangedError
        - removed files ∩ our removes         -> ConcurrentDeleteDeleteError
        - removed files ∩ our read set,
          or any DV added (masks rows of
          files we may have read)             -> ConcurrentDeleteReadError
        - added files not provably disjoint
          from our read probes (blind appends
          read nothing and skip this check)   -> ConcurrentAppendError
        """
        if entry["op"] in self._METADATA_OPS:
            raise MetadataChangedError(
                f"version {vi} ({entry['op']}) changed table metadata "
                "under the in-flight operation — re-derive against the "
                "new snapshot"
            )
        fields = [
            (f["name"], f["type"]) for f in entry["schema"]["fields"]
        ]
        if fields != schema_fields:
            raise MetadataChangedError(
                f"version {vi} ({entry['op']}) changed the table schema "
                "under the in-flight operation — re-derive against the "
                "new snapshot"
            )
        removed = frozenset(entry["remove"])
        if removed & removes:
            raise ConcurrentDeleteDeleteError(
                f"version {vi} ({entry['op']}) removed file(s) this "
                f"operation also removes {sorted(removed & removes)[:3]}"
            )
        if not blind:
            if removed & read_files:
                raise ConcurrentDeleteReadError(
                    f"version {vi} ({entry['op']}) removed file(s) this "
                    f"operation read {sorted(removed & read_files)[:3]}"
                )
            if entry.get("dv_add"):
                # a DV masks rows INSIDE existing files; which files is
                # only knowable by reading the DV parquet — conservative
                raise ConcurrentDeleteReadError(
                    f"version {vi} ({entry['op']}) added a deletion "
                    "vector masking rows this operation may have read"
                )
            if not ignore_adds:
                # ignore_adds marks file-scoped rewrites (compaction):
                # they read exactly their input files, no predicate, so
                # interleaved adds never invalidate them
                for rel in entry["add"]:
                    if not self._probe_disjoint(probes, rel, entry):
                        raise ConcurrentAppendError(
                            f"version {vi} ({entry['op']}) added segment "
                            f"{rel} not provably disjoint from this "
                            "operation's read predicate"
                        )

    def _commit_rebased(
        self,
        v: int,
        op: str,
        add: list[str],
        remove: list[str],
        schema: StructType,
        extra: dict | None = None,
        *,
        blind: bool = False,
        read_files=(),
        probes: list[tuple] | None = None,
        ignore_adds: bool = False,
        max_rebase: int = 64,
    ) -> int:
        """:meth:`_commit` with SEMANTIC conflict resolution (Delta's
        ConflictChecker): on a lost race, re-validate the operation
        against every interleaved commit and, when provably disjoint,
        auto-rebase — re-attempt the SAME already-written segments at the
        new head, no data job re-run, no caller-visible retry.  A true
        conflict raises the typed :class:`ConcurrentCommitError`
        subclass naming the interleaved commit.

        ``blind`` marks operations that read nothing (plain appends):
        they rebase across any data commit and conflict only with
        metadata changes.  DML passes its ``read_files`` (the scanned
        candidates) and optional ``probes`` [(col, lo, hi), ...] — the
        read predicate interleaved ADDS are checked against.  Returns
        the version that actually committed."""
        # the commit schema's JSON rendering is what interleaved entries
        # are compared to — use the same serialization both sides
        schema_fields = [
            (f["name"], f["type"])
            for f in json.loads(schema.json())["fields"]
        ]
        read_files = frozenset(read_files)
        removes = frozenset(remove)
        # probes may be a zero-arg CALLABLE: the happy (uncontended)
        # path then never pays the job that computes them — they are
        # resolved once, on the first lost race
        resolved = None if callable(probes) else (probes or [])
        attempt = v
        for _ in range(max_rebase):
            try:
                self._commit(
                    attempt + 1, op, add=add, remove=remove,
                    schema=schema, extra=extra,
                )
                return attempt + 1
            except ConcurrentCommitError:
                if resolved is None:
                    resolved = probes() or []
                head = self.latest_version()
                for vi in range(attempt + 1, head + 1):
                    self._check_interleaved(
                        self._read_commit(vi), vi, schema_fields,
                        blind, read_files, removes, resolved, ignore_adds,
                    )
                attempt = head
        raise ConcurrentCommitError(
            f"{op}: lost {max_rebase} consecutive commit races on "
            f"{self.root}"
        )

    def _latest_checkpoint(self, version: int) -> dict | None:
        """The newest checkpoint payload at or before ``version`` (None
        when the log has none yet) — the single discovery point every
        checkpointed fold shares.

        Per-handle caching (round-11 deep-history item): the discovery
        listdir runs once per handle (refreshed when THIS handle writes
        a checkpoint), and payloads are memoized — checkpoint files are
        immutable and never vacuumed, so a cached payload can't go
        stale.  A checkpoint another PROCESS wrote after this handle's
        listing is simply not used yet: the fold replays a longer tail
        off an older checkpoint, which is always correct."""
        if not hasattr(self, "_ckpt_versions"):
            self._ckpt_versions: list[int] = sorted(
                int(n[: -len(".checkpoint.json")])
                for n in os.listdir(self._log_dir)
                if n.endswith(".checkpoint.json")
                and n[: -len(".checkpoint.json")].isdigit()
            )
            self._ckpt_payloads: dict[int, dict] = {}
        import bisect

        i = bisect.bisect_right(self._ckpt_versions, version)
        known = self._ckpt_versions[i - 1] if i else -1
        if version - known > 4 * CHECKPOINT_EVERY:
            # the cached listing would force a long tail replay — other
            # writers have likely checkpointed since; refresh once
            self._ckpt_versions = sorted(
                int(n[: -len(".checkpoint.json")])
                for n in os.listdir(self._log_dir)
                if n.endswith(".checkpoint.json")
                and n[: -len(".checkpoint.json")].isdigit()
            )
            i = bisect.bisect_right(self._ckpt_versions, version)
        if i == 0:
            return None
        cv = self._ckpt_versions[i - 1]
        payload = self._ckpt_payloads.get(cv)
        if payload is None:
            try:
                with open(self._checkpoint_path(cv)) as fh:
                    payload = json.load(fh)
                # sidecar form: load the referenced sidecar files now so
                # an unreadable one (externally cleaned) fails here and
                # falls back like a missing main file
                payload = self._hydrate_checkpoint(payload)
            except OSError:
                # externally cleaned (not our vacuum's doing): drop it
                # from the cache and fall back to the next older one
                # (a racing thread may have dropped it first)
                try:
                    self._ckpt_versions.remove(cv)
                except ValueError:
                    pass
                return self._latest_checkpoint(version)
            if len(self._ckpt_payloads) >= 4:
                # same contention guard as the write-path registration
                try:
                    self._ckpt_payloads.pop(
                        next(iter(self._ckpt_payloads)), None
                    )
                except RuntimeError:
                    pass
            self._ckpt_payloads[cv] = payload
        # a write-path registration caches {main + _sidecars} without the
        # merged legacy views — build them on first consumer access
        # (in-place, so the cached object keeps them; no file IO here)
        return self._hydrate_checkpoint(payload)

    def _resolve_state(
        self, version: int, use_checkpoint: bool = True
    ) -> tuple[set[str], set[str]]:
        """(live segments, active deletion vectors) at ``version`` in ONE
        checkpointed fold — O(tail) driver metadata, and every read needs
        both.  DV semantics: a FULL-replace commit (overwrite /
        copy-on-write delete / compact / whole-set merge) materializes
        every DV through the read path it rewrote from, so the DV set
        resets to empty there.  Partial rewrites (merge_upsert_pruned)
        keep DVs active: rows of removed segments simply stop matching
        (segment names are never reused), so a stale DV entry can only be
        dead weight, never a wrong delete."""
        start = 0
        live: set[str] = set()
        dvs: set[str] = set()
        legacy_dv_refold = False
        ckpt = self._latest_checkpoint(version) if use_checkpoint else None
        if ckpt is not None:
            live = set(ckpt["live"])
            start = ckpt["version"] + 1
            if "dvs" in ckpt:
                dvs = set(ckpt["dvs"])
            else:
                # pre-DV-rev checkpoint: the dv fold must restart from
                # genesis (the live fold may still use the checkpoint)
                legacy_dv_refold = True
        for v in range(start, version + 1):
            entry = self._read_commit(v)
            removed = set(entry["remove"])
            if live and removed >= live:
                dvs = set()  # full replace: the rewrite read applied DVs
            live -= removed
            live |= set(entry["add"])
            dvs -= set(entry.get("dv_remove", []))  # dv compaction
            dvs |= set(entry.get("dv_add", []))
        if legacy_dv_refold:
            dvs = self._resolve_state(version, use_checkpoint=False)[1]
        return live, dvs

    def _resolve_live(
        self, version: int, use_checkpoint: bool = True
    ) -> set[str]:
        """Live segments at ``version`` (see :meth:`_resolve_state`)."""
        return self._resolve_state(version, use_checkpoint)[0]

    def _resolve_dvs(
        self, version: int, use_checkpoint: bool = True
    ) -> set[str]:
        """Active DV files at ``version`` (see :meth:`_resolve_state`)."""
        return self._resolve_state(version, use_checkpoint)[1]

    def _resolve_txns(
        self, version: int, use_checkpoint: bool = True
    ) -> dict[str, list]:
        """Latest ``{source: [batch, version]}`` transaction per streaming
        source at ``version`` — from the nearest checkpoint carrying a
        txn map (pre-txn checkpoints force a genesis fold, never a wrong
        answer) plus the commit tail.  Single-writer-per-source with
        monotonically increasing batch ids (the structured-streaming
        model), so the latest entry subsumes all earlier ones."""
        start = 0
        txns: dict[str, list] = {}
        if use_checkpoint:
            ckpt = self._latest_checkpoint(version)
            if ckpt is not None and "txns" in ckpt:
                txns = {k: list(v) for k, v in ckpt["txns"].items()}
                start = ckpt["version"] + 1
            # else: an older-rev checkpoint — fold from genesis
        for v in range(start, version + 1):
            txn = self._read_commit(v).get("txn")
            if txn:
                txns[txn["source"]] = [txn["batch"], v]
        return txns

    def _snapshot(self, version: int | None) -> tuple[int, list[str], dict]:
        version, live, _, entry = self._snapshot_state(version)
        return version, live, entry

    def _snapshot_state(
        self, version: int | None
    ) -> tuple[int, list[str], list[str], dict]:
        """(version, live segments, active DVs, commit entry) — the full
        snapshot resolution in one log fold, for read paths that need
        the DV set too (every read does)."""
        versions = self._versions()
        if not versions:
            raise FileNotFoundError(f"empty commit log: {self._log_dir}")
        if version is None:
            version = versions[-1]
        if version not in set(versions):
            raise ValueError(
                f"unknown version {version} (have {versions[0]}..{versions[-1]})"
            )
        live, dvs = self._resolve_state(version)
        return version, sorted(live), sorted(dvs), self._read_commit(version)

    def history(self) -> list[dict]:
        """All commits, oldest first (the DESCRIBE HISTORY surface)."""
        return [self._read_commit(v) for v in self._versions()]

    # ------------------------------------------------------------ data layer
    def _write_segment(self, df: DataFrame, version_hint: int) -> str:
        """Write one immutable parquet segment; returns its log-relative
        path.  Invisible until some commit references it.  The single
        choke point every schema enters through (create / append /
        evolve / overwrite / merge), so the DV identity names are
        reserved here."""
        clash = [c for c in df.columns if c in _DV_IDENTITY_COLS]
        if clash:
            raise ValueError(
                f"column {clash[0]!r} collides with the reserved "
                f"deletion-vector identity names {_DV_IDENTITY_COLS}"
            )
        reserved_stats = [
            c for c in df.columns
            if c in ("__hll__", "__bytes__", "__mcv__")
        ]
        if reserved_stats:
            raise ValueError(
                f"column {reserved_stats[0]!r} collides with a reserved "
                "per-segment stats key in the commit log — rename it"
            )
        rel = os.path.join(
            DATA_DIR, f"{_fmt_version(version_hint)}-{uuid.uuid4().hex[:8]}"
        )
        df.write.mode("error").parquet(os.path.join(self.root, rel))
        # CHECK-constraint enforcement at the same choke point: every new
        # data segment is validated against the head's active constraints
        # (one aggregate over the NEW files only — O(delta), never
        # O(table)); a violating segment is deleted and the write raises
        # before any commit can reference it.  Empty log = mid-create:
        # create() validates explicitly against its own map.
        if self._versions():
            self._enforce_constraints(
                [rel], self.constraints(), "write"
            )
        return rel

    def _write_partitioned(
        self, df: DataFrame, version_hint: int, spec: list[dict]
    ) -> tuple[list[str], dict[str, dict]]:
        """Write one immutable segment PER PARTITION TUPLE under the
        active spec (the Iceberg manifest-entry shape: file -> partition
        tuple).  ONE Spark write job regardless of tuple count: the
        batch is written with ``partitionBy`` on the computed transform
        columns into a scratch dir, then each leaf directory is RENAMED
        into place as its own segment — O(tuples) driver metadata moves,
        no per-partition job.  The transform columns are synthetic
        (``_pt_i``) so ``partitionBy`` dropping them from the files
        never loses a data column.  Returns (segment rels, {rel: pv
        map}); the typed pv values come from a distinct-tuples aggregate
        (bounded by tuple count), matched to leaf dirs via Spark's own
        dir-name rendering."""
        from urllib.parse import unquote

        clash = [c for c in df.columns if c in _DV_IDENTITY_COLS]
        if clash:
            raise ValueError(
                f"column {clash[0]!r} collides with the reserved "
                f"deletion-vector identity names {_DV_IDENTITY_COLS}"
            )
        reserved_stats = [
            c for c in df.columns
            if c in ("__hll__", "__bytes__", "__mcv__")
        ]
        if reserved_stats:
            raise ValueError(
                f"column {reserved_stats[0]!r} collides with a reserved "
                "per-segment stats key in the commit log — rename it"
            )
        for f in spec:
            pinned_tz = f.get("tz")
            if pinned_tz:
                session_tz = self.spark.conf.get(
                    "spark.sql.session.timeZone"
                )
                if session_tz != pinned_tz:
                    raise ValueError(
                        f"partitioned write: spec field "
                        f"{_spec_key(f)} was pinned to session timezone "
                        f"{pinned_tz!r} at set_partition_spec time but "
                        f"the session now runs {session_tz!r} — "
                        "temporal pv values would be rendered in a "
                        "different zone than probes expect (an unsound "
                        "prune).  Restore spark.sql.session.timeZone or "
                        "evolve the spec under the new zone."
                    )
        pt_cols = [f"_pt_{i}" for i in range(len(spec))]
        clash_pt = [c for c in df.columns if c in pt_cols]
        if clash_pt:
            raise ValueError(
                f"column {clash_pt[0]!r} collides with the reserved "
                "partitioned-write transform names (_pt_N) — rename it "
                "or unset the partition spec"
            )
        keyed = df.select(
            "*",
            *[
                _spec_expr(f).alias(pc)
                for f, pc in zip(spec, pt_cols)
            ],
        )
        # typed tuples first (bounded by partition cardinality): the
        # JSON-safe canonical value per field, keyed by its dir rendering
        def _canon(v):
            return v if isinstance(v, (int, float, str)) or v is None \
                else str(v)

        tuples = {
            tuple(
                "__HIVE_DEFAULT_PARTITION__" if row[pc] is None
                else str(row[pc])
                for pc in pt_cols
            ): {
                _spec_key(f): _canon(row[pc])
                for f, pc in zip(spec, pt_cols)
            }
            for row in keyed.select(*pt_cols).distinct().collect()
        }
        scratch = os.path.join(
            self.root, f".pt-scratch-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        )
        keyed.write.mode("error").partitionBy(*pt_cols).parquet(scratch)
        rels: list[str] = []
        pvs: dict[str, dict] = {}
        try:
            def _leaves(d: str, depth: int) -> list[tuple[str, tuple]]:
                if depth == len(pt_cols):
                    return [(d, ())]
                out = []
                for name in sorted(os.listdir(d)):
                    if "=" not in name:
                        continue
                    raw = unquote(name.split("=", 1)[1])
                    for leaf, vals in _leaves(
                        os.path.join(d, name), depth + 1
                    ):
                        out.append((leaf, (raw, *vals)))
                return out

            for leaf, vals in _leaves(scratch, 0):
                rel = os.path.join(
                    DATA_DIR,
                    f"{_fmt_version(version_hint)}-{uuid.uuid4().hex[:8]}",
                )
                os.rename(leaf, os.path.join(self.root, rel))
                rels.append(rel)
                pv = tuples.get(vals)
                if pv is None:  # rendering mismatch: record no pv —
                    pv = {}     # the segment is simply never pruned
                pvs[rel] = pv
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        if self._versions():
            self._enforce_constraints(rels, self.constraints(), "write")
        return rels, pvs

    def _write_cdf(self, changes: DataFrame, version_hint: int) -> str:
        """Write one immutable change-data segment (rows carrying a
        ``_change_type`` column) under ``cdf/`` — Delta's ``_change_data``
        files, produced by the SAME job pipeline as the merge/delete that
        caused them and referenced from the commit, so the change feed is
        exact row-level history, not a reconstruction."""
        rel = os.path.join(
            CDF_DIR, f"{_fmt_version(version_hint)}-{uuid.uuid4().hex[:8]}"
        )
        changes.write.mode("error").parquet(os.path.join(self.root, rel))
        return rel

    # --------------------------------------------------- deletion vectors
    @staticmethod
    def _identity_cols() -> list[Column]:
        """The stable row identity a deletion vector records: (segment
        dir, part file, row index within the file) from the parquet
        reader's ``_metadata`` — relocation-proof (no absolute paths) and
        collision-free (segment names embed a uuid, never reused)."""
        parts = F.split(F.col("_metadata.file_path"), "/")
        return [
            F.element_at(parts, -2).alias("_dv_seg"),
            F.element_at(parts, -1).alias("_dv_file"),
            F.col("_metadata.row_index").alias("_dv_pos"),
        ]

    def _write_dv(self, positions: DataFrame, version_hint: int) -> str | None:
        """Write one immutable deletion-vector file under ``dv/``.  The
        payload is three narrow columns of row positions — tiny relative
        to the data it masks (the whole point of merge-on-read: a delete
        at 100 TB writes kilobytes, not rewritten segments) — so it is
        collapsed to one shuffle-of-positions output file.

        Returns None when NO rows matched (checked from the written
        parquet footers, no extra job): registering an empty DV would
        permanently demote every later read from the plain scan to the
        anti-join plan and make streams treat the commit as a change
        commit — a pure-insert merge or no-op delete must stay a plain
        append/no-op."""
        rel = os.path.join(
            DV_DIR, f"{_fmt_version(version_hint)}-{uuid.uuid4().hex[:8]}"
        )
        (
            positions.select("_dv_seg", "_dv_file", "_dv_pos")
            .repartition(1)
            .write.mode("error")
            .parquet(os.path.join(self.root, rel))
        )
        if self._segment_rows(rel) == 0:
            shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
            return None
        return rel

    def _check_present(self, version: int, rels: list[str]) -> None:
        missing = [
            p for p in rels if not os.path.isdir(os.path.join(self.root, p))
        ]
        if missing:
            raise FileNotFoundError(
                f"version {version} references vacuumed segments: "
                f"{missing[:3]}"
            )

    def _dv_positions(self, dvs: list[str]) -> dict | None:
        """Driver-side fold of the active deletion vectors:
        ``{segment name: {part file: [row positions]}}`` — the per-file
        masks the fast read path filters with.  Returns None (caller
        falls back to the broadcast anti-join) whenever the DVs are not
        metadata-sized: total bytes past ``_DV_DRIVER_MAX_BYTES``, or
        any single file masked past ``_DV_MAX_POSITIONS_PER_FILE`` (an
        InSet that large costs more than the join it replaces).  DV
        files are immutable, so the fold memoizes on the active set."""
        import glob as _glob

        import pyarrow.parquet as pq

        key = (self.root, tuple(dvs))
        hit = _DV_POS_MEMO.get(key, _DV_MEMO_MISSING)
        if hit is not _DV_MEMO_MISSING:
            return hit  # may be a memoized None verdict (fallback)

        def remember(value):
            if len(_DV_POS_MEMO) >= _DV_POS_MEMO_MAX:
                # pop(k, None) so two threads racing to evict the same
                # head key can't raise KeyError; next(iter(...)) itself
                # can still raise RuntimeError ("dictionary changed size
                # during iteration") if a racing writer inserts between
                # iter() and next() — skip eviction on contention, the
                # other thread is evicting anyway and the cap is soft
                try:
                    _DV_POS_MEMO.pop(next(iter(_DV_POS_MEMO)), None)
                except RuntimeError:
                    pass
            _DV_POS_MEMO[key] = value
            return value

        parts: list[str] = []
        total = 0
        for d in dvs:
            for p in _glob.glob(
                os.path.join(self.root, d, "part-*.parquet")
            ):
                try:
                    total += os.path.getsize(p)
                except OSError:
                    return None  # transient: do NOT memoize
                parts.append(p)
        if total > _DV_DRIVER_MAX_BYTES:
            # memoize the fallback verdict too: DV files are immutable,
            # so re-reading them on every scan just to re-conclude
            # "too big" would pay the full driver fold per read
            return remember(None)
        out: dict[str, dict[str, list[int]]] = {}
        for p in parts:
            tb = pq.read_table(
                p, columns=["_dv_seg", "_dv_file", "_dv_pos"]
            )
            for seg, fl, pos in zip(
                tb["_dv_seg"].to_pylist(),
                tb["_dv_file"].to_pylist(),
                tb["_dv_pos"].to_pylist(),
            ):
                out.setdefault(seg, {}).setdefault(fl, []).append(
                    int(pos)
                )
        for files in out.values():
            for poss in files.values():
                if len(poss) > _DV_MAX_POSITIONS_PER_FILE:
                    return remember(None)
        return remember(out)

    def _scan_segments(
        self,
        version: int,
        rels: list[str],
        schema: StructType,
        dvs: list[str] | None = None,
        keep_identity: bool = False,
        renames: dict[str, list[str]] | None = None,
    ) -> DataFrame:
        """Scan ``rels`` under the snapshot's schema with the active
        deletion vectors applied: rows masked by a DV are dropped via ONE
        broadcast left-anti join on the (segment, file, position)
        identity — no shuffle of the data side, and a DV row whose
        segment is not in ``rels`` (pruned away or since rewritten)
        simply never matches.  Tables with no active DVs get the plain
        scan, bit-identical plans to before DVs existed.  ``dvs`` is the
        already-resolved active set (pass it to avoid a second log fold);
        None means resolve here.  ``keep_identity=True`` keeps the
        ``_dv_*`` identity columns on the result — the shared scan the
        merge-on-read mutations build their own DVs from.

        ``renames`` is the snapshot's column-rename chains
        (logical name -> [retired names, newest first]; see
        :meth:`rename_column`): segments persist their WRITE-TIME column
        names forever, so a scan spanning a rename reads a WIDENED
        schema (logical + retired twins, parquet null-fills whichever a
        file lacks) and projects each logical column as
        ``coalesce(current, *retired)`` — metadata-only rename, zero
        rewrite, and tables with no renames keep the bit-identical plain
        plan.  None means resolve from the version's commit entry."""
        if renames is None:
            renames = (
                self._read_commit(version).get("renames") or {}
                if self._versions()
                else {}
            )
        chains = {
            k: v for k, v in renames.items()
            if v and any(f.name == k for f in schema.fields)
        }
        if not rels:
            empty = self.spark.createDataFrame([], schema)
            if keep_identity:
                # honor the contract even on an empty live set: callers
                # (touched-file discovery, the MOR mutations) select the
                # _dv_* columns unconditionally
                empty = empty.select(
                    "*",
                    F.lit(None).cast("string").alias("_dv_seg"),
                    F.lit(None).cast("string").alias("_dv_file"),
                    F.lit(None).cast("bigint").alias("_dv_pos"),
                )
            return empty
        self._check_present(version, rels)
        read_schema = schema
        if chains:
            retired = [
                StructField(r, f.dataType, True)
                for f in schema.fields
                for r in chains.get(f.name, [])
            ]
            read_schema = StructType(list(schema.fields) + retired)
        reader = self.spark.read.schema(read_schema)
        if dvs is None:
            dvs = sorted(self._resolve_dvs(version))
        if dvs:
            self._check_present(version, dvs)

        def _logical(f: StructField) -> Column:
            rs = chains.get(f.name)
            if not rs:
                return F.col(f.name)
            return F.coalesce(
                F.col(f.name), *[F.col(r) for r in rs]
            ).alias(f.name)

        logical_sel = [_logical(f) for f in schema.fields]
        out_cols = [f.name for f in schema.fields]

        # DV FAST PATH (round 11; the measured 3.67x -> ~1.5x cut): for
        # metadata-sized DVs, apply each file's mask AT THE SCAN — clean
        # part files get the plain multi-path read, each masked file an
        # anti-join on the bare LONG ``row_index`` against its own tiny
        # broadcast position list (no per-row path splitting, no string
        # hashing; an IN-literal list was tried first and lost — a
        # several-thousand-literal expression costs ~0.1 s PER ACTION in
        # optimizer churn, while the long-key broadcast anti measures at
        # plain-scan speed).  Exactly the rows the legacy 3-column
        # anti-join drops: the DV identity IS (file, row_index), scoped
        # here by real file.
        if dvs and not keep_identity:
            masked = self._dv_positions(dvs)
            if masked is not None:
                import glob as _glob

                clean: list[str] = []
                branches: list[tuple[str, list[int]]] = []
                for rel in rels:
                    seg_abs = os.path.join(self.root, rel)
                    seg_masked = masked.get(os.path.basename(rel))
                    if not seg_masked:
                        clean.append(seg_abs)
                        continue
                    for part in sorted(
                        _glob.glob(
                            os.path.join(seg_abs, "part-*.parquet")
                        )
                    ):
                        poss = seg_masked.get(os.path.basename(part))
                        if poss:
                            branches.append((part, poss))
                        else:
                            clean.append(part)
                if len(branches) <= _DV_MAX_FILE_BRANCHES:
                    import pandas as pd

                    parts_dfs: list[DataFrame] = []
                    if clean:
                        parts_dfs.append(reader.parquet(*clean))
                    for part, poss in branches:
                        pos_df = self.spark.createDataFrame(
                            pd.DataFrame({"_mask_pos": poss})
                        )
                        parts_dfs.append(
                            reader.parquet(part).join(
                                F.broadcast(pos_df),
                                # pos_df[...] not F.col(...): a data
                                # column named _mask_pos must not make
                                # the condition ambiguous
                                F.col("_metadata.row_index")
                                == pos_df["_mask_pos"],
                                "left_anti",
                            )
                        )
                    if not parts_dfs:
                        # every part file of every rel fully enumerated
                        # and none exist — an empty (but present) live set
                        return self.spark.createDataFrame([], schema)
                    fast = parts_dfs[0]
                    for other in parts_dfs[1:]:
                        fast = fast.unionAll(other)
                    return (
                        fast.select(*logical_sel) if chains else fast
                    )

        df = reader.parquet(
            *(os.path.join(self.root, p) for p in rels)
        )
        if keep_identity or dvs:
            df = df.select(*logical_sel, *self._identity_cols())
        elif chains:
            df = df.select(*logical_sel)
        if dvs:
            dv = self.spark.read.parquet(
                *(os.path.join(self.root, d) for d in dvs)
            )
            df = df.join(
                F.broadcast(dv),
                on=["_dv_seg", "_dv_file", "_dv_pos"],
                how="left_anti",
            )
        return df if keep_identity else (
            df.select(*out_cols) if dvs else df
        )

    def _segment_stats(self, rel: str) -> dict[str, list]:
        """Per-segment min/max column stats folded from the parquet
        FOOTERS the write already produced — O(part files) driver-side
        metadata reads, no extra Spark job (the Iceberg-manifest /
        Delta-stats analog).  Only JSON-safe scalar stats (int/float/str)
        are kept; a column with any unstated row group is dropped so
        pruning can never be optimistic.

        INEXACT-STATS GUARD: parquet writers may truncate or elide
        min/max for long BYTE_ARRAY values while still reporting
        ``has_min_max`` (verified with pyarrow 16.1.0: a value past the
        statistics size limit yields ``has_min_max=True`` with
        ``max=''``), and this pyarrow build exposes no
        ``is_max_value_exact`` flag to tell.  A fabricated ``max=''``
        would classify the segment as provably disjoint from any real
        range and make :meth:`read_pruned` silently drop rows.  So
        string stats are kept only when provably safe: drop the column
        whenever min or max is the empty string, or max < min (for any
        type) — dropping only costs a scan, never correctness."""
        import glob as _glob

        import pyarrow.parquet as pq

        folded: dict[str, list] = {}
        dropped: set[str] = set()
        for part in _glob.glob(
            os.path.join(self.root, rel, "part-*.parquet")
        ):
            md = pq.ParquetFile(part).metadata
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    name = col.path_in_schema
                    try:
                        st = col.statistics
                        skip = (
                            st is None
                            or not st.has_min_max
                            # st.min/.max themselves can raise
                            # ArrowNotImplementedError (decimal128 on
                            # this pyarrow build) — caught below; no
                            # stats just means no prune
                            or not isinstance(st.min, (int, float, str))
                            or not isinstance(st.max, (int, float, str))
                            or isinstance(st.min, bool)
                            # truncated/elided BYTE_ARRAY stats: an
                            # empty bound or inverted range is the
                            # observable symptom — never prune on it
                            or (isinstance(st.min, str) and st.min == "")
                            or (isinstance(st.max, str) and st.max == "")
                            or st.max < st.min
                        )
                    except Exception:
                        skip = True
                    if skip:
                        dropped.add(name)
                        continue
                    if name in folded:
                        folded[name][0] = min(folded[name][0], st.min)
                        folded[name][1] = max(folded[name][1], st.max)
                    else:
                        folded[name] = [st.min, st.max]
        return {k: v for k, v in folded.items() if k not in dropped}

    # ------------------------------------------------------- bloom index
    def _bloom_sidecar_path(self, rel: str) -> str:
        """Sidecar keyed by the segment's (uuid-unique) dir name — a
        segment and its bloom index always travel together."""
        return os.path.join(
            self.root, INDEX_DIR, os.path.basename(rel) + ".bloom.json"
        )

    def _write_bloom_sidecars(self, add: list[str]) -> None:
        """Build the per-column bloom bitsets for each added segment —
        ONE distributed job per segment (k md5 positions per row per
        indexed column, folded to ``bits/64`` words via a bit_or
        aggregate, so only the packed bitset crosses the driver, never
        positions).  Idempotent: a sidecar that already exists (commit
        retry after a lost race) is kept.  md5 keeps the position math
        trivially reproducible driver-side for the membership probe; a
        production swap-in would use xxhash64 both sides."""
        cols, m, k = self.bloom_props
        if not cols:
            return
        # rename-aware: a column indexed at creation stays indexed after
        # a rename — expand the name set with every rename chain that
        # intersects it, so post-rename segments index the column under
        # its CURRENT name (old sidecars already exist under the old one;
        # prune_point composes the chain probes by unanimity)
        try:
            chains = self._read_commit(self.latest_version()).get(
                "renames"
            ) or {}
        except (OSError, ValueError, IndexError):
            chains = {}  # mid-create: no commits yet, no chains
        expanded = set(cols)
        for logical, chain in chains.items():
            fam = {logical, *chain}
            if fam & expanded:
                expanded |= fam
        cols = sorted(expanded)
        n_words = (m + 63) // 64
        for rel in add:
            side = self._bloom_sidecar_path(rel)
            if os.path.exists(side):
                continue
            seg = self.spark.read.parquet(os.path.join(self.root, rel))
            present = [c for c in cols if c in seg.columns]
            payload: dict = {"m": m, "k": k, "columns": {}}
            if present:
                # (col_idx, position) for every hash of every indexed
                # column, exploded then OR-folded per (col, word)
                entries = []
                for ci, c in enumerate(present):
                    s = F.col(c).cast("string")
                    for i in range(k):
                        pos = (
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 15
                                ),
                                16,
                                10,
                            ).cast("long")
                            % m
                        )
                        entries.append(
                            F.struct(
                                F.lit(ci).alias("ci"), pos.alias("pos")
                            )
                        )
                rows = (
                    seg.select(F.explode(F.array(*entries)).alias("e"))
                    .where(F.col("e.pos").isNotNull())  # null values: skip
                    .selectExpr(
                        "e.ci AS ci",
                        "e.pos DIV 64 AS word",
                        "shiftleft(1L, CAST(e.pos % 64 AS INT)) AS mask",
                    )
                    .groupBy("ci", "word")
                    .agg(F.bit_or("mask").alias("bits"))
                    .collect()
                )
                words: dict[int, list[int]] = {
                    ci: [0] * n_words for ci in range(len(present))
                }
                for r in rows:
                    words[r[0]][int(r[1])] = int(r[2])
                for ci, c in enumerate(present):
                    packed = struct.pack(f"<{n_words}q", *words[ci])
                    payload["columns"][c] = base64.b64encode(packed).decode()
            tmp = f"{side}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                json.dump(payload, fh)
            os.replace(tmp, side)

    @staticmethod
    def _bloom_positions(value, m: int, k: int) -> list[int]:
        """The k bit positions of ``value`` — byte-identical to the
        Spark-side md5/conv expression in :meth:`_write_bloom_sidecars`
        (the repo's shared cross-engine hash primitive)."""
        s = str(value)
        return [
            int(
                hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16
            ) % m
            for i in range(k)
        ]

    def _bloom_might_contain(self, rel: str, col: str, value) -> bool:
        """Membership probe against a segment's sidecar.  CONSERVATIVE:
        a missing sidecar, unindexed column, or unreadable payload
        answers True (scan it) — bloom pruning may only ever skip a
        segment the filter PROVES cannot hold the value."""
        side = self._bloom_sidecar_path(rel)
        if not os.path.exists(side):
            return True
        try:
            with open(side) as fh:
                payload = json.load(fh)
            b64 = payload["columns"].get(col)
            if b64 is None:
                return True
            words = struct.unpack(
                f"<{(payload['m'] + 63) // 64}q", base64.b64decode(b64)
            )
            return all(
                words[p // 64] & (1 << (p % 64))
                for p in self._bloom_positions(
                    value, payload["m"], payload["k"]
                )
            )
        except (
            KeyError,
            TypeError,
            ValueError,
            OSError,  # sidecar vacuumed between exists() and open()
            struct.error,
            json.JSONDecodeError,
        ):
            return True

    def prune_point(
        self, version: int, col: str, value
    ) -> tuple[list[str], list[str]]:
        """Split the live set into (scanned, skipped) for an equality
        probe ``col = value``, combining min/max stats (cheap, from the
        commit log) with the per-segment bloom probe (catches the case
        stats cannot: a high-cardinality column in a layout clustered by
        a DIFFERENT dimension, where every segment's [min,max] straddles
        every value).  Either filter alone skipping a segment is proof —
        both are conservative, so the composition is too."""
        if value is None:
            raise ValueError("prune_point: NULL has no equality matches "
                             "(SQL semantics); filter IS NULL instead")
        if isinstance(value, bool) or not isinstance(value, (int, str)):
            # str(value) must equal Spark's cast-to-string of the column
            # or the probe silently prunes a HOLDING segment (a false
            # negative); only int/str probes have that guarantee
            raise TypeError(
                "prune_point: probe value must be int or str "
                f"(got {type(value).__name__}; floats/bools/timestamps "
                "have engine-divergent string forms)"
            )
        scanned, skipped = self.pruned_segments(version, col, value, value)
        names = self._stat_names(version, col)
        really_scanned = []
        for rel in scanned:
            # each file physically stores exactly ONE of the names; its
            # sidecar indexes that one, and probes of the others answer
            # the conservative True-by-absence.  A DEFINITIVE absent
            # (False) under any name can therefore only come from the
            # physically-present column — proof the segment lacks the
            # value.  For unrenamed columns (names == [col]) this is the
            # original single-probe behavior exactly.
            if all(
                self._bloom_might_contain(rel, n, value) for n in names
            ):
                really_scanned.append(rel)
            else:
                skipped.append(rel)
        return really_scanned, sorted(skipped)

    def read_point(self, col: str, value, version: int | None = None) -> DataFrame:
        """Snapshot read that SKIPS segments provably not holding
        ``col = value`` (stats + bloom file pruning).  Like
        :meth:`read_pruned`, the caller applies the residual equality
        predicate — pruning skips whole files, it does not filter rows.
        Deletion vectors are applied as in every read."""
        version, _, dvs, entry = self._snapshot_state(version)
        scanned, _ = self.prune_point(version, col, value)
        schema = StructType.fromJson(entry["schema"])
        return self._scan_segments(version, scanned, schema, dvs=dvs)

    def version_at(self, ts: float) -> int:
        """TIMESTAMP AS OF resolution (Delta/Iceberg): the latest version
        whose commit timestamp is <= ``ts`` (epoch seconds).  Walks every
        commit rather than binary-searching so a clock-skewed commit
        cannot hide a later qualifying version; O(commits) driver
        metadata, like history()."""
        best = None
        for v in self._versions():
            if self._read_commit(v)["ts"] <= ts:
                best = v if best is None else max(best, v)
        if best is None:
            raise ValueError(
                f"no commit at or before timestamp {ts} "
                f"(first commit: {self._read_commit(self._versions()[0])['ts']})"
            )
        return best

    def read(
        self, version: int | None = None, timestamp: float | None = None
    ) -> DataFrame:
        """Snapshot read.  The segment list is resolved EAGERLY, so the
        returned (lazy) DataFrame stays pinned to this snapshot no matter
        what is committed afterwards — that, plus segment immutability, is
        the snapshot-isolation guarantee.  ``timestamp`` is TIMESTAMP AS
        OF (mutually exclusive with ``version``): the snapshot committed
        at or before that epoch time."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        version, live, dvs, entry = self._snapshot_state(version)
        schema = StructType.fromJson(entry["schema"])
        return self._scan_segments(version, live, schema, dvs=dvs)

    # ------------------------------------------------------------- mutations
    def read_with_provenance(self, version: int | None = None) -> DataFrame:
        """Snapshot read plus a ``_commit_version`` column: the commit
        that WROTE each row's current segment (Delta's row-commit
        metadata shape — ``_metadata.row_commit_version``).  This is
        FILE provenance by design: a rewrite (compact / merge / UPDATE /
        replaceWhere) reassigns its rows to the rewriting commit, which
        is exactly what the audit cares about (which commit produced
        the bytes being served; vacuum/debug lineage).  One broadcast
        join of the identified scan against the O(files) segment→commit
        map — no data-side shuffle; the map resolves O(tail) via the
        checkpointed fold (:meth:`_live_segment_commits`), so a
        long-lived table's provenance read no longer pays a
        genesis-to-head log walk per call."""
        version, live, dvs, entry = self._snapshot_state(version)
        schema = StructType.fromJson(entry["schema"])
        data_cols = [f.name for f in schema.fields]
        if "_commit_version" in data_cols:
            # same contract as the streaming readChangeFeed: a table may
            # STORE such a column, but a read that APPENDS it must
            # reject the ambiguity loudly rather than emit a duplicate
            raise ValueError(
                "read_with_provenance: the table stores a column named "
                "'_commit_version', reserved for the provenance stamp — "
                "read() it plainly or rename the column"
            )
        by_seg = {
            os.path.basename(rel): v
            for rel, v in self._live_segment_commits(version).items()
        }
        lookup = self.spark.createDataFrame(
            sorted(by_seg.items()), "_dv_seg string, _commit_version bigint"
        )
        scan = self._scan_segments(
            version, live, schema, dvs=dvs, keep_identity=True
        )
        return scan.join(F.broadcast(lookup), "_dv_seg", "left").select(
            *data_cols, "_commit_version"
        )

    def _require_schema(self, df: DataFrame, op: str) -> DataFrame:
        """Schema-on-write enforcement (Delta semantics): mixed-type
        segments under one log would poison every later read, so an
        incompatible batch is rejected AT WRITE TIME.  Nullability is
        ignored (parquet does not round-trip it strictly); ``overwrite``
        is exempt — it replaces the whole live set, so it MAY evolve the
        schema (Delta's overwriteSchema).

        Returns the batch ALIGNED to the table schema: after
        :meth:`widen_column_type`, a writer still producing the
        pre-widening (narrower) type is upcast here — Delta's
        type-widening write path does the same, so old producers keep
        working across the DDL.  Any difference that is not a pure
        lossless widening stays a hard error."""
        current = StructType.fromJson(
            self._read_commit(self.latest_version())["schema"]
        )
        got = [(f.name, f.dataType) for f in df.schema.fields]
        want = [(f.name, f.dataType) for f in current.fields]
        if got == want:
            return df
        if [g[0] for g in got] == [w[0] for w in want] and all(
            g[1] == w[1] or _is_widening(g[1], w[1])
            for g, w in zip(got, want)
        ):
            return df.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in current.fields
                ]
            )
        raise ValueError(
            f"{op}: schema-on-write violation — table has {want}, "
            f"batch has {got}; use overwrite() to evolve the schema"
        )

    def append(self, df: DataFrame) -> int:
        """INSERT — a BLIND append (reads nothing): on a lost commit race
        it auto-rebases across any interleaved DATA commit (Delta's
        ConflictChecker — blind appends conflict only with metadata
        changes), so N concurrent appenders all land with zero
        caller-visible retries and no data-job re-runs."""
        df = self._require_schema(df, "append")
        v = self.latest_version()
        spec = self.partition_spec()
        if spec:
            add, pvs = self._write_partitioned(df, v + 1, spec)
            return self._commit_rebased(
                v, "append", add=add, remove=[], schema=df.schema,
                extra={"pv": pvs}, blind=True,
            )
        add = [self._write_segment(df, v + 1)]
        return self._commit_rebased(
            v, "append", add=add, remove=[], schema=df.schema, blind=True,
        )

    def idempotent_append(
        self, df: DataFrame, source_id: str, batch_id: int
    ) -> int:
        """Exactly-once sink commit (Delta's ``txn`` action): every commit
        records its (source_id, batch_id); a REPLAYED batch — Spark
        re-running foreachBatch after a failure — finds its transaction
        already in the log and becomes a no-op instead of double-writing.
        This is what makes ``foreachBatch`` into a vtable exactly-once:
        the data write and the batch-id record land in ONE atomic commit.
        Single-writer-per-source contract with monotonically increasing
        batch ids (the structured-streaming model); concurrent DIFFERENT
        sources interleave safely: a commit lost to another source's
        writer is retried at the new head (the segment is already
        written — only the O(1) commit repeats).  The replay check reads
        the checkpoint-folded txn map (Delta's setTransactions) — O(tail)
        per batch, not O(history), so a year-running sink stays cheap.
        Returns the exact original version for a replay of the source's
        latest batch (the foreachBatch failure model); an OLDER batch id
        also no-ops, returning the source's latest committed version."""
        latest_txn = self._resolve_txns(self.latest_version()).get(source_id)
        if latest_txn is not None and batch_id <= latest_txn[0]:
            # replay: this batch (or a predecessor it subsumes) committed
            return latest_txn[1]
        df = self._require_schema(df, "idempotent_append")
        add = [self._write_segment(df, self.latest_version() + 1)]
        for _ in range(64):  # bounded: each loss means another's progress
            v = self.latest_version()
            # Re-validate against the NEW head after every lost race: the
            # interleaved winner may have recorded this very txn (another
            # replay of the same batch — re-check the txn map) or widened
            # the table schema via append_evolve — the retried commit must
            # record the CURRENT (widened) schema, not the pre-race
            # df.schema, or it would silently revert the evolution for
            # every later reader (read() serves the latest commit schema).
            latest_txn = self._resolve_txns(v).get(source_id)
            if latest_txn is not None and batch_id <= latest_txn[0]:
                return latest_txn[1]
            current = StructType.fromJson(self._read_commit(v)["schema"])
            cur_types = {f.name: f.dataType for f in current.fields}
            incompatible = [
                f.name for f in df.schema.fields
                if cur_types.get(f.name) != f.dataType
            ]
            if incompatible:
                raise ValueError(
                    "idempotent_append: schema-on-write violation after a "
                    f"concurrent commit — table now has {sorted(cur_types)}"
                    f", batch column {incompatible[0]!r} is absent or "
                    "type-changed; use overwrite() to replace the schema"
                )
            # batch columns are a type-exact subset of the current schema:
            # the already-written segment reads fine under the (possibly
            # wider) current schema — absent columns surface as null —
            # so only the RECORDED schema needs aligning, never the data
            try:
                self._commit(
                    v + 1, "append", add=add, remove=[], schema=current,
                    extra={"txn": {"source": source_id, "batch": batch_id}},
                )
                return v + 1
            except ConcurrentCommitError:
                continue
        raise ConcurrentCommitError(
            f"idempotent_append({source_id}, {batch_id}): lost 64 "
            "consecutive commit races"
        )

    def append_evolve(self, df: DataFrame) -> int:
        """Schema evolution (Delta ``mergeSchema``): the incoming batch
        may ADD columns and/or OMIT existing ones; columns present in
        both must keep their exact type (a type CHANGE is not evolution —
        use :meth:`overwrite`).  The commit records the WIDENED schema —
        existing fields first, order preserved, new fields appended as
        nullable — and the batch is aligned to it (omitted columns filled
        with typed nulls).  Readers need no data migration: old segments
        read under the widened schema surface the new columns as null
        (the parquet reader fills absent columns), while time travel to a
        pre-evolution version still serves the schema recorded THEN.  At
        100 TB this is the whole point: adding a column is one metadata
        commit, never a table rewrite."""
        v, _, entry = self._snapshot(None)
        current = StructType.fromJson(entry["schema"])
        cur_types = {f.name: f.dataType for f in current.fields}
        batch_types = {f.name: f.dataType for f in df.schema.fields}
        clash = [
            n for n, dt in batch_types.items()
            if n in cur_types
            and dt != cur_types[n]
            # a batch still producing the pre-widening narrower type is
            # fine — the alignment select upcasts it (same contract as
            # _require_schema's write path after widen_column_type)
            and not _is_widening(dt, cur_types[n])
        ]
        retired = {
            r
            for rs in (entry.get("renames") or {}).values()
            for r in rs
        } | {
            r
            for rs in (entry.get("dropped") or {}).values()
            for r in rs
        }
        reused = [
            n for n in batch_types if n not in cur_types and n in retired
        ]
        if reused:
            # live segments still carry the retired name physically: a
            # NEW column under it would make old files' values bleed
            # into the new column (Delta solves this with field ids; the
            # stand-in refuses the collision loudly)
            raise ValueError(
                f"append_evolve: column name {reused[0]!r} was retired "
                "by rename_column/drop_column and live segments still "
                "store it — pick another name (overwrite() resets "
                "retired names)"
            )
        if clash:
            raise ValueError(
                f"append_evolve: type change is not evolution — "
                f"{clash[0]} is {cur_types[clash[0]]} in the table, "
                f"{batch_types[clash[0]]} in the batch "
                "(use overwrite() to replace the schema)"
            )
        new_fields = [
            StructField(f.name, f.dataType, True)
            for f in df.schema.fields
            if f.name not in cur_types
        ]
        wide = StructType(list(current.fields) + new_fields)
        aligned = df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in batch_types
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in wide.fields
            ]
        )
        add = [self._write_segment(aligned, v + 1)]
        self._commit(
            v + 1, "append", add=add, remove=[], schema=wide,
            extra={"evolved": [f.name for f in new_fields]},
        )
        return v + 1

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE ... RENAME COLUMN — metadata-only, zero rewrite
        (Delta's column-mapping rename).  Segments keep their WRITE-TIME
        column names forever; the commit records the new logical schema
        plus a rename CHAIN (new -> [old, ...older]) that every
        subsequent commit inherits.  Reads spanning the rename project
        each logical column as ``coalesce(current, *retired)`` over a
        widened scan (see :meth:`_scan_segments`); segments written
        after the rename use the new name, so the retired column
        null-fills there and the coalesce is exact even for
        legitimately-NULL values (the retired twin is null precisely
        where the current one holds the row's value, and vice versa —
        the two never overlap within one file).  Time travel to a
        pre-rename version serves the OLD name (its entry's schema and
        chains are what's recorded there); RESTORE across the boundary
        reverts the logical name with the data.

        Refused loudly when: ``old`` is absent, ``new`` collides with a
        live logical name, a reserved internal name, or a RETIRED
        physical name still stored by live segments (Delta solves that
        with field ids; the stand-in refuses), or an active CHECK
        constraint references ``old`` (rewrite or drop the constraint
        first — silently breaking its enforcement expression is worse).
        ``overwrite()`` resets the chains: a whole-live-set replace
        leaves no pre-rename segment live.

        The Python DataSource BATCH source
        (``spark.read.format("eel_vtable")``) is rename-aware (per-file
        first-present-wins projection over the chain, chain-resolved
        stats/bloom pushdown — sources/vtable_batch.py); the STREAMING
        source refuses renamed tables loudly (mid-stream schema change
        semantics are not defined for it)."""
        v, _, entry = self._snapshot(None)
        schema = StructType.fromJson(entry["schema"])
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"rename_column: no column {old!r} ({names})")
        if new in names:
            raise ValueError(f"rename_column: column {new!r} exists")
        if new in _DV_IDENTITY_COLS or new in _FEED_COLS:
            raise ValueError(
                f"rename_column: {new!r} is a reserved internal name"
            )
        chains = {
            k: list(v_) for k, v_ in (entry.get("renames") or {}).items()
        }
        retired_all = {r for rs in chains.values() for r in rs}
        if new in retired_all:
            raise ValueError(
                f"rename_column: {new!r} was retired by an earlier "
                "rename and live segments still store it physically"
            )
        pat = re.compile(rf"\b{re.escape(old)}\b")
        hit = sorted(
            n for n, sql in self.constraints(v).items() if pat.search(sql)
        )
        if hit:
            raise ValueError(
                f"rename_column: CHECK constraint {hit[0]!r} references "
                f"{old!r} — drop or rewrite it first (renaming under it "
                "would silently break enforcement)"
            )
        if any(f["col"] == old for f in (entry.get("spec") or [])):
            raise ValueError(
                f"rename_column: {old!r} is a partition-spec source "
                "column — evolve the spec first (set_partition_spec) so "
                "future writes never reference a retired name"
            )
        new_fields = [
            StructField(new if f.name == old else f.name, f.dataType,
                        f.nullable)
            for f in schema.fields
        ]
        dropped = {
            r
            for rs in (entry.get("dropped") or {}).values()
            for r in rs
        }
        if new in dropped:
            raise ValueError(
                f"rename_column: {new!r} belonged to a dropped column "
                "and live segments still store its values physically — "
                "they would bleed into the renamed column"
            )
        chains[new] = [old] + chains.pop(old, [])
        extra = {"renames": chains, "renamed": {"from": old, "to": new}}
        widen = dict(entry.get("widen") or {})
        if old in widen:
            # the widen map is keyed by LOGICAL name — follow the rename
            # so the Arrow readers keep overriding the footer type
            widen[new] = widen.pop(old)
            extra["widen"] = widen
        self._commit(
            v + 1, "rename", add=[], remove=[],
            schema=StructType(new_fields),
            extra=extra,
        )
        return v + 1

    def drop_column(self, col: str) -> int:
        """ALTER TABLE ... DROP COLUMN — metadata-only, zero rewrite
        (Delta column-mapping drop).  The commit records the narrowed
        logical schema; the column's bytes stay in the segments (scans
        simply never project them) and time travel to a pre-drop version
        still serves it.  The column's PHYSICAL names (itself plus any
        retired rename chain) are recorded as ``dropped`` and inherited
        by every later commit: re-introducing one of them via
        :meth:`append_evolve` or :meth:`rename_column` is refused —
        old files' values would silently bleed into the new column
        (Delta prevents this with field ids).  ``overwrite()`` resets
        the record along with the rename chains; RESTORE across the
        drop resurrects the column with the data.  Refused when the
        column is absent, is the table's only column, or an active
        CHECK constraint references it."""
        v, _, entry = self._snapshot(None)
        schema = StructType.fromJson(entry["schema"])
        names = [f.name for f in schema.fields]
        if col not in names:
            raise ValueError(f"drop_column: no column {col!r} ({names})")
        if len(names) == 1:
            raise ValueError("drop_column: cannot drop the only column")
        pat = re.compile(rf"\b{re.escape(col)}\b")
        hit = sorted(
            n for n, sql in self.constraints(v).items() if pat.search(sql)
        )
        if hit:
            raise ValueError(
                f"drop_column: CHECK constraint {hit[0]!r} references "
                f"{col!r} — drop the constraint first"
            )
        if any(f["col"] == col for f in (entry.get("spec") or [])):
            raise ValueError(
                f"drop_column: {col!r} is a partition-spec source "
                "column — evolve the spec first (set_partition_spec)"
            )
        chains = {
            k: list(v_) for k, v_ in (entry.get("renames") or {}).items()
        }
        dropped = {
            k: list(v_) for k, v_ in (entry.get("dropped") or {}).items()
        }
        dropped[col] = [col, *chains.pop(col, [])]
        extra = {"renames": chains, "dropped": dropped}
        widen = dict(entry.get("widen") or {})
        if col in widen:
            widen.pop(col)
            extra["widen"] = widen
        self._commit(
            v + 1, "drop", add=[], remove=[],
            schema=StructType([f for f in schema.fields if f.name != col]),
            extra=extra,
        )
        return v + 1

    def set_partition_spec(self, fields: list) -> int:
        """ALTER TABLE ... SET PARTITION SPEC — Iceberg hidden
        partitioning as a METADATA commit.  ``fields`` is a list of
        ``(col, transform)`` / ``(col, transform, param)`` tuples or
        equivalent dicts; transforms: identity, year/month/day (date or
        timestamp source), bucket(n) (integral/string source — the
        portable md5 hash needs str(x) == Spark's cast-to-string),
        truncate(w) (integral source).

        From the next partition-aware write on (append / overwrite),
        the batch is split into ONE SEGMENT PER PARTITION TUPLE and each
        segment records its tuple in the commit (``pv``) — the planner
        then prunes on partition values BEFORE the min/max stats fold
        (:meth:`pruned_segments`).  Queries keep filtering on the SOURCE
        column; the partitioning is invisible to them (Iceberg's point).

        SPEC EVOLUTION is just another metadata commit: existing
        segments keep the pv of the spec they were written under and are
        conservatively scanned by probes their old fields cannot answer
        — no rewrite, ever.  An empty ``fields`` list unpartitions
        future writes.  Writes that rewrite existing rows (merge/MOR
        post-images, compaction) stay unpartitioned-and-always-scanned;
        re-partition them with :meth:`compact_clustered` + a fresh
        append if layout matters."""
        v, _, entry = self._snapshot(None)
        schema = StructType.fromJson(entry["schema"])
        types = {f.name: f.dataType.simpleString() for f in schema.fields}
        spec: list[dict] = []
        for raw in fields:
            if isinstance(raw, dict):
                field = {
                    "col": raw["col"],
                    "transform": raw["transform"],
                    "param": raw.get("param"),
                }
            else:
                field = {
                    "col": raw[0],
                    "transform": raw[1],
                    "param": raw[2] if len(raw) > 2 else None,
                }
            col, t, p = field["col"], field["transform"], field["param"]
            if t not in _SPEC_TRANSFORMS:
                raise ValueError(
                    f"set_partition_spec: unknown transform {t!r} "
                    f"({_SPEC_TRANSFORMS})"
                )
            if col not in types:
                raise ValueError(
                    f"set_partition_spec: no column {col!r} "
                    f"({sorted(types)})"
                )
            if t in _TEMPORAL_TRANSFORMS and types[col] not in (
                "date", "timestamp", "timestamp_ntz"
            ):
                raise ValueError(
                    f"set_partition_spec: {t} needs a date/timestamp "
                    f"source, {col} is {types[col]}"
                )
            if t in _TEMPORAL_TRANSFORMS and types[col] == "timestamp":
                # tz-relative source: year/month/day pv values are
                # rendered by date_format under the SESSION timezone at
                # write time, while _spec_probe extracts naive wall-clock
                # prefixes.  Pin the session tz into the spec as part of
                # the contract — every later partitioned write enforces
                # it (loud mismatch error), so a boundary row can never
                # land in a pruned month/day because the zone drifted.
                # date / timestamp_ntz sources are zone-free and need no
                # pin.
                field["tz"] = self.spark.conf.get(
                    "spark.sql.session.timeZone"
                )
            if t == "bucket" and types[col] not in _BLOOMABLE_TYPES:
                raise ValueError(
                    f"set_partition_spec: bucket needs an integral or "
                    f"string source (portable hash), {col} is "
                    f"{types[col]}"
                )
            if t == "truncate" and types[col] not in (
                "tinyint", "smallint", "int", "bigint"
            ):
                raise ValueError(
                    f"set_partition_spec: truncate needs an integral "
                    f"source, {col} is {types[col]}"
                )
            if t in ("bucket", "truncate"):
                if not isinstance(p, int) or p <= 0:
                    raise ValueError(
                        f"set_partition_spec: {t} needs a positive "
                        f"integer param, got {p!r}"
                    )
            elif p is not None:
                raise ValueError(
                    f"set_partition_spec: {t} takes no param"
                )
            spec.append(field)
        reserved = [
            f.name for f in schema.fields
            if re.fullmatch(r"_pt_\d+", f.name)
        ]
        if spec and reserved:
            raise ValueError(
                f"set_partition_spec: column {reserved[0]!r} collides "
                "with the reserved partitioned-write transform names "
                "(_pt_N) — rename it first"
            )
        self._commit(
            v + 1, "set_spec", add=[], remove=[], schema=schema,
            extra={"spec": spec},
        )
        return v + 1

    def partition_spec(self, version: int | None = None) -> list[dict]:
        """The active partition spec at ``version`` (head if None)."""
        _, _, entry = self._snapshot(version)
        return entry.get("spec") or []

    def widen_column_type(self, col: str, new_type) -> int:
        """ALTER TABLE ... ALTER COLUMN TYPE — metadata-only LOSSLESS
        type widening (Delta's ``typeWidening`` table feature, the way
        :meth:`rename_column` matches column mapping).  The commit
        records the widened logical schema plus a ``widen`` map
        (logical name -> widened simpleString) that every later commit
        inherits; segments keep their WRITE-TIME physical type forever
        and the scan layer upcasts at read time (Spark's vectorized
        parquet reader serves INT32 files under a ``bigint`` read schema
        natively — verified on 4.1; the Arrow DataSource readers cast in
        ``align_arrow_table``).  Zero rewrite at any scale: widening a
        column of a 100 TB table is one JSON commit.

        Time travel serves each era's type (a pre-widening version's
        entry records the narrow schema); RESTORE across the boundary
        reverts the type with the data.  NARROWING — or any change not
        in the lossless matrix (``_is_widening``) — is refused loudly:
        files already written wide cannot be served narrow.  Writers
        still producing the old narrow type keep working: the write
        path upcasts widening-compatible batches (``_require_schema``).

        Reference parity: the reference has no ALTER surface (pandas
        scripts rewrite whole frames); this is the lakehouse-layer
        extension the round-9 verdict asked for (#2)."""
        v, _, entry = self._snapshot(None)
        schema = StructType.fromJson(entry["schema"])
        field = next((f for f in schema.fields if f.name == col), None)
        if field is None:
            raise ValueError(
                f"widen_column_type: no column {col!r} "
                f"({[f.name for f in schema.fields]})"
            )
        if isinstance(new_type, str):
            new_dt = StructType.fromDDL(f"__x {new_type}")[0].dataType
        else:
            new_dt = new_type
        if new_dt == field.dataType:
            raise ValueError(
                f"widen_column_type: {col} is already "
                f"{field.dataType.simpleString()}"
            )
        if not _is_widening(field.dataType, new_dt):
            raise ValueError(
                "widen_column_type: "
                f"{field.dataType.simpleString()} -> "
                f"{new_dt.simpleString()} is not a lossless widening — "
                "narrowing/cross-family changes need overwrite() "
                "(files already written cannot be served narrower)"
            )
        # the same spec-source protection rename/drop carry: a bucket or
        # truncate spec hashes/arithmetics the SOURCE type — widening it
        # out of the transform's domain (int -> double breaks the
        # str(x)==cast-to-string hash contract) would silently corrupt
        # partition pruning for every later write.  Integer-ladder
        # widenings are fine: str(5) is width-independent.
        for f in entry.get("spec") or []:
            if f["col"] != col:
                continue
            t = f["transform"]
            new_simple = new_dt.simpleString()
            if t == "bucket" and new_simple not in _BLOOMABLE_TYPES:
                raise ValueError(
                    f"widen_column_type: {col!r} is a bucket partition-"
                    f"spec source; widening to {new_simple} would break "
                    "the portable-hash contract — evolve the spec first "
                    "(set_partition_spec)"
                )
            if t == "truncate" and new_simple not in (
                "tinyint", "smallint", "int", "bigint"
            ):
                raise ValueError(
                    f"widen_column_type: {col!r} is a truncate partition-"
                    f"spec source; widening to {new_simple} leaves the "
                    "integral domain — evolve the spec first"
                )
        new_fields = [
            StructField(col, new_dt, True) if f.name == col else f
            for f in schema.fields
        ]
        widen = dict(entry.get("widen") or {})
        widen[col] = new_dt.simpleString()
        self._commit(
            v + 1, "widen_type", add=[], remove=[],
            schema=StructType(new_fields),
            extra={
                "widen": widen,
                "widened": {
                    "column": col,
                    "from": field.dataType.simpleString(),
                    "to": new_dt.simpleString(),
                },
            },
        )
        return v + 1

    def overwrite(self, df: DataFrame) -> int:
        v, live, entry = self._snapshot(None)
        spec = entry.get("spec") or []
        old_types = {
            f.name: f.dataType.simpleString()
            for f in StructType.fromJson(entry["schema"]).fields
        }
        new_types = {
            f.name: f.dataType.simpleString() for f in df.schema.fields
        }
        # names AND rendering-stable spec-source types: a same-name
        # type-evolving replace (overwrite may evolve schema) on a
        # bucket/truncate/temporal spec source would write pv values
        # under the NEW type's rendering while _spec_probe hashes the
        # probe's — an unsound skip.  _spec_type_stable guards that the
        # way rename/drop/widen guard their spec sources.
        type_stable = _spec_type_stable(spec, old_types, new_types)
        extra_pv: dict = {}
        if (
            spec
            and type_stable
            and [f.name for f in df.schema.fields]
            == [f["name"] for f in entry["schema"]["fields"]]
        ):
            # same-shape overwrite: keep the layout contract (a replace
            # that EVOLVES the schema may invalidate spec columns — it
            # writes unpartitioned and the spec applies again from the
            # next same-shape write)
            add, extra_pv = self._write_partitioned(df, v + 1, spec)
        else:
            add = [self._write_segment(df, v + 1)]
        # a whole-live-set replace leaves no pre-rename segment live:
        # reset the rename chains (also what frees retired names for
        # reuse after an overwriteSchema)
        extra = {
            "renames": {}, "dropped": {}, "widen": {}, "pv": extra_pv,
        }
        if spec and not type_stable:
            # schema-evolving replace dropped a spec source column or
            # changed its type out of the rendering-stable family: the
            # spec cannot apply to future writes — reset it (metadata
            # only), like the rename/drop chains
            extra["spec"] = []
        self._commit(
            v + 1, "overwrite", add=add, remove=live, schema=df.schema,
            extra=extra,
        )
        return v + 1

    def overwrite_where(self, df: DataFrame, condition: Column | str) -> int:
        """Delta's ``replaceWhere``: atomically DELETE every row matching
        the predicate and INSERT ``df``, in ONE commit — the periodic-
        reload shape (recompute one slice of a 100 TB table without
        touching the rest).  Touched-file discovery is EXACT via the
        pushed-down predicate (:meth:`_matched_segments`); segments with
        no matching row stay live untouched, and the touched ones are
        rewritten keeping only their non-matching rows (through a
        DV-aware read, so their deletion vectors materialize with the
        rewrite).  Every ``df`` row must satisfy the predicate — the
        Delta replaceWhere contract — validated against the WRITTEN
        batch (O(delta), one footer-backed scan); a violating batch is
        rejected with the table unchanged.  Predicate UNKNOWN (null)
        rows are kept, like SQL DELETE.  For a pure range predicate
        prefer :meth:`overwrite_range`, which additionally keeps
        stats-disjoint files out of the discovery scan entirely.  On CDF
        tables the commit carries delete rows for the replaced slice and
        insert rows for the batch."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        v, live, dvs, entry = self._snapshot_state(None)
        return self._replace_slice(
            df, cond, str(condition), live, [], v, dvs, entry
        )

    def overwrite_range(self, df: DataFrame, col: str, lo, hi) -> int:
        """:meth:`overwrite_where` specialized to ``lo <= col <= hi`` —
        the dynamic-partition-overwrite shape (reload yesterday's slice
        of a time-ordered 100 TB table): candidate files come from the
        LOG's min/max stats FIRST, so provably-disjoint segments never
        even enter the discovery scan (sound, never optimistic — a
        statless segment is conservatively scanned; see
        :meth:`pruned_segments`), then exact discovery narrows to the
        files truly holding matching rows.  On a range-clustered layout
        the whole reload plans from O(log) metadata plus a scan of the
        overlapping files only."""
        v, live, dvs, entry = self._snapshot_state(None)
        candidates, skipped = self.pruned_segments(v, col, lo, hi)
        cond = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        return self._replace_slice(
            df, cond, f"{col} BETWEEN {lo} AND {hi}", candidates, skipped,
            v, dvs, entry, probes=[(col, lo, hi)],
        )

    def replace_where_segment(
        self, new_rel: str | None, condition: Column | str
    ) -> int:
        """:meth:`overwrite_where` over an ALREADY-WRITTEN segment — the
        batch-sink path (``df.write.format("eel_vtable")
        .option("replaceWhere", ...)``): tasks streamed the batch into
        ``new_rel`` through the two-phase write protocol; this turns it
        into one atomic predicate-scoped replace without re-writing the
        data.  Same contract as overwrite_where: every batch row must
        satisfy the predicate (validated from the written files,
        O(delta)) and the batch passes the active CHECK constraints —
        a rejected batch deletes the segment and leaves the table
        unchanged.  ``new_rel=None`` is the empty batch: a pure
        predicate delete."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        v, live, dvs, entry = self._snapshot_state(None)
        if new_rel is not None:
            cons = self.constraints(v)
            if cons:
                self._enforce_constraints([new_rel], cons, "replace_where")
        return self._replace_slice(
            None, cond, str(condition), live, [], v, dvs, entry,
            new_rel=new_rel,
        )

    def _replace_slice(
        self,
        df: DataFrame | None,
        cond: Column,
        cond_desc: str,
        candidates: list[str],
        skipped: list[str],
        v: int,
        dvs: list[str],
        entry: dict,
        new_rel: str | None = None,
        probes: list[tuple] | None = None,
    ) -> int:
        """Shared replaceWhere core: exact touched discovery over
        ``candidates`` (``skipped`` were already proven disjoint from log
        stats), rewrite of the touched segments minus their matching
        rows, the validated batch appended, one atomic commit.  The
        batch arrives either as a DataFrame (``df``, written here) or as
        an already-written segment (``new_rel``, the sink path — may be
        None for an empty batch)."""
        if df is not None:
            df = self._require_schema(df, "overwrite_where")
        schema = StructType.fromJson(entry["schema"])
        data_cols = [f.name for f in schema.fields]
        match = F.coalesce(cond, F.lit(False))
        touched: list[str] = []
        if candidates:
            scan = self._scan_segments(
                v, candidates, schema, dvs=dvs, keep_identity=True
            )
            touched = self._matched_segments(scan, match, candidates)
        # the batch lands (and is validated) before the slice rewrite:
        # a rejected batch must cost nothing but its own write
        if df is not None:
            new_rel = self._write_segment(df, v + 1)
        if new_rel is not None:
            n_bad = (
                self.spark.read.schema(schema)
                .parquet(os.path.join(self.root, new_rel))
                .where(~match)
                .limit(1)
                .count()
            )
            if n_bad:
                shutil.rmtree(
                    os.path.join(self.root, new_rel), ignore_errors=True
                )
                raise ValueError(
                    "overwrite_where: replacement rows must ALL satisfy "
                    f"the predicate ({cond_desc}) — batch rejected, table "
                    "unchanged (the Delta replaceWhere contract)"
                )
        add = [new_rel] if new_rel is not None else []
        empty_new: str | None = None
        if new_rel is not None and self._segment_rows(new_rel) == 0:
            # an empty batch is a pure predicate delete — don't register
            # a zero-row segment as dead weight in every later scan.
            # Deleted only AFTER the commit settles: a caller retrying a
            # lost commit race may hand the same segment back in, and a
            # pre-commit delete would make that retry read a vanished
            # directory.  (On a lost race it stays as a vacuumable
            # orphan until the retry resolves it the same way.)
            empty_new = new_rel
            add = []
            new_rel = None
        if not add and not touched:
            if empty_new is not None:
                shutil.rmtree(
                    os.path.join(self.root, empty_new), ignore_errors=True
                )
            return v  # nothing deleted, nothing inserted: no-op
        extra: dict = {
            "condition": cond_desc,
            "rewritten": len(touched),
            "preserved": len(candidates) - len(touched) + len(skipped),
        }
        if skipped:
            extra["stats_skipped"] = len(skipped)
        if touched:
            slice_df = self._scan_segments(v, touched, schema, dvs=dvs)
            if self.cdf_enabled:
                # the kept rewrite and the delete feed share one scan
                slice_df = slice_df.persist()
            try:
                kept_rel = self._write_segment(
                    slice_df.where(~match).select(*data_cols), v + 1
                )
                if self._segment_rows(kept_rel) == 0:
                    # every row of every touched segment matched
                    shutil.rmtree(
                        os.path.join(self.root, kept_rel),
                        ignore_errors=True,
                    )
                else:
                    add.append(kept_rel)
                if self.cdf_enabled:
                    deletes = (
                        slice_df.where(match)
                        .select(*data_cols)
                        .withColumn("_change_type", F.lit("delete"))
                    )
                    changes = deletes
                    if new_rel in add:
                        # insert images from the batch ALREADY WRITTEN —
                        # the input plan never recomputes
                        changes = deletes.unionByName(
                            self.spark.read.schema(schema)
                            .parquet(os.path.join(self.root, new_rel))
                            .withColumn("_change_type", F.lit("insert"))
                        )
                    extra["cdf"] = self._write_cdf(changes, v + 1)
            finally:
                if self.cdf_enabled:
                    slice_df.unpersist()
        elif self.cdf_enabled:
            extra["cdf"] = self._write_cdf(
                self.spark.read.schema(schema)
                .parquet(os.path.join(self.root, new_rel))
                .withColumn("_change_type", F.lit("insert")),
                v + 1,
            )
        committed = self._commit_rebased(
            v, "replace_where", add=add, remove=list(touched),
            schema=schema, extra=extra,
            read_files=candidates, probes=probes,
        )
        if empty_new is not None:
            # the commit settled without referencing it — reclaim now
            shutil.rmtree(
                os.path.join(self.root, empty_new), ignore_errors=True
            )
        return committed

    def merge_upsert(self, source: DataFrame, keys: list[str]) -> int:
        """MERGE (source wins on key match) as copy-on-write: read the
        snapshot, merge relationally (operators/merge.py upsert — the same
        engine the plain-parquet queries pin), write the merged segment,
        commit swapping the whole live set.  See the module docstring for
        the pruned-rewrite scale path."""
        from energy_emissions_lakehouse_spark.operators.merge import upsert

        source = self._require_schema(source, "merge_upsert")
        v, live, _ = self._snapshot(None)
        target = self.read(v)
        extra: dict = {"keys": keys}
        if self.cdf_enabled:
            # the change-feed write and the merged-segment write are two
            # actions over the same target scan — persist it across both
            # (this is the whole-set merge, already the non-scale form;
            # the pruned variant persists only the touched slice)
            target = target.persist()
        try:
            merged = upsert(target=target, source=source, keys=keys)
            if self.cdf_enabled:
                extra["cdf"] = self._write_cdf(
                    self._merge_changes(target, source, keys), v + 1
                )
            add = [self._write_segment(merged, v + 1)]
        finally:
            if self.cdf_enabled:
                target.unpersist()
        self._commit(
            v + 1, "merge", add=add, remove=live,
            schema=merged.schema, extra=extra,
        )
        return v + 1

    @staticmethod
    def _merge_changes(
        target: DataFrame, source: DataFrame, keys: list[str]
    ) -> DataFrame:
        """The row-level change set of an upsert — update_preimage/
        update_postimage per matched key, insert per new key (Delta's
        unconditional WHEN MATCHED UPDATE CDF; operators/merge.py
        upsert_change_feed, the engine the plain-parquet change-feed
        query pins)."""
        from energy_emissions_lakehouse_spark.operators.merge import (
            upsert_change_feed,
        )

        return upsert_change_feed(target, source, keys)

    def touched_segments(
        self, source: DataFrame, key: str, version: int
    ) -> tuple[list[str], list[str]]:
        """Delta's touched-file discovery: which live segments CAN contain
        a key present in the merge source?  ONE small job joins the
        source's distinct keys against the broadcast per-segment
        [min,max] ranges (O(files) rows — driver metadata scale); a
        segment lacking stats for the key is conservatively touched.
        Returns (touched, untouched), both sorted."""
        stats = self._live_segment_stats(version)
        touched = {r for r, s in stats.items() if s.get(key) is None}
        ranged = [
            (r, stats[r][key][0], stats[r][key][1])
            for r in sorted(stats)
            if stats[r].get(key) is not None
        ]
        if ranged:
            rng = self.spark.createDataFrame(ranged, ["_rel", "_mn", "_mx"])
            hits = (
                source.select(F.col(key).alias("_k"))
                .distinct()
                .join(
                    F.broadcast(rng),
                    (F.col("_k") >= F.col("_mn"))
                    & (F.col("_k") <= F.col("_mx")),
                )
                .select("_rel")
                .distinct()
                .collect()
            )
            touched |= {row._rel for row in hits}
        untouched = [r for r in sorted(stats) if r not in touched]
        return sorted(touched), untouched

    def merge_upsert_pruned(self, source: DataFrame, keys: list[str]) -> int:
        """MERGE with file-level pruned rewrite — the shape Delta/Iceberg
        actually execute at scale: only segments whose key range overlaps
        the source keys are read and rewritten; provably-disjoint segments
        stay live UNTOUCHED in the new commit.  A daily 0.1% delta into a
        100 TB time-ordered table rewrites a handful of files instead of
        the whole table (contrast merge_upsert, the whole-set
        copy-on-write).  Pruning on ``keys[0]`` alone is sound: an
        all-keys match requires equality on the first key, so a segment
        disjoint in ``keys[0]`` cannot contain a match; unmatched source
        rows (inserts) land in the rewritten segment.  Correctness never
        rests on the stats: a statless segment is conservatively
        rewritten, and the oracle checks the merged content value-exactly."""
        from energy_emissions_lakehouse_spark.operators.merge import upsert

        source = self._require_schema(source, "merge_upsert_pruned")
        v, live, entry = self._snapshot(None)
        touched, untouched = self.touched_segments(source, keys[0], v)
        schema = StructType.fromJson(entry["schema"])
        # DV-aware slice read: a merge-on-read-deleted row must not be
        # resurrected by the rewrite (the rewrite MATERIALIZES the DVs of
        # the touched segments; untouched segments keep theirs active)
        target = self._scan_segments(v, touched, schema)
        extra: dict = {
            "keys": list(keys),
            "rewritten": len(touched),
            "preserved": len(untouched),
        }
        if self.cdf_enabled:
            # the touched slice (small by construction — that is the point
            # of pruning) feeds two jobs: persist it across both
            target = target.persist()
        try:
            merged = upsert(target=target, source=source, keys=list(keys))
            if self.cdf_enabled:
                # the touched slice contains every matchable key, so the
                # change set over it equals the full-table change set
                extra["cdf"] = self._write_cdf(
                    self._merge_changes(target, source, list(keys)), v + 1
                )
            add = [self._write_segment(merged, v + 1)]
        finally:
            if self.cdf_enabled:
                target.unpersist()
        # rebase probe: the merge READ every row whose keys[0] falls in
        # the source's key range — one tiny agg over the delta side,
        # LAZY so the uncontended path never runs it (resolved by
        # _commit_rebased only on a lost race)
        def _krange_probe():
            krange = source.agg(
                F.min(keys[0]).alias("mn"), F.max(keys[0]).alias("mx")
            ).first()
            return (
                [(keys[0], krange["mn"], krange["mx"])]
                if krange["mn"] is not None
                else []
            )

        return self._commit_rebased(
            v, "merge", add=add, remove=touched, schema=merged.schema,
            extra=extra, read_files=touched, probes=_krange_probe,
        )

    def delete_where(self, condition: Column | str) -> int:
        """SQL DELETE semantics: rows where the predicate is TRUE are
        removed; FALSE and NULL rows are kept (hence the coalesce)."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        v, live, _ = self._snapshot(None)
        snapshot = self.read(v)
        extra: dict = {"condition": str(condition)}
        if self.cdf_enabled:
            # delete-rows feed + kept-rows rewrite scan the same snapshot
            snapshot = snapshot.persist()
        try:
            kept = snapshot.where(~F.coalesce(cond, F.lit(False)))
            if self.cdf_enabled:
                extra["cdf"] = self._write_cdf(
                    snapshot.where(
                        F.coalesce(cond, F.lit(False))
                    ).withColumn("_change_type", F.lit("delete")),
                    v + 1,
                )
            add = [self._write_segment(kept, v + 1)]
        finally:
            if self.cdf_enabled:
                snapshot.unpersist()
        self._commit(
            v + 1, "delete", add=add, remove=live,
            schema=kept.schema, extra=extra,
        )
        return v + 1

    def _resolve_assignments(
        self, set_exprs: dict, schema: StructType
    ) -> dict[str, Column]:
        """SQL UPDATE SET list: every target must be an existing column,
        and each value expression (a Column or a SQL string, evaluated
        against the PRE-image row) is cast to the column's CURRENT type
        — ANSI UPDATE semantics: assignment casts to the column type, it
        never evolves the schema."""
        if not set_exprs:
            raise ValueError("update: empty SET list")
        types = {f.name: f.dataType for f in schema.fields}
        out: dict[str, Column] = {}
        for name, value in set_exprs.items():
            if name not in types:
                raise ValueError(
                    f"update: SET target {name!r} is not a table column "
                    f"(have {sorted(types)})"
                )
            col = F.expr(value) if isinstance(value, str) else value
            out[name] = col.cast(types[name])
        return out

    def _matched_segments(
        self, scan: DataFrame, match: Column, rels: list[str]
    ) -> list[str]:
        """EXACT touched-file discovery: which of ``rels`` hold at least
        one row where ``match`` is true?  One small job over an
        identity-keeping scan — the predicate is pushed into the parquet
        read (row-group stats skip non-matching groups at the source)
        and only O(files) distinct segment names ever cross the driver.
        Exact discovery can never be optimistic: a segment with no
        matching row needs no rewrite by definition — so unlike
        stats-based candidate pruning there is no exactness caveat."""
        by_base = {os.path.basename(r): r for r in rels}
        hits = scan.where(match).select("_dv_seg").distinct().collect()
        return sorted(by_base[row._dv_seg] for row in hits)

    def _segment_rows(self, rel: str) -> int:
        """Row count of a just-written segment from its parquet FOOTERS —
        O(part files) driver metadata, no Spark job."""
        import glob as _glob

        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in _glob.glob(
                os.path.join(self.root, rel, "part-*.parquet")
            )
        )

    def update_where(
        self, condition: Column | str, set_exprs: dict
    ) -> int:
        """SQL UPDATE as pruned copy-on-write (Delta UPDATE): one
        discovery pass finds the segments actually holding matching rows
        (exact, via the pushed-down predicate — see
        :meth:`_matched_segments`), and ONLY those are rewritten with the
        SET expressions applied; every other segment stays live untouched
        in the new commit.  At 100 TB a 0.1% update rewrites a handful of
        files, never the table (and :meth:`update_where_mor` rewrites
        NOTHING).  SET values are evaluated on the PRE-image and cast to
        the column's current type; predicate UNKNOWN (null) rows are kept
        unchanged — both exactly SQL UPDATE.  No-op (commit-free) when
        nothing matches.  The rewritten segment passes the CHECK-
        constraint choke point like every write; on CDF tables the commit
        carries update_preimage/update_postimage rows from the same
        scan.  The touched segments are rewritten through a DV-aware
        read, so their deletion vectors materialize with the rewrite."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        v, live, dvs, entry = self._snapshot_state(None)
        schema = StructType.fromJson(entry["schema"])
        data_cols = [f.name for f in schema.fields]
        assigns = self._resolve_assignments(set_exprs, schema)
        match = F.coalesce(cond, F.lit(False))
        scan = self._scan_segments(
            v, live, schema, dvs=dvs, keep_identity=True
        )
        touched = self._matched_segments(scan, match, live)
        if not touched:
            return v  # an UPDATE of zero rows: no-op, commit-free
        slice_df = self._scan_segments(v, touched, schema, dvs=dvs)
        extra: dict = {
            "condition": str(condition),
            "set": {c: str(set_exprs[c]) for c in sorted(set_exprs)},
            "rewritten": len(touched),
            "preserved": len(live) - len(touched),
        }
        if self.cdf_enabled:
            # the rewrite and the two image feeds share one slice scan
            slice_df = slice_df.persist()
        try:
            updated = slice_df.select(
                *[
                    F.when(match, assigns[c]).otherwise(F.col(c)).alias(c)
                    if c in assigns
                    else F.col(c)
                    for c in data_cols
                ]
            )
            if self.cdf_enabled:
                matched_rows = slice_df.where(match)
                pre = matched_rows.select(*data_cols).withColumn(
                    "_change_type", F.lit("update_preimage")
                )
                post = matched_rows.select(
                    *[
                        assigns[c].alias(c) if c in assigns else F.col(c)
                        for c in data_cols
                    ]
                ).withColumn("_change_type", F.lit("update_postimage"))
                extra["cdf"] = self._write_cdf(pre.unionByName(post), v + 1)
            add = [self._write_segment(updated, v + 1)]
        finally:
            if self.cdf_enabled:
                slice_df.unpersist()
        self._commit(
            v + 1, "update", add=add, remove=touched, schema=schema,
            extra=extra,
        )
        return v + 1

    def delete_where_mor(self, condition: Column | str) -> int:
        """Merge-on-read DELETE (Delta deletion vectors / Iceberg
        positional deletes): instead of rewriting every live segment
        minus the matching rows (:meth:`delete_where`, copy-on-write),
        ONE filtered scan finds the matching rows' (segment, file,
        position) identities and writes them as a tiny deletion-vector
        file; the commit references it with ZERO data segments touched.
        Readers mask DV positions with a broadcast anti-join.  At 100 TB
        this turns a delete from a full table rewrite into a scan plus a
        kilobytes-scale metadata write; the deferred rewrite happens at
        the next :meth:`compact` / full-replace, which materializes and
        clears the DVs.  Same null semantics as SQL DELETE (only
        predicate-TRUE rows are deleted).  Note the semantics are
        POSITION-scoped, not predicate-scoped: rows appended AFTER this
        commit stay live even if they match the predicate."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        v, live, dvs, entry = self._snapshot_state(None)
        schema = StructType.fromJson(entry["schema"])
        if not live:
            # SQL DELETE from an empty table is a no-op, not an error —
            # same commit-free surface as delete_where / zero matches
            return v
        data_cols = [f.name for f in schema.fields]
        # the identified scan already excludes previously-masked rows, so
        # they cannot re-enter the new DV or double-count in the feed
        scan = self._scan_segments(
            v, live, schema, dvs=dvs, keep_identity=True
        )
        matched = scan.where(F.coalesce(cond, F.lit(False)))
        extra: dict = {"condition": str(condition)}
        if self.cdf_enabled:
            # the DV write and the delete-rows feed share one scan
            matched = matched.persist()
        try:
            dv_rel = self._write_dv(matched, v + 1)
            if dv_rel is None:
                # a DELETE matching ZERO rows is a commit-free no-op —
                # the surface every other DML shape already has
                # (delete_where, update_where, update_where_mor, merge)
                # and what the model checker's noop program asserts.
                # Found by the round-9 DDL-aware random program: this
                # path previously published an empty no-change
                # "delete_mor" commit (harmless to readers/streams, but
                # an inconsistent DML surface — and the original
                # checker's seed had never drawn its noop op to catch
                # it).  No CDF either: zero rows changed.
                return v
            extra["dv_add"] = [dv_rel]
            if self.cdf_enabled:
                extra["cdf"] = self._write_cdf(
                    matched.select(*data_cols).withColumn(
                        "_change_type", F.lit("delete")
                    ),
                    v + 1,
                )
        finally:
            if self.cdf_enabled:
                matched.unpersist()
        self._commit(
            v + 1, "delete_mor", add=[], remove=[], schema=schema,
            extra=extra,
        )
        return v + 1

    def update_where_mor(
        self, condition: Column | str, set_exprs: dict
    ) -> int:
        """SQL UPDATE as merge-on-read (Delta's DV-backed UPDATE): the
        matched rows' positions land in a deletion vector and their
        POST-images are appended as ONE new segment — ZERO existing
        segments rewritten, the cheapest update shape at 100 TB
        (kilobytes of positions plus O(matched) new rows; the deferred
        rewrite amortizes into the next :meth:`compact`).  Same SET
        semantics as :meth:`update_where` (pre-image evaluation, cast to
        the column type, UNKNOWN rows untouched), and POSITION-scoped
        like :meth:`delete_where_mor`: the update applies to rows live
        NOW — later appends matching the predicate are untouched.  No-op
        (commit-free) when nothing matches.  The appended images pass
        the CHECK-constraint choke point like every write; CDF commits
        carry update_preimage/update_postimage rows from the same scan."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        v, live, dvs, entry = self._snapshot_state(None)
        if not live:
            # SQL UPDATE of an empty table is a no-op, not an error —
            # same commit-free surface as update_where / zero matches
            return v
        schema = StructType.fromJson(entry["schema"])
        data_cols = [f.name for f in schema.fields]
        assigns = self._resolve_assignments(set_exprs, schema)
        # the identified scan already excludes previously-masked rows, so
        # they cannot re-enter the new DV or the appended images
        scan = self._scan_segments(
            v, live, schema, dvs=dvs, keep_identity=True
        )
        # one scan feeds the DV write, the image write, and (CDF) the
        # pre/post feeds — persist it across those jobs
        matched = scan.where(F.coalesce(cond, F.lit(False))).persist()
        extra: dict = {
            "condition": str(condition),
            "set": {c: str(set_exprs[c]) for c in sorted(set_exprs)},
        }
        try:
            dv_rel = self._write_dv(matched, v + 1)
            if dv_rel is None:
                return v  # an UPDATE of zero rows: no-op, commit-free
            extra["dv_add"] = [dv_rel]
            images = matched.select(
                *[
                    assigns[c].alias(c) if c in assigns else F.col(c)
                    for c in data_cols
                ]
            )
            if self.cdf_enabled:
                pre = matched.select(*data_cols).withColumn(
                    "_change_type", F.lit("update_preimage")
                )
                post = images.withColumn(
                    "_change_type", F.lit("update_postimage")
                )
                extra["cdf"] = self._write_cdf(pre.unionByName(post), v + 1)
            add = [self._write_segment(images, v + 1)]
        finally:
            matched.unpersist()
        self._commit(
            v + 1, "update_mor", add=add, remove=[], schema=schema,
            extra=extra,
        )
        return v + 1

    def merge_upsert_mor(self, source: DataFrame, keys: list[str]) -> int:
        """MERGE as merge-on-read (Iceberg MOR merge / Delta DV-backed
        MERGE): matched target rows are masked by a deletion vector —
        positions discovered by ONE broadcast semi-join of the identified
        scan against the source's distinct keys — and the ENTIRE source
        lands as one appended segment (source-wins updates and inserts
        together).  ZERO existing segments are rewritten: where
        :meth:`merge_upsert_pruned` rewrites the touched files, this
        writes only the new segment plus a kilobytes-scale position
        file, the cheapest possible shape for a small delta into a
        100 TB table; the deferred rewrite amortizes into the next
        :meth:`compact`.  Same contract as the other merges: source keys
        must be unique (standard MERGE precondition).  On CDF-enabled
        tables the commit carries update pre/post images and inserts
        from the same scan pipeline."""
        source = self._require_schema(source, "merge_upsert_mor")
        v, live, dvs, entry = self._snapshot_state(None)
        schema = StructType.fromJson(entry["schema"])
        data_cols = [f.name for f in schema.fields]
        extra: dict = {"keys": list(keys)}
        identified = (
            self._scan_segments(v, live, schema, dvs=dvs, keep_identity=True)
            if live
            else None
        )
        if self.cdf_enabled and identified is not None:
            # the DV discovery and the change images share one scan
            identified = identified.persist()
        try:
            if identified is not None:
                matched = identified.join(
                    F.broadcast(source.select(*keys).distinct()),
                    on=list(keys),
                    how="left_semi",
                )
                dv_rel = self._write_dv(matched, v + 1)
                if dv_rel is not None:
                    extra["dv_add"] = [dv_rel]
            if self.cdf_enabled:
                target = (
                    identified.select(*data_cols)
                    if identified is not None
                    else self.spark.createDataFrame([], schema)
                )
                extra["cdf"] = self._write_cdf(
                    self._merge_changes(target, source, list(keys)), v + 1
                )
            add = [self._write_segment(source.select(*data_cols), v + 1)]
        finally:
            if self.cdf_enabled and identified is not None:
                identified.unpersist()
        # rebase contract (same decision table as merge_upsert_pruned):
        # the merge READ every live file (the identified scan) hunting
        # rows whose keys match the source — an interleaved add whose
        # keys[0] range is provably disjoint from the source's cannot
        # hold a match, so the lost race rebases; an in-range add (a row
        # this merge should have masked), any removal of a file the DV
        # references, or another DV all conflict.  Probe is lazy: the
        # uncontended path never pays the key-range agg.
        def _krange_probe():
            krange = source.agg(
                F.min(keys[0]).alias("mn"), F.max(keys[0]).alias("mx")
            ).first()
            return (
                [(keys[0], krange["mn"], krange["mx"])]
                if krange["mn"] is not None
                else []
            )

        return self._commit_rebased(
            v, "merge_mor", add=add, remove=[], schema=schema,
            extra=extra, read_files=live, probes=_krange_probe,
        )

    def compact_dvs(self) -> int:
        """Deletion-vector maintenance: merge the active DV files into
        ONE (a long-running MOR table accumulates a position file per
        delete/merge — every read unions them all, and the log fold
        carries them forever).  Pure metadata rewrite: no data segment
        touched, no row changes (the stream source skips the commit like
        ``compact``, dataChange=false), and reads before/after are
        value-identical by construction.  Delta folds this into
        OPTIMIZE; here it is the explicit maintenance surface.  No-op
        (commit-free) when 0 or 1 DVs are active."""
        v, _, dvs, entry = self._snapshot_state(None)
        if len(dvs) <= 1:
            return v  # nothing to fold
        self._check_present(v, dvs)
        merged = self.spark.read.parquet(
            *(os.path.join(self.root, d) for d in dvs)
        ).distinct()
        new_rel = self._write_dv(merged, v + 1)
        extra = {"dv_remove": sorted(dvs), "folded": len(dvs)}
        if new_rel is not None:  # always true under the no-empty-DV invariant
            extra["dv_add"] = [new_rel]
        self._commit(
            v + 1, "dv_compact", add=[], remove=[],
            schema=StructType.fromJson(entry["schema"]), extra=extra,
        )
        return v + 1

    def restore(self, version: int) -> int:
        """RESTORE TABLE ... TO VERSION AS OF (Delta RESTORE): make the
        head serve exactly the state of ``version`` — as a NEW commit,
        never by rewriting history (time travel to every intermediate
        version keeps working, and the restore itself is auditable and
        restorable-from).  Pure METADATA: the commit re-references the
        target's still-on-disk segments (``add`` = target-not-current,
        ``remove`` = current-not-target) and swaps the deletion-vector
        set to the target's — no data moves, which is the whole point at
        100 TB (Delta RESTORE is the same file-list diff).  The schema
        recorded is the TARGET's, so restoring past an append_evolve
        narrows the served schema back (segment scans project columns by
        name, so any still-live wider segment reads fine).  Constraints
        are NOT reverted — see :meth:`constraints` — and the restored
        snapshot is therefore RE-VALIDATED against any constraint that
        was not yet active at the target version (rows written before a
        check never passed it; silently resurrecting a violator would
        break the writes-enforce-constraints invariant the audit surface
        documents).  That validation is the ONLY restore shape that
        costs a data scan, and it scans the target snapshot once.
        Fails loudly if the target's segments were vacuumed (Delta:
        cannot restore past the retention window).  Restoring to the
        current state is a no-op (no commit).  Streams treat a restore
        commit as a data CHANGE (rows it resurrects/removes are not an
        append) — the source raises unless skipChangeCommits, like
        merge/delete."""
        v_now, live_now, dvs_now, entry_now = self._snapshot_state(None)
        v_t, live_t, dvs_t, entry_t = self._snapshot_state(version)
        add = sorted(set(live_t) - set(live_now))
        remove = sorted(set(live_now) - set(live_t))
        same_dvs = set(dvs_t) == set(dvs_now)
        if not add and not remove and same_dvs and (
            entry_t["schema"] == entry_now["schema"]
        ):
            return v_now  # already serving the target state
        # the resurrected files must still exist — a vacuumed target is
        # unrestorable and must say so, never read as zero rows
        self._check_present(v_t, list(live_t) + list(dvs_t))
        cons_then = self.constraints(v_t)
        unchecked = {
            n: e
            for n, e in self.constraints(v_now).items()
            if cons_then.get(n) != e
        }
        if unchecked:
            # constraints added (or changed) since the target: the
            # target's rows never passed them — validate the snapshot
            # the restore would serve (through its own DV set) and
            # refuse rather than resurrect violators
            snap = self._scan_segments(
                v_t,
                list(live_t),
                StructType.fromJson(entry_t["schema"]),
                dvs=list(dvs_t),
            )
            names = sorted(unchecked)
            row = snap.agg(
                *[
                    F.sum(
                        F.when(_violation_pred(unchecked[n]), 1).otherwise(0)
                    ).alias(n)
                    for n in names
                ]
            ).collect()[0]
            bad = {n: int(row[n]) for n in names if row[n]}
            if bad:
                raise ConstraintViolationError(
                    f"restore({v_t}): the target snapshot violates CHECK "
                    f"constraint(s) {sorted(bad)} added since that "
                    "version — drop the constraint(s) or pick a newer "
                    "target (restore refused, table unchanged)"
                )
        extra: dict = {
            "restored_from": v_t,
            # the restored live set is the TARGET's segments: serve them
            # under the rename/drop records of THEN, not the head's
            "renames": entry_t.get("renames") or {},
            "dropped": entry_t.get("dropped") or {},
            # ...and the widen map of THEN: inheriting the head's would
            # serve a restored-narrow column wide in the Arrow readers
            "widen": entry_t.get("widen") or {},
            # ...and the partition spec of THEN: the head's spec may
            # reference a column the restored schema lacks, which would
            # wedge every later append at the _write_partitioned select
            "spec": entry_t.get("spec") or [],
        }
        if dvs_t or dvs_now:
            # record FULL sets, not diffs — and even when the sets are
            # EQUAL: the fold's full-replace rule (removed >= live resets
            # dvs) may or may not fire depending on live-set overlap, and
            # `dvs := (dvs - dv_remove) | dv_add` lands on exactly the
            # target set from either starting point
            extra["dv_remove"] = sorted(dvs_now)
            extra["dv_add"] = sorted(dvs_t)
        self._commit(
            v_now + 1, "restore", add=add, remove=remove,
            schema=StructType.fromJson(entry_t["schema"]), extra=extra,
        )
        return v_now + 1

    def active_deletion_vectors(self, version: int | None = None) -> list[str]:
        """The DV files masking rows at ``version`` (empty after any
        full-replace rewrite materialized them) — the DESCRIBE surface."""
        version, _, _ = self._snapshot(version)
        return sorted(self._resolve_dvs(version))

    def compact(self, target_partitions: int = 1) -> int:
        """Bin-pack the live segments into ``target_partitions`` files.
        Content-identical by construction (pure coalesce rewrite) — the
        OPTIMIZE surface of Delta/Iceberg.  This is the WHOLE-set form;
        at scale use :meth:`compact_small`, which never rewrites
        already-big files."""
        v, live, _ = self._snapshot(None)
        df = self.read(v).coalesce(target_partitions)
        add = [self._write_segment(df, v + 1)]
        return self._commit_rebased(
            v, "compact", add=add, remove=live, schema=df.schema,
            read_files=live, ignore_adds=True,
        )

    def _segment_bytes(self, rel: str) -> int:
        """On-disk bytes of a segment's part files — O(files) stat."""
        import glob as _glob

        total = 0
        for p in _glob.glob(os.path.join(self.root, rel, "part-*.parquet")):
            try:
                total += os.path.getsize(p)
            except OSError:
                pass
        return total

    def compact_small(
        self, max_bytes: int = 32 << 20, target_partitions: int = 1
    ) -> int:
        """Size-tiered OPTIMIZE (the Delta/Iceberg bin-packing
        semantics): only live segments whose on-disk size is under
        ``max_bytes`` are coalesced into one; every already-big segment
        stays live UNTOUCHED.  This is the only compaction shape that
        exists at 100 TB — a streaming sink's drip of kilobyte commits
        gets folded without ever rewriting the table's bulk (contrast
        :meth:`compact`, the whole-set form).  Content-identical by
        construction; the packed slice is read DV-AWARE, so deletion
        vectors over the small segments materialize with the pack while
        untouched segments keep theirs active.  dataChange=false for
        streams (op ``compact``, skipped like the whole-set form).
        No-op (commit-free) when fewer than two segments qualify."""
        v, live, dvs, entry = self._snapshot_state(None)
        small = [
            rel for rel in live if self._segment_bytes(rel) < max_bytes
        ]
        if len(small) < 2:
            return v  # nothing to pack
        schema = StructType.fromJson(entry["schema"])
        merged = self._scan_segments(v, small, schema, dvs=dvs).coalesce(
            target_partitions
        )
        add = [self._write_segment(merged, v + 1)]
        return self._commit_rebased(
            v, "compact", add=add, remove=small, schema=schema,
            extra={
                "scope": "small",
                "max_bytes": int(max_bytes),
                "packed": len(small),
                "preserved": len(live) - len(small),
            },
            read_files=small, ignore_adds=True,
        )

    def compact_partition(
        self, col: str, value, target_partitions: int = 1
    ) -> int:
        """OPTIMIZE ... WHERE <partition predicate> (Delta's
        partition-scoped OPTIMIZE): bin-pack ONLY the live segments
        whose recorded partition tuple matches ``transform(value)`` on
        a pv field over ``col`` — selection is pure METADATA (the pv
        fold), never a data scan, so compacting one hot partition of a
        100 TB table reads exactly that partition's bytes.  Segments
        with no pv field on ``col`` (pre-spec eras, other spec
        generations) are never touched: only provably-in-partition
        files qualify — the conservative dual of partition pruning.

        The packed segment KEEPS the matched partition tuple (the
        fields every packed segment agreed on), so partition pruning
        keeps working across the compaction.  Content-identical and
        DV-aware like :meth:`compact_small` (op ``compact``,
        dataChange=false — streams skip it); no-op when fewer than two
        segments qualify."""
        v, live, dvs, entry = self._snapshot_state(None)
        pvs = self._live_segment_pvs(v)
        targets: list[str] = []
        for rel in live:
            for key, pval in (pvs.get(rel) or {}).items():
                field = _parse_spec_key(key)
                if (
                    field is not None
                    and field["col"] == col
                    and pval is not None
                    and pval == _spec_probe(field, value)
                ):
                    targets.append(rel)
                    break
        if len(targets) < 2:
            return v  # nothing to pack
        # the packed segment's tuple: the fields ALL packed segments
        # agree on (single-field specs: exactly the matched field)
        common = dict(pvs.get(targets[0]) or {})
        for rel in targets[1:]:
            pv = pvs.get(rel) or {}
            common = {
                k: vv for k, vv in common.items() if pv.get(k) == vv
            }
        schema = StructType.fromJson(entry["schema"])
        merged = self._scan_segments(v, targets, schema, dvs=dvs).coalesce(
            target_partitions
        )
        add = [self._write_segment(merged, v + 1)]
        return self._commit_rebased(
            v, "compact", add=add, remove=targets, schema=schema,
            extra={
                "scope": "partition",
                "packed": len(targets),
                "preserved": len(live) - len(targets),
                "pv": {add[0]: common} if common else {},
            },
            read_files=targets, ignore_adds=True,
        )

    def compact_clustered(
        self, cluster_by: list[str], n_segments: int = 16, bits: int = 8
    ) -> int:
        """OPTIMIZE ZORDER BY (Delta) / sort-order rewrite (Iceberg):
        rewrite the live set into ``n_segments`` segments clustered by
        the bit-interleaved z-value of the two (quantized) cluster
        columns, so per-segment min/max stats become tight on EVERY
        cluster dimension and :meth:`read_pruned` skips segments for a
        probe on ANY of them — impossible under a linear sort on one
        column.  Same integer bit math as the registered logical layout
        (queries/sources.py zorder_layout_lineitem), made PHYSICAL: one
        shuffle (hash on the z-bucket, the same cost class as
        :meth:`compact`), one partitioned write, each bucket becoming
        its own immutable segment with its own folded footer stats.
        Cluster columns must be integer-valued (keys, day numbers)."""
        if len(cluster_by) != 2:
            raise ValueError("compact_clustered takes exactly two columns")
        c1, c2 = cluster_by
        v, live, entry = self._snapshot(None)
        df = self.read(v)
        # Quantization bounds from the commit log's own folded stats when
        # every live segment carries them — O(log) driver metadata, no
        # extra table scan; the agg below is only the stat-less fallback.
        r1 = self.column_range(c1, v)
        r2 = self.column_range(c2, v)
        if r1 is not None and r2 is not None:
            (lo1, hi1), (lo2, hi2) = r1, r2
        else:
            lo1, hi1, lo2, hi2 = df.agg(
                F.min(c1), F.max(c1), F.min(c2), F.max(c2)
            ).collect()[0]
        if lo1 is None or lo2 is None:
            raise ValueError("compact_clustered: empty table or all-null "
                             f"cluster columns {cluster_by}")
        nq = 1 << bits
        q1 = F.floor((F.col(c1) - lo1) * nq / (hi1 - lo1 + 1))
        q2 = F.floor((F.col(c2) - lo2) * nq / (hi2 - lo2 + 1))
        zval = None
        for i in range(bits):
            pair = F.shiftleft(
                F.shiftright(q1, i).bitwiseAND(F.lit(1)), 2 * i + 1
            ) + F.shiftleft(F.shiftright(q2, i).bitwiseAND(F.lit(1)), 2 * i)
            zval = pair if zval is None else zval + pair
        bucket = F.floor(zval * n_segments / (1 << (2 * bits))).cast("int")
        tmp_rel = os.path.join(
            DATA_DIR, f"{_fmt_version(v + 1)}-ztmp-{uuid.uuid4().hex[:8]}"
        )
        tmp_abs = os.path.join(self.root, tmp_rel)
        try:
            (
                df.withColumn("_zb", bucket)
                .repartition(n_segments, "_zb")
                .write.partitionBy("_zb")
                .parquet(tmp_abs)
            )
            # Resolve EVERY bucket dir to its segment number before any
            # rename, so a surprise name fails loudly with nothing moved.
            # Rows with a NULL cluster value land in Spark's default
            # partition — they become their own segment (nulls cluster
            # together, Delta zorder semantics); its cluster-column stats
            # are absent, so pruning always scans it (conservative).
            buckets: list[tuple[int, str]] = []
            for d in sorted(os.listdir(tmp_abs)):
                if not d.startswith("_zb="):
                    continue
                val = d.split("=", 1)[1]
                if val == "__HIVE_DEFAULT_PARTITION__":
                    buckets.append((n_segments, d))  # the nulls segment
                else:
                    buckets.append((int(val), d))
            add = []
            for i, d in buckets:
                rel = os.path.join(
                    DATA_DIR,
                    f"{_fmt_version(v + 1)}-z{i:03d}-{uuid.uuid4().hex[:8]}",
                )
                os.rename(
                    os.path.join(tmp_abs, d), os.path.join(self.root, rel)
                )
                add.append(rel)
        finally:
            shutil.rmtree(tmp_abs, ignore_errors=True)
        return self._commit_rebased(
            v, "compact", add=add, remove=live,
            schema=StructType.fromJson(entry["schema"]),
            extra={"clustered_by": list(cluster_by)},
            read_files=live, ignore_adds=True,
        )

    # ------------------------------------------------------- stats pruning
    def _live_segment_stats(self, version: int) -> dict[str, dict]:
        """Stats for every live segment at ``version``, gathered from the
        commits that ADDED them (stats are immutable with the segment).
        Checkpoint-accelerated like every other fold: the checkpoint
        carries the full live-set stats map (Delta's checkpoint add-file
        stats), so resolution replays only the tail — O(tail) driver
        metadata per pruned read, and O(tail) per checkpoint write.  A
        pre-stats-rev checkpoint forces the genesis walk (never wrong,
        only slower)."""
        return self._live_segment_meta(version)[0]

    def _live_segment_pvs(self, version: int) -> dict[str, dict]:
        """Partition tuples for every live segment at ``version`` (see
        :meth:`_live_segment_meta` — one shared fold with the stats)."""
        return self._live_segment_meta(version)[1]

    def _live_segment_meta(
        self, version: int
    ) -> tuple[dict[str, dict], dict[str, dict]]:
        """(stats, partition tuples) for every live segment at
        ``version`` in ONE checkpoint + tail walk — both maps are
        immutable with their segments and fold identically, and every
        bounded read needs both (pv pruning runs before the stats
        fold), so reading the same commit JSON twice would double the
        planner's metadata I/O for nothing.  Checkpoint-accelerated via
        the ``stats``/``pvs`` keys; a pre-rev checkpoint lacking either
        key forces the genesis walk for that map (never wrong, only
        slower)."""
        live = self._resolve_live(version)
        stats_out: dict[str, dict] = {}
        pvs_out: dict[str, dict] = {}
        stats_start = 0
        pvs_start = 0
        ckpt = self._latest_checkpoint(version)
        if ckpt is not None:
            if "stats" in ckpt:
                stats_out = {
                    rel: st
                    for rel, st in ckpt["stats"].items()
                    if rel in live
                }
                stats_start = ckpt["version"] + 1
            if "pvs" in ckpt:
                pvs_out = {
                    rel: pv
                    for rel, pv in ckpt["pvs"].items()
                    if rel in live
                }
                pvs_start = ckpt["version"] + 1
        # versions are contiguous by construction (every commit claims
        # predecessor+1), so the tail is a range — iterating the full
        # _versions() listing here cost O(history) python work per fold
        # at deep logs (measured, round 11)
        for v in range(min(stats_start, pvs_start), version + 1):
            entry = self._read_commit(v)
            if v >= stats_start:
                for rel in entry["add"]:
                    if rel in live:
                        stats_out[rel] = entry.get("stats", {}).get(
                            rel, {}
                        )
            if v >= pvs_start:
                for rel, pv in (entry.get("pv") or {}).items():
                    if rel in live and pv:
                        pvs_out[rel] = pv
        return stats_out, pvs_out

    def _live_segment_commits(self, version: int) -> dict[str, int]:
        """rel-path → the commit that PHYSICALLY WROTE each live segment
        at ``version`` (first add from genesis — a RESTORE's
        re-reference never wins; the audit cares which commit produced
        the bytes).  Checkpoint-accelerated like the stats fold: the
        checkpoint carries the live set's map, so resolution replays
        only the tail.  The ONE commit shape whose ``add`` can
        re-reference a pre-checkpoint segment is a restore (it records
        ``restored_from``); its re-added rels fall back to a genesis
        walk scoped to just those rels — every other op writes fresh
        uuid-named segments, so a tail-first add IS the physical write.
        Pre-rev checkpoints lack the key and force the genesis walk
        (never wrong, only slower)."""
        live = self._resolve_live(version)
        out: dict[str, int] = {}
        start = 0
        ckpt = self._latest_checkpoint(version)
        if ckpt is not None and "seg_commits" in ckpt:
            out = {
                rel: v
                for rel, v in ckpt["seg_commits"].items()
                if rel in live
            }
            start = ckpt["version"] + 1
        pending = set(live) - set(out)
        refold: set[str] = set()
        for v in range(start, version + 1):
            if not pending:
                break
            entry = self._read_commit(v)
            resurrection = "restored_from" in entry
            for rel in entry["add"]:
                if rel in pending:
                    pending.discard(rel)
                    if resurrection:
                        refold.add(rel)
                    else:
                        out[rel] = v
        for v in self._versions():
            if not refold or v > version:
                break
            entry = self._read_commit(v)
            for rel in entry["add"]:
                if rel in refold:
                    out[rel] = v
                    refold.discard(rel)
        return out

    def _stat_names(self, version: int, col: str) -> list[str]:
        """The physical names ``col``'s values may live under in a
        snapshot's segments: the logical name plus its retired rename
        chain (segments persist write-time names; stats and bloom
        sidecars are keyed by them)."""
        chains = self._read_commit(version).get("renames") or {}
        return [col, *chains.get(col, [])]

    def column_range(self, col: str, version: int | None = None):
        """Global (min, max) of ``col`` at a version, folded from the
        per-segment stats alone — O(log) driver metadata, no Spark job.
        None if any live segment lacks stats for the column (a fold over
        partial stats would silently understate the range)."""
        version, _, _ = self._snapshot(version)
        names = self._stat_names(version, col)
        stats = self._live_segment_stats(version)
        ranges = [
            next((s[n] for n in names if n in s), None)
            for s in stats.values()
        ]
        if not ranges or any(r is None for r in ranges):
            return None
        return min(r[0] for r in ranges), max(r[1] for r in ranges)

    def _segment_hll(
        self, add: list[str], cols: list[str]
    ) -> dict[str, dict[str, str | None]]:
        """Per-added-segment HLL sketches for ``cols`` in ONE Spark job
        (grouped by the segment the file_path identifies — a
        partitioned append's N tuple-segments cost one aggregate, not
        N jobs): {rel: {col: base64 sketch | None for an all-null
        column}}.  Columns the written schema lacks (evolution eras)
        are skipped — table_ndv then conservatively reports None."""
        import base64 as _b64

        df = self.spark.read.parquet(
            *(os.path.join(self.root, r) for r in add)
        )
        present = [c for c in cols if c in df.columns]
        if not present:
            return {}
        by_name = {os.path.basename(r): r for r in add}
        seg = F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -2
        )
        rows = (
            df.select(seg.alias("_seg"), *present)
            .groupBy("_seg")
            .agg(*[F.hll_sketch_agg(c).alias(c) for c in present])
            .collect()
        )
        out: dict[str, dict[str, str | None]] = {}
        for row in rows:
            rel = by_name.get(row["_seg"])
            if rel is None:
                continue
            out[rel] = {
                c: (
                    _b64.b64encode(bytes(row[c])).decode("ascii")
                    if row[c] is not None
                    else None
                )
                for c in present
            }
        for rel in add:
            # a ZERO-ROW segment yields no aggregate row: record explicit
            # empty sketches (same as an all-null column) or table_ndv
            # would return None forever once any empty segment is live
            out.setdefault(rel, {c: None for c in present})
        return out

    def _segment_mcv(
        self, add: list[str], cols: list[str]
    ) -> dict[str, dict[str, list]]:
        """Per-added-segment most-common-value stats for ``cols`` in ONE
        Spark job over the new files only (O(delta), the ANALYZE-delta
        shape — same policy as constraint enforcement and the HLL
        sketches): {rel: {col: [value_as_string, count]}}.  This is the
        planner's skew signal (Postgres pg_stats.most_common_vals /
        Spark CBO histogram head): a join key whose hottest value
        carries a large row fraction shuffles that fraction into ONE
        reducer partition — the case where AQE's skew split is
        suppressed by downstream hash-distribution requirements and
        manual salting is the only mitigation (measured 1.24x,
        SCALE_STRESSORS skew_join).  Columns the written schema lacks
        are skipped; an all-null column records no entry (same
        conservative gap semantics as the HLL sketches)."""
        df = self.spark.read.parquet(
            *(os.path.join(self.root, r) for r in add)
        )
        present = [c for c in cols if c in df.columns]
        if not present:
            return {}
        by_name = {os.path.basename(r): r for r in add}
        seg = F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -2
        )
        stacked = (
            df.select(
                seg.alias("_seg"),
                F.explode(
                    F.array(*[
                        F.struct(
                            F.lit(c).alias("c"),
                            F.col(c).cast("string").alias("v"),
                        )
                        for c in present
                    ])
                ).alias("kv"),
            )
            .select("_seg", F.col("kv.c").alias("c"), F.col("kv.v").alias("v"))
            .where(F.col("v").isNotNull())
        )
        rows = (
            stacked.groupBy("_seg", "c", "v")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("_seg", "c")
            .agg(F.max(F.struct("n", "v")).alias("m"))
            .collect()
        )
        out: dict[str, dict[str, list]] = {}
        for row in rows:
            rel = by_name.get(row["_seg"])
            if rel is None:
                continue
            out.setdefault(rel, {})[row["c"]] = [
                row["m"]["v"], int(row["m"]["n"])
            ]
        for rel in add:
            out.setdefault(rel, {})
        return out

    def table_mcv(
        self, col: str, version: int | None = None
    ) -> tuple[str, int] | None:
        """Estimated hottest value of ``col`` and its row count at a
        version, folded from the live segments' commit-time MCV stats
        alone — O(live segments) driver metadata, no scan.  The fold
        sums each candidate value's per-segment top counts and returns
        the max: exact when one value dominates every segment (the
        pathological-skew case the planner cares about), an
        UNDERestimate otherwise (a value can be frequent without
        topping any one segment) — so a positive skew verdict is
        trustworthy and a miss errs toward not salting, the cheap
        direction.  None when any live segment lacks the stat (pre-mcv
        eras, evolution gaps): guessing 'not skewed' from partial stats
        could flip the planner the expensive way (same conservative
        policy as table_ndv)."""
        version, live, _ = self._snapshot(version)
        if not live:
            return None
        stats = self._live_segment_stats(version)
        by_value: dict[str, int] = {}
        for rel in live:
            m = (stats.get(rel) or {}).get("__mcv__")
            if not isinstance(m, dict):
                return None
            if col in m:
                v, n = m[col]
                by_value[v] = by_value.get(v, 0) + int(n)
        if not by_value:
            return None  # column all-null or absent in every segment
        v = max(by_value, key=lambda k: (by_value[k], k))
        return v, by_value[v]

    def join_skew_planned(
        self,
        dim: DataFrame,
        fact_col: str,
        dim_col: str | None = None,
        how: str = "inner",
        version: int | None = None,
        skew_frac: float = 0.1,
        num_salts: int = 16,
        dim_bytes: int | None = None,
    ) -> DataFrame:
        """Join this table (the FACT side) to ``dim`` with the log's
        column stats driving the physical strategy — the stats-CBO
        consumption path, like :meth:`read_source`'s broadcast flip and
        :meth:`distinct_filter`'s IN-pushdown:

        1. ``dim`` provably broadcastable (``dim_bytes`` — e.g. a dim
           vtable's ``table_stats()['n_bytes']`` — at or under
           ``spark.sql.autoBroadcastJoinThreshold``): plain join with
           the broadcast hint.  Broadcast beats salting whenever it is
           available (measured: SCALE_STRESSORS skew_join — 'do not
           salt a broadcastable join'), and a broadcast join has no
           reducer hot partition for skew to hurt.
        2. Else, the fact key's log MCV says one value carries at least
           ``skew_frac`` of the table's rows: salted join
           (operators/skew.py) — the case where AQE's skew split is
           suppressed by downstream hash-distribution requirements.
        3. Else: plain shuffle join (AQE handles residual imbalance).

        Unknown sizes/stats choose conservatively: no ``dim_bytes``
        means no broadcast hint (never guess a table small); no MCV
        stat means no salting (never pay replication on a guess) —
        both 'only with the log's estimate' directions, exactly like
        :meth:`distinct_filter`."""
        from energy_emissions_lakehouse_spark.operators.skew import (
            salted_join,
        )

        if isinstance(dim, VersionedTable):
            # a vtable dim carries its own ANALYZE estimate in the log —
            # pull it unless the caller already supplied one
            if dim_bytes is None:
                dim_bytes = dim.table_stats()["n_bytes"]
            dim = dim.read()
        dim_col = dim_col or fact_col
        fact = self.read(version)
        right = (
            dim.withColumnRenamed(dim_col, fact_col)
            if dim_col != fact_col
            else dim
        )
        threshold = _parse_size_conf(
            self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
        if (
            dim_bytes is not None
            and threshold is not None
            and 0 < threshold
            and dim_bytes <= threshold
        ):
            return fact.join(F.broadcast(right), fact_col, how)
        mcv = self.table_mcv(fact_col, version)
        n_rows = self.table_stats(version)["n_rows"]
        if mcv is not None and n_rows > 0 and (
            mcv[1] / n_rows >= skew_frac
        ):
            return salted_join(
                fact, right, [fact_col], how=how, num_salts=num_salts
            )
        return fact.join(right, fact_col, how)

    def table_ndv(self, col: str, version: int | None = None) -> int | None:
        """Estimated number of distinct non-null values of ``col`` at a
        version, folded from the live segments' commit-time HLL sketches
        alone — O(live segments) metadata plus one tiny union job, no
        table scan (Iceberg's NDV-from-puffin / CBO column stats).  None
        when any live segment lacks a sketch for the column (pre-ndv
        eras, evolution gaps): an estimate from partial sketches would
        silently understate NDV and flip planner decisions the wrong
        way.  Rows masked by deletion vectors still count (sketches are
        per written segment) — NDV is a planning upper estimate, not an
        exact count."""
        version, live, _ = self._snapshot(version)
        if not live:
            return 0
        import base64 as _b64

        stats = self._live_segment_stats(version)
        sketches: list[bytes] = []
        for rel in live:
            m = (stats.get(rel) or {}).get("__hll__")
            if not isinstance(m, dict) or col not in m:
                return None
            if m[col] is not None:
                sketches.append(_b64.b64decode(m[col]))
        if not sketches:
            return 0  # every live segment was all-null in col
        df = self.spark.createDataFrame(
            [(s,) for s in sketches], "s binary"
        )
        return int(
            df.agg(
                F.hll_sketch_estimate(F.hll_union_agg("s")).alias("e")
            ).first()["e"]
        )

    def distinct_filter(
        self,
        fact: DataFrame,
        fact_col: str,
        col: str,
        max_inset: int = 1024,
        version: int | None = None,
    ) -> DataFrame:
        """Filter ``fact`` to rows whose ``fact_col`` appears among the
        DISTINCT values of this table's ``col`` — the NDV-DRIVEN
        strategy choice (the CBO semi-join-vs-IN decision, fed from the
        commit log's sketches instead of a catalog ANALYZE):

        - log NDV <= ``max_inset``: collect the distinct values (bounded
          by the estimate before any collect happens) and push an IN
          filter into the fact scan — Catalyst turns it into an InSet
          data filter AND a pushed parquet filter, so fact files whose
          min/max exclude every value are never read.  At 100 TB this is
          the difference between a shuffle of the fact table and a
          footer-pruned scan.
        - otherwise (or no sketch): a LEFT SEMI join, the
          corpus-proportional plan.

        Both strategies return identical rows (NULLs match nothing
        under either, per SQL IN semantics; a dim NULL falls back to the
        semi-join, where it also matches nothing)."""
        # pin the snapshot ONCE: with version=None the NDV decision, the
        # values collect and the semi-join fallback must all read the
        # SAME head — a concurrent overwrite between them could otherwise
        # pull an unbounded distinct set driver-side after a stale small
        # estimate approved the collect
        version, _, _ = self._snapshot(version)
        ndv = self.table_ndv(col, version)
        if ndv is not None and ndv <= max_inset:
            vals = [
                r[0]
                for r in self.read(version).select(col).distinct().collect()
            ]
            # re-check the ACTUAL cardinality against the caller's bound
            # before building the literal list (the HLL estimate carries
            # ~2% error; max_inset is the hard expression-size budget)
            if len(vals) <= max_inset and not any(
                v is None for v in vals
            ):
                return fact.where(F.col(fact_col).isin(vals))
        keys = (
            self.read(version)
            .select(F.col(col).alias(fact_col))
            .distinct()
        )
        return fact.join(keys, fact_col, "left_semi")

    def pruned_segments(
        self, version: int, col: str, lo, hi
    ) -> tuple[list[str], list[str]]:
        """Split the live set into (scanned, skipped) for a range
        predicate ``lo <= col <= hi``: PARTITION VALUES first (the
        Iceberg partition-pruning step — pure tuple comparison, no stats
        needed), then the per-segment min/max stats fold for whatever
        survives.  A segment with neither a pv field nor stats for
        ``col`` is conservatively scanned — pruning may only ever skip
        provably-disjoint files."""
        names = self._stat_names(version, col)
        stats, pvs = self._live_segment_meta(version)
        scanned, skipped = [], []
        for rel in sorted(stats):
            if partition_skips(
                pvs.get(rel), col, lo, hi, is_point=(lo == hi)
            ):
                skipped.append(rel)
                continue
            mn_mx = next(
                (stats[rel][n] for n in names if n in stats[rel]), None
            )
            if mn_mx is not None and (mn_mx[1] < lo or mn_mx[0] > hi):
                skipped.append(rel)
            else:
                scanned.append(rel)
        return scanned, skipped

    def read_pruned(
        self, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Snapshot read that SKIPS segments provably outside
        ``lo <= col <= hi`` — file-level pruning from log metadata alone,
        before any Spark job runs (the scan-planning step Iceberg does
        with manifests; at 100 TB this is what turns a full-table scan
        into a few files).  The caller must still apply its own residual
        predicate: pruning skips whole files, it does not filter rows."""
        version, _, dvs, entry = self._snapshot_state(version)
        scanned, _ = self.pruned_segments(version, col, lo, hi)
        schema = StructType.fromJson(entry["schema"])
        return self._scan_segments(version, scanned, schema, dvs=dvs)

    # ------------------------------------------------------------ change feed
    def change_feed(
        self,
        v_from: int,
        v_to: int,
        keys: list[str],
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """Row-level CDF between two snapshots: FULL OUTER join on ``keys``
        → ``insert`` (new key), ``delete`` (gone key), ``update`` (key in
        both, any ``compare_cols`` differs via null-safe inequality);
        unchanged rows are dropped.  Output: keys + ``change_type`` +
        ``<col>_pre``/``<col>_post`` images.  Fully distributed — one
        shuffle on the join keys, no driver materialization.

        Works ACROSS a schema-evolution boundary (the streaming-CDF
        semantics): a column absent from one snapshot's schema is
        null-filled on that side — so a backfilled new column surfaces as
        ``update`` rows with a null pre-image, exactly what a downstream
        consumer needs to replay the evolution.  Join ``keys`` must exist
        in BOTH snapshots (a key that appeared mid-history cannot
        identify pre rows)."""
        pre = self.read(v_from).alias("pre")
        post = self.read(v_to).alias("post")
        pre_types = {f.name: f.dataType for f in pre.schema.fields}
        post_types = {f.name: f.dataType for f in post.schema.fields}
        missing_keys = [
            k for k in keys if k not in pre_types or k not in post_types
        ]
        if missing_keys:
            raise ValueError(
                f"change_feed: key {missing_keys[0]!r} is not present in "
                f"both snapshots (v{v_from} has {sorted(pre_types)}, "
                f"v{v_to} has {sorted(post_types)})"
            )
        if compare_cols is None:
            # union keeps evolution-spanning feeds total: post-only
            # columns (added by evolution) AND pre-only columns (an
            # overwrite dropped them) both feed the diff, null-filled
            # on the side whose schema lacks them
            compare_cols = [c for c in post.columns if c not in keys] + [
                c for c in pre.columns if c not in keys and c not in post_types
            ]
        unknown = [
            c for c in compare_cols
            if c not in pre_types and c not in post_types
        ]
        if unknown:
            raise ValueError(
                f"change_feed: compare column {unknown[0]!r} exists in "
                f"neither snapshot v{v_from} nor v{v_to}"
            )

        def pre_img(c: str) -> Column:
            return pre[c] if c in pre_types else F.lit(None).cast(post_types[c])

        def post_img(c: str) -> Column:
            return post[c] if c in post_types else F.lit(None).cast(pre_types[c])

        on = [pre[k].eqNullSafe(post[k]) for k in keys]
        joined = pre.join(post, on, "full_outer")
        is_insert = pre[keys[0]].isNull()
        is_delete = post[keys[0]].isNull()
        differs: Column = F.lit(False)
        for c in compare_cols:
            differs = differs | ~pre_img(c).eqNullSafe(post_img(c))
        change = (
            F.when(is_insert, F.lit("insert"))
            .when(is_delete, F.lit("delete"))
            .when(differs, F.lit("update"))
        )
        out_cols = [
            F.coalesce(post[k], pre[k]).alias(k) for k in keys
        ] + [change.alias("change_type")]
        for c in compare_cols:
            out_cols.append(pre_img(c).alias(f"{c}_pre"))
            out_cols.append(post_img(c).alias(f"{c}_post"))
        return joined.select(*out_cols).where(F.col("change_type").isNotNull())

    def read_changes(self, v_from: int, v_to: int) -> DataFrame:
        """Batch change-feed read (Delta's ``table_changes(v1, v2)``):
        every row-level change committed in versions ``v_from..v_to``
        inclusive, as schema columns plus ``_change_type`` and
        ``_commit_version``.  Merge/delete/update/replace commits serve
        their commit-time ``cdf/`` segments (exact row-level history,
        written by the same jobs that made the change); pure appends
        synthesize ``insert`` rows from their data segments (Delta does
        exactly this — appends write no change files); compact /
        dv_compact / metadata-only commits are dataChange=false and
        contribute nothing.  A change commit WITHOUT a feed (table
        created with ``enable_cdf=False``, or a pre-CDF ``overwrite``)
        raises — a silent gap would let a downstream consumer replay an
        incomplete delta, the one unforgivable CDF failure.  Columns are
        aligned across a schema-evolution boundary the same way the
        evolution itself behaves: absent columns surface as nulls.  One
        distributed union-of-scans — nothing row-level crosses the
        driver."""
        versions = [v for v in self._versions() if v_from <= v <= v_to]
        if not versions:
            raise ValueError(
                f"read_changes: no commits in [{v_from}, {v_to}]"
            )
        batches: list[DataFrame] = []
        for v in versions:
            entry = self._read_commit(v)
            op = entry["op"]
            if op in ("compact", "dv_compact", "set_constraint"):
                continue  # dataChange=false / metadata-only
            schema = StructType.fromJson(entry["schema"])
            clash = [
                f.name for f in schema.fields if f.name in _FEED_COLS
            ]
            if clash:
                # same contract as the streaming readChangeFeed: a table
                # may STORE such a column, but the feed APPENDS it
                raise ValueError(
                    f"read_changes: version {v}'s schema stores "
                    f"{clash[0]!r}, reserved for the change-feed stamp "
                    "— rename the column to read the feed"
                )
            if entry.get("cdf"):
                self._check_present(v, [entry["cdf"]])
                batch = self.spark.read.parquet(
                    os.path.join(self.root, entry["cdf"])
                )
            elif (
                entry["remove"]
                or entry.get("dv_add")
                or op == "restore"
            ):
                raise ValueError(
                    f"read_changes: version {v} ({op}) changed existing "
                    "rows but carries no change feed — enable_cdf is a "
                    "create-time property (and overwrite never emits a "
                    "feed); a synthesized diff would be a silent gap"
                )
            elif entry["add"]:
                self._check_present(v, entry["add"])
                batch = (
                    self.spark.read.schema(schema)
                    .parquet(
                        *(os.path.join(self.root, r) for r in entry["add"])
                    )
                    .withColumn("_change_type", F.lit("insert"))
                )
            else:
                continue  # create-empty or other no-row commit
            batches.append(
                batch.withColumn(
                    "_commit_version", F.lit(v).cast("bigint")
                )
            )
        if not batches:
            # a window of only dataChange=false commits: empty feed under
            # the head schema, not an error (Delta returns empty too)
            head_schema = StructType.fromJson(
                self._read_commit(versions[-1])["schema"]
            )
            return (
                self.spark.createDataFrame([], head_schema)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_version", F.lit(0).cast("bigint"))
                .limit(0)
            )
        out = batches[0]
        for b in batches[1:]:
            # evolution-spanning window: null-fill columns absent on
            # either side, like the evolved segments themselves read
            out = out.unionByName(b, allowMissingColumns=True)
        return out

    # ----------------------------------------------------------------- clone
    def clone_to(self, dest_root: str) -> "VersionedTable":
        """Zero-copy CLONE (Delta SHALLOW CLONE semantics, hardlink
        mechanics): the commit log is snapshotted at the current head
        and every data/CDF/DV/index file is HARD-LINKED into
        ``dest_root`` — no data bytes move, O(files) metadata work, so
        cloning a 100 TB table costs what cloning its file listing
        costs.  The clone is a fully independent table from that
        instant: commits diverge freely, and — unlike Delta's
        path-referencing shallow clone, which a source VACUUM can break
        — neither side's :meth:`vacuum` can ever break the other: each
        root unlinks only its own names, and a shared inode lives until
        the LAST name drops.  Sharing inodes is safe by protocol:
        segments are immutable, never rewritten in place.

        The log snapshot is taken FIRST and the data files are linked
        after: a concurrent writer's mid-clone commit is simply not part
        of the clone (its pre-written segments may get linked as
        harmless orphans for the clone's vacuum to sweep), and scratch
        ``.tmp-`` files are skipped.  A file vacuumed away mid-clone is
        skipped too — reads of an affected old version then fail loudly
        via the missing-segment check, exactly like time travel past a
        vacuum on the source.  Falls back to a byte copy per file when
        ``dest_root`` is on another filesystem (hardlinks cannot span
        devices)."""
        head = self.latest_version()
        log_names = []
        for name in sorted(os.listdir(self._log_dir)):
            stem = name.split(".", 1)[0]
            if ".tmp-" in name or not stem.isdigit() or int(stem) > head:
                continue  # scratch files / post-snapshot commits
            log_names.append(name)
        if os.path.isdir(os.path.join(dest_root, LOG_DIR)):
            raise FileExistsError(
                f"versioned table already exists: {dest_root}"
            )

        def _link(src: str, dst: str) -> None:
            # FileNotFoundError (vacuumed mid-clone) propagates — the
            # caller decides per directory kind (see the walk below)
            try:
                os.link(src, dst)
            except FileExistsError:
                pass  # retried partial clone: this file already linked
            except FileNotFoundError:
                raise
            except OSError:
                shutil.copy2(src, dst)  # cross-device: degrade to a copy

        for sub in (DATA_DIR, CDF_DIR, DV_DIR, INDEX_DIR):
            src_root = os.path.join(self.root, sub)
            if not os.path.isdir(src_root):
                continue
            for dirpath, _dirs, files in os.walk(src_root):
                rel = os.path.relpath(dirpath, self.root)
                tdir = os.path.join(dest_root, rel)
                os.makedirs(tdir, mode=0o700, exist_ok=True)
                for fn in files:
                    if ".tmp-" in fn:
                        continue
                    try:
                        _link(
                            os.path.join(dirpath, fn),
                            os.path.join(tdir, fn),
                        )
                    except FileNotFoundError:
                        if dirpath == src_root:
                            # flat sidecar (bloom index) vanished: skip —
                            # probes treat an absent sidecar as "scan it"
                            continue
                        # a segment/DV/CDF parquet DIR is being vacuumed
                        # mid-clone: MIRROR the removal.  Leaving the
                        # partially-linked dir would pass the clone's
                        # missing-segment check and silently serve an
                        # EMPTY segment; removing it makes reads of the
                        # affected version fail loudly, exactly like
                        # time travel past a vacuum on the source.
                        shutil.rmtree(tdir, ignore_errors=True)
                        break
        # the log lands LAST: every segment a cloned commit references was
        # on disk before that commit existed, hence before the walk above
        tlog = os.path.join(dest_root, LOG_DIR)
        os.makedirs(tlog, mode=0o700)
        for name in log_names:
            _link(
                os.path.join(self._log_dir, name), os.path.join(tlog, name)
            )
        return VersionedTable(self.spark, dest_root)

    # -------------------------------------------------------------- describe
    def table_stats(self, version: int | None = None) -> dict:
        """Planner-facing size estimates from the COMMIT LOG + file
        metadata alone — the ANALYZE-results store of this lakehouse
        (Delta keeps numRecords in add-file stats; Iceberg in manifest
        entries).  O(live files) driver metadata: row counts come from
        parquet footers, bytes from os.stat — no Spark job, no data
        read.  Rows are pre-deletion-vector (an upper bound while DVs
        are active — estimates, not answers; fine for planning).
        Consumed by :meth:`read_source`'s broadcast decision."""
        import glob as _glob

        import pyarrow.parquet as pq

        _, live, dvs, _ = self._snapshot_state(version)
        n_rows = 0
        n_bytes = 0
        n_files = 0
        for rel in live:
            for p in _glob.glob(
                os.path.join(self.root, rel, "part-*.parquet")
            ):
                n_files += 1
                try:
                    n_rows += pq.ParquetFile(p).metadata.num_rows
                    n_bytes += os.path.getsize(p)
                except OSError:
                    pass
        return {
            "n_rows": n_rows,
            "n_bytes": n_bytes,
            "n_files": n_files,
            "has_dvs": bool(dvs),
        }

    def read_source(
        self, version: int | None = None, use_log_stats: bool = True
    ) -> DataFrame:
        """Read through the registered ``eel_vtable`` Python DataSource
        (Catalyst filter pushdown -> stats/bloom/partition file pruning)
        WITH the commit log's size estimate fed to the planner.

        Why this exists: a Python DataSource exposes no statistics hook,
        so Spark costs it at ``spark.sql.defaultSizeInBytes`` (max
        long) and a genuinely KB-sized dimension table never
        auto-broadcasts — every star join against it degrades to a
        shuffle.  This is the consumption side of the log's ANALYZE
        stats (:meth:`table_stats`): when the live-set byte estimate is
        under ``spark.sql.autoBroadcastJoinThreshold``, the broadcast
        hint is attached, flipping the join back to the plan a native
        source with CBO stats would have produced.  At 100 TB the fact
        side never qualifies and reads unhinted — exactly right."""
        from energy_emissions_lakehouse_spark.sources.vtable_stream import (
            register_vtable_source,
        )

        register_vtable_source(self.spark)
        reader = self.spark.read.format("eel_vtable").option(
            "path", self.root
        )
        if version is not None:
            reader = reader.option("versionAsOf", str(version))
        df = reader.load()
        if not use_log_stats:
            return df
        threshold = _parse_size_conf(
            self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
        # unparsable or disabled (-1/0) -> NO hint: wrongly broadcasting
        # a big table hurts more than a missed broadcast
        if threshold is not None and 0 < threshold and (
            self.table_stats(version)["n_bytes"] <= threshold
        ):
            return F.broadcast(df)
        return df

    def detail(self) -> dict:
        """DESCRIBE DETAIL: head-snapshot facts as one dict — version,
        operation, schema, live segment/DV/file counts, total live bytes,
        table properties and active constraints.  O(files) driver
        metadata (os.stat over the live part files), no Spark job."""
        import glob as _glob

        v, live, dvs, entry = self._snapshot_state(None)
        n_files = 0
        n_bytes = 0
        for rel in live:
            # one directory listing per segment serves both stats
            for p in _glob.glob(
                os.path.join(self.root, rel, "part-*.parquet")
            ):
                n_files += 1
                try:
                    n_bytes += os.path.getsize(p)
                except OSError:
                    pass
        props = self._read_commit(0).get("properties", {})
        return {
            "location": self.root,
            "version": v,
            "operation": entry["op"],
            "numLiveSegments": len(live),
            "numLiveFiles": n_files,
            "sizeInBytes": n_bytes,
            "numDeletionVectors": len(dvs),
            "schema": entry["schema"],
            "properties": props,
            "constraints": self.constraints(v),
        }

    # ---------------------------------------------------------------- vacuum
    def vacuum(
        self,
        retain_last: int = 2,
        orphan_grace_s: float = 3600.0,
        dry_run: bool = False,
    ) -> list[str]:
        """Delete data segments referenced by NO retained version (the last
        ``retain_last`` commits are retained).  Also sweeps orphan segments
        no commit EVER referenced (crashed writers) — but only once they
        are older than ``orphan_grace_s`` (Delta's ``retentionHours``
        analog, mtime-based): a fresh orphan may be an IN-FLIGHT writer
        between :meth:`_write_segment` and :meth:`_commit` (the
        optimistic-concurrency pattern :meth:`idempotent_append` relies
        on); deleting it would let that writer commit a reference to a
        vanished directory and break every later read of the head.
        Segments referenced by an expired commit carry no such risk (the
        writer already committed) and are reclaimed immediately.  Returns
        the deleted log-relative paths.  Time travel to vacuumed versions
        then fails loudly in :meth:`read` (missing-segment check).
        ``dry_run=True`` (Delta's VACUUM DRY RUN) returns the same list
        WITHOUT deleting anything — the audit-before-reclaim step."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        versions = self._versions()
        retained = versions[-retain_last:]
        keep: set[str] = set()
        for v in retained:
            keep |= self._resolve_live(v)
            # DVs active at a retained version stay readable with it
            keep |= self._resolve_dvs(v)
            # change-data segments live with their commit: the feed of a
            # retained version must stay streamable
            cdf = self._read_commit(v).get("cdf")
            if cdf:
                keep.add(cdf)
        # everything ANY commit ever referenced — the complement (true
        # orphans) gets the in-flight grace window
        ever: set[str] = set()
        for v in versions:
            entry = self._read_commit(v)
            ever |= set(entry["add"])
            ever |= set(entry.get("dv_add", []))
            if entry.get("cdf"):
                ever.add(entry["cdf"])
        now = time.time()
        candidates: list[tuple[str, str]] = []
        for sub in (DATA_DIR, CDF_DIR, DV_DIR):
            sub_root = os.path.join(self.root, sub)
            if not os.path.isdir(sub_root):
                continue
            for name in sorted(os.listdir(sub_root)):
                rel = os.path.join(sub, name)
                if rel in keep:
                    continue
                path = os.path.join(sub_root, name)
                if rel not in ever:
                    try:
                        age = now - os.path.getmtime(path)
                    except OSError:
                        continue  # vanished under us — a racing cleaner
                    if age < orphan_grace_s:
                        continue  # potentially in-flight: keep for now
                candidates.append((sub, rel))
        # TOCTOU re-validation: a commit can land BETWEEN the keep/ever
        # fold above and the deletes below, and a mid-sweep commit's
        # files would be in neither set — deleting them would break the
        # NEW head permanently.  Re-read only the commits that appeared
        # since the fold and drop any candidate they reference.  This
        # shrinks the unprotected window from O(sweep duration) to the
        # microseconds between this refresh and each rmtree; with any
        # sane grace the combination is airtight (a segment younger
        # than the grace was never a candidate, so the residual race
        # needs a write-to-commit latency LONGER than the grace).
        if candidates:
            fresh: set[str] = set()
            for v in self._versions():
                if v <= versions[-1]:
                    continue
                entry = self._read_commit(v)
                fresh |= set(entry["add"])
                fresh |= set(entry.get("dv_add", []))
                if entry.get("cdf"):
                    fresh.add(entry["cdf"])
            candidates = [
                (sub, rel) for sub, rel in candidates if rel not in fresh
            ]
        deleted = []
        for sub, rel in candidates:
            if not dry_run:
                shutil.rmtree(
                    os.path.join(self.root, rel), ignore_errors=True
                )
                if sub == DATA_DIR:
                    # a segment's bloom sidecar dies with it
                    try:
                        os.unlink(self._bloom_sidecar_path(rel))
                    except OSError:
                        pass
            deleted.append(rel)
        # hard-crashed commit attempts strand their scratch files in the
        # log dir (the normal path unlinks them in a finally); they are
        # never read — _versions ignores non-.json names — and are
        # reclaimed past the same in-flight grace window
        for name in sorted(os.listdir(self._log_dir)):
            if ".tmp-" not in name:
                continue
            path = os.path.join(self._log_dir, name)
            try:
                if now - os.path.getmtime(path) < orphan_grace_s:
                    continue
            except OSError:
                continue  # vanished under us
            if not dry_run:
                try:
                    os.unlink(path)
                except OSError:
                    pass
            deleted.append(os.path.join(LOG_DIR, name))
        # checkpoint sidecars are published BEFORE the main rename; a
        # publish that crashes in between strands sidecar litter no
        # checkpoint references (normal operation orphans nothing —
        # every published checkpoint keeps referencing its sidecars and
        # checkpoints are never vacuumed, and the incremental fold only
        # reuses names the previous checkpoint already references, so
        # unreferenced means unreferenced FOREVER).  Collect the
        # referenced set from every checkpoint main file and reclaim
        # the rest past the same in-flight grace (a just-written
        # sidecar may belong to a publish whose main rename is
        # microseconds away).
        referenced: set[str] = set()
        ckpt_names = [
            n
            for n in os.listdir(self._log_dir)
            if n.endswith(".checkpoint.json")
        ]
        ckpt_ok = True
        for n in ckpt_names:
            try:
                with open(os.path.join(self._log_dir, n)) as fh:
                    payload = json.load(fh)
            except (OSError, ValueError):
                # an unreadable checkpoint might reference anything —
                # reclaiming nothing is the only safe answer this sweep
                ckpt_ok = False
                break
            for ref in payload.get("sidecars") or []:
                referenced.add(ref["name"])
        if ckpt_ok:
            for name in sorted(os.listdir(self._log_dir)):
                if not name.endswith(".sidecar.json"):
                    continue
                if name in referenced:
                    continue
                path = os.path.join(self._log_dir, name)
                try:
                    if now - os.path.getmtime(path) < orphan_grace_s:
                        continue
                except OSError:
                    continue  # vanished under us
                if not dry_run:
                    try:
                        os.unlink(path)
                    except OSError:
                        pass
                deleted.append(os.path.join(LOG_DIR, name))
        # a hard-crashed PARTITIONED write strands its .pt-scratch-* dir
        # at the table root (the normal path removes it in a finally);
        # nothing ever references it — reclaimed past the same grace
        # window.  In-flight detection uses the NEWEST mtime in the
        # scratch TREE, not the top dir's: Spark writes under
        # _temporary/ subdirs, so the root mtime stays pinned at job
        # start and a long-running write would look stale by its end.
        for name in sorted(os.listdir(self.root)):
            if not name.startswith(".pt-scratch-"):
                continue
            path = os.path.join(self.root, name)
            try:
                newest = os.path.getmtime(path)
                for dpath, _dirs, files in os.walk(path):
                    newest = max(newest, os.path.getmtime(dpath))
                    for fn in files:
                        newest = max(
                            newest,
                            os.path.getmtime(os.path.join(dpath, fn)),
                        )
                if now - newest < orphan_grace_s:
                    continue  # potentially in-flight
            except OSError:
                continue  # vanished under us
            if not dry_run:
                shutil.rmtree(path, ignore_errors=True)
            deleted.append(name)
        return deleted
