"""Local staging-path hygiene for the /tmp-backed caches.

Every derived artifact the engine stages locally (canonicalized stream
sources, bucketed tables, PQ index, merge targets, format roundtrips)
lives under ONE per-user root created with mode 0700.  Rationale
(round-3 advice): ``tempfile.gettempdir()`` is world-writable, so a
fixed shared path like ``/tmp/eel_pq`` lets any local user pre-create
the keyed directory and poison the parquet the queries then read.  A
uid-suffixed 0700 root closes that: other users can neither pre-create
nor read into it.

On a real cluster these staging paths would be per-job scratch on
HDFS/S3 under the job's own prefix; the uid-scoped root is the
single-node analogue.
"""

from __future__ import annotations

import os
import tempfile


def user_staging_root() -> str:
    """The per-user 0700 staging root, created on first use.

    If the path already exists but is not owned by us or is group/other
    accessible (a squatter or a pre-hardening leftover), tighten or fail
    loudly rather than silently trusting it.
    """
    root = os.path.join(
        tempfile.gettempdir(), f"eel-staging-{os.getuid()}"
    )
    try:
        os.mkdir(root, mode=0o700)
    except FileExistsError:
        st = os.stat(root)
        if st.st_uid != os.getuid():
            raise RuntimeError(
                f"staging root {root} is owned by uid {st.st_uid}, "
                f"not {os.getuid()} — refusing to use it"
            )
        if st.st_mode & 0o077:
            os.chmod(root, 0o700)
    return root


def staging_dir(name: str) -> str:
    """``<user root>/<name>`` — one namespace per staging family
    (``pq``, ``stream_src``, ``bucketed``, ...).  Created lazily."""
    path = os.path.join(user_staging_root(), name)
    os.makedirs(path, mode=0o700, exist_ok=True)
    return path


def staged_tables(spark, family: str, key: str, builders, fresh: bool = False):
    """Build-once-serve-many parquet staging (the PQ-index pattern, shared).

    ``builders`` maps subdir name -> zero-arg fn returning the DataFrame to
    persist.  The keyed directory under ``staging_dir(family)`` is trusted
    only when its ``_SUCCESS`` marker exists; otherwise (or when ``fresh``
    forces a cold rebuild for benchmarking) every builder runs into a tmp
    dir that is atomically ``os.rename``d into place.  Returns
    ``{name: spark.read.parquet(...)}`` for each builder.

    Concurrency (round-5 advice, scoped honestly): only the final rename
    is atomic. On the NON-fresh path a stale/partial base is DISPLACED
    via rename (then deleted under its trash name) with the ``_SUCCESS``
    marker re-checked immediately before displacing, so a builder that
    observed a missing marker cannot delete a build a concurrent winner
    completed in between; and the post-rename marker check below means a
    lost race (or a failed displace) can never silently serve a stale
    UNMARKED base. What this does NOT protect: ``fresh=True`` bypasses
    the marker guard BY DESIGN (forced cold rebuild — the bench's
    single-process use), and displacing a directory breaks any reader
    that already resolved file paths under the old base (the rename
    itself moves them) — concurrent readers during a rebuild are outside
    the contract; the drivers here run single-process.

    On a real cluster this is the one-time index/materialization job
    writing to the job's own scratch prefix; queries then serve from the
    staged artifact instead of re-deriving it.
    """
    import shutil
    import uuid

    base = os.path.join(staging_dir(family), key)
    marker = os.path.join(base, "_SUCCESS")

    def _stale() -> bool:
        return fresh or not os.path.isfile(marker)

    if _stale() and os.path.isdir(base) and _stale():
        # marker re-checked right before displacing; losing the rename race
        # just means a winner already moved/replaced base — re-check below
        trash = f"{base}.trash-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(base, trash)
        except OSError:
            pass
        else:
            shutil.rmtree(trash, ignore_errors=True)
    if _stale():
        tmp = f"{base}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            for name, build in builders.items():
                build().write.mode("overwrite").parquet(os.path.join(tmp, name))
            with open(os.path.join(tmp, "_SUCCESS"), "w"):
                pass  # marker travels with the atomic rename
        except BaseException:
            # a failed builder must not litter half-written tmp dirs; the
            # base stays unmarked so the next caller rebuilds
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race: reuse winner
    if not os.path.isfile(marker):
        # a lost rename race must land on a WINNER's marked build; reaching
        # here means the displace failed (e.g. non-ENOENT rename error left
        # a stale unmarked base) and the tmp rename then bounced off it —
        # never serve that silently
        raise RuntimeError(
            f"staged_tables: {base} has no _SUCCESS marker after build"
        )
    return {
        name: spark.read.parquet(os.path.join(base, name)) for name in builders
    }


def table_cache_key(sf_dir: str, table: str, *parts: object) -> str:
    """Staging key derived from the source file's (path, mtime, size) plus
    any extra geometry parts — a regenerated source invalidates the cache."""
    import hashlib

    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    raw = ":".join([sf_dir, str(st.st_mtime_ns), str(st.st_size), *map(str, parts)])
    return hashlib.md5(raw.encode()).hexdigest()[:12]
