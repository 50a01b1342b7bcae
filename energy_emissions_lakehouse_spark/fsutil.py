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
