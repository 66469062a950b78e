"""Per-process scratch space for queries that materialize intermediate files.

Sink/maintenance/layout queries (JSON·ORC·CSV round-trips, compaction, DPP
repartitions, GDPR rewrites, bucketed tables) need somewhere to write. A bare
``tempfile.mkdtemp`` per invocation leaks a full table copy every call —
sweep + bench + tests in one session rewrote the events/orders tables dozens
of times (round-2 advice). Two disciplines instead:

- :func:`scratch_dir` — ONE cached directory per (purpose, key) per process.
  Callers write with ``.mode("overwrite")``, so repeated invocations rewrite
  in place. Keyed by ``sf_dir`` so different scale factors never share a
  path.
- :func:`fresh_dir` — a new directory every call for state that must NOT be
  reused (streaming checkpoints replay old state if recycled), but tracked
  and removed at interpreter exit like the cached ones.

``PROCESS_TAG`` suffixes shared session-catalog table names (bucketed-join
tables): repeated calls in one process reuse the same catalog entries, while
concurrent processes get disjoint names instead of dropping each other's
tables mid-query.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_DIRS: dict[tuple[str, str], str] = {}
_FRESH: list[str] = []

#: One tag per process — see module docstring.
PROCESS_TAG = uuid.uuid4().hex[:8]


def scratch_dir(purpose: str, key: str = "") -> str:
    """The process-wide scratch directory for ``purpose`` (+ optional key)."""
    k = (purpose, key)
    d = _DIRS.get(k)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix=f"{purpose}_")
        _DIRS[k] = d
    return d


def _fresh_base() -> str | None:
    """Base for never-reused state (streaming checkpoints): RAM-backed when
    possible. Checkpoint WAL commits fsync; on an ext4 /tmp those fsyncs are
    disk-latency-bound and VARIABLE (the r05 q_stream_tumbling bench swung
    55% with zero code change — fixed drain overhead, not data). tmpfs
    removes that axis. Checkpoint state here is tiny (offsets/commit logs +
    bounded aggregation state), so RAM residency is safe; on a real cluster
    the checkpoint location is an explicit durable URI, not this helper.
    ``SPARK_GRAFT_SCRATCH_BASE`` overrides; unset + no /dev/shm → tempfile
    default."""
    base = os.environ.get("SPARK_GRAFT_SCRATCH_BASE")
    if base:
        # Validate rather than trust: a typo'd override must degrade to
        # the tempfile default, not make every streaming job raise
        # FileNotFoundError from mkdtemp (r06 review finding).
        return base if os.path.isdir(base) and os.access(base, os.W_OK) else None
    shm = "/dev/shm"
    if not (os.path.isdir(shm) and os.access(shm, os.W_OK)):
        return None
    # Docker defaults /dev/shm to 64 MB; a checkpoint that outgrows that
    # would ENOSPC where plain /tmp worked. Only prefer tmpfs when it has
    # real headroom.
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize < 256 * 1024 * 1024:
            return None
    except OSError:
        return None
    return shm


def fresh_dir(purpose: str) -> str:
    """A never-reused directory (checkpoints), still cleaned at exit."""
    try:
        d = tempfile.mkdtemp(prefix=f"{purpose}_", dir=_fresh_base())
    except OSError:
        d = tempfile.mkdtemp(prefix=f"{purpose}_")
    _FRESH.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    for d in list(_DIRS.values()) + _FRESH:
        shutil.rmtree(d, ignore_errors=True)
