"""Shared preflight for the disk-bound at-scale receipt tools.

Round-10 lesson (SCALE.md): the `llm_ngram_jaccard` sf10 receipt run
died TWICE on host resources -- once OOM-killed (DuckDB's default
80%-RAM limit next to a live Spark JVM; fixed by `SET
memory_limit='48GB'` in every staged tool) and once DISK-FULL
mid-flight, 20 minutes in, because 66 GB of orphaned DuckDB spill
from the previous kill was still sitting in `.tmp/` and the new
out-of-core aggregate needed ~45-60 GB of its own.  A
`shutil.disk_usage` check against the tool's documented peak turns
that wasted 20-minute run into an instant, actionable error.

`disk_preflight` also sweeps STALE executor/driver spill debris that
killed runs orphan (`/tmp/blockmgr-*`, `/tmp/spark-*` older than one
hour) -- a live run's directories are younger than that and are left
alone; live DuckDB spill (`.tmp/duckdb_temp_storage-*`) is never
touched because a concurrent staged tool may own it.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

GB = 1 << 30

#: spill roots that killed Spark runs orphan; safe to sweep when stale
_STALE_SPILL_GLOBS = ("/tmp/blockmgr-*", "/tmp/spark-*")
_STALE_AGE_S = 3600.0


def _live_jvm() -> bool:
    """True when any JVM is running on this host.

    The stale-age heuristic alone is unsafe next to a LIVE Spark
    session: a long receipt-grind JVM (round 10 ran 2.5h ones)
    creates its ``/tmp/spark-*`` / ``blockmgr-*`` roots at startup
    and may never touch the ROOT's mtime again -- after an hour they
    look "stale" while very much in use.  Spill dirs don't encode
    the owning PID, so the safe single-host rule is: any live JVM
    means no sweeping at all.
    """
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                if fh.read().strip() == "java":
                    return True
        except OSError:
            continue
    return False


def sweep_stale_spill(min_age_s: float = _STALE_AGE_S) -> int:
    """Delete orphaned Spark spill dirs older than ``min_age_s``.

    Returns the number of directories removed.  Refuses to sweep
    anything while a JVM is live (see :func:`_live_jvm`); with no
    JVM running, every matching dir is by definition orphaned, and
    the age cutoff only spares freshly-created dirs of a session
    that is starting up concurrently.
    """
    if _live_jvm():
        return 0
    now = time.time()
    removed = 0
    for pat in _STALE_SPILL_GLOBS:
        for path in glob.glob(pat):
            try:
                if now - os.path.getmtime(path) > min_age_s:
                    shutil.rmtree(path, ignore_errors=True)
                    removed += 1
            except OSError:
                continue
    return removed


def disk_preflight(peak_gb: float, path: str = "/root/repo",
                   sweep: bool = True) -> float:
    """Refuse to start a disk-bound at-scale run without headroom.

    ``peak_gb`` is the tool's DOCUMENTED peak scratch/spill footprint
    (e.g. ~60 GB for the ngram/winnow sf10 out-of-core aggregates,
    measured in SCALE.md round 10).  After optionally sweeping stale
    Spark spill orphans, raises ``SystemExit`` with an actionable
    message when the filesystem holding ``path`` has less than
    ``peak_gb`` free -- BEFORE any multi-minute engine or DuckDB
    phase begins.  Returns the free space in GB on success.
    """
    if sweep:
        n = sweep_stale_spill()
        if n:
            print(f"preflight: swept {n} stale spill dir(s)",
                  flush=True)
    free_gb = shutil.disk_usage(path).free / GB
    if free_gb < peak_gb:
        raise SystemExit(
            f"preflight: only {free_gb:.1f} GB free on "
            f"{path!r} but this run's documented peak is "
            f"~{peak_gb:.0f} GB -- free disk first (look for "
            f"orphaned .tmp/duckdb_temp_storage-*, scratch/"
            f"pair_slices_*, /tmp/blockmgr-*; round-10 post-mortem "
            f"in SCALE.md)")
    print(f"preflight: {free_gb:.1f} GB free >= {peak_gb:.0f} GB "
          f"documented peak", flush=True)
    return free_gb
