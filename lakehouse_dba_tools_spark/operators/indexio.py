"""Shared filesystem primitives for the persisted-index family.

The three stored indexes (dedup/index.py LSH, similarity/index.py IVF,
similarity/bm25.py postings) all face the same two hazards on plain
parquet (no transaction-log jars — the repo-wide documented boundary):

1. **Writer races.** An append landing while a compaction is swapping
   directories would be silently deleted with the pre-compact tree.
   Fix: every mutating operation (build / append / compact) holds an
   exclusive ``flock`` on ``<index>/_INDEX_LOCK`` — the same
   single-writer serialization ``datagen/export.py`` uses for the gate
   warehouse. Readers take no lock (see below: they can always see a
   complete tree).

2. **Crash mid-swap.** A naive ``rename(live, old); rename(staging,
   live)`` has a window where the live path does not exist at all — a
   crash there strands the index unreadable. Fix: the live path of
   each index table is a **symlink** to a versioned directory
   (``bands -> bands.v0``). Compaction writes the next full version
   (``bands.v1``) beside it and publishes with ONE atomic
   ``os.replace`` of the symlink. Readers therefore always resolve to
   a complete version — before, during, and after a compact — and a
   crash at any instant leaves at worst an orphan version directory,
   which the next locked writer removes (``heal``). This is the
   poor-man's analog of a table-format version pointer (Delta's
   ``_last_checkpoint`` / Iceberg's ``version-hint.text``), scoped to
   single-host semantics exactly like the rest of the no-jars
   boundary.

3. **Readers racing a compact.** The newest superseded version is
   RETAINED after a publish (the tombstone-retention analog): a
   reader whose cached file listing predates one compact finishes its
   scan against the complete snapshot it planned on — and because
   every index query is duplicate-tolerant, that pre-compact answer
   equals the post-compact one. Only a reader ≥2 compactions stale
   (or racing ``vacuum_versions``) fails loudly and retries; nothing
   ever silently reads a partial tree.

Appends write *through* the symlink into the current version
directory: parquet appends are additive (new files only), so readers
racing an append see a prefix of it — the standard parquet-append
visibility semantics, unchanged by the versioning.
"""

from __future__ import annotations

import fcntl
import os
import re
import shutil
from contextlib import contextmanager

LOCK_NAME = "_INDEX_LOCK"
_VER_RE = re.compile(r"\.v(\d+)$")


@contextmanager
def writer_lock(path: str):
    """Exclusive single-writer lock for one index root. Blocks until
    any in-flight build/append/compact on the same root finishes."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, LOCK_NAME), "w") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)


def current_version_dir(live: str) -> str:
    """Resolve the live symlink to its version directory (absolute)."""
    return os.path.realpath(live)


def next_version_dir(live: str) -> str:
    """Path for the next version directory beside ``live``."""
    if os.path.islink(live):
        cur = os.path.basename(os.readlink(live))
        m = _VER_RE.search(cur)
        n = int(m.group(1)) + 1 if m else 0
    else:
        n = 0
    return f"{live}.v{n}"


def publish(live: str, version_dir: str, retain: int = 1) -> None:
    """Atomically point ``live`` at ``version_dir`` (a sibling). The
    pointer flip is one ``os.replace`` of a symlink — readers see the
    old complete tree or the new complete tree, never an absent path.

    Retention (the poor-man's Delta tombstone window): the newest
    ``retain`` superseded versions are KEPT so a reader whose file
    listing predates this publish finishes its scan against the
    complete snapshot it planned on; older superseded versions and
    never-published crash debris are reclaimed. ``vacuum_versions``
    reclaims the retained snapshots eagerly."""
    tmp = live + "._ptr"
    if os.path.islink(tmp) or os.path.exists(tmp):
        os.remove(tmp)
    os.symlink(os.path.basename(version_dir), tmp)
    os.replace(tmp, live)
    _reclaim(live, retain)


def init_versioned(live: str) -> str:
    """Fresh-build helper: return the version dir a build should write
    (``<live>.v0``, or N+1 when rebuilding over an existing index),
    clearing any stale same-named directory. Caller writes it fully,
    then calls ``publish``."""
    target = next_version_dir(live)
    shutil.rmtree(target, ignore_errors=True)
    return target


def parquet_file_count(root: str) -> int:
    """Observability helper for compaction stats (follows the live
    symlink into the current version directory)."""
    return sum(
        1
        for _, _, files in os.walk(root, followlinks=True)
        for f in files
        if f.endswith(".parquet")
    )


def heal(live: str, retain: int = 1) -> None:
    """Remove crash debris around one live table: never-published
    version directories (numbered above the pointer — a crash between
    write and publish strands one) and a stale pointer temp, keeping
    the newest ``retain`` superseded published snapshots for in-flight
    readers. Call under ``writer_lock`` before mutating. A reader
    never needs this — the pointer always resolves to a complete
    version."""
    tmp = live + "._ptr"
    if os.path.islink(tmp) or os.path.exists(tmp):
        os.remove(tmp)
    _reclaim(live, retain)


def vacuum_versions(live: str) -> None:
    """The VACUUM analog: eagerly reclaim ALL superseded snapshots
    (readers more than zero compactions stale then fail loudly on
    their next file access instead of finishing). Call under
    ``writer_lock``."""
    _reclaim(live, 0)


def _reclaim(live: str, retain: int) -> None:
    """Delete sibling version directories that are neither the current
    pointer target, nor one of the ``retain`` newest superseded
    published snapshots. Versions numbered ABOVE the current pointer
    were never published (publishing is monotonic) — always debris."""
    cur = os.path.realpath(live) if os.path.islink(live) else None
    cur_n = None
    if cur:
        m = _VER_RE.search(os.path.basename(cur))
        cur_n = int(m.group(1)) if m else None
    parent, base = os.path.dirname(live) or ".", os.path.basename(live)
    versions = []
    for name in os.listdir(parent):
        full = os.path.join(parent, name)
        m = _VER_RE.search(name)
        if (
            name.startswith(base + ".v")
            and m
            and os.path.isdir(full)
            and os.path.realpath(full) != cur
        ):
            versions.append((int(m.group(1)), full))
    debris = [p for n, p in versions if cur_n is None or n > cur_n]
    superseded = sorted(
        ((n, p) for n, p in versions if cur_n is not None and n < cur_n),
        reverse=True,
    )
    for path in debris + [p for _, p in superseded[retain:]]:
        shutil.rmtree(path, ignore_errors=True)


def describe_index(spark, path: str, tables: tuple[str, ...]) -> list[dict]:
    """DESCRIBE DETAIL analog for one persisted index: per table, the
    published version number, live file count, and row count — the
    observability surface the OPTIMIZE/rebuild cadence decisions read.
    Reads only (no lock): the pointer always resolves to a complete
    published version."""
    out = []
    for t in tables:
        live = os.path.join(path, t)
        cur = current_version_dir(live)
        m = _VER_RE.search(os.path.basename(cur))
        out.append(
            {
                "table": t,
                "version": int(m.group(1)) if m else -1,
                "n_files": parquet_file_count(live),
                "n_rows": spark.read.parquet(cur).count(),
            }
        )
    return out
