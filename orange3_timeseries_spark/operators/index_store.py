"""Versioned index storage: the write/pointer-swap lifecycle shared by
every persisted index family (BM25 ``operators/retrieval.py``, IVF/PQ
``operators/similarity.py``, LSH ``operators/dedup.py``, SimHash).

Extends the reference's surface (it has no persistence at all) per the
project brief — this repo's flagship serving contract is
build-once/serve-refit-free from parquet state tables, and that contract
needs a safe answer to "what happens when I write a merged index back to
the path I read it from?".  Spark refuses to overwrite a path a live
plan is reading, and even when it didn't, a mid-write failure would
leave mixed-generation tables that serve silently wrong results.

The fix is the classic generation-directory + pointer scheme (the same
shape Iceberg/Delta use for their metadata roots, reduced to the
single-writer case this engine targets):

- every logical index lives under one root ``path``;
- each WRITE lands in a fresh generation directory ``path/v=<n>``
  (monotonically increasing ``n``), never touching earlier generations;
- after ALL state tables of the generation are fully written, a tiny
  ``path/_CURRENT`` pointer file is atomically replaced (write-temp +
  ``os.replace``) to name the new generation.

Readers resolve ``_CURRENT`` first, so:

- **read -> merge -> write on the same logical path is SUPPORTED**: the
  merged write streams FROM the old generation's parquet INTO the new
  generation's directory — no self-overwrite, and concurrent serves
  keep reading the old generation until the pointer swaps;
- **a crash mid-write is harmless**: the half-written ``v=<n+1>`` is
  unreferenced garbage, ``_CURRENT`` still names the last complete
  generation, and every read serves it (tests/test_index_store.py
  asserts this for all index families);
- **compaction is just a rewrite**: read the current generation,
  rewrite its partitions into the next one, swap the pointer
  (``compact_*_index`` in each family module).

Old generations accumulate until :func:`vacuum_index` removes them —
retention is an explicit operator decision (a long-running serve job
may still hold the previous generation's file list).

Scope: single-writer, filesystem-backed paths (local/NFS/DBFS-fuse
style, where ``os.replace`` is atomic).  An object-store deployment
(S3/GCS) would swap the pointer with a conditional PUT instead; the
layout is identical.  Bare-layout indexes written before this module
existed (state tables directly under ``path``) keep reading: resolution
falls back to ``path`` itself when no ``_CURRENT`` exists, and their
first versioned write upgrades them in place (the bare tables become
dead files alongside ``v=1``).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
from typing import List, Optional

__all__ = ["begin_version", "commit_version", "resolve_index_path",
           "current_version", "list_versions", "vacuum_index"]

_POINTER = "_CURRENT"
_COMMIT_MARK = "_COMMITTED"
_VDIR_RE = re.compile(r"^v=(\d+)$")


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def _local(path: str) -> str:
    """Strip a ``file:`` scheme so os-level pointer ops work on the same
    location Spark writes to.  Any OTHER scheme (hdfs://, s3a://, …)
    fails LOUDLY: the pointer/generation metadata here is os-level, so
    on a remote FS the ``os.makedirs`` would silently create a literal
    ``./hdfs:/…`` directory relative to the driver's cwd while Spark
    writes the state tables remotely — and a reader elsewhere, finding
    no pointer, would fall back to the bare legacy layout and serve
    stale tables with no error.  An object-store deployment swaps the
    pointer with a conditional PUT instead (module docstring); wire
    that in before accepting remote schemes."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    if _SCHEME_RE.match(path):
        raise ValueError(
            f"index_store: non-local path {path!r} — the versioned "
            "store's pointer operations are os-level (local/NFS/fuse "
            "paths only). A remote scheme would split metadata from "
            "state and silently serve stale generations; see the "
            "module docstring for the object-store design.")
    return path


def list_versions(path: str) -> List[int]:
    """Generation numbers present under ``path`` (committed or not),
    ascending.  Empty for a missing root or a bare-layout index."""
    root = _local(path)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VDIR_RE.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(path: str) -> Optional[int]:
    """The committed generation number, or None (bare layout / no index
    yet).  Raises on a corrupt pointer — a pointer that exists but
    cannot be parsed means the store is damaged, and guessing a
    generation would serve arbitrary state."""
    root = _local(path)
    ptr = os.path.join(root, _POINTER)
    if not os.path.isfile(ptr):
        return None
    with open(ptr, "r", encoding="utf-8") as f:
        content = f.read().strip()
    m = _VDIR_RE.match(content)
    if not m:
        raise ValueError(
            f"index_store: corrupt pointer file {ptr!r} (content "
            f"{content!r}, expected 'v=<n>') — refusing to guess a "
            "generation. Restore the pointer or rebuild the index.")
    return int(m.group(1))


def resolve_index_path(path: str) -> str:
    """The directory the CURRENT generation's state tables live in:
    ``path/v=<n>`` when a pointer exists, else ``path`` itself
    (bare/legacy layout).  A pointer naming a missing directory raises
    (a vacuumed-too-aggressively or hand-damaged store must fail loud,
    not fall back to stale bare tables)."""
    n = current_version(path)
    if n is None:
        return path
    vdir = os.path.join(_local(path), f"v={n}")
    if not os.path.isdir(vdir):
        raise ValueError(
            f"index_store: pointer at {path!r} names generation v={n} "
            "but that directory does not exist — the store is damaged "
            "(vacuum raced a writer, or files were removed by hand). "
            "Rebuild the index.")
    return vdir


def begin_version(path: str) -> str:
    """Allocate the NEXT generation directory for a write and return
    its path (``path/v=<max+1>``, ``v=1`` for a fresh root).  The
    directory is created empty; nothing is visible to readers until
    :func:`commit_version` swaps the pointer.  Single-writer contract:
    two concurrent writers could allocate the same number — external
    serialization (one ingest pipeline per index) is assumed."""
    root = _local(path)
    os.makedirs(root, exist_ok=True)
    versions = list_versions(path)
    nxt = (versions[-1] + 1) if versions else 1
    vdir = os.path.join(root, f"v={nxt}")
    os.makedirs(vdir, exist_ok=True)
    return vdir


def commit_version(path: str, version_path: str) -> None:
    """Atomically point ``path/_CURRENT`` at a fully-written generation
    directory.  Write-temp + ``os.replace`` so a crash during commit
    leaves either the old pointer or the new one, never a torn file.
    A ``_COMMITTED`` marker is dropped inside the generation FIRST —
    it distinguishes once-complete generations from torn mid-write
    leftovers, which :func:`vacuum_index` must treat differently (a
    torn generation is garbage; a marked one is a valid rollback
    target)."""
    root = _local(path)
    vname = os.path.basename(os.path.normpath(_local(version_path)))
    if not _VDIR_RE.match(vname):
        raise ValueError(
            f"index_store: commit_version expects a 'v=<n>' generation "
            f"directory, got {version_path!r}")
    vdir = os.path.join(root, vname)
    if not os.path.isdir(vdir):
        raise ValueError(
            f"index_store: cannot commit {vname!r} under {path!r} — "
            "the generation directory does not exist (write it first)")
    with open(os.path.join(vdir, _COMMIT_MARK), "w",
              encoding="utf-8") as f:
        f.write("committed\n")
    fd, tmp = tempfile.mkstemp(prefix="._CURRENT.", dir=root)
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(vname + "\n")
        # mkstemp creates 0600; the pointer must be as readable as the
        # state tables it names (a serve-only account could otherwise
        # read every parquet file yet fail on the pointer)
        os.chmod(tmp, 0o644)
        os.replace(tmp, os.path.join(root, _POINTER))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def vacuum_index(path: str, keep_last: int = 1) -> List[int]:
    """Delete unreferenced generations, returning the numbers removed.
    Keeps the CURRENT generation plus the newest ``keep_last - 1``
    other COMMITTED generations at or below it; torn mid-write
    leftovers below the pointer (no ``_COMMITTED`` marker — a crash
    between table writes) are always garbage and always removed, so
    they can never occupy a retention slot a rollback depends on.
    Generations NEWER than the pointer are never touched (an in-flight
    uncommitted write).  Retention is the operator's call: a serve job
    that planned against the previous generation keeps its file list
    until its query finishes — vacuum only once no reader can still
    hold one."""
    cur = current_version(path)
    if cur is None:
        return []
    keep_last = max(1, int(keep_last))
    root = _local(path)
    below = [v for v in list_versions(path) if v <= cur]
    committed = [v for v in below
                 if v == cur or os.path.isfile(
                     os.path.join(root, f"v={v}", _COMMIT_MARK))]
    keep = set(committed[-keep_last:]) | {cur}
    removed = []
    for v in below:
        if v not in keep:
            shutil.rmtree(os.path.join(root, f"v={v}"))
            removed.append(v)
    return removed
