"""Versioned table snapshots: atomic publish, time travel, vacuum.

A minimal table-format pattern (the idea behind Delta/Iceberg, reduced
to its load-bearing parts) for pipelines that republish a table per
run and need (a) readers never to observe a half-written table and
(b) the previous version(s) to stay queryable:

- each write lands in ``<table>/v=<n>/`` — a fresh directory, never
  mutating a published one;
- ``_LATEST`` is a one-line pointer file updated by write-temp +
  atomic rename, so "publish" is a single metadata operation after all
  data files are durable. Readers resolve the pointer, then read an
  immutable directory — snapshot isolation without locks;
- ``vacuum`` deletes all but the newest k versions (bounded storage).

At 100 TB this is exactly the production shape: the expensive part
(writing v=n) is a normal distributed parquet write; publish and
time-travel are O(1) metadata. On object stores the rename becomes a
conditional put — same single-point-of-publish property.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_LATEST"


def _version_dirs(table_path: str) -> list[int]:
    if not os.path.isdir(table_path):
        return []
    out = []
    for name in os.listdir(table_path):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def latest_version(table_path: str) -> int | None:
    """The published version per the pointer file (None if never
    published). Trusts the pointer, not directory listing — a crashed
    write may have left a newer, never-published v= directory."""
    p = os.path.join(table_path, _LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def write_snapshot(df: DataFrame, table_path: str) -> int:
    """Write ``df`` as the next version and atomically publish it.

    The data write happens entirely in an unpublished ``v=<n>``
    directory; only after it succeeds does the pointer move. A crash
    mid-write leaves an orphan directory (cleaned by vacuum) and the
    previous version still published — never a torn table."""
    os.makedirs(table_path, exist_ok=True)
    current = latest_version(table_path) or 0
    # skip past orphan directories from crashed writes too — never
    # reuse a version number that has data under it (it might also be
    # another writer's in-flight version)
    nxt = max(current, max(_version_dirs(table_path), default=0)) + 1
    df.write.mode("overwrite").parquet(os.path.join(table_path, f"v={nxt}"))
    fd, tmp = tempfile.mkstemp(dir=table_path, prefix="._latest_")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(str(nxt))
        os.replace(tmp, os.path.join(table_path, _LATEST))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return nxt


def read_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read the published version (default) or time-travel to a pinned
    one. Raises if the table has never been published or the pinned
    version does not exist."""
    if version is None:
        version = latest_version(table_path)
        if version is None:
            raise FileNotFoundError(f"no published snapshot at {table_path}")
    vdir = os.path.join(table_path, f"v={version}")
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"snapshot v={version} not found at {table_path}")
    return spark.read.parquet(vdir)


def _dir_mtime(path: str) -> float:
    """Newest mtime under a version directory (the directory itself or
    any file in it) — a still-being-written version keeps advancing."""
    newest = os.path.getmtime(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(root, f)))
            except OSError:
                pass  # file vanished mid-walk; its writer is active anyway
    return newest


def vacuum(
    table_path: str,
    keep_last: int = 2,
    orphan_grace_seconds: float = 24 * 3600,
) -> list[int]:
    """Delete old versions, keeping the newest ``keep_last`` PUBLISHED
    versions (the keep set is built from published-or-older directories
    only, so crash debris occupying the top version numbers can never
    evict real history from retention). Never deletes the published
    version. Returns the versions removed.

    A version directory that is not the pointer target may be crash
    debris or another writer's in-flight version — indistinguishable by
    listing alone, and an in-flight version can sit BELOW the pointer
    too (writer A allocates v=5, writer B publishes v=6 before A
    finishes). Matching Delta/Iceberg retention semantics, EVERY
    deletion candidate is reaped only once untouched for
    ``orphan_grace_seconds`` (newest mtime in the tree): a live writer
    advances mtimes far faster than any sane grace period, while
    debris and expired history age out. Pass ``0`` only when the
    caller can guarantee no concurrent writer."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    published = latest_version(table_path)
    dirs = _version_dirs(table_path)
    history = [v for v in dirs if published is not None and v <= published]
    keep = set(history[-keep_last:])
    if published is not None:
        keep.add(published)
    removed = []
    now = time.time()
    for v in dirs:
        if v in keep:
            continue
        vdir = os.path.join(table_path, f"v={v}")
        try:
            if now - _dir_mtime(vdir) < orphan_grace_seconds:
                continue  # possibly in-flight: leave it
        except OSError:
            continue  # vanished or racing writer: leave it
        shutil.rmtree(vdir)
        removed.append(v)
    return removed
