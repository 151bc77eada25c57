"""Snapshot metadata layer over segment stores — Iceberg's table-format
discipline (snapshot log + HEAD pointer + optimistic commits + expiry)
applied to the compressed index segments, so a 100-TB index gets:

  - atomic publish: a build/merge is invisible until its snapshot
    commits (readers never see half-written partitions);
  - time travel: any retained snapshot id reads exactly the file set
    it committed — yesterday's index stays queryable during a rebuild;
  - rollback: HEAD moves to an old snapshot without touching data;
  - safe GC: ``expire_snapshots`` deletes only files unreferenced by
    every retained snapshot.

The reference engine has none of this (its KVS tables are mutated in
place, pt-index writes clobber, jobs/Indexer.java); the north rule's
"per-partition lineage + checkpointed resume" is the WRITE side —
this is the matching READ-side contract.

Format (all under ``<root>/``): ``snap/snapshot-<id>.json`` holds
{snapshot_id, parent_id, operation, files:[{path, bytes}], summary};
``HEAD`` holds the current id and is replaced atomically
(write-temp + ``os.replace``). Commits are optimistic: a commit whose
``parent_id`` is no longer HEAD raises ``SnapshotConflict`` — the
caller re-reads and retries, Iceberg's loser-retries rule. File paths
are stored relative to root, so the store relocates wholesale.

100-TB shape: metadata is O(files), data is never copied — commit,
rollback, and time travel are pure metadata operations; expiry deletes
each orphaned file once. A real deployment would keep root on the
object store and swap ``os.replace`` for a conditional PUT / catalog
CAS — the single-pointer structure is exactly what Iceberg catalogs
do, so the seam is one function (``_write_head``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Optimistic-concurrency failure: HEAD moved since the commit's
    parent was read. Re-read HEAD and retry the commit."""


def _snap_dir(root: str) -> str:
    return os.path.join(root, "snap")


def _snap_path(root: str, snapshot_id: int) -> str:
    return os.path.join(_snap_dir(root), f"snapshot-{snapshot_id}.json")


def _head_path(root: str) -> str:
    return os.path.join(root, "HEAD")


def _write_head(root: str, snapshot_id: int) -> None:
    tmp = _head_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(snapshot_id))
    os.replace(tmp, _head_path(root))


def current_snapshot_id(root: str) -> int | None:
    try:
        with open(_head_path(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def read_snapshot(root: str, snapshot_id: int | None = None) -> dict:
    """The snapshot record (HEAD's when snapshot_id is None)."""
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(root)
        if snapshot_id is None:
            raise FileNotFoundError(f"no HEAD in {root}")
    with open(_snap_path(root, snapshot_id)) as f:
        return json.load(f)


def list_snapshots(root: str) -> list[dict]:
    """All retained snapshot records, oldest first."""
    d = _snap_dir(root)
    if not os.path.isdir(d):
        return []
    ids = sorted(
        int(f[len("snapshot-") : -len(".json")])
        for f in os.listdir(d)
        if f.startswith("snapshot-") and f.endswith(".json")
    )
    return [read_snapshot(root, i) for i in ids]


def _collect_files(root: str, data_dir: str) -> list[dict]:
    out = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, data_dir)):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(dirpath, f)
            out.append(
                {
                    "path": os.path.relpath(full, root),
                    "bytes": os.path.getsize(full),
                }
            )
    return sorted(out, key=lambda r: r["path"])


def commit_snapshot(
    root: str,
    data_dir: str | list[str],
    operation: str,
    parent_id: int | None = None,
    summary: dict | None = None,
) -> int:
    """Publish the parquet files under ``data_dir`` (relative to root;
    a list unions several, e.g. base + delta segments) as a new
    snapshot and move HEAD to it. ``parent_id`` must equal current
    HEAD (None for the first commit) or SnapshotConflict is raised.
    Returns the new snapshot id."""
    head = current_snapshot_id(root)
    if parent_id != head:
        raise SnapshotConflict(
            f"parent {parent_id} is stale: HEAD is {head}"
        )
    os.makedirs(_snap_dir(root), exist_ok=True)
    new_id = (head or 0) + 1
    dirs = [data_dir] if isinstance(data_dir, str) else list(data_dir)
    files: list[dict] = []
    for d in dirs:
        files.extend(_collect_files(root, d))
    record = {
        "snapshot_id": new_id,
        "parent_id": head,
        "operation": operation,
        "committed_at": time.time(),
        "files": files,
        "summary": dict(summary or {}, n_files=len(files)),
    }
    tmp = _snap_path(root, new_id) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, _snap_path(root, new_id))
    _write_head(root, new_id)
    return new_id


def rollback(root: str, snapshot_id: int) -> None:
    """Move HEAD to a retained snapshot; data untouched."""
    if not os.path.exists(_snap_path(root, snapshot_id)):
        raise FileNotFoundError(f"snapshot {snapshot_id} not retained")
    _write_head(root, snapshot_id)


def read_segments_at(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """The segment rows of exactly one snapshot's file set (HEAD by
    default) — the time-travel read. basePath keeps the part=<p>
    partition column; listing is the snapshot's, not the directory's,
    so uncommitted or expired-in-flight files are invisible."""
    snap = read_snapshot(root, snapshot_id)
    paths = [os.path.join(root, f["path"]) for f in snap["files"]]
    if not paths:
        raise ValueError(f"snapshot {snap['snapshot_id']} lists no files")
    return spark.read.option("basePath", root).parquet(*paths)


def expire_snapshots(root: str, keep_last: int = 2) -> dict:
    """Drop all but the newest ``keep_last`` snapshots (HEAD is always
    kept) and delete data files referenced by NO retained snapshot.
    Returns {"snapshots_dropped": n, "files_deleted": n}."""
    snaps = list_snapshots(root)
    head = current_snapshot_id(root)
    if not snaps:
        return {"snapshots_dropped": 0, "files_deleted": 0}
    keep_ids = {s["snapshot_id"] for s in snaps[-keep_last:]}
    if head is not None:
        keep_ids.add(head)
    kept_files = set()
    dropped = 0
    for s in snaps:
        if s["snapshot_id"] in keep_ids:
            kept_files.update(f["path"] for f in s["files"])
    deleted = 0
    for s in snaps:
        if s["snapshot_id"] in keep_ids:
            continue
        for f in s["files"]:
            if f["path"] not in kept_files:
                full = os.path.join(root, f["path"])
                if os.path.exists(full):
                    os.remove(full)
                    deleted += 1
        os.remove(_snap_path(root, s["snapshot_id"]))
        dropped += 1
    return {"snapshots_dropped": dropped, "files_deleted": deleted}
