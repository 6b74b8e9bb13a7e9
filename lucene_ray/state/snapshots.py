"""Commit snapshots — the SnapshotDeletionPolicy / point-in-time reader role.

Lucene's ``SnapshotDeletionPolicy`` (index/SnapshotDeletionPolicy.java:43)
pins a commit point: the files referenced by a snapshotted ``segments_N``
survive later merges/deletions until the snapshot is released, and
``DirectoryReader.open(IndexCommit)`` opens the index as of that commit.

Our analogue: :func:`create_snapshot` copies the current manifest (plus the
list of tombstone generations visible at that moment) into
``snapshots/commit_<version>.json``. Compaction skips deleting any postings
part referenced by a live snapshot, and ``IndexReader(dir,
at_snapshot=v)`` reads the snapshotted manifest with only the snapshotted
tombstones applied — a stable point-in-time view while appends, deletes and
merges continue.

Scope note (documented limitation, mirrors the storage layout): postings
and deletes are fully generational, so the point-in-time view of search is
exact. Docmeta buckets are append-only except under ``expunge_deletes``
compaction, which rewrites them in place — therefore expunging while
snapshots exist is refused (the caller must release snapshots first), the
same way Lucene's deletion policy blocks file deletion, not merging.
"""

from __future__ import annotations

import json
import os

from .manifest import IndexManifest, atomic_write_json, load_manifest

_SNAP_DIR = "snapshots"


def _snap_path(index_dir: str, version: int) -> str:
    return os.path.join(index_dir, _SNAP_DIR, f"commit_{version:06d}.json")


def create_snapshot(index_dir: str) -> int:
    """Pin the current commit; returns its manifest version (the id)."""
    m = load_manifest(index_dir)
    ddir = os.path.join(index_dir, "deletes")
    delete_files = sorted(
        f for f in os.listdir(ddir) if f.endswith(".parquet")
    ) if os.path.isdir(ddir) else []
    os.makedirs(os.path.join(index_dir, _SNAP_DIR), exist_ok=True)
    atomic_write_json(_snap_path(index_dir, m.version),
                      {"manifest": m.to_json(),
                       "deletes_files": delete_files})
    return m.version


def list_snapshots(index_dir: str) -> list[int]:
    sdir = os.path.join(index_dir, _SNAP_DIR)
    if not os.path.isdir(sdir):
        return []
    return sorted(int(f[len("commit_"):-len(".json")])
                  for f in os.listdir(sdir)
                  if f.startswith("commit_") and f.endswith(".json"))


def release_snapshot(index_dir: str, version: int) -> None:
    try:
        os.remove(_snap_path(index_dir, version))
    except FileNotFoundError:
        pass


def load_snapshot(index_dir: str, version: int
                  ) -> tuple[IndexManifest, list[str]]:
    """The snapshotted manifest and the tombstone generations visible at
    snapshot time (for the point-in-time reader)."""
    with open(_snap_path(index_dir, version)) as f:
        d = json.load(f)
    md = d["manifest"]
    m = IndexManifest(
        version=md["version"], config=md["config"],
        boundaries=md["boundaries"], bases=md["bases"],
        bucket_counts=md["bucket_counts"], doc_count=md["doc_count"],
        sum_ttf=md["sum_ttf"], segments=md["segments"],
        postings_parts=md["postings_parts"],
        corpus_fingerprint=md.get("corpus_fingerprint", ""),
    )
    return m, list(d["deletes_files"])


def purge_unreferenced_postings(index_dir: str) -> list[str]:
    """IndexFileDeleter role (index/IndexFileDeleter.java:66): delete
    postings files referenced by neither the current manifest nor any live
    snapshot — run after :func:`release_snapshot` to reclaim space pinned
    by a released commit."""
    m = load_manifest(index_dir)
    live = {f"part={p['part']}.parquet" for p in m.postings_parts}
    live |= protected_postings(index_dir)
    pdir = os.path.join(index_dir, "postings")
    removed = []
    for f in sorted(os.listdir(pdir)) if os.path.isdir(pdir) else []:
        if f.endswith(".parquet") and f not in live:
            os.remove(os.path.join(pdir, f))
            removed.append(f)
    return removed


def protected_postings(index_dir: str) -> set[str]:
    """Basenames of postings files referenced by any live snapshot —
    compaction must not delete these (the deletion-policy contract)."""
    out: set[str] = set()
    for v in list_snapshots(index_dir):
        m, _ = load_snapshot(index_dir, v)
        for p in m.postings_parts:
            out.add(f"part={p['part']}.parquet")
    return out
