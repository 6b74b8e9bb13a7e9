"""NRT-style index replication — the ``replicator`` module's role.

A replica pulls an index commit from a primary by copying exactly the
files it is missing, then atomically switches to the new point-in-time
(replicator/nrt/ReplicaNode.java:58 "pulls index changes from the
primary node by copying newly flushed or merged files"; CopyJob.java:37
/ CopyOneFile.java per-file transfer; FileMetaData length+checksum
identity). Ordering is the reference's invariant: data files land
first, the commit metadata (our ``manifest.json``) is published LAST,
and only then are files the new commit no longer references deleted
(ReplicaFileDeleter.java role). A crashed replication re-runs and
copies only what is still missing or mismatched — the same idempotence
as the resumable build.

File identity is (size, crc32) computed streaming on both sides — the
role of Lucene's per-file checksum footer. File NAMES are not trusted
across commits (merges rewrite parts under new names, but a corrupt or
truncated replica file must be detected), so a name+size match alone
never skips a copy.

What replicates (single-writer assumption, like the rest of the
engine):

- the commit: ``manifest.json`` captured FIRST, before any file copy —
  files added by a concurrent later commit may be copied as harmless
  extras, but the published point-in-time is the captured one;
- core data dirs referenced by commits: ``postings/``, ``segments/``,
  ``docmeta/``;
- side search-state generations: ``deletes/`` (tombstones),
  ``docvalues/`` (keyword-ordinal docvalues), ``features/`` (feature
  base values AND their ``updates/`` numeric-update generations — the
  updates are user mutations a replica CANNOT lazily rebuild from
  docmeta, so they must always ship);
- with ``include_derived=True`` every other subdir except ``_build/``
  (local build lineage) and ``snapshots/`` (local retention policy);
  derived indexes (points, vectors, geo, shapes) are otherwise skipped
  — replicas rebuild them lazily and the manifest-version invalidation
  guarantees staleness is detected.

Snapshot replication caveat: pinned-snapshot syncs filter ``deletes/``
generations to the snapshotted set, but feature-update generations are
not recorded by snapshots — a PIT replica sees all of them, the same
documented limitation as the primary's own point-in-time reader
(state/snapshots.py scope note).

Scale shape: the file inventory is a driver-side listing (one row per
file — thousands, not data-sized); transfer runs as one Ray task per
few files (`from_items → map_batches`), so a 256-node replica fleet
saturates its NICs the way CopyJob's per-file streams do. Bytes never
route through the driver.
"""

from __future__ import annotations

import json
import os
import shutil
import zlib

CORE_DIRS = ("postings", "segments", "docmeta")
SIDE_DIRS = ("deletes", "docvalues", "features")
SKIP_DIRS = ("_build", "snapshots")
_CRC_CHUNK = 1 << 20


def _crc32_file(path: str) -> tuple[int, int]:
    """(size, crc32) streaming — the FileMetaData identity."""
    crc = 0
    size = 0
    with open(path, "rb") as f:
        while True:
            b = f.read(_CRC_CHUNK)
            if not b:
                break
            crc = zlib.crc32(b, crc)
            size += len(b)
    return size, crc


def _inventory(src: str, include_derived: bool) -> list[str]:
    dirs = set(CORE_DIRS) | set(SIDE_DIRS)
    if include_derived:
        for d in os.listdir(src):
            if (os.path.isdir(os.path.join(src, d))
                    and d not in SKIP_DIRS):
                dirs.add(d)
    rels = []
    for d in sorted(dirs):
        root = os.path.join(src, d)
        if not os.path.isdir(root):
            continue
        for base, _, files in os.walk(root):
            for f in files:
                rels.append(os.path.relpath(os.path.join(base, f), src))
    return sorted(rels)


def replicate_index(src: str, dst: str, snapshot: int | None = None,
                    include_derived: bool = False) -> dict:
    """Sync ``dst`` to ``src``'s current commit (or a pinned
    ``snapshot`` version); returns transfer stats. Idempotent: a
    second run copies nothing."""
    import ray
    import ray.data

    snap_deletes = None
    if snapshot is not None:
        from .state.snapshots import load_snapshot

        m, dfiles = load_snapshot(src, snapshot)
        manifest_obj = m.to_json()
        snap_deletes = {os.path.join("deletes", f) for f in dfiles}
    else:
        with open(os.path.join(src, "manifest.json")) as f:
            manifest_obj = json.load(f)

    files = _inventory(src, include_derived)
    if snap_deletes is not None:
        # point-in-time fidelity: tombstone generations newer than the
        # snapshot must not reach the replica (readers union ALL
        # generations, unlike manifest-gated data files)
        files = [r for r in files
                 if not r.startswith("deletes" + os.sep)
                 or r in snap_deletes]
    os.makedirs(dst, exist_ok=True)

    def sync(batch):
        import pyarrow as pa

        rel_l, act_l, byt_l = [], [], []
        for rel in batch.column("rel").to_pylist():
            sp, dp = os.path.join(src, rel), os.path.join(dst, rel)
            s_size, s_crc = _crc32_file(sp)
            if os.path.exists(dp):
                d_size, d_crc = _crc32_file(dp)
                if (d_size, d_crc) == (s_size, s_crc):
                    rel_l.append(rel)
                    act_l.append("skipped")
                    byt_l.append(0)
                    continue
            os.makedirs(os.path.dirname(dp), exist_ok=True)
            tmp = dp + ".reptmp"
            shutil.copyfile(sp, tmp)
            os.replace(tmp, dp)
            rel_l.append(rel)
            act_l.append("copied")
            byt_l.append(s_size)
        return pa.table({"rel": pa.array(rel_l),
                         "action": pa.array(act_l),
                         "bytes": pa.array(byt_l, pa.int64())})

    if files:
        res = (ray.data.from_items([{"rel": r} for r in files])
               .map_batches(sync, batch_format="pyarrow", batch_size=4)
               .take_all())                 # tiny: one row per file
    else:
        res = []

    # publish the captured commit LAST (IndexReplicationHandler rule)
    tmp = os.path.join(dst, "manifest.json.reptmp")
    with open(tmp, "w") as f:
        json.dump(manifest_obj, f)
    os.replace(tmp, os.path.join(dst, "manifest.json"))

    # ReplicaFileDeleter role: drop replica files the synced inventory
    # no longer contains (old merged-away parts, stale generations)
    want = set(files)
    deleted = []
    for d in set(CORE_DIRS) | set(SIDE_DIRS):
        root = os.path.join(dst, d)
        if not os.path.isdir(root):
            continue
        for base, _, fs in os.walk(root):
            for f in fs:
                rel = os.path.relpath(os.path.join(base, f), dst)
                if rel not in want and not rel.endswith(".reptmp"):
                    os.remove(os.path.join(dst, rel))
                    deleted.append(rel)

    copied = [r for r in res if r["action"] == "copied"]
    return {
        "version": manifest_obj.get("version"),
        "files_total": len(files),
        "files_copied": len(copied),
        "files_skipped": len(files) - len(copied),
        "bytes_copied": int(sum(r["bytes"] for r in copied)),
        "files_deleted": len(deleted),
    }
