"""Soft deletes + retention leases — the SoftDeletesRetentionMergePolicy
role (index/SoftDeletesRetentionMergePolicy.java:46).

Lucene soft-deletes mark docs via a docvalues field instead of the
live-docs bitset; ``SoftDeletesRetentionMergePolicy`` wraps the merge
policy so merges KEEP soft-deleted docs that still match a retention
query — typically "operations newer than the sequence number every
replica has ack'd" (the retention-lease pattern built on it) — and only
reclaims them once retention no longer needs them.

Our analogue over the generational tombstone layout (build.py
``deletes/``):

* a SOFT tombstone generation is a ``soft_NNNNN.parquet`` file beside
  the hard ``gen_NNNNN.parquet`` ones. Readers union both kinds, so a
  soft-deleted doc stops matching searches immediately (the reference's
  reader applies the soft-deletes field exactly like live docs);
* a retention lease (``deletes/leases/<id>.json``) records the highest
  soft generation its holder — a replica, a PIT consumer — has caught
  up through;
* ``compact_index(expunge_deletes=True)`` physically expunges hard
  generations and only those soft generations every lease has passed
  (number <= the floor); retained soft generations keep their docs in
  postings/docmeta AND keep their tombstone files, exactly the merge
  behavior the reference's policy enforces.
"""

from __future__ import annotations

import json
import os

_LEASE_DIR = os.path.join("deletes", "leases")


def _lease_path(index_dir: str, lease_id: str) -> str:
    if not lease_id or any(c in lease_id for c in "/\\"):
        raise ValueError(f"bad lease id {lease_id!r}")
    return os.path.join(index_dir, _LEASE_DIR, f"{lease_id}.json")


def acquire_retention_lease(index_dir: str, lease_id: str,
                            through_gen: int = -1) -> None:
    """Create or advance a lease: its holder has caught up through soft
    generation ``through_gen`` (-1 = nothing yet — retain everything).
    Leases only advance; re-acquiring with a lower watermark keeps the
    higher one (the reference's leases are monotonic sequence numbers)."""
    path = _lease_path(index_dir, lease_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(path):
        with open(path) as f:
            through_gen = max(through_gen, int(json.load(f)["through"]))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"through": int(through_gen)}, f)
    os.replace(tmp, path)


def release_retention_lease(index_dir: str, lease_id: str) -> None:
    try:
        os.remove(_lease_path(index_dir, lease_id))
    except FileNotFoundError:
        pass


def list_retention_leases(index_dir: str) -> dict[str, int]:
    ldir = os.path.join(index_dir, _LEASE_DIR)
    out: dict[str, int] = {}
    if os.path.isdir(ldir):
        for f in sorted(os.listdir(ldir)):
            if f.endswith(".json"):
                with open(os.path.join(ldir, f)) as fh:
                    out[f[:-len(".json")]] = int(json.load(fh)["through"])
    return out


def soft_gen_number(fname: str) -> int | None:
    """Generation number of a soft tombstone basename, else None."""
    if fname.startswith("soft_") and fname.endswith(".parquet"):
        try:
            return int(fname[len("soft_"):-len(".parquet")])
        except ValueError:
            return None
    return None


def latest_soft_gen(index_dir: str) -> int:
    """Highest soft generation currently filed (-1 if none) — what a
    fully-caught-up consumer passes to :func:`acquire_retention_lease`."""
    ddir = os.path.join(index_dir, "deletes")
    gens = [g for f in (os.listdir(ddir) if os.path.isdir(ddir) else [])
            if (g := soft_gen_number(f)) is not None]
    return max(gens) if gens else -1


def retained_soft_files(index_dir: str) -> set[str]:
    """Soft tombstone basenames retention still needs: generation number
    above the floor = min over all leases (no leases -> nothing
    retained, the reference's default MatchNoDocsQuery retention)."""
    leases = list_retention_leases(index_dir)
    if not leases:
        return set()
    floor = min(leases.values())
    ddir = os.path.join(index_dir, "deletes")
    out = set()
    for f in (os.listdir(ddir) if os.path.isdir(ddir) else []):
        g = soft_gen_number(f)
        if g is not None and g > floor:
            out.add(f)
    return out
