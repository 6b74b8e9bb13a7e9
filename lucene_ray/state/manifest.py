"""Index manifest: the engine's ``segments_N`` analogue.

Lucene publishes an index as an atomic ``segments_N`` file written with a
two-phase commit (``index/SegmentInfos.java:55-64,133``). Our analogue is a
JSON manifest at the index root, written to a temp file and atomically
renamed. The manifest carries:

- the docID plan (bucket key-range boundaries + per-bucket docID bases),
  which makes docIDs deterministic and resume-safe;
- per-segment and per-postings-partition lineage records (input fingerprint,
  row counts, bytes, wall time) — the per-partition checkpoint/metrics the
  north rule requires;
- global collection stats (doc_count, sum_ttf) used by BM25
  (the role of ``IndexSearcher.collectionStatistics``,
  ``search/IndexSearcher.java:1140-1155``).

A build is resumable: partitions whose outputs and lineage records already
exist are skipped (lineage is written per-partition into ``_build/`` as each
task finishes; the final manifest folds them together).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any


@dataclass
class IndexManifest:
    version: int
    config: dict[str, Any]
    boundaries: list[str]            # bucket key-range upper bounds
    bases: list[int]                 # per-bucket docID base offsets
    bucket_counts: list[int]
    doc_count: int = 0
    sum_ttf: int = 0
    segments: list[dict] = field(default_factory=list)
    postings_parts: list[dict] = field(default_factory=list)
    corpus_fingerprint: str = ""

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "config": self.config,
            "boundaries": self.boundaries,
            "bases": self.bases,
            "bucket_counts": self.bucket_counts,
            "doc_count": self.doc_count,
            "sum_ttf": self.sum_ttf,
            "segments": self.segments,
            "postings_parts": self.postings_parts,
            "corpus_fingerprint": self.corpus_fingerprint,
        }


def max_assigned_doc(m: "IndexManifest") -> int:
    """The docID ceiling (Lucene's maxDoc): docIDs are never renumbered,
    so the bound comes from the docID plan (bases + bucket counts), NOT
    from doc_count — expunge compaction lowers doc_count while live
    docIDs keep their original values up to this ceiling."""
    if not m.bases:
        return m.doc_count
    return int(max(int(b) + int(c)
                   for b, c in zip(m.bases, m.bucket_counts)))


def atomic_write_json(path: str, obj: Any) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def save_manifest(index_dir: str, m: IndexManifest) -> None:
    atomic_write_json(os.path.join(index_dir, "manifest.json"), m.to_json())


def load_manifest(index_dir: str) -> IndexManifest:
    with open(os.path.join(index_dir, "manifest.json")) as f:
        d = json.load(f)
    return IndexManifest(
        version=d["version"], config=d["config"], boundaries=d["boundaries"],
        bases=d["bases"], bucket_counts=d["bucket_counts"],
        doc_count=d["doc_count"], sum_ttf=d["sum_ttf"],
        segments=d["segments"], postings_parts=d["postings_parts"],
        corpus_fingerprint=d.get("corpus_fingerprint", ""),
    )
