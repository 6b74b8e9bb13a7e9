"""Bloom-filter term-existence gate — the BloomFilteringPostingsFormat
role.

Reference: ``codecs/src/java/org/apache/lucene/codecs/bloom/
BloomFilteringPostingsFormat.java:62`` (a per-segment bloom filter is
consulted BEFORE the delegate terms dictionary so lookups for absent
terms never touch it — "primary keys or subsets of the vocabulary with
low hit rates") and ``FuzzySet.java:48`` (single-hash power-of-two
bitset with a MAYBE / NO contract and a target saturation around 10%).

Ray-Data-first analog: one FuzzySet per POSTINGS FILE (the per-segment
granularity), built by a map-only pass over the term columns and stored
as a derived index (``bloom/terms.parquet`` + manifest-versioned
lineage, the ``points.py`` invalidation pattern). ``IndexReader``
consults the bucket's file blooms before loading or binary-searching any
partition: if every file votes NO the lookup short-circuits to "absent"
— zero parquet IO for misses, which is the 100-TB win (cold misses skip
the object-store read entirely). MAYBE falls through to the exact
dictionary, so the NO-side is the only trusted answer and false
negatives are impossible by construction (every stored term set its own
bit; a stale bloom is ignored via the manifest-version check).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .state.manifest import atomic_write_json

BITS_PER_TERM = 10          # ≤10% saturation at k=1, FuzzySet's default


def _hash64(terms: list[str]) -> np.ndarray:
    """64-bit blake2b per term (vocab-level: callers pass UNIQUE terms,
    the repo-wide dedup convention for per-word hashing)."""
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                        .digest(), "little") for t in terms],
        dtype=np.uint64)


def _next_pow2(n: int) -> int:
    return 1 << max(6, (max(1, n) - 1).bit_length())


def _build_one(path: str) -> tuple[int, bytes]:
    """(size_bits, packed bitset) for one postings file's term set."""
    import pyarrow.compute as pc

    terms = pc.unique(
        pq.read_table(path, columns=["term"]).column("term")).to_pylist()
    size = _next_pow2(BITS_PER_TERM * max(1, len(terms)))
    bits = np.zeros(size // 8, dtype=np.uint8)
    if terms:
        h = _hash64(terms) & np.uint64(size - 1)
        np.bitwise_or.at(bits, (h >> np.uint64(3)).astype(np.int64),
                         (1 << (h & np.uint64(7))).astype(np.uint8))
    return size, bits.tobytes()


def build_bloom_index(index_dir: str) -> dict:
    """Build (idempotently) per-postings-file blooms as a derived index.

    Map-only over the file list — no shuffle; each task reads ONE file's
    term column and emits a (file, tbucket, size_bits, bits) row. The
    combined table is vocabulary-sized × BITS_PER_TERM/8 bytes, tiny."""
    import ray.data

    from .state.manifest import load_manifest

    out_dir = os.path.join(index_dir, "bloom")
    lineage_path = os.path.join(out_dir, "_lineage.json")
    man = load_manifest(index_dir)
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            lineage = json.load(f)
        if lineage.get("manifest_version") == man.version:
            return lineage
        for f in os.listdir(out_dir):
            if f.endswith(".parquet") or f.endswith(".json"):
                os.remove(os.path.join(out_dir, f))
    os.makedirs(out_dir, exist_ok=True)

    items = [{"file": f"part={p['part']}.parquet",
              "tbucket": int(p["tbucket"])}
             for p in man.postings_parts]
    if items:
        def mk(batch: pa.Table) -> pa.Table:
            files = batch.column("file").to_pylist()
            tbs = batch.column("tbucket").to_pylist()
            sizes, blobs = [], []
            for f in files:
                size, blob = _build_one(
                    os.path.join(index_dir, "postings", f))
                sizes.append(size)
                blobs.append(blob)
            return pa.table({
                "file": pa.array(files, pa.string()),
                "tbucket": pa.array(tbs, pa.int64()),
                "size_bits": pa.array(sizes, pa.int64()),
                "bits": pa.array(blobs, pa.binary())})

        import ray

        refs = (ray.data.from_items(items)
                .map_batches(mk, batch_format="pyarrow")
                .to_arrow_refs())
        tbl = pa.concat_tables([ray.get(r) for r in refs])
    else:
        tbl = pa.table({"file": pa.array([], pa.string()),
                        "tbucket": pa.array([], pa.int64()),
                        "size_bits": pa.array([], pa.int64()),
                        "bits": pa.array([], pa.binary())})
    tbl = tbl.sort_by("file")
    pq.write_table(tbl, os.path.join(out_dir, "terms.parquet"))
    lineage = {"manifest_version": man.version,
               "n_files": tbl.num_rows,
               "bits_per_term": BITS_PER_TERM}
    atomic_write_json(lineage_path, lineage)
    return lineage


class BloomGate:
    """Reader-side view: per-tbucket list of (size_bits, bitset).
    ``maybe_contains`` is the FuzzySet MAYBE/NO contract over the
    bucket's files; counters make the pruning observable."""

    def __init__(self, index_dir: str, manifest_version: int):
        self.buckets: dict[int, list[tuple[int, np.ndarray]]] = {}
        self.n_checks = 0
        self.n_pruned = 0
        lineage_path = os.path.join(index_dir, "bloom", "_lineage.json")
        try:
            with open(lineage_path) as f:
                lineage = json.load(f)
        except FileNotFoundError:
            return
        if lineage.get("manifest_version") != manifest_version:
            return                       # stale derived index: ignore
        t = pq.read_table(os.path.join(index_dir, "bloom",
                                       "terms.parquet"))
        for tb, size, blob in zip(t.column("tbucket").to_pylist(),
                                  t.column("size_bits").to_pylist(),
                                  t.column("bits").to_pylist()):
            self.buckets.setdefault(int(tb), []).append(
                (int(size), np.frombuffer(blob, dtype=np.uint8)))

    @property
    def loaded(self) -> bool:
        return bool(self.buckets)

    def maybe_contains(self, tbucket: int, term: str) -> bool:
        """False = DEFINITELY absent (trusted); True = check the
        dictionary. A bucket with no bloom rows has no postings files,
        so the term is absent there too."""
        self.n_checks += 1
        h64 = int.from_bytes(hashlib.blake2b(term.encode(),
                                             digest_size=8).digest(),
                             "little")
        for size, bits in self.buckets.get(tbucket, ()):
            h = h64 & (size - 1)
            if bits[h >> 3] & (1 << (h & 7)):
                return True
        self.n_pruned += 1
        return False
