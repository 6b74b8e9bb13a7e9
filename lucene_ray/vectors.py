"""Persisted HNSW vector index (the Lucene99 vector-format role).

The reference stores kNN graphs as index FILES built once at index time
(``lucene/core/src/java/org/apache/lucene/codecs/lucene99/
Lucene99HnswVectorsFormat.java:82`` — per-segment graphs + vectors on
disk) and searches them per-segment with the filtered searcher
(``search/KnnFloatVectorQuery.java:49``: a pre-filter query is evaluated
per segment into an accept-doc set; graph search collects only accepted
docs, and falls back to an exact scan when the filter is selective —
``AbstractKnnVectorQuery.java`` approximateSearch / exactSearch).

Ray-Data-first layout here:

- **Build** (:func:`build_vector_index`): one `map_batches` task per
  shard of ``shard_size`` vectors builds a Malkov-Yashunin graph
  (deterministic per-``vec_id`` levels, diversity heuristic) and writes
  one ``shard_*.npz`` — normalized vectors, flattened adjacency, entry
  point, plus filterable metadata columns (the docvalues role) — into
  the index dir; the driver writes a small ``manifest.json``. Vector
  bytes never route through the driver.
- **Search** (:class:`ShardSearcher`): an actor-pool stage over the
  *shard paths* (tiny items); each actor loads a shard once into an
  in-process cache and answers every query against it (the
  per-leaf-searcher model). Per-shard partial top-k merge exactly like
  TopDocs.merge.

Graphs are per-shard independent, so a 100-TB corpus builds embarrassingly
parallel and incremental appends add shards without touching old ones
(the segment model).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import numpy as np
import pyarrow as pa

HNSW_M = 16
HNSW_EF_CONSTRUCTION = 100
HNSW_EF_SEARCH = 64
VEC_SHARD_SIZE = 65536      # ≥64k vectors per graph at scale


def _hnsw_level(vec_id: int, m_l: float) -> int:
    """Deterministic per-node level: the standard floor(-ln(U)·mL) draw
    (HnswGraphBuilder.getRandomGraphLevel) with U derived from a seeded
    hash of vec_id so the graph is reproducible under any partitioning."""
    import hashlib as _h

    h = int.from_bytes(_h.blake2b(int(vec_id).to_bytes(8, "little"),
                                  digest_size=8).digest(), "little")
    u = (h + 1) / float(1 << 64)          # (0, 1]
    return int(-np.log(u) * m_l)


class HnswGraph:
    """In-memory HNSW over unit-normalized vectors (cosine = dot).

    Neighbor selection uses the diversity heuristic
    (HnswGraphBuilder.diversityCheck): a candidate joins the neighbor
    list only if it is closer to the node than to every already-selected
    neighbor. Max fan-out M per upper level, 2M at level 0
    (Lucene99HnswVectorsFormat maxConn semantics)."""

    def __init__(self, vectors: np.ndarray,
                 m: int = HNSW_M, ef_construction: int = HNSW_EF_CONSTRUCTION,
                 node_ids: np.ndarray | None = None):
        self.v = vectors                          # (n, d) unit rows
        self.m = m
        self.efc = ef_construction
        self.m_l = 1.0 / np.log(m)
        n = len(vectors)
        ids = node_ids if node_ids is not None else np.arange(n)
        self.levels = [_hnsw_level(int(i), self.m_l) for i in ids]
        self.max_level = -1
        self.entry = -1
        # adjacency: per node, per level, list[int] (ndarray once loaded)
        self.nbrs: list[list[list[int]]] = [
            [[] for _ in range(self.levels[i] + 1)] for i in range(n)]
        for i in range(n):
            self._insert(i)

    # -- construction -----------------------------------------------------

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      level: int, accept=None, counter=None,
                      patience: "int | None" = None,
                      saturation_threshold: float = 0.995
                      ) -> list[tuple[float, int]]:
        """Best-first beam search on one layer → up to ef (sim, node),
        sim descending (HnswGraphSearcher.searchLevel). ``accept`` is an
        optional boolean mask over nodes: traversal is unrestricted (the
        graph stays connected) but only accepted nodes enter the result
        heap (Lucene's acceptOrds contract). ``counter`` is a 1-element
        list accumulating visited-node count for the visitedLimit
        fallback decision.

        ``patience``: PatienceKnnVectorQuery's saturation early exit
        (search/HnswQueueSaturationCollector.java:75-92): per candidate
        visit, queueSaturation = min(cur, prev)/cur over the result
        queue size; >= ``saturation_threshold`` for more than
        ``patience`` consecutive visits terminates the beam early."""
        import heapq

        visited = set(eps)
        prev_qsize = 0
        count_saturated = 0
        sims0 = self.v[eps] @ q
        cand = [(-float(s), e) for s, e in zip(sims0, eps)]
        heapq.heapify(cand)
        best_heap = [(-ns, n) for ns, n in cand
                     if accept is None or accept[n]]
        heapq.heapify(best_heap)
        while len(best_heap) > ef:
            heapq.heappop(best_heap)
        if counter is not None:
            counter[0] += len(eps)
        while cand:
            if patience is not None:
                cur_qsize = len(best_heap)
                if cur_qsize > 0:
                    sat = min(cur_qsize, prev_qsize) / cur_qsize
                    if sat >= saturation_threshold:
                        count_saturated += 1
                    else:
                        count_saturated = 0
                prev_qsize = cur_qsize
                if count_saturated > patience:
                    break
            negs, c = heapq.heappop(cand)
            worst = best_heap[0][0] if len(best_heap) >= ef else -np.inf
            if -negs < worst:
                break
            new = [e for e in self.nbrs[c][level] if e not in visited]
            if not new:
                continue
            visited.update(new)
            if counter is not None:
                counter[0] += len(new)
            sims = self.v[new] @ q          # one gather-matmul per expansion
            for e, s in zip(new, sims):
                s = float(s)
                if len(best_heap) < ef or s > best_heap[0][0]:
                    heapq.heappush(cand, (-s, e))
                    if accept is None or accept[e]:
                        heapq.heappush(best_heap, (s, e))
                        if len(best_heap) > ef:
                            heapq.heappop(best_heap)
        return sorted(best_heap, reverse=True)

    def _diverse(self, q_idx: int, cands: list[tuple[float, int]],
                 m: int) -> list[int]:
        """Diversity heuristic: keep candidate e iff sim(e, node) >
        sim(e, s) for every selected s (HnswGraphBuilder.diversityCheck)."""
        sel: list[int] = []
        for s, e in cands:
            if len(sel) >= m:
                break
            if not sel or not bool((self.v[sel] @ self.v[e] > s).any()):
                sel.append(e)
        return sel

    def _insert(self, i: int):
        level = self.levels[i]
        if self.entry < 0:
            self.entry = i
            self.max_level = level
            return
        q = self.v[i]
        eps = [self.entry]
        for lvl in range(self.max_level, level, -1):
            eps = [self._search_layer(q, eps, 1, lvl)[0][1]]
        for lvl in range(min(level, self.max_level), -1, -1):
            cands = self._search_layer(q, eps, self.efc, lvl)
            sel = self._diverse(i, cands, self.m)
            self.nbrs[i][lvl] = list(sel)
            cap = self.m * 2 if lvl == 0 else self.m
            for e in sel:
                nb = self.nbrs[e][lvl]
                if isinstance(nb, np.ndarray):          # loaded graph
                    nb = nb.tolist()
                nb.append(i)
                if len(nb) > cap:
                    # re-prune with the same heuristic
                    scored = sorted(
                        ((float(self.v[x] @ self.v[e]), x) for x in nb),
                        reverse=True)
                    nb = self._diverse(e, scored, cap)
                self.nbrs[e][lvl] = nb
            eps = [n for _, n in cands]
        if level > self.max_level:
            self.max_level = level
            self.entry = i

    # -- search -----------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int = HNSW_EF_SEARCH,
               accept: np.ndarray | None = None,
               visited_limit: int | None = None,
               seeds: "list[int] | None" = None,
               patience: "int | None" = None) -> list[tuple[float, int]]:
        """Top-k (sim, node). With ``accept`` only accepted nodes are
        collected; if the traversal visits more nodes than
        ``visited_limit`` the caller should fall back to an exact scan
        (`AbstractKnnVectorQuery` semantics) — here the fallback runs
        inline for simplicity: a None return never happens, the scan is
        cheap relative to the wasted traversal it replaces.

        ``seeds``: SeededKnnVectorQuery entry points
        (search/SeededKnnVectorQuery.java:33,
        util/hnsw/SeededHnswGraphSearcher.java:66-69 — the seed
        ordinals REPLACE findBestEntryPoint, so the upper-layer
        descent is skipped and the layer-0 beam starts at the seeds)."""
        if self.entry < 0:
            return []

        def entry_points(counter=None) -> list[int]:
            if seeds:
                return [int(s) for s in seeds]
            eps = [self.entry]
            for lvl in range(self.max_level, 0, -1):
                eps = [self._search_layer(q, eps, 1, lvl,
                                          counter=counter)[0][1]]
            return eps

        if accept is not None:
            n_acc = int(accept.sum())
            if n_acc == 0:
                return []
            lim = visited_limit if visited_limit is not None else n_acc
            if n_acc <= max(ef, 2 * k):
                return self._exact(q, k, accept)
            counter = [0]
            eps = entry_points(counter)
            out = self._search_layer(q, eps, max(ef, k), 0,
                                     accept=accept, counter=counter)
            if counter[0] > lim or len(out) < min(k, n_acc):
                return self._exact(q, k, accept)
            out.sort(key=lambda x: (-x[0], x[1]))
            return out[:k]
        out = self._search_layer(q, entry_points(), max(ef, k), 0,
                                 patience=patience)
        out.sort(key=lambda x: (-x[0], x[1]))   # sim desc, node asc ties
        return out[:k]

    def search_similarity(self, q: np.ndarray, traversal_sim: float,
                          result_sim: float) -> list[tuple[float, int]]:
        """VectorSimilarityQuery (core/search/
        AbstractVectorSimilarityQuery.java:38 +
        VectorSimilarityCollector): collect EVERY node scoring >=
        ``result_sim``; the layer-0 frontier keeps expanding while a
        candidate scores >= ``traversal_sim`` (the lower bound), so the
        whole above-threshold region is walked rather than a top-k
        beam.  Returns (sim, node) sorted (sim desc, node asc)."""
        import heapq

        if self.entry < 0:
            return []
        eps = [self.entry]
        for lvl in range(self.max_level, 0, -1):
            eps = [self._search_layer(q, eps, 1, lvl)[0][1]]
        visited = set(eps)
        cand = [(-float(self.v[e] @ q), e) for e in eps]
        heapq.heapify(cand)
        out = []
        while cand:
            negs, c = heapq.heappop(cand)
            s = -negs
            if s >= result_sim:
                out.append((s, c))
            if s < traversal_sim and out:
                # the entry itself always expands; past it, frontier
                # nodes below the traversal bound stop the walk there
                continue
            new = [e for e in self.nbrs[c][0] if e not in visited]
            if not new:
                continue
            visited.update(new)
            sims = self.v[new] @ q
            for e, sv in zip(new, sims):
                heapq.heappush(cand, (-float(sv), e))
        out.sort(key=lambda x: (-x[0], x[1]))
        return out

    def _exact(self, q: np.ndarray, k: int,
               accept: np.ndarray) -> list[tuple[float, int]]:
        """Exact scan over accepted rows (KnnVectorQuery exactSearch)."""
        idx = np.flatnonzero(accept)
        sims = self.v[idx] @ q
        order = np.lexsort((idx, -sims))[:k]
        return [(float(sims[o]), int(idx[o])) for o in order]

    # -- (de)serialization ------------------------------------------------

    def to_arrays(self) -> dict[str, np.ndarray]:
        """Flatten adjacency for npz storage: one slot per (node, level)
        in node-major order, ``slot_off[i]`` = first slot of node i,
        ``nbr_off[s]``/``nbr_flat`` the CSR edges of slot s."""
        n = len(self.v)
        levels = np.array(self.levels, np.int32)
        slot_off = np.zeros(n + 1, np.int64)
        np.cumsum(levels + 1, out=slot_off[1:])
        flat, off = [], [0]
        for i in range(n):
            for lvl in range(levels[i] + 1):
                nb = np.asarray(self.nbrs[i][lvl], np.int32)
                flat.append(nb)
                off.append(off[-1] + len(nb))
        return {
            "levels": levels,
            "slot_off": slot_off,
            "nbr_off": np.array(off, np.int64),
            "nbr_flat": (np.concatenate(flat).astype(np.int32)
                         if flat else np.empty(0, np.int32)),
            "entry": np.array([self.entry, self.max_level], np.int64),
        }

    @classmethod
    def from_arrays(cls, vectors: np.ndarray, arrs) -> "HnswGraph":
        g = cls.__new__(cls)
        g.v = vectors
        g.m = HNSW_M
        g.efc = HNSW_EF_CONSTRUCTION
        g.m_l = 1.0 / np.log(g.m)
        levels = arrs["levels"]
        g.levels = levels.tolist()
        g.entry = int(arrs["entry"][0])
        g.max_level = int(arrs["entry"][1])
        slot_off = arrs["slot_off"]
        nbr_off = arrs["nbr_off"]
        flat = arrs["nbr_flat"]
        g.nbrs = [
            [flat[nbr_off[s]:nbr_off[s + 1]]
             for s in range(int(slot_off[i]), int(slot_off[i + 1]))]
            for i in range(len(levels))]
        return g


# ---------------------------------------------------------------------------
# persisted index: build once, search many


def build_vector_index(emb_path: str, out_dir: str,
                       shard_size: int = VEC_SHARD_SIZE,
                       metadata_cols: tuple[str, ...] = ("label",),
                       m: int = HNSW_M,
                       ef_construction: int = HNSW_EF_CONSTRUCTION) -> str:
    """Build the persisted per-shard HNSW index with one Ray Data pass.

    Each ``map_batches`` task gets one shard of ``shard_size`` vectors,
    builds its graph and writes ``shard_<uuid>.npz`` into ``out_dir``
    (two-phase: ``.tmp`` then rename); only (path, n) rows reach the
    driver, which then commits ``manifest.json`` — the segments_N role.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    schema = pq.ParquetFile(emb_path).schema_arrow
    meta_cols = tuple(c for c in metadata_cols if c in schema.names)
    dim = None

    def build_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).copy()
        order = np.argsort(ids)
        ids = ids[order]
        emb = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False))[order].astype(np.float64)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        g = HnswGraph(emb, m=m, ef_construction=ef_construction,
                      node_ids=ids)
        arrs = g.to_arrays()
        arrs["ids"] = ids.astype(np.int64)
        # int8 scalar quantization (Lucene99ScalarQuantizedVectorsFormat
        # .java:34): per-shard [min, max] range, q = round((v-min)/scale)
        # - 128. The quantized member is the only vector data the first
        # search pass reads (4-8x less IO); exact rescoring gathers rows
        # from the mmapped full-precision sibling file.
        lo = float(emb.min()) if emb.size else 0.0
        hi = float(emb.max()) if emb.size else 1.0
        scale = (hi - lo) / 255.0 or 1.0
        arrs["qvecs"] = (np.round((emb - lo) / scale) - 128).astype(np.int8)
        arrs["qparams"] = np.array([lo, scale], np.float64)
        for c in meta_cols:
            arrs[f"meta_{c}"] = batch.column(c).to_numpy(
                zero_copy_only=False)[order]
        path = os.path.join(out_dir, f"shard_{uuid.uuid4().hex}.npz")
        # full-precision vectors live in a sibling .npy: np.load with
        # mmap_mode slices ROWS without reading the file (the rescore /
        # graph-search access pattern); the npz holds everything else
        with open(path + ".vecs.tmp", "wb") as f:
            np.save(f, emb)
        os.replace(path + ".vecs.tmp", path + ".vecs.npy")
        with open(path + ".tmp", "wb") as f:
            np.savez(f, **arrs)
        os.replace(path + ".tmp", path)
        return pa.table({"path": pa.array([os.path.basename(path)]),
                         "n": pa.array([len(ids)], pa.int64()),
                         "dim": pa.array([emb.shape[1]], pa.int64())})

    rows = (ray.data.read_parquet(
                emb_path, columns=["vec_id", "embedding", *meta_cols])
            .map_batches(build_shard, batch_format="pyarrow",
                         batch_size=shard_size)
            .take_all())                      # one tiny row per shard
    shards = sorted((r["path"], int(r["n"])) for r in rows)
    dim = int(rows[0]["dim"]) if rows else 0
    manifest = {
        "shards": [{"path": p, "n": n} for p, n in shards],
        "dim": dim, "m": m, "ef_construction": ef_construction,
        "metadata_cols": list(meta_cols),
        "n_vectors": sum(n for _, n in shards),
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return out_dir


_VEC_CACHE: dict[str, str] = {}


def vector_index_for(sf_dir: str, shard_size: int = VEC_SHARD_SIZE) -> str:
    """Build (once, cached under /tmp) the vector index for an sf dir."""
    sf_dir = os.path.abspath(sf_dir)
    key = f"{sf_dir}:{shard_size}"
    if key in _VEC_CACHE:
        return _VEC_CACHE[key]
    emb = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha256(
        f"{emb}:{os.path.getsize(emb)}:{shard_size}:vec-v2".encode()
    ).hexdigest()[:12]
    idx = os.path.join("/tmp", "lucene_ray_indexes", "vec_" + tag)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        build_vector_index(emb, idx, shard_size=shard_size)
    _VEC_CACHE[key] = idx
    return idx


def load_shard(index_dir: str, shard: str):
    """(ids, HnswGraph, {meta_col: ndarray}) for one shard file. The
    full-precision vectors are MEMORY-MAPPED — graph search touches only
    the rows it visits."""
    z = np.load(os.path.join(index_dir, shard))
    vecs = np.load(os.path.join(index_dir, shard + ".vecs.npy"),
                   mmap_mode="r")
    g = HnswGraph.from_arrays(vecs, z)
    meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    return z["ids"], g, meta


def load_shard_quantized(index_dir: str, shard: str):
    """(ids, qvecs int8, lo, scale) — the quantized first-pass payload;
    the full-precision member is NOT read."""
    z = np.load(os.path.join(index_dir, shard))
    lo, scale = z["qparams"]
    return z["ids"], z["qvecs"], float(lo), float(scale)


def _searcher_pool_size(n_shards: int) -> int:
    """Shard-searcher pool size: one actor per shard up to the CPU
    budget (never more actors than inputs — a 1-shard index gets one
    searcher; a 32-shard index on a 32-CPU node gets 32)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(1, min(n_shards, cpus))


class ShardSearcher:
    """Actor-pool stage over shard-path rows: the per-leaf kNN searcher.

    Query matrix ships once per actor (``__init__``); shards load once
    per actor into a cache keyed by path (``__call__`` only searches).
    With ``filter_labels`` (per-query metadata value), each query is
    restricted to shard rows whose ``filter_col`` equals its label —
    the KnnFloatVectorQuery pre-filter contract."""

    def __init__(self, index_dir: str, qref, k: int, ef: int,
                 filter_col: str | None = None, filter_labels=None,
                 seed_col: str | None = None, seed_labels=None):
        import ray

        self.index_dir = index_dir
        self.q = ray.get(qref)            # (Q, d) unit rows
        self.k = k
        self.ef = ef
        self.filter_col = filter_col
        self.filter_labels = filter_labels
        self.seed_col = seed_col
        self.seed_labels = seed_labels
        self._cache: dict[str, tuple] = {}

    def _shard(self, path: str):
        if path not in self._cache:
            self._cache[path] = load_shard(self.index_dir, path)
        return self._cache[path]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_v, out_s = [], [], []
        for path in batch.column("path").to_pylist():
            ids, g, meta = self._shard(path)
            for j in range(len(self.q)):
                accept = None
                if self.filter_col is not None:
                    accept = (meta[self.filter_col]
                              == self.filter_labels[j])
                seeds = None
                if self.seed_col is not None:
                    # SeededKnnVectorQuery: the seed query's matching
                    # ordinals in THIS leaf become the entry points; a
                    # leaf without seed hits searches normally
                    s = np.flatnonzero(
                        meta[self.seed_col] == self.seed_labels[j])
                    seeds = s.tolist() or None
                hits = g.search(self.q[j], self.k, self.ef,
                                accept=accept, seeds=seeds)
                for s, node in hits:
                    out_q.append(j)
                    out_v.append(int(ids[node]))
                    out_s.append(float(s))
        return pa.table({"qj": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


class QuantizedShardSearcher:
    """Two-phase quantized kNN per shard (the Lucene99 quantized search
    model): phase 1 ranks by the int8-dequantized dot product reading
    ONLY the quantized member; phase 2 exactly rescores the top
    ``oversample × k`` candidates by gathering just those rows from the
    mmapped full-precision file."""

    def __init__(self, index_dir: str, qref, k: int, oversample: int = 4):
        import ray

        self.index_dir = index_dir
        self.q = ray.get(qref)
        self.k = k
        self.m = max(k * oversample, k)
        self._cache: dict[str, tuple] = {}

    def _shard(self, path: str):
        if path not in self._cache:
            ids, qv, lo, scale = load_shard_quantized(self.index_dir, path)
            # dequantize once per actor into float32 (half the footprint
            # of the stored float64; the DISK read was int8)
            deq = (qv.astype(np.float32) + np.float32(128.0)) \
                * np.float32(scale) + np.float32(lo)
            full = np.load(os.path.join(self.index_dir, path + ".vecs.npy"),
                           mmap_mode="r")
            self._cache[path] = (ids, deq, full)
        return self._cache[path]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_v, out_s = [], [], []
        for path in batch.column("path").to_pylist():
            ids, deq, full = self._shard(path)
            approx = deq @ self.q.T.astype(np.float32)   # (n, Q)
            for j in range(len(self.q)):
                cand = np.argpartition(-approx[:, j],
                                       min(self.m, len(ids) - 1))[:self.m] \
                    if len(ids) > self.m else np.arange(len(ids))
                exact = np.asarray(full[np.sort(cand)]) @ self.q[j]
                cs = np.sort(cand)
                sel = np.lexsort((ids[cs], -exact))[:self.k]
                out_q.extend([j] * len(sel))
                out_v.extend(ids[cs[sel]].tolist())
                out_s.extend(exact[sel].tolist())
        return pa.table({"qj": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


def search_index_quantized(index_dir: str, qn: np.ndarray, k: int,
                           oversample: int = 4
                           ) -> list[list[tuple[float, int]]]:
    """Distributed quantized search: same shard fan-out / bounded merge
    as :func:`search_index` but through the int8 first pass."""
    import ray
    import ray.data

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    shard_paths = [s["path"] for s in manifest["shards"]]
    qref = ray.put(qn)
    parts = (ray.data.from_items([{"path": p} for p in shard_paths])
             .map_batches(QuantizedShardSearcher, batch_format="pyarrow",
                          batch_size=1,
                          concurrency=_searcher_pool_size(len(shard_paths)),
                          fn_constructor_args=(index_dir, qref, k,
                                               oversample))
             .take_all())
    out: list[list[tuple[float, int]]] = [[] for _ in range(len(qn))]
    for r in parts:
        out[r["qj"]].append((r["sim"], r["vec_id"]))
    for j in range(len(qn)):
        out[j].sort(key=lambda x: (-x[0], x[1]))
        out[j] = out[j][:k]
    return out


def search_index(index_dir: str, qn: np.ndarray, k: int,
                 ef: int = HNSW_EF_SEARCH, filter_col: str | None = None,
                 filter_labels=None, seed_col: str | None = None,
                 seed_labels=None) -> list[list[tuple[float, int]]]:
    """Distributed search of a persisted index: shard paths fan out to a
    `ShardSearcher` pool, per-shard partial top-k merge on the driver
    (≤ shards × k rows — bounded, the TopDocs.merge role). Returns one
    (sim, vec_id) list per query row."""
    import ray
    import ray.data

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    shard_paths = [s["path"] for s in manifest["shards"]]
    qref = ray.put(qn)
    parts = (ray.data.from_items([{"path": p} for p in shard_paths])
             .map_batches(ShardSearcher, batch_format="pyarrow",
                          batch_size=1,
                          concurrency=_searcher_pool_size(len(shard_paths)),
                          fn_constructor_args=(index_dir, qref, k, ef,
                                               filter_col, filter_labels,
                                               seed_col, seed_labels))
             .take_all())
    out: list[list[tuple[float, int]]] = [[] for _ in range(len(qn))]
    for r in parts:
        out[r["qj"]].append((r["sim"], r["vec_id"]))
    for j in range(len(qn)):
        out[j].sort(key=lambda x: (-x[0], x[1]))
        out[j] = out[j][:k]
    return out
