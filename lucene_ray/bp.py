"""BP (bisection-partitioning) doc reordering — the BPIndexReorderer
role (misc/index/BPIndexReorderer.java:94).

Recursive graph bisection (Dhulipala, Kabiljo, Karrer, Ottaviano,
Pupyrev, Shalita — "Compressing Graphs and Indexes with Recursive Graph
Bisection", KDD'16): permute documents so docs sharing terms receive
nearby docIDs. Doc-delta gaps shrink, so the FOR/PFoR postings blocks
compress better AND per-block doc ranges tighten, which sharpens the
block-max frontiers the pruned searcher skips on.

The reference runs the reorder over a whole (merged) segment with a
ForkJoin pool; here the permutation is computed per segment INSIDE the
build task (bounded memory, embarrassingly parallel across segments —
the analogue of wrapping the merge policy with the reorderer), fully
vectorized:

* one bisection level holds the doc set split into fixed halves; up to
  ``max_iters`` rounds compute, per document, the MOVE GAIN of sending
  it to the other half (the paper's Σ_t ΔlogGap estimate with the
  reference's ``d·log2(n/(d+1))`` per-term cost) and swap the highest
  positive-gain pairs;
* gains reduce per doc with ``np.add.reduceat`` over a CSR doc→term
  layout built once per partition — no Python loop over docs or terms;
* terms outside [min_df, max_df_frac·n_docs] are skipped, as the
  reference skips postings that cannot influence adjacent-gap cost
  (BPIndexReorderer minDocFreq/maxDocFreq).

Determinism: stable argsorts keyed on (gain, position) only — repeated
builds of the same corpus produce the identical permutation.
"""

from __future__ import annotations

import numpy as np


def _gap_cost(deg: np.ndarray, n: int) -> np.ndarray:
    """Expected encoded size of a term's postings restricted to one half:
    deg occurrences with average gap n/(deg+1) → deg·log2(n/(deg+1))
    (the reference's cost model). deg <= 0 costs 0 (a removal probe can
    pass deg-1 = -1 for terms absent from the side; their pairs belong
    to the other side and the caller discards those rows)."""
    d = np.maximum(deg, 0)
    return d * np.log2(n / (d + 1.0))


def bp_permutation(pair_owners: np.ndarray, pair_terms: np.ndarray,
                   n_docs: int, *, min_partition_size: int = 32,
                   max_iters: int = 20, min_df: int = 2,
                   max_df_frac: float = 0.5) -> np.ndarray:
    """Compute the BP doc permutation. ``pair_owners``/``pair_terms`` are
    the unique (term, doc) incidence pairs (any order); returns ``perm``
    such that new position i holds old doc index ``perm[i]``."""
    perm = np.arange(n_docs, dtype=np.int64)
    if n_docs <= min_partition_size or len(pair_owners) == 0:
        return perm
    owners = np.asarray(pair_owners, dtype=np.int64)
    terms = np.asarray(pair_terms, dtype=np.int64)
    # df filter once, on the global pair set
    df = np.bincount(terms)
    keep = (df[terms] >= min_df) & (df[terms] <= max_df_frac * n_docs)
    owners, terms = owners[keep], terms[keep]
    if len(owners) == 0:
        return perm
    # CSR doc → terms
    srt = np.argsort(owners, kind="stable")
    owners, terms = owners[srt], terms[srt]
    doc_ptr = np.concatenate(
        [[0], np.cumsum(np.bincount(owners, minlength=n_docs))]
    ).astype(np.int64)

    stack = [(0, n_docs)]
    while stack:
        lo, hi = stack.pop()
        size = hi - lo
        if size <= min_partition_size:
            continue
        mid = lo + size // 2
        # partition-local CSR gather, built once: pairs of order[lo:hi]
        docs = perm[lo:hi]
        counts = doc_ptr[docs + 1] - doc_ptr[docs]
        total = int(counts.sum())
        if total == 0:
            stack.append((lo, mid))
            stack.append((mid, hi))
            continue
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        gather = np.repeat(doc_ptr[docs] - starts, counts) \
            + np.arange(total, dtype=np.int64)
        tloc = np.unique(terms[gather], return_inverse=True)[1]
        bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        n_terms_loc = int(tloc.max()) + 1 if total else 0
        # side per local doc: first half LEFT(False), second RIGHT(True)
        side = np.zeros(size, dtype=bool)
        side[mid - lo:] = True
        n1, n2 = mid - lo, size - (mid - lo)
        pair_doc = np.repeat(np.arange(size, dtype=np.int64), counts)
        # per-doc reduceat runs over NON-EMPTY docs only: a zero-length
        # doc's offset can equal total (reduceat rejects it) and naive
        # clipping would also truncate the PREVIOUS doc's segment —
        # consecutive non-empty starts span the empty gaps exactly, so
        # scattering the reduced sums back is lossless
        empty = bounds[:-1] == bounds[1:]
        nz = np.flatnonzero(~empty)
        red_at = bounds[:-1][nz]
        for _ in range(max_iters):
            pside = side[pair_doc]
            d1 = np.bincount(tloc[~pside], minlength=n_terms_loc)
            d2 = np.bincount(tloc[pside], minlength=n_terms_loc)
            # per-term: gain of removing one occurrence from a side,
            # cost of adding one to the other
            rem1 = _gap_cost(d1, n1) - _gap_cost(d1 - 1, n1)
            ins2 = _gap_cost(d2 + 1, n2) - _gap_cost(d2, n2)
            rem2 = _gap_cost(d2, n2) - _gap_cost(d2 - 1, n2)
            ins1 = _gap_cost(d1 + 1, n1) - _gap_cost(d1, n1)
            g12 = np.zeros(size)                   # term-less docs: 0
            g21 = np.zeros(size)
            g12[nz] = np.add.reduceat(rem1[tloc] - ins2[tloc], red_at)
            g21[nz] = np.add.reduceat(rem2[tloc] - ins1[tloc], red_at)
            gain = np.where(side, g21, g12)
            left = np.flatnonzero(~side)
            right = np.flatnonzero(side)
            lo_by_gain = left[np.argsort(-gain[left], kind="stable")]
            hi_by_gain = right[np.argsort(-gain[right], kind="stable")]
            m = min(len(lo_by_gain), len(hi_by_gain))
            pos = gain[lo_by_gain[:m]] + gain[hi_by_gain[:m]] > 1e-9
            k = int(np.argmin(pos)) if not pos.all() else m
            if k == 0:
                break
            side[lo_by_gain[:k]] = True
            side[hi_by_gain[:k]] = False
        # stable regroup: left docs keep relative order, then right docs
        new_local = np.concatenate(
            [np.flatnonzero(~side), np.flatnonzero(side)])
        perm[lo:hi] = docs[new_local]
        stack.append((lo, mid))
        stack.append((mid, hi))
    return perm


def log_gap_cost(pair_terms: np.ndarray, pair_owners: np.ndarray,
                 doc_positions: np.ndarray) -> float:
    """The paper's objective: Σ over terms of Σ log2(gap+1) between
    consecutive doc positions of that term, for A/B measurement."""
    terms = np.asarray(pair_terms, dtype=np.int64)
    pos = np.asarray(doc_positions, dtype=np.int64)[
        np.asarray(pair_owners, dtype=np.int64)]
    srt = np.lexsort((pos, terms))
    t, p = terms[srt], pos[srt]
    gaps = np.diff(p).astype(np.float64)
    same = np.diff(t) == 0
    first = np.concatenate([[True], ~same])
    g = np.where(first[1:], p[1:].astype(np.float64), gaps)
    head = float(np.log2(p[0] + 1.0)) if len(p) else 0.0
    return head + float(np.log2(g + 1.0).sum())


def bp_vector_permutation(vectors: np.ndarray, score: str = "euclidean",
                          min_partition_size: int = 32,
                          max_iters: int = 20) -> np.ndarray:
    """Vector-locality BP — the BpVectorReorderer role
    (misc/index/BpVectorReorderer.java:55): recursively bisect the doc
    set so each half sits closer to its own centroid, giving similar
    vectors nearby positions (tighter flat-scan/IVF-list locality).

    Per level (ReorderTask.compute, :198-255): ids sort at entry; the
    halves' centroids are the mean (euclidean / max-inner-product) or
    the normalized sum (cosine / dot, :270-283); each round computes
    per-vector biases — d²(v,left)−d²(v,right) for euclidean,
    dot(v,right)−dot(v,left) otherwise (:computeBias) — stops when
    500·(maxLeftBias − minRightBias) <= |leftCentroid − rightCentroid|
    (:328-336) or when no vector crosses sides, and repartitions by
    (bias, id) around the midpoint (the IntroSelector with the id tie
    break, :340-…); centroids fully recompute each round
    (MAX_CENTROID_UPDATES = 0).  Deterministic: lexsort on (bias, id).

    Returns the permutation ``perm`` with ``perm[new_pos] = old_id``.
    """
    v = np.ascontiguousarray(np.asarray(vectors, dtype=np.float32))
    n = v.shape[0]
    if n == 0:
        return np.empty(0, np.int64)

    def centroid(idx: np.ndarray) -> np.ndarray:
        c = v[idx].sum(axis=0, dtype=np.float32)
        if score in ("euclidean", "mip"):
            return (c / np.float32(len(idx))).astype(np.float32)
        nrm = np.float32(np.sqrt(np.dot(c, c)))
        return (c / nrm).astype(np.float32) if nrm > 0 else c

    def biases(idx: np.ndarray, lc, rc) -> np.ndarray:
        if score == "euclidean":
            dl = ((v[idx] - lc) ** 2).sum(axis=1)
            dr = ((v[idx] - rc) ** 2).sum(axis=1)
            return (dl - dr).astype(np.float32)
        return (v[idx] @ rc - v[idx] @ lc).astype(np.float32)

    def recurse(seg: np.ndarray) -> np.ndarray:
        seg = np.sort(seg)
        half = len(seg) >> 1
        if half < min_partition_size:
            return seg
        cur = seg
        lc, rc = centroid(cur[:half]), centroid(cur[half:])
        for _ in range(max_iters):
            b = biases(cur, lc, rc)
            diff = lc.astype(np.float64) - rc.astype(np.float64)
            scale = float(np.sqrt((diff * diff).sum()))
            gain = float(b[:half].max()) - float(b[half:].min())
            if 500.0 * gain <= scale:
                break
            order = np.lexsort((cur, b))
            new = cur[order]
            moved = half - len(np.intersect1d(cur[:half], new[:half],
                                              assume_unique=True))
            if moved == 0:
                break
            cur = new
            lc, rc = centroid(cur[:half]), centroid(cur[half:])
        return np.concatenate([recurse(cur[:half]), recurse(cur[half:])])

    return recurse(np.arange(n, dtype=np.int64))
