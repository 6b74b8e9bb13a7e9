"""BM25 top-k query engine over the unified term-partitioned index.

Reference semantics reproduced (SURVEY.md §3.2):

- Global stats once per query term: df/ttf summed over all postings rows of
  the term, docCount/sumTTF from the manifest — one SimScorer per term shared
  by every partition (``search/IndexSearcher.java:1125,1140-1155``).
- Multi-term free text parses to BooleanQuery(SHOULD TermQuery…), default OR,
  duplicate terms kept as separate clauses (``demo/SearchFiles.java:108-146``,
  ``queryparser/classic/QueryParserBase.java:84``) — doc score = Σ clause
  scores.
- Exact float32 scoring (bm25.py) and hit ordering score desc, docID asc
  (``search/TopScoreDocCollector.java:26-28``); cross-partition merge keeps
  the same comparator (``search/TopDocs.java:216``).
- **Block-max pruning**: a vectorized MAXSCORE over per-block impact bounds —
  the role of ``search/MaxScoreBulkScorer.java:26`` + ``ImpactsDISI.java:28``.
  Terms are processed in decreasing max-score order; once the running k-th
  best (a lower bound) exceeds the summed max-scores of the remaining terms,
  new docs can no longer enter the top-k, so for the remaining terms only
  blocks that (a) overlap current candidates or (b) have
  ``block_upper_bound + remaining_max ≥ θ`` are decoded. Rank-safe: verified
  exactly equal to the brute-force oracle (CheckHits-style,
  ``test-framework/.../search/CheckHits.java:58``).

The searcher is usable inline (driver) or as a Ray actor pool
(:class:`SearcherActorPool`): each actor memoizes its partitions' sorted term
arrays and decoded hot state — the IndexSearcher/SearcherManager role
(``search/SearcherManager.java:53``).
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import bm25
from .analysis import tokenize
from .codec import decode_block, decode_blocks
from .state.manifest import IndexManifest, load_manifest


@dataclass
class TermPostings:
    """All postings rows of one term (possibly several salt-chunks, doc
    ranges disjoint ascending), block-level."""

    term: str
    df: int
    ttf: int
    first_doc: np.ndarray     # int64 per block
    last_doc: np.ndarray      # int64 per block
    n: np.ndarray             # int32 per block
    docs_enc: list
    tfs_enc: list
    norms_enc: list
    imp_freq: list            # list[np.ndarray]
    imp_norm: list            # list[np.ndarray]
    pos_enc: list             # list[bytes] (empty when positions are off)


class IndexReader:
    """Loads manifest + postings partitions lazily; memoizes per-partition
    sorted term arrays (the BlockTree/FST term index role —
    ``blocktree/Lucene103BlockTreeTermsWriter.java:364`` — replaced by
    binary search over the partition's term-sorted rows)."""

    def __init__(self, index_dir: str,
                 extra_deletes: "np.ndarray | None" = None,
                 at_snapshot: "int | None" = None):
        self.index_dir = index_dir
        snapshot_deletes: "set[str] | None" = None
        if at_snapshot is not None:
            # point-in-time reader: DirectoryReader.open(IndexCommit) role
            # (index/StandardDirectoryReader.java:93) — the snapshotted
            # manifest, with only the tombstones visible at snapshot time
            from .state.snapshots import load_snapshot
            self.manifest, dfiles = load_snapshot(index_dir, at_snapshot)
            snapshot_deletes = set(dfiles)
        else:
            self.manifest = load_manifest(index_dir)
        self.doc_count = self.manifest.doc_count
        self.sum_ttf = self.manifest.sum_ttf
        self.T = self.manifest.config["term_parts"]
        self._parts: dict[int, list[pa.Table]] = {}
        self._postings_cache: dict[str, "TermPostings | None"] = {}
        # tbucket → part files, from lineage
        self._files: dict[int, list[str]] = {}
        for p in self.manifest.postings_parts:
            self._files.setdefault(int(p["tbucket"]), []).append(
                os.path.join(index_dir, "postings",
                             f"part={p['part']}.parquet"))
        # live-docs (Lucene90LiveDocsFormat role): union of on-disk
        # tombstone generations + an optional reader-level overlay (the
        # filtered-reader view). Stats (df/docCount/sumTTF) deliberately
        # IGNORE deletions, exactly like Lucene until segments merge;
        # only result doc sets are filtered.
        parts = []
        ddir = os.path.join(index_dir, "deletes")
        if os.path.isdir(ddir):
            for f in sorted(os.listdir(ddir)):
                if snapshot_deletes is not None and f not in snapshot_deletes:
                    continue
                if f.endswith(".parquet"):
                    parts.append(pq.read_table(
                        os.path.join(ddir, f),
                        columns=["doc_id"]).column("doc_id").to_numpy())
        if extra_deletes is not None and len(extra_deletes):
            parts.append(np.asarray(extra_deletes, dtype=np.int64))
        self.deleted: np.ndarray = (
            np.unique(np.concatenate(parts)) if parts
            else np.empty(0, np.int64))
        # the index's analysis chain (EnglishAnalyzer role): query text
        # must pass through the SAME filter the index was built with
        # (Analyzer.normalize / QueryBuilder contract)
        from .analysis_en import get_token_filter
        from .charfilter import get_char_filter
        from .tokenizers import get_tokenizer
        self.token_filter = get_token_filter(
            self.manifest.config.get("analyzer"))
        self.tokenizer = get_tokenizer(
            self.manifest.config.get("analyzer"))
        self.char_filter = get_char_filter(
            self.manifest.config.get("analyzer"))
        # filter doc-set cache (LRUQueryCache role); lives and dies with
        # this reader, which pins one commit
        self.query_cache = QueryCache()
        # bloom term-existence gate (BloomFilteringPostingsFormat role);
        # loaded lazily, ignored unless built for THIS manifest version
        self._bloom = None

    def _bloom_gate(self):
        if self._bloom is None:
            from .bloom import BloomGate
            self._bloom = BloomGate(self.index_dir, self.manifest.version)
        return self._bloom if self._bloom.loaded else None

    def analyze(self, text: str) -> list[str]:
        """Tokenize query text with this index's full analysis chain
        (tokenizer + token filter; stop words drop out)."""
        if self.char_filter is not None:
            text = self.char_filter(text)[0]
        toks = (self.tokenizer(text) if self.tokenizer is not None
                else tokenize(text))
        if self.token_filter is None:
            return toks
        return [m for m in self.token_filter(toks) if m is not None]

    def analyze_phrase(self, text: str) -> tuple[list[str], list[int]]:
        """(terms, positions) of the analyzed stream — stop removal
        leaves position GAPS (StopFilter positionIncrement), and the
        index stores tokens at their gapped positions, so phrase
        matching must use these offsets, not 0..n-1 (QueryBuilder's
        PhraseQuery.add(term, position) contract,
        util/QueryBuilder.java:540)."""
        if self.char_filter is not None:
            text = self.char_filter(text)[0]
        toks = (self.tokenizer(text) if self.tokenizer is not None
                else tokenize(text))
        if self.token_filter is None:
            return toks, list(range(len(toks)))
        terms, offs = [], []
        for i, m in enumerate(self.token_filter(toks)):
            if m is not None:
                terms.append(m)
                offs.append(i)
        return terms, offs

    def live_mask(self, docs: np.ndarray) -> "np.ndarray | None":
        """Boolean live-docs mask for a doc array (None = no deletes)."""
        if len(self.deleted) == 0 or len(docs) == 0:
            return None
        pos = np.minimum(np.searchsorted(self.deleted, docs),
                         len(self.deleted) - 1)
        return self.deleted[pos] != docs

    # partitions smaller than this are cached whole; larger ones are read
    # with parquet row-group predicate pushdown per term lookup (the
    # BlockTree "seek" instead of a full dictionary load)
    LAZY_BYTES = 256 * 1024 * 1024

    def _load_bucket(self, tb: int) -> list[pa.Table]:
        if tb not in self._parts:
            tables = []
            for f in sorted(self._files.get(tb, [])):
                if os.path.getsize(f) <= self.LAZY_BYTES:
                    tables.append(pq.read_table(f))
                else:
                    tables.append(f)          # lazy: filtered read per term
            self._parts[tb] = tables
        return self._parts[tb]

    def postings(self, term: str) -> TermPostings | None:
        if term in self._postings_cache:
            return self._postings_cache[term]
        out = self._postings_uncached(term)
        if len(self._postings_cache) < 10_000:      # bounded memo
            self._postings_cache[term] = out
        return out

    def df(self, term: str) -> int:
        """Document frequency only — the term-dictionary stats lookup
        (blocktree per-term stats, ...TermsWriter.java:800) without
        materializing encoded postings."""
        tb = zlib.crc32(term.encode()) % self.T
        g = self._bloom_gate()
        if g is not None and not g.maybe_contains(tb, term):
            return 0                     # bloom NO is exact
        df = 0
        for tbl in self._load_bucket(tb):
            if isinstance(tbl, str):
                t = pq.read_table(tbl, columns=["term", "n"],
                                  filters=[("term", "==", term)])
                df += int(pc.sum(t.column("n")).as_py() or 0)
                continue
            arr = tbl.column("term").combine_chunks()
            lo = _bisect_term(arr, term, side="left")
            hi = _bisect_term(arr, term, side="right")
            if hi > lo:
                df += int(pc.sum(
                    tbl.column("n").slice(lo, hi - lo)).as_py())
        return df

    def term_vector(self, doc_id: int) -> tuple[list[str], np.ndarray]:
        """Forward-index lookup: the doc's (terms, tfs) term vector from
        docmeta (TermVectorsReader role). Requires an index built with
        ``with_term_vectors=True``; the bucket file is located via the
        manifest's docID bases and read with a predicate-pushdown filter
        (row-group pruning), O(doc) not O(vocabulary)."""
        bases = np.asarray(self.manifest.bases, dtype=np.int64)
        seg = int(np.searchsorted(bases, doc_id, side="right") - 1)
        path = os.path.join(self.index_dir, "docmeta",
                            f"bucket={seg:05d}.parquet")
        t = pq.read_table(path, filters=[("doc_id", "==", doc_id)])
        if "tv_terms" not in t.column_names:
            raise ValueError("index was built without term vectors "
                             "(with_term_vectors=True)")
        if t.num_rows == 0:
            raise KeyError(f"doc_id {doc_id} not found")
        terms = t.column("tv_terms")[0].as_py()
        tfs = np.asarray(t.column("tv_tfs")[0].as_py(), dtype=np.int64)
        return terms, tfs

    def _postings_uncached(self, term: str) -> TermPostings | None:
        tb = zlib.crc32(term.encode()) % self.T
        g = self._bloom_gate()
        if g is not None and not g.maybe_contains(tb, term):
            return None                  # bloom NO: zero partition IO
        rows = []
        for tbl in self._load_bucket(tb):
            if isinstance(tbl, str):
                # lazy partition: parquet row-group stats prune to the
                # groups whose [min,max] term range covers the key
                t = pq.read_table(tbl, filters=[("term", "==", term)])
                if t.num_rows:
                    rows.append(t)
                continue
            col = tbl.column("term")
            # binary search over the term-sorted partition
            arr = col.combine_chunks()
            lo = _bisect_term(arr, term, side="left")
            hi = _bisect_term(arr, term, side="right")
            if hi > lo:
                rows.append(tbl.slice(lo, hi - lo))
        if not rows:
            return None
        t = pa.concat_tables(rows)
        t = t.sort_by([("first_doc", "ascending")])
        return TermPostings(
            term=term,
            df=int(pc.sum(t.column("n")).as_py()),
            ttf=int(pc.sum(t.column("tf_sum")).as_py()),
            first_doc=t.column("first_doc").to_numpy(),
            last_doc=t.column("last_doc").to_numpy(),
            n=t.column("n").to_numpy(),
            docs_enc=t.column("docs_enc").to_pylist(),
            tfs_enc=t.column("tfs_enc").to_pylist(),
            norms_enc=t.column("norms_enc").to_pylist(),
            imp_freq=[np.array(x, dtype=np.int32)
                      for x in t.column("imp_freq").to_pylist()],
            imp_norm=[np.frombuffer(x, dtype=np.uint8)
                      for x in t.column("imp_norm").to_pylist()],
            pos_enc=(t.column("pos_enc").to_pylist()
                     if "pos_enc" in t.column_names
                     else [b""] * t.num_rows),
        )


def _bisect_term(arr: pa.Array, term: str, side: str) -> int:
    lo, hi = 0, len(arr)
    while lo < hi:
        mid = (lo + hi) // 2
        v = arr[mid].as_py()
        if v < term or (side == "right" and v == term):
            lo = mid + 1
        else:
            hi = mid
    return lo


# ---------------------------------------------------------------------------
# Scoring

def parse_query(query: str) -> list[str]:
    """Free text → SHOULD TermQuery clauses via the same analyzer; duplicate
    terms stay separate clauses (QueryParser default-OR semantics)."""
    return tokenize(query)


@dataclass
class TopDocs:
    doc_ids: np.ndarray
    scores: np.ndarray        # float32
    total_candidates: int
    blocks_decoded: int = 0
    blocks_total: int = 0


def _topk(docs: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Order score desc, docID asc (TopScoreDocCollector.java:26-28)."""
    if len(docs) == 0:
        return docs.astype(np.int64), scores.astype(np.float32)
    if len(docs) > max(4096, 4 * k):
        # cut to every candidate tied-or-better than the k-th score, then
        # sort only that subset (heap-collector role)
        kth = np.partition(scores, len(scores) - k)[len(scores) - k]
        mask = scores >= kth
        docs, scores = docs[mask], scores[mask]
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return docs[order], scores[order].astype(np.float32)


def merge_topk(parts: list[tuple[np.ndarray, np.ndarray]], k: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """TopDocs.merge comparator: score desc, docID asc
    (search/TopDocs.java:216)."""
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    docs = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    return _topk(docs, scores, k)


def _block_upper_bounds(p: TermPostings, sim: "bm25.SimScorer"
                        ) -> np.ndarray:
    """Per-block max-score bounds from the impact frontiers, vectorized
    across all blocks of the term (MaxScoreCache.computeMaxScore role)."""
    counts = np.array([len(f) for f in p.imp_freq], dtype=np.int64)
    if counts.sum() == 0:
        # no impact metadata → never skip these blocks (conservative)
        return np.full(len(p.n), np.inf, dtype=np.float32)
    freqs = np.concatenate([np.asarray(f, dtype=np.int64)
                            for f in p.imp_freq if len(f)])
    norms = np.concatenate([m for m, f in zip(p.imp_norm, p.imp_freq)
                            if len(f)])
    scores = sim.score(freqs, norms)
    nz = counts > 0
    offs = np.concatenate([[0], np.cumsum(counts[nz])[:-1]])
    # blocks with no impact pairs get +inf (never skipped — conservative)
    ub = np.full(len(p.n), np.inf, dtype=np.float32)
    ub[nz] = np.maximum.reduceat(scores, offs) if len(offs) else 0.0
    return ub


class Scorers:
    """Per-term SimScorers built once per query from global stats."""

    def __init__(self, reader: IndexReader, terms: list[str]):
        self.postings: dict[str, TermPostings | None] = {}
        self.sim: dict[str, bm25.SimScorer] = {}
        for t in terms:
            if t in self.postings:
                continue
            p = reader.postings(t)
            self.postings[t] = p
            if p is not None:
                self.sim[t] = bm25.scorer(p.df, reader.doc_count,
                                          reader.sum_ttf)


def _accumulate(docs: np.ndarray, clause_ids: np.ndarray,
                scores: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Canonical per-doc accumulation: contributions sorted by
    (doc, clause), summed in float64 in that order, cast to float32 once.

    Lucene's disjunction scorers also sum SHOULD clause scores in a double
    and cast to float at collection (e.g. MaxScoreBulkScorer's double
    accumulator); fixing the clause order makes the pruned engine and the
    brute-force oracle bit-identical."""
    if len(docs) == 0:
        return docs.astype(np.int64), scores.astype(np.float32)
    order = np.lexsort((clause_ids, docs))
    docs_s = docs[order]
    scores_s = scores[order].astype(np.float64)
    uniq, inv = np.unique(docs_s, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, scores_s)
    return uniq, acc.astype(np.float32)


def _accumulate_clausewise(parts, max_doc: int
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Dense-array accumulation: float64 adds per doc in ascending clause
    order — bit-identical to :func:`_accumulate`'s (doc, clause) lexsort
    order, without the O(n log n) sort. ``parts`` is [(clause_id, docs,
    scores), ...] with each doc at most once per clause. Wins on heavy
    disjunctions where the contribution count rivals max_doc."""
    acc = np.zeros(max_doc, dtype=np.float64)
    hit = np.zeros(max_doc, dtype=bool)
    for _, d, s in sorted(parts, key=lambda x: x[0]):
        acc[d] += s.astype(np.float64)
        hit[d] = True
    uniq = np.flatnonzero(hit).astype(np.int64)
    return uniq, acc[uniq].astype(np.float32)


def _use_dense(max_doc: int, n_contrib: int) -> bool:
    """Dense pays one O(max_doc) pass; sparse pays O(n log n) sort."""
    return 0 < max_doc <= max(1 << 20, 8 * n_contrib)


def search_bruteforce(reader: IndexReader, query: str, k: int = 10
                      ) -> TopDocs:
    """Brute-force oracle: decode every block of every clause, accumulate
    float32 scores doc-major, full sort — the CheckHits golden path."""
    return search_terms_scored(reader, reader.analyze(query), k)


def search_terms_scored(reader: IndexReader, terms: list[str], k: int = 10
                        ) -> TopDocs:
    """Score a list of SHOULD TermQuery clauses exhaustively — also the
    SCORING_BOOLEAN_REWRITE target of multi-term queries
    (MultiTermQuery.java SCORING_BOOLEAN_REWRITE): each expanded term
    becomes one scored SHOULD clause."""
    if k < 1:
        raise ValueError("k must be >= 1 (TopScoreDocCollector requires "
                         "numHits > 0)")
    sc = Scorers(reader, terms)
    all_docs, all_scores, all_clause = [], [], []
    nblocks = 0
    for ci, t in enumerate(terms):       # duplicates scored per clause
        p = sc.postings.get(t)
        if p is None:
            continue
        sim = sc.sim[t]
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        s = sim.score(tf, nm)
        lm = reader.live_mask(d)
        if lm is not None:
            d, s = d[lm], s[lm]
        all_docs.append(d)
        all_scores.append(s)
        all_clause.append(np.full(len(d), ci, dtype=np.int32))
        nblocks += len(p.n)
    if not all_docs:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0,
                       nblocks, nblocks)
    n_contrib = sum(len(d) for d in all_docs)
    # maxDoc from the data: doc_count understates it after expunge
    # (docIDs are never renumbered)
    maxd = 1 + max((int(d.max()) if len(d) else -1) for d in all_docs)
    if _use_dense(maxd, n_contrib):
        uniq, final = _accumulate_clausewise(
            [(int(c[0]) if len(c) else 0, d, s) for d, s, c in
             zip(all_docs, all_scores, all_clause)], maxd)
    else:
        uniq, final = _accumulate(np.concatenate(all_docs),
                                  np.concatenate(all_clause),
                                  np.concatenate(all_scores))
    d, s = _topk(uniq, final, k)
    return TopDocs(d, s, len(uniq), nblocks, nblocks)


def search_filtered(reader: IndexReader, terms: list[str], k: int = 10, *,
                    filter_must: "list[str] | None" = None,
                    filter_must_not: "list[str] | None" = None) -> TopDocs:
    """BooleanQuery mixing scoring SHOULD clauses with non-scoring
    Occur.FILTER / MUST_NOT clauses (search/BooleanClause.java Occur.FILTER,
    BooleanWeight.java:318 FilterScorer wrap — "like MUST except it
    participates in neither scoring"): the filter restricts the doc set
    and contributes NOTHING to the score; surviving docs score
    bit-identically to the unfiltered disjunction (same clause-order
    float64 accumulation)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # no FILTER clauses → plain disjunction; MUST_NOT-only → exclusion
    # set (search_boolean with no MUST returns the EMPTY set, which
    # would wrongly reject everything here)
    accept = (search_boolean(reader, must=filter_must,
                             must_not=filter_must_not)
              if filter_must else None)
    exclude = (np.unique(np.concatenate(
        [_term_docset(reader, t) for t in filter_must_not]))
        if filter_must_not and not filter_must else None)
    sc = Scorers(reader, terms)
    all_docs, all_scores, all_clause = [], [], []
    for ci, t in enumerate(terms):
        p = sc.postings.get(t)
        if p is None:
            continue
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        s = sc.sim[t].score(tf, nm)
        lm = reader.live_mask(d)
        if lm is not None:
            d, s = d[lm], s[lm]
        if accept is not None:
            keep = np.isin(d, accept, assume_unique=True)
        elif exclude is not None:
            keep = ~np.isin(d, exclude, assume_unique=True)
        else:
            keep = np.ones(len(d), dtype=bool)
        all_docs.append(d[keep])
        all_scores.append(s[keep])
        all_clause.append(np.full(int(keep.sum()), ci, dtype=np.int32))
    if not all_docs:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32),
                       0, 0, 0)
    uniq, final = _accumulate(np.concatenate(all_docs),
                              np.concatenate(all_clause),
                              np.concatenate(all_scores))
    d, s = _topk(uniq, final, k)
    return TopDocs(d, s, len(uniq), 0, 0)


def search_min_should_match(reader: IndexReader, terms: list[str],
                            min_should_match: int, k: int = 10) -> TopDocs:
    """BooleanQuery of SHOULD TermQuery clauses with
    ``setMinimumNumberShouldMatch`` (search/BooleanQuery.java:104): a doc
    qualifies iff at least ``min_should_match`` clauses match it, and the
    score is the sum of ALL matching clause scores — identical
    accumulation to the plain disjunction (the WANDScorer.java:57 pruning
    role; scoring semantics per Boolean2ScorerSupplier's
    MinShouldMatchSumScorer path). Duplicate clauses count separately,
    matching BooleanQuery's clause-list semantics (a doc matching a term
    that appears as two SHOULD clauses contributes two matches and two
    score contributions)."""
    if k < 1:
        raise ValueError("k must be >= 1 (TopScoreDocCollector requires "
                         "numHits > 0)")
    m = int(min_should_match)
    sc = Scorers(reader, terms)
    all_docs, all_scores, all_clause = [], [], []
    nblocks = 0
    for ci, t in enumerate(terms):       # duplicates scored per clause
        p = sc.postings.get(t)
        if p is None:
            continue
        sim = sc.sim[t]
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        s = sim.score(tf, nm)
        lm = reader.live_mask(d)
        if lm is not None:
            d, s = d[lm], s[lm]
        all_docs.append(d)
        all_scores.append(s)
        all_clause.append(np.full(len(d), ci, dtype=np.int32))
        nblocks += len(p.n)
    if not all_docs:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0,
                       nblocks, nblocks)
    docs = np.concatenate(all_docs)
    clause = np.concatenate(all_clause)
    scores = np.concatenate(all_scores)
    order = np.lexsort((clause, docs))
    docs_s = docs[order]
    scores_s = scores[order].astype(np.float64)
    uniq, inv = np.unique(docs_s, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, scores_s)
    # each clause contributes at most one posting per doc → the number of
    # (doc, clause) contributions IS the matched-clause count
    nmatch = np.bincount(inv, minlength=len(uniq))
    keep = nmatch >= m
    d, s = _topk(uniq[keep], acc.astype(np.float32)[keep], k)
    return TopDocs(d, s, int(keep.sum()), nblocks, nblocks)


def doc_field_lens(reader: IndexReader, doc_ids: np.ndarray) -> np.ndarray:
    """Exact numeric docvalue gather (``field_len``) for a sorted candidate
    doc set — the ``NumericDocValues.advanceExact`` role
    (index/NumericDocValues.java): per-doc values fetched from the columnar
    store for exactly the candidate docs. Reads only the docmeta buckets
    that contain candidates, each with a doc_id range predicate
    (row-group pruned), never the whole corpus."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    out = np.zeros(len(ids), dtype=np.int64)
    if len(ids) == 0:
        return out
    bases = np.asarray(reader.manifest.bases, dtype=np.int64)
    seg_of = np.searchsorted(bases, ids, side="right") - 1
    for seg in np.unique(seg_of):
        sel = seg_of == seg
        lo, hi = int(ids[sel].min()), int(ids[sel].max())
        path = os.path.join(reader.index_dir, "docmeta",
                            f"bucket={int(seg):05d}.parquet")
        t = pq.read_table(path, columns=["doc_id", "field_len"],
                          filters=[("doc_id", ">=", lo),
                                   ("doc_id", "<=", hi)])
        d = t.column("doc_id").to_numpy()
        v = t.column("field_len").to_numpy().astype(np.int64)
        order = np.argsort(d, kind="stable")
        d, v = d[order], v[order]
        pos = np.searchsorted(d, ids[sel])
        ok = (pos < len(d))
        pos = np.minimum(pos, max(len(d) - 1, 0))
        hit = ok & (d[pos] == ids[sel])
        res = np.zeros(int(sel.sum()), dtype=np.int64)
        res[hit] = v[pos[hit]]
        out[sel] = res
    return out


def search_covering(reader: IndexReader, terms: list[str], k: int = 10,
                    mod: int = 4, sub: int = 1) -> TopDocs:
    """CoveringQuery (sandbox/search/CoveringQuery.java:51,
    CoveringScorer.java:31): a disjunction whose required number of
    matching clauses is a PER-DOCUMENT long value, not a query constant.
    The values source here is the ``field_len`` numeric docvalue mapped
    through ``(field_len % mod) - sub`` — values < 1 are clamped to 1
    (CoveringScorer.java:135 ``Math.max(1, ...)``); docs without a value
    never match (:138 ``Long.MAX_VALUE``; every doc carries field_len in
    this index, exercised by construction). Score = sum of the matching
    clause scores (CoveringScorer.java:208-214), accumulated float64 in
    (doc, clause) order and cast once, like the plain disjunction."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sc = Scorers(reader, terms)
    all_docs, all_scores, all_clause = [], [], []
    for ci, t in enumerate(terms):
        p = sc.postings.get(t)
        if p is None:
            continue
        sim = sc.sim[t]
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        s = sim.score(tf, nm)
        lm = reader.live_mask(d)
        if lm is not None:
            d, s = d[lm], s[lm]
        all_docs.append(d)
        all_scores.append(s)
        all_clause.append(np.full(len(d), ci, dtype=np.int32))
    if not all_docs:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32),
                       0, 0, 0)
    docs = np.concatenate(all_docs)
    clause = np.concatenate(all_clause)
    scores = np.concatenate(all_scores)
    order = np.lexsort((clause, docs))
    docs_s, scores_s = docs[order], scores[order].astype(np.float64)
    uniq, inv = np.unique(docs_s, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, scores_s)
    nmatch = np.bincount(inv, minlength=len(uniq))
    min_match = np.maximum(1, doc_field_lens(reader, uniq) % mod - sub)
    keep = nmatch >= min_match
    d, s = _topk(uniq[keep], acc.astype(np.float32)[keep], k)
    return TopDocs(d, s, int(keep.sum()), 0, 0)


def parent_blocks(reader: IndexReader, field: str = "repo"
                  ) -> tuple[list, np.ndarray, np.ndarray]:
    """Parent-block table — the QueryBitSetProducer role of the index-time
    block join (join/QueryBitSetProducer.java:35): because the index
    orders docIDs by (repo, path), all children of one parent occupy one
    contiguous docID range. Returns ``(values, first_doc, last_doc)``
    sorted by first_doc; contiguity is verified (the CheckJoinIndex.java:38
    role) so a violated block structure fails loudly instead of joining
    children to the wrong parent. Computed once per reader (the cached
    per-searcher BitSet)."""
    cache = getattr(reader, "_parent_blocks", None)
    if cache is None:
        cache = reader._parent_blocks = {}
    if field in cache:
        return cache[field]
    dm_dir = os.path.join(reader.index_dir, "docmeta")
    tabs = [pq.read_table(os.path.join(dm_dir, f),
                          columns=["doc_id", field])
            for f in sorted(os.listdir(dm_dir)) if f.endswith(".parquet")]
    t = pa.concat_tables(tabs).sort_by([("doc_id", "ascending")])
    docs = t.column("doc_id").to_numpy()
    vals = t.column(field).to_numpy(zero_copy_only=False)
    if len(docs) == 0:
        out = ([], np.empty(0, np.int64), np.empty(0, np.int64))
        cache[field] = out
        return out
    change = np.flatnonzero(vals[1:] != vals[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(docs)]])
    run_vals = vals[starts]
    if len(np.unique(run_vals)) != len(run_vals):
        raise ValueError(
            f"parent field {field!r} is not block-contiguous in docID "
            "order (CheckJoinIndex: parent blocks interleaved)")
    out = (run_vals.tolist(), docs[starts].astype(np.int64),
           docs[ends - 1].astype(np.int64))
    cache[field] = out
    return out


def search_blockjoin_parent(reader: IndexReader, terms: list[str],
                            score_mode: str = "max", k: int = 10,
                            parent_field: str = "repo") -> pa.Table:
    """ToParentBlockJoinQuery (join/ToParentBlockJoinQuery.java:68): the
    child query is a SHOULD disjunction of TermQuery clauses over content;
    each matching child doc's float32 score is aggregated onto its
    enclosing parent block per ScoreMode (BlockJoinScorer.setScoreAndFreq:
    child scores accumulated in a double; Max keeps the max, Total the
    sum, Avg divides by the match count; cast to float once at collect).
    Parents rank score desc, then parent-block order asc — which equals
    parent-value lexicographic order here because docIDs are assigned in
    (repo, path) sort order, so the tie-break is SQL-reproducible.

    Returns a table (parent, score, n_children) of the top-k parents."""
    if score_mode not in ("max", "total", "avg"):
        raise ValueError(f"unsupported ScoreMode {score_mode!r}")
    td = search_terms_scored(reader, terms, k=max(1, reader.doc_count))
    child_docs, child_scores = td.doc_ids, td.scores
    vals, first, last = parent_blocks(reader, parent_field)
    if len(child_docs) == 0 or not vals:
        return pa.table({"parent": pa.array([], pa.string()),
                         "score": pa.array([], pa.float32()),
                         "n_children": pa.array([], pa.int64())})
    pid = np.searchsorted(first, child_docs, side="right") - 1
    if (pid < 0).any() or (child_docs > last[pid]).any():
        raise ValueError("child doc outside every parent block")
    npar = len(vals)
    counts = np.bincount(pid, minlength=npar)
    if score_mode == "max":
        agg = np.full(npar, -np.inf, dtype=np.float32)
        np.maximum.at(agg, pid, child_scores)
        score = agg
    else:
        acc = np.zeros(npar, dtype=np.float64)
        np.add.at(acc, pid, child_scores.astype(np.float64))
        score = (acc / np.maximum(counts, 1) if score_mode == "avg"
                 else acc).astype(np.float32)
    hit = np.flatnonzero(counts > 0)
    hit_vals = np.asarray(vals, dtype=object)[hit].astype(str)
    order = hit[np.lexsort((hit_vals, -score[hit].astype(np.float64)))][:k]
    return pa.table({
        "parent": pa.array([vals[i] for i in order], pa.string()),
        "score": pa.array(score[order], pa.float32()),
        "n_children": pa.array(counts[order].astype(np.int64)),
    })


def search_blockmax(reader: IndexReader, query: str, k: int = 10, *,
                    lo: int | None = None, hi: int | None = None,
                    theta0: float | None = None) -> TopDocs:
    """Block-max MAXSCORE (rank-safe: returns exactly the oracle's top-k).

    ``lo``/``hi`` restrict scoring to docIDs in [lo, hi) — the leaf-slice
    view. ``theta0`` seeds the competitive threshold with an externally
    known score lower bound (cross-slice sharing, the
    search/MaxScoreAccumulator role): docs that cannot strictly beat it
    are never materialized; exact ties survive (eps margin), so the
    global TopDocs.merge tie-break by docID stays correct.
    """
    if k < 1:
        raise ValueError("k must be >= 1 (TopScoreDocCollector requires "
                         "numHits > 0)")
    terms = reader.analyze(query)
    sc = Scorers(reader, terms)
    clauses = [(ci, t, sc.postings[t], sc.sim[t])
               for ci, t in enumerate(terms)
               if sc.postings.get(t) is not None]
    if not clauses:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0, 0, 0)
    t0 = float(theta0) if theta0 is not None else -np.inf

    def range_blocks(p):
        """Block indices overlapping [lo, hi)."""
        nb = len(p.n)
        m = np.ones(nb, dtype=bool)
        if lo is not None:
            m &= p.last_doc >= lo
        if hi is not None:
            m &= p.first_doc < hi
        return m

    def range_filter(d, *arrs):
        if lo is None and hi is None:
            return (d, *arrs)
        m = np.ones(len(d), dtype=bool)
        if lo is not None:
            m &= d >= lo
        if hi is not None:
            m &= d < hi
        return (d[m], *tuple(a[m] for a in arrs))

    ubs: list[np.ndarray] = []
    tmax: list[float] = []
    blocks_total = 0
    for ci, t, p, sim in clauses:
        ub = _block_upper_bounds(p, sim)
        ubs.append(ub)
        tmax.append(float(ub.max()) if len(ub) else 0.0)
        blocks_total += len(p.n)

    order = np.argsort(-np.array(tmax), kind="stable")
    suffix = np.zeros(len(order) + 1, dtype=np.float64)
    for i in range(len(order) - 1, -1, -1):
        suffix[i] = suffix[i + 1] + tmax[order[i]]
    eps = 1e-4  # absolute slack > float32 ulp at score magnitudes

    # raw contributions (for the canonical final sum) + running accumulator
    # (lower bounds, used only for the pruning threshold θ)
    contrib_d: list[np.ndarray] = []
    contrib_c: list[np.ndarray] = []
    contrib_s: list[np.ndarray] = []
    cand_docs = np.empty(0, dtype=np.int64)
    cand_lb = np.empty(0, dtype=np.float64)
    blocks_decoded = 0
    blocks_skipped = 0
    exhaust_rest = False
    for rank, oi in enumerate(order):
        ci, t, p, sim = clauses[oi]
        nb = len(p.n)
        remaining_after = suffix[rank + 1]
        def score_exhaustive(ci=ci, p=p, sim=sim):
            """Plain bulk scoring of one clause — no candidate
            bookkeeping (rank-safe: a superset of the pruned work)."""
            nonlocal blocks_decoded
            rmask = range_blocks(p)
            need = np.flatnonzero(rmask)
            if len(need) == 0:
                return
            d, tf, nm, _ = decode_blocks(
                p.first_doc[need], p.n[need],
                [p.docs_enc[int(b)] for b in need],
                [p.tfs_enc[int(b)] for b in need],
                [p.norms_enc[int(b)] for b in need])
            s = sim.score(tf, nm)
            d, s = range_filter(d, s)
            lm = reader.live_mask(d)
            if lm is not None:
                d, s = d[lm], s[lm]
            if len(d):
                contrib_d.append(d)
                contrib_c.append(np.full(len(d), ci, dtype=np.int32))
                contrib_s.append(s)
            blocks_decoded += len(need)

        if exhaust_rest:
            score_exhaustive()
            continue
        if len(cand_lb) >= k:
            theta = max(t0, float(np.partition(cand_lb, len(cand_lb) - k)[
                len(cand_lb) - k]))
        else:
            theta = t0
        can_skip_new = (suffix[rank] + eps) < theta
        if rank >= 1 and blocks_skipped == 0 and not can_skip_new:
            # cost-based cutover (BooleanScorerSupplier.java:290 role:
            # pick the plain bulk scorer when pruning can't pay): a full
            # clause in with zero skipped blocks and no wholesale skip
            # available now means impacts are flat here — score the rest
            # exhaustively, drop the candidate bookkeeping
            exhaust_rest = True
            score_exhaustive()
            continue
        rmask = range_blocks(p)

        def cand_reachable(blo, bhi):
            """Per block: does some candidate inside its doc range have
            lb + block_ub + remaining ≥ θ? Candidates strictly below
            can't enter the top-k even fully scored (their true final ≤
            lb + ub + remaining < θ − eps ≤ final k-th), so their blocks
            skip — the essential/non-essential list split of
            MaxScoreBulkScorer.java:26 applied per candidate block."""
            has = bhi > blo
            if not np.isfinite(theta) or not has.any():
                return has
            arr = np.concatenate([cand_lb, [-np.inf]])
            nzb = np.flatnonzero(has)
            bounds = np.empty(2 * len(nzb), dtype=np.int64)
            bounds[0::2] = blo[nzb]
            bounds[1::2] = bhi[nzb]
            cmax = np.maximum.reduceat(arr, bounds)[0::2]
            out = np.zeros(len(blo), dtype=bool)
            out[nzb] = (cmax + ubs[oi][nzb].astype(np.float64)
                        + remaining_after + eps) >= theta
            return out

        if can_skip_new:
            blo = np.searchsorted(cand_docs, p.first_doc, side="left")
            bhi = np.searchsorted(cand_docs, p.last_doc, side="right")
            need = np.flatnonzero(cand_reachable(blo, bhi) & rmask)
        elif np.isfinite(theta):
            competitive = (ubs[oi].astype(np.float64)
                           + remaining_after + eps) >= theta
            blo = np.searchsorted(cand_docs, p.first_doc, side="left")
            bhi = np.searchsorted(cand_docs, p.last_doc, side="right")
            need = np.flatnonzero(
                (competitive | cand_reachable(blo, bhi)) & rmask)
        else:
            need = np.flatnonzero(rmask)
        blocks_skipped += int(rmask.sum()) - len(need)
        if len(need) == 0:
            continue
        bdocs, bscores = [], []
        if rank == 0 and len(cand_docs) == 0:
            # First clause: every doc appears in exactly one block of this
            # term, so we can process blocks in decreasing upper-bound
            # order and STOP once the k-th best score found so far beats
            # ub_block + remaining_after — the ImpactsDISI skip of a
            # top-level TermScorer (search/ImpactsDISI.java:67-99).
            order_b = need[np.argsort(-ubs[oi][need], kind="stable")]
            scores_seen = np.empty(0, dtype=np.float32)
            decoded = 0
            CHUNK = 64
            for cs in range(0, len(order_b), CHUNK):
                chunk = order_b[cs:cs + CHUNK]
                th1 = t0
                if len(scores_seen) >= k:
                    th1 = max(th1, float(np.partition(
                        scores_seen, len(scores_seen) - k)[
                        len(scores_seen) - k]))
                if np.isfinite(th1) and (float(ubs[oi][chunk[0]])
                                         + remaining_after + eps < th1):
                    break
                d, tf, nm, _ = decode_blocks(
                    p.first_doc[chunk], p.n[chunk],
                    [p.docs_enc[int(b)] for b in chunk],
                    [p.tfs_enc[int(b)] for b in chunk],
                    [p.norms_enc[int(b)] for b in chunk])
                s = sim.score(tf, nm)
                d, s = range_filter(d, s)
                bdocs.append(d)
                bscores.append(s)
                scores_seen = np.concatenate([scores_seen, s])
                if len(scores_seen) > 64 * k:
                    scores_seen = np.sort(scores_seen)[-k:]
                decoded += len(chunk)
            blocks_decoded += decoded
            blocks_skipped += len(order_b) - decoded
        else:
            d, tf, nm, _ = decode_blocks(
                p.first_doc[need], p.n[need],
                [p.docs_enc[int(b)] for b in need],
                [p.tfs_enc[int(b)] for b in need],
                [p.norms_enc[int(b)] for b in need])
            s = sim.score(tf, nm)
            d, s = range_filter(d, s)
            if can_skip_new and len(d):
                # membership via binary search into the sorted candidates
                pos = np.searchsorted(cand_docs, d)
                pos = np.minimum(pos, len(cand_docs) - 1)
                mask = cand_docs[pos] == d
                d, s = d[mask], s[mask]
            bdocs.append(d)
            bscores.append(s)
            blocks_decoded += len(need)
        nd = np.concatenate(bdocs)
        if len(nd) == 0:
            continue
        ns = np.concatenate(bscores)
        lm = reader.live_mask(nd)
        if lm is not None:
            nd, ns = nd[lm], ns[lm]
            if len(nd) == 0:
                continue
        contrib_d.append(nd)
        contrib_c.append(np.full(len(nd), ci, dtype=np.int32))
        contrib_s.append(ns)
        # update running lower bounds with a sorted merge (each doc
        # appears at most once per clause; a full np.unique re-sort of
        # the candidate array per clause is O(T·N log N) and dominated
        # heavy-query profiles)
        if len(nd) > 1 and not np.all(np.diff(nd) > 0):
            o_nd = np.argsort(nd, kind="stable")   # first-clause UB order
            nd_s, ns_s = nd[o_nd], ns[o_nd]
        else:
            nd_s, ns_s = nd, ns
        if len(cand_docs) == 0:
            cand_docs = nd_s
            cand_lb = ns_s.astype(np.float64)
        else:
            pos = np.minimum(np.searchsorted(cand_docs, nd_s),
                             len(cand_docs) - 1)
            exists = cand_docs[pos] == nd_s
            cand_lb[pos[exists]] += ns_s[exists].astype(np.float64)
            newd = nd_s[~exists]
            if len(newd):
                ins = np.searchsorted(cand_docs, newd)
                cand_docs = np.insert(cand_docs, ins, newd)
                cand_lb = np.insert(cand_lb, ins,
                                    ns_s[~exists].astype(np.float64))

    if not contrib_d:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0,
                       blocks_decoded, blocks_total)
    n_contrib = sum(len(d) for d in contrib_d)
    maxd = 1 + max((int(d.max()) if len(d) else -1) for d in contrib_d)
    if lo is None and hi is None and _use_dense(maxd, n_contrib):
        uniq, final = _accumulate_clausewise(
            [(int(c[0]) if len(c) else 0, d, s) for d, s, c in
             zip(contrib_d, contrib_s, contrib_c)], maxd)
    else:
        uniq, final = _accumulate(np.concatenate(contrib_d),
                                  np.concatenate(contrib_c),
                                  np.concatenate(contrib_s))
    d, s = _topk(uniq, final, k)
    return TopDocs(d, s, len(uniq), blocks_decoded, blocks_total)


# ---------------------------------------------------------------------------
# Actor-pool searcher (query serving / parallel query batches)

class SearcherActor:
    """One searcher actor: holds an IndexReader with memoized term
    dictionaries (state loaded once — the IndexSearcher role)."""

    def __init__(self, index_dir: str):
        self.reader = IndexReader(index_dir)

    def search(self, query: str, k: int = 10, pruned: bool = True) -> dict:
        td = (search_blockmax if pruned else search_bruteforce)(
            self.reader, query, k)
        return {"doc_ids": td.doc_ids.tolist(),
                "scores": [float(s) for s in td.scores],
                "total_candidates": td.total_candidates,
                "blocks_decoded": td.blocks_decoded,
                "blocks_total": td.blocks_total}


def search_query_batch(index_dir: str, queries: list[tuple[str, str, int]],
                       concurrency: int = 4) -> "object":
    """Score a batch of (qid, query, k) with an actor pool via Ray Data —
    one actor per pool slot, reader state loaded once per actor.

    Returns a ray.data.Dataset of (qid, rank, doc_id, score).
    """
    import ray.data

    class QueryRunner:
        def __init__(self):
            self.reader = IndexReader(index_dir)

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids, ranks, docs, scores = [], [], [], []
            for qid, q, k in zip(batch.column("qid").to_pylist(),
                                 batch.column("query").to_pylist(),
                                 batch.column("k").to_pylist()):
                td = search_blockmax(self.reader, q, int(k))
                for r, (d, s) in enumerate(zip(td.doc_ids, td.scores), 1):
                    qids.append(qid)
                    ranks.append(r)
                    docs.append(int(d))
                    scores.append(float(s))
            return pa.table({
                "qid": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float32()),
            })

    qt = ray.data.from_items(
        [{"qid": q[0], "query": q[1], "k": q[2]} for q in queries])
    return qt.map_batches(QueryRunner, batch_format="pyarrow",
                          batch_size=max(1, len(queries) // max(concurrency, 1)),
                          concurrency=concurrency)


# ---------------------------------------------------------------------------
# Boolean doc-set algebra + term dictionary scans (SURVEY.md §2.5/§2.9)

class QueryCache:
    """Filter doc-set cache — the LRUQueryCache
    (search/LRUQueryCache.java:70) + UsageTrackingQueryCachingPolicy
    (search/UsageTrackingQueryCachingPolicy.java:34) roles. Caches the
    materialized doc-set of non-scoring (filter) sub-queries. Admission
    is usage-tracked: a key enters the cache only on its ``min_freq``-th
    sighting (the policy's "don't cache one-off queries"); eviction is
    least-recently-used past ``max_entries``. The cache hangs off ONE
    reader, which pins one commit, so invalidation is by construction —
    reopening after a refresh yields a fresh cache, Lucene's
    per-coreCacheKey segmenting collapsed to the reader level."""

    def __init__(self, max_entries: int = 256, min_freq: int = 2,
                 history: int = 256):
        from collections import OrderedDict, deque

        self.max_entries = max_entries
        self.min_freq = min_freq
        self._data: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        self._recent: "deque[tuple]" = deque(maxlen=history)
        self.hit_count = 0
        self.miss_count = 0
        self.eviction_count = 0

    def get_or_compute(self, key: tuple, supplier) -> np.ndarray:
        if key in self._data:
            self.hit_count += 1
            self._data.move_to_end(key)
            return self._data[key]
        self.miss_count += 1
        val = supplier()
        self._recent.append(key)
        seen = sum(1 for k in self._recent if k == key)
        if seen >= self.min_freq:
            self._data[key] = val
            if len(self._data) > self.max_entries:
                self._data.popitem(last=False)
                self.eviction_count += 1
        return val

    @property
    def cache_count(self) -> int:
        return len(self._data)


def _term_docset(reader: IndexReader, term: str) -> np.ndarray:
    def compute() -> np.ndarray:
        p = reader.postings(term)
        if p is None:
            return np.empty(0, dtype=np.int64)
        d, _, _, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                   p.tfs_enc, p.norms_enc)
        lm = reader.live_mask(d)
        return d if lm is None else d[lm]

    return reader.query_cache.get_or_compute(("term", term), compute)


def search_boolean(reader: IndexReader, must: list[str] | None = None,
                   must_not: list[str] | None = None,
                   should: list[str] | None = None) -> np.ndarray:
    """Boolean doc-set query: MUST=sorted intersection (ConjunctionDISI,
    search/ConjunctionDISI.java:36), MUST_NOT=req-excl
    (search/ReqExclScorer.java:26), SHOULD=union (BooleanScorer.java:31).
    Returns sorted doc ids (constant-score/filter semantics)."""
    acc: np.ndarray | None = None
    for t in must or []:
        ds = _term_docset(reader, t)
        acc = ds if acc is None else np.intersect1d(acc, ds,
                                                    assume_unique=True)
        if len(acc) == 0:
            return acc
    if should:
        un = np.unique(np.concatenate(
            [_term_docset(reader, t) for t in should] or
            [np.empty(0, np.int64)]))
        acc = un if acc is None else np.intersect1d(acc, un,
                                                    assume_unique=True)
    if acc is None:
        acc = np.empty(0, dtype=np.int64)
    for t in must_not or []:
        if len(acc) == 0:
            break
        acc = np.setdiff1d(acc, _term_docset(reader, t), assume_unique=True)
    return acc


def termdict_terms(reader: IndexReader) -> "pa.Table":
    """The unified term dictionary view: (term, df, ttf) over all
    partitions, sorted by term — the BlockTree/FST enumeration role
    (blocktree/SegmentTermsEnum.java)."""
    import pyarrow as _pa
    tbls = []
    for tb in range(reader.T):
        for t in reader._load_bucket(tb):
            tbls.append(t.select(["term", "n", "tf_sum"]))
    if not tbls:
        return _pa.table({"term": _pa.array([], _pa.string()),
                          "df": _pa.array([], _pa.int64()),
                          "ttf": _pa.array([], _pa.int64())})
    allt = _pa.concat_tables(tbls)
    agg = allt.group_by("term").aggregate([("n", "sum"), ("tf_sum", "sum")])
    agg = agg.rename_columns(["term", "df", "ttf"]).sort_by(
        [("term", "ascending")])
    return agg.set_column(1, "df", agg.column("df").cast(_pa.int64()))


def termdict_stats_ds(index_dir: str,
                      exclude_prefixes: list[str] | None = None):
    """Distributed term-dictionary view: Dataset of (term, df, ttf) from
    the postings partitions via groupby(term).sum — the Ray-pipeline
    replacement for driver-side dictionary concatenation (a 100 TB
    index's dictionary does not fit one process). A term's rows live in
    exactly one crc32 bucket but possibly several salt generations, so
    the groupby is required and is the only shuffle."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(os.path.join(index_dir, "postings"),
                               columns=["term", "n", "tf_sum"])
    if exclude_prefixes:
        def flt(t: pa.Table) -> pa.Table:
            mask = None
            for p in exclude_prefixes:
                m = pc.invert(pc.starts_with(t.column("term"), p))
                mask = m if mask is None else pc.and_(mask, m)
            return t.filter(mask)
        ds = ds.map_batches(flt, batch_format="pyarrow")
    return ds.groupby("term").aggregate(Sum("n", alias_name="df"),
                                        Sum("tf_sum", alias_name="ttf"))


def _edit_distance(a: str, b: str, limit: int) -> int:
    """Bounded Levenshtein distance (FuzzyQuery semantics,
    search/FuzzyQuery.java:52 — unicode edit distance, no transpositions
    in the classic metric)."""
    if abs(len(a) - len(b)) > limit:
        return limit + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
            best = min(best, cur[j])
        if best > limit:
            return limit + 1
        prev = cur
    return prev[-1]


def _osa_distance(a: str, b: str, limit: int) -> int:
    """Bounded optimal-string-alignment distance — Levenshtein plus
    single transpositions of ADJACENT chars, each substring edited at
    most once (the transpositions=true Levenshtein automata used by
    FuzzyTermsEnum, util/automaton/LevenshteinAutomata.java:60; full
    Damerau-Levenshtein would allow edits inside a transposed pair and
    rates e.g. ca->abc at 2 where the automaton needs 3)."""
    if abs(len(a) - len(b)) > limit:
        return limit + 1
    prev2: list[int] | None = None
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
            if (prev2 is not None and i > 1 and j > 1
                    and ca == b[j - 2] and a[i - 2] == cb):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
            best = min(best, cur[j])
        if best > limit:
            return limit + 1
        prev2, prev = prev, cur
    return prev[-1]


def _scan_mask(col: pa.Array, *, prefix=None, lo=None, hi=None,
               regex=None, fuzzy=None, terms=None) -> "pa.Array | None":
    """Vectorized term-predicate mask over one partition's term column.

    Regex runs as an anchored Arrow RE2 kernel (pc.match_substring_regex
    — the AutomatonQuery/IntersectTermsEnum role) with a Python fallback
    for non-RE2 syntax; fuzzy prunes by the |len(a)-len(b)| <= d bound
    (vectorized) before running the bounded DP on the survivors only."""
    import pyarrow.compute as _pc
    mask = None
    if terms is not None:                # TermInSetQuery-style exact set
        mask = _pc.is_in(col, value_set=pa.array(list(terms), pa.string()))
    if prefix is not None:
        m = _pc.starts_with(col, prefix)
        mask = m if mask is None else _pc.and_(mask, m)
    if lo is not None:
        m = _pc.greater_equal(col, lo)
        mask = m if mask is None else _pc.and_(mask, m)
    if hi is not None:
        m = _pc.less(col, hi)
        mask = m if mask is None else _pc.and_(mask, m)
    if regex is not None:
        try:
            m = _pc.match_substring_regex(col, f"^(?:{regex})$")
        except pa.ArrowInvalid:          # non-RE2 syntax → Python fallback
            import re as _re
            rx = _re.compile(regex)
            m = pa.array([rx.fullmatch(v) is not None
                          for v in col.to_pylist()])
        mask = m if mask is None else _pc.and_(mask, m)
    if fuzzy is not None:
        q, maxdist = fuzzy
        ln = _pc.utf8_length(col).to_numpy(zero_copy_only=False)
        close = np.abs(ln - len(q)) <= maxdist       # length lower bound
        out = np.zeros(len(col), dtype=bool)
        for i in np.flatnonzero(close):
            out[i] = _edit_distance(q, col[int(i)].as_py(),
                                    maxdist) <= maxdist
        m = pa.array(out)
        mask = m if mask is None else _pc.and_(mask, m)
    return mask


def termdict_scan(reader: IndexReader, *, prefix: str | None = None,
                  lo: str | None = None, hi: str | None = None,
                  regex: str | None = None,
                  fuzzy: tuple[str, int] | None = None,
                  terms: "list[str] | None" = None) -> "pa.Table":
    """PrefixQuery / TermRangeQuery / RegexpQuery / FuzzyQuery rewrite
    support (search/PrefixQuery.java:29, TermRangeQuery.java:37,
    RegexpQuery.java:44, FuzzyQuery.java:52): enumerate matching terms
    with their stats. Predicates are pushed into each term-sorted
    partition (vectorized masks, filter-then-concat) so the full
    dictionary is never materialized on the caller. Dictionaries spread
    over many part files fan out as Ray tasks instead of a serial walk
    (the per-leaf Terms.intersect model)."""
    import pyarrow as _pa
    n_files = sum(len(v) for v in reader._files.values())
    if n_files > 16:
        return termdict_scan_ds(reader.index_dir, prefix=prefix, lo=lo,
                                hi=hi, regex=regex, fuzzy=fuzzy,
                                terms=terms)
    tbls = []
    for tb in range(reader.T):
        for t in reader._load_bucket(tb):
            if isinstance(t, str):       # lazy big partition: stats cols
                t = pq.read_table(t, columns=["term", "n", "tf_sum"])
            else:
                t = t.select(["term", "n", "tf_sum"])
            mask = _scan_mask(t.column("term").combine_chunks(),
                              prefix=prefix, lo=lo, hi=hi, regex=regex,
                              fuzzy=fuzzy, terms=terms)
            if mask is not None:
                t = t.filter(mask)
            if t.num_rows:
                tbls.append(t)
    if not tbls:
        return _pa.table({"term": _pa.array([], _pa.string()),
                          "df": _pa.array([], _pa.int64()),
                          "ttf": _pa.array([], _pa.int64())})
    allt = _pa.concat_tables(tbls)
    agg = allt.group_by("term").aggregate([("n", "sum"), ("tf_sum", "sum")])
    agg = agg.rename_columns(["term", "df", "ttf"]).sort_by(
        [("term", "ascending")])
    return agg.set_column(1, "df", agg.column("df").cast(_pa.int64()))


def termdict_scan_ds(index_dir: str, *, prefix: str | None = None,
                     lo: str | None = None, hi: str | None = None,
                     regex: str | None = None,
                     fuzzy: tuple[str, int] | None = None,
                     terms: "list[str] | None" = None) -> "pa.Table":
    """Distributed term-dictionary enumeration: one Ray task per
    postings part file applies the same vectorized scan mask and
    pre-aggregates within the file; the driver merges only the MATCHING
    terms' partials (bounded by the predicate's selectivity, like the
    serial path's output). Same result as :func:`termdict_scan`."""
    import pyarrow as _pa
    import ray.data

    pdir = os.path.join(index_dir, "postings")
    # the COMMITTED part list, not os.listdir: the directory also holds
    # snapshot-pinned old generations and in-flight merge outputs, which
    # would double-count every term's stats
    files = sorted(f"part={p['part']}.parquet"
                   for p in load_manifest(index_dir).postings_parts)

    def scan(batch: "pa.Table") -> "pa.Table":
        out = []
        for f in batch.column("file").to_pylist():
            t = pq.read_table(os.path.join(pdir, f),
                              columns=["term", "n", "tf_sum"])
            mask = _scan_mask(t.column("term").combine_chunks(),
                              prefix=prefix, lo=lo, hi=hi, regex=regex,
                              fuzzy=fuzzy, terms=terms)
            if mask is not None:
                t = t.filter(mask)
            if t.num_rows:
                g = t.group_by("term").aggregate(
                    [("n", "sum"), ("tf_sum", "sum")])
                g = g.rename_columns(["term", "n", "tf_sum"])
                out.append(pa.table({
                    "term": g.column("term"),
                    "n": g.column("n").cast(_pa.int64()),
                    "tf_sum": g.column("tf_sum").cast(_pa.int64())}))
        return _pa.concat_tables(out) if out else _pa.table(
            {"term": _pa.array([], _pa.string()),
             "n": _pa.array([], _pa.int64()),
             "tf_sum": _pa.array([], _pa.int64())})

    parts = list(ray.data.from_items([{"file": f} for f in files])
                 .map_batches(scan, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return _pa.table({"term": _pa.array([], _pa.string()),
                          "df": _pa.array([], _pa.int64()),
                          "ttf": _pa.array([], _pa.int64())})
    allt = _pa.concat_tables(parts)
    agg = allt.group_by("term").aggregate([("n", "sum"), ("tf_sum", "sum")])
    agg = agg.rename_columns(["term", "df", "ttf"]).sort_by(
        [("term", "ascending")])
    return agg.set_column(1, "df", agg.column("df").cast(_pa.int64()))


# ---------------------------------------------------------------------------
# Phrase queries (positional intersection — search/PhraseQuery.java:71,
# ExactPhraseMatcher.java:39): phrase frequency = number of exact
# consecutive-position matches; the doc is then scored as BM25(phrase_freq)
# with the phrase's own df (docs containing the phrase).

def _term_positions(reader: IndexReader, term: str
                    ) -> dict[int, np.ndarray] | None:
    from .codec import decode_positions

    p = reader.postings(term)
    if p is None:
        return None
    out: dict[int, np.ndarray] = {}
    for b in range(len(p.n)):
        d, tf, _ = decode_block(int(p.first_doc[b]), int(p.n[b]),
                                p.docs_enc[b], p.tfs_enc[b], p.norms_enc[b])
        if not p.pos_enc[b]:
            raise ValueError("index was built without positions")
        flat, offs = decode_positions(p.pos_enc[b], tf)
        lm = reader.live_mask(d)
        for i, doc in enumerate(d):
            if lm is not None and not lm[i]:
                continue
            out[int(doc)] = flat[offs[i]:offs[i + 1]]
    return out


_POS_BITS = np.uint64(24)          # ≤16M tokens per doc
_POS_MASK = np.uint64((1 << 24) - 1)


def _packed_positions(reader: IndexReader, term: str, shift: int
                      ) -> "np.ndarray | None":
    """All (doc, position - shift) pairs of a term packed into sorted
    uint64 keys (doc << 24 | pos); positions < shift are dropped (they
    cannot start a phrase). Fully vectorized across blocks."""
    from .codec import decode_positions

    p = reader.postings(term)
    if p is None:
        return None
    if any(not e for e in p.pos_enc):
        raise ValueError("index was built without positions")
    d, tf, _, _ = decode_blocks(p.first_doc, p.n, p.docs_enc, p.tfs_enc,
                                p.norms_enc)
    flat = np.concatenate([np.frombuffer(e, dtype="<i4")
                           for e in p.pos_enc]).astype(np.int64)
    docs_rep = np.repeat(d, tf)
    lm = reader.live_mask(docs_rep)
    if lm is not None:
        docs_rep, flat = docs_rep[lm], flat[lm]
    if flat.size and int(flat.max()) >= (1 << 24):
        raise ValueError("document longer than 2^24 tokens")
    pos = flat - shift
    keep = pos >= 0
    key = ((docs_rep[keep].astype(np.uint64) << _POS_BITS)
           | pos[keep].astype(np.uint64))
    return np.sort(key)


def interval_near_docs(reader: IndexReader, terms: list[str], width: int,
                       ordered: bool = True) -> np.ndarray:
    """Interval proximity query (queries/intervals/IntervalQuery.java:59,
    Intervals.maxwidth over Intervals.ordered / Intervals.unordered):
    sorted doc ids containing an interval of ``terms`` with
    max_pos - min_pos + 1 <= width.

    Vectorized across ALL docs on the packed (doc << 24 | pos) keys:

    - ordered: an earliest-successor chain — for every start position of
      term 0, one np.searchsorted per later term finds the smallest
      same-doc position strictly greater than the current end (the
      minimal-interval greedy of OrderedIntervalsSource.java:57); a doc
      matches iff some chain's span fits the width.
    - unordered (two terms): nearest-neighbor — for each position of the
      rarer term, its packed successor/predecessor in the other term's
      key array (UnorderedIntervalsSource via the two-list special case);
      positions must differ (distinct tokens).
    """
    packed = []
    for t in terms:
        k = _packed_positions(reader, t, 0)
        if k is None or len(k) == 0:
            return np.empty(0, np.int64)
        packed.append(k)
    if ordered:
        cur = packed[0]                       # current chain-end keys
        start_pos = (cur & _POS_MASK).astype(np.int64)
        for nxt in packed[1:]:
            idx = np.searchsorted(nxt, cur, side="right")
            ok = idx < len(nxt)
            cand = nxt[np.minimum(idx, len(nxt) - 1)]
            ok &= (cand >> _POS_BITS) == (cur >> _POS_BITS)
            cur, start_pos = cand[ok], start_pos[ok]
            if len(cur) == 0:
                return np.empty(0, np.int64)
        span = (cur & _POS_MASK).astype(np.int64) - start_pos + 1
        hits = cur[span <= width]
    else:
        if len(terms) != 2:
            raise ValueError("unordered near supports two terms")
        a, b = sorted(packed, key=len)
        pos_a = (a & _POS_MASK).astype(np.int64)
        doc_a = a >> _POS_BITS
        # successor of each a-key in b (same doc, pos > pa)
        si = np.searchsorted(b, a, side="right")
        s_ok = si < len(b)
        s_cand = b[np.minimum(si, len(b) - 1)]
        s_ok &= (s_cand >> _POS_BITS) == doc_a
        s_gap = np.where(
            s_ok, (s_cand & _POS_MASK).astype(np.int64) - pos_a,
            np.int64(1 << 30))
        # predecessor (same doc, pos <= pa; equal positions excluded)
        pi = np.searchsorted(b, a, side="left") - 1
        p_ok = pi >= 0
        p_cand = b[np.maximum(pi, 0)]
        p_ok &= (p_cand >> _POS_BITS) == doc_a
        p_gap = np.where(
            p_ok, pos_a - (p_cand & _POS_MASK).astype(np.int64),
            np.int64(1 << 30))
        gap = np.minimum(s_gap, p_gap)
        hits = a[(gap >= 1) & (gap + 1 <= width)]
    return np.unique(hits >> _POS_BITS).astype(np.int64)


def _minimal_ordered_chains(reader: IndexReader, terms: list[str]):
    """All MINIMAL ordered intervals of ``terms`` as (doc, start, end)
    arrays — the interval set OrderedIntervalsSource.java:57 enumerates.

    The greedy earliest-successor chain from each start of term 0 has a
    chain end that is nondecreasing in the start position (per doc), so a
    chain is minimal — contains no other chain — iff it is the LAST chain
    of its (doc, end) group (a later start reaching the same end nests
    inside the earlier one)."""
    packed = []
    for t in terms:
        k = _packed_positions(reader, t, 0)
        if k is None or len(k) == 0:
            return None
        packed.append(k)
    cur = packed[0]
    start_pos = (cur & _POS_MASK).astype(np.int64)
    for nxt in packed[1:]:
        idx = np.searchsorted(nxt, cur, side="right")
        ok = idx < len(nxt)
        cand = nxt[np.minimum(idx, len(nxt) - 1)]
        ok &= (cand >> _POS_BITS) == (cur >> _POS_BITS)
        cur, start_pos = cand[ok], start_pos[ok]
        if len(cur) == 0:
            return None
    doc = (cur >> _POS_BITS).astype(np.int64)
    end = (cur & _POS_MASK).astype(np.int64)
    # chains arrive sorted by (doc, start); keep the last of each
    # (doc, end) run = the minimal one
    keep = np.ones(len(cur), dtype=bool)
    if len(cur) > 1:
        keep[:-1] = (doc[1:] != doc[:-1]) | (end[1:] != end[:-1])
    return doc[keep], start_pos[keep], end[keep]


def interval_contains_docs(reader: IndexReader, big: list[str], small: str,
                           width: int, negate: bool = False) -> np.ndarray:
    """Interval containment (queries/intervals/Intervals.java
    ``containing`` / ``notContaining``, ContainingIntervalsSource /
    NotContainingIntervalsSource): docs with a minimal ordered interval
    of ``big`` (max width ``width``) that does (``negate=False``) or does
    not (``negate=True``) contain an occurrence of ``small``.

    Containment tests are two np.searchsorted calls against the small
    term's packed (doc << POS_BITS | pos) keys — no per-doc loop."""
    chains = _minimal_ordered_chains(reader, big)
    if chains is None:
        return np.empty(0, np.int64)
    doc, start, end = chains
    fit = (end - start + 1) <= width
    doc, start, end = doc[fit], start[fit], end[fit]
    if len(doc) == 0:
        return np.empty(0, np.int64)
    ks = _packed_positions(reader, small, 0)
    if ks is None or len(ks) == 0:
        has_small = np.zeros(len(doc), dtype=bool)
    else:
        base = doc.astype(np.uint64) << _POS_BITS
        lo = np.searchsorted(ks, base | start.astype(np.uint64),
                             side="left")
        hi = np.searchsorted(ks, base | end.astype(np.uint64),
                             side="right")
        has_small = hi > lo
    sel = ~has_small if negate else has_small
    return np.unique(doc[sel])


def phrase_freqs(reader: IndexReader, terms: list[str],
                 offsets: "list[int] | None" = None) -> dict[int, int]:
    """Exact phrase matching: doc → number of phrase occurrences
    (ExactPhraseMatcher.java:39 semantics).

    Vectorized across ALL docs at once: each term's (doc, pos - i) pairs
    pack into sorted uint64 keys; the phrase's occurrences are the
    multiway sorted-set intersection (np.intersect1d, smallest list
    first), and per-doc frequencies fall out of one np.unique over the
    surviving keys' doc bits — no per-doc Python loop."""
    packed = []
    for i, t in enumerate(terms):
        k = _packed_positions(reader, t,
                              offsets[i] if offsets is not None else i)
        if k is None or len(k) == 0:
            return {}
        packed.append(k)
    packed.sort(key=len)               # intersect smallest-first
    acc = packed[0]
    for k in packed[1:]:
        acc = np.intersect1d(acc, k, assume_unique=True)
        if len(acc) == 0:
            return {}
    docs, counts = np.unique(acc >> _POS_BITS, return_counts=True)
    return {int(d): int(c) for d, c in zip(docs, counts)}


def _sloppy_freq_doc(pos_lists: list[np.ndarray], slop: int,
                     rpt_groups: "tuple | list" = (),
                     multi: bool = False) -> np.float32:
    """Sloppy phrase frequency of one doc — an exact transcription of the
    reference's greedy PQ traversal (SloppyPhraseMatcher.java:189-220,
    nextMatch): always advance the least offset-adjusted PhrasePosition,
    freq += 1f/(1f+matchLength) per match (sloppyWeight, :184-186),
    float32 accumulation as in PhraseScorer (PhraseScorer.java:85-95).

    ``rpt_groups``: slot-index groups sharing repeated terms (sorted by
    query offset) — the repeat machinery (initFirstTime /
    advanceRepeatGroups / advanceRpts, SloppyPhraseMatcher.java:286-345):
    collision resolution by advancing the lesser PP, re-queue of advanced
    in-queue members. ``multi`` selects the complex initial placement
    (hasMultiTermRpts — collide-resolution loop) instead of the
    single-term staggered placement. Greedy is exact for match EXISTENCE
    but (per the reference's own class javadoc) intentionally
    approximate for counting — we reproduce its behavior, not an
    idealized count."""
    import heapq

    n = len(pos_lists)
    arrs = [np.asarray(p, dtype=np.int64) for p in pos_lists]
    idx = [0] * n
    pos = [int(arrs[i][0]) - i for i in range(n)]     # position - offset
    rpt_group = [-1] * n
    rpt_ind: list[int | None] = [None] * n
    groups = [list(g) for g in rpt_groups]
    for gi, g in enumerate(groups):
        for j, o in enumerate(g):
            rpt_group[o] = gi
            rpt_ind[o] = j
    end = 0

    def advance(i: int) -> bool:                      # advancePP
        nonlocal end
        idx[i] += 1
        if idx[i] >= len(arrs[i]):
            return False
        pos[i] = int(arrs[i][idx[i]]) - i
        if pos[i] > end:
            end = pos[i]
        return True

    def next_position(i: int) -> bool:                # no end update
        idx[i] += 1
        if idx[i] >= len(arrs[i]):
            return False
        pos[i] = int(arrs[i][idx[i]]) - i
        return True

    def tp(o: int) -> int:
        return pos[o] + o                              # actual term position

    def collide(o: int) -> int:
        for o2 in groups[rpt_group[o]]:
            if o2 != o and tp(o2) == tp(o):
                return rpt_ind[o2]
        return -1

    def lesser(o1: int, o2: int) -> int:
        if pos[o1] < pos[o2] or (pos[o1] == pos[o2] and o1 < o2):
            return o1
        return o2

    if not multi:
        # advanceRepeatGroups, simple (single-term) path: member j of a
        # group starts j distinct positions in ("we know exactly how much
        # to advance", SloppyPhraseMatcher.java:advanceRepeatGroups)
        for g in groups:
            for j in range(1, len(g)):
                for _ in range(j):
                    if not next_position(g[j]):
                        return np.float32(0.0)
    else:
        # complex path (hasMultiTermRpts): resolve initial collisions by
        # advancing the lesser PP; a resolved member below the cursor
        # restarts the current index (advanceRepeatGroups, "more
        # involved, some may not collide")
        for g in groups:
            i = 0
            while i < len(g):
                o = g[i]
                restart = False
                while (k := collide(o)) >= 0:
                    o2 = lesser(o, g[k])
                    if not advance(o2):
                        return np.float32(0.0)
                    if rpt_ind[o2] < i:
                        restart = True
                        break
                if not restart:
                    i += 1
    end = max(pos)
    heap = [(pos[i], i, i) for i in range(n)]         # (position, offset, ord)
    heapq.heapify(heap)
    positioned = True
    one = np.float32(1.0)
    freq = np.float32(0.0)

    def advance_rpts(o: int) -> bool:
        if rpt_group[o] < 0:
            return True
        g = groups[rpt_group[o]]
        bits: set[int] = set()
        k0 = rpt_ind[o]
        cur = o
        while (k := collide(cur)) >= 0:
            cur = lesser(cur, g[k])
            if not advance(cur):
                return False
            if k != k0:
                bits.add(k)
        stack: list[int] = []
        while bits and heap:
            _, _, o2 = heapq.heappop(heap)
            stack.append(o2)
            if rpt_ind[o2] is not None and rpt_ind[o2] in bits:
                bits.discard(rpt_ind[o2])
        for o2 in reversed(stack):
            heapq.heappush(heap, (pos[o2], o2, o2))
        return True

    while positioned:
        _, _, o = heapq.heappop(heap)
        match_len = end - pos[o]
        next_pos = heap[0][0] if heap else pos[o]
        matched = False
        while advance(o):
            if groups and not advance_rpts(o):
                positioned = False
                matched = match_len <= slop
                break
            if pos[o] > next_pos:
                heapq.heappush(heap, (pos[o], o, o))
                if match_len <= slop:
                    matched = True
                    break
                _, _, o = heapq.heappop(heap)
                next_pos = heap[0][0] if heap else pos[o]
                match_len = end - pos[o]
            else:
                ml2 = end - pos[o]
                if ml2 < match_len:
                    match_len = ml2
        else:
            positioned = False
            matched = match_len <= slop
        if matched:
            freq = np.float32(freq + one / (one + np.float32(match_len)))
    return freq


def sloppy_phrase_freqs(reader: IndexReader, terms: list[str], slop: int,
                        offsets: "list[int] | None" = None
                        ) -> dict[int, np.float32]:
    """Sloppy phrase matching (PhraseQuery with slop > 0): doc → float32
    sloppy frequency. Candidate docs are the conjunction of all terms'
    doc sets (ConjunctionUtils.intersectIterators approximation,
    SloppyPhraseMatcher ctor). Repeating query terms run through the
    single-term rptGroups machinery (two PPs of one term never occupy
    the same actual position); a doc needs at least as many positions of
    a term as the term has slots."""
    seen: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        seen.setdefault(t, []).append(i)
    groups = tuple(tuple(v) for v in seen.values() if len(v) > 1)
    per_term = []
    for i, t in enumerate(terms):
        m = _term_positions(reader, t)
        if m is None:
            return {}
        # gapped query offsets (analyzer stop removal): pre-shift so the
        # matcher's index-based offset math sees the true distances
        delta = (offsets[i] - i) if offsets is not None else 0
        if delta:
            m = {d: v - delta for d, v in m.items()}
        per_term.append(m)
    docs = set(per_term[0])
    for m in per_term[1:]:
        docs &= set(m)
    out: dict[int, np.float32] = {}
    for doc in sorted(docs):
        f = _sloppy_freq_doc([m[doc] for m in per_term], slop, groups)
        if f > 0:
            out[doc] = f
    return out


def _phrase_norms(reader: IndexReader, first_terms,
                  docs: np.ndarray) -> np.ndarray:
    """Field norms for a doc set, from the first slot's term postings
    (same doc → same field norm). ``first_terms``: a term or list of
    alternative terms — every matching doc contains at least one."""
    if isinstance(first_terms, str):
        first_terms = [first_terms]
    norm_map: dict[int, int] = {}
    for t in first_terms:
        p = reader.postings(t)
        if p is None:
            continue
        for b in range(len(p.n)):
            d, _, nm = decode_block(int(p.first_doc[b]), int(p.n[b]),
                                    p.docs_enc[b], p.tfs_enc[b],
                                    p.norms_enc[b])
            for dd, mm in zip(d, nm):
                norm_map[int(dd)] = int(mm)
    return np.array([norm_map[int(d)] for d in docs], dtype=np.uint8)


def _multi_phrase_slot_maps(reader: IndexReader,
                            term_sets: list[list[str]]
                            ) -> "list[dict[int, np.ndarray]] | None":
    """Per-slot union position maps (the UnionPostingsEnum role)."""
    per_slot: list[dict[int, np.ndarray]] = []
    for ts in term_sets:
        maps = [m for t in ts
                if (m := _term_positions(reader, t)) is not None]
        if not maps:
            return None
        merged: dict[int, np.ndarray] = {}
        for m in maps:
            for doc, pos in m.items():
                if doc in merged:
                    merged[doc] = np.union1d(merged[doc], pos)
                else:
                    merged[doc] = pos
        per_slot.append(merged)
    return per_slot


def multi_phrase_freqs(reader: IndexReader, term_sets: list[list[str]]
                       ) -> dict[int, int]:
    """MultiPhraseQuery exact matching (search/MultiPhraseQuery.java:54):
    at each phrase position a SET of alternative terms; slot positions =
    union of the member terms' positions (the UnionPostingsEnum role);
    freq = number of consecutive-position matches."""
    per_slot = _multi_phrase_slot_maps(reader, term_sets)
    if per_slot is None:
        return {}
    docs = set(per_slot[0])
    for m in per_slot[1:]:
        docs &= set(m)
    out: dict[int, int] = {}
    for doc in docs:
        acc = per_slot[0][doc].astype(np.int64)
        for i, m in enumerate(per_slot[1:], 1):
            acc = np.intersect1d(acc, m[doc].astype(np.int64) - i,
                                 assume_unique=True)
            if len(acc) == 0:
                break
        if len(acc):
            out[doc] = int(len(acc))
    return out


def sloppy_multi_phrase_freqs(reader: IndexReader,
                              term_sets: list[list[str]], slop: int
                              ) -> dict[int, np.float32]:
    """Sloppy MultiPhraseQuery (non-repeating case): each slot is the
    union of its member terms' positions, run through the same greedy
    matcher as plain sloppy phrases — exactly what SloppyPhraseMatcher
    does when hasMultiTermRpts is false. Terms appearing in several
    slots run through the repeat machinery: slots sharing repeated terms
    form union-find groups (gatherRptGroups), initial collisions resolve
    via the complex placement loop, and two grouped slots never occupy
    the same actual position."""
    from collections import Counter
    flat = [t for ts in term_sets for t in ts]
    counts = Counter(flat)
    repeated = {t for t, c in counts.items() if c > 1}
    groups: list[tuple[int, ...]] = []
    multi = False
    if repeated:
        # union-find over slots sharing any repeated term
        # (gatherRptGroups' bitset union, SloppyPhraseMatcher.java)
        parent = list(range(len(term_sets)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        by_term: dict[str, int] = {}
        for si, ts in enumerate(term_sets):
            for t in ts:
                if t in repeated:
                    if t in by_term:
                        parent[find(si)] = find(by_term[t])
                    else:
                        by_term[t] = si
        comp: dict[int, list[int]] = {}
        for si, ts in enumerate(term_sets):
            if any(t in repeated for t in ts):
                comp.setdefault(find(si), []).append(si)
        groups = [tuple(sorted(v)) for v in comp.values() if len(v) > 1]
        multi = any(len(term_sets[si]) > 1 for g in groups for si in g)
    per_slot = _multi_phrase_slot_maps(reader, term_sets)
    if per_slot is None:
        return {}
    docs = set(per_slot[0])
    for m in per_slot[1:]:
        docs &= set(m)
    out: dict[int, np.float32] = {}
    for doc in sorted(docs):
        f = _sloppy_freq_doc([m[doc] for m in per_slot], slop,
                             groups, multi=multi)
        if f > 0:
            out[doc] = f
    return out


def search_multi_phrase(reader: IndexReader, term_sets: list[list[str]],
                        k: int = 10) -> TopDocs:
    """MultiPhraseQuery scored like PhraseQuery: freq = match count, idf
    = sum over ALL member terms' idfs (MultiPhraseQuery weight stats)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    fr = multi_phrase_freqs(reader, term_sets)
    if not fr:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    docs = np.array(sorted(fr), dtype=np.int64)
    tf = np.array([fr[int(d)] for d in docs], dtype=np.int64)
    norms = _phrase_norms(reader, term_sets[0], docs)
    dfs = [p.df for ts in term_sets for t in ts
           if (p := reader.postings(t)) is not None]
    sim = bm25.scorer_multi(dfs, reader.doc_count, reader.sum_ttf)
    scores = sim.score(tf, norms)
    d, s = _topk(docs, scores, k)
    return TopDocs(d, s, len(docs))


def search_phrase(reader: IndexReader, phrase: str, k: int = 10,
                  slop: int = 0) -> TopDocs:
    """PhraseQuery: freq = exact match count (slop=0, weight 1 per match)
    or greedy sloppy frequency (slop>0, 1/(1+distance) per match); the
    scorer's idf is the SUM of the query terms' float32 idfs
    (PhraseQuery.java:441-470 getStats → BM25Similarity.idfExplain over
    TermStatistics[]), NOT a phrase-level df."""
    if k < 1:
        raise ValueError("k must be >= 1 (TopScoreDocCollector requires "
                         "numHits > 0)")
    terms, offs = reader.analyze_phrase(phrase)
    if not terms:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    if slop > 0:
        fr = sloppy_phrase_freqs(reader, terms, slop, offsets=offs)
        tf = np.array([float(fr[d]) for d in sorted(fr)], dtype=np.float32)
    else:
        fr = phrase_freqs(reader, terms, offsets=offs)
        tf = np.array([fr[d] for d in sorted(fr)], dtype=np.int64)
    if not fr:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    docs = np.array(sorted(fr), dtype=np.int64)
    norms = _phrase_norms(reader, terms[0], docs)
    dfs = [p.df if (p := reader.postings(t)) is not None else 0
           for t in terms]
    sim = bm25.scorer_multi(dfs, reader.doc_count, reader.sum_ttf)
    scores = sim.score(tf, norms)
    d, s = _topk(docs, scores, k)
    return TopDocs(d, s, len(docs))


# ---------------------------------------------------------------------------
# Paging, boosts, and doc-range-sliced parallel search

def search_after(reader: IndexReader, query: str, k: int,
                 after_score: float, after_doc: int) -> TopDocs:
    """searchAfter paging (search/IndexSearcher.java:576-588,
    TopScoreDocCollector.java:103-111): hits strictly after the pivot in
    (score desc, docID asc) order.

    Runs the rank-safe block-max engine with a geometrically growing
    top-m (k, 4k, 16k, ...) until k qualifying hits beyond the pivot are
    in hand or the match set is exhausted — page p costs one pruned
    search at m ≈ p·k instead of materializing and sorting every match.
    ``total_candidates`` counts qualifying hits within the final top-m
    (a lower bound, Lucene's GREATER_THAN_OR_EQUAL_TO relation)."""
    a = np.float32(after_score)
    m = max(k, 1)
    while True:
        td = search_blockmax(reader, query, m)
        keep = (td.scores < a) | ((td.scores == a) & (td.doc_ids > after_doc))
        exhausted = len(td.doc_ids) < m
        if int(keep.sum()) >= k or exhausted:
            d, s = _topk(td.doc_ids[keep], td.scores[keep], k)
            return TopDocs(d, s, int(keep.sum()), td.blocks_decoded,
                           td.blocks_total)
        m *= 4


def parse_boosted(query: str) -> list[tuple[str, float]]:
    """QueryParser boost syntax: ``term^2.5`` (classic QueryParser
    handleBoost, queryparser/classic/QueryParserBase.java). Whitespace
    tokens are analyzed; an un-boosted token has boost 1."""
    out: list[tuple[str, float]] = []
    for raw in query.split():
        boost = 1.0
        if "^" in raw:
            raw, _, b = raw.rpartition("^")
            try:
                boost = float(b)
            except ValueError:
                raw = raw + "^" + b
        for t in tokenize(raw):
            out.append((t, boost))
    return out


def search_boosted(reader: IndexReader, query: str, k: int = 10) -> TopDocs:
    """BooleanQuery of boosted SHOULD TermQuery clauses: clause weight =
    boost * idf in float32 (BM25Similarity.java:221 BM25Scorer.weight).
    Exhaustive evaluation (boost queries are rare; block-max would need
    per-clause bound rescaling)."""
    if k < 1:
        raise ValueError("k must be >= 1 (TopScoreDocCollector requires "
                         "numHits > 0)")
    clauses = parse_boosted(query)
    all_docs, all_scores, all_clause = [], [], []
    for ci, (t, boost) in enumerate(clauses):
        p = reader.postings(t)
        if p is None:
            continue
        sim = bm25.scorer(p.df, reader.doc_count, reader.sum_ttf,
                          boost=boost)
        for b in range(len(p.n)):
            d, tf, nm = decode_block(int(p.first_doc[b]), int(p.n[b]),
                                     p.docs_enc[b], p.tfs_enc[b],
                                     p.norms_enc[b])
            all_docs.append(d)
            all_scores.append(sim.score(tf, nm))
            all_clause.append(np.full(len(d), ci, dtype=np.int32))
    if not all_docs:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    uniq, final = _accumulate(np.concatenate(all_docs),
                              np.concatenate(all_clause),
                              np.concatenate(all_scores))
    d, s = _topk(uniq, final, k)
    return TopDocs(d, s, len(uniq))


def make_threshold_accumulator():
    """Cross-slice min-competitive sharing actor — the
    search/MaxScoreAccumulator.java role (used at
    TopScoreDocCollector.java:99-101,137-152): parallel leaf slices
    publish their k-th best score; later slices seed the block-max
    threshold with the global maximum so non-competitive blocks are
    never decoded."""
    import ray

    @ray.remote(num_cpus=0)
    class _Acc:
        def __init__(self):
            self.best: dict = {}

        def update(self, qid, kth_score: float):
            cur = self.best.get(qid)
            if cur is None or kth_score > cur:
                self.best[qid] = kth_score

        def get(self, qid):
            return self.best.get(qid)

    return _Acc.remote()


class _SliceSearcher:
    """Actor-pool stage for within-query doc-range parallelism: each task
    scores one doc-range slice of every clause (the leaf-slice model of
    search/IndexSearcher.java:106-108,323) with the block-max engine and
    returns its local top-k; the driver merges with the TopDocs.merge
    comparator. An optional threshold accumulator shares the running
    min-competitive score across slices."""

    def __init__(self, index_dir: str, acc=None):
        self.reader = IndexReader(index_dir)
        self.acc = acc

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import ray

        out_q, out_d, out_s = [], [], []
        for qid, q, k, lo, hi in zip(batch.column("qid").to_pylist(),
                                     batch.column("query").to_pylist(),
                                     batch.column("k").to_pylist(),
                                     batch.column("lo").to_pylist(),
                                     batch.column("hi").to_pylist()):
            theta0 = None
            if self.acc is not None:
                theta0 = ray.get(self.acc.get.remote(qid))
            td = search_blockmax(self.reader, q, int(k),
                                 lo=int(lo), hi=int(hi), theta0=theta0)
            if self.acc is not None and len(td.scores) >= int(k):
                self.acc.update.remote(qid, float(td.scores[int(k) - 1]))
            out_q.extend([qid] * len(td.doc_ids))
            out_d.extend(td.doc_ids.tolist())
            out_s.extend([float(s) for s in td.scores])
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "score": pa.array(out_s, pa.float32())})


def _search_range(reader: IndexReader, query: str, k: int,
                  lo: int, hi: int) -> TopDocs:
    """Exhaustive scoring restricted to docIDs in [lo, hi): decodes only
    blocks whose [first_doc, last_doc] intersects the range (block
    skipping by doc range — the skip-list advance role)."""
    terms = reader.analyze(query)
    sc = Scorers(reader, terms)
    all_docs, all_scores, all_clause = [], [], []
    for ci, t in enumerate(terms):
        p = sc.postings.get(t)
        if p is None:
            continue
        sim = sc.sim[t]
        need = np.flatnonzero((p.last_doc >= lo) & (p.first_doc < hi))
        for b in need:
            d, tf, nm = decode_block(int(p.first_doc[b]), int(p.n[b]),
                                     p.docs_enc[b], p.tfs_enc[b],
                                     p.norms_enc[b])
            m = (d >= lo) & (d < hi)
            lm = reader.live_mask(d)
            if lm is not None:
                m &= lm
            if not m.any():
                continue
            all_docs.append(d[m])
            all_scores.append(sim.score(tf[m], nm[m]))
            all_clause.append(np.full(int(m.sum()), ci, dtype=np.int32))
    if not all_docs:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    uniq, final = _accumulate(np.concatenate(all_docs),
                              np.concatenate(all_clause),
                              np.concatenate(all_scores))
    d, s = _topk(uniq, final, k)
    return TopDocs(d, s, len(uniq))


def search_sliced(index_dir: str, query: str, k: int = 10,
                  n_slices: int = 4, concurrency: int = 4,
                  share_threshold: bool = True
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Distribute ONE query across doc-range slices on an actor pool and
    merge the per-slice top-k (TopDocs.merge comparator). The scale path
    for mega-queries whose postings exceed one node. With
    ``share_threshold`` a MaxScoreAccumulator actor propagates the
    running k-th-best score across slices (rank-safe: exact ties always
    survive the seeded threshold)."""
    import ray.data

    reader = IndexReader(index_dir)
    n = max(reader.doc_count, 1)
    bounds = np.linspace(0, n, n_slices + 1).astype(np.int64)
    items = [{"qid": 0, "query": query, "k": k,
              "lo": int(bounds[i]), "hi": int(bounds[i + 1])}
             for i in range(n_slices)]
    acc = make_threshold_accumulator() if share_threshold else None
    rows = (ray.data.from_items(items)
            .map_batches(_SliceSearcher, batch_format="pyarrow",
                         batch_size=1, concurrency=min(concurrency,
                                                       n_slices),
                         fn_constructor_args=(index_dir, acc))
            .take_all())
    docs = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    scores = np.array([r["score"] for r in rows], dtype=np.float32)
    return _topk(docs, scores, k)


# ---------------------------------------------------------------------------
# Full Boolean execution of parsed classic-syntax queries

def _phrase_doc_scores(reader: IndexReader, terms: list[str], boost: float,
                       slop: int = 0,
                       offsets: "list[int] | None" = None
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc BM25 scores of a phrase clause: freq = exact count (slop=0)
    or greedy sloppy frequency; idf = sum of the terms' idfs
    (PhraseQuery.getStats semantics)."""
    if slop > 0:
        fr = sloppy_phrase_freqs(reader, terms, slop, offsets=offsets)
        tf = np.array([float(fr[d]) for d in sorted(fr)], dtype=np.float32)
    else:
        fr = phrase_freqs(reader, terms, offsets=offsets)
        tf = np.array([fr[d] for d in sorted(fr)], dtype=np.int64)
    if not fr:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    docs = np.array(sorted(fr), dtype=np.int64)
    norms = _phrase_norms(reader, terms[0], docs)
    dfs = [p.df if (p := reader.postings(t)) is not None else 0
           for t in terms]
    sim = bm25.scorer_multi(dfs, reader.doc_count, reader.sum_ttf,
                            boost=boost)
    return docs, sim.score(tf, norms)


def search_synonym_graph(reader: IndexReader,
                         groups: "list[list[list[str]]]",
                         k: int = 10) -> TopDocs:
    """Query-time multi-word synonym expansion — the
    SynonymGraphFilter + QueryBuilder.analyzeGraphBoolean role
    (analysis/synonym/SynonymGraphFilter.java:66,
    util/QueryBuilder.java:682): each position-group of the token graph
    becomes a SHOULD disjunction of its alternatives, a single-token
    alternative scoring as a TermQuery and a multi-token side path as a
    PhraseQuery (exact positions); group scores sum per doc like any
    SHOULD boolean. ``groups`` is [[alt, ...], ...] with each ``alt`` a
    token list (len 1 = term, len >1 = phrase)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    all_d, all_c, all_s = [], [], []
    ci = 0
    for group in groups:
        for alt in group:
            if len(alt) == 1:
                p = reader.postings(alt[0])
                if p is not None:
                    sim = bm25.scorer(p.df, reader.doc_count,
                                      reader.sum_ttf)
                    d, tf, nm, _ = decode_blocks(
                        p.first_doc, p.n, p.docs_enc, p.tfs_enc,
                        p.norms_enc)
                    s = sim.score(tf, nm)
                    lm = reader.live_mask(d)
                    if lm is not None:
                        d, s = d[lm], s[lm]
                else:
                    d = np.empty(0, np.int64)
                    s = np.empty(0, np.float32)
            else:
                d, s = _phrase_doc_scores(reader, list(alt), 1.0)
            if len(d):
                all_d.append(d)
                all_c.append(np.full(len(d), ci, dtype=np.int32))
                all_s.append(s)
            ci += 1
    if not all_d:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    uniq, final = _accumulate(np.concatenate(all_d),
                              np.concatenate(all_c),
                              np.concatenate(all_s))
    d, s = _topk(uniq, final, k)
    return TopDocs(d, s, len(uniq))


def _content_terms_only(reader: IndexReader, t: pa.Table) -> pa.Table:
    """Drop keyword-field 'field:value' terms from a dictionary view —
    default-field multi-term expansion must not leak keyword terms."""
    kw = reader.manifest.config.get("keyword_fields") or []
    mask = None
    for fld in kw:
        m = pc.invert(pc.starts_with(t.column("term"), f"{fld}:"))
        mask = m if mask is None else pc.and_(mask, m)
    return t.filter(mask) if mask is not None else t


def expand_multiterm(reader: IndexReader, c) -> list[str]:
    """Rewrite a range/wildcard/fuzzy clause into its matching dictionary
    terms (the AutomatonQuery/IntersectTermsEnum expansion role)."""
    if c.kind == "wildcard":
        from .queryparser import wildcard_to_regex
        t = termdict_scan(reader, regex=wildcard_to_regex(c.text))
        # keyword-field patterns ("lang:e*") target the "field:value"
        # terms themselves; content patterns must not leak keyword terms
        kw = reader.manifest.config.get("keyword_fields") or []
        if c.text.partition(":")[0] not in kw:
            t = _content_terms_only(reader, t)
    elif c.kind == "fuzzy":
        t = _content_terms_only(
            reader, termdict_scan(reader, fuzzy=(c.text, c.maxdist)))
    elif c.kind == "range":
        # inclusive/exclusive bounds via byte-sentinel shifts: the scan is
        # [lo, hi) on bytes; x > lo == x >= lo+'\0', x <= hi == x < hi+'\0'
        lo = c.lo or None
        hi = c.hi or None
        if lo is not None and not c.incl_lo:
            lo += "\x00"
        if hi is not None and c.incl_hi:
            hi += "\x00"
        if c.field_name:
            pfx = f"{c.field_name}:"
            t = termdict_scan(reader, prefix=pfx,
                              lo=pfx + lo if lo else None,
                              hi=pfx + hi if hi else None)
        else:
            t = _content_terms_only(
                reader, termdict_scan(reader, lo=lo, hi=hi))
    else:
        raise ValueError(f"not a multi-term clause: {c.kind}")
    return t.column("term").to_pylist()


def _all_live_docs(reader: IndexReader) -> np.ndarray:
    """Every live docID, sorted — the MatchAllDocsQuery universe. Read
    from docmeta, NOT arange(doc_count): docIDs are never renumbered, so
    after an expunge compaction (or upsert + expunge) doc_count
    understates maxDoc and the id space has holes. Cached per reader
    (a reader pins one commit)."""
    cached = getattr(reader, "_all_docs_cache", None)
    if cached is not None:
        return cached
    dm_dir = os.path.join(reader.index_dir, "docmeta")
    parts = [pq.read_table(os.path.join(dm_dir, f),
                           columns=["doc_id"]).column("doc_id").to_numpy()
             for f in sorted(os.listdir(dm_dir)) if f.endswith(".parquet")]
    d = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    lm = reader.live_mask(d)
    if lm is not None:
        d = d[lm]
    reader._all_docs_cache = d
    return d


def _eval_parsed(reader: IndexReader, pq_) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate a ParsedQuery with full BooleanQuery semantics
    (search/BooleanQuery.java:40, BooleanWeight): MUST scores+filters,
    SHOULD scores, MUST_NOT excludes; nested groups recurse (scores
    scaled by the group boost — BoostQuery); range/wildcard/fuzzy run
    with CONSTANT_SCORE_REWRITE semantics (score = boost·1f per doc,
    MultiTermQuery.java)."""
    scoring = [c for c in pq_.clauses if c.occur in ("MUST", "SHOULD")]
    must_not = [c for c in pq_.clauses if c.occur == "MUST_NOT"]
    if not scoring:
        return np.empty(0, np.int64), np.empty(0, np.float32)

    def clause_docset(c) -> np.ndarray:
        """Unscored doc set of a clause (for MUST_NOT / filtering)."""
        if c.kind == "term":
            return _term_docset(reader, c.text)
        d, _ = clause_docs_scores(c)
        return np.sort(d)

    def clause_docs_scores(c) -> tuple[np.ndarray, np.ndarray]:
        if c.kind == "phrase":
            terms, offs = reader.analyze_phrase(c.text)
            if not terms:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            return _phrase_doc_scores(reader, terms, c.boost, slop=c.slop,
                                      offsets=offs)
        if c.kind == "group":
            d, s = _eval_parsed(reader, c.sub)
            return d, (s * np.float32(c.boost)).astype(np.float32)
        if c.kind == "matchall":
            # MatchAllDocsQuery (search/MatchAllDocsQuery.java:27): every
            # live doc at constant score boost·1f
            d = _all_live_docs(reader)
            return d, np.full(len(d), np.float32(c.boost), np.float32)
        if c.kind == "const":
            # ConstantScoreQuery (search/ConstantScoreQuery.java:33):
            # the wrapped query contributes its DOC SET only
            d, _s = _eval_parsed(reader, c.sub)
            return d, np.full(len(d), np.float32(c.boost), np.float32)
        if c.kind == "dismax":
            # DisjunctionMaxQuery (search/DisjunctionMaxQuery.java:44,
            # DisjunctionMaxScorer.java:60-72): per doc max + tie·others,
            # double interior, one float cast; disjuncts recurse
            dd, ss = [], []
            for sub in c.sub.clauses:
                d, s = clause_docs_scores(sub)
                dd.append(d)
                ss.append(s)
            if not dd:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            docs = np.concatenate(dd)
            sc64 = np.concatenate(ss).astype(np.float64)
            uniq, inv = np.unique(docs, return_inverse=True)
            mx = np.full(len(uniq), -np.inf)
            np.maximum.at(mx, inv, sc64)
            tot = np.zeros(len(uniq))
            np.add.at(tot, inv, sc64)
            fin = (mx + c.tie * (tot - mx)).astype(np.float32)
            return uniq, (fin * np.float32(c.boost)).astype(np.float32)
        if c.kind == "range" and c.field_name:
            # numeric bounds + a built point index for the field →
            # PointRangeQuery through the BKD-role index (points.py);
            # falls through to the term-range expansion otherwise
            import os as _os

            from .points import numeric_range
            lineage = _os.path.join(reader.index_dir, "points",
                                    c.field_name, "_lineage.json")
            try:
                lo_n = int(c.lo) if c.lo else None
                hi_n = int(c.hi) if c.hi else None
                numeric = True
            except ValueError:
                numeric = False
            if numeric and _os.path.exists(lineage):
                lo_v = (-(1 << 62) if lo_n is None
                        else lo_n + (0 if c.incl_lo else 1))
                hi_v = ((1 << 62) if hi_n is None
                        else hi_n + (1 if c.incl_hi else 0))
                docs, _m = numeric_range(reader.index_dir, c.field_name,
                                         lo_v, hi_v)
                lm = reader.live_mask(docs)
                if lm is not None:
                    docs = docs[lm]
                return docs, np.full(len(docs), np.float32(c.boost),
                                     dtype=np.float32)
        if c.kind in ("range", "wildcard", "fuzzy"):
            terms = expand_multiterm(reader, c)
            if not terms:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            docs = np.unique(np.concatenate(
                [_term_docset(reader, t) for t in terms]))
            return docs, np.full(len(docs), np.float32(c.boost),
                                 dtype=np.float32)
        p = reader.postings(c.text)
        if p is None:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        sim = bm25.scorer(p.df, reader.doc_count, reader.sum_ttf,
                          boost=c.boost)
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        s = sim.score(tf, nm)
        lm = reader.live_mask(d)
        if lm is not None:
            d, s = d[lm], s[lm]
        return d, s

    all_d, all_s, all_c = [], [], []
    must_sets: list[np.ndarray] = []
    for ci, c in enumerate(scoring):
        d, s = clause_docs_scores(c)
        all_d.append(d)
        all_s.append(s)
        all_c.append(np.full(len(d), ci, dtype=np.int32))
        if c.occur == "MUST":
            must_sets.append(np.sort(d))
    uniq, final = _accumulate(np.concatenate(all_d),
                              np.concatenate(all_c),
                              np.concatenate(all_s))
    keep = np.ones(len(uniq), dtype=bool)
    for ds in must_sets:
        keep &= np.isin(uniq, ds, assume_unique=True)
    for c in must_not:
        nd = clause_docset(c)
        keep &= ~np.isin(uniq, nd, assume_unique=True)
    return uniq[keep], final[keep]


def search_parsed(reader: IndexReader, query: str, k: int = 10) -> TopDocs:
    """Execute a classic-syntax query (lucene_ray.queryparser): parse,
    evaluate Boolean semantics recursively, top-k collect."""
    if k < 1:
        raise ValueError("k must be >= 1 (TopScoreDocCollector requires "
                         "numHits > 0)")
    from .queryparser import parse

    pq_ = parse(query)
    docs, scores = _eval_parsed(reader, pq_)
    d, s = _topk(docs, scores, k)
    return TopDocs(d, s, len(docs))


def search_xml(reader: IndexReader, xml_text: str, k: int = 10) -> TopDocs:
    """Execute an XML query document (queryparser/xml CoreParser role,
    lucene_ray.xmlqp): parse the element tree into the classic AST and
    evaluate through the one Boolean evaluator."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from .xmlqp import parse_xml

    pq_ = parse_xml(xml_text)
    docs, scores = _eval_parsed(reader, pq_)
    d, s = _topk(docs, scores, k)
    return TopDocs(d, s, len(docs))


# ---------------------------------------------------------------------------
# SynonymQuery and DisjunctionMaxQuery (SURVEY.md §2.9)

def search_synonym(reader: IndexReader, terms: list[str], k: int = 10
                   ) -> TopDocs:
    """SynonymQuery (search/SynonymQuery.java:54): the terms are scored as
    ONE pseudo-term — freq = Σ tf over the synonyms per doc, df = docs
    matching any synonym, one scorer built from the blended stats."""
    if k < 1:
        raise ValueError("k must be >= 1")
    dd, tt, nn = [], [], []
    for t in terms:
        p = reader.postings(t)
        if p is None:
            continue
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        lm = reader.live_mask(d)
        if lm is not None:
            d, tf, nm = d[lm], tf[lm], nm[lm]
        dd.append(d)
        tt.append(tf)
        nn.append(nm)
    if not dd:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    docs = np.concatenate(dd)
    tfs = np.concatenate(tt)
    norms = np.concatenate(nn)
    uniq, inv = np.unique(docs, return_inverse=True)
    freq = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(freq, inv, tfs)
    nb = np.zeros(len(uniq), dtype=np.uint8)
    nb[inv] = norms                       # same doc → same field norm
    sim = bm25.scorer(len(uniq), reader.doc_count, reader.sum_ttf)
    scores = sim.score(freq, nb)
    d, s = _topk(uniq, scores, k)
    return TopDocs(d, s, len(uniq))


def search_dismax(reader: IndexReader, terms: list[str], k: int = 10,
                  tie_breaker: float = 0.0) -> TopDocs:
    """DisjunctionMaxQuery (search/DisjunctionMaxQuery.java:44): per doc,
    score = max clause score + tie_breaker * (sum of the others).
    Lucene computes max + tie*othersSum in double, cast to float at
    collection."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sc = Scorers(reader, terms)
    dd, ss = [], []
    for t in terms:
        p = sc.postings.get(t)
        if p is None:
            continue
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        s = sc.sim[t].score(tf, nm)
        lm = reader.live_mask(d)
        if lm is not None:
            d, s = d[lm], s[lm]
        dd.append(d)
        ss.append(s)
    if not dd:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    docs = np.concatenate(dd)
    scores = np.concatenate(ss).astype(np.float64)
    uniq, inv = np.unique(docs, return_inverse=True)
    mx = np.full(len(uniq), -np.inf)
    np.maximum.at(mx, inv, scores)
    total = np.zeros(len(uniq))
    np.add.at(total, inv, scores)
    final = (mx + tie_breaker * (total - mx)).astype(np.float32)
    d, s = _topk(uniq, final, k)
    return TopDocs(d, s, len(uniq))


def count_hits(reader: IndexReader, query: str) -> int:
    """Exact hit count — the TotalHitCountCollector role
    (search/TotalHitCountCollector.java:27). We report exact counts
    (Lucene's >=1000 early termination is an optimization, not a
    semantic; SURVEY.md §7.3)."""
    terms = reader.analyze(query)
    docs = [d for t in set(terms)
            if len(d := _term_docset(reader, t))]
    if not docs:
        return 0
    return int(len(np.unique(np.concatenate(docs))))


def explain(reader: IndexReader, query: str, doc_id: int) -> dict:
    """Score decomposition for one doc — the Explanation surface
    (search/Weight.explain / BM25Similarity.explain): per matching
    clause, the (df, tf, norm byte, idf, weight, score) breakdown; the
    clause sum is bit-identical to the engine's score for the doc."""
    terms = reader.analyze(query)
    sc = Scorers(reader, terms)
    clauses = []
    docs_c, cls_c, scores_c = [], [], []
    for ci, t in enumerate(terms):
        p = sc.postings.get(t)
        if p is None:
            clauses.append({"term": t, "match": False})
            continue
        d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                     p.tfs_enc, p.norms_enc)
        pos = int(np.searchsorted(d, doc_id))
        if pos >= len(d) or d[pos] != doc_id:
            clauses.append({"term": t, "match": False, "df": p.df})
            continue
        lm = reader.live_mask(np.array([doc_id]))
        if lm is not None and not lm[0]:
            clauses.append({"term": t, "match": False, "df": p.df,
                            "deleted": True})
            continue
        sim = sc.sim[t]
        s = sim.score(tf[pos:pos + 1], nm[pos:pos + 1])
        clauses.append({
            "term": t, "match": True, "df": p.df, "ttf": p.ttf,
            "tf": int(tf[pos]), "norm_byte": int(nm[pos]),
            "idf": float(bm25.idf(p.df, reader.doc_count)),
            "weight": float(sim.weight),
            "score": float(s[0]),
        })
        docs_c.append(np.array([doc_id]))
        cls_c.append(np.array([ci], dtype=np.int32))
        scores_c.append(s)
    total = np.float32(0.0)
    if docs_c:
        _, fin = _accumulate(np.concatenate(docs_c),
                             np.concatenate(cls_c),
                             np.concatenate(scores_c))
        total = fin[0]
    return {"doc_id": int(doc_id), "query": query,
            "total_score": float(total),
            "doc_count": reader.doc_count, "sum_ttf": reader.sum_ttf,
            "clauses": clauses}


def more_like_this(reader: IndexReader, doc_id: int, k: int = 10,
                   max_query_terms: int = 5,
                   candidate_terms: "list[str] | None" = None
                   ) -> tuple[list[str], TopDocs]:
    """MoreLikeThis (queries/src/java/org/apache/lucene/queries/mlt/
    MoreLikeThis.java): select the doc's most interesting terms by
    tf·idf (desc, term asc tie-break), build a Boolean SHOULD query,
    search excluding the source doc. Returns (selected_terms, hits).

    O(doc): the doc's terms come from the term-vector forward index
    (reader.term_vector — MoreLikeThis.retrieveTerms' term-vector path,
    mlt/MoreLikeThis.java interestingTerms); per-term df is a dictionary
    stats lookup. Requires with_term_vectors=True at build time.
    """
    import math

    terms, tfs = reader.term_vector(doc_id)
    if candidate_terms is not None:
        cset = set(candidate_terms)
        pairs = [(t, tf) for t, tf in zip(terms, tfs) if t in cset]
        terms = [t for t, _ in pairs]
        tfs = np.array([tf for _, tf in pairs], dtype=np.int64)
    cand: list[tuple[float, str]] = []
    for t, tf in zip(terms, tfs):
        df = reader.df(t)
        idf = math.log(1 + (reader.doc_count - df + 0.5) / (df + 0.5))
        cand.append((float(tf) * idf, t))
    cand.sort(key=lambda x: (-x[0], x[1]))
    selected = [t for _, t in cand[:max_query_terms]]
    if not selected:
        return [], TopDocs(np.empty(0, np.int64),
                           np.empty(0, np.float32), 0)
    full = search_bruteforce(reader, " ".join(selected), k + 1)
    keep = full.doc_ids != doc_id
    d, s = _topk(full.doc_ids[keep], full.scores[keep], k)
    return selected, TopDocs(d, s, int(keep.sum()))


ANY_TERM = "*"        # TermAutomatonQuery.createState wildcard transition


def term_automaton_matches(reader: IndexReader, transitions, accepts
                           ) -> dict[int, int]:
    """TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java:71):
    docs containing a token path that the term automaton accepts —
    the generalization of phrase / multi-phrase / synonym-graph queries
    to an arbitrary (here: acyclic) accept graph, including the ANY
    transition (:108 ``setAccept``/``addAnyTransition``). State 0 is
    initial; ``transitions`` is ``[(from, term | ANY_TERM, to), ...]``;
    ``accepts`` the accepting state set.

    Execution is a position-set DP instead of the reference's
    parallel-DISI intersection (TermAutomatonScorer.java:37): R(s) =
    the set of next-unconsumed positions reachable in state s; a term
    transition intersects with the term's posting positions
    (vectorized ``np.intersect1d``), an ANY transition shifts the whole
    set. Returns {doc: number of distinct accepted END positions} — the
    freq the reference's scorer counts. When the automaton uses ANY,
    per-candidate token counts come from the field_len docvalue to
    bound wildcard steps at the document end."""
    states = {0}
    for a, _t, b in transitions:
        states.add(a)
        states.add(b)
    n_states = max(states) + 1
    # topological order over the acyclic graph
    order, seen = [], set()

    def visit(s, stack):
        if s in stack:
            raise ValueError("term automaton must be acyclic")
        if s in seen:
            return
        stack.add(s)
        for a, _t, b in transitions:
            if a == s:
                visit(b, stack)
        stack.discard(s)
        seen.add(s)
        order.append(s)

    visit(0, set())
    order.reverse()

    pos_of: dict[str, dict[int, np.ndarray]] = {}
    cand: set[int] = set()
    for _a, t, _b in transitions:
        if t != ANY_TERM and t not in pos_of:
            pos_of[t] = _term_positions(reader, t) or {}
            cand.update(pos_of[t].keys())

    # an accepted path of ONLY wildcard transitions matches docs that
    # contain none of the automaton's terms — the candidate set must
    # then be the whole live corpus (the MatchAllDocs degenerate the
    # reference's automaton also rewrites to): reachability over
    # ANY-only edges from the initial state
    any_reach = {0}
    grew = True
    while grew:
        grew = False
        for a, t, b in transitions:
            if t == ANY_TERM and a in any_reach and b not in any_reach:
                any_reach.add(b)
                grew = True
    if any_reach & set(accepts):
        d_all = np.arange(reader.doc_count, dtype=np.int64)
        lm_all = reader.live_mask(d_all)
        if lm_all is not None:
            d_all = d_all[lm_all]
        cand.update(int(x) for x in d_all)

    has_any = any(t == ANY_TERM for _a, t, _b in transitions)
    dl_map: dict[int, int] = {}
    if has_any and cand:
        ids = np.array(sorted(cand), np.int64)
        dl_map = dict(zip(ids.tolist(),
                          doc_field_lens(reader, ids).tolist()))

    out: dict[int, int] = {}
    for d in sorted(cand):
        reach: list[np.ndarray | None] = [None] * n_states
        dl = dl_map.get(d)
        # state 0 may start at any position: positions of the outgoing
        # terms themselves seed the DP lazily (ANY from state 0 would
        # need doc_lens)
        for s in order:
            base = reach[s]
            for a, t, b in transitions:
                if a != s:
                    continue
                srcs = []
                if s == 0:            # fresh start at any position
                    if t == ANY_TERM:
                        if dl is None:
                            raise ValueError("ANY from the initial "
                                             "state needs doc_lens")
                        srcs.append(np.arange(dl, dtype=np.int64))
                    else:
                        p = pos_of[t].get(d)
                        if p is not None:
                            srcs.append(np.asarray(p, np.int64))
                if base is not None and len(base):
                    if t == ANY_TERM:
                        src = base if dl is None else base[base < dl]
                        srcs.append(src)
                    else:
                        p = pos_of[t].get(d)
                        if p is not None:
                            srcs.append(np.intersect1d(
                                base, np.asarray(p, np.int64)))
                if not srcs:
                    continue
                nxt = np.unique(np.concatenate(srcs)) + 1
                reach[b] = (nxt if reach[b] is None
                            else np.union1d(reach[b], nxt))
        ends = [reach[f] for f in accepts
                if reach[f] is not None and len(reach[f])]
        if ends:
            out[d] = int(len(np.unique(np.concatenate(ends))))
    return out


def search_field_exists(reader: IndexReader, field: str) -> np.ndarray:
    """FieldExistsQuery (core/search/FieldExistsQuery.java): every live
    doc that has a value for ``field``.  For keyword fields the doc set
    is the union of the field's term postings (the terms/docvalues
    iterator role); the content field exists wherever norms do, i.e.
    every live doc (this engine indexes content for every document)."""
    if field == "content":
        return _all_live_docs(reader)
    t = termdict_scan(reader, prefix=f"{field}:")
    sets = [_term_docset(reader, term)
            for term in t.column("term").to_pylist()]
    if not sets:
        return np.empty(0, np.int64)
    d = np.unique(np.concatenate(sets))
    lm = reader.live_mask(d)
    return d if lm is None else d[lm]


def token_stream_to_term_automaton(tokens,
                                   preserve_position_increments: bool = True
                                   ) -> tuple[list, set]:
    """TokenStreamToTermAutomatonQuery.toQuery (sandbox/search/
    TokenStreamToTermAutomatonQuery.java:51-107): convert a token
    GRAPH — ``tokens`` = [(term, pos_inc, pos_length), ...] — into the
    (transitions, accepts) pair :func:`term_automaton_matches`
    consumes.  Stacked tokens (posInc 0) become alternative
    transitions from the same state; posLength > 1 spans states; the
    literal ``'*'`` term becomes an ANY transition (:88-92); holes
    (posInc > 1) raise unless ``preserve_position_increments`` is
    False, which collapses them (:68-74); the single accept state is
    the last one (:105)."""
    pos = -1
    state = -1
    transitions = []
    for term, pos_inc, pos_len in tokens:
        if not preserve_position_increments and pos_inc > 1:
            pos_inc = 1
        if pos < 0 and pos_inc <= 0:
            raise ValueError("first token must advance")
        if pos_inc > 1:
            raise ValueError(
                "cannot handle holes; to accept any term, use '*' term")
        if pos_inc > 0:
            pos += pos_inc
        end_pos = pos + pos_len
        state = max(state, end_pos)
        transitions.append((pos, term, end_pos))
    if state < 0:
        raise ValueError("empty token stream")
    return transitions, {state}
