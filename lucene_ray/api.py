"""User-facing facade — the IndexWriter/IndexSearcher surface in one class.

A user of the reference drives Lucene through IndexWriter (add/commit),
DirectoryReader/IndexSearcher (search), and SearcherManager (refresh).
:class:`Index` maps that surface onto the Ray-Data engine:

    from lucene_ray.api import Index

    idx = Index.build("s3://corpus/parquet/", "/indexes/main")   # IndexWriter+commit
    hits = idx.search("error handling", k=10)                    # IndexSearcher.search
    hits = idx.search('+panic -test "stack trace"', k=10)        # classic QueryParser
    idx.append("s3://corpus/new-files/")                         # addDocuments+commit
    idx = idx.refresh()                                          # SearcherManager.maybeRefresh
    idx.verify()                                                 # CheckIndex

All methods assume Ray is already initialised (driver contract).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .build import append_to_index, build_index, verify_index
from .search import (IndexReader, TopDocs, search_after, search_blockmax,
                     search_bruteforce, search_parsed, search_phrase)


@dataclass
class Hit:
    doc_id: int
    score: float


class Index:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.reader = IndexReader(index_dir)

    # -- build / mutate ---------------------------------------------------
    @classmethod
    def build(cls, corpus, index_dir: str, **kwargs) -> "Index":
        """End-to-end build (resumable); see build_index for knobs
        (doc_order, with_positions, num_buckets, ...)."""
        build_index(corpus, index_dir, **kwargs)
        return cls(index_dir)

    def append(self, new_corpus: str) -> "Index":
        """Flush new segments + publish a new manifest generation."""
        append_to_index(self.index_dir, new_corpus)
        return self.refresh()

    def refresh(self) -> "Index":
        """Reopen against the latest committed manifest."""
        return Index(self.index_dir)

    def compact(self, expunge_deletes: bool = False) -> "Index":
        """forceMerge/TieredMergePolicy role: collapse append generations
        into one partition per term-hash bucket; with
        ``expunge_deletes`` also squeeze tombstoned docs out of postings,
        docmeta and the collection stats (Lucene merge + liveDocs)."""
        from .build import compact_index

        compact_index(self.index_dir, expunge_deletes=expunge_deletes)
        return self.refresh()

    def delete_by_term(self, term: str) -> "Index":
        """IndexWriter.deleteDocuments(Term): tombstone matching docs
        (live-docs filtering at search; stats delete-blind until
        rebuild, as in Lucene)."""
        from .build import delete_by_term

        delete_by_term(self.index_dir, term)
        return self.refresh()

    def soft_delete_by_term(self, term: str) -> "Index":
        """Soft-delete matching docs (soft-deletes docvalues field role,
        index/SoftDeletesRetentionMergePolicy.java:46): search-invisible
        immediately, but ``compact(expunge_deletes=True)`` physically
        retains them while any retention lease has not caught up past
        this generation."""
        from .build import soft_delete_by_term

        soft_delete_by_term(self.index_dir, term)
        return self.refresh()

    def acquire_retention_lease(self, lease_id: str,
                                through_gen: int = -1) -> "Index":
        """Record that ``lease_id``'s holder (a replica, a PIT consumer)
        has caught up through soft generation ``through_gen`` — expunge
        retains every soft generation above the minimum lease watermark
        (the retention-lease pattern on SoftDeletesRetentionMergePolicy)."""
        from .state.retention import acquire_retention_lease

        acquire_retention_lease(self.index_dir, lease_id, through_gen)
        return self

    def release_retention_lease(self, lease_id: str) -> "Index":
        from .state.retention import release_retention_lease

        release_retention_lease(self.index_dir, lease_id)
        return self

    def upsert(self, new_corpus: str) -> "Index":
        """updateDocument semantics: delete docs keyed (repo, path,
        commit) present in ``new_corpus``, then append it."""
        from .build import upsert_documents

        upsert_documents(self.index_dir, new_corpus)
        return self.refresh()

    def add_indexes(self, src_index_dir: str) -> "Index":
        """IndexWriter.addIndexes(Directory...): import another index
        wholesale, docIDs remapped past the current maxDoc."""
        from .build import add_indexes

        add_indexes(self.index_dir, src_index_dir)
        return self.refresh()

    def snapshot(self) -> int:
        """Pin the current commit (SnapshotDeletionPolicy.snapshot);
        returns the commit id for open_at/release_snapshot."""
        from .state.snapshots import create_snapshot

        return create_snapshot(self.index_dir)

    def release_snapshot(self, snapshot_id: int) -> None:
        from .state.snapshots import release_snapshot

        release_snapshot(self.index_dir, snapshot_id)

    def replicate_to(self, dst_dir: str, snapshot: int | None = None,
                     include_derived: bool = False) -> dict:
        """NRT replication (replicator/nrt/ReplicaNode.java:58): sync a
        replica directory to this index's commit — only missing or
        mismatched files transfer; the replica's manifest publishes
        last. Returns transfer stats."""
        from .replicate import replicate_index

        return replicate_index(self.index_dir, dst_dir,
                               snapshot=snapshot,
                               include_derived=include_derived)

    def open_at(self, snapshot_id: int) -> "Index":
        """Point-in-time view (DirectoryReader.open(IndexCommit)):
        searches run against the pinned commit while the live index
        keeps moving. Mutating calls on the returned object still write
        to the live index — treat it as read-only."""
        out = Index.__new__(Index)
        out.index_dir = self.index_dir
        out.reader = IndexReader(self.index_dir, at_snapshot=snapshot_id)
        return out

    # -- search -----------------------------------------------------------
    def search(self, query: str, k: int = 10, *, pruned: bool = True
               ) -> list[Hit]:
        """Free text → BooleanQuery(SHOULD) BM25 top-k. Classic syntax
        (quotes, +/-, AND/OR/NOT, ^boost, field:) is detected and routed
        through the parser."""
        if any(c in query for c in '"+-^:') or \
                any(w in ("AND", "OR", "NOT") for w in query.split()):
            td = search_parsed(self.reader, query, k)
        elif pruned:
            td = search_blockmax(self.reader, query, k)
        else:
            td = search_bruteforce(self.reader, query, k)
        return self._hits(td)

    def simple_search(self, query: str) -> list[int]:
        """SimpleQueryParser surface (queryparser/simple/
        SimpleQueryParser.java:103): the fault-tolerant end-user syntax
        (+ | - quotes prefix fuzzy near parens escapes, default OR) —
        never throws on malformed input. Returns the sorted matching
        doc ids (constant-score doc-set semantics)."""
        from .simpleqp import eval_docs, parse

        return [int(d) for d in eval_docs(self.reader, parse(query))]

    def xml_search(self, xml_text: str, k: int = 10) -> list[Hit]:
        """CoreParser surface (queryparser/xml/CoreParser.java:60):
        execute an XML query document (TermQuery/TermsQuery/
        BooleanQuery incl. filter occur/UserQuery/MatchAllDocsQuery/
        ConstantScoreQuery/BoostQuery/DisjunctionMaxQuery/RangeQuery/
        PointRangeQuery); unsupported elements raise ValueError, the
        ParserException analogue."""
        from .search import search_xml

        return self._hits(search_xml(self.reader, xml_text, k))

    def profile(self, query: str, k: int = 10) -> dict:
        """Deterministic execution counters for one query (the
        ProfilerCollector role): clauses, candidates, impact blocks
        total/decoded, hits."""
        from .search import parse_query

        td = search_blockmax(self.reader, query, k)
        return {"n_clauses": len(parse_query(query)),
                "candidates": td.total_candidates,
                "blocks_total": td.blocks_total,
                "blocks_decoded": td.blocks_decoded,
                "hits": len(td.doc_ids)}

    def search_after(self, query: str, k: int, last: Hit) -> list[Hit]:
        td = search_after(self.reader, query, k, last.score, last.doc_id)
        return self._hits(td)

    def phrase(self, phrase: str, k: int = 10) -> list[Hit]:
        return self._hits(search_phrase(self.reader, phrase, k))

    # -- introspection ----------------------------------------------------
    def count(self, query: str) -> int:
        """Exact hit count (TotalHitCountCollector role)."""
        from .search import count_hits

        return count_hits(self.reader, query)

    def explain(self, query: str, doc_id: int) -> dict:
        """Score decomposition for one doc (Weight.explain role)."""
        from .search import explain

        return explain(self.reader, query, doc_id)

    def doc_count(self) -> int:
        return self.reader.doc_count

    def term_stats(self, term: str) -> tuple[int, int]:
        """(docFreq, totalTermFreq) — TermStatistics."""
        p = self.reader.postings(term)
        return (p.df, p.ttf) if p is not None else (0, 0)

    def auto_stop_words(self, max_doc_freq: int | None = None,
                        max_percent_docs: float | None = None,
                        exclude_prefixes: "list[str] | None" = None
                        ) -> frozenset[str]:
        """QueryAutoStopWordAnalyzer role (query/
        QueryAutoStopWordAnalyzer.java:79): derive the stop set from
        the index — terms whose df EXCEEDS max_doc_freq (or
        max_percent_docs * doc_count). Distributed: a filter over the
        term-dictionary Dataset, no driver-side dictionary concat."""
        from .search import termdict_stats_ds

        if max_doc_freq is None:
            if max_percent_docs is None:
                raise ValueError(
                    "need max_doc_freq or max_percent_docs")
            max_doc_freq = int(max_percent_docs * self.doc_count())
        dd = termdict_stats_ds(self.index_dir,
                               exclude_prefixes)
        hot = dd.filter(expr=f"df > {int(max_doc_freq)}")
        # the stop set is vocabulary-small by construction (terms in
        # more than a df-threshold of docs)
        return frozenset(r["term"] for r in hot.take_all())

    def verify(self) -> dict:
        return verify_index(self.index_dir)

    def repair(self) -> dict:
        """Re-merge corrupt postings partitions from the surviving
        segment files (lossless CheckIndex -exorcise; see
        build.repair_postings)."""
        from .build import repair_postings

        return repair_postings(self.index_dir)

    def spell(self, term: str, max_edits: int = 2, top: int = 5
              ) -> list[tuple[str, int, int]]:
        """DirectSpellChecker suggestions: [(suggestion, distance, df)]
        ranked (distance asc, df desc, term asc)."""
        from .pipelines.fulltext import _content_only, _levenshtein
        from .search import termdict_scan

        t = _content_only(self.reader,
                          termdict_scan(self.reader,
                                        fuzzy=(term, max_edits)))
        cand = []
        for s, df in zip(t.column("term").to_pylist(),
                         t.column("df").to_pylist()):
            if s != term and s[:1] == term[:1]:
                cand.append((_levenshtein(s, term), -int(df), s))
        cand.sort()
        return [(s, d, -ndf) for d, ndf, s in cand[:top]]


    def intervals(self, source, doc_ids=None
                  ) -> "dict[int, list[tuple[int, int, int]]]":
        """Evaluate a minimal-interval source (lucene_ray.intervals
        factory tree — ordered/unordered/phrase/or_/maxgaps/containing/
        before/within/atLeast/...; queries/intervals package) against
        the index: {doc_id: [(start, end, gaps), ...]} for documents
        with at least one interval.  ``doc_ids`` restricts evaluation;
        otherwise candidates come from the tree's docID approximation
        over the posting lists.  Multi-term nodes expand against the
        term dictionary first."""
        import numpy as np

        import lucene_ray.intervals as iv

        from .search import (_packed_positions, _POS_BITS, _POS_MASK,
                             termdict_terms)

        if any(n.kind == "multiterm"
               for n in _walk_interval_nodes(source)):
            vocab = termdict_terms(self.reader).column("term")                 .to_pylist()
            source = iv.expand_multiterms(source, vocab)
        cache: dict = {}

        def packed(t: str):
            if t not in cache:
                k = _packed_positions(self.reader, t, 0)
                cache[t] = k if k is not None and len(k) \
                    else np.empty(0, np.uint64)
            return cache[t]

        def docs_of(src):
            if src.kind == "term":
                return np.unique(
                    (packed(src.term) >> _POS_BITS).astype(np.int64))
            kind, subs = iv.doc_approx_kind(src)
            if kind == "none":
                return np.empty(0, np.int64)
            sets = [docs_of(x) for x in subs]
            if kind == "and":
                out = sets[0]
                for x in sets[1:]:
                    out = np.intersect1d(out, x, assume_unique=True)
                return out
            if kind == "or":
                return np.unique(np.concatenate(sets)) if sets \
                    else np.empty(0, np.int64)
            return sets[0]

        cand = np.asarray(sorted(doc_ids), np.int64) \
            if doc_ids is not None else docs_of(source)
        out: dict[int, list] = {}
        for d in cand.tolist():
            def gp(field, t, _d=d):
                k = packed(t)
                lo = np.searchsorted(k, np.uint64(_d) << _POS_BITS)
                hi = np.searchsorted(k,
                                     np.uint64(_d + 1) << _POS_BITS)
                return (k[lo:hi] & _POS_MASK).astype(np.int64).tolist()
            ivs = iv.eval_doc(source, gp)
            if ivs:
                out[int(d)] = [(s, e, g) for s, e, g, _w in ivs]
        return out

    def memory_index(self):
        """A fresh single-document MemoryIndex (lucene_ray.memindex) —
        the percolation-side dual of this index."""
        from .memindex import MemoryIndex
        return MemoryIndex()


    @staticmethod
    def _hits(td: TopDocs) -> list[Hit]:
        return [Hit(int(d), float(s))
                for d, s in zip(td.doc_ids, td.scores)]


def _walk_interval_nodes(src):
    yield src
    for sub in getattr(src, "subs", ()) or ():
        if hasattr(sub, "kind"):
            yield from _walk_interval_nodes(sub)
