"""End-to-end index build + search tests.

Mirrors the reference's test strategy (SURVEY.md §5): tiny-corpus e2e
(TestDemo/TestSearch), postings invariants re-checked from the written index
(CheckIndex role), brute-force-vs-pruned hit checking (CheckHits.java:58),
and partition-count invariance (our substitute for LuceneTestCase's
randomized segment topology).
"""

import collections
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis import tokenize
from lucene_ray.build import build_index, verify_index
from lucene_ray.corpus import generate_corpus
from lucene_ray.search import (IndexReader, merge_topk, search_blockmax,
                               search_bruteforce)

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("corpus")
    t = generate_corpus(N_DOCS, seed=7)
    pq.write_table(t, str(d / "corpus.parquet"))
    return str(d / "corpus.parquet")


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, corpus_path, ray_session):
    d = str(tmp_path_factory.mktemp("index"))
    build_index(corpus_path, d, num_buckets=5, term_parts=8, salt_group=2,
                doc_order="key")
    return d


def naive_index(corpus_path):
    """Independent reference: pure-Python postings over tokenize()."""
    t = pq.read_table(corpus_path)
    rows = sorted(
        zip(t.column("repo").to_pylist(), t.column("path").to_pylist(),
            t.column("commit").to_pylist(), t.column("content").to_pylist()))
    postings = collections.defaultdict(dict)
    lengths = []
    for doc_id, (_, _, _, content) in enumerate(rows):
        toks = tokenize(content or "")
        lengths.append(len(toks))
        for tok in toks:
            postings[tok][doc_id] = postings[tok].get(doc_id, 0) + 1
    return postings, lengths, rows


@pytest.fixture(scope="module")
def naive(corpus_path):
    return naive_index(corpus_path)


def test_manifest_and_verify(index_dir, ray_session):
    res = verify_index(index_dir)
    assert res["ok"], res
    assert res["doc_count"] == N_DOCS


def test_docids_are_global_key_rank(index_dir, naive, ray_session):
    import ray.data
    dm = pq.read_table(os.path.join(index_dir, "docmeta"))
    # docmeta may span several files; sort by doc_id
    dm = dm.sort_by([("doc_id", "ascending")])
    keys = list(zip(dm.column("repo").to_pylist(),
                    dm.column("path").to_pylist(),
                    dm.column("commit").to_pylist()))
    expect = [(r, p, c) for r, p, c, _ in naive[2]]
    assert keys == expect
    assert dm.column("doc_id").to_pylist() == list(range(N_DOCS))


def test_field_lengths_and_sha(index_dir, naive, ray_session):
    import hashlib
    dm = pq.read_table(os.path.join(index_dir, "docmeta")).sort_by(
        [("doc_id", "ascending")])
    assert dm.column("field_len").to_pylist() == naive[1]
    shas = dm.column("sha256").to_pylist()
    for i, (_, _, _, content) in enumerate(naive[2]):
        assert shas[i] == hashlib.sha256((content or "").encode()).digest()


def test_postings_match_naive(index_dir, naive, ray_session):
    from lucene_ray.codec import decode_block
    reader = IndexReader(index_dir)
    postings, lengths, _ = naive
    # check every term, including heavy hitters and singletons
    for term, docmap in postings.items():
        p = reader.postings(term)
        assert p is not None, term
        assert p.df == len(docmap), term
        assert p.ttf == sum(docmap.values()), term
        got = {}
        for b in range(len(p.n)):
            d, tf, nm = decode_block(int(p.first_doc[b]), int(p.n[b]),
                                     p.docs_enc[b], p.tfs_enc[b],
                                     p.norms_enc[b])
            for dd, tt in zip(d, tf):
                got[int(dd)] = int(tt)
        assert got == docmap, term
    # absent term
    assert reader.postings("zz_no_such_term_zz") is None


QUERIES = [
    "return", "the", "getData", "foo_bar", "zz_absent_zz",
    "return value data", "idx tmp val ptr", "public static void",
    "getData getData",                      # duplicate clause
    "import return import",                 # duplicates + common
    "3.14 a1b2 foo_bar", "buf idx list map node key word line",
]


@pytest.mark.parametrize("k", [10, 100])
@pytest.mark.parametrize("q", QUERIES)
def test_checkhits_blockmax_equals_oracle(index_dir, q, k, ray_session):
    reader = IndexReader(index_dir)
    a = search_bruteforce(reader, q, k)
    b = search_blockmax(reader, q, k)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)
    assert b.blocks_decoded <= b.blocks_total


def test_blockmax_actually_prunes(index_dir, ray_session):
    # k=1 with a rare+common disjunction should skip blocks
    reader = IndexReader(index_dir)
    td = search_blockmax(reader, "return value data tmp idx buf", 1)
    assert td.blocks_total > 0
    # not a hard guarantee at this tiny scale, but with k=1 the threshold
    # rises fast; assert we at least computed bounds correctly
    assert td.blocks_decoded <= td.blocks_total


def test_scores_against_scalar_bm25(index_dir, naive, ray_session):
    """Scores equal a from-scratch scalar float32 BM25 with Lucene op order."""
    import struct

    from lucene_ray.smallfloat import LENGTH_TABLE, int_to_byte4

    def F(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    postings, lengths, _ = naive
    doc_count = len(lengths)
    sum_ttf = sum(lengths)
    reader = IndexReader(index_dir)
    q = "return data getData"
    td = search_bruteforce(reader, q, 10)
    import math
    expect = collections.defaultdict(float)
    for term in q.lower().split():
        docmap = postings.get(term)
        if not docmap:
            continue
        df = len(docmap)
        idf = F(math.log(1 + (doc_count - df + 0.5) / (df + 0.5)))
        avgdl = F(sum_ttf / doc_count)
        for doc, tf in docmap.items():
            nb = int(int_to_byte4(np.array([lengths[doc]]))[0])
            cache = F(1.0 / F(F(1.2) * F(F(0.25) + F(F(F(0.75) * float(LENGTH_TABLE[nb])) / avgdl))))
            s = F(idf - F(idf / F(1.0 + F(tf * cache))))
            expect[doc] += s  # float64 accumulation, clause order = query order
    exp_sorted = sorted(expect.items(), key=lambda kv: (-np.float32(kv[1]), kv[0]))[:10]
    assert [d for d, _ in exp_sorted] == td.doc_ids.tolist()
    got = {d: s for d, s in zip(td.doc_ids.tolist(), td.scores.tolist())}
    for d, s in exp_sorted:
        assert got[d] == np.float32(s)


def test_partition_count_invariance(corpus_path, index_dir, tmp_path_factory,
                                    ray_session):
    """Different bucket/term-partition counts → identical postings + top-k
    (replaces Lucene's randomized segment topology tests)."""
    d2 = str(tmp_path_factory.mktemp("index2"))
    build_index(corpus_path, d2, num_buckets=2, term_parts=3, salt_group=1,
                doc_order="key")
    r1, r2 = IndexReader(index_dir), IndexReader(d2)
    assert r1.doc_count == r2.doc_count and r1.sum_ttf == r2.sum_ttf
    for q in QUERIES:
        a = search_bruteforce(r1, q, 20)
        b = search_bruteforce(r2, q, 20)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)


def test_resume_skips_done_and_is_identical(corpus_path, index_dir,
                                            tmp_path_factory, ray_session):
    """Kill-and-rerun: delete some outputs + manifest, rebuild, identical."""
    import shutil
    d3 = str(tmp_path_factory.mktemp("index3"))
    build_index(corpus_path, d3, num_buckets=5, term_parts=8, salt_group=2,
                doc_order="key")
    # simulate partial failure: remove manifest, two segments + lineage,
    # one merge part + lineage
    os.remove(os.path.join(d3, "manifest.json"))
    segs = sorted(os.listdir(os.path.join(d3, "segments")))
    for s in segs[:2]:
        os.remove(os.path.join(d3, "segments", s))
    for f in sorted(os.listdir(os.path.join(d3, "_build", "seg_lineage")))[:2]:
        os.remove(os.path.join(d3, "_build", "seg_lineage", f))
    parts = sorted(os.listdir(os.path.join(d3, "postings")))
    os.remove(os.path.join(d3, "postings", parts[0]))
    mlin = sorted(os.listdir(os.path.join(d3, "_build", "merge_lineage")))
    os.remove(os.path.join(d3, "_build", "merge_lineage", mlin[0]))
    # postings derived from merged segments: on resume, merge parts not
    # removed are kept; removed ones rebuilt. NB: merge reads segments, so
    # deleted segments must be rebuilt first — which resume does.
    # To force the removed merge part to re-run we must also rerun its
    # groups; resume handles it via missing lineage.
    build_index(corpus_path, d3)  # resume: mode read from the stored plan
    r1, r3 = IndexReader(index_dir), IndexReader(d3)
    assert r3.doc_count == N_DOCS
    for q in QUERIES[:6]:
        a = search_bruteforce(r1, q, 20)
        b = search_bruteforce(r3, q, 20)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)


def test_merge_topk_comparator():
    d1 = (np.array([5, 3]), np.array([2.0, 1.0], dtype=np.float32))
    d2 = (np.array([1, 9]), np.array([2.0, 1.0], dtype=np.float32))
    docs, scores = merge_topk([d1, d2], 3)
    # tie on score 2.0 → doc 1 before doc 5
    assert docs.tolist() == [1, 5, 3]


def test_arrival_mode_equivalent_modulo_docids(corpus_path, index_dir,
                                               tmp_path_factory, ray_session):
    """doc_order="arrival" (no corpus shuffle) produces the same index
    contents up to the docID permutation: same stats, same df/ttf, and the
    same top-k result sets when hits are mapped back to doc keys."""
    d4 = str(tmp_path_factory.mktemp("index_arrival"))
    build_index(corpus_path, d4, term_parts=8, salt_group=2,
                doc_order="arrival")
    r_key, r_arr = IndexReader(index_dir), IndexReader(d4)
    assert r_arr.doc_count == r_key.doc_count
    assert r_arr.sum_ttf == r_key.sum_ttf

    def keymap(idx_dir):
        dm = pq.read_table(os.path.join(idx_dir, "docmeta"),
                           columns=["doc_id", "repo", "path", "commit"])
        return {d: (r, p, c) for d, r, p, c in
                zip(dm.column("doc_id").to_pylist(),
                    dm.column("repo").to_pylist(),
                    dm.column("path").to_pylist(),
                    dm.column("commit").to_pylist())}

    mk, ma = keymap(index_dir), keymap(d4)
    for q in QUERIES[:8]:
        a = search_bruteforce(r_key, q, 15)
        b = search_blockmax(r_arr, q, 15)
        # same scores in order, and same doc keys at each rank (ties can
        # permute within equal scores — compare as sets per score)
        np.testing.assert_array_equal(a.scores, b.scores)
        ka = [mk[int(d)] for d in a.doc_ids]
        kb = [ma[int(d)] for d in b.doc_ids]
        i = 0
        while i < len(a.scores):
            j = i
            while j < len(a.scores) and a.scores[j] == a.scores[i]:
                j += 1
            assert set(ka[i:j]) == set(kb[i:j]), q
            i = j


def test_phrase_positions(tmp_path_factory, corpus_path, ray_session):
    """Positions round-trip + exact phrase matching (incl. overlapping
    occurrences) vs a naive Python scan."""
    from lucene_ray.search import phrase_freqs, search_phrase

    d = str(tmp_path_factory.mktemp("index_pos"))
    build_index(corpus_path, d, num_buckets=3, term_parts=4, salt_group=1,
                doc_order="key", with_positions=True)
    r = IndexReader(d)
    postings, lengths, rows = naive_index(corpus_path)

    def naive_phrase(terms):
        out = {}
        for doc_id, (_, _, _, content) in enumerate(rows):
            toks = tokenize(content or "")
            c = 0
            for i in range(len(toks) - len(terms) + 1):
                if toks[i:i + len(terms)] == terms:
                    c += 1
            if c:
                out[doc_id] = c
        return out

    for terms in (["return", "value"], ["the", "the"], ["getdata"],
                  ["public", "static", "void"], ["zzmissing", "x"]):
        assert phrase_freqs(r, terms) == naive_phrase(terms), terms

    td = search_phrase(r, "return value", 10)
    assert len(td.doc_ids) == len(td.scores)


def test_incremental_append(tmp_path_factory, ray_session):
    """append_to_index == one-shot build over the union (file order makes
    the docID assignment identical)."""
    from lucene_ray.build import append_to_index

    d = tmp_path_factory.mktemp("inc")
    ca, cb, cab = str(d / "a"), str(d / "b"), str(d / "ab")
    for p in (ca, cb, cab):
        os.makedirs(p)
    t = generate_corpus(200, seed=11)
    pq.write_table(t.slice(0, 120), os.path.join(ca, "part_a.parquet"))
    pq.write_table(t.slice(120), os.path.join(cb, "part_b.parquet"))
    pq.write_table(t.slice(0, 120), os.path.join(cab, "part_a.parquet"))
    pq.write_table(t.slice(120), os.path.join(cab, "part_b.parquet"))

    inc_dir = str(d / "idx_inc")
    build_index(ca, inc_dir, term_parts=4, salt_group=1)
    m1 = append_to_index(inc_dir, cb)
    assert m1.doc_count == 200
    # re-appending the same files is a no-op (idempotent resume)
    m2 = append_to_index(inc_dir, cb)
    assert m2.doc_count == 200

    full_dir = str(d / "idx_full")
    build_index(cab, full_dir, term_parts=4, salt_group=1)

    r1, r2 = IndexReader(inc_dir), IndexReader(full_dir)
    assert r1.doc_count == r2.doc_count and r1.sum_ttf == r2.sum_ttf
    for q in QUERIES[:8]:
        a = search_bruteforce(r1, q, 20)
        b = search_bruteforce(r2, q, 20)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)


def test_search_after_paging(index_dir, ray_session):
    from lucene_ray.search import search_after

    r = IndexReader(index_dir)
    q = "return value data"
    full = search_bruteforce(r, q, 30)
    page1_d, page1_s = full.doc_ids[:10], full.scores[:10]
    page2 = search_after(r, q, 10, float(page1_s[-1]), int(page1_d[-1]))
    np.testing.assert_array_equal(page2.doc_ids, full.doc_ids[10:20])
    np.testing.assert_array_equal(page2.scores, full.scores[10:20])


@pytest.mark.parametrize("q", ["return", "return value data",
                               "the a of data value", "zzmissing return"])
def test_search_after_all_pages(index_dir, q, ray_session):
    """Every page of the growing-m pruned pager equals brute-force paging,
    through exhaustion (the last, short page included)."""
    from lucene_ray.search import search_after

    r = IndexReader(index_dir)
    full = search_bruteforce(r, q, 1 << 20)
    k = 7
    pos = k
    prev_s, prev_d = (float(full.scores[k - 1]), int(full.doc_ids[k - 1])) \
        if len(full.doc_ids) >= k else (None, None)
    while prev_s is not None:
        page = search_after(r, q, k, prev_s, prev_d)
        want_d = full.doc_ids[pos:pos + k]
        want_s = full.scores[pos:pos + k]
        np.testing.assert_array_equal(page.doc_ids, want_d)
        np.testing.assert_array_equal(page.scores, want_s)
        if len(page.doc_ids) < k:
            break
        prev_s, prev_d = float(page.scores[-1]), int(page.doc_ids[-1])
        pos += k


def test_boosted_query(index_dir, ray_session):
    from lucene_ray.search import search_boosted

    r = IndexReader(index_dir)
    plain = search_boosted(r, "return value", 10)
    ref = search_bruteforce(r, "return value", 10)
    np.testing.assert_array_equal(plain.doc_ids, ref.doc_ids)
    np.testing.assert_array_equal(plain.scores, ref.scores)
    boosted = search_boosted(r, "return^3 value", 10)
    assert not np.array_equal(boosted.scores, plain.scores)


def test_sliced_search_equals_global(index_dir, ray_session):
    from lucene_ray.search import search_sliced

    r = IndexReader(index_dir)
    for q in ("return value data", "the", "idx tmp val ptr"):
        ref = search_bruteforce(r, q, 15)
        d, s = search_sliced(index_dir, q, 15, n_slices=3, concurrency=2)
        np.testing.assert_array_equal(d, ref.doc_ids)
        np.testing.assert_array_equal(s, ref.scores)


def test_blockmax_range_and_theta(index_dir, ray_session):
    """Range-restricted block-max equals range-filtered brute force; a
    theta0 seeded with the true k-th score still returns the exact
    top-k (tie-safe pruning) — the MaxScoreAccumulator contract."""
    from lucene_ray.search import _topk

    r = IndexReader(index_dir)
    for q in ("return value data", "the", "idx tmp val ptr",
              "import return import"):
        full = search_bruteforce(r, q, 1 << 20)
        lo, hi = 50, 220
        m = (full.doc_ids >= lo) & (full.doc_ids < hi)
        want_d, want_s = _topk(full.doc_ids[m], full.scores[m], 10)
        got = search_blockmax(r, q, 10, lo=lo, hi=hi)
        np.testing.assert_array_equal(got.doc_ids, want_d)
        np.testing.assert_array_equal(got.scores, want_s)
        g10 = search_bruteforce(r, q, 10)
        if len(g10.doc_ids) == 10:
            got2 = search_blockmax(r, q, 10, theta0=float(g10.scores[-1]))
            np.testing.assert_array_equal(got2.doc_ids, g10.doc_ids)
            np.testing.assert_array_equal(got2.scores, g10.scores)


def test_sliced_threshold_sharing(index_dir, ray_session):
    from lucene_ray.search import search_sliced

    r = IndexReader(index_dir)
    for q in ("return value data", "buf idx list map node key word line"):
        ref = search_bruteforce(r, q, 15)
        d, s = search_sliced(index_dir, q, 15, n_slices=3, concurrency=2,
                             share_threshold=True)
        np.testing.assert_array_equal(d, ref.doc_ids)
        np.testing.assert_array_equal(s, ref.scores)


def test_query_parser(ray_session):
    from lucene_ray.queryparser import parse

    p = parse('return +value -data "public static" content:foo bar^2 x AND y')
    kinds = [(c.kind, c.text, c.occur, c.boost) for c in p.clauses]
    assert ("term", "return", "SHOULD", 1.0) in kinds
    assert ("term", "value", "MUST", 1.0) in kinds
    assert ("term", "data", "MUST_NOT", 1.0) in kinds
    assert ("phrase", "public static", "SHOULD", 1.0) in kinds
    assert ("term", "foo", "SHOULD", 1.0) in kinds       # content: stripped
    assert ("term", "bar", "SHOULD", 2.0) in kinds
    assert ("term", "x", "MUST", 1.0) in kinds           # x AND y
    assert ("term", "y", "MUST", 1.0) in kinds


def test_query_parser_extended(ray_session):
    from lucene_ray.queryparser import parse

    p = parse('(a b)^2 AND c')
    assert p.clauses[0].kind == "group" and p.clauses[0].boost == 2.0
    assert [(s.kind, s.text) for s in p.clauses[0].sub.clauses] == \
        [("term", "a"), ("term", "b")]
    assert p.clauses[0].occur == "MUST" and p.clauses[1].occur == "MUST"
    p = parse('lang:[aa TO bb] content:{c TO d} te?m* fuzz~1 plain~ "a b"~3')
    kinds = [(c.kind, c.field_name, c.lo, c.hi, c.incl_lo, c.incl_hi,
              c.maxdist, c.slop) for c in p.clauses]
    assert kinds[0] == ("range", "lang", "aa", "bb", True, True, 2, 0)
    assert kinds[1] == ("range", "", "c", "d", False, False, 2, 0)
    assert p.clauses[2].kind == "wildcard" and p.clauses[2].text == "te?m*"
    assert p.clauses[3].kind == "fuzzy" and p.clauses[3].maxdist == 1
    assert p.clauses[4].kind == "fuzzy" and p.clauses[4].maxdist == 2
    assert p.clauses[5].kind == "phrase" and p.clauses[5].slop == 3


def test_search_parsed_extended(index_dir, ray_session):
    """Grouping, ranges, wildcard and fuzzy execute with the documented
    semantics on a real index."""
    from lucene_ray.search import (expand_multiterm, search_parsed,
                                   termdict_scan, _term_docset)
    from lucene_ray.queryparser import parse

    r = IndexReader(index_dir)
    # group with boost 1 == flat query (within float ulp re-accumulation)
    g = search_parsed(r, "(return value) data", 10)
    f = search_parsed(r, "return value data", 10)
    np.testing.assert_array_equal(g.doc_ids, f.doc_ids)
    np.testing.assert_allclose(g.scores, f.scores, rtol=1e-6)
    # boosted group doubles the sub contribution
    b = search_parsed(r, "(return)^2", 10)
    s1 = search_parsed(r, "return", 10)
    np.testing.assert_array_equal(b.doc_ids, s1.doc_ids)
    np.testing.assert_allclose(b.scores, 2.0 * s1.scores, rtol=1e-6)
    # range: constant-score docs = union of in-range terms' docsets
    c = parse("[aa TO ac]").clauses[0]
    terms = expand_multiterm(r, c)
    assert terms == termdict_scan(r, lo="aa", hi="ac\x00").column(
        "term").to_pylist()
    td = search_parsed(r, "[aa TO ac]", 1000)
    want = np.unique(np.concatenate(
        [_term_docset(r, t) for t in terms])) if terms else []
    np.testing.assert_array_equal(np.sort(td.doc_ids), want)
    assert np.all(td.scores == np.float32(1.0))
    # wildcard and fuzzy doc sets
    td = search_parsed(r, "retur*", 50)
    want = np.unique(_term_docset(r, "return"))
    assert set(want).issubset(set(td.doc_ids.tolist())) or len(want) > 50
    # MUST_NOT with a wildcard clause
    td = search_parsed(r, "value -retur*", 10_000)
    assert not set(td.doc_ids.tolist()) & set(
        _term_docset(r, "return").tolist())


def test_search_parsed_semantics(tmp_path_factory, corpus_path, ray_session):
    from lucene_ray.search import search_parsed

    d = str(tmp_path_factory.mktemp("index_qp"))
    build_index(corpus_path, d, num_buckets=3, term_parts=4, salt_group=1,
                doc_order="key", with_positions=True)
    r = IndexReader(d)
    # pure SHOULD == free-text search
    a = search_parsed(r, "return value", 15)
    b = search_bruteforce(r, "return value", 15)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)
    # MUST filters
    m = search_parsed(r, "+return +value", 1000)
    from lucene_ray.search import search_boolean
    expect = search_boolean(r, must=["return", "value"])
    assert set(m.doc_ids.tolist()) == set(expect.tolist())
    # MUST_NOT excludes
    n = search_parsed(r, "return -value", 1000)
    has_value = set(search_boolean(r, must=["value"]).tolist())
    assert not (set(n.doc_ids.tolist()) & has_value)
    # phrase clause runs
    ph = search_parsed(r, '"return value"', 10)
    assert ph.total_candidates >= 0


def test_verify_detects_corruption(tmp_path_factory, corpus_path,
                                   ray_session):
    """CheckIndex role: verify_index notices missing/corrupt partitions."""
    import shutil
    d = str(tmp_path_factory.mktemp("index_corrupt"))
    build_index(corpus_path, d, num_buckets=3, term_parts=4, salt_group=1)
    assert verify_index(d)["ok"]
    # corrupt: drop a docmeta partition
    victims = sorted(os.listdir(os.path.join(d, "docmeta")))
    os.remove(os.path.join(d, "docmeta", victims[0]))
    assert not verify_index(d)["ok"]


def test_api_facade(tmp_path_factory, corpus_path, ray_session):
    from lucene_ray.api import Index

    d = str(tmp_path_factory.mktemp("index_api"))
    idx = Index.build(corpus_path, d, term_parts=4, salt_group=1,
                      with_positions=True)
    assert idx.doc_count() == N_DOCS
    hits = idx.search("return value", 5)
    assert hits and hits[0].score >= hits[-1].score
    ref = search_bruteforce(idx.reader, "return value", 5)
    assert [h.doc_id for h in hits] == ref.doc_ids.tolist()
    # parser routing
    parsed = idx.search("+return -value", 5)
    assert all(h.doc_id not in set(
        search_bruteforce(idx.reader, "value", 10**6).doc_ids.tolist())
        for h in parsed)
    # paging
    page2 = idx.search_after("return value", 5, hits[-1])
    assert not ({h.doc_id for h in hits} & {h.doc_id for h in page2})
    df, ttf = idx.term_stats("return")
    assert df > 0 and ttf >= df
    assert idx.verify()["ok"]
    # simple query language: never throws, set semantics match boolean
    s1 = set(idx.simple_search("return + value"))
    both = set(search_bruteforce(idx.reader, "return", 10**6)
               .doc_ids.tolist()) \
        & set(search_bruteforce(idx.reader, "value", 10**6)
              .doc_ids.tolist())
    assert s1 == both
    assert idx.simple_search("((((") == []          # degraded, no throw
    assert set(idx.simple_search("*")) == set(range(idx.doc_count()))
    # profiler counters
    prof = idx.profile("return value")
    assert prof["hits"] <= 10 and \
        prof["blocks_decoded"] <= prof["blocks_total"]


def test_hot_term_skew_split(tmp_path_factory, ray_session):
    """A term present in EVERY doc (df == N, the skew case) must be split
    across salt groups into multiple postings rows with disjoint doc
    ranges, and search must still be exact."""
    import pyarrow as pa
    d = tmp_path_factory.mktemp("hot")
    corpus_dir = str(d / "corpus")
    os.makedirs(corpus_dir)
    # 4 files so arrival mode makes 4 segments; "hotword" in every doc
    for f in range(4):
        rows = {
            "repo": [f"r{f}"] * 50,
            "path": [f"p{f}_{i}.py" for i in range(50)],
            "commit": ["c" * 40] * 50,
            "lang": ["py"] * 50,
            "content": [f"hotword item{f}_{i} filler{i % 7}"
                        for i in range(50)],
        }
        pq.write_table(pa.table(rows),
                       os.path.join(corpus_dir, f"f{f}.parquet"))
    idx = str(d / "idx")
    build_index(corpus_dir, idx, term_parts=2, salt_group=1)
    r = IndexReader(idx)
    p = r.postings("hotword")
    assert p.df == 200
    # salt_group=1 → one salt group per segment → ≥4 disjoint row-chunks;
    # verify block doc-ranges cover all docs exactly once
    from lucene_ray.codec import decode_blocks
    docs, tfs, _, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                    p.tfs_enc, p.norms_enc)
    assert sorted(docs.tolist()) == list(range(200))
    td = search_bruteforce(r, "hotword", 5)
    tb = search_blockmax(r, "hotword", 5)
    np.testing.assert_array_equal(td.doc_ids, tb.doc_ids)
    np.testing.assert_array_equal(td.scores, tb.scores)
    # every doc has the same score for hotword (same tf, similar norms per
    # content shape) — tie-break must yield lowest doc ids
    assert td.doc_ids.tolist() == sorted(td.doc_ids.tolist())


def test_sloppy_existence_randomized(tmp_path_factory, ray_session):
    """Property test: greedy sloppy match EXISTENCE equals the
    brute-force distinct-position window check on random small docs,
    across random phrases (with and without repeats) and slops."""
    import itertools
    import pyarrow as pa
    from lucene_ray.search import sloppy_phrase_freqs

    rng = np.random.default_rng(77)
    vocab = list("abcdefg")
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 14))))
            for _ in range(40)]
    d = tmp_path_factory.mktemp("sloppyrand")
    cdir = str(d / "c")
    os.makedirs(cdir)
    pq.write_table(pa.table({
        "repo": ["r"] * len(docs),
        "path": [f"p{i}.py" for i in range(len(docs))],
        "commit": ["c" * 40] * len(docs),
        "lang": ["py"] * len(docs),
        "content": docs,
    }), os.path.join(cdir, "f.parquet"))
    idx = str(d / "i")
    build_index(cdir, idx, term_parts=2, salt_group=1, with_positions=True)
    r = IndexReader(idx)

    def naive_exists(doc, terms, slop):
        toks = docs[doc].split()
        plists = [[i for i, t in enumerate(toks) if t == q] for q in terms]
        if any(not p for p in plists):
            return False
        for combo in itertools.product(*plists):
            by_term = {}
            ok = True
            for q, p in zip(terms, combo):
                if p in by_term.setdefault(q, set()):
                    ok = False
                    break
                by_term[q].add(p)
            if ok:
                adj = [p - i for i, p in enumerate(combo)]
                if max(adj) - min(adj) <= slop:
                    return True
        return False

    for trial in range(60):
        nterms = int(rng.integers(2, 4))
        terms = [vocab[int(rng.integers(len(vocab)))]
                 for _ in range(nterms)]
        slop = int(rng.integers(0, 6))
        fr = sloppy_phrase_freqs(r, terms, slop)
        for doc in range(len(docs)):
            assert (doc in fr) == naive_exists(doc, terms, slop), \
                (trial, terms, slop, doc, docs[doc])


def test_count_and_explain(index_dir, ray_session):
    """Exact hit counting + Explanation parity: the clause sum is
    bit-identical to the engine's score for the doc."""
    from lucene_ray.search import count_hits, explain

    r = IndexReader(index_dir)
    for q in ("return", "return value data", "zz_absent_zz"):
        full = search_bruteforce(r, q, 1 << 20)
        assert count_hits(r, q) == len(full.doc_ids), q
    td = search_bruteforce(r, "return data getData", 5)
    for d, s in zip(td.doc_ids, td.scores):
        ex = explain(r, "return data getData", int(d))
        assert np.float32(ex["total_score"]) == s
        assert any(c.get("match") for c in ex["clauses"])
        for c in ex["clauses"]:
            if c.get("match"):
                assert c["tf"] >= 1 and c["df"] >= 1 and c["score"] > 0


def test_k_must_be_positive(index_dir, ray_session):
    # TopScoreDocCollector requires numHits > 0; we match
    r = IndexReader(index_dir)
    for fn in (search_bruteforce, search_blockmax):
        with pytest.raises(ValueError):
            fn(r, "return", 0)


def test_keyword_fields(tmp_path_factory, corpus_path, ray_session):
    """StringField-style keyword terms: 'field:value' in the unified
    dictionary; usable as Boolean filters and via the parser."""
    from lucene_ray.search import search_boolean, search_parsed

    d = str(tmp_path_factory.mktemp("index_kw"))
    build_index(corpus_path, d, term_parts=4, salt_group=1,
                keyword_fields=["repo", "lang"])
    assert verify_index(d)["ok"]
    r = IndexReader(d)
    dm = pq.read_table(os.path.join(d, "docmeta"),
                       columns=["doc_id", "repo", "lang"])
    langs = dm.column("lang").to_pylist()
    ids = dm.column("doc_id").to_pylist()
    expect_py = sorted(i for i, l in zip(ids, langs) if l == "py")
    p = r.postings("lang:py")
    assert p is not None and p.df == len(expect_py)
    got = search_boolean(r, must=["lang:py"])
    assert got.tolist() == expect_py
    # combined keyword filter + scored content term via the parser
    td = search_parsed(r, "+lang:py return", 1000)
    # MUST filters; SHOULD is optional (BooleanQuery semantics) — every
    # lang:py doc matches, those also containing "return" score higher
    assert set(td.doc_ids.tolist()) == set(expect_py)
    assert np.all(np.diff(td.scores.astype(np.float64)) <= 0)
    # absent keyword
    assert r.postings("lang:zz") is None
    # wildcard on a keyword field targets the "field:value" terms
    from lucene_ray.search import _term_docset
    td_kw = search_parsed(r, "lang:p*", 10_000)
    np.testing.assert_array_equal(np.sort(td_kw.doc_ids),
                                  np.sort(_term_docset(r, "lang:py")))


def test_exact_block_size_term_has_impacts(tmp_path_factory, ray_session):
    """A term with df exactly BLOCK_SIZE in one segment must carry exact
    impact metadata into the final postings (regression: the vectorized
    small-term path once included ==128 and shipped empty impacts, which
    block-max pruning would treat as bound 0 → wrongly skipped)."""
    import pyarrow as pa
    from lucene_ray.codec import BLOCK_SIZE
    d = tmp_path_factory.mktemp("b128")
    cdir = str(d / "c")
    os.makedirs(cdir)
    n = BLOCK_SIZE
    rows = {
        "repo": ["r"] * (n + 40),
        "path": [f"p{i:04d}.py" for i in range(n + 40)],
        "commit": ["c" * 40] * (n + 40),
        "lang": ["py"] * (n + 40),
        # "exact128" in exactly the first 128 docs; filler elsewhere
        "content": [("exact128 pad word " + f"u{i}") if i < n
                    else ("pad word " + f"u{i}") for i in range(n + 40)],
    }
    pq.write_table(pa.table(rows), os.path.join(cdir, "f.parquet"))
    idx = str(d / "i")
    build_index(cdir, idx, term_parts=2, salt_group=1)
    r = IndexReader(idx)
    p = r.postings("exact128")
    assert p.df == n
    full = [b for b in range(len(p.n)) if p.n[b] == BLOCK_SIZE]
    assert full and all(len(p.imp_freq[b]) > 0 for b in full)
    a = search_bruteforce(r, "exact128 pad", 10)
    b = search_blockmax(r, "exact128 pad", 10)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)


def test_merged_blocks_disjoint_doc_ranges(tmp_path_factory, ray_session):
    """Regression (ADVICE r1, high): when segment A contributes only a tail
    and a LATER segment B contributes full 128-blocks for the same term,
    re-blocking A's tail together with B's tail created a block whose doc
    range overlapped B's full blocks — decode_blocks output was then not
    doc-sorted and searchsorted membership tests (more_like_this) missed
    docs. The merger must re-block tails per run (never across a full
    block of the same term), keeping block doc ranges disjoint ascending
    as the TermPostings contract states."""
    import pyarrow as pa
    from lucene_ray.codec import BLOCK_SIZE, decode_blocks
    d = tmp_path_factory.mktemp("overlap")
    cdir = str(d / "c")
    os.makedirs(cdir)

    def mk(nfile, n):
        rows = {
            "repo": ["r"] * n,
            "path": [f"f{nfile}_{i:04d}.py" for i in range(n)],
            "commit": ["c" * 40] * n,
            "lang": ["py"] * n,
            "content": [f"common filler u{nfile}x{i}" for i in range(n)],
        }
        pq.write_table(pa.table(rows),
                       os.path.join(cdir, f"{nfile}.parquet"))

    mk(0, 50)                      # segment 0: tail only (50 < 128)
    mk(1, 200)                     # segment 1: one full block + tail
    idx = str(d / "i")
    build_index(cdir, idx, term_parts=2, salt_group=4,  # one merge group
                with_term_vectors=True)
    r = IndexReader(idx)
    for term in ("common", "filler"):
        p = r.postings(term)
        assert p.df == 250
        # block ranges disjoint ascending
        assert all(int(p.last_doc[b]) < int(p.first_doc[b + 1])
                   for b in range(len(p.n) - 1))
        docs, _, _, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                      p.tfs_enc, p.norms_enc)
        assert np.all(np.diff(docs) > 0)          # globally doc-sorted
        np.testing.assert_array_equal(docs, np.arange(250))
    # term-vector forward index: byte-sorted per-doc (terms, tfs)
    terms, tfs = r.term_vector(60)
    assert terms == ["common", "filler", "u1x10"]
    assert tfs.tolist() == [1, 1, 1]
    assert r.df("common") == 250
    with pytest.raises(KeyError):
        r.term_vector(10_000)
    # more_like_this via the term-vector forward index on this layout
    from lucene_ray.search import more_like_this
    sel, td = more_like_this(r, 60, k=5, max_query_terms=2)
    assert "u1x10" in sel          # the doc's own unique term is seen
    assert len(td.doc_ids) > 0


def test_sloppy_phrase(tmp_path_factory, ray_session):
    """Sloppy phrase matcher vs the reference's documented behavior:
    SloppyPhraseMatcher.java class javadoc — query "a b"~2 on
    "x a b a y" matches twice (distances 0 and 2) → freq = 1 + 1/3."""
    import itertools
    import pyarrow as pa
    from lucene_ray.search import (phrase_freqs, search_phrase,
                                   sloppy_phrase_freqs)

    docs = ["x a b a y", "a b c b a", "a y b", "b a", "x y z w a"]
    d = tmp_path_factory.mktemp("sloppy")
    cdir = str(d / "c")
    os.makedirs(cdir)
    pq.write_table(pa.table({
        "repo": ["r"] * len(docs),
        "path": [f"p{i}.py" for i in range(len(docs))],
        "commit": ["c" * 40] * len(docs),
        "lang": ["py"] * len(docs),
        "content": docs,
    }), os.path.join(cdir, "f.parquet"))
    idx = str(d / "i")
    build_index(cdir, idx, term_parts=2, salt_group=1, with_positions=True)
    r = IndexReader(idx)

    fr = sloppy_phrase_freqs(r, ["a", "b"], 2)
    third = np.float32(np.float32(1.0) / np.float32(3.0))
    assert set(fr) == {0, 1, 2, 3}
    np.testing.assert_equal(fr[0], np.float32(np.float32(1.0) + third))
    np.testing.assert_equal(fr[1], np.float32(np.float32(1.0) + third))
    np.testing.assert_equal(fr[2], np.float32(0.5))      # distance 1
    np.testing.assert_equal(fr[3], third)                # distance 2

    # slop=0 greedy == exact phrase counts
    for terms in (["a", "b"], ["b", "a"], ["x", "a", "b"]):
        exact = phrase_freqs(r, terms)
        sl0 = sloppy_phrase_freqs(r, terms, 0)
        assert {k: float(v) for k, v in sl0.items()} == \
            {k: float(v) for k, v in exact.items()}

    # existence == brute-force window check, several phrases and slops
    def naive_exists(doc, terms, slop):
        toks = docs[doc].split()
        plists = [[i - off for i, t in enumerate(toks) if t == q]
                  for off, q in enumerate(terms)]
        if any(not p for p in plists):
            return False
        return any(max(c) - min(c) <= slop
                   for c in itertools.product(*plists))

    for terms, slop in [(["a", "b"], 0), (["a", "b"], 1), (["a", "b"], 3),
                        (["b", "a"], 2), (["x", "b"], 2), (["x", "y", "a"], 4),
                        (["w", "a"], 0)]:
        fr = sloppy_phrase_freqs(r, terms, slop)
        for doc in range(len(docs)):
            assert (doc in fr) == naive_exists(doc, terms, slop), \
                (terms, slop, doc)

    # repeating query terms (rptGroups machinery): two slots of one term
    # must occupy DISTINCT actual positions
    def naive_exists_rpt(doc, terms, slop):
        toks = docs[doc].split()
        plists = [[i for i, t in enumerate(toks) if t == q] for q in terms]
        if any(not p for p in plists):
            return False
        for combo in itertools.product(*plists):
            by_term = {}
            ok = True
            for q, p in zip(terms, combo):
                if p in by_term.setdefault(q, set()):
                    ok = False
                    break
                by_term[q].add(p)
            if not ok:
                continue
            adj = [p - i for i, p in enumerate(combo)]
            if max(adj) - min(adj) <= slop:
                return True
        return False

    assert set(sloppy_phrase_freqs(r, ["a", "a"], 1)) == {0}
    assert set(sloppy_phrase_freqs(r, ["a", "a"], 3)) == {0, 1}
    for terms, slop in [(["a", "a"], 0), (["a", "a"], 2), (["a", "a"], 5),
                        (["a", "b", "a"], 2), (["a", "b", "a"], 4),
                        (["b", "a", "b"], 3), (["a", "a", "a"], 4)]:
        fr = sloppy_phrase_freqs(r, terms, slop)
        for doc in range(len(docs)):
            assert (doc in fr) == naive_exists_rpt(doc, terms, slop), \
                (terms, slop, doc)

    # MultiPhraseQuery on the same tiny corpus: docs are
    # 0:"x a b a y" 1:"a b c b a" 2:"a y b" 3:"b a" 4:"x y z w a"
    from lucene_ray.search import multi_phrase_freqs, search_multi_phrase
    # slot0∈{a,b}, slot1∈{b,y}: doc0 matches twice (a@1 b@2, a@3 y@4)
    assert multi_phrase_freqs(r, [["a", "b"], ["b", "y"]]) == \
        {0: 2, 1: 1, 2: 1}
    assert multi_phrase_freqs(r, [["x"], ["a", "y"]]) == {0: 1, 4: 1}
    assert multi_phrase_freqs(r, [["zz"], ["a"]]) == {}
    td_mp = search_multi_phrase(r, [["x"], ["a", "y"]], 10)
    assert set(td_mp.doc_ids.tolist()) == {0, 4}
    assert np.all(td_mp.scores > 0)

    # sloppy MultiPhrase (union slots through the greedy matcher):
    # existence == brute-force window over per-slot union choices
    from lucene_ray.search import sloppy_multi_phrase_freqs

    def naive_mp_exists(doc, sets, slop):
        toks = docs[doc].split()
        plists = [[i - off for i, t in enumerate(toks) if t in ts]
                  for off, ts in enumerate(sets)]
        if any(not p for p in plists):
            return False
        return any(max(c) - min(c) <= slop
                   for c in itertools.product(*plists))

    for sets, slop in [([["x"], ["a", "y"]], 0),
                       ([["x"], ["a", "y"]], 2),
                       ([["c", "z"], ["b", "w"]], 1),
                       ([["x", "c"], ["y", "w"], ["a", "z"]], 3)]:
        fr = sloppy_multi_phrase_freqs(r, sets, slop)
        for doc in range(len(docs)):
            assert (doc in fr) == naive_mp_exists(doc, sets, slop), \
                (sets, slop, doc)
    # multi-term repeats (hasMultiTermRpts): grouped slots never occupy
    # the same actual position; docs = 0:"x a b a y" 1:"a b c b a"
    # 2:"a y b" 3:"b a" 4:"x y z w a"
    assert set(sloppy_multi_phrase_freqs(r, [["a", "b"], ["b"]], 0)) == \
        {0, 1}

    def naive_mp_rpt_exists(doc, sets, slop):
        toks = docs[doc].split()
        plists = [[i for i, t in enumerate(toks) if t in ts]
                  for ts in sets]
        if any(not p for p in plists):
            return False
        for combo in itertools.product(*plists):
            if len(set(combo)) != len(combo):   # grouped slots distinct
                continue
            adj = [p - i for i, p in enumerate(combo)]
            if max(adj) - min(adj) <= slop:
                return True
        return False

    # With multi-term repeats Lucene's greedy is intentionally
    # approximate (class javadoc: "possibly not all valid combinations
    # are encountered") — e.g. doc "b a" for [a|b][b]~2: the initial
    # collision at position 0 advances the exhausted slot and gives up,
    # though (a@1, b@0) would fit. So assert SOUNDNESS (every greedy
    # match is a valid assignment) + exact goldens from hand traces of
    # the reference algorithm.
    for sets, slop in [([["a", "b"], ["b"]], 0),
                       ([["a", "b"], ["b"]], 2),
                       ([["a", "b"], ["b", "y"], ["a"]], 3),
                       ([["a"], ["b", "a"]], 1)]:
        fr = sloppy_multi_phrase_freqs(r, sets, slop)
        for doc in fr:
            assert naive_mp_rpt_exists(doc, sets, slop), (sets, slop, doc)
    fr = sloppy_multi_phrase_freqs(r, [["a", "b"], ["b"]], 2)
    assert set(fr) == {0, 1, 2}
    np.testing.assert_equal(fr[2], np.float32(0.5))   # hand-traced

    td = search_phrase(r, "a b", 10, slop=2)
    assert set(td.doc_ids.tolist()) == {0, 1, 2, 3}
    assert np.all(np.diff(td.scores) <= 0) or len(td.scores) <= 1


def test_deletes_live_docs(tmp_path_factory, corpus_path, ray_session):
    """Tombstone deletes: persistent generations + reader overlay filter
    every search path; stats stay delete-blind (Lucene pre-merge
    semantics); updateDocument = delete-by-key + append."""
    import shutil
    from lucene_ray.build import delete_by_term, delete_docs
    from lucene_ray.search import (search_boolean, search_phrase,
                                   search_synonym)

    d = str(tmp_path_factory.mktemp("del") / "i")
    # private copy of the index so tombstones don't leak to other tests
    build_index(corpus_path, d, num_buckets=3, term_parts=4, salt_group=1,
                doc_order="key", with_positions=True)
    r0 = IndexReader(d)
    base_docs = search_bruteforce(r0, "return", 10_000)
    victims = base_docs.doc_ids[:3].tolist()
    assert delete_docs(d, victims) == 3
    r1 = IndexReader(d)
    # stats unchanged (delete-blind), results filtered
    assert r1.doc_count == r0.doc_count
    assert r1.postings("return").df == r0.postings("return").df
    after = search_bruteforce(r1, "return", 10_000)
    assert not set(victims) & set(after.doc_ids.tolist())
    assert len(after.doc_ids) == len(base_docs.doc_ids) - 3
    # pruned engine agrees with brute force under deletes
    a = search_blockmax(r1, "return value data", 10)
    b = search_bruteforce(r1, "return value data", 10)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)
    # boolean + phrase + synonym paths filter too
    assert not set(victims) & set(search_boolean(r1, must=["return"]).tolist())
    ph = search_phrase(r1, "return val", 1000)
    assert not set(victims) & set(ph.doc_ids.tolist())
    sy = search_synonym(r1, ["return", "val"], 1000)
    assert not set(victims) & set(sy.doc_ids.tolist())
    # delete_by_term generation stacks on top
    n2 = delete_by_term(d, "val")
    r2 = IndexReader(d)
    assert len(search_bruteforce(r2, "val", 10_000).doc_ids) == 0
    assert n2 > 0
    shutil.rmtree(d)


def test_compact_expunge_deletes(tmp_path_factory, corpus_path, ray_session):
    """compact_index(expunge_deletes=True) = Lucene merge applying
    liveDocs: tombstoned docs leave postings, docmeta and the collection
    stats; tombstones clear; CheckIndex verify stays green."""
    import shutil
    from lucene_ray.build import compact_index, delete_docs, verify_index

    d = str(tmp_path_factory.mktemp("expunge") / "i")
    build_index(corpus_path, d, num_buckets=3, term_parts=4, salt_group=1,
                doc_order="key", with_positions=True,
                keyword_fields=["lang"])
    r0 = IndexReader(d)
    pre = search_bruteforce(r0, "return", 10_000)
    victims = pre.doc_ids[:4].tolist()
    delete_docs(d, victims)
    m = compact_index(d, expunge_deletes=True)
    r1 = IndexReader(d)
    assert len(r1.deleted) == 0                     # tombstones applied
    assert r1.doc_count == r0.doc_count - 4
    # postings physically exclude the victims; df reflects live docs
    p = r1.postings("return")
    assert p.df == r0.postings("return").df - 4
    from lucene_ray.codec import decode_blocks
    docs, _, _, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                  p.tfs_enc, p.norms_enc)
    assert not set(victims) & set(docs.tolist())
    assert np.all(np.diff(docs) > 0)                # ranges still disjoint
    # docmeta rewritten
    dm = pq.read_table(os.path.join(d, "docmeta"), columns=["doc_id"])
    assert dm.num_rows == r0.doc_count - 4
    assert not set(victims) & set(dm.column("doc_id").to_pylist())
    # stats post-merge exclude deletions → scores equal a scorer built
    # from the live stats
    from lucene_ray import bm25
    td = search_bruteforce(r1, "return", 5)
    sim = bm25.scorer(p.df, r1.doc_count, r1.sum_ttf)
    d0 = int(td.doc_ids[0])
    dd, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                  p.tfs_enc, p.norms_enc)
    i = int(np.searchsorted(dd, d0))
    assert td.scores[0] == sim.score(tf[i:i + 1], nm[i:i + 1])[0]
    # pruned engine still bit-exact; phrases still work (positions kept)
    a = search_blockmax(r1, "return value data", 10)
    b = search_bruteforce(r1, "return value data", 10)
    np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
    np.testing.assert_array_equal(a.scores, b.scores)
    from lucene_ray.search import phrase_freqs
    assert not set(victims) & set(phrase_freqs(r1, ["return", "value"]))
    v = verify_index(d)
    assert v["ok"], v
    shutil.rmtree(d)


def test_upsert_documents(tmp_path_factory, ray_session):
    import pyarrow as pa
    from lucene_ray.build import upsert_documents

    d = tmp_path_factory.mktemp("ups")
    cdir = str(d / "c")
    os.makedirs(cdir)

    def corpus_file(name, rows):
        pq.write_table(pa.table({
            "repo": [r[0] for r in rows],
            "path": [r[1] for r in rows],
            "commit": ["c" * 40] * len(rows),
            "lang": ["py"] * len(rows),
            "content": [r[2] for r in rows],
        }), os.path.join(cdir, name))

    corpus_file("0.parquet", [("r", "a.py", "alpha old text"),
                              ("r", "b.py", "beta text")])
    idx = str(d / "i")
    build_index(cdir, idx, term_parts=2, salt_group=1)
    # new version of a.py under a new corpus file, same (repo,path,commit)?
    # upsert keys on (repo, path, commit): same key → replaced
    ndir = str(d / "n")
    os.makedirs(ndir)
    pq.write_table(pa.table({
        "repo": ["r"], "path": ["a.py"], "commit": ["c" * 40],
        "lang": ["py"], "content": ["alpha new shiny"],
    }), os.path.join(ndir, "u.parquet"))
    upsert_documents(idx, ndir)
    r = IndexReader(idx)
    old = search_bruteforce(r, "old", 100)
    assert len(old.doc_ids) == 0                  # old version tombstoned
    new = search_bruteforce(r, "shiny", 100)
    assert len(new.doc_ids) == 1
    beta = search_bruteforce(r, "beta", 100)
    assert len(beta.doc_ids) == 1                 # untouched doc stays

    # large-delta path: broadcast_key_limit=0 forces the distributed
    # hash semi-join + streamed tombstone generation (no driver key set)
    ndir2 = str(d / "n2")
    os.makedirs(ndir2)
    pq.write_table(pa.table({
        "repo": ["r"], "path": ["b.py"], "commit": ["c" * 40],
        "lang": ["py"], "content": ["beta rewritten gleaming"],
    }), os.path.join(ndir2, "u.parquet"))
    upsert_documents(idx, ndir2, broadcast_key_limit=0)
    r2 = IndexReader(idx)
    assert len(search_bruteforce(r2, "beta", 100).doc_ids) == 1
    assert len(search_bruteforce(r2, "gleaming", 100).doc_ids) == 1
    assert len(search_bruteforce(r2, "text", 100).doc_ids) == 0
    assert len(search_bruteforce(r2, "shiny", 100).doc_ids) == 1


def test_highlight_and_stored_content(tmp_path_factory, ray_session):
    """Offsets + snippet passages (UnifiedHighlighter role) and
    stored-content retrieval through segment lineage (arrival mode)."""
    import pyarrow as pa
    from lucene_ray.analysis import tokenize_with_offsets
    from lucene_ray.highlight import highlight, retrieve_content

    text = "The quick brown fox, it jumps over the lazy dog. Fox again!"
    toks, st, en = tokenize_with_offsets(text)
    assert toks[:4] == ["the", "quick", "brown", "fox"]
    for t, a, b in zip(toks, st, en):
        assert text[a:b].lower() == t
    snip, nm, off = highlight(text, ["fox"], window=4, lead=1)
    assert nm == 2 and off == text.lower().index("fox")
    assert "<b>fox</b>" in snip.lower()
    # best-window beats first-match when matches cluster later
    t2 = "a x x x x x x x x x a b a b"
    s_best, _, _ = highlight(t2, ["a", "b"], window=4, lead=0)
    assert s_best.count("<b>") >= 3          # dense tail window chosen
    s_first, _, _ = highlight(t2, ["a", "b"], window=4, lead=0,
                              anchor="first")
    assert s_first.startswith("<b>a</b>")
    assert highlight("nothing here", ["zz"]) == ("", 0, -1)

    # stored-content retrieval: arrival-mode index records source files
    d = tmp_path_factory.mktemp("stored")
    cdir = str(d / "c")
    os.makedirs(cdir)
    docs = [f"doc number {i} body" for i in range(25)]
    for half, sl in ((0, slice(0, 10)), (1, slice(10, 25))):
        pq.write_table(pa.table({
            "repo": ["r"] * len(docs[sl]),
            "path": [f"h{half}_{i}.py" for i in range(len(docs[sl]))],
            "commit": ["c" * 40] * len(docs[sl]),
            "lang": ["py"] * len(docs[sl]),
            "content": docs[sl],
        }), os.path.join(cdir, f"{half}.parquet"))
    idx = str(d / "i")
    build_index(cdir, idx, term_parts=2, salt_group=1)
    r = IndexReader(idx)
    for did in (0, 9, 10, 24):
        assert retrieve_content(r, did) == docs[did]


def test_numeric_point_index(index_dir, ray_session):
    """BKD-role point index: numeric_range equals a docmeta column scan
    and actually prunes row groups for narrow ranges."""
    from lucene_ray.points import build_numeric_index, numeric_range

    build_numeric_index(index_dir, "field_len", row_group_size=32)
    dm = pq.read_table(os.path.join(index_dir, "docmeta"),
                       columns=["doc_id", "field_len"])
    v = dm.column("field_len").to_numpy()
    d = dm.column("doc_id").to_numpy()
    for lo, hi in [(0, 10), (20, 40), (35, 36), (0, 10_000)]:
        got, metrics = numeric_range(index_dir, "field_len", lo, hi)
        want = np.sort(d[(v >= lo) & (v < hi)])
        np.testing.assert_array_equal(got, want)
        assert metrics["row_groups_read"] <= metrics["row_groups_total"]
    narrow, m_narrow = numeric_range(index_dir, "field_len", 35, 36)
    assert m_narrow["row_groups_read"] < m_narrow["row_groups_total"]
    # parser integration: field:[N TO M] routes through the point index
    from lucene_ray.search import search_parsed
    td = search_parsed(r_for_points := IndexReader(index_dir),
                       "field_len:[20 TO 39]", 10_000)
    want = np.sort(d[(v >= 20) & (v <= 39)])
    np.testing.assert_array_equal(np.sort(td.doc_ids), want)
    assert np.all(td.scores == np.float32(1.0))
    td2 = search_parsed(r_for_points, "field_len:{20 TO 39}", 10_000)
    want2 = np.sort(d[(v > 20) & (v < 39)])
    np.testing.assert_array_equal(np.sort(td2.doc_ids), want2)


def test_append_preserves_index_config(tmp_path_factory, ray_session):
    """append_to_index must keep positions AND keyword fields consistent
    with the original build (read from the manifest, not re-specified)."""
    from lucene_ray.build import append_to_index
    d = tmp_path_factory.mktemp("cfg")
    ca, cb = str(d / "a"), str(d / "b")
    os.makedirs(ca)
    os.makedirs(cb)
    t = generate_corpus(120, seed=13)
    pq.write_table(t.slice(0, 80), os.path.join(ca, "a.parquet"))
    pq.write_table(t.slice(80), os.path.join(cb, "b.parquet"))
    idx = str(d / "i")
    build_index(ca, idx, term_parts=2, salt_group=1,
                with_positions=True, keyword_fields=["lang"])
    append_to_index(idx, cb)
    r = IndexReader(idx)
    assert r.doc_count == 120
    # keyword term present for appended docs too
    p = r.postings("lang:py")
    dm = pq.read_table(os.path.join(idx, "docmeta"),
                       columns=["doc_id", "lang"])
    n_py = sum(1 for x in dm.column("lang").to_pylist() if x == "py")
    assert p is not None and p.df == n_py
    # positions present for appended docs (phrase works across both)
    from lucene_ray.search import phrase_freqs
    assert isinstance(phrase_freqs(r, ["return", "value"]), dict)


def test_compact_index(tmp_path_factory, ray_session):
    """compact_index collapses append generations; search is unchanged."""
    from lucene_ray.build import append_to_index, compact_index

    d = tmp_path_factory.mktemp("cmp")
    t = generate_corpus(240, seed=17)
    dirs = []
    for i in range(3):
        cd = str(d / f"c{i}")
        os.makedirs(cd)
        pq.write_table(t.slice(i * 80, 80), os.path.join(cd, f"f{i}.parquet"))
        dirs.append(cd)
    idx = str(d / "i")
    build_index(dirs[0], idx, term_parts=2, salt_group=1)
    append_to_index(idx, dirs[1])
    append_to_index(idx, dirs[2])
    r0 = IndexReader(idx)
    before = {q: search_bruteforce(r0, q, 20) for q in QUERIES[:6]}
    n_parts_before = len(r0.manifest.postings_parts)
    m = compact_index(idx)
    assert len(m.postings_parts) < n_parts_before
    salts = {int(p["salt"]) for p in m.postings_parts}
    assert len(salts) == 1
    r1 = IndexReader(idx)
    assert r1.doc_count == 240
    assert verify_index(idx)["ok"]
    for q, a in before.items():
        b = search_bruteforce(r1, q, 20)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)
        c = search_blockmax(r1, q, 20)
        np.testing.assert_array_equal(a.doc_ids, c.doc_ids)


def test_build_from_dataset_source(tmp_path_factory, corpus_path,
                                   ray_session):
    """build_index accepts any ray.data.Dataset with the corpus schema
    (e.g. derived from CSV/JSON readers), not just parquet paths."""
    import ray.data
    d = str(tmp_path_factory.mktemp("index_ds"))
    ds = ray.data.read_parquet(corpus_path).map_batches(
        lambda t: t, batch_format="pyarrow")   # any upstream transform
    build_index(ds, d, num_buckets=3, term_parts=4, salt_group=1)
    r = IndexReader(d)
    assert r.doc_count == N_DOCS
    a = search_bruteforce(r, "return value", 10)
    assert len(a.doc_ids) > 0


def test_add_indexes(tmp_path_factory, ray_session):
    """addIndexes == one-shot build over the union (same file order ⇒ same
    docIDs, bit-equal scores); tombstones carry over shifted; incompatible
    configs are rejected."""
    import pytest

    from lucene_ray.build import (add_indexes, build_index, delete_docs,
                                  verify_index)

    d = tmp_path_factory.mktemp("addidx")
    ca, cb, cab = str(d / "a"), str(d / "b"), str(d / "ab")
    for p in (ca, cb, cab):
        os.makedirs(p)
    t = generate_corpus(200, seed=23)
    pq.write_table(t.slice(0, 120), os.path.join(ca, "part_a.parquet"))
    pq.write_table(t.slice(120), os.path.join(cb, "part_b.parquet"))
    pq.write_table(t.slice(0, 120), os.path.join(cab, "part_a.parquet"))
    pq.write_table(t.slice(120), os.path.join(cab, "part_b.parquet"))

    ia, ib, iab = str(d / "ia"), str(d / "ib"), str(d / "iab")
    for src, dst in ((ca, ia), (cb, ib), (cab, iab)):
        build_index(src, dst, term_parts=4, salt_group=1)

    m = add_indexes(ia, ib)
    assert m.doc_count == 200
    r1, r2 = IndexReader(ia), IndexReader(iab)
    assert r1.doc_count == r2.doc_count and r1.sum_ttf == r2.sum_ttf
    for q in QUERIES[:8]:
        a = search_bruteforce(r1, q, 20)
        b = search_bruteforce(r2, q, 20)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)
    assert verify_index(ia)["ok"]

    # tombstones shift by the destination's pre-add doc_count
    delete_docs(ib, [3])
    m2 = add_indexes(iab, ib)
    assert m2.doc_count == 280
    assert 203 in IndexReader(iab).deleted.tolist()

    # config mismatch (positions on vs off) is rejected
    cpos = str(d / "cpos")
    os.makedirs(cpos)
    pq.write_table(t.slice(0, 10), os.path.join(cpos, "p.parquet"))
    ipos = str(d / "ipos")
    build_index(cpos, ipos, term_parts=4, salt_group=1,
                with_positions=True)
    with pytest.raises(ValueError, match="with_positions"):
        add_indexes(ia, ipos)


def test_snapshots_point_in_time(tmp_path_factory, ray_session):
    """SnapshotDeletionPolicy + DirectoryReader.open(IndexCommit) roles:
    a snapshot pins its commit across appends, deletes and compaction;
    the point-in-time reader returns bit-equal pre-change results;
    expunge refuses while snapshots exist; release + purge reclaims."""
    import pytest

    from lucene_ray.build import (append_to_index, build_index,
                                  compact_index, delete_docs)
    from lucene_ray.state.snapshots import (create_snapshot, list_snapshots,
                                            protected_postings,
                                            purge_unreferenced_postings,
                                            release_snapshot)

    d = tmp_path_factory.mktemp("snap")
    ca, cb = str(d / "a"), str(d / "b")
    os.makedirs(ca)
    os.makedirs(cb)
    t = generate_corpus(200, seed=31)
    pq.write_table(t.slice(0, 120), os.path.join(ca, "pa.parquet"))
    pq.write_table(t.slice(120), os.path.join(cb, "pb.parquet"))
    idx = str(d / "idx")
    build_index(ca, idx, term_parts=4, salt_group=1)

    before = {q: search_bruteforce(IndexReader(idx), q, 15)
              for q in QUERIES[:5]}
    snap = create_snapshot(idx)
    assert list_snapshots(idx) == [snap]

    append_to_index(idx, cb)
    delete_docs(idx, [7])
    head = IndexReader(idx)
    assert head.doc_count == 200 and 7 in head.deleted.tolist()

    pit = IndexReader(idx, at_snapshot=snap)
    assert pit.doc_count == 120 and len(pit.deleted) == 0
    for q, td in before.items():
        got = search_bruteforce(pit, q, 15)
        np.testing.assert_array_equal(got.doc_ids, td.doc_ids)
        np.testing.assert_array_equal(got.scores, td.scores)

    # compaction must keep the snapshot's files and its reader working
    with pytest.raises(ValueError, match="release snapshots"):
        compact_index(idx, expunge_deletes=True)
    compact_index(idx)
    pinned = protected_postings(idx)
    assert pinned and all(
        os.path.exists(os.path.join(idx, "postings", f)) for f in pinned)
    pit2 = IndexReader(idx, at_snapshot=snap)
    for q, td in before.items():
        np.testing.assert_array_equal(
            search_bruteforce(pit2, q, 15).doc_ids, td.doc_ids)
    # HEAD still sees everything after compaction
    assert IndexReader(idx).doc_count == 200

    release_snapshot(idx, snap)
    removed = purge_unreferenced_postings(idx)
    assert removed, "released commit's files should be reclaimable"
    live = {f"part={p['part']}.parquet"
            for p in IndexReader(idx).manifest.postings_parts}
    assert set(os.listdir(os.path.join(idx, "postings"))) == live


def test_point_index_invalidated_by_append(tmp_path_factory, ray_session):
    """Derived point indexes rebuild when the manifest moves (append /
    addIndexes) instead of serving a stale doc set."""
    from lucene_ray.build import append_to_index, build_index
    from lucene_ray.points import ensure_numeric_index, numeric_range

    d = tmp_path_factory.mktemp("ptstale")
    ca, cb = str(d / "a"), str(d / "b")
    os.makedirs(ca)
    os.makedirs(cb)
    t = generate_corpus(150, seed=41)
    pq.write_table(t.slice(0, 100), os.path.join(ca, "pa.parquet"))
    pq.write_table(t.slice(100), os.path.join(cb, "pb.parquet"))
    idx = str(d / "idx")
    build_index(ca, idx, term_parts=2, salt_group=1)
    ensure_numeric_index(idx, "field_len")
    docs1, _ = numeric_range(idx, "field_len", 0, 10**9)
    assert len(docs1) == 100
    append_to_index(idx, cb)
    ensure_numeric_index(idx, "field_len")       # must detect staleness
    docs2, _ = numeric_range(idx, "field_len", 0, 10**9)
    assert len(docs2) == 150


def test_query_cache_lru_and_policy(index_dir, ray_session):
    """LRUQueryCache + usage-tracking admission: a filter doc-set enters
    the cache on its 2nd sighting, repeat lookups hit, LRU evicts, and
    cached results stay identical to fresh computation."""
    from lucene_ray.search import QueryCache, _term_docset

    r = IndexReader(index_dir)
    qc = r.query_cache
    a1 = _term_docset(r, "return")
    assert qc.hit_count == 0 and qc.cache_count == 0   # 1st sighting
    a2 = _term_docset(r, "return")
    assert qc.cache_count == 1                         # admitted on 2nd
    a3 = _term_docset(r, "return")
    assert qc.hit_count == 1                           # now served cached
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(a1, a3)
    fresh = IndexReader(index_dir)
    np.testing.assert_array_equal(a1, _term_docset(fresh, "return"))

    small = QueryCache(max_entries=2, min_freq=1)
    for key in ("a", "b", "c"):
        small.get_or_compute((key,), lambda: np.arange(3))
    assert small.eviction_count == 1 and small.cache_count == 2
    assert ("a",) not in small._data and ("c",) in small._data


def test_tiered_merge_selection(tmp_path_factory, ray_session):
    """Natural TieredMergePolicy selection: small same-tier generations
    merge; the big base generation's files are not rewritten; search
    results stay identical; forceMerge(1) still fully collapses."""
    from lucene_ray.build import append_to_index, compact_index

    d = tmp_path_factory.mktemp("tiered")
    big, small = str(d / "big"), []
    os.makedirs(big)
    t = generate_corpus(400, seed=51)
    pq.write_table(t.slice(0, 310), os.path.join(big, "base.parquet"))
    idx = str(d / "idx")
    build_index(big, idx, term_parts=2, salt_group=1)
    for i in range(3):
        c = str(d / f"s{i}")
        os.makedirs(c)
        pq.write_table(t.slice(310 + 30 * i, 30),
                       os.path.join(c, f"s{i}.parquet"))
        append_to_index(idx, c)
        small.append(c)
    m0 = IndexReader(idx).manifest
    base_parts = {p["part"] for p in m0.postings_parts
                  if int(p["salt"]) == 0}
    assert len({int(p["salt"]) for p in m0.postings_parts}) == 4
    before = {q: search_bruteforce(IndexReader(idx), q, 15)
              for q in QUERIES[:5]}

    m1 = compact_index(idx, max_merge_at_once=8, tier_factor=3.0)
    # base generation untouched (still listed, file still present)
    assert base_parts <= {p["part"] for p in m1.postings_parts}
    for p in base_parts:
        assert os.path.exists(
            os.path.join(idx, "postings", f"part={p}.parquet"))
    # the three small generations collapsed into one new generation
    salts1 = {int(p["salt"]) for p in m1.postings_parts}
    assert len(salts1) == 2
    r1 = IndexReader(idx)
    for q, td in before.items():
        got = search_bruteforce(r1, q, 15)
        np.testing.assert_array_equal(got.doc_ids, td.doc_ids)
        np.testing.assert_array_equal(got.scores, td.scores)

    # forceMerge(1): full collapse still available
    m2 = compact_index(idx)
    assert len({int(p["salt"]) for p in m2.postings_parts}) == 1
    r2 = IndexReader(idx)
    for q, td in before.items():
        np.testing.assert_array_equal(
            search_bruteforce(r2, q, 15).doc_ids, td.doc_ids)


def test_analyzer_phrase_position_gaps(tmp_path_factory, ray_session):
    """Stop-word gaps: the english index stores tokens at gapped
    positions, and phrase queries analyze to gapped offsets — so the
    exact document text matches as a phrase, while the stop-stripped
    adjacent form does not (it needs slop), matching QueryBuilder's
    position-increment handling."""
    import pyarrow as pa

    from lucene_ray.build import build_index
    from lucene_ray.search import search_phrase

    d = tmp_path_factory.mktemp("gap")
    c = str(d / "c")
    os.makedirs(c)
    pq.write_table(pa.table({
        "repo": ["r"] * 2, "path": ["a", "b"], "commit": ["x"] * 2,
        "lang": ["t"] * 2,
        "content": ["grouping the rows nicely",
                    "grouping rows nicely"],
    }), os.path.join(c, "a.parquet"))
    idx = str(d / "i")
    build_index(c, idx, analyzer="english", with_positions=True)
    r = IndexReader(idx)

    # query with the stop word: gap offsets [0, 2] → matches doc 0 only
    td = search_phrase(r, "grouping the rows", k=10)
    assert td.doc_ids.tolist() == [0]
    # adjacent query form matches the adjacent doc only
    td2 = search_phrase(r, "grouping rows", k=10)
    assert td2.doc_ids.tolist() == [1]
    # slop=1 bridges the gap in either direction
    td3 = search_phrase(r, "grouping rows", k=10, slop=1)
    assert sorted(td3.doc_ids.tolist()) == [0, 1]


def test_add_indexes_after_expunge_no_collision(tmp_path_factory,
                                                ray_session):
    """docID offsets come from the assigned ceiling, not doc_count:
    importing into an expunged index (doc_count < maxDoc) must not remap
    onto live destination docIDs."""
    import pyarrow as pa

    from lucene_ray.build import (add_indexes, build_index, compact_index,
                                  delete_docs, verify_index)
    from lucene_ray.state.manifest import load_manifest, max_assigned_doc

    d = tmp_path_factory.mktemp("addexp")
    ca, cb = str(d / "a"), str(d / "b")
    os.makedirs(ca)
    os.makedirs(cb)
    t = generate_corpus(150, seed=61)
    pq.write_table(t.slice(0, 100), os.path.join(ca, "pa.parquet"))
    pq.write_table(t.slice(100), os.path.join(cb, "pb.parquet"))
    ia, ib = str(d / "ia"), str(d / "ib")
    build_index(ca, ia, term_parts=2, salt_group=1)
    build_index(cb, ib, term_parts=2, salt_group=1)
    delete_docs(ia, [50])
    compact_index(ia, expunge_deletes=True)
    m = load_manifest(ia)
    assert m.doc_count == 99 and max_assigned_doc(m) == 100
    m2 = add_indexes(ia, ib)
    assert m2.doc_count == 99 + 50
    # imported docs occupy 100..149 — none collide with live 0..99
    r = IndexReader(ia)
    for q in QUERIES[:4]:
        td = search_bruteforce(r, q, 200)
        assert len(td.doc_ids) == len(set(td.doc_ids.tolist()))
    assert verify_index(ia)["ok"]


def test_termdict_scan_ds_ignores_uncommitted_files(tmp_path_factory,
                                                    ray_session):
    """Distributed termdict enumeration reads the committed manifest's
    parts, not the directory: snapshot-pinned old generations must not
    double-count df/ttf."""
    from lucene_ray.build import append_to_index, compact_index
    from lucene_ray.search import termdict_scan_ds
    from lucene_ray.state.snapshots import create_snapshot

    d = tmp_path_factory.mktemp("tdds")
    ca, cb = str(d / "a"), str(d / "b")
    os.makedirs(ca)
    os.makedirs(cb)
    t = generate_corpus(120, seed=71)
    pq.write_table(t.slice(0, 80), os.path.join(ca, "pa.parquet"))
    pq.write_table(t.slice(80), os.path.join(cb, "pb.parquet"))
    idx = str(d / "idx")
    build_index(ca, idx, term_parts=2, salt_group=1)
    append_to_index(idx, cb)
    before = termdict_scan_ds(idx, prefix="re")
    snap = create_snapshot(idx)
    compact_index(idx)        # old generation files stay (pinned)
    after = termdict_scan_ds(idx, prefix="re")
    b = dict(zip(before.column("term").to_pylist(),
                 before.column("df").to_pylist())) if "df" in \
        before.column_names else None
    if b is None:
        b = {r["term"]: r for r in before.to_pylist()}
        a = {r["term"]: r for r in after.to_pylist()}
        assert a == b
    else:
        a = dict(zip(after.column("term").to_pylist(),
                     after.column("df").to_pylist()))
        assert a == b
    assert snap >= 1


def test_feature_and_facet_honor_deletes(tmp_path, ray_session):
    """FeatureQuery scorers and docvalue facets filter tombstoned docs."""
    import pyarrow as pa

    from lucene_ray.build import delete_docs
    from lucene_ray.docvalues import facet_counts_dv
    from lucene_ray.features import build_feature_index, feature_scores

    idx = str(tmp_path / "i")
    os.makedirs(os.path.join(idx, "docmeta"))
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "field_len": pa.array([10] * 8, pa.int64()),
        "lang": pa.array(["en", "en", "de", "de", "en", "de", "en", "en"]),
    }), os.path.join(idx, "docmeta", "bucket=00000.parquet"))
    build_feature_index(idx, "rank")
    delete_docs(idx, [1, 2])
    docs, _ = feature_scores(idx, "rank")
    assert 1 not in docs.tolist() and 2 not in docs.tolist()
    counts = {r["lang"]: r["n"]
              for r in facet_counts_dv(idx, "lang").take_all()}
    assert counts == {"en": 4, "de": 2}


def test_repair_postings_lossless(tmp_path, ray_session):
    """CheckIndex -exorcise role, lossless variant: corrupt one merged
    postings partition on disk; repair_postings re-merges it from the
    surviving segment files with bit-identical logical content, and the
    index searches identically afterwards."""
    import os

    import pyarrow.parquet as pq

    from lucene_ray.build import build_index, repair_postings, verify_index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import IndexReader, search_blockmax

    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(generate_corpus(800, seed=11), str(corpus / "a.parquet"))
    idx = str(tmp_path / "i")
    build_index(str(corpus), idx)
    r = IndexReader(idx)
    before = search_blockmax(r, "return value data", 10)

    pdir = os.path.join(idx, "postings")
    victim = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))[0]
    vic_path = os.path.join(pdir, victim)
    orig = pq.read_table(vic_path).sort_by(
        [("term", "ascending"), ("first_doc", "ascending")])
    with open(vic_path, "r+b") as f:      # stomp the parquet footer
        f.seek(-8, os.SEEK_END)
        f.write(b"XXXXXXXX")
    import pytest as _pt
    with _pt.raises(Exception):
        pq.read_table(vic_path)

    rep = repair_postings(idx)
    assert rep["ok"] and rep["repaired"] == [victim[5:-8]]
    fixed = pq.read_table(vic_path).sort_by(
        [("term", "ascending"), ("first_doc", "ascending")])
    assert fixed.equals(orig)             # lossless, bit-identical rows

    r2 = IndexReader(idx)
    after = search_blockmax(r2, "return value data", 10)
    assert after.doc_ids.tolist() == before.doc_ids.tolist()
    assert after.scores.tolist() == before.scores.tolist()
    assert verify_index(idx)["ok"]
    # idempotent: a clean index reports nothing to repair
    assert repair_postings(idx)["repaired"] == []


def test_replication_full_delta_repair_prune(tmp_path_factory, ray_session):
    """NRT replication semantics end-to-end: full sync gives identical
    search results; an append syncs only the delta; a corrupted replica
    file is detected by crc and re-copied; stale replica files are
    pruned after the manifest publishes."""
    import os

    from lucene_ray.api import Index
    from lucene_ray.search import IndexReader, search_blockmax

    base = tmp_path_factory.mktemp("repl")
    c1 = str(base / "c1")
    os.makedirs(c1)
    pq.write_table(generate_corpus(250, seed=21), f"{c1}/a.parquet")
    src = str(base / "primary")
    dst = str(base / "replica")
    idx = Index.build(c1, src, num_buckets=3, term_parts=4, salt_group=2)

    st = idx.replicate_to(dst)
    assert st["files_copied"] == st["files_total"] > 0
    assert st["files_deleted"] == 0
    ra, rb = IndexReader(src), IndexReader(dst)
    q = "return value data"
    assert list(search_blockmax(ra, q, 10).doc_ids) == \
        list(search_blockmax(rb, q, 10).doc_ids)
    assert rb.doc_count == ra.doc_count

    # idempotent: nothing re-copies
    st2 = idx.replicate_to(dst)
    assert st2["files_copied"] == 0
    assert st2["files_skipped"] == st2["files_total"]

    # append on the primary -> only the delta transfers
    c2 = str(base / "c2")
    os.makedirs(c2)
    pq.write_table(generate_corpus(80, seed=22), f"{c2}/b.parquet")
    idx = idx.append(c2)
    st3 = idx.replicate_to(dst)
    assert 0 < st3["files_copied"] < st3["files_total"]
    rb = IndexReader(dst)
    assert rb.doc_count == IndexReader(src).doc_count
    assert list(search_blockmax(IndexReader(src), q, 10).doc_ids) == \
        list(search_blockmax(rb, q, 10).doc_ids)

    # corrupt one replica postings file -> crc mismatch -> re-copied
    parts = sorted(os.listdir(os.path.join(dst, "postings")))
    victim = os.path.join(dst, "postings", parts[0])
    good = os.path.getsize(victim)
    with open(victim, "r+b") as f:
        f.truncate(good // 2)
    st4 = idx.replicate_to(dst)
    assert st4["files_copied"] == 1
    assert os.path.getsize(victim) == good

    # stale file in a managed dir -> pruned after publish
    stale = os.path.join(dst, "postings", "part=zzzzz_9999.parquet")
    with open(stale, "wb") as f:
        f.write(b"junk")
    st5 = idx.replicate_to(dst)
    assert st5["files_deleted"] == 1
    assert not os.path.exists(stale)

    # tombstones replicate: delete on primary, sync, replica hides it
    top_src = search_blockmax(IndexReader(src), q, 1).doc_ids
    idx.delete_by_term(q.split()[0])
    idx.replicate_to(dst)
    hits_dst = search_blockmax(IndexReader(dst), q.split()[0], 5).doc_ids
    assert list(hits_dst) == []
    assert len(top_src)  # sanity: the term did match before the delete

    # feature base values AND numeric-update generations replicate —
    # updates are user mutations a replica cannot rebuild from docmeta
    from lucene_ray.features import (build_feature_index, feature_scores,
                                     update_feature_values)
    build_feature_index(src, "rank")
    update_feature_values(src, "rank", [5, 9], [200.0, 77.0])
    idx.replicate_to(dst)
    d_src, s_src = feature_scores(src, "rank")
    d_dst, s_dst = feature_scores(dst, "rank")
    assert list(d_src) == list(d_dst)
    assert np.array_equal(s_src, s_dst)
    # a second generation on the primary re-syncs (latest wins on both)
    update_feature_values(src, "rank", [5], [10.0])
    idx.replicate_to(dst)
    d_dst2, s_dst2 = feature_scores(dst, "rank")
    d_src2, s_src2 = feature_scores(src, "rank")
    assert list(d_src2) == list(d_dst2)
    assert np.array_equal(s_src2, s_dst2)


def test_soft_deletes_retention(tmp_path_factory, ray_session):
    """Soft deletes + retention leases (the
    SoftDeletesRetentionMergePolicy role,
    index/SoftDeletesRetentionMergePolicy.java:46): a soft-deleted doc is
    search-invisible immediately, but expunge compaction physically
    RETAINS docs of soft generations a lease has not caught up past —
    and a replica syncing across the delete+compact window still sees a
    consistent point-in-time. Once every lease advances, the next
    expunge reclaims them."""
    from lucene_ray.api import Index
    from lucene_ray.build import (compact_index, delete_docs,
                                  soft_delete_by_term)
    from lucene_ray.state.retention import (acquire_retention_lease,
                                            latest_soft_gen,
                                            list_retention_leases)

    base = tmp_path_factory.mktemp("softdel")
    c1 = str(base / "c1")
    os.makedirs(c1)
    pq.write_table(generate_corpus(250, seed=31), f"{c1}/a.parquet")
    src, dst = str(base / "primary"), str(base / "replica")
    idx = Index.build(c1, src, num_buckets=3, term_parts=4, salt_group=1)

    # replica full sync; its lease starts at the current soft watermark
    idx.replicate_to(dst)
    acquire_retention_lease(src, "replica-1", latest_soft_gen(src))

    r0 = IndexReader(src)
    soft_victims = search_bruteforce(r0, "return", 10_000).doc_ids
    assert len(soft_victims) > 0
    all_ids = pq.read_table(os.path.join(src, "docmeta"),
                            columns=["doc_id"]).column("doc_id").to_pylist()
    hard_victims = [int(i) for i in all_ids
                    if i not in set(soft_victims.tolist())][:2]
    assert len(hard_victims) == 2
    delete_docs(src, hard_victims)                       # hard tombstones
    gen = soft_delete_by_term(src, "return")             # soft generation
    assert gen == latest_soft_gen(src) >= 0              # filed

    # both delete kinds are search-invisible immediately; stats blind
    r1 = IndexReader(src)
    assert len(search_bruteforce(r1, "return", 10_000).doc_ids) == 0
    assert r1.doc_count == r0.doc_count

    # expunge while the replica lease is behind: hard tombstones expunge,
    # soft generation is RETAINED — docs stay physical, file stays filed
    m1 = compact_index(src, expunge_deletes=True)
    r2 = IndexReader(src)
    assert m1.doc_count == r0.doc_count - len(hard_victims)
    assert sorted(r2.deleted.tolist()) == sorted(soft_victims.tolist())
    assert len(search_bruteforce(r2, "return", 10_000).doc_ids) == 0
    assert verify_index(src)["ok"]

    # replica syncs across the delete+compact window: consistent view
    idx.replicate_to(dst)
    rd = IndexReader(dst)
    assert len(search_bruteforce(rd, "return", 10_000).doc_ids) == 0
    assert rd.doc_count == m1.doc_count

    # caught up -> advance the lease; monotonic (a lower re-acquire is
    # ignored, like the reference's sequence-number leases)
    acquire_retention_lease(src, "replica-1", latest_soft_gen(src))
    acquire_retention_lease(src, "replica-1", -1)
    assert list_retention_leases(src)["replica-1"] == gen

    # second expunge reclaims: docs leave postings/docmeta, file clears
    m2 = compact_index(src, expunge_deletes=True)
    r3 = IndexReader(src)
    assert m2.doc_count == r0.doc_count - len(hard_victims) \
        - len(soft_victims)
    assert len(r3.deleted) == 0
    assert len(search_bruteforce(r3, "return", 10_000).doc_ids) == 0
    assert verify_index(src)["ok"]


def test_delete_gen_monotonic_after_expunge(tmp_path_factory, ray_session):
    """Review fix: generation numbering must NEVER restart after an
    expunge empties deletes/ — a reused number at or below a lease
    watermark would let the next expunge reclaim docs the lease holder
    has not synced."""
    from lucene_ray.build import compact_index, soft_delete_docs
    from lucene_ray.state.retention import (acquire_retention_lease,
                                            latest_soft_gen)

    base = tmp_path_factory.mktemp("genmono")
    c = str(base / "c")
    os.makedirs(c)
    pq.write_table(generate_corpus(120, seed=33), f"{c}/a.parquet")
    d = str(base / "i")
    build_index(c, d, num_buckets=2, term_parts=4, salt_group=1)
    n0 = IndexReader(d).doc_count

    g1 = soft_delete_docs(d, [1, 2])
    acquire_retention_lease(d, "rep", g1)        # holder synced gen g1
    m1 = compact_index(d, expunge_deletes=True)  # reclaims gen g1
    assert m1.doc_count == n0 - 2
    assert latest_soft_gen(d) == -1              # deletes/ now empty

    g2 = soft_delete_docs(d, [3, 4])
    assert g2 > g1                               # monotonic, NOT reused
    # lease still at g1 < g2: expunge must RETAIN the new generation
    m2 = compact_index(d, expunge_deletes=True)
    assert m2.doc_count == n0 - 2                # docs 3,4 still physical
    r = IndexReader(d)
    assert sorted(r.deleted.tolist()) == [3, 4]  # still hidden
    acquire_retention_lease(d, "rep", g2)
    m3 = compact_index(d, expunge_deletes=True)
    assert m3.doc_count == n0 - 4                # reclaimed after ack


def test_matchall_universe_after_expunge(tmp_path_factory, ray_session):
    """Review fix: MatchAllDocsQuery (and simple-parser 'all') must
    enumerate docmeta's live docIDs, not arange(doc_count) — after an
    expunge the id space has holes and doc_count understates maxDoc."""
    from lucene_ray.build import compact_index, delete_docs
    from lucene_ray.search import search_xml
    from lucene_ray.simpleqp import eval_docs

    base = tmp_path_factory.mktemp("mauniv")
    c = str(base / "c")
    os.makedirs(c)
    pq.write_table(generate_corpus(60, seed=34), f"{c}/a.parquet")
    d = str(base / "i")
    build_index(c, d, num_buckets=2, term_parts=4, salt_group=1)
    delete_docs(d, list(range(0, 10)))           # low ids: makes holes
    compact_index(d, expunge_deletes=True)
    r = IndexReader(d)
    want = np.sort(pq.read_table(
        os.path.join(d, "docmeta"),
        columns=["doc_id"]).column("doc_id").to_numpy())
    assert want.max() >= r.doc_count             # the hole exists
    got = search_xml(r, "<MatchAllDocsQuery/>", 10_000)
    np.testing.assert_array_equal(np.sort(got.doc_ids), want)
    np.testing.assert_array_equal(eval_docs(r, ("all",)), want)


def test_replication_of_pinned_snapshot(tmp_path_factory, ray_session):
    """Replicating a pinned snapshot ships the commit AND only the
    tombstone generations visible at snapshot time — a delete made
    after the snapshot is invisible on the replica."""
    import os

    from lucene_ray.api import Index
    from lucene_ray.search import IndexReader, search_blockmax

    base = tmp_path_factory.mktemp("replsnap")
    c = str(base / "c")
    os.makedirs(c)
    pq.write_table(generate_corpus(200, seed=31), f"{c}/a.parquet")
    src = str(base / "primary")
    idx = Index.build(c, src, num_buckets=3, term_parts=4, salt_group=2)
    term = "return"
    before = search_blockmax(IndexReader(src), term, 5).doc_ids
    assert len(before)
    snap = idx.snapshot()
    idx.delete_by_term(term)

    pit = str(base / "replica_pit")
    idx.replicate_to(pit, snapshot=snap)
    assert list(search_blockmax(IndexReader(pit), term, 5).doc_ids) == \
        list(before)

    live = str(base / "replica_live")
    idx.replicate_to(live)
    assert list(search_blockmax(IndexReader(live), term, 5).doc_ids) == []


def test_geo_nearest_expanding_descent(index_dir, ray_session):
    """geo_nearest (LatLonPoint.nearest role): exact vs brute force on
    the synthesized grid, completeness of the circle-of-radius-r rule,
    pruned IO on a dense center, and k validation."""
    import numpy as np
    import pytest as _pt

    from lucene_ray.geo import build_geo_index, geo_nearest, synth_coords
    import pyarrow.parquet as pq
    import os

    build_geo_index(index_dir)
    docs = pq.read_table(os.path.join(index_dir, "docmeta"),
                         columns=["doc_id"]).column("doc_id").to_numpy()
    lat, lon = synth_coords(docs)
    for (cla, clo, k) in [(0, 0, 7), (60_000_000, -120_000_000, 12),
                          (-89_000_000, 179_000_000, 3)]:
        d2 = (lat - cla) ** 2 + (lon - clo) ** 2
        order = np.lexsort((docs, d2))[:k]
        got_d, got_d2, m = geo_nearest(index_dir, cla, clo, k)
        assert got_d.tolist() == docs[order].tolist()
        assert got_d2.tolist() == d2[order].tolist()
        assert m["row_groups_read"] <= m["row_groups_total"]
    # k larger than corpus: returns everything, ordered
    got_d, _, _ = geo_nearest(index_dir, 0, 0, len(docs) + 10)
    assert len(got_d) == len(docs)
    with _pt.raises(ValueError):
        geo_nearest(index_dir, 0, 0, 0)


def test_merge_on_flush(tmp_path_factory, ray_session):
    """MergeOnFlushMergePolicy (sandbox/index/MergeOnFlushMergePolicy
    .java:52): appends with merge_on_flush_mb collapse the
    sub-threshold generations of each bucket into one; a generation
    above the threshold is never rewritten; results match the
    unmerged index exactly."""
    from lucene_ray.build import append_to_index

    d = tmp_path_factory.mktemp("mof")
    ca, cb, cc = str(d / "a"), str(d / "b"), str(d / "c")
    for p in (ca, cb, cc):
        os.makedirs(p)
    t = generate_corpus(240, seed=13)
    pq.write_table(t.slice(0, 160), os.path.join(ca, "p.parquet"))
    pq.write_table(t.slice(160, 40), os.path.join(cb, "p.parquet"))
    pq.write_table(t.slice(200), os.path.join(cc, "p.parquet"))

    from lucene_ray.state.manifest import load_manifest

    merged = str(d / "idx_m")
    build_index(ca, merged, term_parts=2, salt_group=1)
    m0 = load_manifest(merged)
    base_parts = {p["part"] for p in m0.postings_parts}
    big = {p["part"] for p in m0.postings_parts
           if int(p.get("bytes", 0)) >= 1024}
    # threshold of 1 KB: the base generation's bigger files stay put
    m1 = append_to_index(merged, cb, merge_on_flush_mb=1 / 1024)
    m2 = append_to_index(merged, cc, merge_on_flush_mb=1 / 1024)
    assert big <= {p["part"] for p in m2.postings_parts}
    # every bucket holds at most one sub-threshold generation now
    per_bucket: dict = {}
    for p in m2.postings_parts:
        if int(p.get("bytes", 0)) < 1024:
            per_bucket[p["tbucket"]] = per_bucket.get(p["tbucket"], 0) + 1
    assert all(v == 1 for v in per_bucket.values()), per_bucket

    plain = str(d / "idx_p")
    build_index(ca, plain, term_parts=2, salt_group=1)
    append_to_index(plain, cb)
    append_to_index(plain, cc)
    r1, r2 = IndexReader(merged), IndexReader(plain)
    assert r1.doc_count == r2.doc_count and r1.sum_ttf == r2.sum_ttf
    for q in QUERIES[:6]:
        a = search_bruteforce(r1, q, 20)
        b = search_bruteforce(r2, q, 20)
        np.testing.assert_array_equal(a.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(a.scores, b.scores)
