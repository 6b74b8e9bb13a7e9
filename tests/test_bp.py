"""BP doc reordering (misc/index/BPIndexReorderer.java:94) tests:
permutation validity + determinism, objective improvement on a
clustered corpus, and end-to-end result equivalence of a bp-sorted
build (docIDs permute; doc IDENTITY of every hit is preserved)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.bp import bp_permutation, log_gap_cost


def _clustered_pairs(n_docs=400, n_terms=300, seed=5):
    """Two interleaved topic clusters: even docs draw from the low half
    of the vocabulary, odd docs from the high half, plus a few shared
    stop-ish terms. Arrival order is maximally scattered, so BP has a
    big win available (group evens together)."""
    rng = np.random.default_rng(seed)
    owners, terms = [], []
    for d in range(n_docs):
        base = 0 if d % 2 == 0 else n_terms // 2
        ts = np.unique(rng.integers(base, base + n_terms // 2, size=30))
        owners.extend([d] * len(ts))
        terms.extend(ts.tolist())
    return (np.array(owners, dtype=np.int64),
            np.array(terms, dtype=np.int64))


def test_bp_permutation_valid_deterministic():
    owners, terms = _clustered_pairs()
    p1 = bp_permutation(owners, terms, 400)
    p2 = bp_permutation(owners, terms, 400)
    assert np.array_equal(np.sort(p1), np.arange(400))
    assert np.array_equal(p1, p2)                       # deterministic
    # tiny partitions are identity (min_partition_size fence)
    assert np.array_equal(bp_permutation(owners[:10], terms[:10], 8),
                          np.arange(8))


def test_bp_reduces_log_gap_cost():
    owners, terms = _clustered_pairs()
    perm = bp_permutation(owners, terms, 400)
    pos_id = np.arange(400, dtype=np.int64)
    pos_bp = np.empty(400, dtype=np.int64)
    pos_bp[perm] = np.arange(400)
    before = log_gap_cost(terms, owners, pos_id)
    after = log_gap_cost(terms, owners, pos_bp)
    assert after < before * 0.9, (before, after)
    # and it beats a random shuffle by at least as much
    rng = np.random.default_rng(0)
    rnd = rng.permutation(400).astype(np.int64)
    assert after < log_gap_cost(terms, owners, rnd)


def test_bp_build_equivalent_results(tmp_path, ray_session):
    """index_sort='bp' permutes docIDs only: every query returns the
    same DOCUMENTS (by path identity) with the same scores; CheckIndex
    stays green; phrase positions survive the permutation."""
    from lucene_ray.build import build_index, verify_index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import (IndexReader, search_bruteforce,
                                   search_blockmax, search_phrase)

    c = tmp_path / "c"
    os.makedirs(c)
    pq.write_table(generate_corpus(300, seed=11), str(c / "a.parquet"))
    d0, d1 = str(tmp_path / "plain"), str(tmp_path / "bp")
    build_index(str(c), d0, num_buckets=2, term_parts=4, salt_group=1,
                with_positions=True)
    build_index(str(c), d1, num_buckets=2, term_parts=4, salt_group=1,
                with_positions=True, index_sort="bp")
    r0, r1 = IndexReader(d0), IndexReader(d1)
    assert r1.doc_count == r0.doc_count
    assert r1.sum_ttf == r0.sum_ttf

    def paths(reader, ids):
        dm = pq.read_table(os.path.join(reader.index_dir, "docmeta"),
                           columns=["doc_id", "path"])
        m = dict(zip(dm.column("doc_id").to_pylist(),
                     dm.column("path").to_pylist()))
        return [m[int(i)] for i in ids]

    for q in ("return value data", "parse", "index buffer size"):
        a = search_bruteforce(r0, q, 10)
        b = search_bruteforce(r1, q, 10)
        np.testing.assert_allclose(np.sort(a.scores)[::-1],
                                   np.sort(b.scores)[::-1], rtol=0)
        assert sorted(paths(r0, a.doc_ids)) == sorted(paths(r1, b.doc_ids))
        pb = search_blockmax(r1, q, 10)       # pruned agrees on bp build
        np.testing.assert_array_equal(pb.doc_ids, b.doc_ids)
        np.testing.assert_array_equal(pb.scores, b.scores)
    ph0 = search_phrase(r0, "return val", 1000)
    ph1 = search_phrase(r1, "return val", 1000)
    assert sorted(paths(r0, ph0.doc_ids)) == sorted(paths(r1, ph1.doc_ids))
    assert verify_index(d1)["ok"]
