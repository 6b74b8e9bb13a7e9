"""Bloom term-existence gate (BloomFilteringPostingsFormat role):
no false negatives over the full vocabulary, observable pruning on
misses, staleness invalidation, and gated/ungated search equivalence."""

import shutil
import sys
import zlib

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from lucene_ray.build import build_index  # noqa: E402
from lucene_ray.corpus import generate_corpus  # noqa: E402


@pytest.fixture(scope="module")
def bloom_index(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("bloomidx")
    pq.write_table(generate_corpus(250, seed=19), str(d / "c.parquet"))
    idx = str(d / "idx")
    build_index(str(d / "c.parquet"), idx, num_buckets=4, term_parts=8,
                doc_order="key")
    from lucene_ray.bloom import build_bloom_index
    lineage = build_bloom_index(idx)
    assert lineage["n_files"] > 0
    return idx


def test_no_false_negatives_full_vocab(bloom_index, ray_session):
    from lucene_ray.search import IndexReader, termdict_terms

    r = IndexReader(bloom_index)
    g = r._bloom_gate()
    assert g is not None
    terms = termdict_terms(r).column("term").to_pylist()
    assert len(terms) > 100
    for t in terms:
        tb = zlib.crc32(t.encode()) % r.T
        assert g.maybe_contains(tb, t), f"false negative: {t}"


def test_miss_pruning_and_exactness(bloom_index, ray_session):
    from lucene_ray.search import IndexReader

    r = IndexReader(bloom_index)
    rng = np.random.RandomState(5)
    absent = ["zz" + "".join(rng.choice(list("abcdefghij"), 8))
              for _ in range(400)]
    for t in absent:
        assert r.postings(t) is None        # exact regardless of bloom
        assert r.df(t) == 0
    g = r._bloom_gate()
    # most misses must short-circuit; FuzzySet-style k=1 at ~10%
    # saturation per file leaves some MAYBEs, but never the majority
    assert g.n_pruned / len(absent) > 0.5, (g.n_pruned, g.n_checks)


def test_gated_search_equals_ungated(bloom_index, tmp_path, ray_session):
    from lucene_ray.search import IndexReader, search_blockmax

    ungated = str(tmp_path / "ungated")
    shutil.copytree(bloom_index, ungated)
    shutil.rmtree(f"{ungated}/bloom")
    r1, r2 = IndexReader(bloom_index), IndexReader(ungated)
    assert r1._bloom_gate() is not None and r2._bloom_gate() is None
    for q in ("return value", "data zzmissing", "the"):
        t1 = search_blockmax(r1, q, 10)
        t2 = search_blockmax(r2, q, 10)
        np.testing.assert_array_equal(t1.doc_ids, t2.doc_ids)
        np.testing.assert_array_equal(t1.scores, t2.scores)


def test_stale_bloom_ignored_after_append(bloom_index, tmp_path,
                                          ray_session):
    from lucene_ray.build import append_to_index
    from lucene_ray.search import IndexReader

    idx = str(tmp_path / "idx2")
    shutil.copytree(bloom_index, idx)
    pq.write_table(generate_corpus(60, seed=23),
                   str(tmp_path / "delta.parquet"))
    append_to_index(idx, str(tmp_path / "delta.parquet"))
    r = IndexReader(idx)
    assert r._bloom_gate() is None      # version bumped → bloom ignored
    # rebuilding refreshes the lineage and re-arms the gate
    from lucene_ray.bloom import build_bloom_index
    build_bloom_index(idx)
    assert IndexReader(idx)._bloom_gate() is not None
