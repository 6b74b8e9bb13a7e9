"""split_index (PKIndexSplitter role): each half is a complete,
verifiable index holding exactly its docID range; stats re-baseline to
the half (post-merge stats exclude dropped docs); add_indexes reunites
the halves losslessly (same doc payloads, same per-term tf multisets)."""

import collections
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from lucene_ray.build import add_indexes, build_index, split_index  # noqa: E402
from lucene_ray.corpus import generate_corpus  # noqa: E402

SPLIT = 90
N = 150


@pytest.fixture(scope="module")
def split_setup(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("split")
    pq.write_table(generate_corpus(N, seed=31), str(d / "c.parquet"))
    orig = str(d / "orig")
    build_index(str(d / "c.parquet"), orig, num_buckets=3, term_parts=4,
                doc_order="key")
    lo, hi = str(d / "lo"), str(d / "hi")
    m_lo, m_hi = split_index(orig, lo, hi, SPLIT)
    return orig, lo, hi, m_lo, m_hi


def _docmeta_payloads(idx):
    t = pq.read_table(f"{idx}/docmeta", columns=["doc_id", "sha256",
                                                 "field_len"])
    return (t.column("doc_id").to_pylist(),
            sorted(zip([s.hex() for s in t.column("sha256").to_pylist()],
                       t.column("field_len").to_pylist())))


def _term_tfs(idx, terms):
    from lucene_ray.codec import decode_blocks
    from lucene_ray.search import IndexReader

    r = IndexReader(idx)
    out = {}
    for t in terms:
        p = r.postings(t)
        if p is None:
            out[t] = ([], [])
            continue
        d, tf, _, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                    p.tfs_enc, p.norms_enc)
        out[t] = (d.tolist(), tf.tolist())
    return out


TERMS = ["the", "data", "value", "return", "key", "index"]


def test_halves_hold_exact_ranges(split_setup, ray_session):
    orig, lo, hi, m_lo, m_hi = split_setup
    ids_lo, _ = _docmeta_payloads(lo)
    ids_hi, _ = _docmeta_payloads(hi)
    assert max(ids_lo) < SPLIT <= min(ids_hi)
    assert m_lo.doc_count + m_hi.doc_count == N
    assert sorted(ids_lo + ids_hi) == list(range(N))


def test_halves_verify_and_stats_rebaseline(split_setup, ray_session):
    from lucene_ray.build import verify_index
    from lucene_ray.search import IndexReader

    orig, lo, hi, _, _ = split_setup
    for idx in (lo, hi):
        assert verify_index(idx)["ok"]
    r_orig = IndexReader(orig)
    r_lo, r_hi = IndexReader(lo), IndexReader(hi)
    assert r_lo.sum_ttf + r_hi.sum_ttf == r_orig.sum_ttf
    for t in TERMS:
        assert r_lo.df(t) + r_hi.df(t) == r_orig.df(t)


def test_halves_partition_postings(split_setup, ray_session):
    orig, lo, hi, _, _ = split_setup
    po = _term_tfs(orig, TERMS)
    pl = _term_tfs(lo, TERMS)
    ph = _term_tfs(hi, TERMS)
    for t in TERMS:
        do, to = po[t]
        want_lo = [(d, f) for d, f in zip(do, to) if d < SPLIT]
        want_hi = [(d, f) for d, f in zip(do, to) if d >= SPLIT]
        assert list(zip(*pl[t])) == want_lo or (not want_lo and
                                                pl[t] == ([], []))
        assert list(zip(*ph[t])) == want_hi or (not want_hi and
                                                ph[t] == ([], []))


def test_add_indexes_roundtrip_lossless(split_setup, tmp_path,
                                        ray_session):
    import shutil

    orig, lo, hi, _, _ = split_setup
    merged = str(tmp_path / "merged")
    shutil.copytree(lo, merged)
    add_indexes(merged, hi)
    _, pay_m = _docmeta_payloads(merged)
    _, pay_o = _docmeta_payloads(orig)
    assert pay_m == pay_o
    pm = _term_tfs(merged, TERMS)
    po = _term_tfs(orig, TERMS)
    for t in TERMS:
        # docIDs are remapped by the append; tf multisets are invariant
        assert collections.Counter(pm[t][1]) == collections.Counter(
            po[t][1])
        assert len(pm[t][0]) == len(po[t][0])
        assert len(set(pm[t][0])) == len(pm[t][0])


def test_split_refuses_existing_target(split_setup, ray_session):
    orig, lo, hi, _, _ = split_setup
    with pytest.raises(FileExistsError):
        split_index(orig, lo, "/tmp/never_created_split", SPLIT)


def test_multipass_split_round_robin(split_setup, ray_session, tmp_path):
    """MultiPassIndexSplitter: round-robin parts hold exactly the
    doc_id % n residue classes; seq mode holds contiguous ranges."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.build import multipass_split_index

    idx = split_setup[0]
    outs = [str(tmp_path / f"rr{i}") for i in range(3)]
    multipass_split_index(idx, outs)
    all_ids = []
    for p, out in enumerate(outs):
        t = pq.read_table(f"{out}/docmeta", columns=["doc_id"])
        ids = np.sort(t.column("doc_id").to_numpy())
        assert (ids % 3 == p).all()
        all_ids.extend(ids.tolist())
    src = pq.read_table(f"{idx}/docmeta", columns=["doc_id"])
    assert sorted(all_ids) == sorted(src.column("doc_id").to_pylist())

    outs2 = [str(tmp_path / f"sq{i}") for i in range(2)]
    multipass_split_index(idx, outs2, seq=True)
    t0 = pq.read_table(f"{outs2[0]}/docmeta", columns=["doc_id"])
    t1 = pq.read_table(f"{outs2[1]}/docmeta", columns=["doc_id"])
    m0 = max(t0.column("doc_id").to_pylist())
    m1 = min(t1.column("doc_id").to_pylist())
    assert m0 < m1
