"""Postings codec round-trip tests.

Mirrors the reference's codec test strategy: exhaustive bit-width sweeps
(core/src/test/org/apache/lucene/codecs/lucene103/TestForUtil.java,
TestPForUtil.java, TestForDeltaUtil.java) and randomized posting round-trips
straddling block boundaries (BasePostingsFormatTestCase.java:104,
RandomPostingsTester.java:89), via hypothesis.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.codec import (BLOCK_SIZE, decode_block, decode_deltas,
                              decode_pfor, encode_deltas, encode_pfor,
                              encode_term, impact_frontier, pack_bits,
                              unpack_bits)


@pytest.mark.parametrize("bpv", range(0, 65))
def test_pack_unpack_sweep(bpv):
    rng = np.random.default_rng(bpv)
    hi = (1 << bpv) if bpv < 64 else (1 << 63)
    vals = rng.integers(0, max(hi, 1), size=128, dtype=np.uint64)
    if bpv:
        vals |= np.uint64(1 << (bpv - 1))  # force max width
        vals &= np.uint64((1 << bpv) - 1) if bpv < 64 else np.uint64(2**64 - 1)
    buf = pack_bits(vals, bpv)
    assert len(buf) == (128 * bpv + 7) // 8
    np.testing.assert_array_equal(unpack_bits(buf, 128, bpv), vals)


def test_deltas_all_equal_optimization():
    deltas = np.ones(128, dtype=np.uint64)
    buf = encode_deltas(deltas)
    assert len(buf) == 9  # marker + u64
    np.testing.assert_array_equal(decode_deltas(buf, 128), deltas)


@given(st.lists(st.integers(1, 2**20), min_size=1, max_size=BLOCK_SIZE))
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    buf = encode_pfor(v)
    np.testing.assert_array_equal(decode_pfor(buf, len(v)), v)


def test_pfor_exceptions_save_space():
    # 127 small values + 1 huge → exception patching keeps base bpv small
    v = np.ones(128, dtype=np.uint64)
    v[77] = 2**31 - 1
    buf = encode_pfor(v)
    assert len(buf) < 128  # far below 31 bpv × 128
    np.testing.assert_array_equal(decode_pfor(buf, 128), v)


@given(
    st.integers(0, 2**31),             # base doc
    st.lists(st.integers(1, 2**20), min_size=1, max_size=400),  # gaps
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_term_roundtrip(base, gaps, data):
    docs = base + np.cumsum(np.array(gaps, dtype=np.int64))
    n = len(docs)
    tfs = np.array(data.draw(st.lists(st.integers(1, 10**6), min_size=n,
                                      max_size=n)), dtype=np.int64)
    norms = np.array(data.draw(st.lists(st.integers(0, 255), min_size=n,
                                        max_size=n)), dtype=np.uint8)
    enc = encode_term(docs, tfs, norms)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["first_doc"]) == n_blocks
    got_docs, got_tfs, got_norms = [], [], []
    for i in range(n_blocks):
        d, t, m = decode_block(enc["first_doc"][i], enc["n"][i],
                               enc["docs_enc"][i], enc["tfs_enc"][i],
                               enc["norms_enc"][i])
        assert enc["last_doc"][i] == d[-1]
        got_docs.append(d)
        got_tfs.append(t)
        got_norms.append(m)
    np.testing.assert_array_equal(np.concatenate(got_docs), docs)
    np.testing.assert_array_equal(np.concatenate(got_tfs), tfs)
    np.testing.assert_array_equal(np.concatenate(got_norms), norms)


@pytest.mark.parametrize("df", [1, 2, 127, 128, 129, 255, 256, 4095, 4096,
                                4097, 10000])
def test_block_boundaries(df):
    rng = np.random.default_rng(df)
    docs = np.sort(rng.choice(df * 10, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, size=df).astype(np.int64)
    norms = rng.integers(0, 256, size=df).astype(np.uint8)
    enc = encode_term(docs, tfs, norms)
    out = [decode_block(enc["first_doc"][i], enc["n"][i], enc["docs_enc"][i],
                        enc["tfs_enc"][i], enc["norms_enc"][i])
           for i in range(len(enc["n"]))]
    np.testing.assert_array_equal(np.concatenate([o[0] for o in out]), docs)
    np.testing.assert_array_equal(np.concatenate([o[1] for o in out]), tfs)


def test_impact_frontier_pareto():
    tfs = np.array([3, 1, 3, 5, 2, 5], dtype=np.int64)
    norms = np.array([10, 5, 20, 30, 5, 40], dtype=np.uint8)
    fr, no = impact_frontier(tfs, norms)
    pairs = set(zip(fr.tolist(), no.tolist()))
    # (1,5) dominated by (2,5); (3,20) dominated by (3,10); (5,40) by (5,30)
    assert pairs == {(2, 5), (3, 10), (5, 30)}
    # frontier property: freq asc ⇒ norm asc, and it upper-bounds every pair
    assert np.all(np.diff(fr) > 0) and np.all(np.diff(no.astype(int)) > 0)
    for t, m in zip(tfs, norms):
        assert any(f >= t and nm <= m for f, nm in pairs)


def test_impact_frontier_monotone_random():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = rng.integers(1, 128)
        tfs = rng.integers(1, 50, n).astype(np.int64)
        norms = rng.integers(0, 256, n).astype(np.uint8)
        fr, no = impact_frontier(tfs, norms)
        for t, m in zip(tfs, norms):
            assert any(f >= t and nm <= m for f, nm in zip(fr, no))


def test_decode_blocks_batch_matches_scalar():
    from lucene_ray.codec import decode_blocks

    rng = np.random.default_rng(99)
    for df in (1, 127, 128, 300, 4097):
        docs = np.sort(rng.choice(df * 20, size=df, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 2000, size=df).astype(np.int64)
        tfs[rng.integers(0, df, size=max(1, df // 50))] = 10**6  # exceptions
        norms = rng.integers(0, 256, size=df).astype(np.uint8)
        enc = encode_term(docs, tfs, norms)
        first = np.array(enc["first_doc"])
        n = np.array(enc["n"])
        d, t, m, off = decode_blocks(first, n, enc["docs_enc"],
                                     enc["tfs_enc"], enc["norms_enc"])
        np.testing.assert_array_equal(d, docs)
        np.testing.assert_array_equal(t, tfs)
        np.testing.assert_array_equal(m, norms)
        assert off[-1] == df


def test_batched_full_block_encode_byte_identical():
    """The batched full-block encoder must produce byte-identical cells
    to the per-block encode_deltas/encode_pfor path (same bpv and
    exception-count choices) across adversarial tf/doc shapes."""
    import numpy as np
    from lucene_ray.codec import (BLOCK_SIZE, encode_deltas, encode_pfor,
                                  encode_term)

    rng = np.random.default_rng(9)
    for trial in range(20):
        nblocks = int(rng.integers(2, 9))
        n = nblocks * BLOCK_SIZE + int(rng.integers(0, BLOCK_SIZE))
        gaps = rng.integers(1, int(rng.choice([2, 5, 1000, 1 << 20])),
                            n).astype(np.int64)
        docs = np.cumsum(gaps)
        mode = trial % 4
        if mode == 0:
            tfs = np.ones(n, dtype=np.int64)              # all-equal blocks
        elif mode == 1:
            tfs = rng.integers(1, 4, n).astype(np.int64)  # low var, k=0
        elif mode == 2:
            tfs = rng.integers(1, 4, n).astype(np.int64)  # a few outliers
            tfs[rng.integers(0, n, 5)] = int(rng.integers(1000, 1 << 20))
        else:
            tfs = rng.integers(1, 1 << 16, n).astype(np.int64)
        norms = rng.integers(0, 256, n).astype(np.uint8)
        enc = encode_term(docs, tfs, norms)
        for b in range(nblocks):            # full blocks only
            s = b * BLOCK_SIZE
            d = docs[s:s + BLOCK_SIZE]
            deltas = np.empty(BLOCK_SIZE, dtype=np.uint64)
            deltas[0] = 0
            deltas[1:] = np.diff(d).astype(np.uint64)
            assert enc["docs_enc"][b] == encode_deltas(deltas), (trial, b)
            assert enc["tfs_enc"][b] == encode_pfor(
                tfs[s:s + BLOCK_SIZE]), (trial, b)
