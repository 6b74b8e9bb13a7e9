"""SmallFloat parity tests.

Mirrors the reference's TestSmallFloat
(lucene/core/src/test/org/apache/lucene/util/TestSmallFloat.java): exhaustive
byte4 round-trips and monotonicity.
"""

import numpy as np

from lucene_ray.smallfloat import (LENGTH_TABLE, NUM_FREE_VALUES, byte4_to_int,
                                   int4_to_long, int_to_byte4, long_to_int4)


def _java_long_to_int4(i: int) -> int:
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _java_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def _java_int_to_byte4(i: int) -> int:
    if i < NUM_FREE_VALUES:
        return i
    return (NUM_FREE_VALUES + _java_long_to_int4(i - NUM_FREE_VALUES)) & 0xFF


def _java_byte4_to_int(b: int) -> int:
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _java_int4_to_long(b - NUM_FREE_VALUES)


def test_num_free_values():
    # MAX_INT4 = longToInt4(Integer.MAX_VALUE) = 0xE7 = 231 → 24 free values
    assert NUM_FREE_VALUES == 255 - _java_long_to_int4(2**31 - 1)


def test_long_to_int4_against_scalar_reference():
    vals = np.unique(np.concatenate([
        np.arange(0, 70000),
        (2 ** np.arange(1, 62)).astype(np.int64),
        (2 ** np.arange(1, 62)).astype(np.int64) - 1,
        (2 ** np.arange(1, 62)).astype(np.int64) + 1,
    ]))
    got = long_to_int4(vals)
    expect = np.array([_java_long_to_int4(int(v)) for v in vals])
    np.testing.assert_array_equal(got, expect)


def test_int4_roundtrip_monotone():
    vals = np.arange(0, 2**20)
    enc = long_to_int4(vals)
    dec = int4_to_long(enc)
    # decode(encode(x)) <= x, and encode is monotone
    assert np.all(dec <= vals)
    assert np.all(np.diff(enc) >= 0)


def test_byte4_exhaustive():
    b = np.arange(256)
    dec = byte4_to_int(b)
    expect = np.array([_java_byte4_to_int(i) for i in range(256)])
    np.testing.assert_array_equal(dec, expect)
    # re-encode is identity on decoded values
    np.testing.assert_array_equal(int_to_byte4(dec), b.astype(np.uint8))
    # strictly monotone decode table (norm byte ordering == length ordering)
    assert np.all(np.diff(dec) > 0)


def test_int_to_byte4_against_scalar_reference():
    vals = np.unique(np.concatenate([
        np.arange(0, 100000),
        np.array([2**20, 2**24, 2**30, 2**31 - 1]),
    ]))
    got = int_to_byte4(vals)
    expect = np.array([_java_int_to_byte4(int(v)) for v in vals],
                      dtype=np.uint8)
    np.testing.assert_array_equal(got, expect)


def test_length_table():
    # BM25Similarity.java:111-117
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    # first 24 (NUM_FREE_VALUES) values are exact
    np.testing.assert_array_equal(LENGTH_TABLE[:NUM_FREE_VALUES],
                                  np.arange(NUM_FREE_VALUES, dtype=np.float32))
    # Java assigns the int to a float → float32 rounding, same as np.float32
    assert LENGTH_TABLE[255] == np.float32(_java_byte4_to_int(255))


def test_sweetspot_length_norm_plateau():
    """SweetSpotSimilarity.lengthNorm: exactly 1.0 inside [min, max]
    (the sweet spot), strictly decreasing outside, and the norm table
    wires normTable[0] = 1/normTable[255]
    (TFIDFSimilarity.java:442-447)."""
    import numpy as np

    from lucene_ray.sweetspot import (LN_MAX, LN_MIN, length_norm,
                                      norm_table)

    for x in range(LN_MIN, LN_MAX + 1):
        assert length_norm(x) == np.float32(1.0)
    assert length_norm(LN_MIN - 1) < 1.0 and length_norm(LN_MAX + 1) < 1.0
    assert length_norm(100) < length_norm(50) < length_norm(9)
    nt = norm_table()
    assert nt[0] == np.float32(1.0) / nt[255]
    # degraded form sanity: steep*(|x-l|+|x-h|-(h-l))+1 at x=18 is
    # 0.5*(15+10-5)+1 = 11 → 1/sqrt(11)
    import math
    assert length_norm(18) == np.float32(1.0 / math.sqrt(11.0))
