"""HalfFloatPoint + BigIntegerPoint codecs (sandbox/document)."""

import numpy as np


def test_half_roundtrip_exhaustive():
    """Every 16-bit pattern survives half -> float32 -> half
    (TestHalfFloatPoint.testHalfFloat's exhaustive loop, :27-37)."""
    from lucene_ray.halffloat import half_bits, half_value
    all16 = np.arange(65536, dtype=np.uint16)
    assert (half_bits(half_value(all16)) == all16).all()


def test_half_matches_numpy_float16():
    """float32 -> half agrees with IEEE 754 binary16 round-to-nearest-
    even (numpy) on a million mixed-scale values; the reference's
    float32-subnormal flush (:115) coincides with true conversion
    (those values underflow half anyway)."""
    from lucene_ray.halffloat import half_bits
    rng = np.random.default_rng(1)
    with np.errstate(over="ignore"):
        f = rng.standard_normal(1_000_000).astype(np.float32) * rng.choice(
            [1e-6, 1e-2, 1.0, 1e3, 1e5], size=1_000_000).astype(np.float32)
        assert (half_bits(f) == f.astype(np.float16).view(np.uint16)).all()
    tiny = np.array([1e-40, -1e-40, 0.0, -0.0], dtype=np.float32)
    assert half_bits(tiny).tolist() == [0, 0x8000, 0, 0x8000]


def test_half_round_shift_goldens():
    """The roundShift tie-to-even battery
    (TestHalfFloatPoint.testRoundShift, :61-77) through the public
    conversion: values sitting exactly between two halves round to the
    even mantissa."""
    from lucene_ray.halffloat import half_bits, half_value

    def rt(x):
        return float(half_value(half_bits(np.float32(x)))[()])

    # 2048 + 1 is exactly between 2048 and 2050 -> even (2048)
    assert rt(2049.0) == 2048.0
    assert rt(2051.0) == 2052.0          # between 2050 and 2052 -> 2052
    assert rt(2050.0) == 2050.0
    # overflow carries into infinity (HalfFloatPoint.java:121-133)
    assert rt(65520.0) == float("inf")
    assert rt(65519.0) == 65504.0
    assert rt(-65520.0) == float("-inf")


def test_half_sortable_enumerates_in_order():
    """sortableShort is an order isomorphism: stepping the short walks
    every half from -inf to +inf in value order
    (TestHalfFloatPoint.testSortableBits, :140-157)."""
    from lucene_ray.halffloat import sortable_short, sortable_to_half
    s = np.arange(-31745, 31745, dtype=np.int32)   # -inf .. +inf shorts
    v = sortable_to_half(s.astype(np.int16))
    assert not np.isnan(v).any()
    d = np.diff(v)
    flat = np.flatnonzero(~(d > 0))
    # exactly one non-increasing step: -0.0 -> +0.0 (equal as floats,
    # distinct as sortable shorts)
    assert len(flat) == 1
    i = int(flat[0])
    assert np.signbit(v[i]) and not np.signbit(v[i + 1]) and v[i] == 0
    assert (sortable_short(v) == s.astype(np.int16)).all()
    assert v[0] == float("-inf") and v[-1] == float("inf")


def test_half_next_up_down():
    from lucene_ray.halffloat import next_down, next_up
    assert next_up(1.0) == 1.0009765625
    assert next_down(1.0) == 0.99951171875
    assert next_up(float("inf")) == float("inf")
    assert next_down(float("-inf")) == float("-inf")
    # crossing zero: nextUp(-minSubnormal) == -0? the reference steps
    # the sortable short, so -min subnormal -> -0.0
    assert next_up(-5.9604645e-08) == 0.0
    assert next_down(5.9604645e-08) == 0.0


def test_bigint_sortable_order_and_roundtrip():
    from lucene_ray.bigintpoint import (MAX_VALUE, MIN_VALUE,
                                        bigint_to_sortable_bytes,
                                        sortable_bytes_to_bigint)
    import random
    rnd = random.Random(3)
    vals = [MIN_VALUE, -1, 0, 1, MAX_VALUE] + [
        rnd.randint(MIN_VALUE, MAX_VALUE) for _ in range(5000)]
    enc = [bigint_to_sortable_bytes(v) for v in vals]
    for v, e in zip(vals, enc):
        assert sortable_bytes_to_bigint(e) == v
        assert len(e) == 16
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    byteorder = sorted(range(len(vals)), key=lambda i: enc[i])
    assert [vals[i] for i in order] == [vals[i] for i in byteorder]


def test_bigint_range_errors():
    import pytest
    from lucene_ray.bigintpoint import bigint_to_sortable_bytes
    with pytest.raises(ValueError):
        bigint_to_sortable_bytes(1 << 127)
    with pytest.raises(ValueError):
        bigint_to_sortable_bytes(-(1 << 127) - 1)
