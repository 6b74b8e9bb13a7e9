"""IEEE-754 binary16 (half float) point type
(sandbox/document/HalfFloatPoint.java:31).

Bit-exact vectorized reimplementation of the reference's conversions:

- ``half_bits``: float32 -> half bits with round-half-even via the
  add-then-clear-tie-bit trick (roundShift, HalfFloatPoint.java:147);
  float32 subnormals flush to +-0 (:115), overflow rounds into the
  infinity pattern through the exponent carry (:121-124, the mantissa
  round at :133 may carry into exp 0x1f).
- ``half_value``: half bits -> exact float32 (:157-176), half
  subnormals renormalized by the leading-zero shift.
- ``sortable_short``: order-preserving int16 (sign-magnitude fold,
  :105-107); nextUp/nextDown step it by one (:46-73).
"""

from __future__ import annotations

import numpy as np


def half_bits(v) -> np.ndarray:
    """float32 array -> half-float bit patterns (uint16)."""
    f = np.asarray(v, dtype=np.float32)
    bits = f.view(np.uint32).astype(np.int64)
    sign = bits >> 31
    exp = (bits >> 23) & 0xFF
    mant = bits & 0x7FFFFF

    out_exp = np.zeros_like(exp)
    out_mant = np.zeros_like(mant)

    def round_shift(i, shift):
        i = i + (np.int64(1) << (shift - 1))
        i = i - ((i >> shift) & 1)
        return i >> shift

    # NaN / infinity
    special = exp == 0xFF
    out_exp = np.where(special, 0x1F, out_exp)
    out_mant = np.where(special, mant >> (23 - 10), out_mant)

    # float32 subnormals and zeros flush to signed zero (exp=mant=0)

    normal = (exp != 0xFF) & (exp != 0)
    e = exp - 127 + 15
    # e >= 0x1f: overflow to infinity
    over = normal & (e >= 0x1F)
    out_exp = np.where(over, 0x1F, out_exp)

    # e <= 0: half subnormal (or zero when shifted out)
    sub = normal & (e <= 0)
    shift = 23 - 10 - e + 1
    sub_ok = sub & (shift < 32)
    m = round_shift(mant | 0x800000, np.where(sub_ok, shift, 1))
    out_exp = np.where(sub_ok, m >> 10, out_exp)
    out_mant = np.where(sub_ok, m & 0x3FF, out_mant)

    # normal range: round 23->10 bits, carry may bump the exponent
    norm = normal & (e > 0) & (e < 0x1F)
    m2 = round_shift((np.where(norm, e, 1) << 23) | mant, 23 - 10)
    out_exp = np.where(norm, m2 >> 10, out_exp)
    out_mant = np.where(norm, m2 & 0x3FF, out_mant)

    return ((sign << 15) | (out_exp << 10) | out_mant).astype(np.uint16)


def half_value(s) -> np.ndarray:
    """Half-float bit patterns (uint16) -> exact float32 values."""
    bits = np.asarray(s, dtype=np.uint16).astype(np.int64)
    sign = bits >> 15
    exp = (bits >> 10) & 0x1F
    mant = bits & 0x3FF

    out_exp = np.zeros_like(exp)
    out_mant = np.zeros_like(mant)

    special = exp == 0x1F
    out_exp = np.where(special, 0xFF, out_exp)
    out_mant = np.where(special, mant << (23 - 10), out_mant)

    zero = (exp == 0) & (mant == 0)
    nonzero = ~special & ~zero
    # renormalize subnormals: shift = nlz32(mant) - (32 - 11), i.e.
    # 11 - bit_length(mant) for the 10-bit mantissa (:168)
    bl = np.zeros_like(mant)
    t = mant.copy()
    for k in range(11):
        bl = np.where(t > 0, bl + 1, bl)
        t >>= 1
    shift = 11 - bl                     # == nlz32(mant) - 21
    is_sub = nonzero & (exp == 0)
    mant2 = np.where(is_sub, (mant << np.where(is_sub, shift, 0)) & 0x3FF,
                     mant)
    exp2 = np.where(is_sub, exp - shift + 1, exp)
    out_exp = np.where(nonzero, exp2 + 127 - 15, out_exp)
    out_mant = np.where(nonzero, mant2 << (23 - 10), out_mant)

    u32 = ((sign << 31) | (out_exp << 23) | out_mant).astype(np.uint32)
    return u32.view(np.float32)


def _sortable_bits(s: np.ndarray) -> np.ndarray:
    """sortableShortBits (:105): fold the sign-magnitude order."""
    s16 = np.asarray(s, dtype=np.uint16).astype(np.int16)
    return (s16 ^ ((s16 >> 15) & 0x7FFF)).astype(np.int16)


def sortable_short(v) -> np.ndarray:
    """halfFloatToSortableShort (:96): float32 -> order-preserving
    int16."""
    return _sortable_bits(half_bits(v))


def sortable_to_half(s) -> np.ndarray:
    """sortableShortToHalfFloat (:101)."""
    return half_value(_sortable_bits(np.asarray(s, dtype=np.int16))
                      .astype(np.uint16))


def next_up(v: float) -> float:
    """HalfFloatPoint.nextUp (:46)."""
    v = np.float32(v)
    if np.isnan(v) or v == np.float32(np.inf):
        return float(v)
    s = int(sortable_short([v])[0])
    r = sortable_to_half([np.int16(s)])[0]
    if r <= v:
        r = sortable_to_half([np.int16(s + 1)])[0]
    return float(r)


def next_down(v: float) -> float:
    """HalfFloatPoint.nextDown (:64)."""
    v = np.float32(v)
    if np.isnan(v) or v == np.float32(-np.inf):
        return float(v)
    s = int(sortable_short([v])[0])
    r = sortable_to_half([np.int16(s)])[0]
    if r >= v:
        r = sortable_to_half([np.int16(s - 1)])[0]
    return float(r)
