"""Lucene SmallFloat norm quantization, vectorized.

Reproduces the exact semantics of the reference's
``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java``:

- ``longToInt4`` / ``int4ToLong`` (SmallFloat.java:104-139): float-like
  order-preserving encoding of positive longs keeping 4 significant bits.
- ``intToByte4`` / ``byte4ToInt`` (SmallFloat.java:147-167): byte encoding of
  a non-negative int; values below ``NUM_FREE_VALUES`` are exact, larger
  values round down to 4 significant bits.

The per-document norm byte is ``intToByte4(fieldLength)`` per
``search/similarities/Similarity.java:152-163`` (field length = number of
indexed tokens; position increments are always 1 for StandardAnalyzer so
``numOverlap`` is 0).

``LENGTH_TABLE`` mirrors ``BM25Similarity.java:111-117``: the 256 decoded
lengths as float32.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.longToInt4 (SmallFloat.java:104-122)."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    # numBits = 64 - numberOfLeadingZeros(i)
    num_bits = np.zeros_like(i)
    nz = i > 0
    # int64 values here are < 2**62 in practice; use log2 via bit_length trick
    num_bits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
    # guard against float rounding at exact powers of two
    too_low = nz & (i >> np.clip(num_bits, 0, 63) > 0)
    num_bits[too_low] += 1
    too_high = nz & (i >> np.clip(num_bits - 1, 0, 63) == 0)
    num_bits[too_high] -= 1

    shift = num_bits - 4
    subnormal = num_bits < 4
    encoded = np.where(subnormal, i, (i >> np.clip(shift, 0, 63)) & 0x07)
    encoded = np.where(subnormal, encoded, encoded | ((shift + 1) << 3))
    return encoded.astype(np.int64)


def int4_to_long(i: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.int4ToLong (SmallFloat.java:125-139)."""
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    subnormal = shift == -1
    return np.where(subnormal, bits, (bits | 0x08) << np.clip(shift, 0, 63))


MAX_INT4 = int(long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - MAX_INT4


def int_to_byte4(i: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.intToByte4 (SmallFloat.java:147-156) → uint8."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("Only supports positive values")
    small = i < NUM_FREE_VALUES
    big = NUM_FREE_VALUES + long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0))
    return np.where(small, i, big).astype(np.uint8)


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    """Vectorized SmallFloat.byte4ToInt (SmallFloat.java:159-167) → int64."""
    i = np.asarray(b, dtype=np.int64) & 0xFF
    small = i < NUM_FREE_VALUES
    big = NUM_FREE_VALUES + int4_to_long(np.maximum(i - NUM_FREE_VALUES, 0))
    return np.where(small, i, big).astype(np.int64)


# BM25Similarity.java:111-117 — LENGTH_TABLE[i] = byte4ToInt((byte) i) as float32
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256)).astype(np.float32)
