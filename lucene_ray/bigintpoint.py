"""128-bit integer point type (sandbox/document/BigIntegerPoint.java:33,
util/NumericUtils.bigIntToSortableBytes): big-endian two's complement
with the sign bit flipped, so UNSIGNED byte order equals numeric order
and range queries compare raw bytes."""

from __future__ import annotations

BYTES = 16
MIN_VALUE = -(1 << 127)
MAX_VALUE = (1 << 127) - 1


def bigint_to_sortable_bytes(v: int) -> bytes:
    """NumericUtils.bigIntToSortableBytes for 16-byte dimensions."""
    if not MIN_VALUE <= v <= MAX_VALUE:
        raise ValueError(f"BigIntegerPoint value out of 128-bit range: {v}")
    b = v.to_bytes(BYTES, "big", signed=True)
    return bytes([b[0] ^ 0x80]) + b[1:]


def sortable_bytes_to_bigint(b: bytes) -> int:
    """NumericUtils.sortableBytesToBigInt."""
    if len(b) != BYTES:
        raise ValueError(f"expected {BYTES} bytes, got {len(b)}")
    return int.from_bytes(bytes([b[0] ^ 0x80]) + b[1:], "big",
                          signed=True)
