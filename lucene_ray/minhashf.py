"""MinHash token filter (analysis/minhash/MinHashFilter.java:48) — the
query-time LSH fingerprinting surface (the doc-level scale pipeline
lives in ``dedup.py``; this is the reference's per-field filter with
its exact MurmurHash3 x64-128 values and token byte layout).

Semantics (MinHashFilter.incrementToken:148-246): hash every input
token (UTF-16LE bytes, seed 0), rehash per hash-index via
``combineOrdered`` with the murmur of the big-endian int index, route
by the top 32 bits of val2 into ``bucketCount`` ranges, keep the
``hashSetSize`` smallest unique values per (hash, bucket) under
UNSIGNED (val2, val1) order; with rotation (hashSetSize == 1) empty
buckets borrow the next non-empty bucket's minimum, scanning buckets
in order over live state. Emitted token text packs the 128-bit value
into 16-bit chars ([int index +] val2 then val1 — 8 chars single-hash,
2+6 multi-hash); NOTE the chars may be lone surrogates, so these
tokens are kept at the function surface (not Arrow-safe for indexing).
"""

from __future__ import annotations

_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmur3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """-> (val1, val2) as UNSIGNED 64-bit ints."""
    length = len(key)
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    rounded = length & ~15
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(key[i:i + 8], "little")
        k2 = int.from_bytes(key[i + 8:i + 16], "little")
        k1 = (k1 * c1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * c2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = key[rounded:]
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        if len(tail) > 8:
            k2 = (k2 * c2) & _M
            k2 = _rotl(k2, 33)
            k2 = (k2 * c1) & _M
            h2 ^= k2
        k1 = (k1 * c1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & _M
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def _int_hash(i: int) -> tuple[int, int]:
    return murmur3_x64_128(i.to_bytes(4, "big"))


def _combine(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    return ((a[0] * 37 + b[0]) & _M, (a[1] * 37 + b[1]) & _M)


def _chars(v: int, n: int) -> str:
    return "".join(chr((v >> (16 * (n - 1 - k))) & 0xFFFF)
                   for k in range(n))


def min_hash_tokens(tokens: list[str], hash_count: int = 1,
                    bucket_count: int = 512,
                    hash_set_size: int = 1,
                    with_rotation: bool | None = None) -> list[str]:
    """-> the filter's emitted token texts, in emission order."""
    if with_rotation is None:
        with_rotation = bucket_count > 1
    bucket_size = (1 << 32) // bucket_count
    if (1 << 32) % bucket_count != 0:
        bucket_size += 1
    # (hash, bucket) -> sorted unique list of (val2, val1), capped
    sets: list[list[list[tuple[int, int]]]] = [
        [[] for _ in range(bucket_count)] for _ in range(hash_count)]
    int_hashes = [_int_hash(i) for i in range(hash_count)]
    for tok in tokens:
        h = murmur3_x64_128(tok.encode("utf-16-le"))
        for i in range(hash_count):
            v1, v2 = _combine(h, int_hashes[i])
            key = (v2, v1)
            s = sets[i][(v2 >> 32) // bucket_size]
            if key in s:
                continue
            if len(s) >= hash_set_size:
                if key >= s[-1]:
                    continue
                s.pop()
            s.append(key)
            s.sort()
    if with_rotation and hash_set_size == 1:
        for i in range(hash_count):
            for b in range(bucket_count):
                if not sets[i][b]:
                    for off in range(1, bucket_count):
                        src = sets[i][(b + off) % bucket_count]
                        if src:
                            sets[i][b].append(src[0])
                            break
    out: list[str] = []
    for i in range(hash_count):
        for b in range(bucket_count):
            for v2, v1 in sets[i][b]:
                if hash_count > 1:
                    # long0/long1 = the TOP two 16-bit chunks of val1
                    out.append(_chars(i, 2) + _chars(v2, 4)
                               + _chars(v1 >> 32, 2))
                else:
                    out.append(_chars(v2, 4) + _chars(v1, 4))
    return out
