"""MinHash token filter vs TestMinHashFilter goldens (exact murmur
values, exact token char arrays, and the count/rotation batteries)."""

from lucene_ray.minhashf import (min_hash_tokens, murmur3_x64_128,
                                 _int_hash)


def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u


def test_int_hash_golden():
    v1, v2 = _int_hash(0)
    assert _signed(v1) == -3485513579396041028
    assert _signed(v2) == 6383328099726337777


def test_string_hash_golden():
    v1, v2 = murmur3_x64_128(
        "woof woof woof woof woof".encode("utf-16-le"))
    assert _signed(v1) == 7638079586852243959
    assert _signed(v2) == 4378804943379391304


_S1 = "woof woof woof woof woof"
_S2 = "woof woof woof woof puff"


def test_single_input_tokens():
    assert min_hash_tokens([_S1], 1, 1, 100, False) == \
        ["".join(map(chr, [8449, 54077, 64133, 32857, 8605, 41409,
                       54897, 26479]))]
    got = min_hash_tokens([_S1], 2, 1, 1, False)
    assert got == [
        "".join(map(chr, [0, 0, 8449, 54077, 64133, 32857, 8605,
                          41409])),
        "".join(map(chr, [0, 1, 16887, 58164, 39536, 14926, 6529,
                          17276]))]


def test_two_shingle_tokens():
    got = min_hash_tokens([_S1, _S2], 1, 1, 100, False)
    assert got == [
        "".join(map(chr, [8449, 54077, 64133, 32857, 8605, 41409,
                       54897, 26479])),
        "".join(map(chr, [36347, 63457, 43013, 56843, 52284, 34231,
                          57934, 42302]))]


def test_count_batteries():
    toks = [_S1, _S2]
    assert len(min_hash_tokens(toks, 100, 1, 1, False)) == 100
    assert len(min_hash_tokens(toks, 10, 1, 10, False)) == 20
    assert len(min_hash_tokens(toks, 10, 10, 1, False)) == 20
    assert len(min_hash_tokens(toks, 10, 10, 1, True)) == 100


def test_rotation_fills_buckets():
    toks = [_S1, _S2]
    assert len(min_hash_tokens(toks, 1, 100, 1, False)) == 2
    rolled = min_hash_tokens(toks, 1, 100, 1, True)
    assert len(rolled) == 100
    assert len(set(rolled)) == 2
