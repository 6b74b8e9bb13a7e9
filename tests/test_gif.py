"""GIF codec (lucene_ray.gif) + G.711 WAV (lucene_ray.media) tests."""

import struct

import numpy as np
import pytest

from lucene_ray.gif import (_lzw_decode, _lzw_encode, decode_gif,
                            decode_gif_first, encode_gif, encode_gif_rgb,
                            gif_info, quantize_rgb)
from lucene_ray.media import _g711_table, decode_wav, encode_wav, sniff


def test_lzw_roundtrip():
    r = np.random.default_rng(11)
    for mcs, hi, n in ((2, 4, 0), (2, 4, 1), (4, 16, 977),
                       (8, 256, 70000)):       # 70k forces table resets
        data = r.integers(0, hi, n, dtype=np.uint8).tobytes()
        assert _lzw_decode(mcs, _lzw_encode(mcs, data)) == data
    # highly repetitive input (deep prefix chains + KwKwK patterns)
    data = (b"\x00" * 500 + b"\x01\x00\x01" * 400) * 30
    assert _lzw_decode(2, _lzw_encode(2, data)) == data
    with pytest.raises(ValueError):
        _lzw_decode(1, b"\x00")                # min code size out of range
    with pytest.raises(ValueError):
        _lzw_decode(4, b"\xff\xff\xff\xff")    # codes out of range


def test_gif_paletted_animation_roundtrip():
    r = np.random.default_rng(5)
    pal = r.integers(0, 256, (61, 3), dtype=np.uint8)   # non-pow2 size
    frames = r.integers(0, 61, (5, 18, 23), dtype=np.uint8)
    b = encode_gif(frames, pal, fps=10.0, loop=0)
    assert sniff(b) == "image/gif"
    assert b.startswith(b"GIF89a") and b.endswith(b"\x3b")
    assert gif_info(b) == (5, 10.0)            # header walk only
    dec, fps = decode_gif(b)
    assert fps == 10.0
    np.testing.assert_array_equal(dec, pal[frames])
    np.testing.assert_array_equal(decode_gif_first(b), pal[frames[0]])
    # single still frame: no NETSCAPE loop block
    b1 = encode_gif(frames[0], pal, fps=10.0)
    assert b"NETSCAPE" not in b1 and b"NETSCAPE" in b
    np.testing.assert_array_equal(decode_gif(b1)[0][0], pal[frames[0]])


def test_gif_rgb_quantization():
    r = np.random.default_rng(6)
    img = r.integers(0, 256, (14, 9, 3), dtype=np.uint8)
    idx, pal = quantize_rgb(img)
    assert pal.shape == (216, 3) and idx.max() < 216
    # floor-mapping onto the 6x6x6 cube, each channel within one level
    assert np.abs(pal[idx].astype(int) - img.astype(int)).max() <= 51
    dec, _ = decode_gif(encode_gif_rgb(img))
    np.testing.assert_array_equal(dec[0], pal[idx])


def _hand_gif(blocks: list[bytes], w: int, h: int,
              gct: np.ndarray | None) -> bytes:
    flags = 0
    tail = b""
    if gct is not None:
        n = len(gct)
        bits = int(np.ceil(np.log2(max(n, 2))))
        flags = 0x80 | (bits - 1)
        pad = np.zeros((1 << bits, 3), np.uint8)
        pad[:n] = gct
        tail = pad.tobytes()
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, flags, 0, 0)
            + tail + b"".join(blocks) + b"\x3b")


def _img_block(idx: np.ndarray, x: int, y: int,
               interlace: bool = False) -> bytes:
    ih, iw = idx.shape
    mcs = 2
    data = idx.astype(np.uint8).tobytes()
    return (b"\x2c" + struct.pack("<HHHH", x, y, iw, ih)
            + bytes([0x40 if interlace else 0]) + bytes([mcs])
            + _subblocks(_lzw_encode(mcs, data)))


def _subblocks(data: bytes) -> bytes:
    parts = []
    for i in range(0, len(data), 255):
        c = data[i:i + 255]
        parts.append(bytes([len(c)]) + c)
    return b"".join(parts) + b"\x00"


def test_gif_interlaced_decode():
    """Hand-build an interlaced frame: rows stored in the spec's
    8/8-4/8-2/4-1/2 pass order must be re-woven to the original."""
    r = np.random.default_rng(7)
    h, w = 11, 6
    img = r.integers(0, 4, (h, w), dtype=np.uint8)
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    stored = img[order]                         # stream order
    gct = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    b = _hand_gif([_img_block(stored, 0, 0, interlace=True)], w, h, gct)
    dec, _ = decode_gif(b)
    np.testing.assert_array_equal(dec[0], gct[img])


def test_gif_disposal_and_transparency():
    """Disposal 2 (restore background) and 3 (restore previous) + a
    transparent index composite per the 89a spec."""
    gct = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   np.uint8)
    w = h = 4
    full = np.full((4, 4), 1, np.uint8)         # frame 1: all red
    patch = np.full((2, 2), 2, np.uint8)        # frame 2: green patch
    patch_t = np.array([[3, 0], [0, 3]], np.uint8)  # 0 = transparent

    def gce(disposal: int, transparent: int | None) -> bytes:
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        return (b"\x21\xf9\x04" + bytes([packed])
                + struct.pack("<H", 5)
                + bytes([transparent or 0]) + b"\x00")

    # frame1 disposal=3 (restore previous = bg), frame2 disposal=2
    # (restore its region to bg), frame3 transparent over what remains
    b = _hand_gif([
        gce(3, None), _img_block(full, 0, 0),
        gce(2, None), _img_block(patch, 1, 1),
        gce(0, 0), _img_block(patch_t, 2, 2),
    ], w, h, gct)
    frames, fps = decode_gif(b)
    assert len(frames) == 3 and fps == pytest.approx(100.0 / 5)
    bgc, red, green, blue = (gct[0], gct[1], gct[2], gct[3])
    np.testing.assert_array_equal(frames[0], np.broadcast_to(red, (4, 4, 3)))
    # after disposal 3: canvas back to bg; frame 2 = bg + green patch
    exp2 = np.broadcast_to(bgc, (4, 4, 3)).copy()
    exp2[1:3, 1:3] = green
    np.testing.assert_array_equal(frames[1], exp2)
    # after disposal 2: patch region restored to bg; frame 3 paints only
    # the opaque (non-0) diagonal of its 2x2 block at (2,2)
    exp3 = np.broadcast_to(bgc, (4, 4, 3)).copy()
    exp3[2, 2] = blue
    exp3[3, 3] = blue
    np.testing.assert_array_equal(frames[2], exp3)


def test_gif_corruption_contract():
    r = np.random.default_rng(8)
    pal = r.integers(0, 256, (16, 3), dtype=np.uint8)
    b = encode_gif(r.integers(0, 16, (2, 9, 9), dtype=np.uint8), pal)
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 3)     # truncated header
    with pytest.raises(ValueError):
        decode_gif(b[:40])                      # truncated mid-stream
    bad = bytearray(b)
    # find the first image separator and corrupt it to an unknown block
    img_at = bytes(bad).find(b"\x2c", 13 + 48)
    bad[img_at] = 0x99
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))
    with pytest.raises(ValueError):
        decode_gif(b"notagif")
    with pytest.raises(ValueError):
        encode_gif(np.array([[5]], np.uint8), pal[:4])  # idx > palette


def test_g711_tables_canonical_values():
    """Spot-check the CCITT expansion tables against the published
    values (classic g711.c layout)."""
    mu = _g711_table("mulaw")
    al = _g711_table("alaw")
    assert mu[0x00] == -32124 and mu[0x80] == 32124   # extremes
    assert mu[0xFF] == 0 and mu[0x7F] == 0            # two zero codes
    assert al[0x55] == -8 and al[0xD5] == 8           # smallest magnitudes
    assert al[0x2A] == -32256 and al[0xAA] == 32256   # largest
    # expansion is monotone within each sign's code ordering
    assert (np.diff(np.sort(mu)) >= 0).all() and len(np.unique(mu)) == 255
    assert len(np.unique(al)) == 256


def test_g711_wav_roundtrip():
    r = np.random.default_rng(9)
    s = (np.sin(np.linspace(0, 60, 3000)) * 30000).astype(np.int16)
    for law in ("mulaw", "alaw"):
        b = encode_wav(s, 8000, law=law)
        assert sniff(b) == "audio/wav"
        got, rate = decode_wav(b)
        assert rate == 8000 and len(got) == len(s)
        # G.711 is logarithmic: relative error small for large samples
        big = np.abs(s) > 1000
        rel = np.abs(got[big].astype(float) - s[big]) / np.abs(s[big])
        assert rel.max() < 0.08
        # encode picked the NEAREST table entry for every sample
        table = _g711_table(law).astype(np.int32)
        best = np.min(np.abs(table[None, :]
                             - s[:50].astype(np.int32)[:, None]), axis=1)
        assert np.array_equal(np.abs(got[:50].astype(np.int32)
                                     - s[:50].astype(np.int32)), best)
    # stereo G.711
    st = r.integers(-32000, 32000, (500, 2)).astype(np.int16)
    got, rate = decode_wav(encode_wav(st, 16000, law="mulaw"))
    assert got.shape == (500, 2)
    # PCM16 path unchanged
    got, _ = decode_wav(encode_wav(s, 8000))
    np.testing.assert_array_equal(got, s)


def test_gif_avi_decode_fuzz_contract():
    """Corrupt/truncated GIF and AVI payloads must raise ValueError (or
    NotImplementedError for unsupported modes) — never struct.error /
    IndexError / anything that would kill a degradation-mode actor
    (same contract as decode_jpeg)."""
    from lucene_ray.gif import decode_gif, decode_gif_first, gif_info
    from lucene_ray.media import avi_info, decode_avi, encode_avi_mjpeg

    r = np.random.default_rng(21)
    pal = r.integers(0, 256, (16, 3), dtype=np.uint8)
    g = encode_gif(r.integers(0, 16, (3, 12, 15), dtype=np.uint8), pal)
    base = (np.arange(16)[:, None, None] * 8
            + np.arange(16)[None, :, None] * 5).astype(np.uint8) \
        + np.zeros((16, 16, 3), np.uint8)
    a = encode_avi_mjpeg(np.stack([base] * 3), fps=8.0)
    cases = (("gif", g, (decode_gif, gif_info, decode_gif_first)),
             ("avi", a, (decode_avi, avi_info)))
    for name, payload, fns in cases:
        for trial in range(700):
            q = bytearray(payload)
            mode = trial % 3
            if mode == 0:
                q = q[: r.integers(1, len(q))]
            elif mode == 1:
                for _ in range(int(r.integers(1, 8))):
                    q[int(r.integers(0, len(q)))] = int(r.integers(0, 256))
            else:
                q = q[: r.integers(10, len(q))]
                if len(q):
                    q[int(r.integers(0, len(q)))] = int(r.integers(0, 256))
            for fn in fns:
                try:
                    fn(bytes(q))
                except (ValueError, NotImplementedError):
                    pass


def test_png_gray_and_palette_decode():
    """PNG color types 0 (grayscale) and 3 (palette) at sub-byte depths:
    MSB-first bit unpacking, PLTE lookup, tRNS alpha — per the spec."""
    import zlib

    from lucene_ray.media import decode_png, encode_png

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    def png(w, h, depth, ctype, raw, extra=b""):
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                             ctype, 0, 0, 0))
                + extra + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))

    r = np.random.default_rng(14)
    img = r.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    g = r.integers(0, 256, (5, 6), dtype=np.uint8)
    raw = np.concatenate([np.zeros((5, 1), np.uint8), g], axis=1).tobytes()
    d = decode_png(png(6, 5, 8, 0, raw))
    assert d.shape == (5, 6, 3)
    np.testing.assert_array_equal(d[:, :, 0], g)
    np.testing.assert_array_equal(d[:, :, 2], g)     # replicated to RGB

    bits = r.integers(0, 2, (4, 10), dtype=np.uint8)
    packed = np.packbits(bits, axis=1)               # MSB-first
    raw = np.concatenate([np.zeros((4, 1), np.uint8), packed],
                         axis=1).tobytes()
    d = decode_png(png(10, 4, 1, 0, raw))
    np.testing.assert_array_equal(d[:, :, 0], bits * 255)

    pal = r.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = r.integers(0, 16, (3, 5), dtype=np.uint8)
    hi = idx[:, 0::2]
    lo = np.pad(idx[:, 1::2],
                ((0, 0), (0, hi.shape[1] - idx[:, 1::2].shape[1])))
    raw = np.concatenate([np.zeros((3, 1), np.uint8), (hi << 4) | lo],
                         axis=1).tobytes()
    trns = bytes([100] * 8)
    p = png(5, 3, 4, 3, raw,
            extra=chunk(b"PLTE", pal.tobytes()) + chunk(b"tRNS", trns))
    d = decode_png(p)
    assert d.shape == (3, 5, 4)
    np.testing.assert_array_equal(d[:, :, :3], pal[idx])
    np.testing.assert_array_equal(d[:, :, 3], np.where(idx < 8, 100, 255))

    # contract: 16-bit / interlace stay fenced; corrupt palette raises
    with pytest.raises(NotImplementedError):
        decode_png(png(2, 2, 16, 0, b"\x00" * 10))
    with pytest.raises(ValueError):
        decode_png(png(5, 3, 4, 3, raw))             # PLTE missing
    short = png(6, 5, 8, 0, raw[:8])
    with pytest.raises(ValueError):
        decode_png(short)
