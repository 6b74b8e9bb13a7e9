"""Baseline JPEG codec (ITU-T T.81) tests: round-trip fidelity across
sampling modes / qualities / shapes, restart-marker bit-exactness,
optimized-Huffman validity, spec fences, and the media-pipeline flow."""

import numpy as np
from struct import error as struct_error
import pytest

from lucene_ray.jpeg import (_build_huffman, _codes_from_table,
                             decode_jpeg, encode_jpeg)


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.random.default_rng(seed)
    base = (np.sin(yy / 9.0) * 80 + np.cos(xx / 7.0) * 60 + 128
            + r.normal(0, 4, (h, w)))
    return np.clip(np.stack([base, np.roll(base, 3, 0),
                             np.roll(base, 5, 1)], axis=-1),
                   0, 255).astype(np.uint8)


def test_roundtrip_fidelity_modes():
    img = _smooth(40, 56)
    for sub in (False, True):
        # 4:2:0 pays the chroma-subsample cost on this color-shifted
        # pattern (~+3 rmse) — tolerances bound regression, not codecs
        for q, tol in ((95, 4.0 + 3.5 * sub), (75, 8.0 + 2.0 * sub),
                       (40, 14.0)):
            dec = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            rmse = np.sqrt(np.mean(
                (dec.astype(float) - img.astype(float)) ** 2))
            assert rmse < tol, (sub, q, rmse)
    # higher quality must not be worse
    e95 = decode_jpeg(encode_jpeg(img, quality=95))
    e40 = decode_jpeg(encode_jpeg(img, quality=40))
    r95 = np.mean((e95.astype(float) - img) ** 2)
    r40 = np.mean((e40.astype(float) - img) ** 2)
    assert r95 < r40
    assert len(encode_jpeg(img, quality=40)) < len(
        encode_jpeg(img, quality=95))


def test_grayscale_and_shapes():
    for shape in ((17, 23), (8, 8), (1, 1), (33, 64), (16, 16)):
        im2 = ((np.indices(shape).sum(0) * 7) % 256).astype(np.uint8)
        g = decode_jpeg(encode_jpeg(im2, quality=90))
        assert g.shape == shape + (3,)
        np.testing.assert_array_equal(g[..., 0], g[..., 1])
        im3 = np.stack([im2] * 3, axis=-1)
        for sub in (False, True):
            d = decode_jpeg(encode_jpeg(im3, quality=90, subsample=sub))
            assert d.shape == shape + (3,)


def test_restart_markers_bit_exact():
    """DRI/RSTn must not change a single pixel vs the same stream
    without restarts (predictor resets + byte-aligned markers)."""
    img = _smooth(48, 72, seed=7)
    for sub in (True, False):
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        for ri in (1, 2, 5):
            enc = encode_jpeg(img, quality=85, subsample=sub,
                              restart_interval=ri)
            assert b"\xff\xdd" in enc          # DRI emitted
            np.testing.assert_array_equal(decode_jpeg(enc), base)


def test_huffman_table_validity():
    """Annex K.2 construction: canonical, <=16 bits, decodable, and no
    symbol maps to the all-ones max-length code (reserved)."""
    rng = np.random.default_rng(2)
    freq = {int(s): int(f) for s, f in
            zip(rng.choice(256, 60, replace=False),
                rng.integers(1, 10_000, 60))}
    bits, vals = _build_huffman(freq)
    assert sum(bits) == len(vals) == len(freq)
    assert len(bits) == 16
    codes = _codes_from_table(bits, vals)
    assert set(codes) == set(freq)
    # prefix-free: no code is a prefix of another
    cs = sorted((ln, c) for c, ln in codes.values())
    for i, (l1, c1) in enumerate(cs):
        for l2, c2 in cs[i + 1:]:
            assert not (l2 >= l1 and (c2 >> (l2 - l1)) == c1)
    # reserved all-ones code unused at every length
    for c, ln in codes.values():
        assert not (ln == 16 and c == (1 << 16) - 1)
    # degenerate: single-symbol alphabet still yields a 1-bit code
    bits1, vals1 = _build_huffman({42: 100})
    assert _codes_from_table(bits1, vals1)[42][1] >= 1


def test_spec_fences():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    import struct
    prog = b"\xff\xd8\xff\xc2" + struct.pack(">H", 8) \
        + b"\x08\x00\x08\x00\x08\x01"
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)


def test_media_pipeline_decodes_jpeg(ray_session):
    """The synthetic media lake now carries real JPEG payloads; the
    actor-pool decode stage must produce image rows for them."""
    from lucene_ray.pipelines.multimodal import media_features

    out = media_features("/root/testdata/sf0.001").to_pandas()
    jp = out[out["kind"] == "image/jpeg"]
    pn = out[out["kind"] == "image/png"]
    assert len(jp) > 0 and len(pn) > 0
    assert jp["width"].notna().all() and jp["mean_intensity"].between(
        0, 1).all()
    assert len(out) == 200                     # row count unchanged


def test_422_sampling_and_decode_robustness():
    """4:2:2 (horizontal-only chroma) exercises the decoder's generic
    sampling-grid path; truncated/garbled streams must raise cleanly
    (never hang) on a spread of cut points."""
    img = _smooth(30, 44, seed=11)
    enc = encode_jpeg(img, quality=85, subsample="422")
    dec = decode_jpeg(enc)
    rmse = np.sqrt(np.mean((dec.astype(float) - img.astype(float)) ** 2))
    assert dec.shape == img.shape and rmse < 10.0, rmse
    # 4:2:2 quality sits between 4:4:4 and 4:2:0 in bytes
    assert len(encode_jpeg(img, 85, subsample=False)) \
        >= len(enc) >= len(encode_jpeg(img, 85, subsample=True))
    full = encode_jpeg(img, quality=85)
    for cut in (3, 20, len(full) // 2, len(full) - 3):
        try:
            out = decode_jpeg(full[:cut])
            assert out.shape[2] == 3          # decoded-with-garbage ok
        except (ValueError, NotImplementedError, struct_error):
            pass                              # clean refusal ok
    rng = np.random.default_rng(5)
    for _ in range(20):                       # garbled tail never hangs
        bad = bytearray(full)
        for i in rng.integers(2, len(bad), 8):
            bad[i] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(bad))
        except (ValueError, NotImplementedError, KeyError,
                struct_error, IndexError):
            pass
