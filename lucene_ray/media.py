"""Pure-Python/numpy media codecs for the multimodal pipeline.

No PIL/ffmpeg in this environment, but the decode stage is REAL for the
formats below — every payload in the synthetic lake decodes through a
from-the-spec codec:

- **BMP** (24-bit uncompressed): struct headers + BGR rows, 4-byte row
  padding.
- **WAV** (PCM16 mono/stereo + G.711 mu-law/A-law): RIFF chunks;
  G.711 expands through the CCITT 256-entry tables.
- **PNG** (8-bit RGB/RGBA, grayscale and palette at depths 1/2/4/8
  incl. tRNS, non-interlaced): chunk parsing + stdlib zlib + per-row
  filter reconstruction (filters 0-4; None/Sub/Up vectorized,
  Average/Paeth scalar along x as the spec's left-dependency
  requires).
- **JPEG** (baseline SOF0, 4:4:4/4:2:2/4:2:0/grayscale, restart
  markers) via :mod:`lucene_ray.jpeg` — a from-the-spec pure-numpy
  codec; only progressive/arithmetic/12-bit stay behind
  ``NotImplementedError``.
- **GIF** (87a/89a, LZW, interlace, animation/disposal) via
  :mod:`lucene_ray.gif`.
- **AVI/MJPEG**: the real-world RIFF video container below, frames
  decoded by the JPEG codec, idx1-indexed frame seeks.

Inter-frame video codecs stay out of scope (an honest gap — H.26x
entropy + motion compensation has no stdlib path); AVI/MJPEG and the
bespoke MJB container cover the seekable-frame pipeline shape for
real. ``sniff`` routes by magic bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def sniff(payload: bytes) -> str:
    if payload[:2] == b"BM":
        return "image/bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio/wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "video/avi"
    if payload[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if payload[:4] == b"MJB1":
        return "video/mjb"
    return "application/octet-stream"


# ---------------------------------------------------------------------------
# BMP (24bpp, BI_RGB)

def encode_bmp(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)   # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=row_bytes * h, offset=off)
    img = raw.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


# ---------------------------------------------------------------------------
# WAV (PCM16 + G.711 mu-law / A-law)
#
# G.711 expansion per the public CCITT tables (the classic g711.c
# segment layout): mu-law bytes are bit-complemented sign/segment/
# mantissa with BIAS 0x84; A-law bytes are XOR 0x55 with segment-scaled
# mantissas. Decode is a 256-entry int16 lookup; encode picks the
# nearest table entry (exact nearest via searchsorted on the sorted
# table), so decode(encode(x)) is the canonical quantization.

def _g711_table(law: str) -> np.ndarray:
    codes = np.arange(256, dtype=np.int32)
    if law == "mulaw":
        u = ~codes & 0xFF
        sign = (u & 0x80) != 0                   # set → negative
        exp = (u >> 4) & 7
        mant = u & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        return np.where(sign, -mag, mag).astype(np.int16)
    a = codes ^ 0x55
    sign = (a & 0x80) != 0                       # set → POSITIVE (A-law)
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp > 0,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
                   (mant << 4) + 8)
    return np.where(sign, mag, -mag).astype(np.int16)


_G711_FMT = {6: "alaw", 7: "mulaw"}              # WAVE_FORMAT_{ALAW,MULAW}


def encode_wav(samples: np.ndarray, rate: int = 16000,
               law: str | None = None) -> bytes:
    """PCM16 WAV by default; ``law`` = 'mulaw'/'alaw' writes an 8-bit
    G.711 WAV (fmt tag 7/6), each sample mapped to the nearest
    expansion-table entry."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if law is None:
        fmt_tag, bits = 1, 16
        data = samples.astype("<i2").tobytes()
    else:
        fmt_tag = {"alaw": 6, "mulaw": 7}[law]
        bits = 8
        table = _g711_table(law)
        order = np.argsort(table, kind="stable")
        st = table[order].astype(np.int32)
        x = samples.astype(np.int32).reshape(-1)
        pos = np.clip(np.searchsorted(st, x), 1, 255)
        pick = np.where(np.abs(st[pos] - x) < np.abs(st[pos - 1] - x),
                        pos, pos - 1)
        data = order[pick].astype(np.uint8).tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * block,
                      block, bits)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    return out


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 samples [n] or [n, ch], rate). PCM16 natively; G.711
    mu-law/A-law expanded through the CCITT tables."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate, ch, bits, fmt_tag = None, None, None, None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH",
                                                               body, 0)
            if not ((fmt_tag == 1 and bits == 16)
                    or (fmt_tag in _G711_FMT and bits == 8)):
                raise NotImplementedError(
                    f"WAV fmt={fmt_tag} bits={bits} unsupported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if data is None or rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_tag in _G711_FMT:
        samples = _g711_table(_G711_FMT[fmt_tag])[
            np.frombuffer(data, dtype=np.uint8)]
    else:
        samples = np.frombuffer(data, dtype="<i2")
    if ch and ch > 1:
        samples = samples[: len(samples) // ch * ch].reshape(-1, ch)
    return samples, int(rate)


# ---------------------------------------------------------------------------
# PNG (8-bit RGB/RGBA, non-interlaced)

def encode_png(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert img.dtype == np.uint8 and c in (3, 4)
    ctype = 2 if c == 3 else 6

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)],
        axis=1).tobytes()                       # filter byte 0 per row
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _unfilter(kind: int, row: np.ndarray, prev: np.ndarray,
              bpp: int) -> np.ndarray:
    if kind == 0:                        # None
        return row
    if kind == 2:                        # Up
        return (row.astype(np.int16) + prev).astype(np.uint8)
    if kind == 1:                        # Sub: cumulative along x per lane
        out = row.reshape(-1, bpp).astype(np.int64)
        out = np.cumsum(out, axis=0) % 256
        return out.astype(np.uint8).reshape(-1)
    out = np.zeros_like(row)
    for i in range(len(row)):
        a = int(out[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        if kind == 3:                    # Average
            out[i] = (int(row[i]) + ((a + b) >> 1)) & 0xFF
        else:                            # Paeth
            cc = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - cc
            pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa_ <= pb and pa_ <= pcc) else \
                (b if pb <= pcc else cc)
            out[i] = (int(row[i]) + pred) & 0xFF
    return out


def _png_unpack_bits(row: np.ndarray, depth: int, w: int) -> np.ndarray:
    """Sub-byte sample depths (1/2/4) → one uint8 sample per pixel,
    MSB-first within each byte per the PNG spec."""
    if depth == 8:
        return row[:w]
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * depth
    mask = (1 << depth) - 1
    vals = ((row[:, None].astype(np.uint16) >> shifts) & mask)
    return vals.reshape(-1)[:w].astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit RGB/RGBA natively; grayscale (color 0, depths 1/2/4/8,
    replicated to RGB like decode_jpeg) and palette (color 3, depths
    1/2/4/8, PLTE + optional tRNS → RGBA) per the spec. Interlace and
    16-bit stay behind NotImplementedError."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    w = h = None
    ctype = depth = None
    plte = trns = None
    while pos + 8 <= len(payload):
        size = struct.unpack_from(">I", payload, pos)[0]
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if interlace or ctype not in (0, 2, 3, 6) \
                    or (ctype in (2, 6) and depth != 8) \
                    or (ctype in (0, 3) and depth not in (1, 2, 4, 8)):
                raise NotImplementedError(
                    f"PNG depth={depth} color={ctype} interlace={interlace}")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8,
                                 len(body) // 3 * 3).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size
    if w is None:
        raise ValueError("PNG missing IHDR")
    c = {0: 1, 2: 3, 3: 1, 6: 4}[ctype]
    row_bytes = (w * c * depth + 7) // 8
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) < h * (row_bytes + 1):
        raise ValueError("PNG pixel data short")
    rows = raw[: h * (row_bytes + 1)].reshape(h, row_bytes + 1)
    bpp = max(1, c * depth // 8)
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter(int(rows[y, 0]), rows[y, 1:].copy(), prev, bpp)
        out[y] = prev
    if ctype in (2, 6):
        return out.reshape(h, w * c)[:, : w * c].reshape(h, w, c)
    samples = np.stack([_png_unpack_bits(out[y], depth, w)
                        for y in range(h)])
    if ctype == 0:                               # grayscale → RGB
        scale = 255 // ((1 << depth) - 1)
        g = (samples * scale).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if plte is None:
        raise ValueError("palette PNG missing PLTE")
    if int(samples.max(initial=0)) >= len(plte):
        raise ValueError("palette index out of range")
    rgb = plte[samples]
    if trns is None:
        return rgb
    alpha = np.full(len(plte), 255, np.uint8)
    alpha[: len(trns)] = trns
    return np.concatenate([rgb, alpha[samples][:, :, None]], axis=2)


# ---------------------------------------------------------------------------
# Decode + features

def decode_any(payload: bytes) -> tuple[str, "np.ndarray | None",
                                        "tuple[np.ndarray, int] | None"]:
    """(kind, image HxWxC uint8 | None, (samples, rate) | None)."""
    kind = sniff(payload)
    if kind == "image/bmp":
        return kind, decode_bmp(payload), None
    if kind == "image/png":
        return kind, decode_png(payload), None
    if kind == "image/jpeg":
        from .jpeg import decode_jpeg
        return kind, decode_jpeg(payload), None
    if kind == "image/gif":
        from .gif import decode_gif_first
        return kind, decode_gif_first(payload), None
    if kind == "audio/wav":
        return kind, None, decode_wav(payload)
    raise NotImplementedError(f"no decoder for {kind}")


def thumbnail(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Block-mean grayscale thumbnail (the resize kernel), float32 [0,1]."""
    g = img[:, :, :3].astype(np.float32).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    out = np.empty((th, tw), dtype=np.float32)
    for i in range(th):
        band = g[ys[i]:max(ys[i + 1], ys[i] + 1)]
        csum = np.concatenate(
            [np.zeros((1,)), np.cumsum(band.mean(axis=0))])
        for j in range(tw):
            a, b = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = (csum[b] - csum[a]) / (b - a)
    return out / 255.0


# ---------------------------------------------------------------------------
# MJB — "motion BMP" video container (pure stdlib, REAL codec, seekable)
#
# Layout: b"MJB1" | u32 n_frames | f32 fps | n_frames x (u32 len | BMP).
# Length-prefixed frames make frame seeks O(frames scanned) WITHOUT
# decoding pixels — the property a frame-sampling stage at 100 TB needs
# (decode only the sampled frames, skip the rest byte-wise).

_MJB_MAGIC = b"MJB1"


def encode_mjb(frames: np.ndarray, fps: float = 8.0) -> bytes:
    """frames: (n, h, w, 3) uint8."""
    import struct

    parts = [_MJB_MAGIC,
             struct.pack("<If", len(frames), float(fps))]
    for fr in frames:
        b = encode_bmp(fr)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def mjb_info(payload: bytes) -> tuple[int, float]:
    """(n_frames, fps) from the header alone."""
    import struct

    if payload[:4] != _MJB_MAGIC:
        raise ValueError("not an MJB payload")
    n, fps = struct.unpack_from("<If", payload, 4)
    return int(n), float(fps)


def mjb_frame(payload: bytes, idx: int) -> np.ndarray:
    """Decode ONLY frame ``idx`` — earlier frames are skipped by their
    length prefixes, never decoded."""
    import struct

    n, _ = mjb_info(payload)
    if not 0 <= idx < n:
        raise IndexError(idx)
    off = 12
    for i in range(idx):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4 + ln
    (ln,) = struct.unpack_from("<I", payload, off)
    return decode_bmp(payload[off + 4: off + 4 + ln])


def decode_mjb(payload: bytes) -> tuple[np.ndarray, float]:
    """Full decode: ((n, h, w, 3) uint8, fps)."""
    import struct

    n, fps = mjb_info(payload)
    off = 12
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        frames.append(decode_bmp(payload[off + 4: off + 4 + ln]))
        off += 4 + ln
    return np.stack(frames) if frames else \
        np.empty((0, 0, 0, 3), np.uint8), fps


# ---------------------------------------------------------------------------
# AVI / MJPEG — a REAL video container (RIFF 'AVI ' per the public
# Microsoft RIFF-AVI layout) carrying baseline-JPEG frames our own
# :mod:`lucene_ray.jpeg` codec encodes/decodes. The mandatory 'idx1'
# index makes frame seeks O(1) after one header parse — like MJB, a
# sampled frame is located byte-wise and ONLY that frame's JPEG entropy
# stream is decoded.
#
# Writer layout: RIFF('AVI ') { LIST('hdrl'){ avih, LIST('strl'){strh
# 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST('movi'){ '00dc' chunks,
# even-padded }, 'idx1' }. idx1 offsets are relative to the 'movi'
# fourcc (the spec's preferred convention); the reader auto-detects the
# absolute-from-file-start convention some writers use.

def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def encode_avi_mjpeg(frames: np.ndarray, fps: float = 8.0,
                     quality: int = 90) -> bytes:
    """frames: (n, h, w, 3) uint8 → RIFF-AVI bytes with MJPG '00dc'
    chunks + idx1 index."""
    from .jpeg import encode_jpeg

    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    jpgs = [encode_jpeg(fr, quality=quality) for fr in frames]

    # rate/scale as a fraction: fps = rate / scale
    scale = 1000
    rate = int(round(fps * scale))
    usec = int(round(1e6 * scale / max(rate, 1)))

    avih = struct.pack("<14I", usec, 0, 0, 0x10, n, 0, 1, 0, w, h,
                       0, 0, 0, 0)                 # AVIF_HASINDEX
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIii", 0, 0, 0, 0, scale, rate, 0, n,
                          0, -1, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack(
        "<I", 4 + len(_riff_chunk(b"strh", strh))
        + len(_riff_chunk(b"strf", strf))) + b"strl" \
        + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    hdrl_body = b"hdrl" + _riff_chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body

    movi_parts = [b"movi"]
    idx_entries = []
    off = 4                                        # from the 'movi' fourcc
    for j in jpgs:
        chunk = _riff_chunk(b"00dc", j)
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off,
                                       len(j)))    # AVIIF_KEYFRAME
        movi_parts.append(chunk)
        off += len(chunk)
    movi_body = b"".join(movi_parts)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = _riff_chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _avi_parse(payload: bytes) -> dict:
    """One pass over the RIFF tree → {n, fps, w, h, movi_off, offsets:
    [(abs_off, size)]}. Raises ValueError on a malformed container."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    info: dict = {"fps": 0.0, "n": 0, "w": 0, "h": 0,
                  "movi_off": -1, "offsets": []}
    idx_raw = None

    def walk(pos: int, stop: int) -> None:
        nonlocal idx_raw
        while pos + 8 <= stop:
            tag = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            body_at = pos + 8
            if body_at + size > len(payload):
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                kind = payload[body_at:body_at + 4]
                if kind == b"movi":
                    info["movi_off"] = body_at     # at the 'movi' fourcc
                    info["movi_end"] = body_at + size
                    # defer chunk scan: idx1 usually supersedes it
                elif kind in (b"hdrl", b"strl"):
                    walk(body_at + 4, body_at + size)
            elif tag == b"avih":
                usec, n = struct.unpack_from("<I", payload, body_at)[0], \
                    struct.unpack_from("<I", payload, body_at + 16)[0]
                info["n"] = n
                info["w"], info["h"] = struct.unpack_from(
                    "<II", payload, body_at + 32)
                if usec:
                    info["fps"] = 1e6 / usec
            elif tag == b"strh" and payload[body_at:body_at + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", payload,
                                                 body_at + 20)
                if scale and rate:
                    info["fps"] = rate / scale
            elif tag == b"idx1":
                idx_raw = payload[body_at:body_at + size]
            pos = body_at + size + (size & 1)

    walk(12, end)
    if info["movi_off"] < 0:
        raise ValueError("AVI missing movi list")
    if idx_raw is not None and len(idx_raw) >= 16:
        first_off = struct.unpack_from("<I", idx_raw, 8)[0]
        # offset convention: relative to the 'movi' fourcc (preferred)
        # vs absolute from file start (seen in the wild); if neither
        # lands on a frame chunk id, drop to the movi scan below
        base = None
        for cand in (info["movi_off"], 0):
            ckid = payload[cand + first_off:cand + first_off + 4]
            if len(ckid) == 4 and ckid[2:4] in (b"dc", b"db"):
                base = cand
                break
        if base is not None:
            for e in range(0, len(idx_raw) - 15, 16):
                ckid, _flags, off, size = struct.unpack_from("<4sIII",
                                                             idx_raw, e)
                if ckid[2:4] in (b"dc", b"db"):
                    info["offsets"].append((base + off + 8, size))
    if not info["offsets"]:                        # no/unusable index: scan
        pos = info["movi_off"] + 4
        stop = min(len(payload), info.get("movi_end", len(payload)))
        while pos + 8 <= stop:
            ckid = payload[pos:pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            if ckid[2:4] in (b"dc", b"db"):
                info["offsets"].append((pos + 8, size))
            pos += 8 + size + (size & 1)
    if not info["n"]:
        info["n"] = len(info["offsets"])
    return info


def avi_info(payload: bytes) -> tuple[int, float]:
    """(n_frames, fps) — header/index parse only, no pixel decode."""
    info = _avi_parse(payload)
    return len(info["offsets"]), float(info["fps"] or 0.0)


def avi_frame(payload: bytes, idx: int) -> np.ndarray:
    """Decode ONLY frame ``idx`` — located via idx1 (O(1) once the
    index is parsed); other frames' entropy streams are never touched."""
    from .jpeg import decode_jpeg

    info = _avi_parse(payload)
    if not 0 <= idx < len(info["offsets"]):
        raise IndexError(idx)
    off, size = info["offsets"][idx]
    return decode_jpeg(payload[off:off + size])


def decode_avi(payload: bytes) -> tuple[np.ndarray, float]:
    """Full decode: ((n, h, w, 3) uint8, fps)."""
    from .jpeg import decode_jpeg

    info = _avi_parse(payload)
    frames = [decode_jpeg(payload[o:o + s]) for o, s in info["offsets"]]
    return (np.stack(frames) if frames
            else np.empty((0, 0, 0, 3), np.uint8)), float(info["fps"])


# ---------------------------------------------------------------------------
# Format-agnostic video dispatch — pipeline stages stay codec-blind.

VIDEO_KINDS = ("video/mjb", "video/avi")


def video_info(payload: bytes) -> tuple[int, float]:
    kind = sniff(payload)
    if kind == "video/mjb":
        return mjb_info(payload)
    if kind == "video/avi":
        return avi_info(payload)
    raise ValueError(f"not a video payload ({kind})")


def video_frame(payload: bytes, idx: int) -> np.ndarray:
    kind = sniff(payload)
    if kind == "video/mjb":
        return mjb_frame(payload, idx)
    if kind == "video/avi":
        return avi_frame(payload, idx)
    raise ValueError(f"not a video payload ({kind})")
