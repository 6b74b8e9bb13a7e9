"""Metadata-only media probing — the ffprobe role for a media lake:
parse container STRUCTURE (duration, streams, codecs, sample rates)
without decoding any codec payload.  Complements the real codecs in
``jpeg.py``/``gif.py``/``media.py``: at 100 TB most pipeline stages
need only the metadata row (routing, stratified sampling, quota
bookkeeping), so probing must not pay decode costs.

Formats, all from their public specifications:

- **MP4 / ISO-BMFF** (ISO 14496-12): box tree walk; ``mvhd`` gives
  timescale + duration, each ``trak``'s ``hdlr`` gives the stream type
  (vide/soun) and ``stsd`` the codec fourcc; 64-bit largesize and
  version-1 mvhd handled.
- **FLAC**: "fLaC" marker + STREAMINFO metadata block (sample rate 20
  bits, channels 3, bits-per-sample 5, total samples 36).
- **MP3 / MPEG audio**: first valid frame header (version/layer bitmask
  tables), bitrate/sample-rate tables, Xing/Info VBR frame count when
  present; duration estimated from frame count or byte length.
- **Ogg**: page capture pattern "OggS", first packet's codec id
  ("\\x01vorbis" / "OpusHead"), granule-position of the LAST page for
  total samples.

Corrupt/truncated input raises ValueError (the repo's codec
contract); genuinely unsupported containers raise
NotImplementedError.  The Ray stage shape is the usual actor-pool
``map_batches`` over binary payload columns.
"""

from __future__ import annotations

import struct


def _need(b: bytes, n: int, what: str) -> None:
    if len(b) < n:
        raise ValueError(f"truncated {what}")


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF


def _walk_boxes(b: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        size, typ = struct.unpack_from(">I4s", b, off)
        hdr = 8
        if size == 1:
            _need(b, off + 16, "mp4 largesize box")
            size = struct.unpack_from(">Q", b, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError("mp4 box overruns container")
        yield typ.decode("latin1"), off + hdr, off + size
        off += size


def probe_mp4(b: bytes) -> dict:
    _need(b, 8, "mp4")
    boxes = list(_walk_boxes(b, 0, len(b)))
    if not any(t == "ftyp" for t, _s, _e in boxes):
        raise ValueError("not an mp4: no ftyp box")
    out: dict = {"format": "mp4", "streams": []}
    for t, s, e in boxes:
        if t == "ftyp":
            out["brand"] = b[s:s + 4].decode("latin1")
        if t != "moov":
            continue
        for t2, s2, e2 in _walk_boxes(b, s, e):
            if t2 == "mvhd":
                ver = b[s2]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", b, s2 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", b, s2 + 12)
                out["timescale"] = ts
                out["duration_s"] = dur / ts if ts else None
            elif t2 == "trak":
                stream: dict = {}
                for t3, s3, e3 in _walk_boxes(b, s2, e2):
                    if t3 != "mdia":
                        continue
                    for t4, s4, e4 in _walk_boxes(b, s3, e3):
                        if t4 == "hdlr":
                            stream["type"] = b[s4 + 8:s4 + 12] \
                                .decode("latin1")
                        elif t4 == "minf":
                            for t5, s5, e5 in _walk_boxes(b, s4, e4):
                                if t5 != "stbl":
                                    continue
                                for t6, s6, _e6 in _walk_boxes(
                                        b, s5, e5):
                                    if t6 == "stsd":
                                        stream["codec"] = \
                                            b[s6 + 12:s6 + 16] \
                                            .decode("latin1")
                if stream:
                    out["streams"].append(stream)
    if "timescale" not in out:
        raise ValueError("mp4 without moov/mvhd")
    return out


# ---------------------------------------------------------------------------
# FLAC


def probe_flac(b: bytes) -> dict:
    _need(b, 4 + 4 + 34, "flac")
    if b[:4] != b"fLaC":
        raise ValueError("not flac")
    # first metadata block must be STREAMINFO (type 0)
    hdr = b[4]
    if hdr & 0x7F != 0:
        raise ValueError("flac: first block is not STREAMINFO")
    blen = int.from_bytes(b[5:8], "big")
    if blen < 34:
        raise ValueError("flac STREAMINFO too short")
    si = b[8:8 + 34]
    bits = int.from_bytes(si[10:18], "big")
    sample_rate = bits >> 44
    channels = ((bits >> 41) & 0x7) + 1
    bps = ((bits >> 36) & 0x1F) + 1
    total = bits & ((1 << 36) - 1)
    if sample_rate == 0:
        raise ValueError("flac: zero sample rate")
    return {"format": "flac", "sample_rate": sample_rate,
            "channels": channels, "bits_per_sample": bps,
            "total_samples": total,
            "duration_s": total / sample_rate if total else None}


# ---------------------------------------------------------------------------
# MP3 / MPEG audio

_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                     224, 256, 320, 0]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                     128, 144, 160, 0]
_MP3_RATES = {3: [44100, 48000, 32000],      # MPEG1
              2: [22050, 24000, 16000],      # MPEG2
              0: [11025, 12000, 8000]}       # MPEG2.5


def probe_mp3(b: bytes) -> dict:
    off = 0
    if b[:3] == b"ID3":
        _need(b, 10, "id3")
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        off = 10 + size
    _need(b, off + 4, "mp3 frame header")
    for i in range(off, min(len(b) - 3, off + 4096)):
        h = struct.unpack_from(">I", b, i)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            continue
        ver = (h >> 19) & 3
        layer = (h >> 17) & 3
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if ver == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            continue                        # free/bad — keep scanning
        sample_rate = _MP3_RATES[ver][sr_idx]
        table = _MP3_BITRATE_V1L3 if ver == 3 else _MP3_BITRATE_V2L3
        bitrate = table[br_idx] * 1000
        ch_mode = (h >> 6) & 3
        out = {"format": "mp3",
               "mpeg_version": {3: 1, 2: 2, 0: 2.5}[ver],
               "sample_rate": sample_rate,
               "bitrate": bitrate,
               "channels": 1 if ch_mode == 3 else 2}
        # Xing/Info VBR header gives the exact frame count; a
        # CRC-protected frame (protection bit 0) carries a 16-bit CRC
        # between header and side info
        side = (32 if ch_mode != 3 else 17) if ver == 3 \
            else (17 if ch_mode != 3 else 9)
        crc = 2 if ((h >> 16) & 1) == 0 else 0
        xoff = i + 4 + crc + side
        if b[xoff:xoff + 4] in (b"Xing", b"Info") \
                and len(b) >= xoff + 12:
            flags = struct.unpack_from(">I", b, xoff + 4)[0]
            if flags & 1:
                frames = struct.unpack_from(">I", b, xoff + 8)[0]
                spf = 1152 if ver == 3 else 576
                out["frames"] = frames
                out["duration_s"] = frames * spf / sample_rate
        if "duration_s" not in out and bitrate:
            out["duration_s"] = (len(b) - i) * 8 / bitrate
        return out
    raise ValueError("no mpeg audio frame found")


# ---------------------------------------------------------------------------
# Ogg


def probe_ogg(b: bytes) -> dict:
    _need(b, 28, "ogg")
    if b[:4] != b"OggS":
        raise ValueError("not ogg")
    nseg = b[26]
    _need(b, 27 + nseg, "ogg segment table")
    body = 27 + nseg
    first = b[body:body + 16]
    if first.startswith(b"\x01vorbis"):
        codec = "vorbis"
        _need(b, body + 16, "vorbis id")
        channels = b[body + 11]
        rate = struct.unpack_from("<I", b, body + 12)[0]
    elif first.startswith(b"OpusHead"):
        codec = "opus"
        channels = b[body + 9]
        rate = 48000                        # opus output rate
    else:
        raise NotImplementedError("ogg codec not recognized")
    # walk the page structure (never string-match into payload bytes:
    # 'OggS' can occur inside packets) and keep the last granule
    gran = 0
    off = 0
    while off + 27 <= len(b):
        if b[off:off + 4] != b"OggS":
            raise ValueError("ogg page desync")
        g = struct.unpack_from("<q", b, off + 6)[0]
        if g > 0:
            gran = g
        ns = b[off + 26]
        _need(b, off + 27 + ns, "ogg segment table")
        off = off + 27 + ns + sum(b[off + 27:off + 27 + ns])
    if off != len(b):
        raise ValueError("truncated ogg page")
    out = {"format": "ogg", "codec": codec, "channels": channels,
           "sample_rate": rate}
    if gran > 0 and rate:
        out["duration_s"] = gran / rate
    return out


_PROBES = [
    (lambda b: len(b) >= 12 and b[4:8] == b"ftyp", probe_mp4),
    (lambda b: b[:4] == b"fLaC", probe_flac),
    (lambda b: b[:4] == b"OggS", probe_ogg),
    (lambda b: b[:3] == b"ID3" or (len(b) > 1 and b[0] == 0xFF
                                   and (b[1] & 0xE0) == 0xE0),
     probe_mp3),
]


def media_probe(payload: bytes) -> dict:
    """Dispatch on magic bytes; ValueError for corrupt payloads,
    NotImplementedError for unrecognized containers."""
    if not payload:
        raise ValueError("empty payload")
    for sniff, fn in _PROBES:
        try:
            if sniff(payload):
                return fn(payload)
        except (IndexError, struct.error) as ex:
            raise ValueError(f"corrupt media payload: {ex}") from ex
    raise NotImplementedError("unrecognized media container")
