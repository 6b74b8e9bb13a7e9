"""From-the-spec GIF87a/89a codec (pure stdlib + numpy).

GIF is the third real-world image format in the media lake (after the
baseline JPEG in :mod:`lucene_ray.jpeg` and PNG in
:mod:`lucene_ray.media`) and doubles as a second REAL animation format
beside AVI/MJPEG. Implements the public GIF89a specification:

- LZW with variable code width (3..12 bits), CLEAR/EOI codes, table
  reset at 4096 entries — both directions.
- Logical screen + global/local color tables, interlaced row order
  (8/8, 8/4 offset 4, 4/2 offset 2, 2/1 offset 1) on decode.
- Graphic Control Extension: per-frame delay, transparency index,
  disposal methods 0/1 (leave), 2 (restore to background),
  3 (restore to previous) — frames are composited onto the logical
  screen so ``decode_gif`` returns full RGB frames.
- NETSCAPE2.0 looping application extension on encode.

Encoder writes one global palette; ``quantize_rgb`` maps arbitrary RGB
to the 6x6x6 cube (216 colors) vectorized, so the synthetic media lake
can carry real GIF payloads without a quantization library.

Exception contract (same as lucene_ray.jpeg): corrupt/truncated input
raises ``ValueError``; genuinely unsupported shapes raise
``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW

def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for byte in indices:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:                                    # table full → reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # spec requires EOI but truncated streams exist; what we
                # decoded so far is the honest result
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):                 # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    parts = []
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00")
    return b"".join(parts)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block body")
        parts.append(payload[pos:pos + n])
        pos += n


# ---------------------------------------------------------------------------
# Encode

def quantize_rgb(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h,w,3) uint8 → (indices (h,w) uint8, palette (216,3) uint8) on
    the 6x6x6 color cube — fully vectorized."""
    lv = (img.astype(np.uint16) * 6 // 256).astype(np.uint8)  # 0..5
    idx = lv[..., 0] * 36 + lv[..., 1] * 6 + lv[..., 2]
    grid = np.arange(6, dtype=np.uint16) * 255 // 5
    palette = np.stack(np.meshgrid(grid, grid, grid, indexing="ij"),
                       axis=-1).reshape(216, 3).astype(np.uint8)
    return idx, palette


def encode_gif(frames: np.ndarray, palette: np.ndarray,
               fps: float = 8.0, loop: int = 0) -> bytes:
    """frames: (n,h,w) uint8 palette indices; palette: (k,3) uint8,
    k ≤ 256. One global color table; GIF89a with a NETSCAPE loop
    extension and per-frame delay when n > 1."""
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    k = len(palette)
    if k > 256:
        raise ValueError("palette > 256 colors")
    # color table size: power of two ≥ max(k, 2)
    ct_bits = max(1, int(np.ceil(np.log2(max(k, 2)))))
    ct_n = 1 << ct_bits
    if int(frames.max(initial=0)) >= k:
        raise ValueError("frame index outside palette")
    pal = np.zeros((ct_n, 3), dtype=np.uint8)
    pal[:k] = palette
    out = [b"GIF89a",
           struct.pack("<HHBBB", w, h,
                       0x80 | ((ct_bits - 1) & 7), 0, 0),
           pal.tobytes()]
    delay = max(1, int(round(100.0 / fps)))      # GCE units: 1/100 s
    if n > 1:
        out.append(b"\x21\xff\x0bNETSCAPE2.0"
                   + b"\x03\x01" + struct.pack("<H", loop) + b"\x00")
    min_code = max(2, ct_bits)
    for fr in frames:
        out.append(b"\x21\xf9\x04" + bytes([0])  # disposal 0, no transp
                   + struct.pack("<H", delay) + b"\x00\x00")
        out.append(b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
                   + bytes([0]))                 # no local table/interlace
        out.append(bytes([min_code]))
        out.append(_sub_blocks(_lzw_encode(min_code,
                                           fr.astype(np.uint8).tobytes())))
    out.append(b"\x3b")
    return b"".join(out)


def encode_gif_rgb(img_or_frames: np.ndarray, fps: float = 8.0) -> bytes:
    """Convenience: RGB (h,w,3) or (n,h,w,3) → 6x6x6-quantized GIF."""
    arr = img_or_frames
    if arr.ndim == 3:
        arr = arr[None]
    idx, pal = quantize_rgb(arr)                 # quantize is shape-blind
    return encode_gif(idx, pal, fps=fps)


# ---------------------------------------------------------------------------
# Decode

def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate([np.arange(off, h, step)
                            for off, step in _INTERLACE_PASSES])
    out = np.empty_like(rows)
    out[order] = rows
    return out


def gif_info(payload: bytes) -> tuple[int, float]:
    """(n_frames, fps) by walking block lengths only — LZW data is
    skipped byte-wise, never decompressed."""
    n, delays, _ = _gif_walk(payload, decode_pixels=False)
    mean_delay = (sum(delays) / len(delays)) if delays else 0.0
    fps = 100.0 / mean_delay if mean_delay > 0 else 0.0
    return n, fps


def decode_gif(payload: bytes) -> tuple[np.ndarray, float]:
    """Full decode → ((n, h, w, 3) uint8 composited frames, fps)."""
    n, delays, frames = _gif_walk(payload, decode_pixels=True)
    mean_delay = (sum(delays) / len(delays)) if delays else 0.0
    fps = 100.0 / mean_delay if mean_delay > 0 else 0.0
    return (np.stack(frames) if frames
            else np.empty((0, 0, 0, 3), np.uint8)), fps


def decode_gif_first(payload: bytes) -> np.ndarray:
    """First composited frame only (the still-image view of a GIF)."""
    frames, _ = decode_gif(payload[:_first_frame_end(payload)])
    if not len(frames):
        raise ValueError("GIF has no image data")
    return frames[0]


def _first_frame_end(payload: bytes) -> int:
    """Byte offset just past the first image descriptor's data, so
    decode_gif_first never decompresses later frames."""
    pos, _gct, _ = _parse_header(payload)
    seen_image = False
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                            # trailer
            return pos + 1
        if b == 0x21:                            # extension
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            _, pos = _read_sub_blocks(payload, pos + 2)
        elif b == 0x2C:
            if seen_image:
                return pos
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            flags = payload[pos + 9]
            pos += 10
            if flags & 0x80:
                pos += 3 * (2 << (flags & 7))
            pos += 1                             # LZW min code size
            _, pos = _read_sub_blocks(payload, pos)
            seen_image = True
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    return len(payload)


def _parse_header(payload: bytes) -> tuple[int, "np.ndarray | None", tuple]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    return pos, gct, (w, h, bg)


def _gif_walk(payload: bytes, decode_pixels: bool):
    pos, gct, (sw, sh, bg) = _parse_header(payload)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    n_frames = 0
    # canvas state (composited RGB + "which pixels are background")
    if decode_pixels:
        bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
                  else np.zeros(3, np.uint8))
        canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    transparent: int | None = None
    disposal = 0
    delay = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:                            # trailer
            break
        if b == 0x21:                            # extension block
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos + 1]
            body, pos = _read_sub_blocks(payload, pos + 2)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                packed = body[0]
                disposal = (packed >> 2) & 7
                delay = struct.unpack_from("<H", body, 1)[0]
                transparent = body[3] if packed & 1 else None
        elif b == 0x2C:                          # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            ix, iy, iw, ih, flags = struct.unpack_from("<HHHHB",
                                                       payload, pos + 1)
            pos += 10
            lct = None
            if flags & 0x80:
                n = 2 << (flags & 7)
                if pos + 3 * n > len(payload):
                    raise ValueError("truncated GIF local color table")
                lct = np.frombuffer(payload, np.uint8, 3 * n,
                                    pos).reshape(n, 3)
                pos += 3 * n
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            min_code = payload[pos]
            data, pos = _read_sub_blocks(payload, pos + 1)
            n_frames += 1
            delays.append(delay)
            if not decode_pixels:
                disposal = 0
                transparent = None
                delay = 0
                continue
            pal = lct if lct is not None else gct
            if pal is None:
                raise ValueError("GIF image with no color table")
            idx = np.frombuffer(_lzw_decode(min_code, data), np.uint8)
            if len(idx) < iw * ih:
                raise ValueError("GIF frame pixel data short")
            idx = idx[: iw * ih].reshape(ih, iw)
            if flags & 0x40:
                idx = _deinterlace(idx)
            if ix + iw > sw or iy + ih > sh:
                raise ValueError("GIF frame outside logical screen")
            prev_region = canvas[iy:iy + ih, ix:ix + iw].copy() \
                if disposal == 3 else None
            safe = np.minimum(idx, len(pal) - 1)
            rgb = pal[safe]
            region = canvas[iy:iy + ih, ix:ix + iw]
            if transparent is not None:
                opaque = (idx != transparent) & (idx < len(pal))
                region[opaque] = rgb[opaque]
            else:
                region[idx < len(pal)] = rgb[idx < len(pal)]
            frames.append(canvas.copy())
            if disposal == 2:                    # restore to background
                canvas[iy:iy + ih, ix:ix + iw] = bg_rgb
            elif disposal == 3 and prev_region is not None:
                canvas[iy:iy + ih, ix:ix + iw] = prev_region
            disposal = 0
            transparent = None
            delay = 0
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    return n_frames, delays, frames
