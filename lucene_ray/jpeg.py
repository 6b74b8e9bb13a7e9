"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the multimodal pipeline's documented decode gap: this container
has no PIL/turbojpeg, so baseline sequential JPEG is implemented from
the public spec — real interchange-format files (SOI/DQT/DHT/SOF0/SOS,
8-bit, 4:4:4 or 4:2:0 or grayscale, optional restart markers) decode to
RGB numpy arrays, and the encoder emits spec-compliant files for
round-trip testing and thumbnail sinks.

Scope (honest): BASELINE DCT process only — SOF0. Progressive (SOF2),
arithmetic coding, 12-bit precision and hierarchical modes raise
``NotImplementedError``.

Implementation notes:
- DCT/IDCT are the exact separable DCT-II/III matrices applied to ALL
  blocks of a component at once (one einsum per component — the numpy
  hot path); only entropy coding walks bits in Python (intrinsically
  serial; this is the documented pure-Python trade, ~the cost the
  reference pays in C).
- Huffman tables are NOT the Annex K defaults: the encoder builds
  optimized canonical tables per image with the spec's own procedure
  (Annex K.2 code-size counting with the reserved pseudo-symbol, then
  Adjust_BITS to the 16-bit limit) and emits them in DHT — any decoder
  reads DHT generically, as ours does.
- Quality follows the IJG curve: scale = 5000/q (q<50) else 200−2q,
  table = clip((base·scale+50)/100, 1, 255) over the Annex K example
  luminance/chrominance matrices.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 example quantization matrices (zigzag-free, row-major)
_QL = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
_QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

# zigzag scan order (spec Figure 5): _ZZ[i] = row-major index of the
# i-th zigzag coefficient
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# DCT-II orthonormal matrix: D[k, n] = c(k)·cos((2n+1)kπ/16)
_D = np.array([[(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((_QL * s + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * s + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0,
                   255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to 8-multiples by edge replication, return (n,8,8) blocks in
    raster order plus blocks-per-row/col."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    pad = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(
        bh * bw, 8, 8)
    return blocks, bh, bw


def _deblockify(blocks: np.ndarray, bh: int, bw: int, h: int, w: int
                ) -> np.ndarray:
    plane = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
        bh * 8, bw * 8)
    return plane[:h, :w]


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All-blocks DCT + quantize → int32 (n, 64) in ZIGZAG order."""
    coef = np.einsum("ij,njk,lk->nil", _D, blocks - 128.0, _D)
    qz = np.round(coef / qtab).astype(np.int32)
    return qz.reshape(-1, 64)[:, _ZZ]


def _dequant_idct(zz: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(n, 64) zigzag ints → (n, 8, 8) float pixel blocks (+128)."""
    coef = np.zeros((len(zz), 64), dtype=np.float64)
    coef[:, _ZZ] = zz * qtab.reshape(64)[_ZZ]
    coef = coef.reshape(-1, 8, 8)
    return np.einsum("ji,njk,kl->nil", _D, coef, _D) + 128.0


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)       # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        """Pad to a byte boundary with 1-bits (spec B.2.1)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def marker(self, m: int) -> None:
        self.pad()
        self.buf += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.buf)


def _build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Annex K.2: optimal code sizes with the reserved pseudo-symbol
    (index 256, freq 1 — guarantees no real symbol gets all 1-bits),
    then Adjust_BITS to the 16-bit limit. Returns (bits[1..16] counts,
    symbols in code order)."""
    FREQ = np.zeros(257, dtype=np.int64)
    for s, f in freq.items():
        FREQ[s] = f
    FREQ[256] = 1
    CODESIZE = np.zeros(257, dtype=np.int64)
    OTHERS = np.full(257, -1, dtype=np.int64)
    while True:
        idx = np.flatnonzero(FREQ > 0)
        if len(idx) <= 1:
            if len(idx) == 1:
                CODESIZE[idx[0]] = max(CODESIZE[idx[0]], 1)
            break
        v1 = idx[np.lexsort((-idx, FREQ[idx]))[0]]
        rest = idx[idx != v1]
        v2 = rest[np.lexsort((-rest, FREQ[rest]))[0]]
        FREQ[v1] += FREQ[v2]
        FREQ[v2] = 0
        while True:
            CODESIZE[v1] += 1
            if OTHERS[v1] == -1:
                break
            v1 = OTHERS[v1]
        OTHERS[v1] = v2
        while True:
            CODESIZE[v2] += 1
            if OTHERS[v2] == -1:
                break
            v2 = OTHERS[v2]
    BITS = np.zeros(33, dtype=np.int64)
    for s in range(257):
        if CODESIZE[s]:
            BITS[min(32, CODESIZE[s])] += 1
    # Adjust_BITS (spec Figure K.3)
    i = 32
    while True:
        if BITS[i] > 0:
            j = i - 1
            while True:
                j -= 1
                if BITS[j] > 0:
                    break
            BITS[i] -= 2
            BITS[i - 1] += 1
            BITS[j + 1] += 2
            BITS[j] -= 1
            continue
        i -= 1
        if i == 16:
            break
    while BITS[i] == 0:
        i -= 1
    BITS[i] -= 1                            # drop the pseudo-symbol
    # symbols sorted by (code size, symbol value), pseudo-symbol out
    order = sorted((int(CODESIZE[s]), s) for s in range(256)
                   if CODESIZE[s])
    return BITS[1:17].tolist(), [s for _, s in order]


def _codes_from_table(bits: list[int], vals: list[int]
                      ) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (spec Annex C): symbol → (code, len)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _component_symbols(zz: np.ndarray, reset_every: int = 0
                       ) -> tuple[list, dict, dict]:
    """Per-block (DC symbol stream, AC symbol stream) + frequency maps.
    Returns the run-length-coded symbol sequence for one component;
    ``reset_every`` restarts the DC predictor at block multiples (the
    RSTn boundary, in this component's MCU-ordered block stream)."""
    dc = zz[:, 0].astype(np.int64)
    diff = np.diff(np.concatenate([[0], dc]))
    if reset_every:
        resets = np.arange(0, len(dc), reset_every)
        diff[resets] = dc[resets]
    seq = []
    dcf: dict[int, int] = {}
    acf: dict[int, int] = {}
    for bi in range(len(zz)):
        dv = int(diff[bi])
        s = abs(dv).bit_length()       # the JPEG magnitude category
        seq.append(("dc", s, dv))
        dcf[s] = dcf.get(s, 0) + 1
        row = zz[bi]
        nz = np.flatnonzero(row[1:]) + 1
        prev = 0
        for pos in nz:
            run = int(pos - prev - 1)
            while run > 15:
                seq.append(("ac", 0xF0, 0))
                acf[0xF0] = acf.get(0xF0, 0) + 1
                run -= 16
            v = int(row[pos])
            s = abs(v).bit_length()
            sym = (run << 4) | s
            seq.append(("ac", sym, v))
            acf[sym] = acf.get(sym, 0) + 1
            prev = int(pos)
        if len(nz) == 0 or nz[-1] != 63:
            seq.append(("ac", 0x00, 0))     # EOB
            acf[0x00] = acf.get(0x00, 0) + 1
        seq.append(("end", 0, 0))
    return seq, dcf, acf


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = True,
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder: 8-bit grayscale (h, w) or RGB (h, w, 3);
    ``subsample`` picks 4:2:0 (2×2 Y per MCU) vs 4:4:4;
    ``restart_interval`` > 0 emits DRI + RSTn every N MCUs (predictor
    reset + byte-aligned marker, spec B.2.4.4/E.1.4)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql, qc = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qmap = [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if subsample == "422":
            # horizontal-only chroma subsampling (Y 2x1 per MCU)
            pw = -(-w // 2) * 2
            def ds(p):
                p = np.pad(p, ((0, 0), (0, pw - w)), mode="edge")
                return 0.5 * (p[:, 0::2] + p[:, 1::2])
            planes = [y, ds(cb), ds(cr)]
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsample:
            # 4:2:0 — pad to even then 2x2 box average
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def ds(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2]
                               + p[1::2, 0::2] + p[1::2, 1::2])
            planes = [y, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qmap = [0, 1, 1]

    # MCU grid first: every component plane pads to ITS share of the
    # grid (mcux·8·sh wide) so interleaved block indexing lines up
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comps = []
    for p, qi, (sh, sv) in zip(planes, qmap, samp):
        th, tw = mcuy * 8 * sv, mcux * 8 * sh
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        blocks, bh, bw = _blockify(p)
        comps.append((_fdct_quant(blocks, ql if qi == 0 else qc), bh, bw))
    streams = []
    dcf_all = [{}, {}]
    acf_all = [{}, {}]
    for ci, ((zz, bh, bw), (sh, sv)) in enumerate(zip(comps, samp)):
        # DC prediction runs in MCU-INTERLEAVED scan order, not raster
        # block order (they only coincide at 1x1 sampling) — reorder the
        # blocks first so _component_symbols' sequential diff matches
        # the decoder's predictor
        order = np.array([(my * sv + dy) * bw + mx * sh + dx
                          for my in range(mcuy) for mx in range(mcux)
                          for dy in range(sv) for dx in range(sh)],
                         dtype=np.int64)
        seq, dcf, acf = _component_symbols(
            zz[order], reset_every=restart_interval * sh * sv)
        # split seq into per-block chunks (already in emission order)
        chunks, cur = [], []
        for item in seq:
            if item[0] == "end":
                chunks.append(cur)
                cur = []
            else:
                cur.append(item)
        streams.append((chunks, bh, bw, sh, sv))
        t = 0 if ci == 0 else 1
        for k, v in dcf.items():
            dcf_all[t][k] = dcf_all[t].get(k, 0) + v
        for k, v in acf.items():
            acf_all[t][k] = acf_all[t].get(k, 0) + v

    ntab = 1 if gray else 2
    dct_tabs = [_build_huffman(dcf_all[t]) for t in range(ntab)]
    act_tabs = [_build_huffman(acf_all[t]) for t in range(ntab)]
    dcc = [_codes_from_table(*t) for t in dct_tabs]
    acc = [_codes_from_table(*t) for t in act_tabs]

    bwr = _BitWriter()
    ptr = [0] * len(streams)               # per-component chunk cursor
    mcu_i = 0
    rst_i = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                bwr.marker(0xD0 + (rst_i % 8))
                rst_i += 1
            mcu_i += 1
            for ci, (chunks, _bh, _bw, sh, sv) in enumerate(streams):
                t = 0 if ci == 0 else 1
                for _ in range(sh * sv):
                    for kind, sym, v in chunks[ptr[ci]]:
                        tab = dcc[t] if kind == "dc" else acc[t]
                        code, ln = tab[sym]
                        bwr.write(code, ln)
                        s = sym & 0x0F
                        if s:
                            bwr.write(v if v > 0
                                      else v + (1 << s) - 1, s)
                    ptr[ci] += 1
    entropy = bwr.flush()

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for qi, qt in enumerate([ql] if gray else [ql, qc]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, qi) \
            + bytes(int(x) for x in qt.reshape(64)[_ZZ])
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, qmap[ci])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for t in range(ntab):
        for cls, (bits, vals) in ((0, dct_tabs[t]), (1, act_tabs[t])):
            body = bytes([(cls << 4) | t]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += struct.pack(">BB", ci + 1, (t << 4) | t)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy + b"\xff\xd9"                       # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0
                if nxt == 0x00:
                    self.pos += 1            # stuffed byte
                else:
                    # marker: rewind, feed zero bits (caller handles RST)
                    self.pos -= 1
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def align_to_marker(self) -> None:
        """Drop buffered bits and position after the next RST marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and \
                    0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _HuffTable:
    """DHT → canonical decode table: bit-serial walk down the code
    lengths, each length checked against its canonical [first, last)
    code range (spec F.2.2.3 DECODE procedure)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.by_len: list[list] = [[] for _ in range(17)]
        for length in range(1, 17):
            first = code
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            self.by_len[length] = [first, code]    # [first, past-last]
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            rng = self.by_len[length]
            if rng and rng[0] <= code < rng[1]:
                return self.lookup[(length, code)]
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline decoder → uint8 (h, w, 3) RGB (grayscale replicated).
    Supports SOF0, 8-bit, 1 or 3 components with 4:4:4 / 4:2:0 / 4:2:2
    sampling, DRI/RSTn restarts.

    Exception contract: corrupt/truncated/malformed input raises
    ``ValueError`` (whatever the internal failure mode); genuinely
    unsupported modes (progressive/arithmetic/12-bit) raise
    ``NotImplementedError`` — callers like MediaDecoder's degradation
    mode can rely on exactly these two."""
    try:
        return _decode_jpeg(payload)
    except (ValueError, NotImplementedError):
        raise
    except Exception as ex:
        raise ValueError(f"corrupt JPEG ({type(ex).__name__}: {ex})") \
            from ex


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps = None
    h = w = 0
    restart = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG (dangling 0xFF)")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2: pos + ln]
        pos += ln
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64, dtype=np.int32)
                t[_ZZ] = np.frombuffer(body[i + 1: i + 65], np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                huff[(cls, tid)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0:                     # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            comps = []
            for ci in range(nc):
                cid, sf, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X} "
                "(progressive/arithmetic/hierarchical)")
        elif marker == 0xDD:                     # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:                     # SOS
            if comps is None:
                raise ValueError("SOS before SOF0 (no frame header)")
            if any(c["h"] < 1 or c["v"] < 1 for c in comps):
                raise ValueError("zero sampling factor in SOF0")
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tabs >> 4, tabs & 0x0F
            br = _BitReader(payload[pos:])
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]
                c["bh"] = mcuy * c["v"]
                c["zz"] = np.zeros((c["bw"] * c["bh"], 64),
                                   dtype=np.int32)
                c["pred"] = 0
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and mcu and mcu % restart == 0:
                        br.align_to_marker()
                        for c in comps:
                            c["pred"] = 0
                    for c in comps:
                        for dy in range(c["v"]):
                            for dx in range(c["h"]):
                                bi = (my * c["v"] + dy) * c["bw"] \
                                    + mx * c["h"] + dx
                                blk = c["zz"][bi]
                                s = huff[(0, c["td"])].decode(br)
                                diff = _extend(br.read(s), s) if s else 0
                                c["pred"] += diff
                                blk[0] = c["pred"]
                                k = 1
                                while k < 64:
                                    rs = huff[(1, c["ta"])].decode(br)
                                    r, s = rs >> 4, rs & 0x0F
                                    if s == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break          # EOB
                                    k += r
                                    if k > 63:
                                        raise ValueError("AC overflow")
                                    blk[k] = _extend(br.read(s), s)
                                    k += 1
                    mcu += 1
            planes = []
            for c in comps:
                px = _dequant_idct(c["zz"], qtabs[c["tq"]])
                plane = _deblockify(px, c["bh"], c["bw"],
                                    c["bh"] * 8, c["bw"] * 8)
                # upsample to full MCU grid then crop
                ry, rx = vmax // c["v"], hmax // c["h"]
                if ry > 1 or rx > 1:
                    plane = np.repeat(np.repeat(plane, ry, axis=0),
                                      rx, axis=1)
                planes.append(plane[:h, :w])
            if len(planes) == 1:
                g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
                return np.stack([g, g, g], axis=-1)
            return _ycbcr_to_rgb(*planes)
    raise ValueError("no scan data (missing SOS)")
