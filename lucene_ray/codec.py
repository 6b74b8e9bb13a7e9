"""Block postings codec: delta+FOR docs, PFoR freqs, per-block impacts.

Semantic counterpart of the reference's Lucene103 postings format:

- 128-posting blocks (``codecs/lucene103/ForUtil.java:32`` BLOCK_SIZE=128),
  delta-encoded doc ids bit-packed to the block's max bit width
  (``ForDeltaUtil.java:67``), decoded with a prefix sum.
- Frequencies PFoR-encoded with at most 7 patched exceptions
  (``PForUtil.java:28,30`` MAX_EXCEPTIONS=7) and an all-equal-block
  optimization.
- Per-block competitive (freq, norm) impact frontier
  (``codecs/CompetitiveImpactAccumulator.java:27,65-76``,
  ``Lucene103PostingsWriter.java:236-296``): the Pareto set bounding the
  maximum achievable score of any doc in the block; ``first_doc/last_doc``
  block metadata plays the role of the skip list
  (``Lucene103PostingsWriter.java:388,491``).

We do not chase byte-identical files — only value-identical postings and
impact bounds (the reference's own tests assert values, not bytes:
``BasePostingsFormatTestCase.java:104``). Bit packing is LSB-first via
numpy packbits/unpackbits, vectorized per block.

On-disk layout is *flat*: one Arrow/Parquet row per (term, block), sorted by
``(term, first_doc)`` within a partition — Parquet row-group min/max stats on
``term`` replace the BlockTree trie index
(``blocktree/Lucene103BlockTreeTermsWriter.java:364``) for pruning, and a
per-partition sorted term array (memoized by the searcher actor) replaces the
in-RAM FST.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128          # ForUtil.java:32
MAX_EXCEPTIONS = 7        # PForUtil.java:30
_ALL_EQUAL = 0xFE         # marker byte: all values in block equal
_RAW = 0xFD               # marker byte: raw little-endian array (tail block)


def _bit_len(v: int) -> int:
    return int(v).bit_length()


def pack_bits(values: np.ndarray, bpv: int) -> bytes:
    """Pack uint64 values LSB-first at bpv bits per value."""
    if bpv == 0:
        return b""
    vals = values.astype(np.uint64)
    shifts = np.arange(bpv, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, bpv: int) -> np.ndarray:
    """Inverse of pack_bits → uint64 array of length n."""
    if bpv == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8),
                         bitorder="little")[: n * bpv]
    weights = (np.uint64(1) << np.arange(bpv, dtype=np.uint64))
    return bits.reshape(n, bpv).astype(np.uint64) @ weights


def encode_deltas(deltas: np.ndarray) -> bytes:
    """FOR-encode a block of doc-id deltas: [bpv u8][packed bits].

    All-equal blocks (dense runs) collapse to [0xFE][u64le value].
    """
    deltas = deltas.astype(np.uint64)
    if len(deltas) and np.all(deltas == deltas[0]):
        return bytes([_ALL_EQUAL]) + int(deltas[0]).to_bytes(8, "little")
    bpv = _bit_len(int(deltas.max(initial=0)))
    return bytes([bpv]) + pack_bits(deltas, bpv)


def decode_deltas(buf: bytes, n: int) -> np.ndarray:
    bpv = buf[0]
    if bpv == _ALL_EQUAL:
        v = int.from_bytes(buf[1:9], "little")
        return np.full(n, v, dtype=np.uint64)
    return unpack_bits(buf[1:], n, bpv)


def encode_pfor(values: np.ndarray) -> bytes:
    """PFoR-encode a block of positive ints (term freqs).

    Layout: [bpv u8][n_exc u8][packed base][n_exc × (idx u8 + value u32le)].
    Exception slots hold 0 in the base packing and are overwritten at decode
    (value-identical to the reference's patching, PForUtil.java:28).
    All-equal blocks collapse to [0xFE][u32le value].
    """
    vals = values.astype(np.uint64)
    n = len(vals)
    if n and np.all(vals == vals[0]):
        return bytes([_ALL_EQUAL]) + int(vals[0]).to_bytes(4, "little")
    order = np.argsort(vals, kind="stable")
    best_cost, best_k = None, 0
    sorted_vals = vals[order]
    for k in range(0, min(MAX_EXCEPTIONS, n - 1) + 1):
        base_max = int(sorted_vals[n - 1 - k])
        bpv = _bit_len(base_max)
        cost = n * bpv + k * 5 * 8
        if best_cost is None or cost < best_cost:
            best_cost, best_k = cost, k
    k = best_k
    exc_idx = order[n - k:] if k else np.empty(0, dtype=np.int64)
    base = vals.copy()
    base[exc_idx] = 0
    bpv = _bit_len(int(base.max(initial=0)))
    out = bytearray([bpv, k])
    out += pack_bits(base, bpv)
    for i in sorted(int(x) for x in exc_idx):
        out.append(i)
        out += int(vals[i]).to_bytes(4, "little")
    return bytes(out)


def decode_pfor(buf: bytes, n: int) -> np.ndarray:
    bpv = buf[0]
    if bpv == _ALL_EQUAL:
        v = int.from_bytes(buf[1:5], "little")
        return np.full(n, v, dtype=np.uint64)
    k = buf[1]
    nbytes = (n * bpv + 7) // 8
    vals = unpack_bits(buf[2:2 + nbytes], n, bpv)
    pos = 2 + nbytes
    for _ in range(k):
        idx = buf[pos]
        vals[idx] = int.from_bytes(buf[pos + 1:pos + 5], "little")
        pos += 5
    return vals


def impact_frontier(tfs: np.ndarray, norms: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Competitive (freq, norm) pairs of a block — the Pareto frontier kept
    by CompetitiveImpactAccumulator (CompetitiveImpactAccumulator.java:65-76):
    a pair survives iff no other pair has freq' >= freq and norm' <= norm.

    Returns (freqs int32 asc, norm bytes uint8 asc) — norm bytes order by
    length since byte4ToInt is strictly monotone.
    """
    if len(tfs) == 0:
        return np.empty(0, np.int32), np.empty(0, np.uint8)
    # unique pairs sorted by (freq, norm) via packed int64 keys (much
    # cheaper than np.unique(axis=0)); keep min norm per freq
    key = np.unique((tfs.astype(np.int64) << 8) | norms.astype(np.int64))
    freqs, nrm = key >> 8, key & 0xFF
    first = np.concatenate([[True], freqs[1:] != freqs[:-1]])
    freqs, nrm = freqs[first], nrm[first]
    # pair i survives iff its norm is strictly below every higher-freq norm
    rev_min = np.minimum.accumulate(nrm[::-1])[::-1]
    nxt_min = np.empty(len(nrm), dtype=np.int64)
    nxt_min[-1] = np.iinfo(np.int64).max
    if len(nrm) > 1:
        nxt_min[:-1] = rev_min[1:]
    keep = nrm < nxt_min
    return freqs[keep].astype(np.int32), nrm[keep].astype(np.uint8)


def _bitlen_vec(a: np.ndarray) -> np.ndarray:
    """Vectorized int bit_length for values < 2^53 (frexp exponent)."""
    _, e = np.frexp(a.astype(np.float64))
    return np.where(a == 0, 0, e).astype(np.int64)


def _batch_full_blocks(doc_ids: np.ndarray, tfs: np.ndarray
                       ) -> "tuple[list, list] | tuple[None, None]":
    """Vectorized encode of all full 128-blocks of one term at once —
    mirrors decode_blocks' batched layout: per-block deltas/sorted-tf
    matrices, bit widths and PFoR exception counts chosen vectorized,
    same-width groups packed in ONE pack_bits call and sliced back into
    per-block cells. Byte-identical to the per-block encoders (the k/bpv
    choices replicate encode_deltas/encode_pfor exactly)."""
    n = len(doc_ids)
    nfull = n // BLOCK_SIZE
    if nfull < 2:
        return None, None
    B = BLOCK_SIZE

    dm = doc_ids[:nfull * B].reshape(nfull, B).astype(np.int64)
    deltas = np.zeros((nfull, B), dtype=np.uint64)
    deltas[:, 1:] = np.diff(dm, axis=1).astype(np.uint64)
    maxd = deltas.max(axis=1)
    bpv_d = _bitlen_vec(maxd)
    docs_out: list = [None] * nfull
    for bpv in np.unique(bpv_d):
        idx = np.flatnonzero(bpv_d == bpv)
        bpv = int(bpv)
        head = bytes([bpv])
        if bpv == 0:
            # all-zero deltas: unreachable for strictly increasing docs,
            # but keep byte parity with encode_deltas' all-equal path
            cell = bytes([_ALL_EQUAL]) + (0).to_bytes(8, "little")
            for i in idx:
                docs_out[int(i)] = cell
            continue
        packed = pack_bits(deltas[idx].reshape(-1), bpv)
        per = B * bpv // 8
        mv = memoryview(packed)
        for j, i in enumerate(idx):
            docs_out[int(i)] = head + bytes(mv[j * per:(j + 1) * per])

    tm = tfs[:nfull * B].reshape(nfull, B).astype(np.uint64)
    srt = np.sort(tm, axis=1)
    all_eq = srt[:, 0] == srt[:, -1]
    bl = _bitlen_vec(
        srt[:, B - 1 - np.arange(MAX_EXCEPTIONS + 1)].reshape(-1)
    ).reshape(nfull, MAX_EXCEPTIONS + 1)
    costs = B * bl + np.arange(MAX_EXCEPTIONS + 1) * 40
    best_k = np.argmin(costs, axis=1)          # first min == smallest k
    tfs_out: list = [None] * nfull
    for i in np.flatnonzero(all_eq):
        i = int(i)
        tfs_out[i] = bytes([_ALL_EQUAL]) + int(tm[i, 0]).to_bytes(4,
                                                                  "little")
    batchable = (~all_eq) & (best_k == 0)
    for bpv in np.unique(bl[:, 0][batchable]) if batchable.any() else []:
        idx = np.flatnonzero(batchable & (bl[:, 0] == bpv))
        bpv = int(bpv)
        packed = pack_bits(tm[idx].reshape(-1), bpv)
        per = B * bpv // 8
        head = bytes([bpv, 0])
        mv = memoryview(packed)
        for j, i in enumerate(idx):
            tfs_out[int(i)] = head + bytes(mv[j * per:(j + 1) * per])
    for i in np.flatnonzero((~all_eq) & (best_k != 0)):
        i = int(i)
        tfs_out[i] = encode_pfor(tm[i])
    return docs_out, tfs_out


def encode_term(doc_ids: np.ndarray, tfs: np.ndarray, norms: np.ndarray,
                positions: np.ndarray | None = None) -> dict[str, list]:
    """Encode one term's postings (doc-sorted) into per-block columns.

    Returns a dict of equal-length lists, one element per block:
    first_doc, last_doc, n, docs_enc, tfs_enc, norms_enc, imp_freq (list),
    imp_norm (bytes), pos_enc (bytes; empty when positions are off).

    ``positions``: optional int32 array of all positions of the term, in
    posting order; the per-posting boundaries are the tf prefix sums (the
    same implicit framing as the reference's .pos stream,
    Lucene103PostingsFormat.java:200-260).
    """
    n = len(doc_ids)
    out = {k: [] for k in ("first_doc", "last_doc", "n", "docs_enc",
                           "tfs_enc", "norms_enc", "imp_freq", "imp_norm",
                           "pos_enc")}
    pos_bounds = None
    if positions is not None:
        pos_bounds = np.concatenate(
            [[0], np.cumsum(np.asarray(tfs, dtype=np.int64))])
    batch_docs, batch_tfs = _batch_full_blocks(np.asarray(doc_ids), tfs)
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        d = doc_ids[s:e].astype(np.int64)
        t = tfs[s:e]
        nb = norms[s:e].astype(np.uint8)
        fr, no = impact_frontier(t, nb)
        out["first_doc"].append(int(d[0]))
        out["last_doc"].append(int(d[-1]))
        out["n"].append(e - s)
        if positions is not None:
            out["pos_enc"].append(
                np.asarray(positions[pos_bounds[s]:pos_bounds[e]],
                           dtype="<i4").tobytes())
        else:
            out["pos_enc"].append(b"")
        if e - s == BLOCK_SIZE and batch_docs is not None:
            out["docs_enc"].append(batch_docs[s // BLOCK_SIZE])
            out["tfs_enc"].append(batch_tfs[s // BLOCK_SIZE])
        elif e - s == BLOCK_SIZE:
            deltas = np.empty(e - s, dtype=np.uint64)
            deltas[0] = 0
            deltas[1:] = np.diff(d).astype(np.uint64)
            out["docs_enc"].append(encode_deltas(deltas))
            out["tfs_enc"].append(encode_pfor(t))
        else:
            # tail block (< BLOCK_SIZE): raw little-endian arrays — the
            # role of Lucene's vInt tail (Lucene103PostingsFormat.java:186)
            # and the layout the merger decodes fully vectorized.
            out["docs_enc"].append(
                bytes([_RAW]) + d.astype("<i8").tobytes())
            out["tfs_enc"].append(
                bytes([_RAW]) + t.astype("<i4").tobytes())
        out["norms_enc"].append(nb.tobytes())
        out["imp_freq"].append(fr.tolist())
        out["imp_norm"].append(no.tobytes())
    return out


def decode_block(first_doc: int, n: int, docs_enc: bytes, tfs_enc: bytes,
                 norms_enc: bytes
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block → (doc_ids int64, tfs int64, norms uint8)."""
    if docs_enc[0] == _RAW:
        docs = np.frombuffer(docs_enc, dtype="<i8", offset=1).astype(np.int64)
    else:
        deltas = decode_deltas(docs_enc, n).astype(np.int64)
        deltas[0] = 0
        docs = first_doc + np.cumsum(deltas)
    if tfs_enc[0] == _RAW:
        tfs = np.frombuffer(tfs_enc, dtype="<i4", offset=1).astype(np.int64)
    else:
        tfs = decode_pfor(tfs_enc, n).astype(np.int64)
    norms = np.frombuffer(norms_enc, dtype=np.uint8)
    return docs, tfs, norms


def decode_positions(pos_enc: bytes, tfs: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Decode a block's position stream → (positions int32 flat, offsets)
    where posting i's positions are flat[offsets[i]:offsets[i+1]]."""
    flat = np.frombuffer(pos_enc, dtype="<i4").astype(np.int32)
    offsets = np.concatenate(
        [[0], np.cumsum(np.asarray(tfs, dtype=np.int64))])
    return flat, offsets


def decode_blocks(first_doc: np.ndarray, n: np.ndarray,
                  docs_enc: list, tfs_enc: list, norms_enc: list
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batched decode of many blocks of one term.

    Full 128-blocks with the same doc bit width form rectangular matrices
    and are unpacked in one vectorized pass each; all-equal and raw blocks
    vectorize trivially. Returns (docs, tfs, norms, offsets) where block
    i's postings are slice offsets[i]:offsets[i+1] of the flat arrays.
    """
    nb = len(n)
    n = np.asarray(n, dtype=np.int64)
    first_doc = np.asarray(first_doc, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(n)])
    total = int(offsets[-1])
    docs = np.empty(total, dtype=np.int64)
    tfs = np.empty(total, dtype=np.int64)

    # ---- docs ----
    kinds = np.frombuffer(bytes(e[0] for e in docs_enc), dtype=np.uint8)
    for b in np.flatnonzero(kinds == _RAW):
        b = int(b)
        docs[offsets[b]:offsets[b + 1]] = np.frombuffer(
            docs_enc[b], dtype="<i8", offset=1)
    ae = np.flatnonzero(kinds == _ALL_EQUAL)
    for b in ae:
        b = int(b)
        v = int.from_bytes(docs_enc[b][1:9], "little")
        docs[offsets[b]:offsets[b + 1]] = (
            first_doc[b] + np.arange(n[b], dtype=np.int64) * v)
    enc_mask = (kinds != _RAW) & (kinds != _ALL_EQUAL)
    for bpv in np.unique(kinds[enc_mask]):
        idx = np.flatnonzero((kinds == bpv) & enc_mask)
        full = idx[n[idx] == BLOCK_SIZE]
        part = idx[n[idx] != BLOCK_SIZE]
        if len(full):
            buf = b"".join(docs_enc[int(b)][1:] for b in full)
            deltas = unpack_bits(buf, len(full) * BLOCK_SIZE, int(bpv)) \
                .reshape(len(full), BLOCK_SIZE).astype(np.int64)
            deltas[:, 0] = 0
            d = first_doc[full][:, None] + np.cumsum(deltas, axis=1)
            for j, b in enumerate(full):
                b = int(b)
                docs[offsets[b]:offsets[b + 1]] = d[j]
        for b in part:
            b = int(b)
            deltas = decode_deltas(docs_enc[b], int(n[b])).astype(np.int64)
            deltas[0] = 0
            docs[offsets[b]:offsets[b + 1]] = first_doc[b] + np.cumsum(deltas)

    # ---- tfs ----
    tkinds = np.frombuffer(bytes(e[0] for e in tfs_enc), dtype=np.uint8)
    for b in np.flatnonzero(tkinds == _RAW):
        b = int(b)
        tfs[offsets[b]:offsets[b + 1]] = np.frombuffer(
            tfs_enc[b], dtype="<i4", offset=1)
    for b in np.flatnonzero(tkinds == _ALL_EQUAL):
        b = int(b)
        tfs[offsets[b]:offsets[b + 1]] = int.from_bytes(
            tfs_enc[b][1:5], "little")
    pf_mask = (tkinds != _RAW) & (tkinds != _ALL_EQUAL)
    for bpv in np.unique(tkinds[pf_mask]):
        idx = np.flatnonzero((tkinds == bpv) & pf_mask)
        full = idx[n[idx] == BLOCK_SIZE]
        part = idx[n[idx] != BLOCK_SIZE]
        if len(full):
            nbytes = (BLOCK_SIZE * int(bpv) + 7) // 8
            buf = b"".join(tfs_enc[int(b)][2:2 + nbytes] for b in full)
            base = unpack_bits(buf, len(full) * BLOCK_SIZE, int(bpv)) \
                .reshape(len(full), BLOCK_SIZE).astype(np.int64)
            for j, b in enumerate(full):
                b = int(b)
                row = base[j]
                k_exc = tfs_enc[b][1]
                if k_exc:
                    pos = 2 + nbytes
                    e = tfs_enc[b]
                    for _ in range(k_exc):
                        row[e[pos]] = int.from_bytes(e[pos + 1:pos + 5],
                                                     "little")
                        pos += 5
                tfs[offsets[b]:offsets[b + 1]] = row
        for b in part:
            b = int(b)
            tfs[offsets[b]:offsets[b + 1]] = decode_pfor(
                tfs_enc[b], int(n[b])).astype(np.int64)

    norms = np.frombuffer(b"".join(norms_enc), dtype=np.uint8)
    return docs, tfs, norms, offsets
