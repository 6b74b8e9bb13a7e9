"""The index-build pipeline, Ray-Data-first.

Stage map (reference semantics → Ray Data physical plan; SURVEY.md §3.1):

1. **Plan** — two docID modes (see build_index):
   *arrival* (default): one input parquet file = one segment; docID = file
   base + row index, bases straight from parquet footers — Lucene's
   ingest-order assignment (``DocumentsWriterPerThread.java:274``) and the
   scale path: the corpus is NEVER shuffled, only encoded segments move.
   *key*: sample doc keys → contiguous key-range buckets, exact per-bucket
   counts, prefix-sum bases; docID = global rank of ``(repo, path,
   commit)`` — stable under any corpus re-sharding (the segment-docBase
   scheme of ``index/MergeState.java:170-204``, made reproducible).
2. **Segment build (flush)** — arrival: parallel per-file tasks; key: one
   full-data shuffle ``groupby("bucket").map_groups``. Per segment: sort
   (key mode) or keep row order (arrival),
   assign docIDs, sha256, tokenize (vectorized StandardAnalyzer), local
   (term, doc, tf) dedup via dictionary-encode (the ``BytesRefHash`` role,
   ``util/BytesRefHash.java:335``), encode block postings (delta+FOR/PFoR +
   impacts), write ``segments/seg=N.parquet`` (term-sorted) +
   ``docmeta/bucket=N.parquet`` + a lineage record. Raw postings never cross
   the wire — only encoded segments do.
3. **Merge** — the north-star unified term dictionary:
   read back the (already compressed, ~10-30× smaller than raw triples)
   segment rows, key them by ``(tbucket = crc32(term) % T,
   salt = seg // salt_group)`` and ``groupby([...]).map_groups(Merger, ...)``
   with a **stateful actor pool**. Salting bounds every merge group to
   ``salt_group`` segments' worth of one term-hash bucket, so a degenerate
   term with df ≈ N (the skew case) is split across salt groups into
   multiple final rows with disjoint, increasing doc ranges — the k-way
   ordered merge of ``index/MultiTermsEnum.java:32`` degenerates to ordered
   concat + re-block, exactly as in Lucene where segment doc ranges are
   disjoint. Output: ``postings/part=T_S.parquet`` sorted by
   ``(term, first_doc)`` + lineage (incl. term min/max per part for pruning).
4. **Stats + manifest** — doc_count/sum_ttf from segment lineage (cross-
   checkable against a docmeta aggregate), manifest written atomically.

Resumability: every partition output is written to a temp name and renamed;
per-partition lineage JSON lands in ``_build/`` as each task finishes; a
rerun loads the plan, skips finished buckets *before* the shuffle, and skips
finished merge parts.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .analysis import term_freq_batch
from .codec import BLOCK_SIZE, encode_term
from .state.manifest import (IndexManifest, atomic_write_json, load_manifest,
                             max_assigned_doc, save_manifest)

SEP = "\x00"

POSTINGS_FIELDS = [
    ("term", pa.string()),
    ("seg", pa.int32()),
    ("first_doc", pa.int64()),
    ("last_doc", pa.int64()),
    ("n", pa.int32()),
    ("tf_sum", pa.int64()),
    ("docs_enc", pa.binary()),
    ("tfs_enc", pa.binary()),
    ("norms_enc", pa.binary()),
    ("imp_freq", pa.list_(pa.int32())),
    ("imp_norm", pa.binary()),
    ("pos_enc", pa.binary()),
]
SEGMENT_SCHEMA = pa.schema(POSTINGS_FIELDS)


def _dockey(batch: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(
        batch.column("repo"), batch.column("path"), batch.column("commit"),
        SEP)


def _crc_bucket(terms: list[str], mod: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(t.encode()) % mod for t in terms),
        dtype=np.int32, count=len(terms))


def default_build_params(n_rows: int, target_docs_per_bucket: int = 250_000
                         ) -> dict:
    """Bucket/partition sizing.

    At scale, ~250k docs per segment mirrors Lucene's query-slice sizing
    (search/IndexSearcher.java:106-108) and keeps a group's tokenized
    footprint comfortably inside a worker heap. For small corpora we cut
    finer buckets (~1k docs) so the segment-build stage saturates the CPUs
    instead of running a handful of giant groups."""
    by_target = -(-n_rows // target_docs_per_bucket)
    if by_target >= 64:
        num_buckets = by_target
    else:
        num_buckets = min(256, max(4, -(-n_rows // 1_000)))
    term_parts = max(8, min(64, num_buckets))
    # Merge-group sizing: a (tbucket, salt) group holds the postings of
    # `salt_group` segments for 1/term_parts of the vocabulary. Target
    # ~64-256 MB per group at scale: with S-doc segments and ~150 postings
    # per doc at ~3 bytes encoded, group_bytes ≈ salt_group*S*450/T.
    # At 10^12 docs (250k-doc segments, T≈4096) salt_group≈1024 gives
    # ~100 MB groups and ~400k output partitions; at test scale 64 is fine.
    approx_seg_docs = max(1, n_rows // max(num_buckets, 1))
    target_group_bytes = 128 * 1024 * 1024
    salt_group = max(4, min(4096, int(
        target_group_bytes * term_parts / max(approx_seg_docs * 450, 1))))
    return {"num_buckets": int(num_buckets), "term_parts": int(term_parts),
            "salt_group": int(salt_group)}


# ---------------------------------------------------------------------------
# Stage 1: plan

def _sample_and_count(ds, sample_per_batch: int = 32
                      ) -> tuple[int, list[str]]:
    """One pass over the corpus: total row count + deterministic key sample
    (the plan stage reads the data once, not twice)."""
    def sample(batch: pa.Table) -> pa.Table:
        keys = _dockey(batch)
        n = len(keys)
        step = max(1, n // sample_per_batch)
        picked = keys.take(np.arange(0, n, step))
        return pa.table({"key": picked,
                         "n": pa.array([n] + [0] * (len(picked) - 1),
                                       pa.int64())})

    rows = ds.map_batches(sample, batch_format="pyarrow").take_all()
    n_rows = sum(r["n"] for r in rows)
    keys = sorted(r["key"] for r in rows)
    return n_rows, keys


def _boundaries_from_sample(keys: list[str], num_buckets: int) -> list[str]:
    if not keys or num_buckets <= 1:
        return []
    idx = np.linspace(0, len(keys) - 1, num_buckets + 1)[1:-1]
    return sorted({keys[int(i)] for i in idx})


def _assign_bucket(batch: pa.Table, boundaries: list[str]) -> pa.Table:
    keys = _dockey(batch)
    if boundaries:
        b = np.searchsorted(np.array(boundaries, dtype=object),
                            np.array(keys.to_pylist(), dtype=object),
                            side="right").astype(np.int32)
    else:
        b = np.zeros(len(keys), dtype=np.int32)
    return batch.append_column("bucket", pa.array(b, pa.int32())) \
                .append_column("dockey", keys)


def _bucket_counts(ds_with_bucket, num_buckets: int) -> list[int]:
    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("bucket").to_numpy(zero_copy_only=False)
        cnt = np.bincount(vc, minlength=num_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int32()),
                         "n": pa.array(cnt[nz], pa.int64())})

    rows = (ds_with_bucket.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").sum("n").take_all())
    counts = [0] * num_buckets
    for r in rows:
        counts[r["bucket"]] = int(r["sum(n)"])
    return counts



def _raw_rows_binary(vals: np.ndarray, n_per_row: np.ndarray, width: int,
                     marker: bool = True) -> pa.Array:
    """Assemble a BinaryArray of raw-layout cells ([0xFD]+payload per row)
    from a flat value array, fully vectorized (no per-row Python)."""
    k = len(n_per_row)
    nbytes = n_per_row.astype(np.int64) * width
    row_bytes = nbytes + (1 if marker else 0)
    offsets = np.concatenate([[0], np.cumsum(row_bytes)]).astype(np.int32)
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    if marker:
        out[offsets[:-1]] = 0xFD
    payload = vals.astype(f"<i{width}").view(np.uint8) if width > 1 \
        else vals.astype(np.uint8)
    if len(payload):
        dst = np.repeat(
            offsets[:-1] + (1 if marker else 0)
            - np.concatenate([[0], np.cumsum(nbytes)[:-1]]),
            nbytes) + np.arange(int(nbytes.sum()))
        out[dst] = payload
    return pa.BinaryArray.from_buffers(
        pa.binary(), k, [None, pa.py_buffer(offsets.tobytes()),
                         pa.py_buffer(out.tobytes())])


# ---------------------------------------------------------------------------
# Stage 2: segment build (the flush)

def _build_segment(group: pa.Table, index_dir: str, bases: list[int],
                   with_positions: bool = False,
                   keyword_fields: list[str] | None = None,
                   with_term_vectors: bool = False,
                   with_offsets: bool = False,
                   index_sort: str | None = None,
                   analyzer: str | None = None,
                   index_synonyms: dict | None = None) -> pa.Table:
    """Key-rank mode group UDF: sort the bucket by dockey, docIDs = bucket
    base + rank (deterministic global key rank)."""
    if group.num_rows == 0:
        return _empty_seg_lineage()
    seg = int(group.column("bucket")[0].as_py())
    group = group.sort_by([("dockey", "ascending")])
    return _build_segment_core(group, seg, bases[seg], index_dir,
                               with_positions, keyword_fields=keyword_fields,
                               with_term_vectors=with_term_vectors,
                               with_offsets=with_offsets,
                               index_sort=index_sort, analyzer=analyzer,
                               index_synonyms=index_synonyms)


def _build_segment_files(batch: pa.Table, index_dir: str,
                         with_positions: bool = False,
                         keyword_fields: list[str] | None = None,
                         with_term_vectors: bool = False,
                         with_offsets: bool = False,
                         index_sort: str | None = None,
                         analyzer: str | None = None,
                         index_synonyms: dict | None = None) -> pa.Table:
    """Arrival mode task UDF: one input parquet file = one segment, docIDs =
    file base + row index (Lucene's arrival-order docID assignment,
    DocumentsWriterPerThread.java:274) — NO corpus shuffle at all."""
    out = []
    for seg, path, base in zip(batch.column("seg").to_pylist(),
                               batch.column("path").to_pylist(),
                               batch.column("base").to_pylist()):
        cols = ["repo", "path", "commit", "lang", "content"]
        for f in keyword_fields or []:
            if f not in cols:           # custom keyword columns ride along
                cols.append(f)
        tbl = pq.read_table(path, columns=cols)
        out.append(_build_segment_core(tbl, int(seg), int(base), index_dir,
                                       with_positions, source=path,
                                       keyword_fields=keyword_fields,
                                       with_term_vectors=with_term_vectors,
                                       with_offsets=with_offsets,
                                       index_sort=index_sort,
                                       analyzer=analyzer,
                                       index_synonyms=index_synonyms))
    return pa.concat_tables(out) if out else _empty_seg_lineage()


def _build_segment_core(group: pa.Table, seg: int, base: int,
                        index_dir: str,
                        with_positions: bool = False,
                        source: str = "",
                        keyword_fields: list[str] | None = None,
                        with_term_vectors: bool = False,
                        with_offsets: bool = False,
                        index_sort: str | None = None,
                        analyzer: str | None = None,
                        index_synonyms: dict | None = None) -> pa.Table:
    t0 = time.time()
    if index_sort == "content_chars":
        # index sorting (index/IndexSorter.java, IndexWriterConfig
        # .setIndexSort): docs are PERMUTED by the sort key before docID
        # assignment, so every segment is stored sorted and a sorted-field
        # top-k can early-terminate per segment
        # (search/TopFieldCollector.java:37).
        _cl = pc.utf8_length(
            pc.coalesce(group.column("content"),
                        pa.scalar("", pa.string()))).to_numpy(
            zero_copy_only=False).astype(np.int64)
        _order = np.argsort(-_cl, kind="stable")
        group = group.take(pa.array(_order))
    contents = group.column("content").to_pylist()
    n_docs = len(contents)
    doc_ids = base + np.arange(n_docs, dtype=np.int64)

    shas = [hashlib.sha256(("" if c is None else c).encode()).digest()
            for c in contents]
    positions = None
    from .analysis import get_stream_filter
    from .analysis_en import get_token_filter
    from .charfilter import get_char_filter
    from .tokenizers import get_tokenizer
    tfilt = get_token_filter(analyzer)
    sfilt = get_stream_filter(analyzer)
    tknzr = get_tokenizer(analyzer)
    cfilt = get_char_filter(analyzer)
    syn = index_synonyms or None
    overlaps = np.zeros(n_docs, dtype=np.int32)
    if with_positions:
        if syn:
            (terms_arr, tfs_arr, owners, lengths, norms, positions,
             overlaps) = term_freq_batch(contents, with_positions=True,
                                         token_filter=tfilt, synonyms=syn,
                                         stream_filter=sfilt,
                                         tokenizer=tknzr,
                                         char_filter=cfilt)
        else:
            terms_arr, tfs_arr, owners, lengths, norms, positions = \
                term_freq_batch(contents, with_positions=True,
                                token_filter=tfilt, stream_filter=sfilt,
                                tokenizer=tknzr, char_filter=cfilt)
    elif syn:
        terms_arr, tfs_arr, owners, lengths, norms, overlaps = \
            term_freq_batch(contents, token_filter=tfilt, synonyms=syn,
                            stream_filter=sfilt, tokenizer=tknzr,
                            char_filter=cfilt)
    else:
        terms_arr, tfs_arr, owners, lengths, norms = \
            term_freq_batch(contents, token_filter=tfilt,
                            stream_filter=sfilt, tokenizer=tknzr,
                            char_filter=cfilt)

    _bp_dict = None   # bp's dictionary encode, reused by the postings
    # section below when keyword terms don't extend the token array
    if index_sort == "bp" and n_docs > 1 and len(terms_arr) > 0:
        # BP doc reordering (misc/index/BPIndexReorderer.java:94): permute
        # docs within the segment by recursive graph bisection so docs
        # sharing terms get nearby docIDs — doc deltas shrink (postings
        # compress better) and per-block doc ranges tighten (block-max
        # skipping sharpens). Runs per segment inside this build task:
        # bounded memory, parallel across segments, no shuffle. Unlike
        # content_chars this permutation is computed AFTER tokenization
        # (it needs the doc-term graph), so the per-doc outputs are
        # permuted and pair owners remapped instead of re-tokenizing.
        from .bp import bp_permutation
        _bp_dict = pc.dictionary_encode(
            terms_arr.combine_chunks() if hasattr(terms_arr,
                                                  "combine_chunks")
            else terms_arr)
        _codes = np.asarray(_bp_dict.indices, dtype=np.int64)
        _perm = bp_permutation(owners, _codes, n_docs)
        _inv = np.empty(n_docs, np.int64)
        _inv[_perm] = np.arange(n_docs, dtype=np.int64)
        group = group.take(pa.array(_perm))
        contents = [contents[i] for i in _perm]
        shas = [shas[i] for i in _perm]
        lengths = np.asarray(lengths)[_perm]
        norms = np.asarray(norms)[_perm]
        overlaps = np.asarray(overlaps)[_perm]
        owners = _inv[owners]

    n_kw = 0
    if keyword_fields:
        # StringField-style atomic keyword terms (document/StringField.java:27)
        # in the unified dictionary as "field:value" — Lucene's Term is the
        # (field, bytes) pair (index/Term.java); our single-namespace
        # dictionary encodes the field as a prefix. tf=1; the doc's content
        # norm is reused (keyword clauses are typically filters).
        import pyarrow as _pa
        kw_terms, kw_tf, kw_own = [], [], []
        kw_pos = [] if positions is not None else None
        for f in keyword_fields:
            vals = group.column(f).to_pylist()
            for d, v in enumerate(vals):
                if v is None:
                    continue
                kw_terms.append(f"{f}:{v}")
                kw_tf.append(1)
                kw_own.append(d)
                if kw_pos is not None:
                    kw_pos.append([0])
        n_kw = len(kw_terms)
        if kw_terms:
            terms_arr = _pa.concat_arrays(
                [terms_arr.combine_chunks()
                 if hasattr(terms_arr, "combine_chunks") else terms_arr,
                 _pa.array(kw_terms, _pa.string())])
            tfs_arr = np.concatenate(
                [tfs_arr, np.array(kw_tf, dtype=np.int64)])
            owners = np.concatenate(
                [owners, np.array(kw_own, dtype=np.int64)])
            if positions is not None:
                positions = positions + kw_pos

    # --- docmeta (term-vector columns appended below when enabled) ---
    docmeta_cols = {
        "doc_id": pa.array(doc_ids, pa.int64()),
        "repo": group.column("repo"),
        "path": group.column("path"),
        "commit": group.column("commit"),
        "lang": group.column("lang"),
        "sha256": pa.array(shas, pa.binary(32)),
        "field_len": pa.array(lengths, pa.int32()),
        # numOverlap (index/FieldInvertState.java:40): stacked posIncr=0
        # tokens per doc; field_len above is the DISCOUNTED length that
        # computeNorm quantizes, field_len + n_overlap the raw token count
        # that collection stats (sumTotalTermFreq) include
        "n_overlap": pa.array(overlaps, pa.int32()),
        "norm": pa.array(norms, pa.uint8()),
    }
    if index_sort == "content_chars":
        docmeta_cols["sort_key"] = pa.array(
            [len(c or "") for c in contents], pa.int64())

    # --- local inverted index: dedup (term, doc) → tf, then encode ---
    # (the per-segment BytesRefHash + FreqProx role,
    #  index/FreqProxTermsWriterPerField.java:28)
    n_postings = 0
    n_terms = 0
    cols = {k: [] for k, _ in POSTINGS_FIELDS}
    tv_arrays = None
    if len(terms_arr) > 0:
        dict_arr = _bp_dict if (_bp_dict is not None and n_kw == 0) \
            else pc.dictionary_encode(terms_arr)
        tok_idx = np.asarray(dict_arr.indices)
        vocab = dict_arr.dictionary
        # rank terms by UTF-8 byte order (== codepoint order; Arrow string
        # sort is byte-lexicographic)
        order = pc.sort_indices(vocab).to_numpy().astype(np.int64)
        rank_of = np.empty(len(vocab), dtype=np.int64)
        rank_of[order] = np.arange(len(vocab))
        if with_term_vectors:
            # forward index: per-doc (terms, tfs) term vector, content
            # terms only (pairs [0:n-n_kw)), terms byte-sorted within doc
            # — the TermVectorsWriter role (index/TermVectorsConsumer),
            # stored as docmeta list columns for O(doc) MoreLikeThis.
            n_content = len(tok_idx) - n_kw
            c_owner = owners[:n_content].astype(np.int64)
            c_rank = rank_of[tok_idx[:n_content]]
            srt2 = np.argsort((c_owner << np.int64(32)) | c_rank,
                              kind="stable")
            offs = np.concatenate(
                [[0], np.cumsum(np.bincount(c_owner, minlength=n_docs))]
            ).astype(np.int32)
            tv_terms = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                dict_arr.take(pa.array(srt2)).cast(pa.string()))
            tv_tfs = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                pa.array(tfs_arr[:n_content][srt2], pa.int32()))
            tv_arrays = (tv_terms, tv_tfs)
        # (term, doc) pairs are already unique per doc; sort by (rank, doc)
        key = (rank_of[tok_idx] << np.int64(32)) | owners
        srt = np.argsort(key, kind="stable")
        uniq = key[srt]
        tf = tfs_arr[srt]
        pos_sorted = [positions[i] for i in srt] if positions is not None \
            else None
        term_rank = (uniq >> np.int64(32)).astype(np.int64)
        doc_local = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)
        doc_global = base + doc_local
        post_norms = norms[doc_local]
        n_postings = len(uniq)
        # term boundaries (term_rank ascending, docs ascending within term)
        bnd = np.concatenate([[0], np.flatnonzero(np.diff(term_rank)) + 1,
                              [len(uniq)]])
        sorted_vocab = vocab.take(pa.array(order)).to_pylist()
        n_terms = len(bnd) - 1
        counts = np.diff(bnd)
        # strictly below BLOCK_SIZE: an exactly-128 block must go through
        # encode_term so it carries exact impacts (the merge stage passes
        # n==128 blocks through untouched and the searcher prunes on them)
        small = counts < BLOCK_SIZE
        pos_all = None
        pos_pair_bounds = None
        if pos_sorted is not None:
            pos_all = (np.concatenate(
                [np.asarray(p, dtype=np.int32) for p in pos_sorted])
                if pos_sorted else np.empty(0, np.int32))
            pos_pair_bounds = np.concatenate(
                [[0], np.cumsum(tf.astype(np.int64))])
        if small.any():
            # vectorized tail-term fast path: one raw block row per term
            # with <= BLOCK_SIZE postings. Impacts are left empty — the
            # merge stage re-encodes tails with exact frontiers, and the
            # searcher never reads segment files.
            s_idx = bnd[:-1][small]
            e_idx = bnd[1:][small]
            nrow = counts[small]
            total = int(nrow.sum())
            gather = np.repeat(
                s_idx - np.concatenate([[0], np.cumsum(nrow)[:-1]]),
                nrow) + np.arange(total)
            tfsum_all = np.add.reduceat(tf, bnd[:-1])
            small_tbl = {
                "term": pa.array(
                    [sorted_vocab[int(term_rank[s])] for s in s_idx],
                    pa.string()),
                "seg": pa.array(np.full(len(s_idx), seg, np.int32)),
                "first_doc": pa.array(doc_global[s_idx], pa.int64()),
                "last_doc": pa.array(doc_global[e_idx - 1], pa.int64()),
                "n": pa.array(nrow.astype(np.int32)),
                "tf_sum": pa.array(tfsum_all[small].astype(np.int64)),
                "docs_enc": _raw_rows_binary(doc_global[gather], nrow, 8),
                "tfs_enc": _raw_rows_binary(tf[gather], nrow, 4),
                "norms_enc": _raw_rows_binary(post_norms[gather], nrow, 1,
                                              marker=False),
                "imp_freq": pa.array([[]] * len(s_idx),
                                     pa.list_(pa.int32())),
                "imp_norm": pa.array([b""] * len(s_idx), pa.binary()),
            }
            if pos_all is not None:
                # per-term position payload: positions of pairs s..e
                ppr = (pos_pair_bounds[e_idx]
                       - pos_pair_bounds[s_idx]).astype(np.int64)
                pgather = np.repeat(
                    pos_pair_bounds[s_idx]
                    - np.concatenate([[0], np.cumsum(ppr)[:-1]]),
                    ppr) + np.arange(int(ppr.sum()))
                small_tbl["pos_enc"] = _raw_rows_binary(
                    pos_all[pgather], ppr, 4, marker=False)
            else:
                small_tbl["pos_enc"] = pa.array([b""] * len(s_idx),
                                                pa.binary())
            small_table = pa.table(small_tbl, schema=SEGMENT_SCHEMA)
        else:
            small_table = None
        for i in np.flatnonzero(~small):
            i = int(i)
            s, e = int(bnd[i]), int(bnd[i + 1])
            term = sorted_vocab[int(term_rank[s])]
            tpos = None
            if pos_sorted is not None:
                tpos = np.concatenate(
                    [np.asarray(p, dtype=np.int32)
                     for p in pos_sorted[s:e]]) if e > s else \
                    np.empty(0, np.int32)
            enc = encode_term(doc_global[s:e], tf[s:e], post_norms[s:e],
                              positions=tpos)
            nb = len(enc["n"])
            cols["term"].extend([term] * nb)
            cols["seg"].extend([seg] * nb)
            cols["first_doc"].extend(enc["first_doc"])
            cols["last_doc"].extend(enc["last_doc"])
            cols["n"].extend(enc["n"])
            # per-block tf sum for df/ttf aggregation
            csum = np.cumsum(tf[s:e])
            marks = np.minimum(np.arange(1, nb + 1) * BLOCK_SIZE, e - s) - 1
            prev = np.concatenate([[0], csum[marks[:-1]]]) if nb > 1 else [0]
            cols["tf_sum"].extend((csum[marks] - np.asarray(prev)).tolist())
            cols["docs_enc"].extend(enc["docs_enc"])
            cols["tfs_enc"].extend(enc["tfs_enc"])
            cols["norms_enc"].extend(enc["norms_enc"])
            cols["imp_freq"].extend(enc["imp_freq"])
            cols["imp_norm"].extend(enc["imp_norm"])
            cols["pos_enc"].extend(enc["pos_enc"])

    seg_tbl = pa.table(
        {k: pa.array(v, t) for (k, t), v in
         zip(POSTINGS_FIELDS, (cols[k] for k, _ in POSTINGS_FIELDS))},
        schema=SEGMENT_SCHEMA)
    if len(terms_arr) > 0 and small_table is not None:
        seg_tbl = pa.concat_tables([small_table, seg_tbl]).sort_by(
            [("term", "ascending"), ("first_doc", "ascending")])
    sg_path = os.path.join(index_dir, "segments", f"seg={seg:05d}.parquet")
    os.makedirs(os.path.dirname(sg_path), exist_ok=True)
    pq.write_table(seg_tbl, sg_path + ".tmp")
    os.replace(sg_path + ".tmp", sg_path)

    if with_offsets:
        # stored OffsetAttribute payload (..._AND_OFFSETS,
        # index/IndexOptions.java:26): per-doc token char offsets as list
        # columns — the term-vectors-with-offsets store the
        # UnifiedHighlighter POSTINGS/TERM_VECTORS offset modes read,
        # so highlighting never re-analyzes content.
        from .analysis import token_offsets_batch
        st_list, en_list = token_offsets_batch(contents, tokenizer=tknzr,
                                                char_filter=cfilt)
        loffs = np.concatenate(
            [[0], np.cumsum([len(x) for x in st_list])]).astype(np.int32)
        docmeta_cols["tok_starts"] = pa.ListArray.from_arrays(
            pa.array(loffs, pa.int32()),
            pa.array(np.concatenate(st_list) if st_list else
                     np.empty(0, np.int32), pa.int32()))
        docmeta_cols["tok_ends"] = pa.ListArray.from_arrays(
            pa.array(loffs, pa.int32()),
            pa.array(np.concatenate(en_list) if en_list else
                     np.empty(0, np.int32), pa.int32()))
    if with_term_vectors:
        if tv_arrays is None:          # no tokens at all → empty vectors
            empty = pa.array([[] for _ in range(n_docs)], pa.list_(pa.string()))
            empty_tf = pa.array([[] for _ in range(n_docs)],
                                pa.list_(pa.int32()))
            tv_arrays = (empty, empty_tf)
        docmeta_cols["tv_terms"] = tv_arrays[0]
        docmeta_cols["tv_tfs"] = tv_arrays[1]
    docmeta = pa.table(docmeta_cols)
    dm_path = os.path.join(index_dir, "docmeta", f"bucket={seg:05d}.parquet")
    os.makedirs(os.path.dirname(dm_path), exist_ok=True)
    pq.write_table(docmeta, dm_path + ".tmp")
    os.replace(dm_path + ".tmp", dm_path)

    sha_xor = np.bitwise_xor.reduce(
        np.frombuffer(b"".join(shas), dtype=np.uint8).reshape(-1, 32), axis=0
    ) if shas else np.zeros(32, np.uint8)
    elapsed = time.time() - t0
    lineage = {
        "seg": seg, "source": source, "n_kw_postings": int(n_kw),
        "n_docs": n_docs,
        # sumTotalTermFreq counts stacked (overlap) tokens too — Lucene's
        # collection stats sum raw totalTermFreq, only norms discount
        "n_tokens": int(lengths.sum()) + int(overlaps.sum()),
        "n_postings": int(n_postings), "n_terms": n_terms,
        "content_bytes": int(sum(len(c or "") for c in contents)),
        "postings_bytes": int(seg_tbl.nbytes),
        "elapsed_s": round(elapsed, 4),
        "docs_per_s": round(n_docs / max(elapsed, 1e-9), 1),
        "sha256_xor": sha_xor.tobytes().hex(),
    }
    lin_dir = os.path.join(index_dir, "_build", "seg_lineage")
    os.makedirs(lin_dir, exist_ok=True)
    atomic_write_json(os.path.join(lin_dir, f"seg_{seg:05d}.json"), lineage)
    return pa.table({k: [v] for k, v in lineage.items()})


# ---------------------------------------------------------------------------
# Stage 3: merge into the unified term dictionary (actor pool)

class Merger:
    """Stateful actor-pool merge stage (north star: 'merge
    segment-partitioned postings into a unified term dictionary via stateful
    actor-pool merge stages'). Holds reusable scratch state per actor; each
    __call__ merges one (tbucket, salt) group: ordered concat of per-segment
    postings (doc ranges disjoint by construction) + re-block + re-encode,
    the SegmentMerger/MultiTermsEnum role (index/SegmentMerger.java:113)."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        os.makedirs(os.path.join(index_dir, "postings"), exist_ok=True)
        os.makedirs(os.path.join(index_dir, "_build", "merge_lineage"),
                    exist_ok=True)

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        if group.num_rows == 0:
            return _empty_merge_lineage()
        tb = int(group.column("tbucket")[0].as_py())
        salt = int(group.column("salt")[0].as_py())
        part = f"{tb:05d}_{salt:04d}"
        out_path = os.path.join(self.index_dir, "postings",
                                f"part={part}.parquet")
        group = group.sort_by([("term", "ascending"),
                               ("first_doc", "ascending")])
        n_arr = group.column("n").to_numpy()
        full_mask = n_arr == BLOCK_SIZE

        # 1) full 128-blocks pass through unchanged: their docIDs are
        #    already global, so re-encoding them would be a no-op
        #    (Lucene's merge re-encodes because segment docIDs must be
        #    remapped, MergeState.java:170-204 — ours need no remap).
        passthrough = group.filter(pa.array(full_mask)).select(
            [k for k, _ in POSTINGS_FIELDS])

        # 2) tail blocks: decode ALL of them vectorized from the raw-layout
        #    binary columns, then re-encode per RUN — a run is a maximal
        #    sequence of tail rows of one term NOT interrupted by a full
        #    block of that term in (term, first_doc) order. Re-blocking
        #    across a full block would create blocks whose doc range
        #    overlaps the full block's range, breaking the "block doc
        #    ranges disjoint ascending" invariant that decode_blocks,
        #    searchsorted membership tests and the block-max pruner rely
        #    on (the ordered-concat k-way merge, MultiTermsEnum.java:32 —
        #    input ranges are disjoint because segment doc ranges are).
        tcol = group.column("term").combine_chunks()
        nall = len(tcol)
        prev_full = np.concatenate([[False], full_mask[:-1]])
        prev_term_differs = np.ones(nall, dtype=bool)
        if nall > 1:
            prev_term_differs[1:] = pc.not_equal(
                tcol.slice(1), tcol.slice(0, nall - 1)
            ).to_numpy(zero_copy_only=False)
        new_run_all = prev_term_differs | prev_full
        tail_idx = np.flatnonzero(~full_mask)
        new_run_tail = new_run_all[tail_idx]
        tails = group.filter(pa.array(~full_mask))
        cols = {k: [] for k, _ in POSTINGS_FIELDS}
        n_terms_tail = 0
        n_postings = int(group.column("n").to_numpy().sum())
        if tails.num_rows:
            tn = tails.column("n").to_numpy()
            docs_flat = _flat_raw(tails.column("docs_enc"), tn, 8, "<i8")
            tfs_flat = _flat_raw(tails.column("tfs_enc"), tn, 4, "<i4")
            norms_flat = _flat_norms(tails.column("norms_enc"))
            # positions: tail cells concatenate in row order = per-term
            # posting order (rows doc-sorted, ranges disjoint)
            pos_flat = _flat_norms(tails.column("pos_enc")).view("<i4") \
                .astype(np.int32)
            has_pos = len(pos_flat) > 0
            ends = np.cumsum(tn)
            starts_row = ends - tn
            tf_ends = np.cumsum(
                np.array([int(x) for x in
                          tails.column("tf_sum").to_pylist()], np.int64))
            tf_starts = tf_ends - np.array(
                [int(x) for x in tails.column("tf_sum").to_pylist()],
                np.int64)
            terms = tails.column("term").to_pylist()
            nrow = tails.num_rows
            run_bnd = np.concatenate(
                [np.flatnonzero(new_run_tail), [nrow]])
            for r in range(len(run_bnd) - 1):
                i, j = int(run_bnd[r]), int(run_bnd[r + 1])
                s, e = int(starts_row[i]), int(ends[j - 1])
                tpos = pos_flat[int(tf_starts[i]):int(tf_ends[j - 1])] \
                    if has_pos else None
                enc = encode_term(docs_flat[s:e], tfs_flat[s:e],
                                  norms_flat[s:e], positions=tpos)
                nb = len(enc["n"])
                cols["term"].extend([terms[i]] * nb)
                cols["seg"].extend([-1] * nb)
                for k in ("first_doc", "last_doc", "n", "docs_enc",
                          "tfs_enc", "norms_enc", "imp_freq", "imp_norm",
                          "pos_enc"):
                    cols[k].extend(enc[k])
                csum = np.cumsum(tfs_flat[s:e])
                marks = np.minimum(np.arange(1, nb + 1) * BLOCK_SIZE,
                                   e - s) - 1
                prev = np.concatenate([[0], csum[marks[:-1]]]) \
                    if nb > 1 else [0]
                cols["tf_sum"].extend((csum[marks] - np.asarray(prev))
                                      .tolist())
                n_terms_tail += 1

        merged_tails = pa.table(
            {k: pa.array(v, t) for (k, t), v in
             zip(POSTINGS_FIELDS, (cols[k] for k, _ in POSTINGS_FIELDS))},
            schema=SEGMENT_SCHEMA)
        tbl = pa.concat_tables([passthrough.cast(SEGMENT_SCHEMA),
                                merged_tails])
        tbl = tbl.sort_by([("term", "ascending"), ("first_doc", "ascending")])
        pq.write_table(tbl, out_path + ".tmp",
                       row_group_size=16384, compression="zstd")
        os.replace(out_path + ".tmp", out_path)
        terms_out = tbl.column("term")
        n_terms = len(pc.unique(terms_out)) if tbl.num_rows else 0
        lineage = {
            "part": part, "tbucket": tb, "salt": salt,
            "n_terms": n_terms, "n_postings": n_postings,
            "n_blocks": tbl.num_rows,
            "bytes": int(tbl.nbytes),
            "term_min": terms_out[0].as_py() if tbl.num_rows else "",
            "term_max": terms_out[-1].as_py() if tbl.num_rows else "",
            "elapsed_s": round(time.time() - t0, 4),
            "postings_per_s": round(
                n_postings / max(time.time() - t0, 1e-9), 1),
        }
        atomic_write_json(
            os.path.join(self.index_dir, "_build", "merge_lineage",
                         f"part_{part}.json"), lineage)
        return pa.table({k: [v] for k, v in lineage.items()})


def _flat_raw(col: "pa.ChunkedArray", n_per_row: np.ndarray, width: int,
              dtype: str) -> np.ndarray:
    """Vectorized decode of raw-marker binary cells: gather each row's
    payload bytes (after the 1-byte marker) from the Arrow value buffer."""
    arr = col.combine_chunks()
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    starts = offs[:-1] + 1          # skip the 0xFD marker byte
    # sanity: every tail row must use the raw layout
    markers = data[offs[:-1]]
    if not np.all(markers == 0xFD):
        raise ValueError("non-raw tail block encountered in merge")
    nbytes = n_per_row.astype(np.int64) * width
    total = int(nbytes.sum())
    idx = np.repeat(starts - np.concatenate([[0], np.cumsum(nbytes)[:-1]]),
                    nbytes) + np.arange(total)
    return data[idx].view(dtype).astype(np.int64)


def _flat_norms(col: "pa.ChunkedArray") -> np.ndarray:
    arr = col.combine_chunks()
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    total = int(offs[-1] - offs[0])
    nbytes = np.diff(offs)
    idx = np.repeat(offs[:-1] - np.concatenate([[0], np.cumsum(nbytes)[:-1]]),
                    nbytes) + np.arange(total)
    return data[idx]


# ---------------------------------------------------------------------------
# Driver

def build_index(corpus, index_dir: str, *, num_buckets: int | None = None,
                term_parts: int | None = None, salt_group: int | None = None,
                merge_concurrency: int | tuple | None = None,
                doc_order: str = "arrival",
                with_positions: bool = False,
                keyword_fields: list[str] | None = None,
                with_term_vectors: bool = False,
                with_offsets: bool = False,
                index_sort: str | None = None,
                analyzer: str | None = None,
                index_synonyms: dict | None = None,
                overwrite: bool = False) -> IndexManifest:
    """Build (or resume building) an index from a corpus.

    ``corpus``: parquet path/dir, or a ray.data.Dataset with the corpus
    schema. Never calls ray.init (driver contract).

    ``doc_order``:
      - ``"arrival"`` (default, the scale path): one input parquet file =
        one segment, docID = file base + row index — Lucene's ingest-order
        assignment (DocumentsWriterPerThread.java:274). NO raw-corpus
        shuffle; bases come from parquet footers. Deterministic given the
        (sorted) file layout.
      - ``"key"``: docID = global rank of (repo, path, commit) via sampled
        key-range buckets + one groupby shuffle — ids are stable under any
        re-sharding of the corpus (used by the oracle-parity pipelines and
        the partition-invariance tests). Dataset inputs always use "key".
    """
    import ray.data

    _timing = os.environ.get("GRAFT_BUILD_TIMING")
    _t0 = time.time()

    if not isinstance(corpus, str):
        doc_order = "key"

    if overwrite and os.path.exists(os.path.join(index_dir, "manifest.json")):
        import shutil
        shutil.rmtree(index_dir)
    os.makedirs(os.path.join(index_dir, "_build"), exist_ok=True)

    def make_ds(keys_only: bool = False):
        if isinstance(corpus, str):
            cols = ["repo", "path", "commit"] if keys_only else \
                ["repo", "path", "commit", "lang", "content"]
            if not keys_only:
                for f in keyword_fields or []:
                    if f not in cols:   # custom keyword columns
                        cols.append(f)
            return ray.data.read_parquet(corpus, columns=cols)
        return corpus

    plan_path = os.path.join(index_dir, "_build", "plan.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            plan = json.load(f)
    elif doc_order == "arrival":
        files = sorted(
            os.path.join(corpus, f) for f in os.listdir(corpus)
            if f.endswith(".parquet")) if os.path.isdir(corpus) else [corpus]
        counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
        n_rows = sum(counts)
        params = default_build_params(n_rows)
        params["num_buckets"] = len(files)
        if term_parts:
            params["term_parts"] = term_parts
        if salt_group:
            params["salt_group"] = salt_group
        params["with_positions"] = bool(with_positions)
        params["keyword_fields"] = list(keyword_fields or [])
        params["with_term_vectors"] = bool(with_term_vectors)
        params["with_offsets"] = bool(with_offsets)
        params["index_sort"] = index_sort
        params["analyzer"] = analyzer
        params["index_synonyms"] = index_synonyms
        bases = np.concatenate([[0], np.cumsum(counts)[:-1]]).tolist()
        plan = {"params": params, "boundaries": [], "mode": "arrival",
                "files": files, "bucket_counts": counts, "bases": bases,
                "n_rows": n_rows, "corpus_fingerprint": _fingerprint(corpus)}
        atomic_write_json(plan_path, plan)
    else:
        n_rows, sample_keys = _sample_and_count(make_ds(keys_only=True))
        params = default_build_params(n_rows)
        if num_buckets:
            params["num_buckets"] = num_buckets
        if term_parts:
            params["term_parts"] = term_parts
        if salt_group:
            params["salt_group"] = salt_group
        params["with_positions"] = bool(with_positions)
        params["keyword_fields"] = list(keyword_fields or [])
        params["with_term_vectors"] = bool(with_term_vectors)
        params["with_offsets"] = bool(with_offsets)
        params["index_sort"] = index_sort
        params["analyzer"] = analyzer
        params["index_synonyms"] = index_synonyms
        boundaries = _boundaries_from_sample(sample_keys,
                                             params["num_buckets"])
        nb = len(boundaries) + 1
        with_bucket = make_ds(keys_only=True).map_batches(
            _assign_bucket, batch_format="pyarrow",
            fn_kwargs={"boundaries": boundaries})
        counts = _bucket_counts(with_bucket, nb)
        bases = np.concatenate([[0], np.cumsum(counts)[:-1]]).tolist()
        plan = {"params": params, "boundaries": boundaries,
                "bucket_counts": counts, "bases": bases, "n_rows": n_rows,
                "corpus_fingerprint": _fingerprint(corpus)}
        atomic_write_json(plan_path, plan)

    boundaries = plan["boundaries"]
    bases = plan["bases"]
    counts = plan["bucket_counts"]
    params = plan["params"]
    # the persisted plan is authoritative on resume — mixing positional and
    # non-positional (or differently-keyword-fielded) segments would
    # corrupt the index
    with_positions = bool(params.get("with_positions", with_positions))
    keyword_fields = params.get("keyword_fields", keyword_fields) or None
    with_term_vectors = bool(params.get("with_term_vectors",
                                        with_term_vectors))
    with_offsets = bool(params.get("with_offsets", with_offsets))
    index_sort = params.get("index_sort", index_sort)
    analyzer = params.get("analyzer", analyzer)
    index_synonyms = params.get("index_synonyms", index_synonyms)
    nb = len(counts)

    if _timing:
        print(f"[build-timing] plan {time.time() - _t0:.3f}s", flush=True)
        _t0 = time.time()

    # --- stage 2: segments (skip finished buckets before the shuffle) ---
    lin_dir = os.path.join(index_dir, "_build", "seg_lineage")
    done = set()
    if os.path.isdir(lin_dir):
        for f in os.listdir(lin_dir):
            if f.startswith("seg_") and f.endswith(".json"):
                done.add(int(f[4:-5]))
    todo = [b for b in range(nb) if counts[b] > 0 and b not in done]
    if todo and plan.get("mode") == "arrival":
        items = [{"seg": b, "path": plan["files"][b], "base": bases[b]}
                 for b in todo]
        (ray.data.from_items(items)
         .repartition(len(items))
         .map_batches(_build_segment_files, batch_format="pyarrow",
                      batch_size=1,
                      fn_kwargs={"index_dir": index_dir,
                                 "with_positions": with_positions,
                                 "keyword_fields": keyword_fields,
                                 "with_term_vectors": with_term_vectors,
                                 "with_offsets": with_offsets,
                                 "index_sort": index_sort,
                                 "analyzer": analyzer,
                                 "index_synonyms": index_synonyms})
         .materialize())
    elif todo:
        ds = make_ds().map_batches(_assign_bucket, batch_format="pyarrow",
                                   fn_kwargs={"boundaries": boundaries})
        if done:
            todo_set = set(todo)
            ds = ds.map_batches(
                lambda t, s=todo_set: t.filter(
                    pc.is_in(t.column("bucket"),
                             value_set=pa.array(list(s), pa.int32()))),
                batch_format="pyarrow")
        (ds.groupby("bucket")
           .map_groups(_build_segment, batch_format="pyarrow",
                       fn_kwargs={"index_dir": index_dir, "bases": bases,
                                  "with_positions": with_positions,
                                  "keyword_fields": keyword_fields,
                                  "with_term_vectors": with_term_vectors,
                                  "with_offsets": with_offsets,
                                  "index_sort": index_sort,
                                  "analyzer": analyzer,
                                  "index_synonyms": index_synonyms})
           .materialize())

    if _timing:
        print(f"[build-timing] segments {time.time() - _t0:.3f}s",
              flush=True)
        _t0 = time.time()

    seg_lineage = []
    for f in sorted(os.listdir(lin_dir)) if os.path.isdir(lin_dir) else []:
        with open(os.path.join(lin_dir, f)) as fh:
            seg_lineage.append(json.load(fh))

    # --- stage 3: merge (skip finished parts) ---
    T = params["term_parts"]
    G = params["salt_group"]
    mlin_dir = os.path.join(index_dir, "_build", "merge_lineage")
    done_parts = set()
    if os.path.isdir(mlin_dir):
        for f in os.listdir(mlin_dir):
            if f.startswith("part_") and f.endswith(".json"):
                done_parts.add(f[5:-5])

    seg_files = sorted(
        os.path.join(index_dir, "segments", f)
        for f in os.listdir(os.path.join(index_dir, "segments"))
    ) if os.path.isdir(os.path.join(index_dir, "segments")) else []
    if seg_files:
        sds = ray.data.read_parquet(
            seg_files,
            columns=[k for k, _ in POSTINGS_FIELDS])

        def key_rows(batch: pa.Table) -> pa.Table:
            terms = batch.column("term").to_pylist()
            tb = _crc_bucket(terms, T)
            salt = (batch.column("seg").to_numpy() // G).astype(np.int32)
            return batch.append_column("tbucket", pa.array(tb, pa.int32())) \
                        .append_column("salt", pa.array(salt, pa.int32()))

        sds = sds.map_batches(key_rows, batch_format="pyarrow")
        if done_parts:
            def drop_done(batch: pa.Table) -> pa.Table:
                tb = batch.column("tbucket").to_numpy()
                sl = batch.column("salt").to_numpy()
                keep = np.array(
                    [f"{a:05d}_{b:04d}" not in done_parts
                     for a, b in zip(tb, sl)])
                return batch.filter(pa.array(keep))
            sds = sds.map_batches(drop_done, batch_format="pyarrow")
        (sds.groupby(["tbucket", "salt"])
            .map_groups(Merger, batch_format="pyarrow",
                        fn_constructor_args=(index_dir,),
                        concurrency=merge_concurrency or (1, 16))
            .materialize())

    if _timing:
        print(f"[build-timing] merge {time.time() - _t0:.3f}s", flush=True)
        _t0 = time.time()

    merge_lineage = []
    if os.path.isdir(mlin_dir):
        for f in sorted(os.listdir(mlin_dir)):
            with open(os.path.join(mlin_dir, f)) as fh:
                merge_lineage.append(json.load(fh))

    doc_count = sum(l["n_docs"] for l in seg_lineage)
    sum_ttf = sum(l["n_tokens"] for l in seg_lineage)
    manifest = IndexManifest(
        version=1, config=params, boundaries=boundaries, bases=bases,
        bucket_counts=counts, doc_count=doc_count, sum_ttf=sum_ttf,
        segments=seg_lineage, postings_parts=merge_lineage,
        corpus_fingerprint=plan.get("corpus_fingerprint", ""),
    )
    save_manifest(index_dir, manifest)
    if _timing:
        print(f"[build-timing] finalize {time.time() - _t0:.3f}s",
              flush=True)
    return manifest


def _fingerprint(corpus) -> str:
    if isinstance(corpus, str):
        parts = []
        if os.path.isdir(corpus):
            for f in sorted(os.listdir(corpus)):
                p = os.path.join(corpus, f)
                parts.append(f"{f}:{os.path.getsize(p)}")
        elif os.path.exists(corpus):
            parts.append(f"{os.path.basename(corpus)}:{os.path.getsize(corpus)}")
        return hashlib.sha256(";".join(parts).encode()).hexdigest()[:16]
    return "dataset"


def verify_index(index_dir: str) -> dict:
    """CheckIndex analogue (index/CheckIndex.java:571): recompute df/ttf/
    doc_count from postings + docmeta and cross-check the manifest."""
    import ray.data

    m = load_manifest(index_dir)
    from ray.data.aggregate import Count, Sum
    try:
        dm_dir = os.path.join(index_dir, "docmeta")
        first = next((f for f in sorted(os.listdir(dm_dir))
                      if f.endswith(".parquet")), None)
        has_ov = first is not None and "n_overlap" in \
            pq.read_schema(os.path.join(dm_dir, first)).names
        cols = ["field_len"] + (["n_overlap"] if has_ov else [])
        dm = ray.data.read_parquet(dm_dir, columns=cols)
        aggs = [Count(), Sum("field_len")] + \
            ([Sum("n_overlap")] if has_ov else [])
        agg = dm.aggregate(*aggs) or {}
        pt = ray.data.read_parquet(os.path.join(index_dir, "postings"),
                                   columns=["n", "tf_sum"])
        pagg = pt.aggregate(Sum("n"), Sum("tf_sum")) or {}
    except Exception as e:  # missing/corrupt partitions → not ok
        return {"ok": False, "error": f"{type(e).__name__}: {e}"}
    doc_count = agg.get("count()", 0)
    # sumTotalTermFreq counts stacked (overlap) tokens — norms discount,
    # collection stats do not (FieldInvertState.java:40)
    sum_len = (agg.get("sum(field_len)") or 0) + \
        (agg.get("sum(n_overlap)") or 0)
    n_kw = sum(s.get("n_kw_postings", 0) for s in m.segments) \
        - int(m.config.get("expunged_kw", 0))
    res = {
        "doc_count_ok": doc_count == m.doc_count,
        "sum_ttf_ok": int(sum_len) == m.sum_ttf,
        "postings_ttf_ok":
            int(pagg["sum(tf_sum)"] or 0) == m.sum_ttf + n_kw,
        "doc_count": doc_count, "sum_ttf": int(sum_len),
        "n_postings": int(pagg["sum(n)"] or 0),
    }
    res["ok"] = all(v for k, v in res.items() if k.endswith("_ok"))
    return res


def _empty_seg_lineage() -> pa.Table:
    dummy = {"seg": 0, "source": "", "n_kw_postings": 0, "n_docs": 0,
             "n_tokens": 0, "n_postings": 0,
             "n_terms": 0, "content_bytes": 0, "postings_bytes": 0,
             "elapsed_s": 0.0, "docs_per_s": 0.0, "sha256_xor": ""}
    return pa.table({k: [v] for k, v in dummy.items()}).slice(0, 0)


def _empty_merge_lineage() -> pa.Table:
    dummy = {"part": "", "tbucket": 0, "salt": 0, "n_terms": 0,
             "n_postings": 0, "n_blocks": 0, "bytes": 0, "term_min": "",
             "term_max": "", "elapsed_s": 0.0, "postings_per_s": 0.0}
    return pa.table({k: [v] for k, v in dummy.items()}).slice(0, 0)


# ---------------------------------------------------------------------------
# Incremental append (the NRT refresh analogue: flush new segments + publish
# a new manifest generation — index/StandardDirectoryReader + SearcherManager
# semantics, SURVEY.md §2.10)

def append_to_index(index_dir: str, new_corpus: str,
                    merge_concurrency: int | tuple | None = None,
                    merge_on_flush_mb: float | None = None
                    ) -> IndexManifest:
    """Append new parquet files as fresh segments and merge them into NEW
    postings partitions (a new generation of salt groups); existing
    partitions are untouched. docIDs continue after the current doc_count;
    a reader opened after the atomic manifest rename sees the union —
    df/ttf/stats aggregate across generations at lookup because a term's
    rows simply accumulate across part files.

    ``merge_on_flush_mb``: after the append commits, run the
    MergeOnFlushMergePolicy pass (compact_index small_segment_mb) so
    the accumulated tiny generations collapse before the NRT reader
    opens — the sandbox policy's findFullFlushMerges contract."""
    import ray.data

    m = load_manifest(index_dir)
    with_pos = bool(m.config.get("with_positions"))
    kw_fields = m.config.get("keyword_fields") or None
    with_tv = bool(m.config.get("with_term_vectors"))
    with_off = bool(m.config.get("with_offsets"))
    analyzer = m.config.get("analyzer")
    index_synonyms = m.config.get("index_synonyms")
    files = sorted(
        os.path.join(new_corpus, f) for f in os.listdir(new_corpus)
        if f.endswith(".parquet")) if os.path.isdir(new_corpus) \
        else [new_corpus]
    already = {s.get("source") for s in m.segments if s.get("source")}
    files = [f for f in files if f not in already]
    if not files:
        return m
    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    seg_base = max((s["seg"] for s in m.segments), default=-1) + 1
    # docIDs continue after the assigned ceiling, not doc_count (which
    # expunge lowers while live docIDs keep their values)
    doc_base = max_assigned_doc(m)
    bases = (doc_base + np.concatenate([[0], np.cumsum(counts)[:-1]])
             ).tolist()
    segs = list(range(seg_base, seg_base + len(files)))

    done = {s["seg"] for s in m.segments}
    items = [{"seg": s, "path": p, "base": b}
             for s, p, b in zip(segs, files, bases) if s not in done]
    if items:
        (ray.data.from_items(items)
         .repartition(len(items))
         .map_batches(_build_segment_files, batch_format="pyarrow",
                      batch_size=1,
                      fn_kwargs={"index_dir": index_dir,
                                 "with_positions": with_pos,
                                 "keyword_fields": kw_fields,
                                 "with_term_vectors": with_tv,
                                 "with_offsets": with_off,
                                 "analyzer": analyzer,
                                 "index_synonyms": index_synonyms})
         .materialize())

    # merge ONLY the new segments, into a fresh salt generation
    T = m.config["term_parts"]
    G = m.config["salt_group"]
    salt_base = max((int(p["salt"]) for p in m.postings_parts),
                    default=-1) + 1
    seg_files = [os.path.join(index_dir, "segments",
                              f"seg={s:05d}.parquet") for s in segs]
    sds = ray.data.read_parquet(seg_files,
                                columns=[k for k, _ in POSTINGS_FIELDS])

    def key_rows(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        tb = _crc_bucket(terms, T)
        salt = (salt_base
                + (batch.column("seg").to_numpy() - seg_base) // G
                ).astype(np.int32)
        return batch.append_column("tbucket", pa.array(tb, pa.int32())) \
                    .append_column("salt", pa.array(salt, pa.int32()))

    (sds.map_batches(key_rows, batch_format="pyarrow")
        .groupby(["tbucket", "salt"])
        .map_groups(Merger, batch_format="pyarrow",
                    fn_constructor_args=(index_dir,),
                    concurrency=merge_concurrency or (1, 8))
        .materialize())

    # fold new lineage into a new manifest generation
    lin_dir = os.path.join(index_dir, "_build", "seg_lineage")
    seg_lineage = []
    for f in sorted(os.listdir(lin_dir)):
        with open(os.path.join(lin_dir, f)) as fh:
            seg_lineage.append(json.load(fh))
    mlin_dir = os.path.join(index_dir, "_build", "merge_lineage")
    merge_lineage = []
    for f in sorted(os.listdir(mlin_dir)):
        with open(os.path.join(mlin_dir, f)) as fh:
            merge_lineage.append(json.load(fh))
    manifest = IndexManifest(
        version=m.version + 1, config=m.config, boundaries=m.boundaries,
        bases=m.bases + bases, bucket_counts=m.bucket_counts + counts,
        doc_count=sum(l["n_docs"] for l in seg_lineage),
        sum_ttf=sum(l["n_tokens"] for l in seg_lineage),
        segments=seg_lineage, postings_parts=merge_lineage,
        corpus_fingerprint=m.corpus_fingerprint,
    )
    save_manifest(index_dir, manifest)
    if merge_on_flush_mb is not None:
        return compact_index(index_dir,
                             merge_concurrency=merge_concurrency,
                             small_segment_mb=merge_on_flush_mb)
    return manifest


def _shift_docmeta_bucket(batch: pa.Table, *, src_dm: str, dest_dir: str,
                          offset: int) -> pa.Table:
    """addIndexes docmeta import task: one src bucket → one dest bucket
    with doc_ids shifted by the destination's doc_count."""
    out = []
    for row in batch.to_pylist():
        t = pq.read_table(os.path.join(src_dm, row["src_file"]))
        ids = pc.add(t.column("doc_id"), offset)
        t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", ids)
        dm_path = os.path.join(dest_dir, "docmeta",
                               f"bucket={row['dest_seg']:05d}.parquet")
        pq.write_table(t, dm_path + ".tmp")
        os.replace(dm_path + ".tmp", dm_path)
        out.append({"dest_seg": row["dest_seg"], "n": t.num_rows})
    return pa.table({"dest_seg": pa.array([r["dest_seg"] for r in out],
                                          pa.int64()),
                     "n": pa.array([r["n"] for r in out], pa.int64())})


def add_indexes(index_dir: str, src_dir: str,
                merge_concurrency: int | tuple | None = None
                ) -> IndexManifest:
    """``IndexWriter.addIndexes(Directory...)``
    (index/IndexWriter.java:3114: import foreign segments wholesale,
    remapping docIDs past the current maxDoc). Full 128-blocks are
    delta-coded off the per-block first_doc, so their remap touches only
    two int64 columns and the packed bytes pass through untouched (the
    reference's no-re-index fast path); RAW tail blocks carry absolute
    docIDs and re-pack with the offset applied. Source
    parts re-bucket to this index's ``term_parts`` and land as one fresh
    salt generation; docmeta buckets copy with shifted ids; source
    tombstones carry over shifted. Both indexes must share the analysis/
    storage config (Lucene's codec-compatibility requirement)."""
    import ray.data

    m = load_manifest(index_dir)
    s = load_manifest(src_dir)
    for key in ("with_positions", "with_offsets", "with_term_vectors",
                "analyzer", "keyword_fields", "index_sort",
                "index_synonyms"):
        if m.config.get(key) != s.config.get(key):
            raise ValueError(
                f"add_indexes: config mismatch on {key!r}: "
                f"{m.config.get(key)!r} != {s.config.get(key)!r}")
    if not s.segments:
        return m
    offset = max_assigned_doc(m)   # docID ceiling, not doc_count
    seg_base = max((g["seg"] for g in m.segments), default=-1) + 1
    src_segs = sorted(g["seg"] for g in s.segments)
    seg_map = {old: seg_base + i for i, old in enumerate(src_segs)}

    # 1. docmeta buckets: distributed copy with shifted doc_ids
    src_dm = os.path.join(src_dir, "docmeta")
    items = [{"src_file": f"bucket={old:05d}.parquet",
              "dest_seg": seg_map[old]} for old in src_segs]
    (ray.data.from_items(items)
     .repartition(len(items))
     .map_batches(_shift_docmeta_bucket, batch_format="pyarrow",
                  batch_size=1,
                  fn_kwargs={"src_dm": src_dm, "dest_dir": index_dir,
                             "offset": offset})
     .materialize())

    # 2. imported segment lineage (source tagged so append's dedup never
    #    confuses it with a corpus file)
    lin_dir = os.path.join(index_dir, "_build", "seg_lineage")
    os.makedirs(lin_dir, exist_ok=True)
    for g in s.segments:
        rec = dict(g)
        rec["seg"] = seg_map[g["seg"]]
        rec["source"] = f"addindexes:{os.path.abspath(src_dir)}:" \
            f"{g.get('source', '')}"
        atomic_write_json(
            os.path.join(lin_dir, f"seg_{rec['seg']:05d}.json"), rec)

    # 3. postings: shift doc ranges, re-bucket, one new salt generation
    T = m.config["term_parts"]
    salt_base = max((int(p["salt"]) for p in m.postings_parts),
                    default=-1) + 1
    src_parts = [os.path.join(src_dir, "postings",
                              f"part={p['part']}.parquet")
                 for p in s.postings_parts]
    seg_old = np.array(src_segs, dtype=np.int64)
    seg_new = np.array([seg_map[x] for x in src_segs], dtype=np.int64)

    def shift_rows(batch: pa.Table) -> pa.Table:
        from .codec import _RAW

        terms = batch.column("term").to_pylist()
        tb = _crc_bucket(terms, T)
        segv = batch.column("seg").to_numpy().astype(np.int64)
        remap = np.where(
            segv >= 0,
            seg_new[np.minimum(np.searchsorted(seg_old, segv),
                               len(seg_old) - 1)],
            segv).astype(np.int32)
        i = batch.schema.get_field_index
        batch = batch.set_column(i("first_doc"), "first_doc",
                                 pc.add(batch.column("first_doc"), offset))
        batch = batch.set_column(i("last_doc"), "last_doc",
                                 pc.add(batch.column("last_doc"), offset))
        batch = batch.set_column(i("seg"), "seg", pa.array(remap))
        # full blocks are delta-coded off first_doc and pass through; RAW
        # tail blocks carry absolute docIDs in the payload and re-pack
        enc = batch.column("docs_enc").to_pylist()
        dirty = False
        for j, b in enumerate(enc):
            if b and b[0] == _RAW:
                enc[j] = bytes([_RAW]) + (
                    np.frombuffer(b, "<i8", offset=1) + offset
                ).astype("<i8").tobytes()
                dirty = True
        if dirty:
            batch = batch.set_column(i("docs_enc"), "docs_enc",
                                     pa.array(enc, pa.binary()))
        salt = np.full(batch.num_rows, salt_base, dtype=np.int32)
        return batch.append_column("tbucket",
                                   pa.array(tb, pa.int32())) \
                    .append_column("salt", pa.array(salt, pa.int32()))

    (ray.data.read_parquet(src_parts,
                           columns=[k for k, _ in POSTINGS_FIELDS])
     .map_batches(shift_rows, batch_format="pyarrow")
     .groupby(["tbucket", "salt"])
     .map_groups(Merger, batch_format="pyarrow",
                 fn_constructor_args=(index_dir,),
                 concurrency=merge_concurrency or (1, 8))
     .materialize())

    # 4. carried-over tombstones
    src_dd = os.path.join(src_dir, "deletes")
    if os.path.isdir(src_dd):
        dead = []
        for f in sorted(os.listdir(src_dd)):
            if f.endswith(".parquet"):
                dead.append(pq.read_table(
                    os.path.join(src_dd, f),
                    columns=["doc_id"]).column("doc_id").to_numpy())
        if dead:
            delete_docs(index_dir,
                        np.unique(np.concatenate(dead)) + offset)

    # 5. publish
    seg_lineage = []
    for f in sorted(os.listdir(lin_dir)):
        with open(os.path.join(lin_dir, f)) as fh:
            seg_lineage.append(json.load(fh))
    mlin_dir = os.path.join(index_dir, "_build", "merge_lineage")
    merge_lineage = []
    for f in sorted(os.listdir(mlin_dir)):
        with open(os.path.join(mlin_dir, f)) as fh:
            merge_lineage.append(json.load(fh))
    manifest = IndexManifest(
        version=m.version + 1, config=m.config, boundaries=m.boundaries,
        bases=m.bases + [int(b) + offset for b in s.bases],
        bucket_counts=m.bucket_counts + s.bucket_counts,
        # summed, not re-derived from lineage: expunge compaction lowers
        # doc_count below the lineage totals and must stay lowered
        doc_count=m.doc_count + s.doc_count,
        sum_ttf=m.sum_ttf + s.sum_ttf,
        segments=seg_lineage, postings_parts=merge_lineage,
        corpus_fingerprint=m.corpus_fingerprint,
    )
    save_manifest(index_dir, manifest)
    return manifest


def _next_delete_gen(ddir: str) -> int:
    """Next tombstone generation number: max over BOTH the on-disk
    hard (``gen_``) / soft (``soft_``) files AND the persisted
    high-water marker. The marker keeps numbering MONOTONIC across an
    expunge that clears every file — without it, a fresh soft
    generation could reuse a number at or below an existing retention
    lease's watermark and be reclaimed before its holder ever synced
    it (counting files, the pre-r5 scheme, had the same reuse bug)."""
    nxt = 0
    marker = os.path.join(ddir, "next_gen.json")
    if os.path.exists(marker):
        with open(marker) as f:
            nxt = int(json.load(f)["next"])
    for f in (os.listdir(ddir) if os.path.isdir(ddir) else []):
        stem, _, _ = f.partition(".")
        _, _, num = stem.partition("_")
        if f.endswith(".parquet") and num.isdigit():
            nxt = max(nxt, int(num) + 1)
    return nxt


def _bump_delete_gen(ddir: str, next_gen: int) -> None:
    """Advance the persisted generation high-water mark (monotonic)."""
    marker = os.path.join(ddir, "next_gen.json")
    cur = 0
    if os.path.exists(marker):
        with open(marker) as f:
            cur = int(json.load(f)["next"])
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"next": max(cur, next_gen)}, f)
    os.replace(tmp, marker)


def _write_tombstones(index_dir: str, ids: np.ndarray, prefix: str) -> int:
    ddir = os.path.join(index_dir, "deletes")
    os.makedirs(ddir, exist_ok=True)
    gen = _next_delete_gen(ddir)
    path = os.path.join(ddir, f"{prefix}_{gen:05d}.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}),
                   path + ".tmp")
    os.replace(path + ".tmp", path)
    _bump_delete_gen(ddir, gen + 1)
    return gen


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone a set of docIDs — the live-docs role
    (codecs/lucene90/Lucene90LiveDocsFormat.java:49): an append-only
    generation file under ``deletes/``; readers union all generations and
    filter result doc sets (stats stay delete-blind until rebuild,
    matching Lucene's semantics before merge). Returns the number of
    newly deleted docs."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) == 0:
        return 0
    _write_tombstones(index_dir, ids, "gen")
    return len(ids)


def soft_delete_docs(index_dir: str, doc_ids) -> int:
    """Soft-delete a set of docIDs (the soft-deletes docvalues field
    role, index/SoftDeletesRetentionMergePolicy.java:46): search-invisible
    immediately like a hard tombstone, but ``compact_index``'s expunge
    RETAINS the docs physically while any retention lease
    (state/retention.py) has not caught up past this generation. Returns
    the soft generation number filed."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) == 0:
        return -1
    return _write_tombstones(index_dir, ids, "soft")


def soft_delete_by_term(index_dir: str, term: str) -> int:
    """Soft-delete every live doc containing ``term`` (the
    updateDocValues(term, softDeletesField) idiom). Returns the soft
    generation number filed, -1 if nothing matched."""
    from .search import IndexReader, _term_docset

    docs = _term_docset(IndexReader(index_dir), term)
    if len(docs) == 0:
        return -1
    return soft_delete_docs(index_dir, docs)


def delete_by_term(index_dir: str, term: str) -> int:
    """IndexWriter.deleteDocuments(Term) (index/IndexWriter.java:1844
    family): tombstone every live doc containing ``term``."""
    from .search import IndexReader, _term_docset

    r = IndexReader(index_dir)
    docs = _term_docset(r, term)           # already live-filtered
    if len(docs) == 0:
        return 0
    return delete_docs(index_dir, docs)


def upsert_documents(index_dir: str, new_corpus: str,
                     merge_concurrency: int | tuple | None = None,
                     broadcast_key_limit: int = 2_000_000
                     ) -> IndexManifest:
    """updateDocument semantics (IndexWriter.updateDocument =
    delete-by-key + add; index/IndexWriter.java:1739): tombstone existing
    docs whose (repo, path, commit) key appears in ``new_corpus``, then
    append the new files as fresh segments.

    Scale shape: a delta up to ``broadcast_key_limit`` keys broadcasts ONE
    deduplicated Arrow key array (``ray.put`` once, ~50 B/key) and filters
    docmeta with vectorized ``pc.is_in`` — no Python set, no per-row loop.
    A larger delta never touches the driver at all: both sides map to
    (dockey) rows and a distributed hash semi-join finds matches, whose
    doc_ids stream straight into a tombstone generation via
    ``write_parquet``."""
    import ray
    import ray.data

    files = sorted(
        os.path.join(new_corpus, f) for f in os.listdir(new_corpus)
        if f.endswith(".parquet")) if os.path.isdir(new_corpus) \
        else [new_corpus]
    n_new = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    dm = ray.data.read_parquet(os.path.join(index_dir, "docmeta"),
                               columns=["doc_id", "repo", "path", "commit"])

    if n_new <= broadcast_key_limit:
        keys = pc.unique(_dockey(pa.concat_tables(
            pq.read_table(f, columns=["repo", "path", "commit"])
            for f in files)))
        kref = ray.put(keys)

        def match(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(_dockey(batch), value_set=ray.get(kref))
            return batch.filter(mask).select(["doc_id"])

        hit = [r["doc_id"] for r in
               dm.map_batches(match, batch_format="pyarrow").take_all()]
        if hit:
            delete_docs(index_dir, hit)
    else:
        def new_keys(batch: pa.Table) -> pa.Table:
            return pa.table({"dockey": _dockey(batch)})

        def dm_keys(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch.column("doc_id"),
                             "dockey": _dockey(batch)})

        nk = (ray.data.read_parquet(
                  files, columns=["repo", "path", "commit"])
              .map_batches(new_keys, batch_format="pyarrow"))
        parts = max(2, min(64, n_new // 1_000_000))
        hits = (dm.map_batches(dm_keys, batch_format="pyarrow")
                .join(nk, "inner", parts, on=("dockey",))
                .select_columns(["doc_id"]))
        _delete_docs_stream(index_dir, hits)
    return append_to_index(index_dir, new_corpus,
                           merge_concurrency=merge_concurrency)


def _delete_docs_stream(index_dir: str, doc_ids_ds) -> int:
    """Append a Dataset of ``doc_id`` rows as tombstone generations
    without collecting it on the driver: write_parquet to a scratch dir,
    then rename each shard in as its own ``gen_NNNNN.parquet`` (readers
    union generations, so duplicate ids across shards are harmless)."""
    import shutil

    ddir = os.path.join(index_dir, "deletes")
    os.makedirs(ddir, exist_ok=True)
    tmp = os.path.join(ddir, "_tmp_gen")
    shutil.rmtree(tmp, ignore_errors=True)
    doc_ids_ds.write_parquet(tmp)
    n = 0
    gen = _next_delete_gen(ddir)
    for f in sorted(os.listdir(tmp)):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(tmp, f)
        n += pq.ParquetFile(src).metadata.num_rows
        os.replace(src, os.path.join(ddir, f"gen_{gen:05d}.parquet"))
        gen += 1
    _bump_delete_gen(ddir, gen)
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def _load_deletes(index_dir: str,
                  return_files: bool = False,
                  exclude: "set[str] | None" = None):
    """Union of all tombstone generations. With ``return_files`` also
    returns the generation filenames read, so callers that later clear
    tombstones (compaction) remove exactly the generations they applied —
    a delete_docs() interleaved with a long compaction survives.
    ``exclude`` skips named generation files (retention-held soft
    generations stay both on disk and un-expunged)."""
    ddir = os.path.join(index_dir, "deletes")
    parts, files = [], []
    if os.path.isdir(ddir):
        for f in sorted(os.listdir(ddir)):
            if exclude and f in exclude:
                continue
            if f.endswith(".parquet"):
                files.append(f)
                parts.append(pq.read_table(
                    os.path.join(ddir, f),
                    columns=["doc_id"]).column("doc_id").to_numpy())
    ids = np.unique(np.concatenate(parts)) if parts \
        else np.empty(0, np.int64)
    return (ids, files) if return_files else ids


def _drop_deleted_rows(batch: pa.Table, dref) -> pa.Table:
    """Expunge stage: postings rows whose doc range contains tombstoned
    docs are decoded, filtered to live postings and re-emitted as
    RAW-layout tail rows (< 128 postings, empty impacts) that the Merger
    re-blocks with fresh impact frontiers; untouched rows pass through.
    The MergeState.DocMap 'deletes squeezed out' role
    (index/MergeState.java:170-204) without docID renumbering."""
    import ray

    from .codec import decode_block, decode_positions

    deleted = ray.get(dref)
    first = batch.column("first_doc").to_numpy()
    last = batch.column("last_doc").to_numpy()
    lo = np.searchsorted(deleted, first, side="left")
    hi = np.searchsorted(deleted, last, side="right")
    touched = hi > lo
    if not touched.any():
        return batch
    keep_rows = batch.filter(pa.array(~touched))
    rows = {k: [] for k, _ in POSTINGS_FIELDS}
    tb = batch.filter(pa.array(touched))
    for i in range(tb.num_rows):
        n = int(tb.column("n")[i].as_py())
        d, tf, nm = decode_block(int(tb.column("first_doc")[i].as_py()), n,
                                 tb.column("docs_enc")[i].as_py(),
                                 tb.column("tfs_enc")[i].as_py(),
                                 tb.column("norms_enc")[i].as_py())
        pos = np.minimum(np.searchsorted(deleted, d), len(deleted) - 1)
        live = deleted[pos] != d
        if not live.any():
            continue                       # whole block tombstoned
        pos_cell = tb.column("pos_enc")[i].as_py() or b""
        if pos_cell:
            flat, offs = decode_positions(pos_cell, tf)
            pos_cell = np.concatenate(
                [flat[offs[j]:offs[j + 1]]
                 for j in np.flatnonzero(live)]).astype("<i4").tobytes() \
                if live.any() else b""
        rows["term"].append(tb.column("term")[i].as_py())
        rows["seg"].append(-2)
        rows["first_doc"].append(int(d[live][0]))
        rows["last_doc"].append(int(d[live][-1]))
        rows["n"].append(int(live.sum()))
        rows["tf_sum"].append(int(tf[live].sum()))
        rows["docs_enc"].append(b"\xfd" + d[live].astype("<i8").tobytes())
        rows["tfs_enc"].append(b"\xfd" + tf[live].astype("<i4").tobytes())
        rows["norms_enc"].append(nm[live].tobytes())
        rows["imp_freq"].append([])
        rows["imp_norm"].append(b"")
        rows["pos_enc"].append(pos_cell)
    filtered = pa.table(
        {k: pa.array(v, t) for (k, t), v in
         zip(POSTINGS_FIELDS, (rows[k] for k, _ in POSTINGS_FIELDS))},
        schema=SEGMENT_SCHEMA)
    return pa.concat_tables([keep_rows.cast(SEGMENT_SCHEMA), filtered])


def compact_index(index_dir: str,
                  merge_concurrency: int | tuple | None = None,
                  expunge_deletes: bool = False,
                  max_merge_at_once: int | None = None,
                  tier_factor: float = 10.0,
                  small_segment_mb: float | None = None) -> IndexManifest:
    """Compaction — the TieredMergePolicy/forceMerge role
    (index/TieredMergePolicy.java:76, IndexWriter.forceMerge): collapse all
    postings generations (salt groups) of each term-hash bucket into one
    partition. Full 128-blocks pass through; accumulated tails re-block.
    Old parts are replaced under a new manifest version (two-phase: new
    files written first, manifest rename, then old files removed).

    ``max_merge_at_once=None`` is forceMerge(1): every multi-generation
    bucket collapses fully. With ``max_merge_at_once=N`` the NATURAL
    TieredMergePolicy selection runs instead (TieredMergePolicy.java:76
    maxMergeAtOnce + size tiers): per bucket, merge only the up-to-N
    smallest generations whose sizes lie within ``tier_factor`` of each
    other — big generations are never rewritten just to absorb a small
    one, which keeps total write amplification O(N log N) instead of the
    rewrite-everything O(N^2) at 100-TB scale.

    ``expunge_deletes``: squeeze tombstoned docs out of the postings and
    docmeta (Lucene's merge applying liveDocs), update doc_count/sum_ttf
    to the live totals (post-merge stats exclude deletions) and clear the
    tombstone generations — scores over the compacted index reflect live
    collection statistics.

    ``small_segment_mb``: MergeOnFlushMergePolicy.findFullFlushMerges
    (sandbox/index/MergeOnFlushMergePolicy.java:52-69) — per bucket,
    merge exactly the generations whose byte size is below the
    threshold, when more than one qualifies; larger generations are
    never touched, regardless of the tier scan."""
    import ray
    import ray.data

    from .state.snapshots import list_snapshots, protected_postings

    m = load_manifest(index_dir)
    T = m.config["term_parts"]
    snapshots = list_snapshots(index_dir)
    if expunge_deletes and snapshots:
        # expunge rewrites docmeta in place, which would corrupt the
        # snapshots' point-in-time view (SnapshotDeletionPolicy contract:
        # snapshotted commits must stay openable)
        raise ValueError(
            f"compact_index(expunge_deletes=True): release snapshots "
            f"{snapshots} first (state/snapshots.release_snapshot)")
    protected = protected_postings(index_dir) if snapshots else set()
    if expunge_deletes:
        # SoftDeletesRetentionMergePolicy role
        # (index/SoftDeletesRetentionMergePolicy.java:46): soft tombstone
        # generations some retention lease has not caught up past are
        # EXCLUDED from the expunge — their docs stay physically present
        # (merges keep retained soft-deleted docs) and their tombstone
        # files stay filed (readers keep hiding them from searches).
        from .state.retention import retained_soft_files
        retained = retained_soft_files(index_dir)
        deleted, delete_files = _load_deletes(
            index_dir, return_files=True, exclude=retained)
    else:
        deleted, delete_files = np.empty(0, np.int64), []
    by_bucket: dict[int, list[dict]] = {}
    for p in m.postings_parts:
        by_bucket.setdefault(int(p["tbucket"]), []).append(p)
    # merge selection (TieredMergePolicy role): without deletes, only
    # buckets holding several generations need a merge — single-
    # generation buckets keep their files untouched; with expunge, every
    # bucket could hold deleted postings, so all participate. With
    # max_merge_at_once set, the natural-merge size-tier scan picks, per
    # bucket, the largest run (>=2, <=N) of size-sorted generations whose
    # sizes stay within tier_factor of the run's smallest — big
    # generations never rewrite just to absorb small ones.
    selected: set[str] = set()
    if len(deleted):
        selected = {p["part"] for p in m.postings_parts}
    elif small_segment_mb is not None:
        # MergeOnFlush: all sub-threshold generations of a bucket merge
        # into one; the selection ignores tiering entirely
        threshold = int(small_segment_mb * 1024 * 1024)
        for parts in by_bucket.values():
            small = [p for p in parts
                     if int(p.get("bytes", 0)) < threshold]
            if len(small) >= 2:
                selected.update(p["part"] for p in small)
    else:
        for parts in by_bucket.values():
            if len(parts) < 2:
                continue
            if max_merge_at_once is None:          # forceMerge(1)
                selected.update(p["part"] for p in parts)
                continue
            cand = sorted(parts, key=lambda p: int(p.get("bytes", 0)))
            sizes = [max(int(p.get("bytes", 0)), 1) for p in cand]
            best: list[dict] = []
            for i in range(len(cand) - 1):
                j = i
                while (j + 1 < len(cand) and j + 1 - i < max_merge_at_once
                        and sizes[j + 1] <= tier_factor * sizes[i]):
                    j += 1
                if j > i and j - i + 1 > len(best):
                    best = cand[i:j + 1]
            if len(best) >= 2:
                selected.update(p["part"] for p in best)
    if not selected:
        return m
    old_files = [os.path.join(index_dir, "postings",
                              f"part={p['part']}.parquet")
                 for p in m.postings_parts if p["part"] in selected]
    kept_parts = [p for p in m.postings_parts
                  if p["part"] not in selected]

    gen = max(int(p["salt"]) for p in m.postings_parts) + 1
    pds = ray.data.read_parquet(old_files,
                                columns=[k for k, _ in POSTINGS_FIELDS])

    def key_rows(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        tb = _crc_bucket(terms, T)
        salt = np.full(len(terms), gen, dtype=np.int32)
        return batch.append_column("tbucket", pa.array(tb, pa.int32())) \
                    .append_column("salt", pa.array(salt, pa.int32()))

    if len(deleted):
        dref = ray.put(deleted)
        pds = pds.map_batches(_drop_deleted_rows, batch_format="pyarrow",
                              fn_kwargs={"dref": dref})

    (pds.map_batches(key_rows, batch_format="pyarrow")
        .groupby(["tbucket", "salt"])
        .map_groups(Merger, batch_format="pyarrow",
                    fn_constructor_args=(index_dir,),
                    concurrency=merge_concurrency or (1, 8))
        .materialize())

    new_doc_count, new_sum_ttf = m.doc_count, m.sum_ttf
    new_config = m.config
    docmeta_swaps: list[str] = []   # .tmp files applied AFTER manifest commit
    if len(deleted):
        # docmeta loses the tombstoned rows; live stats from the same scan.
        # Rewrites are staged as .tmp files and applied only after the new
        # manifest commits, mirroring the postings two-phase commit — a
        # crash before the manifest write leaves the old docmeta intact
        # and consistent with the old manifest.
        dm_dir = os.path.join(index_dir, "docmeta")
        kw_fields = m.config.get("keyword_fields") or []
        dead_docs = 0
        dead_tokens = 0
        dead_kw = 0
        for f in sorted(os.listdir(dm_dir)):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(dm_dir, f)
            t = pq.read_table(path)
            ids = t.column("doc_id").to_numpy()
            pos = np.minimum(np.searchsorted(deleted, ids),
                             len(deleted) - 1)
            dead = deleted[pos] == ids
            if not dead.any():
                continue
            dead_docs += int(dead.sum())
            dead_tokens += int(t.column("field_len").to_numpy()[dead].sum())
            if "n_overlap" in t.column_names:   # stats count overlaps too
                dead_tokens += int(
                    t.column("n_overlap").to_numpy()[dead].sum())
            for fld in kw_fields:
                if fld in t.column_names:
                    dead_kw += int(pa.compute.sum(pa.compute.and_(
                        pa.array(dead),
                        t.column(fld).combine_chunks().is_valid()
                    )).as_py() or 0)
            pq.write_table(t.filter(pa.array(~dead)), path + ".tmp")
            docmeta_swaps.append(path)
        new_doc_count = m.doc_count - dead_docs
        new_sum_ttf = m.sum_ttf - dead_tokens
        # keyword postings of dead docs left the index too; verify_index
        # subtracts this from the lineage n_kw sum
        new_config = {**m.config,
                      "expunged_kw": int(m.config.get("expunged_kw", 0))
                      + dead_kw}

    # fold lineage: the new generation's parts + untouched buckets' parts
    mlin_dir = os.path.join(index_dir, "_build", "merge_lineage")
    merge_lineage = list(kept_parts)
    kept_names = {p["part"] for p in kept_parts}
    for f in sorted(os.listdir(mlin_dir)):
        with open(os.path.join(mlin_dir, f)) as fh:
            rec = json.load(fh)
        if int(rec["salt"]) == gen:
            merge_lineage.append(rec)
        elif rec["part"] not in kept_names:
            os.remove(os.path.join(mlin_dir, f))
    manifest = IndexManifest(
        version=m.version + 1, config=new_config, boundaries=m.boundaries,
        bases=m.bases, bucket_counts=m.bucket_counts,
        doc_count=new_doc_count, sum_ttf=new_sum_ttf,
        segments=m.segments, postings_parts=merge_lineage,
        corpus_fingerprint=m.corpus_fingerprint,
    )
    save_manifest(index_dir, manifest)
    for path in docmeta_swaps:          # docmeta swap after manifest commit
        os.replace(path + ".tmp", path)
    for f in old_files:                 # old generation removed post-commit
        if os.path.basename(f) in protected:
            continue                    # pinned by a live snapshot
        try:
            os.remove(f)
        except FileNotFoundError:
            pass
    if len(deleted):
        # only the generations snapshotted at compaction start are cleared;
        # tombstones filed mid-compaction stay pending for the next run
        ddir = os.path.join(index_dir, "deletes")
        for f in delete_files:
            try:
                os.remove(os.path.join(ddir, f))
            except FileNotFoundError:
                pass
    return manifest


def repair_postings(index_dir: str) -> dict:
    """CheckIndex -exorcise role (index/CheckIndex.java:507 `exorciseIndex`
    — the reference DROPS corrupt segments, losing their documents).
    Here a corrupt MERGED postings partition is repaired LOSSLESSLY by
    re-running the merge for just that (tbucket, salt) group from the
    still-present per-segment postings files — the same recovery unit the
    resumable build uses, so nothing is lost as long as the segment files
    survive.

    Scans every committed part (parquet readability + a decode probe of
    the first posting's encoded blocks), re-merges the bad ones, and
    rewrites the manifest lineage rows. Returns
    {"checked": N, "repaired": [part, ...], "ok": bool}."""
    from .codec import decode_blocks

    m = load_manifest(index_dir)
    T = int(m.config["term_parts"])
    G = int(m.config["salt_group"])
    pdir = os.path.join(index_dir, "postings")
    n_checked = len(m.postings_parts)
    bad: list[dict] = []
    for rec in m.postings_parts:
        path = os.path.join(pdir, f"part={rec['part']}.parquet")
        try:
            t = pq.read_table(path)
            if t.num_rows:
                r0 = t.slice(0, 1)
                decode_blocks(
                    r0.column("first_doc").to_numpy(),
                    r0.column("n").to_numpy(),
                    r0.column("docs_enc").to_pylist(),
                    r0.column("tfs_enc").to_pylist(),
                    r0.column("norms_enc").to_pylist())
        except Exception:
            bad.append(rec)
    if not bad:
        return {"checked": n_checked, "repaired": [], "ok": True}

    seg_dir = os.path.join(index_dir, "segments")
    seg_files = {int(f[4:-8]): os.path.join(seg_dir, f)
                 for f in os.listdir(seg_dir) if f.endswith(".parquet")}
    mlin_dir = os.path.join(index_dir, "_build", "merge_lineage")
    repaired = []
    by_part = {r["part"]: i for i, r in enumerate(m.postings_parts)}
    for rec in bad:
        part = rec["part"]
        tb, salt = (int(x) for x in part.split("_"))
        tabs = []
        for seg, path in sorted(seg_files.items()):
            if seg // G != salt:
                continue
            t = pq.read_table(path)
            mask = _crc_bucket(t.column("term").to_pylist(), T) == tb
            if mask.any():
                tabs.append(t.filter(pa.array(mask)))
        for p in (os.path.join(pdir, f"part={part}.parquet"),
                  os.path.join(mlin_dir, f"part_{part}.json")):
            if os.path.exists(p):
                os.remove(p)
        if not tabs:
            # no surviving source rows: drop the partition outright
            # (the reference's lossy exorcise outcome)
            m.postings_parts.pop(by_part[part])
            by_part = {r["part"]: i
                       for i, r in enumerate(m.postings_parts)}
            repaired.append(part)
            continue
        group = pa.concat_tables(tabs)
        n = group.num_rows
        group = group.append_column(
            "tbucket", pa.array(np.full(n, tb, np.int32)))
        group = group.append_column(
            "salt", pa.array(np.full(n, salt, np.int32)))
        Merger(index_dir)(group)
        with open(os.path.join(mlin_dir, f"part_{part}.json")) as fh:
            m.postings_parts[by_part[part]] = json.load(fh)
        repaired.append(part)
    save_manifest(index_dir, m)
    return {"checked": n_checked, "repaired": repaired, "ok": True}


def split_index(index_dir: str, out_lo: str, out_hi: str,
                split_doc: int) -> tuple[IndexManifest, IndexManifest]:
    """Split one index into two complete standalone indexes by a docID
    predicate — the PKIndexSplitter role
    (misc/src/java/org/apache/lucene/misc/index/PKIndexSplitter.java:42;
    split() at :102-129 wraps every leaf in complementary
    DocumentFilteredLeafIndexReaders and addIndexes them). Here each side
    is a copy carrying the complementary tombstone set, then expunge
    compaction (the merge applying liveDocs) squeezes dropped docs out of
    postings/docmeta/stats — the same filter-then-merge shape, built on
    machinery that is already scale- and crash-safe. DocIDs keep their
    original values, so ``add_indexes`` can losslessly reunite the halves
    (doc ranges stay disjoint).

    ``out_lo`` gets docs with doc_id < split_doc, ``out_hi`` the rest.
    Snapshots do not transfer (a split copy starts a fresh lineage, and
    expunge refuses to run under pinned commits)."""
    import shutil

    import ray.data

    for out in (out_lo, out_hi):
        if os.path.exists(out):
            raise FileExistsError(out)
    results = []
    for out, keep_lo in ((out_lo, True), (out_hi, False)):
        shutil.copytree(index_dir, out)
        shutil.rmtree(os.path.join(out, "snapshots"), ignore_errors=True)
        shutil.rmtree(os.path.join(out, "bloom"), ignore_errors=True)
        ds = ray.data.read_parquet(os.path.join(out, "docmeta"),
                                   columns=["doc_id"])

        def drop(batch: pa.Table, lo=keep_lo) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            m = ids >= split_doc if lo else ids < split_doc
            return pa.table({"doc_id": pa.array(ids[m], pa.int64())})

        _delete_docs_stream(out, ds.map_batches(drop,
                                                batch_format="pyarrow"))
        results.append(compact_index(out, expunge_deletes=True))
    return results[0], results[1]


def multipass_split_index(index_dir: str, out_dirs: "list[str]",
                          seq: bool = False) -> "list[IndexManifest]":
    """MultiPassIndexSplitter (misc/src/java/org/apache/lucene/misc/
    index/MultiPassIndexSplitter.java:43): split one index into N
    complete standalone parts — round-robin by default (doc i goes to
    part i mod N, :66-77 "otherwise docs are assigned in a deterministic
    round-robin fashion"), or ``seq`` contiguous ranges (:64).  Each
    part is built exactly like :func:`split_index`: copy + complementary
    tombstones + expunge compaction, so docIDs keep their original
    values and ``add_indexes`` can reunite the parts."""
    import shutil

    import ray.data

    n = len(out_dirs)
    if n < 2:
        raise ValueError("need at least 2 output parts")
    for out in out_dirs:
        if os.path.exists(out):
            raise FileExistsError(out)
    if seq:
        dm = ray.data.read_parquet(os.path.join(index_dir, "docmeta"),
                                   columns=["doc_id"])
        hi = int(dm.max("doc_id"))
        per = (hi + 1 + n - 1) // n
    results = []
    for p, out in enumerate(out_dirs):
        shutil.copytree(index_dir, out)
        shutil.rmtree(os.path.join(out, "snapshots"), ignore_errors=True)
        shutil.rmtree(os.path.join(out, "bloom"), ignore_errors=True)
        ds = ray.data.read_parquet(os.path.join(out, "docmeta"),
                                   columns=["doc_id"])

        def drop(batch: pa.Table, part=p) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            if seq:
                keep = (ids // per) == part
            else:
                keep = (ids % n) == part
            return pa.table({"doc_id": pa.array(ids[~keep], pa.int64())})

        _delete_docs_stream(out, ds.map_batches(drop,
                                                batch_format="pyarrow"))
        results.append(compact_index(out, expunge_deletes=True))
    return results



# ---------------------------------------------------------------------------
# IDVersion — versioned primary-key upsert (sandbox/idversion)

def _versions_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "versions")


def pk_version_lookup(index_dir: str, keys: "list[str]"
                      ) -> "dict[str, int]":
    """PerThreadVersionPKLookup.lookup role (sandbox/idversion/
    IDVersionPostingsFormat.java:18-60 javadoc: the primary-key term
    carries a monotonic long version readable without visiting the
    doc): current version per key, absent keys omitted.

    The version store is a generation-file sidecar (like deletes/):
    each upsert appends one parquet of (key, version); a lookup prunes
    generations whose parquet max(version) statistic is below an
    already-satisfied floor — the reference's 'skip segments whose
    maxVersion is too low' optimization — then takes the per-key max
    across surviving generations."""
    vdir = _versions_dir(index_dir)
    if not os.path.isdir(vdir):
        return {}
    out: dict[str, int] = {}
    kset = set(keys)
    karr = pa.array(sorted(kset), pa.string())
    gens = sorted(f for f in os.listdir(vdir) if f.endswith(".parquet"))
    for f in reversed(gens):                  # newest first
        path = os.path.join(vdir, f)
        if len(out) == len(kset) and out:
            # every key already answered: a generation whose file-level
            # max(version) statistic cannot beat the weakest answer is
            # skipped without reading rows
            floor = min(out.values())
            md = pq.ParquetFile(path).metadata
            gmax = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(1).statistics
                if st is None or st.max is None:
                    gmax = None
                    break
                gmax = st.max if gmax is None else max(gmax, st.max)
            if gmax is not None and gmax <= floor:
                continue
        t = pq.read_table(path, filters=[("key", "in", karr)])
        for k, v in zip(t.column("key").to_pylist(),
                        t.column("version").to_pylist()):
            if k in kset and (k not in out or v > out[k]):
                out[k] = int(v)
    return out


def upsert_documents_versioned(index_dir: str, new_corpus: str,
                               key_column: str = "path",
                               version_column: str = "version",
                               **upsert_kwargs):
    """Optimistic-concurrency updateDocument — the IDVersion contract
    (sandbox/idversion; IDVersionSegmentTermsEnum.seekExact(term,
    version) refuses stale writers): an incoming row applies only when
    its version is STRICTLY greater than the key's current version;
    within one batch the highest version per key wins.  Returns
    (applied, rejected) row counts; applied rows run through the
    normal tombstone upsert and the accepted (key, version) pairs
    append as a new versions/ generation."""
    import ray  # noqa: F401

    files = sorted(
        os.path.join(new_corpus, f) for f in os.listdir(new_corpus)
        if f.endswith(".parquet")) if os.path.isdir(new_corpus) \
        else [new_corpus]
    inc = pa.concat_tables([pq.read_table(f) for f in files])
    if version_column not in inc.column_names:
        raise ValueError(f"missing {version_column} column")
    # highest version per key within the batch
    import pyarrow.compute as _pc
    idx = _pc.sort_indices(
        inc, sort_keys=[(key_column, "ascending"),
                        (version_column, "descending")])
    inc = inc.take(idx)
    keys = inc.column(key_column).to_pylist()
    keep_first = [i == 0 or keys[i] != keys[i - 1]
                  for i in range(len(keys))]
    inc = inc.filter(pa.array(keep_first))
    cur = pk_version_lookup(index_dir,
                            inc.column(key_column).to_pylist())
    vers = inc.column(version_column).to_pylist()
    ok = [cur.get(k, -(1 << 62)) < int(v)
          for k, v in zip(inc.column(key_column).to_pylist(), vers)]
    applied = inc.filter(pa.array(ok))
    rejected = inc.num_rows - applied.num_rows
    if applied.num_rows == 0:
        return 0, rejected
    import tempfile
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        pq.write_table(applied.drop_columns([version_column]),
                       os.path.join(td, "delta.parquet"))
        upsert_documents(index_dir, td, **upsert_kwargs)
    vdir = _versions_dir(index_dir)
    os.makedirs(vdir, exist_ok=True)
    gen = len([f for f in os.listdir(vdir) if f.endswith(".parquet")])
    vt = pa.table({
        "key": applied.column(key_column).cast(pa.string()),
        "version": applied.column(version_column).cast(pa.int64())})
    tmp = os.path.join(vdir, f"gen-{gen:06d}.parquet.tmp")
    pq.write_table(vt, tmp)
    os.replace(tmp, os.path.join(vdir, f"gen-{gen:06d}.parquet"))
    return applied.num_rows, rejected


def index_info(index_dir: str, top_terms: int = 10) -> dict:
    """Index overview — the Luke role (lucene/luke — Overview tab:
    segment counts, doc counts, per-field term totals, top terms by
    df) as one diagnostic dict over the manifest + dictionary Dataset.
    Distributed: the dictionary never materializes beyond the top-k."""
    from .search import IndexReader, termdict_stats_ds

    r = IndexReader(index_dir)
    kw = list(r.manifest.config.get("keyword_fields") or [])
    dd = termdict_stats_ds(index_dir, [f"{f}:" for f in kw])
    from ray.data.aggregate import Count, Sum
    agg = dd.aggregate(Count(), Sum("df"), Sum("ttf"))
    top = dd.sort(["df", "term"], descending=[True, False]) \
        .limit(top_terms).to_pandas()
    return {
        "doc_count": int(r.doc_count),
        "sum_ttf": int(r.sum_ttf),
        "n_terms": int(agg["count()"]),
        "sum_df": int(agg["sum(df)"]),
        "sum_postings_ttf": int(agg["sum(ttf)"]),
        "keyword_fields": kw,
        "n_segments": len(r.manifest.bases)
        if hasattr(r.manifest, "bases") else None,
        "top_terms": [(row["term"], int(row["df"]))
                      for _i, row in top.iterrows()],
    }
