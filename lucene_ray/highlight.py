"""Passage highlighting — the UnifiedHighlighter role.

Reference: ``lucene/highlighter/src/java/org/apache/lucene/search/uhighlight/
UnifiedHighlighter.java`` with ``OffsetSource.ANALYSIS``: when offsets are
not stored in the postings, the highlighter re-analyzes the stored content
to recover match offsets, selects the best-scoring passage and tags the
matched terms. We reproduce that shape: re-tokenize with offsets
(:func:`lucene_ray.analysis.tokenize_with_offsets`), pick the passage
window with the most matches (earliest on ties), and wrap matched tokens.

Also provides stored-content retrieval: the index's docmeta carries the
doc's identity but not the text (Lucene's stored-fields row store,
``Lucene90StoredFieldsFormat.java:103``, is our *source* parquet); a doc's
content is fetched back from the corpus file recorded in segment lineage,
reading only the row group containing the row.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from .analysis import tokenize_with_offsets

DEFAULT_WINDOW = 8          # passage length in tokens
DEFAULT_LEAD = 3            # tokens of context before the first match


def retrieve_content(reader, doc_id: int) -> str:
    """Stored-content lookup via segment lineage: doc_id → (source file,
    row) through the manifest's docID bases; reads ONE parquet row group.
    Only works for arrival-mode builds (source recorded per segment)."""
    bases = np.asarray(reader.manifest.bases, dtype=np.int64)
    seg = int(np.searchsorted(bases, doc_id, side="right") - 1)
    rec = next((s for s in reader.manifest.segments
                if int(s["seg"]) == seg), None)
    if rec is None or not rec.get("source"):
        raise ValueError("no stored-content source for segment "
                         f"{seg} (key-mode build?)")
    row = int(doc_id - bases[seg])
    pf = pq.ParquetFile(rec["source"])
    off = 0
    for g in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(g).num_rows
        if row < off + n:
            t = pf.read_row_group(g, columns=["content"])
            return t.column("content")[row - off].as_py() or ""
        off += n
    raise KeyError(f"doc {doc_id}: row {row} beyond source file")


def highlight(text: str, query_terms: list[str],
              window: int = DEFAULT_WINDOW, lead: int = DEFAULT_LEAD,
              pre: str = "<b>", post: str = "</b>",
              anchor: str = "best") -> tuple[str, int, int]:
    """Passage snippet of ``text`` for ``query_terms``.

    anchor="best": passage starts ``lead`` tokens before the first match
    of the window with the most matches (earliest on ties — the Passage
    scoring role of uhighlight.PassageScorer reduced to match counts).
    anchor="first": passage anchors at the doc's first match (the
    deterministic variant the SQL oracle reproduces). Returns
    (snippet, n_matches_in_doc, first_match_offset); ("", 0, -1) when
    nothing matches."""
    toks, starts, ends = tokenize_with_offsets(text)
    if not toks:
        return "", 0, -1
    qset = set(query_terms)
    hit = np.array([t in qset for t in toks], dtype=bool)
    n_matches = int(hit.sum())
    if n_matches == 0:
        return "", 0, -1
    n = len(toks)
    w = min(window, n)
    if anchor == "first":
        anchor_tok = int(np.argmax(hit))
    else:
        counts = np.convolve(hit.astype(np.int64), np.ones(w, np.int64),
                             mode="valid")
        best_start = int(np.argmax(counts))       # earliest max window
        anchor_tok = best_start + int(
            np.argmax(hit[best_start:best_start + w]))
    s_tok = max(0, anchor_tok - lead)
    e_tok = min(n, s_tok + w)
    s_char = int(starts[s_tok])
    e_char = int(ends[e_tok - 1])
    # insert tags back-to-front so offsets stay valid
    out = text[s_char:e_char]
    for i in range(e_tok - 1, s_tok - 1, -1):
        if hit[i]:
            a = int(starts[i]) - s_char
            b = int(ends[i]) - s_char
            out = out[:a] + pre + out[a:b] + post + out[b:]
    first_off = int(starts[int(np.argmax(hit))])
    return out, n_matches, first_off


def highlight_stored(text: str, starts: np.ndarray, ends: np.ndarray,
                     match_pos: np.ndarray,
                     window: int = DEFAULT_WINDOW, lead: int = DEFAULT_LEAD,
                     pre: str = "<b>", post: str = "</b>"
                     ) -> tuple[str, int, int]:
    """Offsets-mode passage snippet (UnifiedHighlighter POSTINGS /
    TERM_VECTORS offset sources, uhighlight/FieldOffsetStrategy.java):
    match POSITIONS come from the positional postings and character
    offsets from the index's stored offset payload — ``text`` is only
    sliced, never re-analyzed. First-match anchored window, same output
    contract as :func:`highlight` with anchor="first"."""
    n = len(starts)
    if n == 0 or len(match_pos) == 0:
        return "", 0, -1
    first = int(match_pos[0])
    w = min(window, n)
    s_tok = max(0, first - lead)
    e_tok = min(n, s_tok + w)
    s_char = int(starts[s_tok])
    e_char = int(ends[e_tok - 1])
    out = text[s_char:e_char]
    mset = set(int(p) for p in match_pos)
    for i in range(e_tok - 1, s_tok - 1, -1):
        if i in mset:
            a = int(starts[i]) - s_char
            b = int(ends[i]) - s_char
            out = out[:a] + pre + out[a:b] + post + out[b:]
    return out, int(len(match_pos)), int(starts[first])
