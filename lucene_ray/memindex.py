"""MemoryIndex — the ``memory`` module's single-document in-RAM index
(``lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java:186``): add fields once, then run queries against the
one virtual document; ``search(query)`` returns the doc's score under
the searcher's default BM25Similarity or 0.0 when the query does not
match (MemoryIndex.java:1081-1123 — a single-doc collector seeded with
0.0f).

Collection statistics ARE the single document's (docCount = 1,
sumTotalTermFreq = the field's token count, every present term's
docFreq = 1), so ``avgdl = (float)(sumTTF / (double)1) = field length``
and the BM25 float32 chain runs with those stats — scores deliberately
differ from corpus-wide search, exactly as percolating a doc against a
query differs from searching an index.  Norms quantize through the
standard ``intToByte4`` path (MemoryIndex stores norms like any
segment; MemoryIndex.java:1137 NumericDocValues norms via
FieldInvertState), so the doc length inside the score is the
LENGTH_TABLE-quantized value while avgdl is exact — the same
asymmetry as the main engine.

Multi-valued fields concatenate with the analyzer's
positionIncrementGap / offsetGap (MemoryIndex.java:517-518,:625-627).
``freeze()`` (MemoryIndex.java:575 role) makes further addField calls
raise.

Ray-Data shape: percolation-style scoring over a corpus is an
actor-pool ``map_batches`` stage (the query set compiles once per
actor in ``__init__``); each row builds a MemoryIndex and scores the
compiled queries — the document side needs no shared index, so the
stage is a pure map and scales linearly.
"""

from __future__ import annotations

import numpy as np

from .analysis import tokenize, tokenize_with_offsets
from .smallfloat import int_to_byte4

_F = np.float32


class MemoryIndex:
    def __init__(self, store_offsets: bool = True):
        self.store_offsets = store_offsets
        self._fields: dict[str, dict] = {}
        self._frozen = False

    # -- construction ---------------------------------------------------

    def add_field(self, field: str, text: str, tokenize_fn=None,
                  pos_inc_gap: int = 0, offset_gap: int = 1) -> None:
        """addField (MemoryIndex.java:490): appends a value; repeated
        adds for the same field continue positions after
        ``pos_inc_gap`` and offsets after ``offset_gap``."""
        if self._frozen:
            raise RuntimeError("frozen MemoryIndex cannot be modified")
        st = self._fields.setdefault(
            field, {"terms": {}, "len": 0, "last_pos": -1,
                    "last_off": 0})
        if tokenize_fn is not None:
            # custom analyzers carry no offset information; record the
            # tokens without offsets rather than junk values
            items = [(t, None, None) for t in tokenize_fn(text)]
        elif self.store_offsets:
            toks = tokenize_with_offsets(text)
            items = [(t, s, e) for t, s, e in zip(*toks)] \
                if isinstance(toks, tuple) else toks
        else:
            items = [(t, -1, -1) for t in tokenize(text)]
        base_pos = st["last_pos"] + 1 + (pos_inc_gap if st["len"] else 0)
        base_off = st["last_off"] + (offset_gap if st["len"] else 0)
        pos = base_pos
        max_off = st["last_off"]
        for t, so, eo in items:
            d = st["terms"].setdefault(t, {"freq": 0, "pos": [],
                                           "off": []})
            d["freq"] += 1
            d["pos"].append(pos)
            if self.store_offsets and so is not None:
                d["off"].append((base_off + so, base_off + eo))
                max_off = max(max_off, base_off + eo)
            st["last_pos"] = pos
            pos += 1
            st["len"] += 1
        st["last_off"] = max_off

    def freeze(self) -> None:
        self._frozen = True

    def reset(self) -> None:
        """MemoryIndex.reset(): reuse the instance for the next doc."""
        self._fields.clear()
        if hasattr(self, "_typed"):
            self._typed = {"points": {}, "dv": {}, "vec": {}}
        self._frozen = False

    # -- reader surface -------------------------------------------------

    def fields(self) -> list[str]:
        return sorted(f for f in self._fields if self._fields[f]["len"])

    def terms(self, field: str) -> list[str]:
        st = self._fields.get(field)
        return sorted(st["terms"]) if st else []

    def term_freq(self, field: str, term: str) -> int:
        st = self._fields.get(field)
        if not st:
            return 0
        d = st["terms"].get(term)
        return d["freq"] if d else 0

    def positions(self, field: str, term: str) -> list[int]:
        st = self._fields.get(field)
        d = st["terms"].get(term) if st else None
        return list(d["pos"]) if d else []

    def offsets(self, field: str, term: str) -> list[tuple[int, int]]:
        st = self._fields.get(field)
        d = st["terms"].get(term) if st else None
        return list(d["off"]) if d else []

    def doc_length(self, field: str) -> int:
        st = self._fields.get(field)
        return st["len"] if st else 0

    def norm_byte(self, field: str) -> int:
        return int(int_to_byte4(
            np.array([self.doc_length(field)], np.int64))[0])

    # -- scoring --------------------------------------------------------

    def _clause_score(self, field: str, freq: int) -> np.float32:
        """BM25 float32 chain with this document's own collection stats
        (N = 1, df = 1, avgdl = exact length, dl = quantized) — runs
        through the engine's own bm25.scorer so the op order is the
        one verified chain."""
        if freq <= 0:
            return _F(0.0)
        from .bm25 import scorer as bm25_scorer
        sc = bm25_scorer(1, 1, self.doc_length(field))
        return sc.score(np.array([freq], np.int64),
                        np.array([self.norm_byte(field)], np.uint8))[0]

    def _phrase_freq(self, field: str, terms: list[str]) -> int:
        sets = [self.positions(field, t) for t in terms]
        if any(not s for s in sets):
            return 0
        base = set(sets[0])
        for i, s in enumerate(sets[1:], 1):
            base &= {p - i for p in s}
        return len(base)

    def search(self, clauses, field: str = "content") -> np.float32:
        """Score a query against the single document
        (MemoryIndex.java:1081): ``clauses`` is a list of
        ``("term", t)`` / ``("phrase", [t...])`` with SHOULD occur
        (BooleanQuery sum-of-matching) or ``("must", t)`` entries that
        gate the whole match.  Returns float32; 0.0 when nothing
        matches (the reference's no-match collector seed)."""
        total = np.float64(0.0)                # BooleanQuery double sum
        matched = False
        for kind, spec in clauses:
            if kind == "term":
                f = self.term_freq(field, spec)
            elif kind == "phrase":
                f = self._phrase_freq(field, list(spec))
            elif kind == "must":
                f = self.term_freq(field, spec)
                if f == 0:
                    return _F(0.0)
            else:
                raise ValueError(kind)
            if f > 0:
                matched = True
                total = total + np.float64(self._clause_score(field, f))
        return _F(total) if matched else _F(0.0)


# -- typed fields (points / doc values / kNN vectors) -------------------

def _check_frozen(mi: "MemoryIndex") -> None:
    if mi._frozen:
        raise RuntimeError("frozen MemoryIndex cannot be modified")


class TypedFields:
    """Point / docvalue / vector field surface of MemoryIndex
    (MemoryIndex.java:246 fromDocument indexes IntPoint/LongPoint/
    FloatPoint/DoublePoint multi-valued per doc, NumericDocValues etc.,
    and at most ONE KnnFloatVectorField value per field —
    TestMemoryIndex.testKnnFloatVectorOnlyOneVectorAllowed)."""


def _typed_state(mi: "MemoryIndex") -> dict:
    st = getattr(mi, "_typed", None)
    if st is None:
        st = mi._typed = {"points": {}, "dv": {}, "vec": {}}
    return st


def _add_point(mi, field: str, *values) -> None:
    _check_frozen(mi)
    _typed_state(mi)["points"].setdefault(field, []).extend(
        float(v) for v in values)


def _add_docvalue(mi, field: str, value) -> None:
    _check_frozen(mi)
    dv = _typed_state(mi)["dv"]
    if field in dv:
        raise ValueError(
            f"Only one value per field allowed for [{field}]")
    dv[field] = value


def _add_vector(mi, field: str, vec, similarity: str = "euclidean"
                ) -> None:
    _check_frozen(mi)
    vecs = _typed_state(mi)["vec"]
    if field in vecs:
        raise ValueError(
            f"Only one value per field allowed for [{field}]")
    vecs[field] = (np.asarray(vec, np.float32), similarity)


def _point_match(mi, field: str, lo: float, hi: float) -> bool:
    """True when ANY point value of the field lies in [lo, hi]
    (PointRangeQuery over the single doc)."""
    vals = _typed_state(mi)["points"].get(field)
    if not vals:
        return False
    return any(lo <= v <= hi for v in vals)


def _point_exact(mi, field: str, v: float) -> bool:
    return _point_match(mi, field, v, v)


def _point_in_set(mi, field: str, values) -> bool:
    vals = _typed_state(mi)["points"].get(field)
    if not vals:
        return False
    s = {float(v) for v in values}
    return any(v in s for v in vals)


def _vector_value(mi, field: str):
    e = _typed_state(mi)["vec"].get(field)
    return None if e is None else e[0]


def _vector_score(mi, field: str, q) -> np.float32:
    """VectorSimilarityFunction score conventions
    (index/VectorSimilarityFunction.java): EUCLIDEAN 1/(1+d²),
    DOT_PRODUCT (1+dot)/2, COSINE (1+cos)/2, MAXIMUM_INNER_PRODUCT's
    scaled sigmoid-free mapping."""
    e = _typed_state(mi)["vec"].get(field)
    if e is None:
        raise KeyError(field)
    v, sim = e
    q = np.asarray(q, np.float32)
    if sim == "euclidean":
        d2 = np.float32(np.dot((v - q).astype(np.float64),
                               (v - q).astype(np.float64)))
        return np.float32(1.0) / (np.float32(1.0) + d2)
    dot = np.float32(np.dot(v.astype(np.float64), q.astype(np.float64)))
    if sim == "dot_product":
        return np.float32((1.0 + float(dot)) / 2.0)
    if sim == "cosine":
        cos = float(dot) / float(np.linalg.norm(v) * np.linalg.norm(q))
        return np.float32((1.0 + cos) / 2.0)
    if sim == "max_inner_product":
        d = float(dot)
        return np.float32(1 / (1 - d)) if d < 0 \
            else np.float32(d + 1.0)
    raise ValueError(sim)


MemoryIndex.add_point_field = _add_point
MemoryIndex.add_docvalue = _add_docvalue
MemoryIndex.add_vector = _add_vector
MemoryIndex.point_range = _point_match
MemoryIndex.point_exact = _point_exact
MemoryIndex.point_in_set = _point_in_set
MemoryIndex.vector_value = _vector_value
MemoryIndex.vector_score = _vector_score
MemoryIndex.doc_value = lambda mi, field: \
    _typed_state(mi)["dv"].get(field)


def _add_byte_vector(mi, field: str, vec, similarity: str = "euclidean"
                     ) -> None:
    _check_frozen(mi)
    vecs = _typed_state(mi).setdefault("bvec", {})
    if field in vecs:
        raise ValueError(
            f"Only one value per field allowed for [{field}]")
    v = np.asarray(vec, np.int8)
    vecs[field] = (v, similarity)


def _byte_vector_value(mi, field: str):
    e = _typed_state(mi).get("bvec", {}).get(field)
    return None if e is None else e[0]


def _byte_vector_score(mi, field: str, q) -> np.float32:
    """Byte VectorSimilarityFunction conventions
    (index/VectorSimilarityFunction.java — byte DOT_PRODUCT scales as
    0.5 + dot / (dims * 2^15); EUCLIDEAN is 1/(1+d²) like floats)."""
    e = _typed_state(mi).get("bvec", {}).get(field)
    if e is None:
        raise KeyError(field)
    v, sim = e
    q = np.asarray(q, np.int8)
    vi = v.astype(np.int64)
    qi = q.astype(np.int64)
    if sim == "euclidean":
        d2 = int(((vi - qi) ** 2).sum())
        return np.float32(1.0) / (np.float32(1.0) + np.float32(d2))
    dot = int((vi * qi).sum())
    if sim == "dot_product":
        return np.float32(0.5 + dot / (len(v) * (1 << 15)))
    if sim == "cosine":
        cos = dot / float(np.sqrt((vi * vi).sum())
                          * np.sqrt((qi * qi).sum()))
        return np.float32((1.0 + cos) / 2.0)
    raise ValueError(sim)


MemoryIndex.add_byte_vector = _add_byte_vector
MemoryIndex.byte_vector_value = _byte_vector_value
MemoryIndex.byte_vector_score = _byte_vector_score
