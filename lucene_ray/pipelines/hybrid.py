"""Hybrid lexical + vector retrieval fused with reciprocal-rank fusion.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009): ``fused(d) = Σ_lists
1/(K + rank_d(list))`` with the standard K = 60. This is the hybrid
shape modern search stacks run on top of a Lucene-class engine: a BM25
list (bit-exact float32 chain, ``lucene_ray/bm25.py``) and an exact
cosine top-k list over the document embeddings
(``pipelines/ann.py``-style broadcast matmul), fused by rank only — so
the fusion is robust to the two lists' incomparable score scales.

Scale shape: each modality produces a bounded top-``K_EACH`` list per
query (actor-pool searchers / per-chunk partial top-k); fusion touches
only those ≤ 2·K_EACH rows per query. The docmeta lookup that aligns
index docIDs with the embedding ids is a distributed ``is_in`` filter
(broadcast candidate set), never a docmeta materialization.

``documents.doc_id`` and ``embeddings.vec_id`` are the shared document
key of the testdata (1:1); query qid pairs the text query with the
embedding ``vec_id = qid - 1`` deterministically.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

RRF_K = 60        # the constant of Cormack et al. 2009
K_EACH = 20       # per-modality candidate depth
TOP_FUSED = 10

HYBRID_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["hash", "join"]),
    (2, ["vector", "data"]),
    (3, ["customer", "key"]),
    (4, ["stream", "batch", "window"]),
]


def _bm25_lists(sf_dir: str) -> dict[int, dict[int, int]]:
    """qid → {orig doc_id → bm25 rank} for the top-K_EACH hits."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ..search import search_query_batch
    from .fulltext import index_dir_for

    idx = index_dir_for(sf_dir)
    qs = [(qid, " ".join(terms), K_EACH) for qid, terms in HYBRID_QUERIES]
    bm = (search_query_batch(idx, qs, concurrency=2)
          .select_columns(["qid", "rank", "doc_id"]).take_all())
    need = sorted({int(r["doc_id"]) for r in bm})
    needref = ray.put(np.asarray(need, dtype=np.int64))

    def pick(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("doc_id"),
                        value_set=pa.array(ray.get(needref)))
        return batch.filter(keep)

    rows = (ray.data.read_parquet(os.path.join(idx, "docmeta"),
                                  columns=["doc_id", "path"])
            .map_batches(pick, batch_format="pyarrow").take_all())
    to_orig = {int(r["doc_id"]): int(r["path"][4:12]) for r in rows}
    out: dict[int, dict[int, int]] = {qid: {} for qid, _ in HYBRID_QUERIES}
    for r in bm:
        out[int(r["qid"])][to_orig[int(r["doc_id"])]] = int(r["rank"])
    return out


def _cosine_lists(sf_dir: str) -> dict[int, dict[int, int]]:
    """qid → {doc_id → cosine rank}: broadcast query matrix, per-chunk
    partial top-K_EACH, bounded driver merge (the ann_cosine_topk
    scheme at candidate depth K_EACH)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from .ann import _batch_scores, _emb_path

    nq = len(HYBRID_QUERIES)
    t = pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", nq)])
    ids = np.asarray(t.column("vec_id").to_numpy(zero_copy_only=False))
    order = np.argsort(ids)
    q = np.stack([np.asarray(t.column("embedding")[int(i)].as_py(),
                             dtype=np.float64) for i in order])
    qref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        vids, sims = _batch_scores(batch, qm)
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            sel = np.lexsort((vids, -sims[:, j]))[:K_EACH]
            out_q.extend([j] * len(sel))
            out_v.extend(vids[sel].tolist())
            out_s.extend(sims[sel, j].tolist())
        return pa.table({"qj": pa.array(out_q, pa.int32()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    parts = (ray.data.read_parquet(_emb_path(sf_dir),
                                   columns=["vec_id", "embedding"])
             .map_batches(partial, batch_format="pyarrow").take_all())
    by_q: dict[int, list] = {}
    for r in parts:
        by_q.setdefault(int(r["qj"]), []).append(
            (int(r["vec_id"]), float(r["sim"])))
    out: dict[int, dict[int, int]] = {}
    for j, (qid, _) in enumerate(HYBRID_QUERIES):
        cand = by_q.get(j, [])
        cand.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = {v: rank for rank, (v, _) in
                    enumerate(cand[:K_EACH], 1)}
    return out


def hybrid_rrf(sf_dir: str) -> pa.Table:
    """(qid, rank, doc_id, rrf): top-10 fused hits per hybrid query,
    rrf = 1/(60 + bm25_rank) + 1/(60 + cosine_rank) over the lists the
    doc appears in, ordered (rrf desc, doc_id asc)."""
    text = _bm25_lists(sf_dir)
    vec = _cosine_lists(sf_dir)
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, _ in HYBRID_QUERIES:
        rt, rv = text.get(qid, {}), vec.get(qid, {})
        fused = []
        for d in set(rt) | set(rv):
            s = 0.0
            if d in rt:
                s += 1.0 / (RRF_K + rt[d])
            if d in rv:
                s += 1.0 / (RRF_K + rv[d])
            fused.append((d, s))
        fused.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(fused[:TOP_FUSED], 1):
            out_q.append(qid)
            out_r.append(rank)
            out_d.append(d)
            out_s.append(s)
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "rrf": pa.array(out_s, pa.float64())})


def oracle_hybrid_rrf_sql() -> str:
    from .fulltext import _bm25_chain_cte, _CORPUS_CTE, _QUANT_LEN

    clause_rows = ",\n    ".join(
        f"({qid}, {ci}, '{t}', {K_EACH})"
        for qid, terms in HYBRID_QUERIES for ci, t in enumerate(terms))
    nq = len(HYBRID_QUERIES)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
{_bm25_chain_cte(clause_rows)},
corpus_map AS (
  SELECT doc_id AS orig,
         row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d
  FROM documents
),
btop AS (
  SELECT r.qid, m.orig AS doc_id, r.rank AS rt
  FROM ranked r JOIN corpus_map m ON m.d = r.d WHERE r.rank <= {K_EACH}
),
qv AS (
  SELECT vec_id + 1 AS qid, embedding AS qe
  FROM embeddings WHERE vec_id < {nq}
),
vsims AS (
  SELECT qv.qid, e.vec_id AS doc_id,
         row_number() OVER (PARTITION BY qv.qid
           ORDER BY list_cosine_similarity(e.embedding, qv.qe) DESC,
                    e.vec_id ASC) AS rv
  FROM embeddings e CROSS JOIN qv
),
vtop AS (SELECT qid, doc_id, rv FROM vsims WHERE rv <= {K_EACH}),
fused AS (
  SELECT COALESCE(b.qid, v.qid) AS qid,
         COALESCE(b.doc_id, v.doc_id) AS doc_id,
         COALESCE(1.0 / ({RRF_K} + b.rt), 0)
           + COALESCE(1.0 / ({RRF_K} + v.rv), 0) AS rrf
  FROM btop b FULL OUTER JOIN vtop v
    ON b.qid = v.qid AND b.doc_id = v.doc_id
)
SELECT qid, rank, doc_id, rrf FROM (
  SELECT qid, doc_id, rrf, row_number() OVER (
    PARTITION BY qid ORDER BY rrf DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {TOP_FUSED}"""
