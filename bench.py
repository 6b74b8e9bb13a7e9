#!/usr/bin/env python
"""Benchmark harness: index-build throughput + BM25 query latency.

Prints ONE JSON line:
  {"metric": "index_build_sec", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

- Headline: end-to-end inverted-index build (read → tokenize → segment →
  merge → manifest) over a deterministic synthetic source-code corpus
  (size via $BENCH_DOCS, default 60000), plus the documents-derived index
  of $GRAFT_SF_DIR for correctness-scale query latency.
- Queries: a derived reference query set (heavy/medium/rare/mixed terms);
  reports per-query seconds, p50/p99, and the top-k rank-identity rate vs
  the brute-force oracle (must be 1.0).
- --scaling: runs the same job in fresh processes at two parallelism
  levels (default num_cpus=2 vs 8 — this host's cgroup quota saturates
  near 8-11 effective cores, see BASELINE.md) and reports throughput
  scaling efficiency (the sandbox stand-in for N vs 4N nodes),
  min-of-3 per leg with alternating legs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# dodge the Ray 2.49.2 actor-teardown deadlock (see CLAUDE.md "Known
# flake"): disable the idle-worker reaper for sessions this script owns
os.environ.setdefault("RAY_kill_idle_workers_interval_ms", "0")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "60000"))


def build_query_set(reader, n=40):
    """Derive a deterministic query mix from the term dictionary."""
    import numpy as np

    from lucene_ray.search import termdict_terms

    td = termdict_terms(reader)
    terms = td.column("term").to_pylist()
    df = td.column("df").to_numpy()
    order = np.lexsort((np.array(terms), -df))
    heavy = [terms[i] for i in order[:10]]
    mid = [terms[i] for i in order[len(order) // 4:len(order) // 4 + 10]]
    rare = [terms[i] for i in order[-10:]]
    qs = []
    qid = 0
    for t in heavy[:5] + mid[:5] + rare[:5]:
        qid += 1
        qs.append((qid, t, 10))
    for i in range(5):
        qid += 1
        qs.append((qid, f"{heavy[i]} {rare[i]}", 10))
    for i in range(5):
        qid += 1
        qs.append((qid, f"{heavy[i]} {mid[i]} {mid[(i + 5) % 10]}", 10))
    for i in range(5):
        qid += 1
        qs.append((qid, " ".join(heavy[i:i + 4]), 10))
    for i in range(5):
        qid += 1
        qs.append((qid, f"{mid[i]} {rare[(i + 5) % 10]} zzabsent", 100))
    return qs[:n]


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import numpy as np
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from lucene_ray.build import build_index
    from lucene_ray.corpus import write_synthetic_corpus
    from lucene_ray.search import (IndexReader, search_blockmax,
                                   search_bruteforce)

    # --- corpus (cached; generation excluded from timing) ---
    corpus_dir = f"/tmp/lucene_ray_bench/corpus_{BENCH_DOCS}"
    write_synthetic_corpus(corpus_dir, BENCH_DOCS, seed=42, n_shards=32)
    # warm the page cache AND the worker pool (workers import lucene_ray +
    # numpy once; process startup is expensive in this sandbox) with an
    # untimed mini-build, so the timed run measures steady-state throughput
    ray.data.read_parquet(corpus_dir).count()
    warm_dir = "/tmp/lucene_ray_bench/warm_idx"
    shutil.rmtree(warm_dir, ignore_errors=True)
    warm_corpus = "/tmp/lucene_ray_bench/warm_corpus"
    write_synthetic_corpus(warm_corpus, 256, seed=1, n_shards=32)
    build_index(warm_corpus, warm_dir, num_buckets=64)

    # --- timed index build ---
    idx_dir = f"/tmp/lucene_ray_bench/idx_{NUM_CPUS}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    manifest = build_index(corpus_dir, idx_dir)
    build_sec = time.time() - t0
    content_mb = sum(s["content_bytes"] for s in manifest.segments) / 1e6
    n_postings = sum(s["n_postings"] for s in manifest.segments)

    # --- query latency (warm reader) + rank-identity vs oracle ---
    reader = IndexReader(idx_dir)
    qs = build_query_set(reader)
    # warm postings cache
    for _, q, k in qs:
        search_blockmax(reader, q, k)
    times = {}
    identical = 0
    blocks_decoded = blocks_total = 0
    for qid, q, k in qs:
        t1 = time.time()
        td = search_blockmax(reader, q, k)
        times[f"q{qid}"] = round(time.time() - t1, 6)
        oracle = search_bruteforce(reader, q, k)
        if (td.doc_ids.tolist() == oracle.doc_ids.tolist()
                and td.scores.tolist() == oracle.scores.tolist()):
            identical += 1
        blocks_decoded += td.blocks_decoded
        blocks_total += td.blocks_total
    lat = sorted(times.values())
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]

    # --- GRAFT_SF_DIR documents-derived pipeline (the oracle-checked
    # flagship): build + reference query set timing at the testdata scale
    sf_build_sec = sf_query_sec = -1.0
    try:
        from lucene_ray.pipelines import fulltext as ft

        t2 = time.time()
        ft.index_dir_for(SF_DIR)
        sf_build_sec = round(time.time() - t2, 3)
        t3 = time.time()
        res = ft.ft_bm25_top10(SF_DIR)      # pa.Table since the
        if hasattr(res, "materialize"):     # typed-schema hardening
            res.materialize()
        sf_query_sec = round(time.time() - t3, 3)
    except Exception:
        pass

    ray.shutdown()
    return {
        "metric": "index_build_sec",
        "value": round(build_sec, 3),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": BENCH_DOCS,
        "docs_per_sec": round(manifest.doc_count / build_sec, 1),
        "content_mb_per_sec": round(content_mb / build_sec, 2),
        "n_postings": int(n_postings),
        "query_p50_s": p50,
        "query_p99_s": p99,
        "rank_identity_rate": identical / len(qs),
        "block_skip_ratio": round(1 - blocks_decoded / max(blocks_total, 1),
                                  4),
        "sf_dir_build_sec": sf_build_sec,
        "sf_dir_queryset_sec": sf_query_sec,
    }


def run_scaling() -> dict:
    """N-vs-4N parallelism scaling, noise-hardened.

    This sandbox's wall-clock throughput varies ~2x minute-to-minute
    (shared host), so a single run per leg is meaningless. We alternate
    legs (lo, hi, lo, hi, ...) to decorrelate machine drift and take the
    MIN time per leg (the least-contended observation of each
    configuration); all raw runs are reported for transparency.
    """

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # the criterion measures the amortized regime: at 60k docs the
        # job's ~8% fixed cost (plan/barriers/actor spin-up/merge tail)
        # Amdahl-caps 4x efficiency near 0.78 regardless of code
        # (BASELINE.md round-4); 120k is the smallest size where the
        # parallel fraction dominates, matching the round-1 protocol
        env.setdefault("BENCH_DOCS", "120000")
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True
                             ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # NB: this sandbox advertises 32 CPUs but its cgroup quota saturates at
    # ~8-11 effective cores (measured: num_cpus=8 and num_cpus=32 legs run
    # at identical wall time; see BASELINE.md). The N-vs-4N comparison must
    # therefore sit inside real capacity: lo=2, hi=8 by default. Never use
    # lo=1: the merge actor pool (min 1 actor) takes the only CPU slot and
    # the leg deadlocks.
    lo = int(os.environ.get("SCALING_LO", "2"))
    hi = int(os.environ.get("SCALING_HI", "8"))
    reps = int(os.environ.get("SCALING_REPS", "3"))
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    t_lo = min(r["value"] for r in runs_lo)
    t_hi = min(r["value"] for r in runs_hi)
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "runs_sec_lo": [r["value"] for r in runs_lo],
        "runs_sec_hi": [r["value"] for r in runs_hi],
        "docs_per_sec_lo": max(r["docs_per_sec"] for r in runs_lo),
        "docs_per_sec_hi": max(r["docs_per_sec"] for r in runs_hi),
        "bench_docs": runs_lo[0]["bench_docs"],
        "rank_identity_rate": min(r["rank_identity_rate"]
                                  for r in runs_lo + runs_hi),
    }


def run_dedup() -> dict:
    """Near-dup dedup throughput over a synthetic documents table with
    planted near-duplicates ($BENCH_DEDUP_DOCS, default 200k): MinHash-LSH
    end to end (banding → candidates → distributed exact-Jaccard verify),
    exact dedup, and the map-only simhash — docs/s each."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    from lucene_ray.corpus import write_synthetic_documents
    from lucene_ray.pipelines.dedup import (dedup_exact, dedup_minhash_lsh,
                                            dedup_simhash)

    n = int(os.environ.get("BENCH_DEDUP_DOCS", "200000"))
    d = f"/tmp/lucene_ray_bench/docs_{n}"
    write_synthetic_documents(os.path.join(d, "documents.parquet"), n,
                              n_shards=32)
    t0 = time.time()
    n_pairs = dedup_minhash_lsh(d).count()
    t_minhash = time.time() - t0
    t1 = time.time()
    n_uniq = dedup_exact(d).count()
    t_exact = time.time() - t1
    t2 = time.time()
    dedup_simhash(d).count()
    t_simhash = time.time() - t2
    from lucene_ray.pipelines.dedup import dup_ngram_stats
    t3 = time.time()
    n_dupgram = dup_ngram_stats(d).count()
    t_dupgram = time.time() - t3
    ray.shutdown()
    return {
        "metric": "dedup_minhash_sec",
        "value": round(t_minhash, 3),
        "unit": "sec",
        "n_docs": n,
        "num_cpus": NUM_CPUS,
        "minhash_docs_per_sec": round(n / t_minhash, 1),
        "minhash_pairs": int(n_pairs),
        "exact_sec": round(t_exact, 3),
        "exact_docs_per_sec": round(n / t_exact, 1),
        "exact_unique_docs": int(n_uniq),
        "simhash_sec": round(t_simhash, 3),
        "simhash_docs_per_sec": round(n / t_simhash, 1),
        "dupgram_sec": round(t_dupgram, 3),
        "dupgram_docs_per_sec": round(n / t_dupgram, 1),
        "dupgram_rows": int(n_dupgram),
    }


def run_curate() -> dict:
    """Curation-stack throughput over the synthetic documents table
    ($BENCH_CURATE_DOCS, default 200k) and a synthetic embeddings table
    ($BENCH_CURATE_VECS, default 200k x 64): unigram-LM scoring,
    blocklist screening, the fused corpus_clean verdict, token-budget
    packing, and full-corpus k-means — docs/s (or vecs/s) each."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    from lucene_ray.corpus import (write_synthetic_documents,
                                   write_synthetic_embeddings)
    from lucene_ray.pipelines.ann import kmeans_embeddings
    from lucene_ray.pipelines.textstats import (corpus_clean,
                                                doc_blocklist,
                                                doc_lm_logprob,
                                                pack_token_budget)

    n = int(os.environ.get("BENCH_CURATE_DOCS", "200000"))
    nv = int(os.environ.get("BENCH_CURATE_VECS", "200000"))
    d = f"/tmp/lucene_ray_bench/docs_{n}"
    write_synthetic_documents(os.path.join(d, "documents.parquet"), n,
                              n_shards=32)
    write_synthetic_embeddings(os.path.join(d, "embeddings.parquet"), nv,
                               n_shards=32)
    out = {"metric": "curate_lm_sec", "unit": "sec", "n_docs": n,
           "n_vecs": nv, "num_cpus": NUM_CPUS}
    t0 = time.time()
    n_lm = doc_lm_logprob(d).count()
    out["value"] = round(time.time() - t0, 3)
    out["lm_docs_per_sec"] = round(n_lm / out["value"], 1)
    t1 = time.time()
    doc_blocklist(d).count()
    out["blocklist_sec"] = round(time.time() - t1, 3)
    out["blocklist_docs_per_sec"] = round(n / out["blocklist_sec"], 1)
    t2 = time.time()
    corpus_clean(d).count()
    out["clean_sec"] = round(time.time() - t2, 3)
    out["clean_docs_per_sec"] = round(n / out["clean_sec"], 1)
    t3 = time.time()
    pack_token_budget(d).count()
    out["pack_sec"] = round(time.time() - t3, 3)
    out["pack_docs_per_sec"] = round(n / out["pack_sec"], 1)
    t4 = time.time()
    kmeans_embeddings(d).count()
    out["kmeans_sec"] = round(time.time() - t4, 3)
    out["kmeans_vecs_per_sec"] = round(nv / out["kmeans_sec"], 1)
    from lucene_ray.pipelines.textstats import (chunk_documents,
                                                redact_pii)
    t42 = time.time()
    redact_pii(d).count()
    out["redact_sec"] = round(time.time() - t42, 3)
    out["redact_docs_per_sec"] = round(n / out["redact_sec"], 1)
    t43 = time.time()
    n_chunks = chunk_documents(d).count()
    out["chunk_sec"] = round(time.time() - t43, 3)
    out["chunk_docs_per_sec"] = round(n / out["chunk_sec"], 1)
    out["n_chunks"] = n_chunks
    from lucene_ray.pipelines.classify import classify_naive_bayes
    t45 = time.time()
    classify_naive_bayes(d).count()
    out["classify_sec"] = round(time.time() - t45, 3)
    out["classify_docs_per_sec"] = round(n / out["classify_sec"], 1)
    from lucene_ray.pipelines.ann import semdedup
    # the SemDeDup paper's rule: k grows with N so clusters stay
    # worker-sized — target ~5k vectors per cluster here. threshold
    # 0.95: within-blob cosine on this synthetic table is ~0.9, so 0.95
    # keeps a real mix (the default 0.5 drops everything in a blob —
    # degenerate, and the early-exit prune would make it look free)
    sd_k = max(8, nv // 5000)
    t5 = time.time()
    sd = semdedup(d, k=sd_k, threshold=0.95)
    import pyarrow.compute as _pc
    n_kept = sum(_pc.sum(b.column("keep")).as_py() or 0
                 for b in sd.iter_batches(batch_format="pyarrow"))
    out["semdedup_sec"] = round(time.time() - t5, 3)
    out["semdedup_k"] = sd_k
    out["semdedup_kept_frac"] = round(n_kept / nv, 4)
    out["semdedup_vecs_per_sec"] = round(nv / out["semdedup_sec"], 1)
    # third-session additions
    from lucene_ray.pipelines.ann import _pq_dir
    from lucene_ray.pipelines.dedup import dedup_exact_best
    from lucene_ray.pipelines.textstats import corpus_sample_quota
    t6 = time.time()
    corpus_sample_quota(d)
    out["quota_sec"] = round(time.time() - t6, 3)
    out["quota_docs_per_sec"] = round(n / out["quota_sec"], 1)
    t7 = time.time()
    dedup_exact_best(d).count()
    out["prefix_dedup_sec"] = round(time.time() - t7, 3)
    out["prefix_dedup_docs_per_sec"] = round(n / out["prefix_dedup_sec"],
                                             1)
    # measure the COLD build: a prior run's persisted PQ index (and the
    # in-process memo) would otherwise make this a 0-second cache hit
    import shutil as _sh
    from lucene_ray.pipelines.ann import _PQ_CACHE, pq_index_path
    _sh.rmtree(pq_index_path(d), ignore_errors=True)
    _PQ_CACHE.clear()
    t8 = time.time()
    _pq_dir(d)                      # train codebooks + encode all codes
    out["pq_encode_sec"] = round(time.time() - t8, 3)
    out["pq_encode_vecs_per_sec"] = round(
        nv / max(out["pq_encode_sec"], 1e-3), 1)
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--dedup" in sys.argv:
        print(json.dumps(run_dedup()))
    elif "--curate" in sys.argv:
        print(json.dumps(run_curate()))
    else:
        print(json.dumps(run_bench()))
