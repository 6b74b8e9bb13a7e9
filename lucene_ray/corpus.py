"""Corpus sources for the index engine.

The engine indexes a Parquet table of source-code repositories with columns
``(repo:string, path:string, commit:string, lang:string, content:string)``
(BASELINE.json input_hint). Two deterministic sources:

- :func:`corpus_from_documents` — derives a corpus of exactly that shape from
  the driver-provided ``documents`` table (sf testdata), 1:1 row mapping, so
  DuckDB oracle SQL over ``documents`` stays applicable.
- :func:`generate_corpus` / :func:`write_synthetic_corpus` — a seeded
  synthetic source-code generator (FIXTURES.md §1): ~5k-identifier Zipf
  vocabulary, language keywords, tokenizer edge cases, duplicated contents —
  the role of the reference's LineFileDocs/EnwikiContentSource test feeds
  (``test-framework/.../util/LineFileDocs.java:61``,
  ``benchmark/.../feeds/EnwikiContentSource.java:50``).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.string()),
])


def corpus_from_documents(sf_dir: str):
    """documents.parquet → corpus Dataset with the input_hint schema.

    repo=source, path=f"doc_{doc_id:08d}.txt", commit=sha256(text)[:40],
    lang=lang, content=text. Deterministic and 1:1 with the documents table.
    """
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text", "lang", "source"])

    def to_corpus(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        commits = [hashlib.sha256(("" if t is None else t).encode()).hexdigest()[:40]
                   for t in texts]
        return pa.table({
            "repo": batch.column("source"),
            "path": pa.array([f"doc_{i:08d}.txt" for i in ids]),
            "commit": pa.array(commits),
            "lang": batch.column("lang"),
            "content": batch.column("text"),
        })

    return ds.map_batches(to_corpus, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Synthetic source-code corpus (deterministic, seeded)

_KEYWORDS = {
    "java": ["public", "class", "void", "static", "return", "import", "new",
             "int", "final", "if", "else", "for", "while", "try", "catch"],
    "py": ["def", "return", "import", "from", "class", "if", "else", "for",
           "in", "while", "try", "except", "with", "as", "lambda"],
    "js": ["function", "const", "let", "var", "return", "if", "else", "for",
           "while", "async", "await", "export", "import", "new", "class"],
    "go": ["func", "package", "import", "return", "var", "const", "if",
           "else", "for", "range", "type", "struct", "interface", "defer"],
    "c": ["int", "char", "void", "return", "if", "else", "for", "while",
          "struct", "static", "const", "sizeof", "include", "define"],
}
_LANGS = list(_KEYWORDS)

_EDGE_SNIPPETS = [
    "foo_bar foo.bar 3.14 a1b2",                   # ExtendNumLet + mid joins
    "O'Reilly don't A:B_A:B 1,234.56",
    "x" * 300,                                      # max-token-length split
    "héllo wörld _private __dunder__",
    "... !!! ??? ;;;",                              # punctuation only
    "",                                             # empty file
]


def _vocab(rng: np.random.Generator, size: int = 5000) -> list[str]:
    syll = ["get", "set", "run", "buf", "idx", "tmp", "val", "ptr", "ctx",
            "cfg", "len", "str", "num", "obj", "arr", "map", "key", "node",
            "list", "data", "item", "util", "file", "path", "line", "word"]
    out = []
    for i in range(size):
        k = 1 + (i % 3)
        parts = [syll[int(rng.integers(len(syll)))] for _ in range(k)]
        name = parts[0] + "".join(p.title() for p in parts[1:])
        if i % 7 == 0:
            name = parts[0] + "_" + "_".join(parts[1:]) if k > 1 else name + "_v"
        if i % 11 == 0:
            name += str(int(rng.integers(100)))
        out.append(name)
    return out


def generate_corpus(n_docs: int, seed: int = 42, shard: int = 0,
                    n_shards: int = 1) -> pa.Table:
    """Generate shard ``shard`` of a deterministic n_docs corpus.

    Sharding is by doc index stride so any shard can be generated
    independently (the parallel-generation hook for Ray tasks).
    """
    rng = np.random.default_rng(seed)           # vocab must not depend on shard
    vocab = np.array(_vocab(rng), dtype=object)
    # Zipf(s≈1.1) ranks over the vocab → heavy-hitter identifiers exist
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    doc_ids = range(shard, n_docs, n_shards)
    for d in doc_ids:
        r = np.random.default_rng((seed << 20) ^ d)  # per-doc determinism
        lang = _LANGS[d % len(_LANGS)]
        n_tokens = int(r.integers(50, 900))
        words = vocab[r.choice(len(vocab), size=n_tokens, p=probs)]
        kw = _KEYWORDS[lang]
        kw_idx = r.integers(0, len(kw), size=max(1, n_tokens // 5))
        body = []
        ki = 0
        for i, w in enumerate(words):
            if i % 5 == 0 and ki < len(kw_idx):
                body.append(kw[int(kw_idx[ki])])
                ki += 1
            body.append(w)
            if i % 9 == 0:
                body.append(str(int(r.integers(0, 10000))))
        content = " ".join(body)
        if d % 97 == 0:
            content = _EDGE_SNIPPETS[(d // 97) % len(_EDGE_SNIPPETS)]
        if d % 53 == 0 and d > 0:
            # duplicate content of a neighboring doc (same sha, different doc)
            rdup = np.random.default_rng((seed << 20) ^ (d - 1))
            ldup = _LANGS[(d - 1) % len(_LANGS)]
            ndup = int(rdup.integers(50, 900))
            wdup = vocab[rdup.choice(len(vocab), size=ndup, p=probs)]
            kwd = _KEYWORDS[ldup]
            kid = rdup.integers(0, len(kwd), size=max(1, ndup // 5))
            bd, kj = [], 0
            for i, w in enumerate(wdup):
                if i % 5 == 0 and kj < len(kid):
                    bd.append(kwd[int(kid[kj])])
                    kj += 1
                bd.append(w)
                if i % 9 == 0:
                    bd.append(str(int(rdup.integers(0, 10000))))
            content = " ".join(bd)
        repo = f"org{d % 211:04d}/proj{(d // 211) % 97}"
        path = f"src/mod{d % 13}/File{d:07d}.{lang}"
        commit = hashlib.sha256(f"{seed}:{d}".encode()).hexdigest()[:40]
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(commit)
        rows["lang"].append(lang)
        rows["content"].append(content)
    return pa.table(rows, schema=CORPUS_SCHEMA)


def write_synthetic_corpus(out_dir: str, n_docs: int, seed: int = 42,
                           n_shards: int = 8) -> str:
    """Materialize the synthetic corpus to Parquet via parallel Ray tasks
    (one shard per task), skipping shards that already exist (resumable)."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    done = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
    todo = [s for s in range(n_shards)
            if f"shard_{s:04d}.parquet" not in done]
    if todo:
        def gen(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq
            ns = []
            for s in batch.column("shard").to_pylist():
                t = generate_corpus(n_docs, seed, s, n_shards)
                tmp = os.path.join(out_dir, f".shard_{s:04d}.tmp")
                _pq.write_table(t, tmp)
                os.replace(tmp, os.path.join(out_dir,
                                             f"shard_{s:04d}.parquet"))
                ns.append(t.num_rows)
            return pa.table({"shard": batch.column("shard"),
                             "rows": pa.array(ns, pa.int64())})
        (ray.data.from_items([{"shard": s} for s in todo])
         .repartition(len(todo))
         .map_batches(gen, batch_format="pyarrow", batch_size=1)
         .materialize())
    return out_dir


_DOCWORDS = None


def _doc_vocab() -> list[str]:
    global _DOCWORDS
    if _DOCWORDS is None:
        rng = np.random.default_rng(1234)
        _DOCWORDS = ["".join(chr(97 + c) for c in rng.integers(0, 26, 6))
                     for _ in range(2000)]
    return _DOCWORDS


def write_synthetic_documents(out_dir: str, n_docs: int, seed: int = 11,
                              n_shards: int = 32,
                              dup_rate: float = 0.05) -> str:
    """documents-table-shaped synthetic corpus (doc_id, text, lang,
    source, n_chars) with planted near-duplicates: with probability
    ``dup_rate`` a doc copies an earlier doc of its shard with one word
    replaced (a guaranteed high-Jaccard pair). Parallel per-shard tasks,
    resumable; used by the dedup benchmarks."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    done = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
    todo = [s for s in range(n_shards)
            if f"shard_{s:04d}.parquet" not in done]
    if not todo:
        return out_dir
    per = -(-n_docs // n_shards)
    vocab = _doc_vocab()

    def gen(batch: pa.Table) -> pa.Table:
        for s in batch.column("shard").to_pylist():
            lo = s * per
            hi = min(lo + per, n_docs)
            if hi <= lo:
                continue
            rng = np.random.default_rng(seed * 7919 + s)
            texts: list[str] = []
            for i in range(hi - lo):
                if texts and rng.random() < dup_rate:
                    src = texts[int(rng.integers(0, len(texts)))]
                    words = src.split()
                    words[int(rng.integers(0, len(words)))] = \
                        vocab[int(rng.integers(0, len(vocab)))]
                    texts.append(" ".join(words))
                else:
                    nw = int(rng.integers(30, 60))
                    idx = rng.integers(0, len(vocab), nw)
                    texts.append(" ".join(vocab[j] for j in idx))
            t = pa.table({
                "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [("en", "de", "fr", "es", "zh")[j % 5]
                     for j in range(lo, hi)], pa.string()),
                "source": pa.array([f"src{s % 8}"] * (hi - lo),
                                   pa.string()),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            })
            path = os.path.join(out_dir, f"shard_{s:04d}.parquet")
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
        return pa.table({"ok": pa.array([1] * batch.num_rows)})

    (ray.data.from_items([{"shard": s} for s in todo])
     .repartition(len(todo))
     .map_batches(gen, batch_format="pyarrow", batch_size=1)
     .materialize())
    return out_dir


def corpus_from_files(root: str, lang_by_ext: dict | None = None):
    """Directory of source files → corpus Dataset — the demo/IndexFiles
    walk (``demo/src/java/org/apache/lucene/demo/IndexFiles.java:206-274``:
    path → StringField, contents → TextField) as a Ray source:
    ``read_binary_files`` streams the tree, one corpus row per file.
    repo = the root directory name, commit = sha256(bytes)[:40] (content
    addressing stands in for VCS metadata), lang = extension."""
    import ray.data

    root = os.path.abspath(root)
    lang_by_ext = lang_by_ext or {}
    ds = ray.data.read_binary_files(root, include_paths=True)

    def to_rows(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        rows = {k: [] for k in ("repo", "path", "commit", "lang",
                                "content")}
        repo = os.path.basename(root.rstrip("/"))
        for p, b in zip(paths, blobs):
            rel = os.path.relpath(p, root)
            ext = os.path.splitext(p)[1].lstrip(".").lower()
            try:
                text = b.decode("utf-8")
            except UnicodeDecodeError:
                text = b.decode("utf-8", errors="replace")
            rows["repo"].append(repo)
            rows["path"].append(rel)
            rows["commit"].append(
                hashlib.sha256(b).hexdigest()[:40])
            rows["lang"].append(lang_by_ext.get(ext, ext or "txt"))
            rows["content"].append(text)
        return pa.table(rows, schema=CORPUS_SCHEMA)

    return ds.map_batches(to_rows, batch_format="pyarrow")


def corpus_from_line_file(path: str, repo: str = "linefile",
                          lang: str = "txt"):
    """One document per line — the LineFileDocs benchmark feed
    (``test-framework/.../util/LineFileDocs.java:61``) as a Ray text
    source; doc key = line number."""
    import ray.data

    ds = ray.data.read_text(path)

    def to_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "repo": pa.array([repo] * len(texts)),
            "path": pa.array([
                f"line_{hashlib.sha256((t or '').encode()).hexdigest()[:16]}.txt"
                for t in texts]),
            "commit": pa.array([
                hashlib.sha256((t or "").encode()).hexdigest()[:40]
                for t in texts]),
            "lang": pa.array([lang] * len(texts)),
            "content": pa.array(texts, pa.string()),
        }, schema=CORPUS_SCHEMA)

    return ds.map_batches(to_rows, batch_format="pyarrow")


def write_synthetic_embeddings(out_dir: str, n_vecs: int, dim: int = 64,
                               seed: int = 17, n_shards: int = 32) -> str:
    """embeddings-table-shaped synthetic vectors (vec_id, embedding,
    label) drawn around 8 gaussian cluster centers so k-means has real
    structure to find. Parallel per-shard tasks, resumable; used by the
    curation benchmarks."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    done = {f for f in os.listdir(out_dir) if f.endswith(".parquet")}
    todo = [s for s in range(n_shards)
            if f"shard_{s:04d}.parquet" not in done]
    if not todo:
        return out_dir
    per = -(-n_vecs // n_shards)
    centers = np.random.default_rng(seed).normal(size=(8, dim)) * 3.0

    def gen(batch: pa.Table) -> pa.Table:
        for s in batch.column("shard").to_pylist():
            lo = s * per
            hi = min(lo + per, n_vecs)
            if hi <= lo:
                continue
            rng = np.random.default_rng(seed * 104729 + s)
            lab = rng.integers(0, len(centers), hi - lo)
            v = (centers[lab]
                 + rng.normal(size=(hi - lo, dim))).astype(np.float32)
            t = pa.table({
                "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.reshape(-1), pa.float32()), dim).cast(
                        pa.list_(pa.float32())),
                "label": pa.array(lab.astype(np.int32)),
            })
            path = os.path.join(out_dir, f"shard_{s:04d}.parquet")
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
        return pa.table({"ok": pa.array([1] * batch.num_rows)})

    (ray.data.from_items([{"shard": s} for s in todo])
     .repartition(len(todo))
     .map_batches(gen, batch_format="pyarrow", batch_size=1)
     .materialize())
    return out_dir


def line_docs_corpus(path: str, repo: str = "linedocs"):
    """LineDocSource format (benchmark/src/java/.../feeds/
    LineDocSource.java:47 — one document per line, ``title <TAB> date
    <TAB> body``, the WriteLineDocTask output): a Ray Dataset in the
    corpus schema.  The title+body become the content; the date string
    rides in the commit column; malformed lines (fewer than 3 fields)
    raise like the reference's parser."""
    import ray.data

    def parse(row_batch: pa.Table) -> pa.Table:
        texts = row_batch.column("text").to_pylist()
        repos, paths, commits, langs, contents = [], [], [], [], []
        for i, line in enumerate(texts):
            parts = line.split("\t", 2)
            if len(parts) < 3:
                raise ValueError(f"malformed line doc: {line[:50]!r}")
            title, date, body = parts
            repos.append(repo)
            paths.append(f"line_{i:08d}.txt")
            commits.append(date)
            langs.append("en")
            contents.append(f"{title} {body}")
        return pa.table({
            "repo": pa.array(repos), "path": pa.array(paths),
            "commit": pa.array(commits), "lang": pa.array(langs),
            "content": pa.array(contents)})

    return ray.data.read_text(path).map_batches(
        parse, batch_format="pyarrow")
