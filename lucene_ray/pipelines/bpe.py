"""BPE tokenizer training and application over the documents table.

Sennrich, Haddow & Birch 2016 ("Neural Machine Translation of Rare
Words with Subword Units", §3.2): learn byte-pair merges by repeatedly
merging the most frequent adjacent symbol pair; words carry an
end-of-word marker so merges never cross word boundaries. The reference
engine has no tokenizer training; this is the training-data-pipeline
operator that precedes everything the engine's token_count_bpe budgets.

Scale shape — the key observation (also how SentencePiece/fastBPE
train): BPE statistics live on the WORD-FREQUENCY table, not the
corpus. One distributed groupby reduces 100 TB of text to a Heaps-law
vocabulary (~|V| rows); the merge loop then runs driver-side over that
small table. Nothing per-token ever reaches the driver. (For a
beyond-driver vocabulary the per-iteration pair count is itself a
map+groupby over vocab shards; documented alternative, not needed at
any realistic vocabulary size.)

Application (:func:`bpe_token_count`) is map-only: the merge ranks are
broadcast once via ``ray.put``; each batch segments only its UNIQUE
words (dictionary-encode, the repo's vocab-level convention) and fans
counts back out by code.

Determinism: ties on pair count break lexicographically on (left,
right), so the merge sequence is a pure function of the corpus.
Iterative training is not SQL-expressible — driver checks are
rows-only; exactness is pytest-verified against the published
algorithm's hand-computed merges.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

EOW = "</w>"                 # end-of-word marker (Sennrich §3.2)
N_MERGES = 64


def _docs(sf_dir: str, cols=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=list(cols))


def _word_freq(sf_dir: str):
    """Distributed word-frequency table (the one wide operation)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from lucene_ray.pipelines.util import ensure_cols

    def partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        flat = pc.list_flatten(parts)
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    return ensure_cols(
        _docs(sf_dir, ("text",))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word").aggregate(Sum("c", alias_name="c"))
        .to_pandas(), ["word", "c"])


def _learn_merges(words: list[str], counts: list[int],
                  n_merges: int) -> list[tuple[str, str, int]]:
    """The Sennrich merge loop over the word-frequency table:
    (left, right, pair_count) per merge, most-frequent first."""
    vocab = {}
    for w, c in zip(words, counts):
        if w:
            sym = tuple(list(w) + [EOW])
            vocab[sym] = vocab.get(sym, 0) + int(c)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break                        # nothing repeats: stop early
        merges.append((a, b, cnt))
        ab = a + b
        nxt = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        vocab = nxt
    return merges


def bpe_train(sf_dir: str, n_merges: int = N_MERGES) -> pa.Table:
    """Learn the corpus's BPE merge table: (rank, left, right,
    pair_count), rank 0 = first (most frequent) merge."""
    wf = _word_freq(sf_dir)
    merges = _learn_merges(list(wf["word"]), list(wf["c"]), n_merges)
    return pa.table({
        "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64())})


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    lowest-rank applicable pair (the standard BPE apply order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_count(sf_dir: str, n_merges: int = N_MERGES):
    """Apply the trained merges corpus-wide: per doc, the subword count
    under the learned tokenizer vs the whitespace word count — the
    compression budget a trained tokenizer buys. Merge ranks broadcast
    once; per batch only UNIQUE words are segmented (memoized at the
    dictionary level), counts fan out by code."""
    import ray
    import pyarrow.compute as pc

    mt = bpe_train(sf_dir, n_merges)
    ranks = {(lt, rt): int(rk) for rk, lt, rt in
             zip(mt.column("rank").to_pylist(),
                 mt.column("left").to_pylist(),
                 mt.column("right").to_pylist())}
    rref = ray.put(ranks)

    def count(batch: pa.Table) -> pa.Table:
        ranks = ray.get(rref)
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        flat = pc.list_flatten(parts)
        owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
        d = pc.dictionary_encode(flat)
        uniq = d.dictionary.to_pylist()
        per_word = np.array(
            [len(segment_word(w, ranks)) if w else 0 for w in uniq],
            dtype=np.int64)
        codes = np.asarray(d.indices, dtype=np.int64)
        n = batch.num_rows
        nb = np.bincount(owners, weights=per_word[codes].astype(np.float64),
                         minlength=n).astype(np.int64)
        nw = np.bincount(owners, minlength=n).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_words": pa.array(nw),
                         "n_bpe_tokens": pa.array(nb)})

    return _docs(sf_dir).map_batches(count, batch_format="pyarrow")
