"""Randomized-corpus driver mimic: entries vs oracles on corpora the
fixed testdata never produces.

The driver proves EXACT parity on /root/testdata's fixed vocabulary;
this battery regenerates a random documents table (same schema) and
replays entry-vs-oracle comparisons, covering the divergence classes
a vocabulary change would expose (this found and now guards against:
empty-result schema loss in seven entries, the DuckDB DECIMAL-vs-
DOUBLE literal drift in two suggesters, a compound-oracle subword
mislabel, and the reviewed snowball oracle bugs).

The full sweep (every documents-only oracle entry) lives in the same
module as `run_sweep` for session use; the pytest runs a curated
subset (the once-broken entries + a spread) to bound suite time.
"""

import os
import random
import shutil
import string

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# once-broken + representative spread
SUBSET = [
    "ft_keep_word", "ft_dictionary_compound", "ft_suggest_blended",
    "ft_suggest_freetext", "ft_drill_sideways", "ft_percolate",
    "ngram_jaccard_pairs", "dedup_substring_spans", "join_scored",
    "dedup_clusters", "dedup_cluster_best",
    "ft_bm25_top10", "ft_bm25_scores",
    "ft_phrase", "ft_fuzzy_docs", "ft_collapse_lang",
    "ft_snowball_romanian", "ft_snowball_lithuanian",
    "ft_snowball_estonian", "ft_snowball_finnish",
    "text_quality", "lang_id", "classify_nb", "split_dataset",
    "agg_histogram", "classify_confusion",
]


def make_random_sf(seed: int, path: str, n_docs: int = 300):
    rng = random.Random(seed)
    os.makedirs(path, exist_ok=True)
    langs = ["de", "en", "es", "fr", "zh"]
    sources = ["src0", "src1", "src2"]
    words = ["".join(rng.choice(string.ascii_lowercase)
                     for _ in range(rng.randint(1, 10)))
             for _ in range(80)]
    rows = []
    for d in range(n_docs):
        text = " ".join(rng.choice(words)
                        for _ in range(rng.randint(1, 30)))
        rows.append((d, text, rng.choice(langs), rng.choice(sources),
                     len(text)))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "n_chars": pa.array([r[4] for r in rows], pa.int64())})
    pq.write_table(t, os.path.join(path, "documents.parquet"))


def run_sweep(sf: str, names=None) -> dict:
    import duckdb

    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    results = {}
    for name in (names or q):
        if name not in o:
            continue
        try:
            got = q[name](sf)
            gdf = got.to_pandas() if hasattr(got, "to_pandas") else got
            odf = con.execute(o[name]).df()
            c = sorted(gdf.columns)
            if sorted(odf.columns) != c:
                results[name] = "COLS"
                continue
            a = gdf[c].sort_values(c).reset_index(drop=True).astype(str)
            b = odf[c].sort_values(c).reset_index(drop=True).astype(str)
            results[name] = ("EXACT" if a.shape == b.shape
                             and (a.values == b.values).all()
                             else "MISMATCH")
        except FileNotFoundError:
            results[name] = "SKIP"
        except Exception as ex:                     # noqa: BLE001
            results[name] = f"ERR({type(ex).__name__})"
    return results


def test_random_corpus_subset(ray_session, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("randsf"))
    make_random_sf(99, sf)
    res = run_sweep(sf, SUBSET)
    bad = {k: v for k, v in res.items() if v not in ("EXACT", "SKIP")}
    assert not bad, bad
    assert sum(1 for v in res.values() if v == "EXACT") >= 20
