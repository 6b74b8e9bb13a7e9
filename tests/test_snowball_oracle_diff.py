"""Differential fuzz: every snowball SQL oracle vs its Python engine.

The driver only proves EXACT parity on the fixed corpus vocabulary;
this test replays each oracle's word-level chain in DuckDB over
random words and compares with the Python stemmer — the divergence
classes that found the round-5 Romanian/Lithuanian/Estonian oracle
bugs (review pass) stay covered permanently.

Mechanics: the oracles are full corpus queries (documents -> df/ttf
top-60), so each batch feeds <= 55 distinct single-word documents and
compares the whole result table against the Python-derived one.
Planted oracles (Armenian/Nepali) receive Latin words and the plant
happens inside both sides identically.
"""

import random
import string

import duckdb
import pandas as pd
import pytest

BATCHES = 3
WORDS_PER_BATCH = 55

# (name, alphabet) — alphabets chosen to exercise each algorithm's
# suffix tables and special letters
CASES = [
    ("danish", "abdeghiklnorstuvåæøj"),
    ("swedish", "abdefghilmnorstuvåäö"),
    ("norwegian", "abdeghijklmnorstuvåæø"),
    ("irish", "abcdefghilmnoprstuáéíóú"),
    ("basque", "abdeghijklmnorstuz"),
    ("romanian", "abcdeghilmnorstuvâîășț"),
    ("lithuanian", "abdegijklmnorstuvyząėęįūų"),
    ("catalan", "abcdefgilmnorstuvxàéèíïòóúü"),
    ("hungarian", "abdeghijklmnorstvzáéíóöúüőű"),
    ("estonian", "abdeghijklmnoprstuvõäöü"),
    ("serbian", "abcdefghijklmnoprstuvzćčđšž"),
    ("finnish", "abdehijklmnoprstuvyäö"),
    ("armenian", string.ascii_lowercase),      # planted per-char
    ("nepali", string.ascii_lowercase),        # planted per-char
]


def _python_side(name, words):
    import lucene_ray.pipelines.fulltext as ft
    from lucene_ray.snowball import SNOWBALL_STEMMERS
    from lucene_ray.snowball2 import SNOWBALL2_STEMMERS

    fn = {**SNOWBALL_STEMMERS, **SNOWBALL2_STEMMERS}[f"snowball_{name}"]
    if name == "armenian":
        plant = str.maketrans(ft._HY_PLANT_FROM, ft._HY_PLANT_TO)
        stems = [fn(w.translate(plant)) for w in words]
    elif name == "nepali":
        plant = str.maketrans(ft._NE_PLANT_FROM, ft._NE_PLANT_TO)
        stems = [fn(w.translate(plant)) for w in words]
    else:
        stems = [fn(w) for w in words]
    df = (pd.DataFrame({"term": stems})
          .groupby("term").size().rename("df").reset_index())
    df["ttf"] = df["df"]
    return (df.sort_values(["df", "term"],
                           ascending=[False, True])
            .head(60).reset_index(drop=True)[["term", "df", "ttf"]])


@pytest.mark.parametrize("name,alphabet", CASES)
def test_snowball_oracle_matches_engine_on_random_words(name, alphabet):
    import lucene_ray.pipelines.fulltext as ft

    sql = getattr(ft, f"oracle_snowball_{name}_sql")()
    rng = random.Random(hash(name) & 0xFFFF)
    for batch in range(BATCHES):
        words = list({
            "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(2, 12)))
            for _ in range(WORDS_PER_BATCH)})
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(words)))
        got = con.execute(sql).df()
        want = _python_side(name, words)
        got = (got.sort_values(["df", "term"], ascending=[False, True])
               .reset_index(drop=True))
        want = (want.sort_values(["df", "term"], ascending=[False, True])
                .reset_index(drop=True))
        # compare as value sets (the top-60 cut ties on df are stable
        # here: every df is 1 unless duplicates collapsed, and both
        # sides rank by (df desc, term))
        assert got[["term", "df"]].astype(str).values.tolist() == \
            want[["term", "df"]].astype(str).values.tolist(), (
                name, batch)
