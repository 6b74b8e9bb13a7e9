"""Porter (1980) SQL chain vs analysis_en.porter_stem — the permanent
differential that upgrades ft_stemmed_search to oracle-backed."""

import random
import zipfile

import duckdb

_VOC = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/en/porterTestData.zip")


def _run_sql(words):
    from lucene_ray.pipelines.fulltext import _porter1_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE words(w VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?)",
                    [(w,) for w in set(words)])
    sql = _porter1_sql("words") + "\nSELECT w, stem FROM stemmed"
    return dict(con.execute(sql).fetchall())


def test_porter1_sql_full_vocabulary():
    """All 23,531 reference pairs through the SQL chain."""
    from lucene_ray.analysis_en import porter_stem
    z = zipfile.ZipFile(_VOC)
    voc = z.read("voc.txt").decode().split()
    out = z.read("output.txt").decode().split()
    got = _run_sql(voc)
    bad = [(w, e, got.get(w)) for w, e in zip(voc, out)
           if got.get(w) != e]
    assert not bad, bad[:10]
    # and the python side agrees with the reference output (re-gate)
    assert all(porter_stem(w) == e for w, e in zip(voc, out))


def test_porter1_sql_random_fuzz():
    """Random words, y-runs included (the consonant-y classification
    alternates through yy chains — the recursive CTE must match the
    recursive cons() definition)."""
    from lucene_ray.analysis_en import porter_stem
    rng = random.Random(23)
    words = list({"".join(rng.choice("abdeyilmnorsty")
                          for _ in range(rng.randint(1, 12)))
                  for _ in range(1500)})
    got = _run_sql(words)
    bad = [(w, porter_stem(w), got.get(w)) for w in words
           if got.get(w) != porter_stem(w)]
    assert not bad, bad[:10]
