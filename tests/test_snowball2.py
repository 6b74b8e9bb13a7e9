"""Snowball stemmers, second batch (lucene_ray.snowball2).

Gates:
- re-extraction equality: the generated among tables and stop lists
  are re-parsed from the reference programs/resources live;
- the per-language analyzer goldens (Test*Analyzer.java);
- hand-traced branch batteries exercising region gates and the
  find_among_b commit semantics.
"""

import pathlib
import re

import pytest

REF = pathlib.Path("/root/reference/lucene/analysis/common/src")
EXT = REF / "java/org/tartarus/snowball/ext"

_AMONG_RE = re.compile(
    r'new Among\("((?:[^"\\]|\\.)*)",\s*(-?\d+),\s*(-?\d+)'
    r'(?:,\s*"(r_\w+)",\s*methodObject)?\)')
_TABLE_RE = re.compile(
    r'private static final Among (a_\d+)\[\] = \{(.*?)\};', re.S)


def _decode(s: str) -> str:
    return re.sub(
        r'\\u([0-9a-fA-F]{4})|\\(.)',
        lambda m: chr(int(m.group(1), 16)) if m.group(1)
        else {"n": "\n", "t": "\t"}.get(m.group(2), m.group(2)), s)


def _parse_amongs(java: str):
    tables = {}
    for name, body in _TABLE_RE.findall(java):
        rows = []
        for s, _sub, res, cond in _AMONG_RE.findall(body):
            rows.append((_decode(s), int(res)) if not cond
                        else (_decode(s), int(res), cond))
        tables[name] = tuple(rows)
    return tables


LANGS = ["Romanian", "Catalan", "Basque", "Irish", "Hungarian",
         "Finnish", "Turkish", "Lithuanian", "Armenian", "Estonian",
         "Nepali", "Tamil", "Serbian"]


def test_among_tables_match_reference():
    import lucene_ray.snowball2_data as mod
    for lang in LANGS:
        want = _parse_amongs((EXT / f"{lang}Stemmer.java").read_text())
        assert getattr(mod, lang.upper()) == want, lang


_STOP_SOURCES = {
    "catalan": ("ca/stopwords.txt", "#"),
    "estonian": ("et/stopwords.txt", "#"),
    "basque": ("eu/stopwords.txt", "#"),
    "finnish": ("snowball/finnish_stop.txt", "|"),
    "irish": ("snowball/irish_stop.txt", "|"),
    "hungarian": ("snowball/hungarian_stop.txt", "|"),
    "armenian": ("hy/stopwords.txt", "#"),
    "lithuanian": ("lt/stopwords.txt", "#"),
    "nepali": ("ne/stopwords.txt", "#"),
    "romanian": ("ro/stopwords.txt", "#"),
    "serbian": ("sr/stopwords.txt", "#"),
    "tamil": ("ta/stopwords.txt", "#"),
    "turkish": ("tr/stopwords.txt", "#"),
}


def test_stop_lists_match_reference():
    import lucene_ray.snowball2_stop_data as mod
    base = REF / "resources/org/apache/lucene/analysis"
    for lang, (rel, style) in _STOP_SOURCES.items():
        words = []
        for line in (base / rel).read_text(encoding="utf-8").splitlines():
            if style == "|":
                words.extend(line.split("|", 1)[0].split())
            else:
                line = line.strip()
                if line and not line.startswith("#"):
                    words.append(line)
        assert getattr(mod, lang.upper() + "_STOP") == frozenset(words), lang


def _golden_pairs(lang_dir: str, test_file: str):
    src = (REF / f"test/org/apache/lucene/analysis/{lang_dir}/"
           f"{test_file}").read_text()
    return re.findall(r'checkOneTerm\(a, "([^"]*)", "([^"]*)"\)', src)


# --- Armenian (ArmenianStemmer.java:13) ---

def test_armenian_reference_goldens():
    from lucene_ray.snowball2 import armenian_stem
    pairs = _golden_pairs("hy", "TestArmenianAnalyzer.java")
    assert len(pairs) >= 4
    # the third golden asserts the stem-EXCLUSION path (the raw word
    # survives); the stemmer itself still stems it
    for word, want in pairs:
        if word == want:
            continue
        assert armenian_stem(word) == want, (word, want)


def test_armenian_branches():
    from lucene_ray.snowball2 import armenian_stem as st
    # ending (a_3) gated on R2: ության fits pV but starts before p2,
    # no fallback to a shorter entry — the verb ան still fires after
    assert st("տեսության") == "տեսությ"
    # ending + noun chain: ն in R2, then noun ուն
    assert st("ազատություն") == "ազատությ"
    # ending ին with R2 exactly at the boundary
    assert st("մարդկային") == "մարդկայ"
    # verb suffixes at pV: ալ / ում
    assert st("կարդալ") == "կարդ"
    assert st("կարդում") == "կարդ"
    # ending ան (R2 boundary) then verb աց
    assert st("մեծացան") == "մեծ"
    # R2 empty: ը / ի commit but do not delete
    assert st("գիրքը") == "գիրքը"
    assert st("տների") == "տների"
    # suffix would stick out of pV: untouched
    assert st("տներ") == "տներ"


def test_registered_chains():
    from lucene_ray.analysis_en import TOKEN_FILTERS
    from lucene_ray.snowball2 import SNOWBALL2_STEMMERS
    for name in SNOWBALL2_STEMMERS:
        assert name in TOKEN_FILTERS
        lang = name.removeprefix("snowball_")
        assert lang in TOKEN_FILTERS
    hy = TOKEN_FILTERS["armenian"]
    assert hy(["այդ", "արծիվներ"]) == [None, "արծ"]
