"""Tokenizer family: CharTokenizer semantics, PathHierarchy pinned
cases, the classic grammar against TestClassicAnalyzer's goldens, and
Index.build integration for each registered analyzer name."""

import os

import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis_en import ENGLISH_STOP_WORDS
from lucene_ray.tokenizers import (TOKENIZER_ANALYZERS, classic_scan,
                                   classic_tokenize, java_lower,
                                   keyword_tokenize, letter_tokenize,
                                   path_hierarchy_tokenize,
                                   unicode_whitespace_tokenize,
                                   whitespace_tokenize)


def classic_analyze(text, maxlen=255):
    return [t for t in classic_tokenize(text, maxlen)
            if t not in ENGLISH_STOP_WORDS]


# --- TestClassicAnalyzer.java goldens (analysis/classic tests) ---
CLASSIC_CASES = [
    ("B2B", ["b2b"]), ("2B", ["2b"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("word_with_underscore_and_stopwords",
     ["word", "underscore", "stopwords"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]), ("you're", ["you're"]),
    ("she's", ["she"]), ("Jim's", ["jim"]), ("don't", ["don't"]),
    ("O'Reilly's", ["o'reilly"]),
    ("s-class", ["s", "class"]), ("t-com", ["t", "com"]),
    ("a-class", ["class"]),
    ("AT&T", ["at&t"]), ("Excite@Home", ["excite@home"]),
    ("www.nutch.org", ["www.nutch.org"]),
    ("www.nutch.org.", ["www.nutch.org"]),
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]), ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]), ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),
    ("C embedded developers wanted",
     ["c", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "foo", "bar"]),
    ('"QUOTED" word', ["quoted", "word"]),
    ("U.S.A.", ["usa"]),
    ("C++", ["c"]), ("C#", ["c"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    ("2004.jpg", ["2004.jpg"]),
    ("62.46", ["62.46"]),
    ("978-0-94045043-1", ["978-0-94045043-1"]),
    ("78academyawards/rules/rule02.html",
     ["78academyawards/rules/rule02.html"]),
    ("2006-03-11t082958z_01_ban130523_rtridst_0_ozabs",
     ["2006-03-11t082958z_01_ban130523_rtridst_0_ozabs"]),
    ("mid-20th", ["mid-20th"]),
    ("/money.cnn.com/magazines/fortune/fortune_archive/2007/03/19/"
     "8402357/index.htm safari-0-sheikh-zayed-grand-mosque.jpg",
     ["money.cnn.com", "magazines", "fortune", "fortune",
      "archive/2007/03/19/8402357", "index.htm", "safari-0-sheikh",
      "zayed", "grand", "mosque.jpg"]),
]


@pytest.mark.parametrize("text,want", CLASSIC_CASES,
                         ids=[c[0][:24] for c in CLASSIC_CASES])
def test_classic_analyzer_goldens(text, want):
    assert classic_analyze(text) == want


def test_classic_types():
    """ClassicTokenizer type attribution (TOKEN_TYPES), incl. the
    ACRONYM_DEP -> <HOST> retype minus the trailing dot."""
    assert classic_scan("2004.jpg") == [("2004.jpg", "<HOST>", 0, 8)]
    assert classic_scan("62.46")[0][1] == "<HOST>"
    assert classic_scan("978-0-94045043-1")[0][1] == "<NUM>"
    assert classic_scan("AT&T")[0][1] == "<COMPANY>"
    assert classic_scan("U.S.A.")[0][1] == "<ACRONYM>"
    assert classic_scan("a@b.cd")[0][1] == "<EMAIL>"
    assert classic_scan("O'Reilly")[0][1] == "<APOSTROPHE>"
    # ACRONYM_DEP: alphanum (not single-letter) dotted segments with a
    # trailing dot -> <HOST>, trailing dot removed
    (term, typ, s, e), = classic_scan("a1.b2.c3.")
    assert (term, typ) == ("a1.b2.c3", "<HOST>")


def test_classic_max_token_length():
    assert classic_analyze("ab cd toolong xy z", 5) == \
        ["ab", "cd", "xy", "z"]
    long = "a" * 255
    assert classic_analyze(f"ab cd {long} xy z") == \
        ["ab", "cd", long, "xy", "z"]
    assert classic_analyze(f"ab cd {long}a xy z") == ["ab", "cd", "xy", "z"]


def test_classic_no_pathological_backtracking():
    """The NUM alternations must stay near-linear on adversarial
    digit-punct runs (JFlex is a DFA; the regex port must not blow
    up)."""
    import time
    nasty = "1-" * 60 + "x"
    t0 = time.time()
    classic_scan(nasty)
    assert time.time() - t0 < 5.0


# --- CharTokenizer family ---

def test_whitespace_tokenizer():
    # Java whitespace: tab yes, NBSP no (non-breaking spaces are NOT
    # Java whitespace — WhitespaceTokenizer keeps them inside tokens)
    assert whitespace_tokenize("a b\tc d") == ["a", "b", "c d"]
    # Unicode White_Space property includes NBSP
    assert unicode_whitespace_tokenize("a b\tc d") == \
        ["a", "b", "c", "d"]
    # case-preserving
    assert whitespace_tokenize("Foo BAR") == ["Foo", "BAR"]
    # CharTokenizer chop at 255: remainder starts a new token
    assert whitespace_tokenize("x" * 256) == ["x" * 255, "x"]
    assert whitespace_tokenize("x" * 255) == ["x" * 255]
    # FS/GS/RS/US controls are Java whitespace
    assert whitespace_tokenize("a\x1cb\x1fc") == ["a", "b", "c"]


def test_letter_tokenizer():
    assert letter_tokenize("ab3cd e_f") == ["ab", "cd", "e", "f"]
    assert letter_tokenize("héllo wörld") == ["héllo", "wörld"]
    # digits (Nd) and Roman numerals (Nl) are not Java letters
    assert letter_tokenize("xⅠy") == ["x", "y"]
    simple = TOKENIZER_ANALYZERS["simple"]
    assert simple("Foo3Bar") == ["foo", "bar"]


def test_keyword_tokenizer():
    assert keyword_tokenize("Hello World") == ["Hello World"]
    assert keyword_tokenize("") == []


def test_java_lower():
    assert java_lower("FOO") == "foo"
    assert java_lower("İstanbul") == "istanbul"   # İ -> i (Java)
    assert java_lower("STRASSE") == "strasse"


# --- PathHierarchyTokenizer pinned cases (TestPathHierarchyTokenizer) ---

PATH_CASES = [
    (("/a/b/c", 0), ["/a", "/a/b", "/a/b/c"]),
    (("/a/b/c/", 0), ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    (("a/b/c", 0), ["a", "a/b", "a/b/c"]),
    (("/", 0), ["/"]),
    (("//", 0), ["/", "//"]),
    (("/a/b/c", 1), ["/b", "/b/c"]),
    (("/a/b/c/", 1), ["/b", "/b/c", "/b/c/"]),
    (("a/b/c", 1), ["/b", "/b/c"]),
    (("/a", 1), []),
]


@pytest.mark.parametrize("args,want", PATH_CASES,
                         ids=[f"{a[0]}@skip{a[1]}" for a, _ in PATH_CASES])
def test_path_hierarchy(args, want):
    text, skip = args
    assert path_hierarchy_tokenize(text, skip=skip) == want


def test_path_hierarchy_replacement():
    assert path_hierarchy_tokenize("a/b", delimiter="/",
                                   replacement="\\") == ["a", "a\\b"]


# --- offsets parity: with_offsets token stream must equal the plain
# stream for every registered analyzer ---

@pytest.mark.parametrize("name", sorted(TOKENIZER_ANALYZERS))
def test_offsets_stream_parity(name):
    tok = TOKENIZER_ANALYZERS[name]
    if not hasattr(tok, "with_offsets"):   # e.g. hyphenated: a joined
        pytest.skip("no offsets mode")     # token spans disjoint ranges
    texts = ["Foo BAR_baz 12.5 U.S.A. she's t@e.st /a/b/c x" + "y" * 300,
             "", "a b Héllo"]
    for text in texts:
        toks, starts, ends = tok.with_offsets(text)
        assert len(toks) == len(starts) == len(ends)
        assert all(s <= e for s, e in zip(starts, ends))
        # keyword/path offsets are whole-string; char/classic offsets
        # must slice back to the surface form (case differences aside)
        if name in ("whitespace", "unicode_whitespace"):
            assert toks == tok(text)
            assert [text[s:e] for s, e in zip(starts, ends)] == toks
        elif name in ("simple", "stop_en"):
            assert toks == tok(text)
            assert [java_lower(text[s:e])
                    for s, e in zip(starts, ends)] == toks


def test_build_integration(tmp_path, ray_session):
    """Index.build(analyzer=<tokenizer name>) end-to-end: vocabulary
    invariants per analyzer, query-side analyze() symmetry, and a
    term search through the real searcher."""
    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import termdict_scan

    c = tmp_path / "c"
    os.makedirs(c)
    pq.write_table(generate_corpus(60, seed=7), str(c / "a.parquet"))

    # whitespace: case preserved, underscores intact
    idx = Index.build(str(c), str(tmp_path / "i_ws"),
                      analyzer="whitespace")
    r = idx.reader
    assert r.analyze("The quick_brown Fox") == \
        ["The", "quick_brown", "Fox"]
    terms = [t for t in termdict_scan(r).column("term").to_pylist()
             if ":" not in t]
    hit_term = next(t for t in terms if t.isalpha())
    assert len(idx.search(hit_term, 5)) > 0

    # classic: stop words dropped at query time too
    idx = Index.build(str(c), str(tmp_path / "i_cl"), analyzer="classic")
    assert idx.reader.analyze("the U.S.A. code") == ["usa", "code"]

    # keyword: the whole content is one term — exact-match vocabulary
    idx = Index.build(str(c), str(tmp_path / "i_kw"), analyzer="keyword")
    kterms = [t for t in
              termdict_scan(idx.reader).column("term").to_pylist()
              if ":" not in t]
    assert kterms and any(" " in t for t in kterms)


def test_offsets_index_with_tokenizer(tmp_path, ray_session):
    """with_offsets=True builds store tokenizer-derived offsets
    (token_offsets_batch tokenizer path): stored tok_starts/tok_ends
    slice the original content back into the whitespace token stream."""
    import pyarrow as pa

    from lucene_ray.build import build_index
    from lucene_ray.highlight import retrieve_content
    from lucene_ray.search import IndexReader

    c = tmp_path / "c"
    os.makedirs(c)
    docs = [f"Foo BAR_{i} ba-z {i}.5 end" for i in range(20)]
    pq.write_table(pa.table({
        "repo": ["r"] * 20,
        "path": [f"f{i}.py" for i in range(20)],
        "commit": ["c" * 40] * 20,
        "lang": ["py"] * 20,
        "content": docs,
    }), str(c / "a.parquet"))
    idx = str(tmp_path / "i")
    build_index(str(c), idx, analyzer="whitespace",
                with_positions=True, with_offsets=True)
    r = IndexReader(idx)
    dm = pq.read_table(os.path.join(idx, "docmeta"),
                       columns=["doc_id", "tok_starts", "tok_ends"])
    rows = dm.to_pylist()
    assert rows
    for row in rows[:5]:
        content = retrieve_content(r, row["doc_id"])
        toks = whitespace_tokenize(content)
        got = [content[s:e]
               for s, e in zip(row["tok_starts"], row["tok_ends"])]
        assert got == toks
