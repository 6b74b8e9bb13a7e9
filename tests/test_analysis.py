"""Analyzer golden tests.

Every assertion here is copied from the reference's own test suite
(lucene/core/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java
— the assertAnalyzesTo cases), so passing means parity with StandardAnalyzer
(StandardTokenizer + LowerCaseFilter + empty stop set) on these inputs.
"""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis import MAX_TOKEN_LENGTH, analyze_batch, tokenize
from lucene_ray.smallfloat import int_to_byte4


def check(text, expected, max_len=MAX_TOKEN_LENGTH):
    assert tokenize(text, max_len) == expected


# --- TestStandardAnalyzer.testAlphanumericSA / plain words ---------------
def test_basic_words():
    check("B2B", ["b2b"])
    check("2B", ["2b"])
    check("some-dashed-phrase", ["some", "dashed", "phrase"])
    check("dogs,chase,cats", ["dogs", "chase", "cats"])
    check("ac/dc", ["ac", "dc"])


# --- internal apostrophes (TestStandardAnalyzer.java:409-415) ------------
def test_apostrophes():
    check("O'Reilly", ["o'reilly"])
    check("you're", ["you're"])
    check("she's", ["she's"])
    check("Jim's", ["jim's"])
    check("don't", ["don't"])
    check("O'Reilly's", ["o'reilly's"])


# --- mid-letter / mid-num / ExtendNumLet (TestStandardAnalyzer.java:511-553)
def test_mid_joiners():
    check("A:B", ["a:b"])
    check("A::B", ["a", "b"])
    check("A.B", ["a.b"])
    check("A..B", ["a", "b"])
    check("1,2", ["1,2"])
    check("1,,2", ["1", "2"])
    check("1.2", ["1.2"])
    check("A:B_A:B", ["a:b_a:b"])
    check("A:B_A::B", ["a:b_a", "b"])
    check("1.2_1.2", ["1.2_1.2"])
    check("A.B_A.B", ["a.b_a.b"])
    check("1.2_1..2", ["1.2_1", "2"])
    check("A.B_A..B", ["a.b_a", "b"])
    check("1,2_1,2", ["1,2_1,2"])
    check("1,2_1,,2", ["1,2_1", "2"])
    check("C_A.:B", ["c_a", "b"])
    check("C_A:.B", ["c_a", "b"])
    check("3_1,.2", ["3_1", "2"])
    check("3_1.,2", ["3_1", "2"])


def test_mixed_alnum_and_underscore():
    check("a1b2", ["a1b2"])
    check("foo_bar", ["foo_bar"])
    check("foo__bar", ["foo__bar"])
    check("foo_", ["foo_"])
    check("_foo", ["_foo"])
    check("__", [])                    # no core char → dropped
    check("3.14", ["3.14"])
    check("3.14.15", ["3.14.15"])      # repeated single mids keep joining
    check("a.b.c", ["a.b.c"])
    check("1.b", ["1", "b"])           # mid needs same class on both sides
    check("a.2", ["a", "2"])


def test_unicode_letters():
    check("héllo wörld", ["héllo", "wörld"])
    # combining mark attaches (WB4)
    check("áb", ["áb"])


def test_empty_and_punct():
    check("", [])
    check("...", [])
    check("!@#$%^&*()", [])
    check(" \t\n ", [])


# --- max token length (TestStandardAnalyzer.java:677-693) ----------------
def test_max_token_length_nondefault():
    # assertAnalyzesTo(a, "ab cd toolong xy z", ...) with maxLen 5
    check("ab cd toolong xy z", ["ab", "cd", "toolo", "ng", "xy", "z"],
          max_len=5)


def test_max_token_length_default():
    b255 = "b" * MAX_TOKEN_LENGTH
    check("x " + b255 + " " + b255 + "b", ["x", b255, b255, "b"])


def test_max_len_split_with_mid_at_boundary():
    # window lands on a dangling mid char → longest accepted prefix shrinks
    text = "a" * 4 + ".bc"
    # span is "aaaa.bc" (one token normally); with max_len 5 the 5-char
    # window "aaaa." cannot end on '.', so emit "aaaa", resume at ".bc":
    # '.' cannot start a token → "bc"
    check(text, ["aaaa", "bc"], max_len=5)


def test_cjk():
    check("仮名遣い カタカナ", ["仮", "名", "遣", "い", "カタカナ"])
    check("abcカタ", ["abc", "カタ"])
    check("한국어 hello", ["한국어", "hello"])


# --- batch API mirrors the scalar API ------------------------------------
def test_analyze_batch_matches_tokenize():
    docs = ["B2B some-dashed-phrase", "O'Reilly's 3.14 foo_bar", "", "...",
            "A:B_A::B x", "héllo wörld", "a" * 300 + " tail"]
    tokens, owners, lengths, norms = analyze_batch(docs)
    toks = tokens.to_pylist()
    for d, text in enumerate(docs):
        expect = tokenize(text)
        got = [t for t, o in zip(toks, owners) if o == d]
        assert got == expect, f"doc {d}"
        assert lengths[d] == len(expect)
        assert norms[d] == int_to_byte4(np.array([len(expect)]))[0]


def test_analyze_batch_long_token_split():
    docs = ["x" * (MAX_TOKEN_LENGTH + 45)]
    tokens, owners, lengths, norms = analyze_batch(docs)
    assert tokens.to_pylist() == ["x" * MAX_TOKEN_LENGTH, "x" * 45]
    assert lengths[0] == 2


def test_analyze_batch_arrow_types():
    tokens, owners, lengths, norms = analyze_batch(["a b c"])
    assert isinstance(tokens, pa.Array)
    assert tokens.type == pa.string()
    assert owners.dtype == np.int64
    assert lengths.dtype == np.int32
    assert norms.dtype == np.uint8


def test_term_freq_batch_matches_tokenize():
    """The ASCII regex fast path must agree exactly with the UAX#29 engine."""
    from collections import Counter

    from lucene_ray.analysis import term_freq_batch

    docs = ["B2B some-dashed-phrase ac/dc", "O'Reilly's 3.14 foo_bar",
            "", "...", "A:B_A::B x 1.2_1..2 C_A.:B", "héllo wörld",
            "a" * 300 + " tail", "__ _x x_ 1,234.56 don't",
            "key agg row scan slow fast"]
    terms, tfs, owners, lengths, norms = term_freq_batch(docs)
    got = {}
    for t, f, o in zip(terms.to_pylist(), tfs, owners):
        got.setdefault(int(o), {})[t] = int(f)
    for d, text in enumerate(docs):
        expect = Counter(tokenize(text))
        assert got.get(d, {}) == dict(expect), (d, text)
        assert lengths[d] == sum(expect.values())


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(alphabet="abcxyzABZ019 _.,:;'\"-/()\t\n",
               min_size=0, max_size=120))
@settings(max_examples=300, deadline=None)
def test_fastpath_matches_exact_scanner(s):
    """Differential test: the ASCII regex fast path in term_freq_batch must
    agree with the exact UAX#29 scanner on arbitrary ASCII input."""
    from collections import Counter

    from lucene_ray.analysis import term_freq_batch

    terms, tfs, owners, lengths, norms = term_freq_batch([s])
    got = {t: int(f) for t, f in zip(terms.to_pylist(), tfs)}
    expect = dict(Counter(tokenize(s)))
    assert got == expect, s
    assert lengths[0] == sum(expect.values())


# ---------------------------------------------------------------------------
# English analysis chain (analysis_en)

def test_porter_published_vectors():
    """Porter 1980 examples (the step-1/3/4/5 tables in the paper and in
    PorterStemmer.java:222-492 comments), incl. the reference deviations
    (logi->log) and the step-2/6 interactions."""
    from lucene_ray.analysis_en import porter_stem as s
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "disabled": "disabl", "matting": "mat",
        "mating": "mate", "meeting": "meet", "milling": "mill",
        "messing": "mess", "meetings": "meet", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll", "sky": "sky",
        "sing": "sing", "running": "run",
        "generalizations": "gener", "oscillators": "oscil",
        "archaeology": "archaeolog", "logical": "logic",
        "query": "queri", "queries": "queri", "value": "valu",
        "values": "valu", "tables": "tabl", "merged": "merg",
        "ab": "ab", "": "", "y": "y",
    }
    bad = {w: (s(w), e) for w, e in cases.items() if s(w) != e}
    assert not bad, bad


def test_english_chain_possessive_stop_stem():
    from lucene_ray.analysis_en import english_token_filter
    out = english_token_filter(
        ["the", "customer's", "orders", "were", "a", "processing"])
    assert out == [None, "custom", "order", "were", None, "process"]
    assert english_token_filter(["are", "at", "with"]) == [None] * 3
    # curly-apostrophe possessive (EnglishPossessiveFilter.java:42-44)
    assert english_token_filter(["spark’s"]) == ["spark"]


def test_term_freq_batch_token_filter_positions_and_lengths():
    """Stop removal keeps position GAPS (StopFilter positionIncrement
    role) and field length counts only emitted tokens."""
    from lucene_ray.analysis import term_freq_batch
    from lucene_ray.analysis_en import english_token_filter

    terms, tfs, owners, lengths, norms, positions = term_freq_batch(
        ["the fast scans are scanning the table"],
        with_positions=True, token_filter=english_token_filter)
    got = dict(zip(terms.to_pylist(),
                   [p if isinstance(p, list) else list(p)
                    for p in positions]))
    # positions: the(0) fast(1) scans(2) are(3) scanning(4) the(5) table(6)
    assert got == {"fast": [1], "scan": [2, 4], "tabl": [6]}
    assert lengths.tolist() == [4]  # fast, scans, scanning, table

    # non-positional path must agree on (term, tf) and lengths
    t2, tf2, ow2, len2, _ = term_freq_batch(
        ["the fast scans are scanning the table"],
        token_filter=english_token_filter)
    assert sorted(zip(t2.to_pylist(), tf2.tolist())) == \
        [("fast", 1), ("scan", 2), ("tabl", 1)]
    assert len2.tolist() == [4]


def test_ascii_fold():
    from lucene_ray.analysis_en import ascii_fold
    assert ascii_fold("café naïve Müller") == "cafe naive Muller"
    assert ascii_fold("straße œuvre łódź") == "strasse oeuvre lodz"
    assert ascii_fold("plain ascii") == "plain ascii"

def test_term_freq_batch_index_synonyms():
    """Index-time token graphs (SynonymGraphFilter.java:78 single-token
    rules): stacked tokens share the source position (posIncr=0), merge
    with natural occurrences, count as numOverlap, and leave the
    discounted field length unchanged (FieldInvertState.java:40)."""
    from lucene_ray.analysis import term_freq_batch

    syn = {"fast": ["quick", "slow"], "big": ["large"]}
    docs = ["fast scan slow merge", "big big table", "no sources here"]

    # positional path
    terms, tfs, owners, lengths, norms, positions, overlaps = \
        term_freq_batch(docs, with_positions=True, synonyms=syn)
    got = {}
    for t, o, p in zip(terms.to_pylist(), owners.tolist(), positions):
        got[(o, t)] = list(p)
    assert got[(0, "quick")] == [0]          # stacked at fast's position
    assert got[(0, "slow")] == [0, 2]        # stacked + natural, ascending
    assert got[(0, "fast")] == [0]
    assert got[(1, "large")] == [0, 1]       # one per source occurrence
    assert lengths.tolist() == [4, 3, 3]     # discounted: originals only
    assert overlaps.tolist() == [2, 2, 0]    # quick+slow stacked, large x2

    # vectorized path agrees on (owner, term, tf), lengths, overlaps
    t2, tf2, ow2, len2, _, ov2 = term_freq_batch(docs, synonyms=syn)
    tf_pos = {(o, t): len(p)
              for t, o, p in zip(terms.to_pylist(), owners.tolist(),
                                 positions)}
    tf_vec = dict(zip(zip(ow2.tolist(), t2.to_pylist()), tf2.tolist()))
    assert tf_vec == tf_pos
    assert len2.tolist() == lengths.tolist()
    assert ov2.tolist() == overlaps.tolist()

    # no synonyms → legacy 5/6-tuple signature, unchanged results
    t3, tf3, ow3, len3, _ = term_freq_batch(docs)
    assert len3.tolist() == [4, 3, 3]

def test_cjk_bigram_stream():
    """CJKBigramFilter semantics (analysis/cjk/CJKBigramFilter.java:63):
    runs of Han ideograph tokens become overlapping bigrams, lone
    ideographs stay unigrams, non-Han tokens pass through."""
    from lucene_ray.analysis import cjk_bigram_stream, tokenize

    toks = tokenize("我爱北京 hello 门 world 天安门")
    assert cjk_bigram_stream(toks) == \
        ["我爱", "爱北", "北京", "hello", "门", "world", "天安", "安门"]
    assert cjk_bigram_stream(["plain", "ascii"]) == ["plain", "ascii"]
    assert cjk_bigram_stream([]) == []


def test_index_time_cjk_analyzer(tmp_path, ray_session):
    """build_index(analyzer='cjk') indexes bigram terms; ASCII docs are
    untouched (the fast path skips the stream filter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.build import build_index
    from lucene_ray.search import IndexReader, termdict_terms

    corpus = tmp_path / "c"
    corpus.mkdir()
    rows = {
        "repo": ["r"] * 3, "path": [f"doc_{i:08d}.txt" for i in range(3)],
        "commit": ["c"] * 3, "lang": ["zh", "zh", "en"],
        "content": ["我爱北京天安门", "北京 big data", "plain ascii text"],
    }
    pq.write_table(pa.table(rows), str(corpus / "a.parquet"))
    idx = tmp_path / "i"
    build_index(str(corpus), str(idx), analyzer="cjk")
    r = IndexReader(str(idx))
    terms = set(termdict_terms(r).column("term").to_pylist())
    assert {"我爱", "爱北", "北京", "京天", "天安", "安门"} <= terms
    assert "我" not in terms            # merged into bigrams
    assert "北京" in terms and {"big", "data", "plain"} <= terms
    # lone ideograph in doc 1 ("北京" run of 2 → one bigram)
    p = r.postings("北京")
    assert p is not None and int(p.n.sum()) == 2   # docs 0 and 1


def test_soundex_commons_codec_vectors():
    """Published commons-codec SoundexTest vectors (the encoder
    PhoneticFilter delegates to), incl. the H/W-transparency pairs
    (Ashcraft/Ashcroft, BARHAM/BARONE/BARRON), the first-letter-merge
    case (Pfister) and the vowel-reset case (over)."""
    from lucene_ray.phonetic import soundex

    vecs = {"Robert": "r163", "Rupert": "r163", "Ashcraft": "a261",
            "Ashcroft": "a261", "Tymczak": "t522", "Pfister": "p236",
            "Honeyman": "h555", "Testing": "t235", "The": "t000",
            "quick": "q200", "brown": "b650", "fox": "f200",
            "jumped": "j513", "over": "o160", "lazy": "l200",
            "dogs": "d200", "Williams": "w452", "BARHAM": "b650",
            "BARONE": "b650", "BARRON": "b650", "Lukasiewicz": "l222",
            "Lissajous": "l222", "Dracula": "d624", "Washington": "w252",
            "Lee": "l000", "Gutierrez": "g362", "Jackson": "j250",
            "SOLOMON": "s455"}
    for k, v in vecs.items():
        assert soundex(k) == v, k
    assert soundex("") == ""
    assert soundex("123") == ""
    assert soundex("o'Brien") == soundex("OBrien")


def test_ngram_stream_filters(tmp_path, ray_session):
    """EdgeNGram/NGram token filters (analysis/ngram/
    EdgeNGramTokenFilter.java:37, NGramTokenFilter.java:33): gram
    goldens, and the registered analyzers build a searchable index whose
    vocabulary is the gram set."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.analysis import edge_ngram_stream, ngram_stream

    assert edge_ngram_stream(["spark"]) == ["sp", "spa", "spar", "spark"]
    assert edge_ngram_stream(["ab"]) == ["ab"]
    assert edge_ngram_stream(["a"]) == []           # below minGram
    assert edge_ngram_stream(["sparkles"])[-1] == "spark"   # cap at 5
    assert ngram_stream(["abcd"]) == ["ab", "bc", "cd", "abc", "bcd"]
    assert ngram_stream(["a"]) == []

    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import IndexReader, termdict_scan
    import os
    c = tmp_path / "c"
    os.makedirs(c)
    pq.write_table(generate_corpus(80, seed=41), str(c / "a.parquet"))
    idx = Index.build(str(c), str(tmp_path / "i"), analyzer="edge_ngram")
    r = idx.reader
    terms = [t for t in termdict_scan(r).column("term").to_pylist()
             if ":" not in t]
    assert terms and all(2 <= len(t) <= 5 for t in terms)
    # a 2-char prefix gram of a frequent word must be searchable
    hits = idx.search(terms[0], 5)
    assert len(hits) > 0


def test_common_token_filters(tmp_path, ray_session):
    """Length/Truncate/Reverse token filters (analysis/miscellaneous/
    LengthFilter.java:29, TruncateTokenFilter.java:28,
    analysis/reverse/ReverseStringFilter.java:36): stream goldens, and
    the registered analyzers build indexes whose vocabularies obey the
    filter invariant."""
    import os
    import pyarrow.parquet as pq

    from lucene_ray.analysis import (length_stream, reverse_stream,
                                     truncate_stream)

    assert length_stream(["ab", "abc", "abcdefgh", "abcdefghi"]) == [
        "abc", "abcdefgh"]
    assert truncate_stream(["abcdefg", "ab"]) == ["abcde", "ab"]
    assert reverse_stream(["abc", "x"]) == ["cba", "x"]

    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import termdict_scan

    c = tmp_path / "c"
    os.makedirs(c)
    pq.write_table(generate_corpus(80, seed=42), str(c / "a.parquet"))
    for name, inv in (("length", lambda t: 3 <= len(t) <= 8),
                      ("truncate", lambda t: len(t) <= 5)):
        idx = Index.build(str(c), str(tmp_path / f"i_{name}"),
                          analyzer=name)
        terms = [t for t in
                 termdict_scan(idx.reader).column("term").to_pylist()
                 if ":" not in t]
        assert terms and all(inv(t) for t in terms)
    # reverse: a reversed frequent word must be searchable
    idx = Index.build(str(c), str(tmp_path / "i_rev"), analyzer="reverse")
    terms = [t for t in
             termdict_scan(idx.reader).column("term").to_pylist()
             if ":" not in t and len(t) >= 4]
    assert terms and len(idx.search(terms[0], 5)) > 0
