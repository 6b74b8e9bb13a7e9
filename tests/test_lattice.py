"""Viterbi lattice tokenizer goldens (kuromoji role): min-cost path
selection, unknown-word invoke/group semantics per the mecab char.def
roles, and search-mode compound splitting pinned to the reference's
penalty constants (ja/ViterbiNBest.java:82-102)."""

from lucene_ray.lattice import (DEFAULT_CONN, LatticeTokenizer,
                                lattice_tokenize_fn)


def toks(text, lexicon, **kw):
    return LatticeTokenizer(lexicon, **kw).tokenize(text)


def test_min_cost_path_wins():
    lex = {"a": 10, "ab": 5, "b": 10, "bc": 10, "c": 4, "abc": 100}
    # paths over "abc": ab+c=9, a+bc=20, a+b+c=24, abc=100
    assert toks("abc", lex) == ["ab", "c"]


def test_tie_breaks_to_first_completed_path():
    # a+bc and ab+c both cost 20; the forward pass keeps the arc that
    # reached position 3 first (strict `<` update, as the reference's
    # leastCost comparison) — bc is relaxed from pos 1 before c from 2
    lex = {"a": 10, "ab": 10, "bc": 10, "c": 10}
    assert toks("abc", lex) == ["a", "bc"]


def test_connection_costs_steer_the_path():
    lex = {"a": 10, "ab": 10, "bc": 10, "c": 10}
    conn = dict(DEFAULT_CONN)
    conn[(0, 0)] = 100           # DICT->DICT now expensive
    # a+bc: BOS->a (0) + a->bc (100) = 120; ab+c likewise 120; still a
    # tie resolved identically — but making the SECOND arc free flips it
    assert toks("abc", lex, conn=conn) == ["a", "bc"]
    lex2 = {"a": 10, "ab": 11, "bc": 10, "c": 10}
    assert toks("abc", lex2) == ["a", "bc"]
    lex3 = {"a": 11, "ab": 10, "bc": 10, "c": 10}
    assert toks("abc", lex3) == ["ab", "c"]


def test_unknown_run_grouped():
    # NUMERIC has group=1: the whole same-class run is ONE unknown token
    lex = {"abc": 10, "def": 10}
    out = LatticeTokenizer(lex).segment("abc123def")
    assert [(s, k) for s, _, _, k in out] == [
        ("abc", True), ("123", False), ("def", True)]
    # ...and the grouped unknown swallows same-class dictionary words
    # downstream, exactly as the reference's single grouped candidate
    # does (ja/ViterbiNBest.java:131-149: ONE candidate spanning the
    # whole run; no shorter unknown alternatives)
    out = LatticeTokenizer(lex).segment("abcXYZdef")
    assert [(s, k) for s, _, _, k in out] == [
        ("abc", True), ("XYZdef", False)]


def test_unknown_kanji_single_char():
    # KANJI has group=0: unknown kanji emit one char at a time
    assert toks("漢字", {}) == ["漢", "字"]


def test_invoke_semantics():
    # ALPHA invoke=1: unknown competes even when a dictionary word
    # matched — and wins here on cost
    out = LatticeTokenizer({"ab": 50000}).segment("ab")
    assert out == [("ab", 0, 2, False)]
    # KANJI invoke=0: no unknown candidate where a dict word starts
    out = LatticeTokenizer({"漢字": 50000}).segment("漢字")
    assert out == [("漢字", 0, 2, True)]


def test_digit_run_grouped():
    assert toks("12345", {}) == ["12345"]


def test_search_mode_splits_kanji_compounds():
    # the reference's canonical example: normal mode keeps the lexicon
    # compound, search mode pays (len-2)*3000 and decomposes
    # (ja/ViterbiNBest.java:82-102)
    lex = {"関西国際空港": 10,
           "関西": 20, "国際": 20, "空港": 20}
    text = "関西国際空港"
    assert toks(text, lex) == [text]
    assert toks(text, lex, mode="search") == [
        "関西", "国際", "空港"]


def test_search_mode_other_penalty():
    lex = {"abcdefghi": 100, "abcde": 50, "fghi": 50}
    assert toks("abcdefghi", lex) == ["abcdefghi"]
    # whole word pays (9-7)*1700 = 3400 in search mode
    assert toks("abcdefghi", lex, mode="search") == ["abcde", "fghi"]


def test_mixed_script_boundaries():
    # katakana run grouped, hiragana run grouped, kanji singles
    assert toks("カタカナの漢", {}) == [
        "カタカナ", "の", "漢"]


def test_tokenize_fn_factory():
    fn = lattice_tokenize_fn({"wi": 1, "fi": 1})
    assert fn("wifi") == ["wi", "fi"]
    assert fn("") == []
