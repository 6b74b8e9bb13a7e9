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


# ---------------------------------------------------------------------------
# Korean (nori role): decompound modes, POS stop filter, reading form
# (ko/KoreanTokenizer.java:92, KoreanPartOfSpeechStopFilter.java:38,
# KoreanReadingFormFilter.java:30)

def _ko():
    from lucene_ray.lattice import KoreanEntry as E
    return [
        E("가나다", 50, "NNG", parts=["가나", "다"]),   # compound
        E("가나", 80, "NNG"),
        E("다", 80, "NNG"),
        E("는", 30, "J"),                              # josa → stopped
        E("漢字", 60, "NNG", reading="한자"),          # hanja + reading
    ]


def test_korean_decompound_modes():
    from lucene_ray.lattice import KoreanTokenizer

    text = "가나다는漢字"
    none = KoreanTokenizer(_ko(), decompound="none").segment_graph(text)
    assert [(t[0], t[4], t[5]) for t in none] == [
        ("가나다", 1, 1), ("漢字", 2, 1)]          # 는 dropped, inc donated
    disc = KoreanTokenizer(_ko(), decompound="discard").segment_graph(text)
    assert [(t[0], t[4], t[5]) for t in disc] == [
        ("가나", 1, 1), ("다", 1, 1), ("漢字", 2, 1)]
    mixed = KoreanTokenizer(_ko(), decompound="mixed").segment_graph(text)
    # compound stacks over its first part: posInc 0, posLength = #parts
    assert [(t[0], t[4], t[5]) for t in mixed] == [
        ("가나다", 1, 2), ("가나", 0, 1), ("다", 1, 1), ("漢字", 2, 1)]
    # offsets cover the original surfaces
    assert [(t[2], t[3]) for t in disc] == [(0, 2), (2, 3), (4, 6)]


def test_korean_pos_stop_and_reading():
    from lucene_ray.lattice import (KOREAN_DEFAULT_STOP_TAGS,
                                    KoreanEntry, KoreanTokenizer)

    assert {"J", "E", "XSN", "VSV"} <= KOREAN_DEFAULT_STOP_TAGS
    # custom stop set: keep josa, drop NNG part "다"
    tok = KoreanTokenizer(_ko(), decompound="discard",
                          stop_tags=frozenset({"NNG"}))
    assert tok.tokenize("가나다는") == ["는"]
    # reading form rewrites hanja to its hangul reading
    tok = KoreanTokenizer(_ko(), decompound="discard", reading_form=True)
    assert tok.tokenize("漢字가나다") == ["한자", "가나", "다"]
    # compound parts must spell the surface
    import pytest
    with pytest.raises(ValueError):
        KoreanEntry("가나다", parts=["가", "다"])
    with pytest.raises(ValueError):
        KoreanTokenizer(_ko() + [KoreanEntry("가나")])   # dup surface


def test_korean_unknown_runs_and_classes():
    from lucene_ray.lattice import (HANGUL, HANJA, KoreanTokenizer,
                                    korean_char_class)

    assert korean_char_class("가") == HANGUL
    assert korean_char_class("ㄱ") == HANGUL            # jamo
    assert korean_char_class("漢") == HANJA
    tok = KoreanTokenizer(_ko(), decompound="discard")
    g = tok.segment_graph("가나다모르는말")
    assert [t[0] for t in g] == ["가나", "다", "모르는말"]
    assert g[-1][1] == "UNKNOWN"


def test_chinese_lexicon_segmentation():
    """smartcn role, covered by the shared lattice core: a
    word-frequency-cost Chinese lexicon segments by min total cost —
    the observable behavior of analysis/cn/smart word segmentation
    (HHMMSegmenter's dictionary-probability path) over a user lexicon."""
    from lucene_ray.lattice import LatticeTokenizer

    lex = {"中华": 90, "中华人民": 60, "共和国": 40, "人民": 50,
           "中华人民共和国": 20, "人民共和国": 70}
    tok = LatticeTokenizer(lex)
    assert tok.tokenize("中华人民共和国") == ["中华人民共和国"]
    # search mode decomposes the compound (all-Han length penalty:
    # 2-char words pay none, so the 3-way split at 90+50+40+3000 beats
    # 中华人民+共和国 at 60+6000+40+3000)
    tok_s = LatticeTokenizer(lex, mode="search")
    assert tok_s.tokenize("中华人民共和国") == ["中华", "人民", "共和国"]


def test_lattice_grouped_run_cap_and_linear_scan():
    """The grouped-unknown precompute must honor
    MAX_UNKNOWN_WORD_LENGTH and stay O(n) on an all-same-class text."""
    import time

    from lucene_ray.lattice import (MAX_UNKNOWN_WORD_LENGTH,
                                    LatticeTokenizer)

    tok = LatticeTokenizer({})
    text = "가" * (MAX_UNKNOWN_WORD_LENGTH + 5)
    toks = tok.segment(text)
    assert toks[0][2] - toks[0][1] == MAX_UNKNOWN_WORD_LENGTH
    assert sum(t[2] - t[1] for t in toks) == len(text)
    t0 = time.perf_counter()
    tok.segment("나" * 20000)
    assert time.perf_counter() - t0 < 2.0       # quadratic would blow this
