"""Second token-filter batch: CommonGrams, HyphenatedWords,
Fingerprint, LimitTokenCount, KeepWord, DecimalDigit, Apostrophe,
Elision, Capitalization, TypeTokenFilter — stream/vocab goldens pinned
to the reference tests plus Index.build integration."""

import os

import pyarrow.parquet as pq

from lucene_ray.analysis import (FINGERPRINT_MAX_OUTPUT,
                                 LIMIT_TOKEN_COUNT, common_grams_stream,
                                 fingerprint_stream, hyphenated_stream,
                                 limit_count_stream)
from lucene_ray.analysis_en import (KEEP_WORDS, apostrophe_token_filter,
                                    capitalization_filter,
                                    decimal_digit_filter, elision_filter,
                                    keep_word_filter)
from lucene_ray.tokenizers import classic_alpha_tokenize


def test_common_grams_goldens():
    """TestCommonGramsFilter cases (common set = English stop list
    here, so 'the'/'of' are the common words)."""
    assert common_grams_stream(["the", "quick", "brown"]) == \
        ["the", "the_quick", "quick", "brown"]
    assert common_grams_stream(["the", "fox", "of"]) == \
        ["the", "the_fox", "fox", "fox_of", "of"]
    assert common_grams_stream(["of", "the", "fox"]) == \
        ["of", "of_the", "the", "the_fox", "fox"]
    assert common_grams_stream(["of", "the", "of"]) == \
        ["of", "of_the", "the", "the_of", "of"]
    assert common_grams_stream(["quick", "brown"]) == ["quick", "brown"]
    assert common_grams_stream([]) == []


def test_hyphenated_words():
    """HyphenatedWordsFilter javadoc example + trailing-hyphen
    restoration (HyphenatedWordsFilter.java:73)."""
    assert hyphenated_stream(
        ["ecologi-", "cal", "devel-", "oper"]) == \
        ["ecological", "developer"]
    # consecutive hyphen-enders accumulate
    assert hyphenated_stream(["electro-", "magnetic-", "lithography"]) \
        == ["electromagneticlithography"]
    # stream ending mid-accumulation restores the hyphen
    assert hyphenated_stream(["oops-"]) == ["oops-"]
    assert hyphenated_stream(["plain", "words"]) == ["plain", "words"]


def test_fingerprint():
    assert fingerprint_stream(["b", "a", "b", "c"]) == ["a b c"]
    assert fingerprint_stream([]) == []
    # UTF-16 order, dedup
    assert fingerprint_stream(["z", "a", "z"]) == ["a z"]
    # over max output size -> no token
    big = ["x" * 600, "y" * 600]
    assert len(" ".join(sorted(set(big)))) > FINGERPRINT_MAX_OUTPUT
    assert fingerprint_stream(big) == []


def test_limit_count():
    toks = [str(i) for i in range(30)]
    assert limit_count_stream(toks) == toks[:LIMIT_TOKEN_COUNT]
    assert limit_count_stream(["a"]) == ["a"]


def test_vocab_filters():
    assert keep_word_filter(["join", "zebra", "data"]) == \
        ["join", None, "data"]
    assert sorted(KEEP_WORDS)[0]  # non-empty set
    # DecimalDigitFilter: Arabic-Indic + Extended Arabic + Devanagari
    assert decimal_digit_filter(["٣٤", "۵", "१२", "abc"]) == \
        ["34", "5", "12", "abc"]
    # ApostropheFilter: truncate at first ' or U+2019
    assert apostrophe_token_filter(["türkiye'den", "a’b", "plain"]) == \
        ["türkiye", "a", "plain"]
    # ElisionFilter: article prefixes only
    assert elision_filter(
        ["l'avion", "d'art", "qu'il", "x'y", "jusqu'au"]) == \
        ["avion", "art", "il", "x'y", "au"]
    # CapitalizationFilter defaults: first sub-word Upper+lower-rest,
    # later sub-words all-lower ('.' is a sub-word break)
    assert capitalization_filter(["hello", "wOrLd", "3.14", "a.bC"]) == \
        ["Hello", "World", "3.14", "A.bc"]


def test_type_token_filter():
    """TypeTokenFilter whitelist over classic types: only ALPHANUM and
    APOSTROPHE survive."""
    assert classic_alpha_tokenize(
        "foo 21.35 AT&T bar's a@b.cd www.x.org U.S.A. baz") == \
        ["foo", "bar", "baz"]
    assert classic_alpha_tokenize("O'Reilly don't") == \
        ["o'reilly", "don't"]


def test_build_integration(tmp_path, ray_session):
    """Index.build with the new analyzer names: vocabulary invariants
    through the real engine."""
    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import termdict_scan

    c = tmp_path / "c"
    os.makedirs(c)
    pq.write_table(generate_corpus(60, seed=11), str(c / "a.parquet"))

    # fingerprint: one term per doc, sorted-unique invariant. The
    # minted token exceeds max_token_length (255) by design — the
    # overlong reroute must NOT fall back to standard tokens
    # (regression: the reroute used to re-tokenize without the stream
    # filter, silently shredding every fingerprint > 255 chars).
    idx = Index.build(str(c), str(tmp_path / "i_fp"),
                      analyzer="fingerprint")
    terms = [t for t in
             termdict_scan(idx.reader).column("term").to_pylist()
             if ":" not in t]
    assert terms
    assert all(" " in t for t in terms)            # no shredded unigrams
    assert any(len(t) > 255 for t in terms)        # long ones survived
    for t in terms:
        ws = t.split(" ")
        assert ws == sorted(set(ws))

    # limit20: no doc has field_len > 20
    idx = Index.build(str(c), str(tmp_path / "i_lim"), analyzer="limit20")
    dm = pq.read_table(os.path.join(str(tmp_path / "i_lim"), "docmeta"),
                       columns=["field_len"])
    assert dm.column("field_len").to_numpy().max() <= LIMIT_TOKEN_COUNT

    # capitalization: every vocab term starts upper-or-nonletter
    idx = Index.build(str(c), str(tmp_path / "i_cap"),
                      analyzer="capitalization")
    terms = [t for t in
             termdict_scan(idx.reader).column("term").to_pylist()
             if ":" not in t]
    assert terms and all(not t[0].islower() for t in terms)

    # common_grams searchable: a bigram term exists for stop neighbors
    idx = Index.build(str(c), str(tmp_path / "i_cg"),
                      analyzer="common_grams")
    terms = set(t for t in
                termdict_scan(idx.reader).column("term").to_pylist()
                if ":" not in t)
    assert any("_" in t for t in terms)


def test_delimited_tf_stream():
    """DelimitedTermFrequencyTokenFilter (miscellaneous/
    DelimitedTermFrequencyTokenFilter.java:38) — the factory test
    cases: 'one|1 two|2 three|3' and pass-through of undelimited."""
    from lucene_ray.analysis import delimited_tf_stream as f
    assert f(["one|1", "two|2", "three|3"]) == \
        ["one", "two", "two", "three", "three", "three"]
    assert f(["plain", "x|y", "|5", "a|0"]) == ["plain", "x|y", "|5"]


def test_common_grams_query_stream():
    """CommonGramsQueryFilter (commongrams/CommonGramsQueryFilter.
    java:85) — the full TestCommonGramsFilter query battery (common
    words here from the English stop set: of/the)."""
    from lucene_ray.analysis import common_grams_query_stream as f
    cases = {
        "brown fox": ["brown", "fox"],
        "the fox": ["the_fox"],
        "fox of": ["fox_of"],
        "of the": ["of_the"],
        "the": ["the"],
        "foo": ["foo"],
        "quick brown fox": ["quick", "brown", "fox"],
        "quick brown the": ["quick", "brown_the"],
        "quick the brown": ["quick_the", "the_brown"],
        "fox of the": ["fox_of", "of_the"],
        "the quick brown": ["the_quick", "quick", "brown"],
        "the fox of": ["the_fox", "fox_of"],
        "of the fox": ["of_the", "the_fox"],
        "of the of": ["of_the", "the_of"],
    }
    for text, want in cases.items():
        assert f(text.split()) == want, text


def test_auto_stop_words(ray_session, tmp_path):
    """QueryAutoStopWordAnalyzer role (query/QueryAutoStopWordAnalyzer
    .java:79): df-derived stop set from the index's distributed term
    dictionary."""
    import pyarrow.parquet as pq
    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus
    c = tmp_path / "c"
    c.mkdir()
    pq.write_table(generate_corpus(120, seed=7), str(c / "a.parquet"))
    idx = Index.build(str(c), str(tmp_path / "i"))
    n = idx.doc_count()
    stops = idx.auto_stop_words(max_percent_docs=0.5)
    # every derived stop word really has df above the threshold, and
    # a sampled non-member does not
    assert stops
    for w in list(stops)[:5]:
        assert idx.term_stats(w)[0] > 0.5 * n
    assert idx.auto_stop_words(max_doc_freq=n) == frozenset()
