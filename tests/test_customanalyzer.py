"""CustomAnalyzer builder (analysis/custom/CustomAnalyzer.java:82):
named composition over the four registries."""

import pytest

from lucene_ray.customanalyzer import build_analyzer


def test_full_chain():
    a = build_analyzer(
        tokenizer="standard",
        char_filters=["html_strip"],
        token_filters=["stop_en", "porter2"])
    assert a("<b>the birds</b> are flying") == ["bird", "fli"]


def test_stream_and_vocab_mix():
    a = build_analyzer(token_filters=["cjk", "reverse"])
    # stream filter (cjk bigrams) then vocabulary filter (reverse)
    assert a("ab 東京都") == ["ba", "京東", "都京"]


def test_tokenizer_choice():
    a = build_analyzer(tokenizer="whitespace",
                       token_filters=["trim"])
    assert a("Foo BAR") == ["Foo", "BAR"]


def test_unknown_names_raise():
    with pytest.raises(ValueError, match="char filter"):
        build_analyzer(char_filters=["nope"])
    with pytest.raises(ValueError, match="tokenizer"):
        build_analyzer(tokenizer="nope")
    with pytest.raises(ValueError, match="token filter"):
        build_analyzer(token_filters=["nope"])
