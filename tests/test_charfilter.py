"""CharFilter framework: HTMLStrip goldens from
TestHTMLStripCharFilter, Mapping/PatternReplace semantics, offset
correction (correctOffset contract), and build integration with
stored offsets anchored to the ORIGINAL text."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_ray.charfilter import (CHAR_FILTERS, html_strip,
                                   make_mapping_char_filter,
                                   make_pattern_replace_char_filter)


def test_html_strip_reference_golden():
    """TestHTMLStripCharFilter.test(): the full gold string."""
    html = ('<div class="foo">this is some text</div> here is a '
            '<a href="#bar">link</a> and another '
            '<a href="http://lucene.apache.org/">link</a>. '
            'This is an entity: &amp; plus a &lt;.  Here is an &. '
            '<!-- is a comment -->')
    gold = ('\nthis is some text\n here is a link and another link. '
            'This is an entity: & plus a <.  Here is an &. ')
    assert html_strip(html)[0] == gold


def test_html_strip_entities():
    """testEntities / testMoreEntities / testGamma: named (nbsp -> ' '
    exactly as the reference table), decimal and hex refs."""
    assert html_strip(
        "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;"
    )[0] == "  <foo> Übermensch = Γ bar Γ"
    assert html_strip("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and "
                      "&#8217;")[0] == "  <junk/>   ! @ and ’"
    assert html_strip("&Gamma;")[0] == "Γ"
    # unknown entity and bare & / < pass through
    assert html_strip("&bogus12; a < b & c")[0] == "&bogus12; a < b & c"
    # accepted uppercase variants
    assert html_strip("&LT;x&GT; &AMP;")[0] == "<x> &"


def test_html_strip_structure():
    # inline vanishes, block becomes newline, br becomes newline
    assert html_strip("x<span>y</span>z")[0] == "xyz"
    assert html_strip("x<p>y</p>z")[0] == "x\ny\nz"
    assert html_strip("a<br>b<br/>c")[0] == "a\nb\nc"
    # script/style content entirely replaced
    assert html_strip("a<script>var x=1;<b></script>b")[0] == "a\nb"
    assert html_strip("a<style>p{color:red}</style>b")[0] == "a\nb"
    # comments, doctype, processing instructions vanish
    assert html_strip("<!DOCTYPE html><!-- c -->hi<?php e ?>")[0] == "hi"
    # CDATA content kept verbatim
    assert html_strip("<![CDATA[x < y]]>")[0] == "x < y"


def test_html_strip_escaped_tags():
    """testReserved: tags in the escaped set are emitted verbatim."""
    t = ('aaa bbb <reserved ccc="ddddd"> eeee </reserved> fff '
         '<reserved ggg="hhhh"/> <other/>')
    out, _ = html_strip(t, frozenset({"reserved"}))
    assert '<reserved ccc="ddddd">' in out
    assert '</reserved>' in out
    assert '<reserved ggg="hhhh"/>' in out
    assert '<other/>' not in out


def test_offset_correction():
    """correctOffset: every token's corrected span points at its
    surface form in the ORIGINAL text."""
    html = ('<div class="foo">this is some text</div> here is a '
            '<a href="#bar">link</a> and &amp;more')
    out, om = html_strip(html)
    for tok in ("this", "text", "here", "link", "more"):
        p = out.index(tok)
        o = om.correct(p)
        assert html[o:o + len(tok)] == tok, (tok, o)
    # array form agrees with scalar form
    offs = np.array([out.index(t) for t in ("this", "link")],
                    dtype=np.int64)
    np.testing.assert_array_equal(
        om.correct_array(offs),
        np.array([om.correct(int(x)) for x in offs]))


def test_mapping_char_filter():
    mp = make_mapping_char_filter({"qu": "k", "0": "o", "1": "l"})
    out, om = mp("query 01 quit")
    assert out == "kery ol kit"
    # longest match wins (NormalizeCharMap greedy semantics)
    mp2 = make_mapping_char_filter({"a": "y", "ab": "X"})
    assert mp2("abc a")[0] == "Xc y"
    # offsets: token after a shrunk rule still corrects into original
    out, om = mp("query data")
    p = out.index("data")
    assert "query data"[om.correct(p):][:4] == "data"


def test_pattern_replace_char_filter():
    pr = make_pattern_replace_char_filter("[aeiou]+", "a")
    assert pr("queue data")[0] == "qa data"
    assert pr("xyz")[0] == "xyz"
    # group expansion
    pr2 = make_pattern_replace_char_filter(r"(\d+)-(\d+)", r"\2:\1")
    assert pr2("a 12-34 b")[0] == "a 34:12 b"


def test_build_integration(tmp_path, ray_session):
    """Index.build(analyzer='html_strip') + offsets: markup never
    reaches the vocabulary, stored offsets anchor into the ORIGINAL
    (markup-bearing) content, and query-side analyze strips too."""
    from lucene_ray.build import build_index
    from lucene_ray.highlight import retrieve_content
    from lucene_ray.search import IndexReader, termdict_scan

    c = tmp_path / "c"
    os.makedirs(c)
    docs = [f"<div>alpha{i}</div> plain <b>bold{i}</b> &amp; tail"
            for i in range(20)]
    pq.write_table(pa.table({
        "repo": ["r"] * 20,
        "path": [f"f{i}.html" for i in range(20)],
        "commit": ["c" * 40] * 20,
        "lang": ["html"] * 20,
        "content": docs,
    }), str(c / "a.parquet"))
    idx = str(tmp_path / "i")
    build_index(str(c), idx, analyzer="html_strip",
                with_positions=True, with_offsets=True)
    r = IndexReader(idx)
    terms = [t for t in termdict_scan(r).column("term").to_pylist()
             if ":" not in t]
    assert "div" not in terms and "amp" not in terms
    assert any(t.startswith("alpha") for t in terms)
    assert r.analyze("<p>alpha0</p>") == ["alpha0"]
    # stored offsets point at the original markup-bearing content
    dm = pq.read_table(os.path.join(idx, "docmeta"),
                       columns=["doc_id", "tok_starts", "tok_ends"])
    row = dm.to_pylist()[0]
    content = retrieve_content(r, row["doc_id"])
    spans = [content[s:e]
             for s, e in zip(row["tok_starts"], row["tok_ends"])]
    # Each corrected span starts exactly at the token's surface form in
    # the ORIGINAL html. Exclusive END offsets that land on a stripped
    # closing tag extend past it — BaseCharFilter.correctOffset applies
    # a strip's cumulative diff AT the registration point (>= semantics,
    # BaseCharFilter.java:36), so 'bold0' spans 'bold0</b>' in the
    # reference too.
    toks = r.analyze(content)
    assert len(spans) == len(toks)
    for sp, t in zip(spans, toks):
        assert sp.lower().startswith(t), (sp, t)


def test_registry():
    assert set(CHAR_FILTERS) >= {"html_strip", "mapping",
                                 "pattern_replace"}
    from lucene_ray.analysis_en import get_token_filter
    assert get_token_filter("html_strip") is None
