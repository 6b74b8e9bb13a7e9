"""Exact ASCIIFoldingFilter table: re-extract the reference switch and
assert the generated map, plus behavior goldens."""

import os
import re

import pytest

from lucene_ray.analysis_en import ascii_fold

_JAVA = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
         "lucene/analysis/miscellaneous/ASCIIFoldingFilter.java")


def test_table_matches_reference_switch():
    if not os.path.exists(_JAVA):
        pytest.skip("reference unavailable")
    src = open(_JAVA, encoding="utf-8").read()
    seg = src[src.index("switch (c) {"):]
    mapping = {}
    cases = []
    out_chars = []
    for line in seg.splitlines():
        line = line.strip()
        m = re.match(r"case '(\\u[0-9A-Fa-f]{4}|[^'])':", line)
        if m:
            if out_chars:
                for c in cases:
                    mapping[c] = "".join(out_chars)
                cases, out_chars = [], []
            lit = m.group(1)
            cases.append(chr(int(lit[2:], 16))
                         if lit.startswith("\\u") else lit)
            continue
        m = re.match(r"output\[outputPos\+\+\] = "
                     r"'(\\'|\\\\|\\u[0-9A-Fa-f]{4}|[^'])';", line)
        if m:
            lit = m.group(1)
            out_chars.append(
                "'" if lit == "\\'" else
                "\\" if lit == "\\\\" else
                chr(int(lit[2:], 16)) if lit.startswith("\\u") else lit)
            continue
        if line.startswith("default:"):
            if out_chars:
                for c in cases:
                    mapping[c] = "".join(out_chars)
            break
    from lucene_ray.asciifold_data import ASCII_FOLD_MAP
    assert ASCII_FOLD_MAP == mapping
    assert len(mapping) > 1200


def test_fold_goldens():
    # classic diacritics
    assert ascii_fold("café naïve Müller") == "cafe naive Muller"
    # table-only mappings NFKD cannot produce
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("øre đen þorn") == "ore den thorn"
    assert ascii_fold("Ǣsir ﬆop") == "AEsir stop"
    # folded punctuation and enclosed forms
    assert ascii_fold("«x» ‚y‘ ④") == '"x" \'y\' 4'
    # unmapped chars pass through (the reference default branch)
    assert ascii_fold("½ 中") == "½ 中"
    assert ascii_fold("plain") == "plain"
