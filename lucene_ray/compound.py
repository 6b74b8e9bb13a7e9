"""Compound-word decomposition (analysis/compound):

Dictionaries are matched case-insensitively (the reference tests
build CharArraySet(ignoreCase=true)); supply them lowercased.

- ``dictionary_decompose`` — DictionaryCompoundWordTokenFilter.java:73
  brute force: every dictionary subword of length [minSubword,
  maxSubword] at every offset, with the onlyLongestMatch /
  noSubwords (skip past the longest match) variants.
- ``Hyphenator`` — Liang's pattern hyphenation exactly as FOP's
  HyphenationTree (compound/hyphenation/HyphenationTree.java:276):
  class-map normalization with ignore-at-beginning/no-letters-after-
  end rules, exception list, interletter odd-value points bounded by
  remain/push char counts, synthetic 0/len endpoints.
- ``hyphenation_decompose`` — HyphenationCompoundWordTokenFilter.
  java:185: hyphen-point pairs filtered by size and (optionally) the
  dictionary, longest-first per start point, with the genitive
  one-shorter retry and the noSubMatches / noOverlappingMatches
  consumption rules.

The filter contract (CompoundWordTokenFilterBase.incrementToken):
the original token is emitted first, subwords follow stacked at the
same position; only tokens of length >= minWordSize decompose."""

from __future__ import annotations

import re


def dictionary_decompose(term: str, dictionary: frozenset[str],
                         min_word: int = 5, min_sub: int = 2,
                         max_sub: int = 15,
                         only_longest: bool = False,
                         no_subwords: bool = False) -> list[str]:
    """-> [term, subword, ...] (the base filter's emission order)."""
    out = [term]
    if len(term) < min_word:
        return out
    n = len(term)
    i = 0
    while i <= n - min_sub:
        longest = None
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            if term[i:i + j].lower() in dictionary:
                if only_longest or no_subwords:
                    if longest is None or len(longest) < j:
                        longest = term[i:i + j]
                else:
                    out.append(term[i:i + j])
        if longest is not None:
            out.append(longest)
            if no_subwords:
                i += len(longest) - 1
        i += 1
    return out


class Hyphenator:
    """Liang pattern hyphenation from a FOP hyphenation XML."""

    def __init__(self, xml_text: str):
        self.classmap: dict[str, str] = {}
        self.patterns: dict[str, tuple[int, ...]] = {}
        self.exceptions: dict[str, list[int]] = {}
        self.max_pat = 1
        body = re.sub(r"<!--.*?-->", "", xml_text, flags=re.S)
        m = re.search(r"<classes>(.*?)</classes>", body, re.S)
        if m:
            for group in m.group(1).split():
                if group:
                    for c in group:
                        self.classmap[c] = group[0]
        m = re.search(r"<patterns>(.*?)</patterns>", body, re.S)
        if m:
            for pat in m.group(1).split():
                chars = []
                vals = [0]
                for c in pat:
                    if c.isdigit():
                        vals[len(chars)] = int(c)
                    else:
                        chars.append(c)
                        vals.append(0)
                key = "".join(chars)
                self.patterns[key] = tuple(vals)
                self.max_pat = max(self.max_pat, len(key))
        m = re.search(r"<exceptions>(.*?)</exceptions>", body, re.S)
        if m:
            for exc in m.group(1).split():
                word = exc.replace("-", "")
                pts = []
                j = 0
                for part in exc.split("-")[:-1]:
                    j += len(part)
                    pts.append(j)
                self.exceptions[word] = pts

    def hyphenate(self, w: str, remain: int = 1,
                  push: int = 1) -> list[int] | None:
        """-> hyphenation points [0, p1, ..., len] over the LETTER
        part of ``w`` (offset by the ignored prefix), or None."""
        # normalize through the class map (HyphenationTree.java:281)
        norm: list[str] = []
        ignore_begin = 0
        end_of_letters = False
        for i, c in enumerate(w):
            nc = self.classmap.get(c)
            if nc is None:
                if i == ignore_begin:
                    ignore_begin += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None
                norm.append(nc)
        n = len(norm)
        if n < remain + push:
            return None
        sw = "".join(norm)
        pts: list[int] = []
        if sw in self.exceptions:
            pts = [j + ignore_begin for j in self.exceptions[sw]
                   if remain <= j < n - push]
        else:
            padded = "." + sw + "."
            il = [0] * (n + 3)
            for i in range(n + 1):
                limit = min(self.max_pat, len(padded) - i)
                for ln in range(1, limit + 1):
                    vals = self.patterns.get(padded[i:i + ln])
                    if vals is not None:
                        for k, v in enumerate(vals):
                            if v > il[i + k]:
                                il[i + k] = v
            pts = [i + ignore_begin for i in range(n)
                   if (il[i + 1] & 1) and remain <= i <= n - push]
        if not pts:
            return None
        return [0] + pts + [n]


def hyphenation_decompose(term: str, hyph: Hyphenator,
                          dictionary: frozenset[str] | None = None,
                          min_word: int = 5, min_sub: int = 2,
                          max_sub: int = 15,
                          only_longest: bool = False,
                          no_sub: bool = False,
                          no_overlap: bool = False) -> list[str]:
    """-> [term, subword, ...]."""
    out = [term]
    if len(term) < min_word:
        return out
    calc_sub = not only_longest and not no_sub and not no_overlap
    lt = term.lower()
    if dictionary is not None and not calc_sub and (
            lt in dictionary
            or (len(lt) > 1 and lt[:-1] in dictionary)):
        return out
    hyp = hyph.hyphenate(term, 1, 1)
    if hyp is None:
        return out
    max_sub = min(max_sub, len(term) - 1)
    consumed = -1
    i = 0
    while i < len(hyp):
        if no_overlap:
            i = max(i, consumed)
            if i >= len(hyp):
                break
        start = hyp[i]
        until = max(consumed, i) if no_sub else i
        for j in range(len(hyp) - 1, until, -1):
            part = hyp[j] - start
            if part > max_sub:
                continue
            if part < min_sub:
                break
            if dictionary is None or \
                    lt[start:start + part] in dictionary:
                out.append(term[start:start + part])
                consumed = j
                if not calc_sub:
                    break
            elif lt[start:start + part - 1] in dictionary:
                out.append(term[start:start + part - 1])
                consumed = j
                if not calc_sub:
                    break
        i += 1
    return out
