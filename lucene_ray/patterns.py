"""Pattern-driven tokenizer/filters (analysis/pattern):

- ``pattern_tokenize`` — PatternTokenizer.java:43: ``group=-1``
  splits on the pattern (empty pieces dropped), ``group>=0`` emits
  that group of every match (zero-length matches skipped).
- ``pattern_replace`` — PatternReplaceFilter.java:34: per-token
  regex replace (all or first occurrence).
- ``pattern_capture_groups`` — PatternCaptureGroupTokenFilter.
  java:65: one token per capture group per match per pattern,
  ordered by capture START across all patterns (the nextCapture
  min-offset merge), skipping zero-length captures and — when the
  original is preserved — whole-token captures; without
  preserveOriginal the first capture replaces the original token.
"""

from __future__ import annotations

import re


def pattern_tokenize(text: str, rx: re.Pattern,
                     group: int = -1) -> list[str]:
    if group >= 0:
        out = []
        for m in rx.finditer(text):
            if m.end(group) > m.start(group):
                out.append(m.group(group))
        return out
    # split manually: re.split would leak capture-group text into the
    # pieces, which Java's split-mode tokenizer never does
    out = []
    last = 0
    for m in rx.finditer(text):
        if m.end() == m.start():
            continue
        if m.start() > last:
            out.append(text[last:m.start()])
        last = m.end()
    if last < len(text):
        out.append(text[last:])
    return out


def pattern_replace(token: str, rx: re.Pattern, replacement: str,
                    replace_all: bool = True) -> str:
    return rx.sub(replacement, token, count=0 if replace_all else 1)


def pattern_capture_groups(token: str,
                           patterns: list[re.Pattern],
                           preserve_original: bool = False
                           ) -> list[str]:
    def caps(rx: re.Pattern):
        for m in rx.finditer(token):
            for g in range(1, rx.groups + 1):
                s, e = m.start(g), m.end(g)
                if s < 0 or s == e:
                    continue
                if preserve_original and s == 0 and e == len(token):
                    continue
                yield (s, e)

    iters = [iter(caps(rx)) for rx in patterns]
    heads = [next(it, None) for it in iters]
    spans: list[tuple[int, int]] = []
    while True:
        best = -1
        for i, h in enumerate(heads):
            if h is not None and (best < 0 or h[0] < heads[best][0]):
                best = i
        if best < 0:
            break
        spans.append(heads[best])
        heads[best] = next(iters[best], None)
    caps_txt = [token[s:e] for s, e in spans]
    if preserve_original:
        return [token] + caps_txt
    return caps_txt if caps_txt else [token]
