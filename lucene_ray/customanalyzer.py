"""CustomAnalyzer builder (analysis/custom/CustomAnalyzer.java:82):
compose a char-filter chain, a tokenizer, stream filters, and
vocabulary-level token filters — all by registered name — into one
``text -> tokens`` callable, exactly the
``CustomAnalyzer.builder().addCharFilter(...).withTokenizer(...)
.addTokenFilter(...)`` surface over this repo's four registries
(charfilter.CHAR_FILTERS, tokenizers.TOKENIZER_ANALYZERS,
analysis.STREAM_FILTERS, analysis_en.TOKEN_FILTERS)."""

from __future__ import annotations

from collections.abc import Callable


def build_analyzer(tokenizer: str = "standard",
                   char_filters: list[str] | None = None,
                   token_filters: list[str] | None = None
                   ) -> Callable[[str], list[str]]:
    """-> callable(text) -> tokens. ``token_filters`` may name stream
    filters (graph/window rewrites) and vocabulary filters (per-term
    maps; ``None`` results are dropped like StopFilter) in any order —
    each name resolves against the registry that owns it."""
    from .analysis import STREAM_FILTERS, tokenize
    from .analysis_en import TOKEN_FILTERS
    from .charfilter import CHAR_FILTERS
    from .tokenizers import TOKENIZER_ANALYZERS

    cfs = []
    for name in char_filters or []:
        if name not in CHAR_FILTERS:
            raise ValueError(f"unknown char filter {name!r}; known: "
                             f"{', '.join(CHAR_FILTERS)}")
        cfs.append(CHAR_FILTERS[name])

    if tokenizer == "standard":
        tok = tokenize
    elif tokenizer in TOKENIZER_ANALYZERS:
        tok = TOKENIZER_ANALYZERS[tokenizer]
    else:
        raise ValueError(
            f"unknown tokenizer {tokenizer!r}; known: standard, "
            f"{', '.join(TOKENIZER_ANALYZERS)}")

    stages = []
    for name in token_filters or []:
        if name in STREAM_FILTERS:
            stages.append(("stream", STREAM_FILTERS[name]))
        elif name in TOKEN_FILTERS:
            stages.append(("vocab", TOKEN_FILTERS[name]))
        else:
            known = [*STREAM_FILTERS, *TOKEN_FILTERS]
            raise ValueError(f"unknown token filter {name!r}; known: "
                             f"{', '.join(known)}")

    def analyze(text: str) -> list[str]:
        for cf in cfs:
            # CHAR_FILTERS values are text -> (text, OffsetMap)
            text = cf(text)[0]
        toks = tok(text)
        for kind, fn in stages:
            if kind == "stream":
                toks = fn(toks)
            else:
                toks = [t for t in fn(toks) if t is not None]
        return toks

    return analyze
