"""Registry-wide never-throws fuzz: every registered char filter,
tokenizer, stream filter, vocabulary filter, and the two stateful
scanners must accept arbitrary mixed-script text (the simpleqp /
codec fuzz discipline applied to the whole analysis surface)."""

import random


def test_all_registered_surfaces_never_throw():
    random.seed(1234)
    from lucene_ray.analysis import STREAM_FILTERS, tokenize
    from lucene_ray.analysis_en import TOKEN_FILTERS
    from lucene_ray.charfilter import CHAR_FILTERS
    from lucene_ray.tokenizers import TOKENIZER_ANALYZERS
    from lucene_ray.urlemail import tokenize_urlemail
    from lucene_ray.wikipedia import tokenize_wikipedia

    pools = [
        lambda: chr(random.randint(32, 126)),
        lambda: chr(random.randint(0xA0, 0x2FF)),
        lambda: chr(random.randint(0x370, 0x3FF)),
        lambda: chr(random.randint(0x600, 0x6FF)),
        lambda: chr(random.randint(0x980, 0x9FF)),
        lambda: chr(random.randint(0xC00, 0xC7F)),
        lambda: chr(random.randint(0x4E00, 0x4EFF)),
        lambda: chr(random.randint(0xAC00, 0xACFF)),
        lambda: random.choice(" '\"[](){}|=.:;!?#@&%$_-/\\<>~`^*+,"),
        lambda: random.choice(["http://", "[[", "]]", "''", "==",
                               "mailto:", "@x.com", "{{", "}}"]),
    ]

    def rand_text(n):
        return "".join(random.choice(pools)() for _ in range(n))

    for _ in range(60):
        text = rand_text(random.randint(0, 120))
        toks = [t for t in text.split(" ") if t][:30]
        for f in TOKEN_FILTERS.values():
            f(list(toks))
        for f in STREAM_FILTERS.values():
            f(list(toks))
        for f in TOKENIZER_ANALYZERS.values():
            f(text)
        for f in CHAR_FILTERS.values():
            f(text)
        tokenize(text)
        tokenize_urlemail(text)
        tokenize_wikipedia(text)
