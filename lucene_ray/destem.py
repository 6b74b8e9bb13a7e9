"""German "medium" stemmer (de/GermanStemmer.java:30 — the
GermanAnalyzer default before the light stemmers): mask-based
substitution of umlauts/digraphs, an iterative suffix strip whose
thresholds count the masked characters, the erin*/z optimizations,
mask resubstitution, and the gege particle removal. Gated on the
reference's de/data.txt vocabulary."""

from __future__ import annotations


def _substitute(b: list[str]) -> int:
    subst = 0
    c = 0
    while c < len(b):
        if c > 0 and b[c] == b[c - 1]:
            b[c] = "*"
        elif b[c] == "ä":
            b[c] = "a"
        elif b[c] == "ö":
            b[c] = "o"
        elif b[c] == "ü":
            b[c] = "u"
        elif b[c] == "ß":
            b[c] = "s"
            b.insert(c + 1, "s")
            subst += 1
        if c < len(b) - 1:
            if c < len(b) - 2 and b[c] == "s" and b[c + 1] == "c" \
                    and b[c + 2] == "h":
                b[c] = "$"
                del b[c + 1:c + 3]
                subst += 2
            elif b[c] == "c" and b[c + 1] == "h":
                b[c] = "§"
                del b[c + 1]
                subst += 1
            elif b[c] == "e" and b[c + 1] == "i":
                b[c] = "%"
                del b[c + 1]
                subst += 1
            elif b[c] == "i" and b[c + 1] == "e":
                b[c] = "&"
                del b[c + 1]
                subst += 1
            elif b[c] == "i" and b[c + 1] == "g":
                b[c] = "#"
                del b[c + 1]
                subst += 1
            elif b[c] == "s" and b[c + 1] == "t":
                b[c] = "!"
                del b[c + 1]
                subst += 1
        c += 1
    return subst


def _strip(b: list[str], subst: int) -> None:
    while len(b) > 3:
        n = len(b)
        if n + subst > 5 and b[n - 2] + b[n - 1] == "nd":
            del b[n - 2:]
        elif n + subst > 4 and b[n - 2] + b[n - 1] == "em":
            del b[n - 2:]
        elif n + subst > 4 and b[n - 2] + b[n - 1] == "er":
            del b[n - 2:]
        elif b[-1] in "esnt":
            del b[-1]
        else:
            break


def _resubstitute(b: list[str]) -> None:
    c = 0
    while c < len(b):
        if b[c] == "*":
            b[c] = b[c - 1]
        elif b[c] == "$":
            b[c] = "s"
            b[c + 1:c + 1] = ["c", "h"]
        elif b[c] == "§":
            b[c] = "c"
            b.insert(c + 1, "h")
        elif b[c] == "%":
            b[c] = "e"
            b.insert(c + 1, "i")
        elif b[c] == "&":
            b[c] = "i"
            b.insert(c + 1, "e")
        elif b[c] == "#":
            b[c] = "i"
            b.insert(c + 1, "g")
        elif b[c] == "!":
            b[c] = "s"
            b.insert(c + 1, "t")
        c += 1


def german_stem(term: str) -> str:
    term = term.lower()
    if not term or not all(ch.isalpha() for ch in term):
        return term
    b = list(term)
    subst = _substitute(b)
    _strip(b, subst)
    # optimize: female plural professions (erin*) + irregular z->x
    if len(b) > 5 and "".join(b[-5:]) == "erin*":
        del b[-1]
        _strip(b, subst)
    if b and b[-1] == "z":
        b[-1] = "x"
    _resubstitute(b)
    # remove the gege particle denotion
    if len(b) > 4:
        for c in range(len(b) - 3):
            if "".join(b[c:c + 4]) == "gege":
                del b[c:c + 2]
                break
    return "".join(b)
