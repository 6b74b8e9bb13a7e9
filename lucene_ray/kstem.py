"""KStem — the Krovetz English stemmer (``analysis/en/KStemmer.java:72``,
KStemFilter.java:44), a dictionary-gated morphological stemmer: every
ending rule proposes candidate roots and accepts the first one found in
the built-in lexicon (KStemData1-8 + exception/conflation/nationality/
supplement/proper-noun tables, ``initializeDictHash``
KStemmer.java:640-767).

Literal transcription: the ``word``/``j``/``k`` cursor state machine,
``endsIn``'s j side effects (the char-array overload leaves ``j = k``
on a mid-loop mismatch — ionEndings' ``j = k - 3`` YCS fix-up depends
on it), ``lookup()`` keyed on the WORD BUFFER length (not ``k``),
``wordInDict``'s sticky non-exception cache vs ``lookup``'s
unconditional overwrite, every ending routine's restore path including
the alEndings "ERROR" lookup quirk (KStemmer.java:1641) and
iveEndings' -ive→-ion probe that leaves ``k`` stale on success
(irrelevant: the driver breaks on match), and the driver's
single-pass rule ladder (:1758-1800).  Terms must be lowercase a-z,
length 3..49 (:1720-1735); dictionary hits return the entry root (may
be the word itself).

Gated on the reference's full ``kstemTestData.zip`` vocabulary in
tests/test_kstem.py; the data tables are GENERATED from the Java
sources with a re-extraction equality test.
"""

from __future__ import annotations

from .kstem_data import (COUNTRY_NATIONALITY, DICT_WORDS,
                         DIRECT_CONFLATIONS, EXCEPTION_WORDS,
                         PROPER_NOUNS, SUPPLEMENT_DICT)

MAX_WORD_LEN = 50

_EXCEPTION = object()        # root == word, exception flag
_DEFAULT = object()          # root == None


def _build_dict() -> dict:
    d: dict[str, tuple[str | None, bool]] = {}
    for w in EXCEPTION_WORDS:
        d[w] = (w, True)
    for a, b in DIRECT_CONFLATIONS:
        d[a] = (b, False)
    for a, b in COUNTRY_NATIONALITY:
        d[a] = (b, False)
    for w in DICT_WORDS:
        d.setdefault(w, (None, False))
    for w in SUPPLEMENT_DICT:
        d.setdefault(w, (None, False))
    for w in PROPER_NOUNS:
        d.setdefault(w, (None, False))
    return d


_DICT = _build_dict()
_VOWELS = frozenset("aeiou")


class _KStem:
    __slots__ = ("word", "j", "k", "matched")

    def __init__(self):
        self.word: list[str] = []
        self.j = 0
        self.k = 0
        self.matched: tuple | None = None

    # -- cursor helpers -------------------------------------------------

    def _is_cons(self, i: int) -> bool:
        ch = self.word[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self._is_cons(i - 1)

    def _is_vowel(self, i: int) -> bool:
        return not self._is_cons(i)

    def _ends_arr(self, s: str) -> bool:
        if len(s) > self.k:
            return False
        r = len(self.word) - len(s)
        self.j = self.k
        for i in range(len(s)):
            if s[i] != self.word[r + i]:
                return False
        self.j = r - 1
        return True

    def _ends2(self, a: str, b: str) -> bool:
        if 2 > self.k:
            return False
        w = self.word
        if w[self.k - 1] == a and w[self.k] == b:
            self.j = self.k - 2
            return True
        return False

    def _ends3(self, a: str, b: str, c: str) -> bool:
        if 3 > self.k:
            return False
        w = self.word
        if w[self.k - 2] == a and w[self.k - 1] == b and w[self.k] == c:
            self.j = self.k - 3
            return True
        return False

    def _ends4(self, a: str, b: str, c: str, d: str) -> bool:
        if 4 > self.k:
            return False
        w = self.word
        if (w[self.k - 3] == a and w[self.k - 2] == b
                and w[self.k - 1] == c and w[self.k] == d):
            self.j = self.k - 4
            return True
        return False

    def _set_len(self, n: int) -> None:
        del self.word[n:]

    def _write(self, ch: str) -> None:
        self.word.append(ch)

    def _append(self, s: str) -> None:
        self.word.extend(s)

    def _set_char(self, i: int, ch: str) -> None:
        if i == len(self.word):
            self.word.append(ch)
        else:
            self.word[i] = ch

    def _set_suffix(self, s: str) -> None:
        self._set_len(self.j + 1)
        self._append(s)
        self.k = self.j + len(s)

    def _lookup(self) -> bool:
        self.matched = _DICT.get("".join(self.word))
        return self.matched is not None

    def _word_in_dict(self):
        if self.matched is not None:
            return self.matched
        e = _DICT.get("".join(self.word))
        if e is not None and not e[1]:
            self.matched = e
        return e

    def _double_c(self, i: int) -> bool:
        if i < 1:
            return False
        if self.word[i] != self.word[i - 1]:
            return False
        return self._is_cons(i)

    def _vowel_in_stem(self) -> bool:
        return any(self._is_vowel(i) for i in range(self.j + 1))

    # -- ending routines (KStemmer.java:838-1700) -----------------------

    def _plural(self):
        w = self.word
        if w[self.k] != "s":
            return
        if self._ends3("i", "e", "s"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            self._write("s")
            self._set_suffix("y")
            self._lookup()
        elif self._ends2("e", "s"):
            self._set_len(self.j + 2)
            self.k -= 1
            try_e = self.j > 0 and not (w[self.j] == "s"
                                        and w[self.j - 1] == "s")
            if try_e and self._lookup():
                return
            self._set_len(self.j + 1)
            self.k -= 1
            if self._lookup():
                return
            self._write("e")
            self.k += 1
            if not try_e:
                self._lookup()
            return
        else:
            if (len(w) > 3 and w[self.k - 1] != "s"
                    and not self._ends3("o", "u", "s")):
                self._set_len(self.k)
                self.k -= 1
                self._lookup()

    def _past_tense(self):
        if len(self.word) <= 4:
            return
        if self._ends3("i", "e", "d"):
            self._set_len(self.j + 3)
            self.k -= 1
            if self._lookup():
                return
            self.k += 1
            self._write("d")
            self._set_suffix("y")
            self._lookup()
            return
        if self._ends2("e", "d") and self._vowel_in_stem():
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self._write(self.word[self.k])
                self.k += 1
                self._lookup()
                return
            if self.word[0] == "u" and self.word[1] == "n":
                self._write("e")
                self._write("d")
                self.k += 2
                return
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            return

    def _aspect(self):
        if len(self.word) <= 5:
            return
        if self._ends3("i", "n", "g") and self._vowel_in_stem():
            self._set_char(self.j + 1, "e")
            self._set_len(self.j + 2)
            self.k = self.j + 1
            entry = self._word_in_dict()
            if entry is not None and not entry[1]:
                return
            self._set_len(self.k)
            self.k -= 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self.k -= 1
                self._set_len(self.k + 1)
                if self._lookup():
                    return
                self._write(self.word[self.k])
                self.k += 1
                self._lookup()
                return
            if self.j > 0 and self._is_cons(self.j) \
                    and self._is_cons(self.j - 1):
                self.k = self.j
                self._set_len(self.k + 1)
                return
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            return

    def _ity_endings(self):
        old_k = self.k
        if self._ends3("i", "t", "y"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_char(self.j + 1, "i")
            self._append("ty")
            self.k = old_k
            w = self.word
            if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "l":
                self._set_len(self.j - 1)
                self._append("le")
                self.k = self.j
                self._lookup()
                return
            if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "v":
                self._set_len(self.j + 1)
                self._write("e")
                self.k = self.j + 1
                self._lookup()
                return
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "l":
                self._set_len(self.j + 1)
                self.k = self.j
                self._lookup()
                return
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            return

    def _nce_endings(self):
        old_k = self.k
        if self._ends3("n", "c", "e"):
            word_char = self.word[self.j]
            if word_char not in ("e", "a"):
                return
            self._set_len(self.j)
            self._write("e")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            self._write(word_char)
            self._append("nce")
            self.k = old_k

    def _ness_endings(self):
        if self._ends4("n", "e", "s", "s"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self.word[self.j] == "i":
                self._set_char(self.j, "y")
            self._lookup()

    def _ism_endings(self):
        if self._ends3("i", "s", "m"):
            self._set_len(self.j + 1)
            self.k = self.j
            self._lookup()

    def _ment_endings(self):
        old_k = self.k
        if self._ends4("m", "e", "n", "t"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._append("ment")
            self.k = old_k

    def _ize_endings(self):
        old_k = self.k
        if self._ends3("i", "z", "e"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("i")
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.word[self.j - 1])
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ize")
            self.k = old_k

    def _ncy_endings(self):
        if self._ends3("n", "c", "y"):
            if self.word[self.j] not in ("e", "a"):
                return
            self._set_char(self.j + 2, "t")
            self._set_len(self.j + 3)
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_char(self.j + 2, "c")
            self._write("e")
            self.k = self.j + 3
            self._lookup()

    def _ble_endings(self):
        old_k = self.k
        if self._ends3("b", "l", "e"):
            if self.word[self.j] not in ("a", "i"):
                return
            word_char = self.word[self.j]
            self._set_len(self.j)
            self.k = self.j - 1
            if self._lookup():
                return
            if self._double_c(self.k):
                self._set_len(self.k)
                self.k -= 1
                if self._lookup():
                    return
                self.k += 1
                self._write(self.word[self.k - 1])
            self._set_len(self.j)
            self._write("e")
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j)
            self._append("ate")
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j)
            self._write(word_char)
            self._append("ble")
            self.k = old_k

    def _ic_endings(self):
        if self._ends2("i", "c"):
            self._set_len(self.j + 3)
            self._append("al")
            self.k = self.j + 4
            if self._lookup():
                return
            self._set_char(self.j + 1, "y")
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_char(self.j + 1, "e")
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._append("ic")
            self.k = self.j + 2

    def _ion_endings(self):
        old_k = self.k
        if not self._ends3("i", "o", "n"):
            return
        if self._ends_arr("ization"):
            self._set_len(self.j + 3)
            self._write("e")
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends_arr("ition"):
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ition")
            self.k = old_k
        elif self._ends_arr("ation"):
            self._set_len(self.j + 3)
            self._write("e")
            self.k = self.j + 3
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ation")
            self.k = old_k
        if self._ends_arr("ication"):
            self._set_len(self.j + 1)
            self._write("y")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ication")
            self.k = old_k
        # (always) — endsIn(ion) was checked on entry; set j per YCS
        self.j = self.k - 3
        self._set_len(self.j + 1)
        self._write("e")
        self.k = self.j + 1
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self.k = self.j
        if self._lookup():
            return
        self._set_len(self.j + 1)
        self._append("ion")
        self.k = old_k

    def _er_and_or_endings(self):
        old_k = self.k
        if self.word[self.k] != "r":
            return
        if self._ends4("i", "z", "e", "r"):
            self._set_len(self.j + 4)
            self.k = self.j + 3
            self._lookup()
            return
        if self._ends2("e", "r") or self._ends2("o", "r"):
            word_char = self.word[self.j + 1]
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.word[self.j - 1])
            if self.word[self.j] == "i":
                self._set_char(self.j, "y")
                self._set_len(self.j + 1)
                self.k = self.j
                if self._lookup():
                    return
                self._set_char(self.j, "i")
                self._write("e")
            if self.word[self.j] == "e":
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write("e")
            self._set_len(self.j + 2)
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._write(word_char)
            self._write("r")
            self.k = old_k

    def _ly_endings(self):
        old_k = self.k
        if self._ends2("l", "y"):
            self._set_char(self.j + 2, "e")
            if self._lookup():
                return
            self._set_char(self.j + 2, "y")
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            w = self.word
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "l":
                return
            self._append("ly")
            self.k = old_k
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "b":
                self._set_char(self.j + 2, "e")
                self.k = self.j + 2
                return
            if w[self.j] == "i":
                self._set_len(self.j)
                self._write("y")
                self.k = self.j
                if self._lookup():
                    return
                self._set_len(self.j)
                self._append("ily")
                self.k = old_k
            self._set_len(self.j + 1)
            self.k = self.j

    def _al_endings(self):
        old_k = self.k
        if len(self.word) < 4:
            return
        if self._ends2("a", "l"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            if self._double_c(self.j):
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._write(self.word[self.j - 1])
            self._set_len(self.j + 1)
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("um")
            self.k = self.j + 2
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("al")
            self.k = old_k
            w = self.word
            if self.j > 0 and w[self.j - 1] == "i" and w[self.j] == "c":
                self._set_len(self.j - 1)
                self.k = self.j - 2
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                self._write("y")
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                self._append("ic")
                self.k = self.j
                # the reference's "// ERROR" lookup (KStemmer.java:1641)
                self._lookup()
                return
            if w[self.j] == "i":
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._append("ial")
                self.k = old_k
                self._lookup()

    def _ive_endings(self):
        old_k = self.k
        if self._ends3("i", "v", "e"):
            self._set_len(self.j + 1)
            self.k = self.j
            if self._lookup():
                return
            self._write("e")
            self.k = self.j + 1
            if self._lookup():
                return
            self._set_len(self.j + 1)
            self._append("ive")
            w = self.word
            if self.j > 0 and w[self.j - 1] == "a" and w[self.j] == "t":
                self._set_char(self.j - 1, "e")
                self._set_len(self.j)
                self.k = self.j - 1
                if self._lookup():
                    return
                self._set_len(self.j - 1)
                if self._lookup():
                    return
                self._append("ative")
                self.k = old_k
            self._set_char(self.j + 2, "o")
            self._set_char(self.j + 3, "n")
            if self._lookup():
                return
            self._set_char(self.j + 2, "v")
            self._set_char(self.j + 3, "e")
            self.k = old_k

    # -- driver ---------------------------------------------------------

    def stem(self, term: str) -> str | None:
        """Returns the stem, or None when the term is left unchanged
        (non-alpha, too short/long, or an unmapped dictionary word)."""
        k = len(term) - 1
        if k <= 1 or k >= MAX_WORD_LEN - 1:
            return None
        entry = _DICT.get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else None
        for ch in term:
            if not ("a" <= ch <= "z"):
                return None
        self.word = list(term)
        self.j = 0
        self.k = k
        self.matched = None

        while True:
            self._plural()
            if self.matched is not None:
                break
            self._past_tense()
            if self.matched is not None:
                break
            self._aspect()
            if self.matched is not None:
                break
            self._ity_endings()
            if self.matched is not None:
                break
            self._ness_endings()
            if self.matched is not None:
                break
            self._ion_endings()
            if self.matched is not None:
                break
            self._er_and_or_endings()
            if self.matched is not None:
                break
            self._ly_endings()
            if self.matched is not None:
                break
            self._al_endings()
            if self.matched is not None:
                break
            self._word_in_dict()
            self._ive_endings()
            if self.matched is not None:
                break
            self._ize_endings()
            if self.matched is not None:
                break
            self._ment_endings()
            if self.matched is not None:
                break
            self._ble_endings()
            if self.matched is not None:
                break
            self._ism_endings()
            if self.matched is not None:
                break
            self._ic_endings()
            if self.matched is not None:
                break
            self._ncy_endings()
            if self.matched is not None:
                break
            self._nce_endings()
            break

        if self.matched is not None and self.matched[0] is not None:
            return self.matched[0]
        return "".join(self.word)


_SHARED = _KStem()


def kstem(term: str) -> str:
    """KStemFilter semantics (analysis/en/KStemFilter.java:54): stem a
    lowercase token; unchanged tokens pass through."""
    out = _SHARED.stem(term)
    return term if out is None else out
