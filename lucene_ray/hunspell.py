"""Hunspell core — affix-dictionary spell checking
(``analysis/common/.../hunspell/Hunspell.java:63``, Dictionary.java's
.aff/.dic parsing): the PFX/SFX affix model with strip/append/condition
rules, cross-product prefix+suffix combination, FLAG char/long/num
modes, FULLSTRIP, and the dictionary word list with per-word flag sets.

Scope is the affix CORE — the directives the reference's own simple
test dictionaries exercise.  Dictionaries using compound machinery,
conversion tables, affix aliases or morphology (COMPOUND*, CHECKCOMPOUND*,
ICONV/OCONV, AF/AM, CIRCUMFIX, NEEDAFFIX, KEEPCASE, FORBIDDENWORD,
BREAK, REP-dependent checking, ...) raise NotImplementedError up front
rather than silently mis-spelling — gated in tests/test_hunspell.py on
the reference's .good/.wrong batteries for the supported dictionaries.

``spell(word)``: valid iff the word is a dictionary entry, or derives
from one by stripping one suffix, one prefix, or a cross-product
prefix+suffix pair whose flags the root carries
(Hunspell.checkWord's affix loop).  ``stems(word)`` returns the roots.
"""

from __future__ import annotations

import re

_DOTTED_I = str.maketrans({"\u0130": "i"})


def _hun_lower(w: str) -> str:
    """Hunspell lowercasing: the Turkish dotted capital folds to plain
    'i' (single char), unlike Python's two-codepoint lowering."""
    return w.translate(_DOTTED_I).lower()


_NUM_RE = re.compile(r"[0-9]+([.,-][0-9]+)*$")


def _is_number(w: str) -> bool:
    """Hunspell skips number-shaped words: digit runs with single
    ./,/- separators strictly between them ('1..2' is NOT a number)."""
    return _NUM_RE.fullmatch(w) is not None

_UNSUPPORTED = (
    "COMPOUNDRULE", "COMPOUNDFLAG", "COMPOUNDBEGIN", "COMPOUNDMIDDLE",
    "COMPOUNDEND", "COMPOUNDMIN", "COMPOUNDWORDMAX", "CHECKCOMPOUNDCASE",
    "CHECKCOMPOUNDDUP", "CHECKCOMPOUNDREP", "CHECKCOMPOUNDPATTERN",
    "CHECKCOMPOUNDTRIPLE", "ONLYINCOMPOUND", "COMPOUNDPERMITFLAG",
    "COMPOUNDFORBIDFLAG", "FORCEUCASE", "ICONV", "OCONV", "AF", "AM",
    "CIRCUMFIX", "NEEDAFFIX", "KEEPCASE", "FORBIDDENWORD", "BREAK",
    "COMPLEXPREFIXES", "PSEUDOROOT", "SIMPLIFIEDTRIPLE", "LANG",
    "IGNORE", "CHECKSHARPS", "SYLLABLENUM", "COMPOUNDSYLLABLE",
)


class _Affix:
    __slots__ = ("flag", "cross", "strip", "append", "cond", "cond_re",
                 "append_flags")

    def __init__(self, flag, cross, strip, append, cond, append_flags):
        self.flag = flag
        self.cross = cross
        self.strip = "" if strip == "0" else strip
        self.append = "" if append == "0" else append
        self.cond = cond
        self.cond_re = None if cond == "." else re.compile(cond + "$")
        self.append_flags = append_flags


class HunspellDictionary:
    def __init__(self, aff_text: str, dic_text: str):
        self.flag_mode = "char"
        self.fullstrip = False
        self.try_chars = ""
        self.prefixes: dict[str, list[_Affix]] = {}
        self.suffixes: dict[str, list[_Affix]] = {}
        self._parse_aff(aff_text)
        self.words: dict[str, set] = {}
        self.hidden: dict[str, set] = {}
        self.hidden_orig: dict[str, list] = {}
        self._parse_dic(dic_text)

    # -- parsing --------------------------------------------------------

    def _flags(self, s: str) -> tuple:
        if not s:
            return ()
        if self.flag_mode == "long":
            return tuple(s[i:i + 2] for i in range(0, len(s), 2))
        if self.flag_mode == "num":
            return tuple(x for x in s.split(",") if x)
        return tuple(s)

    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split("#")[0].split()
            i += 1
            if not parts:
                continue
            key = parts[0]
            if key in _UNSUPPORTED:
                raise NotImplementedError(
                    f"hunspell directive {key} not supported")
            if key == "FLAG":
                mode = parts[1].lower()
                if mode not in ("long", "num", "utf-8"):
                    raise NotImplementedError(f"FLAG {mode}")
                self.flag_mode = "char" if mode == "utf-8" else mode
            elif key == "FULLSTRIP":
                self.fullstrip = True
            elif key == "TRY":
                self.try_chars = parts[1] if len(parts) > 1 else ""
            elif key in ("PFX", "SFX"):
                flag, cross, n = parts[1], parts[2] == "Y", int(parts[3])
                table = self.prefixes if key == "PFX" else self.suffixes
                rules = table.setdefault(flag, [])
                for _ in range(n):
                    if i >= len(lines):
                        break                # lenient: short count at EOF
                    rp = lines[i].split("#")[0].split()
                    if len(rp) < 4 or rp[0] not in ("PFX", "SFX") \
                            or rp[1] != flag:
                        break                # lenient: stampeded count
                    i += 1
                    strip, append = rp[2], rp[3]
                    cond = rp[4] if len(rp) > 4 else "."
                    app_flags = ()
                    if "/" in append:
                        append, fl = append.split("/", 1)
                        app_flags = self._flags(fl)
                    rules.append(_Affix(flag, cross, strip, append,
                                        cond, app_flags))
            # SET/WORDCHARS/KEY/NOSUGGEST/MAXNGRAMSUGS/ONLYMAXDIFF/
            # REP/MAP/name lines: ignored (suggestion-side or cosmetic)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for line in lines[1:]:                # first line = entry count
            line = line.split("#")[0].strip()
            if not line:
                continue
            if "/" in line:
                word, fl = line.split("/", 1)
                flags = set(self._flags(fl))
            else:
                word, flags = line, set()
            self.words.setdefault(word, set()).update(flags)
            low = _hun_lower(word)
            if low != word:
                self.hidden_orig.setdefault(low, []).append(word)
                # hidden lowercase homonym for case-variant checks
                # (Dictionary.java's hidden entries: an ALL-CAPS or
                # title input may match a cased dictionary word)
                self.hidden.setdefault(low, set()).update(flags)

    # -- checking -------------------------------------------------------

    def _root_has(self, root: str, flag: str,
                  allow_hidden: bool = False) -> bool:
        fl = self.words.get(root)
        if fl is not None and flag in fl:
            return True
        if allow_hidden:
            fl = self.hidden.get(root)
            return fl is not None and flag in fl
        return False

    def _suffix_roots(self, word: str):
        """(root, affix) pairs reachable by stripping one suffix."""
        for flag, rules in self.suffixes.items():
            for a in rules:
                if a.append and not word.endswith(a.append):
                    continue
                stem = word[: len(word) - len(a.append)] if a.append \
                    else word
                if not stem and not a.strip:
                    continue
                root = stem + a.strip
                if not root or (not self.fullstrip and not stem
                                and a.strip):
                    continue
                if a.cond_re is not None \
                        and a.cond_re.search(root) is None:
                    continue
                yield root, a

    def _prefix_roots(self, word: str):
        for flag, rules in self.prefixes.items():
            for a in rules:
                if a.append and not word.startswith(a.append):
                    continue
                stem = word[len(a.append):] if a.append else word
                root = a.strip + stem
                if not root:
                    continue
                if a.cond_re is not None \
                        and re.match(a.cond, root) is None:
                    continue
                yield root, a

    def spell(self, word: str) -> bool:
        """Hunspell.spell (Hunspell.java:95): trailing periods strip
        when the dotted form is unknown, case variants check (ALL-CAPS
        input accepts title/lower dictionary forms, Titlecase accepts
        lower — Hunspell.checkCaseVariants), and the default '-' break
        accepts a word whose parts all spell (the implicit BREAK
        table)."""
        if not word:
            return False
        if _is_number(word):
            return True                   # Hunspell skips number words
        if self._spell_cased(word):
            return True
        stripped = word.rstrip(".")
        if stripped != word and stripped and self._spell_cased(stripped):
            return True
        for probe in (word, stripped):
            if not probe:
                continue
            if "-" in probe.strip("-"):
                parts = probe.split("-")
                if all(p and self._spell_cased(p) for p in parts):
                    return True
            # default break also strips ONE leading/trailing hyphen
            if probe.endswith("-") and self._spell_cased(probe[:-1]):
                return True
            if probe.startswith("-") and self._spell_cased(probe[1:]):
                return True
        return False

    def _spell_cased(self, word: str) -> bool:
        if self._spell_exact(word):
            return True
        if word.isupper():
            low = _hun_lower(word)
            # the lowered variant counts only when it uppercases back
            # to the input (rejects a dotted-I ALLCAPS of a plain-i
            # word) ...
            if low.upper() == word \
                    and self._spell_exact(low, allow_hidden=True):
                return True
            # ... or when a cased dictionary original uppercases to it
            for orig in self.hidden_orig.get(low, ()):
                if orig.upper() == word:
                    return True
            t = word[:1] + _hun_lower(word[1:])
            if t != word and self._spell_exact(t, allow_hidden=True):
                return True
        elif word[:1].isupper() and word[1:].islower():
            low = _hun_lower(word)
            # Titlecase input: only a true lowercase dictionary word
            # whose titlecase reconstructs the input (no hidden
            # entries — 'Nasa' must not match 'NASA')
            if (low[:1].upper() + low[1:]) == word \
                    and self._spell_exact(low, allow_hidden=False):
                return True
        return False

    def _spell_exact(self, word: str, allow_hidden: bool = False
                     ) -> bool:
        if word in self.words or (allow_hidden and word in self.hidden):
            return True
        ah = allow_hidden
        for r1, s1 in self._suffix_roots(word):
            if self._root_has(r1, s1.flag, ah):
                return True
            # twofold: the inner suffix's append flags authorize the
            # outer one (Dictionary's crossProduct append flags)
            for r2, s2 in self._suffix_roots(r1):
                if s1.flag in s2.append_flags \
                        and self._root_has(r2, s2.flag, ah):
                    return True
        for rp, p in self._prefix_roots(word):
            if self._root_has(rp, p.flag, ah):
                return True
            if not p.cross:
                continue
            for r1, s1 in self._suffix_roots(rp):
                if not s1.cross:
                    continue
                if self._root_has(r1, s1.flag, ah) \
                        and self._root_has(r1, p.flag, ah):
                    return True
                for r2, s2 in self._suffix_roots(r1):
                    if s2.cross and s1.flag in s2.append_flags \
                            and self._root_has(r2, s2.flag, ah) \
                            and self._root_has(r2, p.flag, ah):
                        return True
        return False

    def stems(self, word: str) -> list[str]:
        out = []
        if word in self.words:
            out.append(word)
        for root, sfx in self._suffix_roots(word):
            if self._root_has(root, sfx.flag) and root not in out:
                out.append(root)
        for root, pfx in self._prefix_roots(word):
            if self._root_has(root, pfx.flag) and root not in out:
                out.append(root)
            if pfx.cross:
                for root2, sfx in self._suffix_roots(root):
                    if sfx.cross and self._root_has(root2, pfx.flag) \
                            and self._root_has(root2, sfx.flag) \
                            and root2 not in out:
                        out.append(root2)
        return out


def load_dictionary(aff_path: str, dic_path: str) -> HunspellDictionary:
    def read(p):
        raw = open(p, "rb").read()
        m = re.search(rb"SET\s+(\S+)", raw)
        enc = m.group(1).decode().strip() if m else "utf-8"
        try:
            return raw.decode(enc)
        except (LookupError, UnicodeDecodeError):
            return raw.decode("utf-8", "replace")
    return HunspellDictionary(read(aff_path), read(dic_path))
