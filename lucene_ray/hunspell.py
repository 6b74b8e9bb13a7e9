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
_TR_LOWER = str.maketrans({"\u0130": "i", "I": "\u0131"})


def _hun_lower(w: str) -> str:
    """Hunspell lowercasing: the Turkish dotted capital folds to plain
    'i' (single char), unlike Python's two-codepoint lowering."""
    return w.translate(_DOTTED_I).lower()


_NUM_RE = re.compile(r"[0-9]+([.,-][0-9]+)*$")


def _word_case(w: str) -> str:
    """WordCase.caseOf: MIXED when the first char is lowercase or the
    casing is irregular; TITLE = leading upper, no other uppercase;
    UPPER = cased letters present and none lowercase (digits and
    punctuation are transparent, so '1ST' is UPPER)."""
    if not w or w[:1].islower():
        return "mixed"
    letters = [c for c in w if c.isalpha()]
    if not letters:
        return "mixed"
    has_upper = any(c.isupper() for c in letters)
    has_lower = any(c.islower() for c in letters)
    if has_upper and not has_lower:
        return "upper"
    if w[0].isupper() and not any(c.isupper() for c in w[1:]):
        return "title"
    return "mixed"


def _sharp_variants(low: str) -> list:
    """CHECKSHARPS: an ALL-CAPS word's 'SS' pairs may each stand for
    'ß' — enumerate the replacement combinations (Stemmer.varySharpS),
    bounded."""
    out = []
    spots = []
    i = low.find("ss")
    while i >= 0 and len(spots) < 6:
        spots.append(i)
        i = low.find("ss", i + 2)
    for mask in range(1, 1 << len(spots)):
        w = low
        for bit in range(len(spots) - 1, -1, -1):
            if mask & (1 << bit):
                p = spots[bit]
                w = w[:p] + "\u00df" + w[p + 2:]
        out.append(w)
    return out


def _is_number(w: str) -> bool:
    """Hunspell skips number-shaped words: digit runs with single
    ./,/- separators strictly between them ('1..2' is NOT a number)."""
    return _NUM_RE.fullmatch(w) is not None

_UNSUPPORTED = (


    "PSEUDOROOT",
    "SYLLABLENUM", "COMPOUNDSYLLABLE",
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
        if cond == ".":
            self.cond_re = None
        else:
            try:
                self.cond_re = re.compile(cond + "$")
            except re.error:
                # lenient: an unparseable condition never matches
                self.cond_re = re.compile(r"(?!)")
        self.append_flags = append_flags


class HunspellDictionary:
    def __init__(self, aff_text: str, dic_text: str):
        self.flag_mode = "char"
        self.fullstrip = False
        self.try_chars = ""
        self.needaffix = None
        self.circumfix = None
        self.keepcase = None
        self.forbiddenword = None
        self.onlyincompound = None
        self.compoundflag = None
        self.compound_min = 3
        self.compound_max = None
        self.compound_rules: list = []
        self.iconv: list = []
        self.ignore_chars = ""
        self.breaks: "list[str] | None" = None   # None = default table
        self.aliases: list = []
        self.compound_permit = None
        self.compound_forbid = None
        self.check_compound_dup = False
        self.check_compound_triple = False
        self.check_compound_case = False
        self.check_compound_rep = False
        self.simplified_triple = False
        self.force_ucase = None
        self.check_sharps = False
        self.lang_turkic = False
        self.lang_code = None
        self.rep_table: list = []
        # suggestion-side directives (Dictionary.java:159-167 defaults)
        self.neighbor_key_groups = ["qwertyuiop", "asdfghjkl",
                                    "zxcvbnm"]
        self.map_table: list[list[str]] = []
        self.enable_split_suggestions = True
        self.max_ngram_suggestions = 4
        self.max_diff = 5
        self.only_max_diff = False
        self.no_suggest = None
        self.sub_standard = None
        self.oconv: list = []
        self._exclude: frozenset = frozenset()
        self.compound_patterns: list = []
        self.compound_begin = None
        self.compound_middle = None
        self.compound_end = None
        self.complex_prefixes = False
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
        if self.aliases and s.isdigit():
            i = int(s)
            if 1 <= i <= len(self.aliases):
                s = self.aliases[i - 1]      # AF alias reference
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
            elif key == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif key in ("NEEDAFFIX", "CIRCUMFIX", "KEEPCASE",
                         "FORBIDDENWORD", "ONLYINCOMPOUND",
                         "COMPOUNDFLAG", "COMPOUNDPERMITFLAG",
                         "COMPOUNDFORBIDFLAG", "COMPOUNDBEGIN",
                         "COMPOUNDMIDDLE", "COMPOUNDEND"):
                attr = {"NEEDAFFIX": "needaffix",
                        "CIRCUMFIX": "circumfix",
                        "KEEPCASE": "keepcase",
                        "FORBIDDENWORD": "forbiddenword",
                        "ONLYINCOMPOUND": "onlyincompound",
                        "COMPOUNDFLAG": "compoundflag",
                        "COMPOUNDBEGIN": "compound_begin",
                        "COMPOUNDMIDDLE": "compound_middle",
                        "COMPOUNDEND": "compound_end",
                        "COMPOUNDPERMITFLAG": "compound_permit",
                        "COMPOUNDFORBIDFLAG": "compound_forbid"}[key]
                setattr(self, attr, self._flags(parts[1])[0])
            elif key == "CHECKCOMPOUNDPATTERN":
                if not (len(parts) == 2 and parts[1].isdigit()):
                    def pf(tok):
                        if "/" in tok:
                            t, fl = tok.split("/", 1)
                            flag = self._flags(fl)[0] if fl else None
                        else:
                            t, flag = tok, None
                        return ("" if t == "0" else t), flag
                    end, ef = pf(parts[1])
                    beg, bf = pf(parts[2]) if len(parts) > 2 \
                        else ("", None)
                    rep = parts[3] if len(parts) > 3 else None
                    self.compound_patterns.append(
                        (end, ef, beg, bf, rep))
            elif key == "CHECKCOMPOUNDDUP":
                self.check_compound_dup = True
            elif key == "CHECKCOMPOUNDTRIPLE":
                self.check_compound_triple = True
            elif key == "CHECKCOMPOUNDCASE":
                self.check_compound_case = True
            elif key == "CHECKCOMPOUNDREP":
                self.check_compound_rep = True
            elif key == "SIMPLIFIEDTRIPLE":
                self.simplified_triple = True
            elif key == "FORCEUCASE":
                self.force_ucase = self._flags(parts[1])[0]
            elif key == "CHECKSHARPS":
                self.check_sharps = True
            elif key == "LANG":
                self.lang_code = parts[1].split("_")[0]
                self.lang_turkic = self.lang_code in ("tr", "az")
            elif key == "REP":
                if len(parts) >= 3:
                    self.rep_table.append((parts[1], parts[2]))
            elif key == "COMPOUNDMIN":
                self.compound_min = max(1, int(parts[1]))
            elif key == "COMPOUNDWORDMAX":
                self.compound_max = int(parts[1])
            elif key == "COMPOUNDRULE":
                if parts[1].isdigit() and len(parts) == 2:
                    pass                     # count line
                else:
                    self.compound_rules.append(parts[1])
            elif key == "ICONV":
                if len(parts) >= 3:
                    self.iconv.append((parts[1], parts[2]))
            elif key == "OCONV":
                if len(parts) >= 3:
                    self.oconv.append((parts[1], parts[2]))
            elif key == "IGNORE":
                self.ignore_chars = parts[1] if len(parts) > 1 else ""
            elif key == "BREAK":
                if parts[1] == "0":
                    self.breaks = []
                elif parts[1].isdigit() and len(parts) == 2:
                    if self.breaks is None:
                        self.breaks = []
                else:
                    if self.breaks is None:
                        self.breaks = []
                    self.breaks.append(parts[1])
            elif key == "AF":
                if not (parts[1].isdigit() and len(parts) == 2):
                    self.aliases.append(parts[1])
            elif key == "TRY":
                self.try_chars = parts[1] if len(parts) > 1 else ""
            elif key == "KEY":
                if len(parts) > 1:
                    self.neighbor_key_groups = parts[1].split("|")
            elif key == "MAP":
                if not (len(parts) == 2 and parts[1].isdigit()):
                    # parenthesized groups are multi-char alternatives
                    # (Dictionary.parseMapEntry)
                    raw, entry, j = parts[1], [], 0
                    while j < len(raw):
                        if raw[j] == "(":
                            close = raw.find(")", j)
                            if close < 0:
                                entry = []
                                break        # lenient: unclosed paren
                            entry.append(raw[j + 1:close])
                            j = close + 1
                        else:
                            entry.append(raw[j])
                            j += 1
                    if entry:
                        self.map_table.append(entry)
            elif key == "NOSPLITSUGS":
                self.enable_split_suggestions = False
            elif key == "MAXNGRAMSUGS":
                self.max_ngram_suggestions = int(parts[1])
            elif key == "MAXDIFF":
                self.max_diff = min(10, max(0, int(parts[1])))
            elif key == "ONLYMAXDIFF":
                self.only_max_diff = True
            elif key == "NOSUGGEST":
                self.no_suggest = self._flags(parts[1])[0]
            elif key == "SUBSTANDARD":
                self.sub_standard = self._flags(parts[1])[0]
            elif key in ("PFX", "SFX"):
                if len(parts) < 4 or not parts[3].isdigit():
                    continue                 # lenient: malformed header
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
            # SET/WORDCHARS/name lines: cosmetic, ignored

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for line in lines[1:]:                # first line = entry count
            line = line.split("#")[0].strip()
            if not line:
                continue
            toks = line.replace("\t", " ").split(" ")
            word_toks, ph_fields = [], []
            for t in toks:
                if re.match(r"^[a-z][a-z]:", t):
                    if t.startswith("ph:") and len(t) > 3:
                        ph_fields.append(t[3:])
                elif not ph_fields:
                    word_toks.append(t)
            line = " ".join(word_toks).strip()
            if not line:
                continue
            if "/" in line:
                word, fl = line.split("/", 1)
                flags = frozenset(self._flags(fl))
            else:
                word, flags = line, frozenset()
            for ph in ph_fields:
                # ph: fields feed the REP table
                # (Dictionary.java's dictionary phonetic entries):
                # "bad->good" maps directly; a trailing '*' strips the
                # last char of both sides
                if "->" in ph:
                    src, dst = ph.split("->", 1)
                elif ph.endswith("*"):
                    src, dst = ph[:-1][:-1], word[:-1]
                else:
                    src, dst = ph, word
                if src:
                    self.rep_table.append((src, dst))
            self.words.setdefault(word, []).append(flags)
            # hidden TITLECASE homonyms (Dictionary.java:1073-1091):
            # for MIXED-case words, and for ALL-CAPS words with flags
            wc = _word_case(word)
            if wc == "mixed" and not word[:1].islower() \
                    or (wc == "upper" and flags):
                t = word[:1].upper() + _hun_lower(word[1:])
                if t != word:
                    self.hidden.setdefault(t, []).append(flags)

    # -- checking -------------------------------------------------------

    def _root_has(self, root: str, flag: str,
                  allow_hidden: bool = False) -> bool:
        for fl in self.words.get(root, ()):
            if flag in fl:
                return True
        if allow_hidden:
            for fl in self.hidden.get(root, ()):
                if flag in fl:
                    return True
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

    # -- analyses -------------------------------------------------------

    def _analyses(self, word: str):
        """Candidate (root, affix-part list) decompositions; parts are
        (kind, _Affix) with suffix chains outer-to-inner; authorization
        is checked later so circumfix/needaffix gates can see the whole
        derivation (Stemmer.doStem's affix enumeration)."""
        yield word, []
        for r1, s1 in self._suffix_roots(word):
            yield r1, [("sfx", s1)]
            for r2, s2 in self._suffix_roots(r1):
                yield r2, [("sfx", s1), ("sfx", s2)]
        for rp, p in self._prefix_roots(word):
            yield rp, [("pfx", p)]
            if self.complex_prefixes:
                for rp2, p2 in self._prefix_roots(rp):
                    yield rp2, [("pfx", p), ("pfx2", p2)]
                    for r1, s1 in self._suffix_roots(rp2):
                        yield r1, [("pfx", p), ("pfx2", p2),
                                   ("sfx", s1)]
            if not p.cross:
                continue
            for r1, s1 in self._suffix_roots(rp):
                if not s1.cross:
                    continue
                yield r1, [("pfx", p), ("sfx", s1)]
                for r2, s2 in self._suffix_roots(r1):
                    if s2.cross:
                        yield r2, [("pfx", p), ("sfx", s1),
                                   ("sfx", s2)]

    def _authorized(self, flags: set, parts: list) -> bool:
        """Affix flags must come from the root's flag set or, for an
        outer suffix / cross prefix, from an inner suffix's append
        flags (Dictionary's affix-on-affix authorization)."""
        sfx = [a for k, a in parts if k == "sfx"]
        pfx = [a for k, a in parts if k == "pfx"]
        pfx_inner = [a for k, a in parts if k == "pfx2"]
        if pfx_inner:
            inner = pfx_inner[0]
            if inner.flag not in flags:
                return False
            # the outer prefix may be authorized by the inner's
            # append flags (COMPLEXPREFIXES chains)
            outer = pfx[0]
            if outer.flag not in flags \
                    and outer.flag not in inner.append_flags \
                    and not any(outer.flag in a.append_flags
                                for a in sfx):
                return False
            pfx = []
        if sfx:
            inner = sfx[-1]
            # the innermost suffix is authorized by the entry or by the
            # prefix's append flags (Stemmer.processStemCandidate's
            # ``hasFlag(entryId, flag) || isFlagAppendedByAffix(
            # prefixId, flag)``, Stemmer.java:269-270)
            if inner.flag not in flags and not any(
                    inner.flag in p.append_flags for p in pfx):
                return False
            # twofold chain: the outer (first-stripped) suffix's flag
            # must be in the INNER suffix's continuation class — root
            # flags never authorize the outer suffix
            # (Stemmer.isAffixCompatible, Stemmer.java:564-571)
            for outer, inner_a in zip(sfx, sfx[1:]):
                if outer.flag not in inner_a.append_flags:
                    return False
        for p in pfx:
            # a cross prefix is authorized by the entry or by the LAST
            # (innermost) suffix's append flags only
            # (Stemmer.java:271-277 checks lastAffix, not every suffix)
            ok = p.flag in flags or (
                sfx and p.flag in sfx[-1].append_flags)
            if not ok:
                return False
        return True

    def _gates(self, flags: set, parts: list, in_compound: bool) -> bool:
        """needaffix / circumfix / onlyincompound derivation gates."""
        na = self.needaffix
        if na is not None:
            real = [a for _k, a in parts
                    if na not in a.append_flags]
            if not parts and na in flags:
                return False                  # bare pseudo-root
            if parts and not real:
                return False                  # only pseudo-affixes
        cf = self.circumfix
        if cf is not None:
            pfx_cf = any(k == "pfx" and cf in a.append_flags
                         for k, a in parts)
            sfx_cf = any(k == "sfx" and cf in a.append_flags
                         for k, a in parts)
            if pfx_cf != sfx_cf:
                return False
        oic = self.onlyincompound
        if oic is not None and not in_compound:
            if oic in flags:
                return False
            if any(oic in a.append_flags for _k, a in parts):
                return False                # fogemorpheme affix
        return True

    _POISON = object()        # keepcase entry hit under case variation

    def _find_entry(self, root: str, parts: list, variant: bool,
                    in_compound: bool):
        """-> (flags, forbidden) or None or _POISON.  ``variant``
        selects case-variant acceptance (hidden entries allowed,
        keepcase rejected); a NON-hidden keepcase hit under variation
        POISONS the whole analysis — Stemmer.doStem stops enumerating
        when acceptCase fails on a non-hidden entry."""
        best = None
        for source, hidden in ((self.words, False),
                               (self.hidden, True)):
            entries = source.get(root)
            if not entries:
                continue
            if hidden and not variant:
                continue
            for flags in entries:
                if variant and self.keepcase is not None \
                        and self.keepcase in flags:
                    if self.check_sharps and "\u00df" in root:
                        # CHECKSHARPS: a sharp-s keepcase entry still
                        # accepts under case variation
                        # (Hunspell.acceptCase's sharp-s exception)
                        pass
                    elif not hidden:
                        return self._POISON
                    else:
                        continue
                if self._exclude and (self._exclude & set(flags)):
                    # suggestion-mode speller: NOSUGGEST/SUBSTANDARD
                    # roots are not acceptable stems
                    # (Suggester.java acceptsStem override)
                    continue
                if not self._authorized(flags, parts):
                    continue
                if not self._gates(flags, parts, in_compound):
                    continue
                forb = self.forbiddenword is not None \
                    and self.forbiddenword in flags
                if not forb:
                    return flags, False
                if best is None:
                    best = (flags, True)
        return best

    def _check_simple(self, word: str, variant: bool):
        """Boolean or None (Hunspell.checkSimpleWord): a forbidden
        match is a HARD False that short-circuits compounds and case
        variants."""
        for root, parts in self._analyses(word):
            found = self._find_entry(root, parts, variant, False)
            if found is self._POISON:
                return False
            if found is not None:
                return not found[1]
        return None

    # -- compounds ------------------------------------------------------

    def _compound_part_ok(self, piece: str, pos: str, variant: bool
                          ) -> bool:
        """A compound part must derive to an entry whose EFFECTIVE
        flag set (root flags plus applied affixes' append flags)
        carries the compound flag; affixes away from their natural
        edge need COMPOUNDPERMITFLAG, and COMPOUNDFORBIDFLAG bans the
        derivation from begin/middle positions."""
        cf = self.compoundflag
        pos_flag = {"begin": self.compound_begin,
                    "middle": self.compound_middle,
                    "end": self.compound_end}[pos]
        permit = self.compound_permit
        forbid = self.compound_forbid
        if forbid is not None and pos in ("begin", "middle"):
            # a dictionary homonym carrying the forbid flag bans the
            # whole piece, overriding permit flags (compoundforbid)
            if any(forbid in fl for fl in self.words.get(piece, ())):
                return False
        for root, parts in self._analyses(piece):
            has_sfx = any(k == "sfx" for k, _a in parts)
            has_pfx = any(k == "pfx" for k, _a in parts)
            if pos == "middle" and parts:
                if permit is None:
                    continue
                if not all(permit in a.append_flags
                           for _k, a in parts):
                    continue
            if pos == "begin" and has_sfx:
                if permit is None or not all(
                        permit in a.append_flags
                        for k, a in parts if k == "sfx"):
                    continue
            if pos == "end" and has_pfx:
                if permit is None or not all(
                        permit in a.append_flags
                        for k, a in parts if k == "pfx"):
                    continue
            if pos == "end" and self.onlyincompound is not None \
                    and any(k == "sfx" and a.append
                            and self.onlyincompound in a.append_flags
                            for k, a in parts):
                continue    # visible linking SUFFIXES never final
            v = variant if pos == "begin" else False
            found = self._find_entry(root, parts, v, True)
            if found is None and pos != "begin":
                found = self._find_entry(root, parts, True, True)
            if found is self._POISON or found is None or found[1]:
                continue
            eff = set(found[0])
            for _k, a in parts:
                eff.update(a.append_flags)
            if forbid is not None and forbid in eff \
                    and pos in ("begin", "middle"):
                continue
            if cf is not None and cf in eff:
                return True
            if pos_flag is not None and pos_flag in eff:
                return True
        return False

    def _boundary_ok(self, left: str, right: str) -> bool:
        if self.check_compound_triple:
            if left[-1] == right[0]:
                if (len(left) > 1 and left[-2] == left[-1]) \
                        or (len(right) > 1 and right[1] == right[0]):
                    return False
        if self.check_compound_case:
            lc, rc = left[-1], right[0]
            if (lc.isupper() or rc.isupper()) \
                    and lc != "-" and rc != "-":
                return False
        return True

    def _rep_collision(self, word: str) -> bool:
        """CHECKCOMPOUNDREP: the compound is forbidden when a REP
        replacement turns the whole word into a dictionary word."""
        for src, dst in self.rep_table:
            i = word.find(src)
            while i >= 0:
                cand = word[:i] + dst + word[i + len(src):]
                if cand != word and (cand in self.words
                                     or self._check_simple(cand, False)):
                    return True
                i = word.find(src, i + 1)
        return False

    def _piece_flag(self, piece: str, flag) -> bool:
        return any(flag in fl for fl in self.words.get(piece, ()))

    def _ccp_forbids(self, head: str, tail: str) -> bool:
        """CHECKCOMPOUNDPATTERN plain-boundary forbids: prev ends with
        the end chars (flag-gated on the BARE entries) and next begins
        with the begin chars."""
        for end, ef, beg, bf, _rep in self.compound_patterns:
            if end and not head.endswith(end):
                continue
            if beg and not tail.startswith(beg):
                continue
            if ef is not None and not self._piece_flag(head, ef):
                continue
            if bf is not None and not self._piece_flag(
                    tail if beg == "" else tail, bf):
                # flag condition applies to the FIRST tail part; for
                # the bare-pattern case the whole tail's first part is
                # checked by the recursion, approximate with prefixes
                ok = False
                for ln in range(1, len(tail) + 1):
                    if self._piece_flag(tail[:ln], bf):
                        ok = True
                        break
                if not ok:
                    continue
            return True
        return False

    def _check_compound_flag(self, word: str, variant: bool,
                             prev_part: "str | None" = None,
                             n_parts: int = 1) -> bool:
        if self.compoundflag is None and self.compound_begin is None:
            return False
        if self.compound_max is not None \
                and n_parts + 1 > self.compound_max:
            return False
        if n_parts == 1 and self.check_compound_rep \
                and self._rep_collision(word):
            return False
        cmin = self.compound_min
        for brk in range(cmin, len(word) - cmin + 1):
            heads = [(word[:brk], word[brk:])]
            if self.simplified_triple and brk < len(word) \
                    and word[brk - 1] == word[brk]:
                # SIMPLIFIEDTRIPLE: the boundary letter may be elided
                # (head keeps the doubled letter, tail reuses it)
                heads.append((word[:brk + 1], word[brk:]))
            for hi, (head, tail) in enumerate(heads):
                simplified = hi == 1
                if f"{head} {tail}" in self.words:
                    # a dictionary word PAIR forbids the concatenation
                    continue
                if not simplified and not self._boundary_ok(head, tail):
                    continue
                if self.compound_patterns \
                        and self._ccp_forbids(head, tail):
                    continue
                if self.check_compound_rep and prev_part \
                        and self._rep_collision(prev_part + head):
                    # the joined neighbor pair collides with a REP-
                    # corrected dictionary word (CHECKCOMPOUNDREP)
                    continue
                pos = "begin" if n_parts == 1 else "middle"
                if not self._compound_part_ok(head, pos, variant):
                    continue
                if len(tail) >= cmin and self._compound_part_ok(
                        tail, "end", variant):
                    if self.check_compound_dup and head == tail:
                        continue
                    if self.check_compound_rep \
                            and self._rep_collision(head + tail):
                        continue
                    if self.force_ucase is not None \
                            and not self._force_ok \
                            and self._part_has_flag(tail,
                                                    self.force_ucase):
                        # FORCEUCASE: this ending demands a
                        # capitalized surface
                        pass
                    else:
                        return True
                if self._check_compound_flag(tail, variant, head,
                                             n_parts + 1):
                    return True
        # CHECKCOMPOUNDPATTERN replacements: the boundary surface may
        # be the replacement of endchars+beginchars
        for end, ef, beg, bf, rep in self.compound_patterns:
            if not rep:
                continue
            i = word.find(rep, 1)
            while 0 < i < len(word):
                head = word[:i] + end
                tail = beg + word[i + len(rep):]
                if len(head) >= cmin and len(tail) >= 1 \
                        and (ef is None
                             or self._piece_flag(head, ef)) \
                        and (bf is None
                             or any(self._piece_flag(tail[:ln], bf)
                                    for ln in range(1, len(tail) + 1))):
                    pos = "begin" if n_parts == 1 else "middle"
                    if self._compound_part_ok(head, pos, variant):
                        if len(tail) >= cmin \
                                and self._compound_part_ok(
                                    tail, "end", variant):
                            return True
                        if self._check_compound_flag(
                                tail, variant, head, n_parts + 1):
                            return True
                i = word.find(rep, i + 1)
        return False

    def _part_has_flag(self, piece: str, flag) -> bool:
        for root, parts in self._analyses(piece):
            for fl in self.words.get(root, ()):
                if flag in fl:
                    return True
        return False

    def _check_compound_rules(self, word: str) -> bool:
        if not self.compound_rules:
            return False
        import re as _re
        pats = []
        for rule in self.compound_rules:
            # rule chars are flags, with * and ? quantifiers and
            # (group) alternates; translate to a regex over a
            # flag-sequence string (one char per part, char mode)
            pats.append(_re.compile(
                "".join(ch if ch in "*?()|" else _re.escape(ch)
                        for ch in rule) + "$"))

        def parts_flags(rest: str, acc: list) -> bool:
            if not rest:
                seq_choices = [""]
                for fl in acc:
                    seq_choices = [s + f for s in seq_choices
                                   for f in fl]
                    if len(seq_choices) > 4096:
                        return False
                return len(acc) >= 2 and any(
                    p.match(seq) for p in pats for seq in seq_choices)
            for ln in range(1, len(rest) + 1):
                piece = rest[:ln]
                entries = self.words.get(piece)
                if entries:
                    union = sorted(set().union(*entries))
                    if union and parts_flags(rest[ln:],
                                             acc + [union]):
                        return True
                if ln == len(rest):
                    # the last element may carry a suffix
                    for root, sfx in self._suffix_roots(piece):
                        for fl in self.words.get(root, ()):
                            if sfx.flag in fl:
                                if parts_flags("", acc + [sorted(fl)]):
                                    return True
            return False

        return parts_flags(word, [])

    # -- spell ----------------------------------------------------------

    def _lower(self, w: str) -> str:
        if self.lang_turkic:
            return w.translate(_TR_LOWER).lower()
        return _hun_lower(w)

    def _case_fold_char(self, c: str) -> str:
        """Dictionary.caseFold: per-char lowering with the Turkic I
        rules (Dictionary.java:1586-1598)."""
        if self.lang_turkic:
            if c == "I":
                return "ı"
            if c == "İ":
                return "i"
        return c.lower()

    def _title_case(self, w: str) -> str:
        """Dictionary.toTitleCase: plain uppercase first char (no
        Turkic special there), caseFold for the rest."""
        return w[:1].upper() + self._lower(w[1:]) if w else w

    def _check_word(self, word: str) -> bool:
        """Hunspell.checkWord (Hunspell.java:128-143): the simple
        check plus compound checks, with NO input cleaning, NO case
        variation and NO break-table splitting — the candidate
        validator the suggesters use.  FORCEUCASE with a null original
        case passes iff the word itself is capitalized
        (Hunspell.java:290)."""
        if not word:
            return False
        simple = self._check_simple(word, False)
        if simple is not None:
            return simple
        self._force_ok = word[:1].isupper()
        return self._check_compound_rules(word) \
            or self._check_compound_flag(word, False)

    def _apply_oconv(self, word: str) -> str:
        """ConvTable.applyMappings for the OCONV table: longest match
        at each position, left to right."""
        if not self.oconv:
            return word
        out = []
        i = 0
        while i < len(word):
            for src, dst in sorted(self.oconv, key=lambda p: -len(p[0])):
                if word.startswith(src, i):
                    out.append(dst)
                    i += len(src)
                    break
            else:
                out.append(word[i])
                i += 1
        return "".join(out)

    def _clean_input(self, word: str) -> str:
        """Dictionary.cleanInput: ICONV longest-match rewriting plus
        IGNORE character removal, before any checking."""
        if self.iconv:
            out = []
            i = 0
            while i < len(word):
                for src, dst in sorted(self.iconv,
                                       key=lambda p: -len(p[0])):
                    if word.startswith(src, i):
                        out.append(dst)
                        i += len(src)
                        break
                else:
                    out.append(word[i])
                    i += 1
            word = "".join(out)
        if self.ignore_chars:
            word = "".join(c for c in word
                           if c not in self.ignore_chars)
        return word

    def spell(self, word: str) -> bool:
        """Hunspell.spell (Hunspell.java:74-118): input cleaning
        (ICONV/IGNORE), trailing-period stripping, number words, the
        simple check (forbidden matches short-circuit to False),
        compound checks, case variants per Stemmer.varyCase (UPPER
        tries apostrophe-title / title / lower unless the dotted-I rule
        disallows it; TITLE tries lower), and the BREAK table (the
        default = hyphen splits and edge hyphens)."""
        if not word:
            return True
        word = self._clean_input(word)
        if word.endswith("."):
            n = len(word)
            while n > 0 and word[n - 1] == ".":
                n -= 1
            return self._spell_clean(word[:n]) \
                or self._spell_clean(word[:n + 1])
        return self._spell_clean(word)

    def _spell_clean(self, word: str) -> bool:
        if not word:
            return False
        if _is_number(word):
            return True
        simple = self._check_simple(word, False)
        if simple is not None:
            return simple
        wc = _word_case(word)
        self._force_ok = wc in ("upper", "title")
        if self._check_compound_rules(word):
            return True
        if self._check_compound_flag(word, False):
            return True
        if wc in ("upper", "title"):
            for v in self._case_variants(word, wc):
                r = self._check_simple(v, True)
                if r:
                    return True
                if r is None and (self._check_compound_rules(v)
                                  or self._check_compound_flag(v, True)):
                    return True
        # BREAK table (default: hyphen splits + edge hyphens)
        breaks = self.breaks if self.breaks is not None else ["-"]
        for b in breaks:
            if b.startswith("^"):
                pat = b[1:]
                if pat and word.startswith(pat) \
                        and self._spell_clean(word[len(pat):]):
                    return True
                continue
            if b.endswith("$"):
                pat = b[:-1]
                if pat and word.endswith(pat) \
                        and self._spell_clean(word[: -len(pat)]):
                    return True
                continue
            i = word.find(b, 1)
            while 0 < i < len(word) - len(b):
                left, right = word[:i], word[i + len(b):]
                if left and right and self._spell_clean(left) \
                        and self._spell_clean(right):
                    return True
                i = word.find(b, i + 1)
            # edge occurrences of single-char default breaks
            if self.breaks is None:
                if word.endswith(b) and self._spell_clean(
                        word[: -len(b)]):
                    return True
                if word.startswith(b) and self._spell_clean(
                        word[len(b):]):
                    return True
        return False

    def _case_variants(self, word: str, wc: str):
        out = []
        if wc == "upper":
            title = word[:1] + self._lower(word[1:])
            apos = None
            i = title.find("'")
            if 0 < i < len(title) - 1:
                apos = title[:i + 1] + title[i + 1].upper() \
                    + title[i + 2:]
                if apos != title:
                    out.append(apos)
            if self.check_sharps and "SS" in word:
                out.extend(title[:1] + v[1:]
                           for v in _sharp_variants(self._lower(title)))
            out.append(title)
            if self.check_sharps and "SS" in word:
                out.extend(_sharp_variants(self._lower(title)))
            if "\u0130" not in word or self.lang_turkic:
                out.append(self._lower(title))
        else:
            if "\u0130" not in word or self.lang_turkic:
                out.append(self._lower(word))
        return out

    def stems(self, word: str) -> list[str]:
        """Dictionary roots the word derives from, through the same
        authorization/gate machinery spell() uses (Stemmer.stem) —
        circumfix chains (leg...obb), complex-prefix chains and
        prefix-authorized-by-suffix derivations all resolve.  For
        UPPER/TITLE words the case variants are stemmed too
        (Stemmer.varyCase)."""
        out = []

        def collect(w: str, variant: bool) -> None:
            for root, parts in self._analyses(w):
                found = self._find_entry(root, parts, variant, False)
                if found is self._POISON or found is None or found[1]:
                    continue
                if root not in out:
                    out.append(root)

        collect(word, False)
        wc = _word_case(word)
        if wc in ("upper", "title"):
            for v in self._case_variants(word, wc):
                collect(v, True)
        return out


def stem_filter(dictionary: "HunspellDictionary | None" = None,
                longest_only: bool = False,
                keywords: "frozenset[str] | set[str]" = frozenset(),
                dedup: bool = True):
    """HunspellStemFilter (hunspell/HunspellStemFilter.java:32) as a
    vocabulary token filter: each token is replaced by its stems (all
    of them — hunspell words can have several), or kept verbatim when
    no stem is found or the token is keyword-marked
    (SetKeywordMarkerFilter role, case-insensitive like the reference
    test).  ``longest_only`` keeps the single longest stem (length
    desc, then reverse-text tie break, HunspellStemFilter.java:118-127);
    otherwise stems dedup in first-seen order (Stemmer.uniqueStems)."""
    d = dictionary if dictionary is not None else demo_dictionary()
    kw = {k.lower() for k in keywords}

    def f(tokens: "list[str]") -> "list[str]":
        out = []
        for t in tokens:
            if t.lower() in kw:
                out.append(t)
                continue
            stems = d.stems(t)
            if not stems:
                out.append(t)
            elif longest_only:
                out.append(sorted(stems,
                                  key=lambda s: (-len(s), *[-ord(c) for c in s]))[0])
            else:
                out.extend(dict.fromkeys(stems) if dedup else stems)
        return out

    return f


# fixed demo dictionary (used by the registered "hunspell_stem" filter
# and the ft_hunspell_spellcheck pipeline oracle): 16 roots over the
# synthetic corpus vocabulary, all carrying the S/D suffix and U
# prefix flags
DEMO_ROOTS = [
    "row", "batch", "scan", "filter", "merge", "order", "value", "key",
    "stream", "window", "group", "sort", "query", "data", "join",
    "column"]

DEMO_AFF = """SET UTF-8
PFX U Y 1
PFX U 0 un .
SFX S Y 2
SFX S 0 s [^sy]
SFX S y ies [^aeiou]y
SFX D Y 2
SFX D 0 ed [^e]
SFX D e ed e
"""

_demo_dict = None


def demo_dictionary() -> HunspellDictionary:
    global _demo_dict
    if _demo_dict is None:
        dic = str(len(DEMO_ROOTS)) + "\n" + "\n".join(
            r + "/SDU" for r in DEMO_ROOTS)
        _demo_dict = HunspellDictionary(DEMO_AFF, dic)
    return _demo_dict


def load_dictionary(aff_path: str, dic_path: str) -> HunspellDictionary:
    def read(p):
        raw = open(p, "rb").read()
        m = re.search(rb"SET\s+(\S+)", raw)
        if m:
            enc = m.group(1).decode().strip()
            try:
                return raw.decode(enc)
            except (LookupError, UnicodeDecodeError):
                pass
        # no (usable) SET: try strict UTF-8, else hunspell's
        # ISO8859-1 default (e.g. the checksharps dictionary)
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return raw.decode("ISO8859-1")
    return HunspellDictionary(read(aff_path), read(dic_path))
