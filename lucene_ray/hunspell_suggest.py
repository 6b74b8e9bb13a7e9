"""Hunspell suggestions — corrections for misspelled words
(``analysis/common/.../hunspell/Suggester.java:52``), in the
reference's two phases:

1. **Modification** (ModifyingSuggester.java:28): systematic edits of
   the misspelled word — REP table replacements, MAP related-char
   substitutions, adjacent/distant swaps, keyboard-neighbor (KEY)
   replacements, char removal/insertion (TRY)/moves, de-duplication,
   and dictionary-validated splits.  Each candidate is validated with
   the speller's ``checkWord``.
2. **Enumeration** (GeneratingSuggester.java:40): when modification
   yields nothing "good", scan the dictionary for roots with trigram
   overlap, re-affix them with affixes whose append text matches the
   misspelled word's edges, and rank by the Hunspell n-gram similarity
   formula (lcs, common prefix, weighted bigram mismatch, MAXDIFF
   band).

Both phases run against a suggestion-mode speller that refuses
NOSUGGEST/SUBSTANDARD roots (Suggester.java acceptsStem override);
final output is case-adjusted to the misspelling (Suggestion.java:34)
and OCONV-rewritten.  Gated in tests/test_hunspell.py on the
reference's 23 ``.sug`` battery files verbatim.
"""

from __future__ import annotations

from .hunspell import HunspellDictionary, _Affix

MAX_CHAR_DISTANCE = 4          # ModifyingSuggester.java:29
MAX_ROOTS = 100                # GeneratingSuggester.java:41-44
MAX_WORDS = 100
MAX_GUESSES = 200
MAX_ROOT_LENGTH_DIFF = 4


def _case_of(w: str) -> str:
    """WordCase.caseOf with the full five-way result ('upper',
    'title', 'lower', 'mixed', 'neutral'); a char is cased upper/lower
    per Character.isUpperCase/isLowerCase (neutral otherwise)."""

    def cc(c):
        if c.isupper():
            return "u"
        # Java's char-level toUpperCase: 'ß' has no single-char upper
        # mapping, so it is case-NEUTRAL ("MÜßIG" is UPPER)
        if c.islower() and len(c.upper()) == 1 and c.upper() != c:
            return "l"
        return "n"

    start = cc(w[0])
    seen_u = seen_l = False
    for c in w[1:]:
        k = cc(c)
        seen_u = seen_u or k == "u"
        seen_l = seen_l or k == "l"
        if seen_u and seen_l:
            break
    if seen_l and seen_u:
        return "mixed"
    if start == "l":
        return "mixed" if seen_u else "lower"
    if start == "u":
        return "upper" if not seen_l else "title"
    return "lower" if seen_l else ("upper" if seen_u else "neutral")


class _Rep:
    """RepEntry.java:23 — ^/$ anchors, '_' means space in the
    replacement."""

    def __init__(self, raw_pattern: str, raw_replacement: str):
        self.must_start = raw_pattern.startswith("^")
        self.must_end = raw_pattern.endswith("$")
        self.pattern = raw_pattern[
            1 if self.must_start else 0:
            len(raw_pattern) - (1 if self.must_end else 0)]
        self.replacement = raw_replacement.replace("_", " ")

    def substitute(self, word: str) -> list:
        p = self.pattern
        if self.must_start:
            match = word == p if self.must_end else word.startswith(p)
            return [self.replacement + word[len(p):]] if match else []
        if self.must_end:
            return [word[: len(word) - len(p)] + self.replacement] \
                if word.endswith(p) else []
        pos = word.find(p)
        out = []
        while pos >= 0:
            out.append(word[:pos] + self.replacement
                       + word[pos + len(p):])
            pos = word.find(p, pos + 1)
        return out


# ---------------------------------------------------------------------------
# n-gram scoring statics (GeneratingSuggester.java:330-460)


def _common_prefix(s1: str, s2: str) -> int:
    i = 0
    limit = min(len(s1), len(s2))
    while i < limit and s1[i] == s2[i]:
        i += 1
    return i


def _index_of_substring(haystack, haystack_pos, needle, needle_pos,
                        length) -> int:
    sub = needle[needle_pos:needle_pos + length]
    i = haystack.find(sub, haystack_pos)
    return i if i <= len(haystack) - length else -1


def _ngram_score(n: int, s1: str, s2: str, weighted: bool) -> int:
    l1 = len(s1)
    score = 0
    last_starts = [0] * l1
    for j in range(1, n + 1):
        ns = 0
        for i in range(l1 - j + 1):
            if last_starts[i] >= 0:
                pos = _index_of_substring(s2, last_starts[i], s1, i, j)
                last_starts[i] = pos
                if pos >= 0:
                    ns += 1
                    continue
            if weighted:
                ns -= 1
                if i == 0 or i == l1 - j:
                    ns -= 1                  # side weight
        score += ns
        if ns < 2 and not weighted:
            break
    return score


def _longer_worse_penalty(l1: int, l2: int) -> int:
    return max(l2 - l1 - 2, 0)


def _any_mismatch_ngram(n: int, s1: str, s2: str, weighted: bool) -> int:
    return _ngram_score(n, s1, s2, weighted) \
        - max(abs(len(s2) - len(s1)) - 2, 0)


def _lcs(s1: str, s2: str) -> int:
    lengths = [0] * (len(s2) + 1)
    for i in range(1, len(s1) + 1):
        prev = 0
        for j in range(1, len(s2) + 1):
            cur = lengths[j]
            lengths[j] = prev + 1 if s1[i - 1] == s2[j - 1] \
                else max(cur, lengths[j - 1])
            prev = cur
    return lengths[len(s2)]


def _common_character_position_score(s1: str, s2: str) -> int:
    num = 0
    diff_pos1 = diff_pos2 = -1
    diff = 0
    i = 0
    for i in range(min(len(s1), len(s2))):
        if s1[i] == s2[i]:
            num += 1
        else:
            if diff == 0:
                diff_pos1 = i
            elif diff == 1:
                diff_pos2 = i
            diff += 1
    i = min(len(s1), len(s2))
    common = 1 if num > 0 else 0
    if diff == 2 and i == len(s1) == len(s2) \
            and s1[diff_pos1] == s2[diff_pos2] \
            and s1[diff_pos2] == s2[diff_pos1]:
        return common + 10
    return common


def _calc_threshold(word: str) -> int:
    """Minimum passable score: the word mangled three ways
    (every 4th char starred) sets the bar
    (GeneratingSuggester.calcThreshold)."""
    thresh = 0
    for sp in range(1, 4):
        mw = list(word)
        for k in range(sp, len(word), 4):
            mw[k] = "*"
        thresh += _any_mismatch_ngram(len(word), word, "".join(mw),
                                      False)
    return thresh // 3 - 1 if thresh >= 0 else -(-thresh // 3) - 1


# ---------------------------------------------------------------------------
# Suggestion record (Suggestion.java:25)


class _Suggestion:
    __slots__ = ("raw", "result")

    def __init__(self, raw: str, misspelled: str, original_case: str,
                 d: HunspellDictionary):
        self.raw = raw
        adjusted = _adjust_case(raw, misspelled, original_case)
        ok = " " in adjusted or d.spell(adjusted)
        out = [d._apply_oconv(adjusted if ok else raw)]
        if original_case == "upper" and d.check_sharps and "ß" in raw:
            out.append(d._apply_oconv(raw))
        self.result = tuple(out)

    def key(self):
        return (self.raw, self.result)


def _adjust_case(candidate: str, misspelled: str,
                 original_case: str) -> str:
    if original_case == "upper":
        return candidate.upper()
    if misspelled[:1].isupper():
        return candidate[:1].upper() + candidate[1:]
    return candidate


class _OrderedSuggestions:
    """LinkedHashSet<Suggestion>: insertion-ordered, deduped by
    (raw, result)."""

    def __init__(self):
        self._items: dict = {}

    def add(self, s: _Suggestion) -> bool:
        k = s.key()
        if k in self._items:
            return False
        self._items[k] = s
        return True

    def __iter__(self):
        return iter(list(self._items.values()))

    def __len__(self):
        return len(self._items)

    def clear(self):
        self._items.clear()

    def replace(self, items):
        self._items = {s.key(): s for s in items}


# ---------------------------------------------------------------------------
# Modification phase (ModifyingSuggester.java)


class _ModifyingSuggester:
    def __init__(self, d: HunspellDictionary,
                 result: _OrderedSuggestions, misspelled: str,
                 word_case: str, proceed_past_rep: bool):
        self.d = d
        self.result = result
        self.misspelled = misspelled
        self.word_case = word_case
        self.proceed_past_rep = proceed_past_rep
        self.tried: set = set()

    def _sugg(self, candidate: str) -> _Suggestion:
        return _Suggestion(candidate, self.misspelled, self.word_case,
                           self.d)

    def suggest(self) -> bool:
        d = self.d
        low = d._lower(self.misspelled) \
            if self.word_case != "lower" else self.misspelled
        if self.word_case in ("upper", "mixed"):
            self.try_suggestion(low)

        good = self.try_variations_of(self.misspelled)

        if self.word_case == "title":
            good |= self.try_variations_of(low)
        elif self.word_case == "upper":
            good |= self.try_variations_of(low)
            good |= self.try_variations_of(
                d._title_case(self.misspelled))
        elif self.word_case == "mixed":
            dot = self.misspelled.find(".")
            if 0 < dot < len(self.misspelled) - 1:
                after = self.misspelled[dot + 1:]
                if _case_of(after) == "title":
                    self.result.add(self._sugg(
                        self.misspelled[:dot + 1] + " " + after))
            first = self.misspelled[0]
            capitalized = first.isupper()
            if capitalized:
                good |= self.try_variations_of(
                    d._case_fold_char(first) + self.misspelled[1:])
            good |= self.try_variations_of(low)
            if capitalized:
                good |= self.try_variations_of(d._title_case(low))

            reordered = []
            for cand in self.result:
                changed = self._capitalize_after_space(cand.raw)
                if changed is None:
                    reordered.append(cand)
                else:
                    reordered.insert(0, changed)
            self.result.replace(reordered)
        return good

    def _capitalize_after_space(self, candidate: str):
        # aNew -> "a New" (instead of "a new")
        space = candidate.find(" ")
        tail = len(candidate) - space - 1
        if space > 0 and self.misspelled[len(self.misspelled) - tail:] \
                != candidate[space + 1:]:
            return self._sugg(candidate[:space + 1]
                              + candidate[space + 1].upper()
                              + candidate[space + 2:])
        return None

    def try_variations_of(self, word: str) -> bool:
        good = self.try_suggestion(word.upper())

        rep = self.try_rep(word)
        if rep == "best" and not self.proceed_past_rep:
            return True
        good |= rep != "none"

        if self.d.map_table:
            self.enumerate_map_replacements(word, "", 0)

        self.try_swapping_chars(word)
        self.try_long_swap(word)
        self.try_neighbor_keys(word)
        self.try_removing_char(word)
        self.try_adding_char(word)
        self.try_moving_char(word)
        self.try_replacing_char(word)
        self.try_two_duplicate_chars(word)

        good_split = self.check_dictionary_for_split_suggestions(word)
        if good_split:
            copy = list(self.result)
            self.result.clear()
            for s in good_split:
                self.result.add(s)
            if good:
                for s in copy:
                    self.result.add(s)
            good = True

        if not good and self.d.enable_split_suggestions:
            self.try_splitting(word)
        return good

    def try_rep(self, word: str) -> str:
        has_best = False
        before = len(self.result)
        for src, dst in self.d.rep_table:
            for candidate in _Rep(src, dst).substitute(word):
                candidate = candidate.strip()
                if self.try_suggestion(candidate):
                    has_best = True
                    continue
                if " " in candidate and all(
                        self.check_simple_word(p)
                        for p in candidate.split(" ")):
                    self.result.add(self._sugg(candidate))
        if has_best:
            return "best"
        return "normal" if len(self.result) > before else "none"

    def enumerate_map_replacements(self, word: str, accumulated: str,
                                   offset: int) -> None:
        if offset == len(word):
            self.try_suggestion(accumulated)
            return
        for entries in self.d.map_table:
            for entry in entries:
                if word.startswith(entry, offset):
                    for replacement in entries:
                        if entry != replacement:
                            self.enumerate_map_replacements(
                                word, accumulated + replacement,
                                offset + len(entry))
        self.enumerate_map_replacements(
            word, accumulated + word[offset], offset + 1)

    def check_simple_word(self, part: str) -> bool:
        return self.d._check_simple(part, False) is True

    def try_swapping_chars(self, word: str) -> None:
        length = len(word)
        for i in range(length - 1):
            self.try_suggestion(word[:i] + word[i + 1] + word[i]
                                + word[i + 2:])
        if length in (4, 5):
            self._try_double_swap_for_short_words(word, length)

    def _try_double_swap_for_short_words(self, word: str,
                                         length: int) -> None:
        # ahev -> have, owudl -> would
        c = list(word)
        c[0], c[1] = word[1], word[0]
        c[length - 1], c[length - 2] = word[length - 2], word[length - 1]
        self.try_suggestion("".join(c))
        if length == 5:
            c[0] = word[0]
            c[1], c[2] = word[2], word[1]
            self.try_suggestion("".join(c))

    def try_neighbor_keys(self, word: str) -> None:
        for i, ch in enumerate(word):
            up = ch.upper()
            if up != ch and len(up) == 1:
                self.try_suggestion(word[:i] + up + word[i + 1:])
            for group in self.d.neighbor_key_groups:
                if ch in group:
                    for g in group:
                        if g != ch:
                            self.try_suggestion(word[:i] + g
                                                + word[i + 1:])

    def try_long_swap(self, word: str) -> None:
        for i in range(len(word)):
            for j in range(i + 2,
                           min(len(word), i + MAX_CHAR_DISTANCE + 1)):
                self.try_suggestion(word[:i] + word[j]
                                    + word[i + 1:j] + word[i]
                                    + word[j + 1:])

    def try_removing_char(self, word: str) -> None:
        if len(word) == 1:
            return
        for i in range(len(word)):
            self.try_suggestion(word[:i] + word[i + 1:])

    def try_adding_char(self, word: str) -> None:
        for i in range(len(word) + 1):
            for c in self.d.try_chars:
                self.try_suggestion(word[:i] + c + word[i:])

    def try_moving_char(self, word: str) -> None:
        for i in range(len(word)):
            prefix = word[:i]
            for j in range(i + 2,
                           min(len(word), i + MAX_CHAR_DISTANCE + 1)):
                self.try_suggestion(prefix + word[i + 1:j] + word[i]
                                    + word[j:])
                self.try_suggestion(prefix + word[j] + word[i:j]
                                    + word[j + 1:])
            if i < len(word) - 1:
                self.try_suggestion(prefix + word[i + 1:] + word[i])

    def try_replacing_char(self, word: str) -> None:
        for i in range(len(word)):
            for c in self.d.try_chars:
                if c != word[i]:
                    self.try_suggestion(word[:i] + c + word[i + 1:])

    def try_two_duplicate_chars(self, word: str) -> None:
        # perhaps we doubled two characters (vacation -> vacacation)
        dup_len = 0
        for i in range(2, len(word)):
            if word[i] == word[i - 2]:
                dup_len += 1
                if dup_len == 3 or (dup_len == 2 and i >= 4):
                    self.try_suggestion(word[:i - 1] + word[i + 1:])
                    dup_len = 0
            else:
                dup_len = 0

    def check_dictionary_for_split_suggestions(self, word: str) -> list:
        out = []
        for i in range(1, len(word) - 1):
            w1, w2 = word[:i], word[i:]
            spaced = w1 + " " + w2
            if self.d._check_word(spaced):
                out.append(self._sugg(spaced))
            if self._should_split_by_dash():
                dashed = w1 + "-" + w2
                if self.d._check_word(dashed):
                    out.append(self._sugg(dashed))
        return out

    def try_splitting(self, word: str) -> None:
        for i in range(1, len(word)):
            w1, w2 = word[:i], word[i:]
            if self.check_simple_word(w1) and self.check_simple_word(w2):
                self.result.add(self._sugg(w1 + " " + w2))
                if len(w1) > 1 and len(w2) > 1 \
                        and self._should_split_by_dash():
                    self.result.add(self._sugg(w1 + "-" + w2))

    def _should_split_by_dash(self) -> bool:
        return "-" in self.d.try_chars or "a" in self.d.try_chars

    def try_suggestion(self, candidate: str) -> bool:
        if candidate in self.tried:
            return False
        self.tried.add(candidate)
        if not self.d._check_word(candidate):
            return False
        return self.result.add(self._sugg(candidate))


# ---------------------------------------------------------------------------
# Enumeration phase (GeneratingSuggester.java)


class _GeneratingSuggester:
    def __init__(self, d: HunspellDictionary):
        self.d = d

    def suggest(self, word: str, original_case: str,
                prev: _OrderedSuggestions) -> list:
        roots = self._find_similar_dictionary_entries(
            word, original_case)
        expanded = self._expand_roots(word, roots)
        ranked = self._rank_by_similarity(word, expanded)
        return self._most_relevant(ranked, prev)

    def _find_similar_dictionary_entries(self, word: str,
                                         original_case: str) -> list:
        d = self.d
        exclude = {f for f in (d.no_suggest, d.forbiddenword,
                               d.onlyincompound, d.sub_standard)
                   if f is not None}
        ignore_title = original_case == "lower" \
            and d.lang_code != "de"
        lo, hi = max(1, len(word) - MAX_ROOT_LENGTH_DIFF), \
            len(word) + MAX_ROOT_LENGTH_DIFF
        cands = []
        for root, entries in d.words.items():
            if not lo <= len(root) <= hi:
                continue
            if ignore_title and _case_of(root) == "title":
                continue
            lower_root = d._lower(root)
            sc = _ngram_score(3, word, lower_root, False)
            if sc == 0:
                continue                     # no common chars at all
            sc += _common_prefix(word, root) \
                - _longer_worse_penalty(len(word), len(root))
            for idx, flags in enumerate(entries):
                if exclude & set(flags):
                    continue
                cands.append((-sc, root, idx, flags))
        cands.sort(key=lambda t: (t[0], t[1], t[2]))
        return [(root, flags, -negsc)
                for negsc, root, _idx, flags in cands[:MAX_ROOTS]]

    def _all_rules(self, table) -> list:
        out = []
        for rules in table.values():
            out.extend(rules)
        return out

    def _cond_ok(self, rule: _Affix, pseudo_root: str,
                 prefix: bool) -> bool:
        """AffixCondition.acceptsStem on the stem: equivalent to the
        rule's condition matching ``strip+stem`` (prefix) /
        ``stem+strip`` (suffix) at the relevant edge."""
        if rule.cond_re is None:
            return True
        import re as _re
        if prefix:
            return _re.match(rule.cond, pseudo_root) is not None
        return rule.cond_re.search(pseudo_root) is not None

    def _expand_root(self, root: str, flags, misspelled: str) -> list:
        d = self.d
        result: dict = {}
        cross_products: list = []

        def bad_append(rule):
            return any(f is not None and f in rule.append_flags
                       for f in (d.needaffix, d.circumfix,
                                 d.onlyincompound))

        if d.needaffix is None or d.needaffix not in flags:
            result[root] = True

        # suffixes whose full append text ends the misspelled word,
        # shortest append first (the FST walk goes tail-inward)
        sfx_rules = sorted(
            enumerate(self._all_rules(d.suffixes)),
            key=lambda t: (len(t[1].append), t[0]))
        for _i, rule in sfx_rules:
            if rule.append and not misspelled.endswith(rule.append):
                continue
            strip_len = len(rule.strip)
            stem_len = len(root) - strip_len
            if stem_len < 0 or rule.flag not in flags \
                    or bad_append(rule):
                continue
            if not self._cond_ok(rule, root[:stem_len] + rule.strip,
                                 False):
                continue
            suffix = misspelled[len(misspelled) - len(rule.append):] \
                if rule.append else ""
            with_suffix = root[:stem_len] + suffix
            result[with_suffix] = True
            if rule.cross:
                cross_products.append(with_suffix)

        pfx_rules = sorted(
            enumerate(self._all_rules(d.prefixes)),
            key=lambda t: (len(t[1].append), t[0]))

        # cross-product prefixes over the suffixed forms
        for _i, rule in pfx_rules:
            if rule.append and not misspelled.startswith(rule.append):
                continue
            if rule.flag not in flags or not rule.cross:
                continue
            strip_len = len(rule.strip)
            prefix = misspelled[:len(rule.append)]
            for suffixed in cross_products:
                if len(suffixed) - strip_len < 0:
                    continue
                if self._cond_ok(rule,
                                 rule.strip + suffixed[strip_len:],
                                 True):
                    result[prefix + suffixed[strip_len:]] = True

        # pure prefixes
        for _i, rule in pfx_rules:
            if rule.append and not misspelled.startswith(rule.append):
                continue
            strip_len = len(rule.strip)
            if len(root) - strip_len < 0 or rule.flag not in flags \
                    or bad_append(rule):
                continue
            if self._cond_ok(rule, rule.strip + root[strip_len:],
                             True):
                result[misspelled[:len(rule.append)]
                       + root[strip_len:]] = True

        return list(result)[:MAX_WORDS]

    def _expand_roots(self, misspelled: str, roots: list) -> list:
        thresh = _calc_threshold(misspelled)
        expanded: set = set()
        for root, flags, _sc in roots:
            for guess in self._expand_root(root, flags, misspelled):
                lower = self.d._lower(guess)
                sc = _any_mismatch_ngram(len(misspelled), misspelled,
                                         lower, False) \
                    + _common_prefix(misspelled, guess)
                if sc > thresh:
                    expanded.add((-sc, guess))
        return [(g, -negsc) for negsc, g in
                sorted(expanded)[:MAX_GUESSES]]

    def _rank_by_similarity(self, word: str, expanded: list) -> list:
        d = self.d
        fact = (10.0 - d.max_diff) / 5.0
        ranked: set = set()
        for guess, score in expanded:
            lower = d._lower(guess)
            if lower == word:
                ranked.add((-(score + 2000), guess))
                break
            re_ = _any_mismatch_ngram(2, word, lower, True) \
                + _any_mismatch_ngram(2, lower, word, True)
            sc = (2 * _lcs(word, lower)
                  - abs(len(word) - len(lower))
                  + _common_character_position_score(word, lower)
                  + _common_prefix(word, lower)
                  + _any_mismatch_ngram(4, word, lower, False)
                  + re_
                  + (-1000 if re_ < (len(word) + len(lower)) * fact
                     else 0))
            ranked.add((-sc, guess))
        return [(g, -negsc) for negsc, g in sorted(ranked)]

    def _most_relevant(self, ranked: list,
                       prev: _OrderedSuggestions) -> list:
        d = self.d
        result: list = []
        has_excellent = False
        prev_raws = [s.raw for s in prev]
        for guess, score in ranked:
            if score > 1000:
                has_excellent = True
            elif has_excellent:
                break                # keep only excellent ones, if any
            bad = score < -100
            if bad and (result or d.only_max_diff):
                break
            if all(r not in guess for r in prev_raws) \
                    and all(r not in guess for r in result) \
                    and d._check_word(guess):
                result.append(guess)
                if len(result) >= d.max_ngram_suggestions:
                    break
            if bad:
                break
        return result


# ---------------------------------------------------------------------------
# Orchestration (Suggester.java:147)


class Suggester:
    def __init__(self, d: HunspellDictionary,
                 proceed_past_rep: bool = False):
        self.d = d
        self.proceed_past_rep = proceed_past_rep

    def suggest(self, word: str) -> list:
        d = self.d
        if len(word) >= 100:
            return []
        excl = frozenset(f for f in (d.no_suggest, d.sub_standard)
                         if f is not None)
        old = d._exclude
        d._exclude = excl
        try:
            return self._suggest(word)
        finally:
            d._exclude = old

    def _suggest(self, word: str) -> list:
        d = self.d
        word = d._clean_input(word)
        if not word:
            return []
        word_case = _case_of(word)
        if d.force_ucase is not None and word_case == "lower":
            title = d._title_case(word)
            if d.spell(title):
                return [title]

        suggestions = _OrderedSuggestions()
        good = _ModifyingSuggester(
            d, suggestions, word, word_case,
            self.proceed_past_rep).suggest()

        if not good and d.max_ngram_suggestions > 0:
            for raw in _GeneratingSuggester(d).suggest(
                    d._lower(word), word_case, suggestions):
                suggestions.add(_Suggestion(raw, word, word_case, d))

        if "-" in word and not any("-" in s.raw for s in suggestions):
            for raw in self._modify_chunks_between_dashes(word):
                suggestions.add(_Suggestion(raw, word, word_case, d))

        out: list = []
        for s in suggestions:
            for r in s.result:
                if r not in out:
                    out.append(r)
        return out

    def _modify_chunks_between_dashes(self, word: str) -> list:
        d = self.d
        result = []
        chunk_start = 0
        while chunk_start < len(word):
            chunk_end = word.find("-", chunk_start)
            if chunk_end < 0:
                chunk_end = len(word)
            if chunk_end > chunk_start:
                chunk = word[chunk_start:chunk_end]
                if not d.spell(chunk):
                    for chunk_sug in self._suggest(chunk):
                        replaced = word[:chunk_start] + chunk_sug \
                            + word[chunk_end:]
                        if d.spell(replaced):
                            result.append(replaced)
            chunk_start = chunk_end + 1
        return result
