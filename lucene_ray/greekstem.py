"""Greek stemmer (Ntais, "Development of a Stemmer for the Greek
Language"), ported rule-for-rule from the reference
``el/GreekStemmer.java:42-688``.

Input must already be Greek-casefolded (lowercase, diacritics removed,
final sigma folded) — the ``greek_lower`` normalizer (langnorm) is the
chain head, exactly as GreekAnalyzer stacks GreekLowerCaseFilter before
GreekStemFilter.

Two reference quirks are reproduced deliberately:

- rule8's middle branches mix ``&&``/``||`` precedence so the 7/6/5
  -char suffixes ``ουντανε/ηθηκανε``, ``οντανε/ουσανε`` and
  ``ησανε/οτανε/ηκανε`` fire WITHOUT their length guard (a word equal
  to its suffix stems to the empty string);
- several "add back" steps overwrite buffer chars rather than restore
  the removed suffix (rule8 ``αγαν``, rule10 ``οντ/ωντ``, rule11/18/19)
  — modeled here by appending the literal replacement.
"""

from __future__ import annotations

_EL_EXC4 = frozenset(('θ', 'δ', 'ελ', 'γαλ', 'ν', 'π', 'ιδ', 'παρ'))
_EL_EXC6 = frozenset((
    'αλ', 'αδ', 'ενδ', 'αμαν', 'αμμοχαλ', 'ηθ', 'ανηθ', 'αντιδ',
    'φυσ', 'βρωμ', 'γερ', 'εξωδ', 'καλπ', 'καλλιν', 'καταδ', 'μουλ',
    'μπαν', 'μπαγιατ', 'μπολ', 'μποσ', 'νιτ', 'ξικ', 'συνομηλ',
    'πετσ', 'πιτσ', 'πικαντ', 'πλιατσ', 'ποστελν', 'πρωτοδ', 'σερτ',
    'συναδ', 'τσαμ', 'υποδ', 'φιλον', 'φυλοδ', 'χασ'))
_EL_EXC7 = frozenset(('αναπ', 'αποθ', 'αποκ', 'αποστ', 'βουβ', 'ξεθ',
                      'ουλ', 'πεθ', 'πικρ', 'ποτ', 'σιχ', 'χ'))
_EL_EXC8A = frozenset(('τρ', 'τσ'))
_EL_EXC8B = frozenset((
    'βετερ', 'βουλκ', 'βραχμ', 'γ', 'δραδουμ', 'θ', 'καλπουζ',
    'καστελ', 'κορμορ', 'λαοπλ', 'μωαμεθ', 'μ', 'μουσουλμ', 'ν',
    'ουλ', 'π', 'πελεκ', 'πλ', 'πολισ', 'πορτολ', 'σαρακατσ',
    'σουλτ', 'τσαρλατ', 'ορφ', 'τσιγγ', 'τσοπ', 'φωτοστεφ', 'χ',
    'ψυχοπλ', 'αγ', 'γαλ', 'γερ', 'δεκ', 'διπλ', 'αμερικαν', 'ουρ',
    'πιθ', 'πουριτ', 'σ', 'ζωντ', 'ικ', 'καστ', 'κοπ', 'λιχ',
    'λουθηρ', 'μαιντ', 'μελ', 'σιγ', 'σπ', 'στεγ', 'τραγ', 'τσαγ',
    'φ', 'ερ', 'αδαπ', 'αθιγγ', 'αμηχ', 'ανικ', 'ανοργ', 'απηγ',
    'απιθ', 'ατσιγγ', 'βασ', 'βασκ', 'βαθυγαλ', 'βιομηχ', 'βραχυκ',
    'διατ', 'διαφ', 'ενοργ', 'θυσ', 'καπνοβιομηχ', 'καταγαλ', 'κλιβ',
    'κοιλαρφ', 'λιβ', 'μεγλοβιομηχ', 'μικροβιομηχ', 'νταβ',
    'ξηροκλιβ', 'ολιγοδαμ', 'ολογαλ', 'πενταρφ', 'περηφ', 'περιτρ',
    'πλατ', 'πολυδαπ', 'πολυμηχ', 'στεφ', 'ταβ', 'τετ', 'υπερηφ',
    'υποκοπ', 'χαμηλοδαπ', 'ψηλοταβ'))
_EL_EXC9 = frozenset((
    'αβαρ', 'βεν', 'εναρ', 'αβρ', 'αδ', 'αθ', 'αν', 'απλ', 'βαρον',
    'ντρ', 'σκ', 'κοπ', 'μπορ', 'νιφ', 'παγ', 'παρακαλ', 'σερπ',
    'σκελ', 'συρφ', 'τοκ', 'υ', 'δ', 'εμ', 'θαρρ', 'θ'))
_EL_EXC12A = frozenset(('π', 'απ', 'συμπ', 'ασυμπ', 'ακαταπ',
                        'αμεταμφ'))
_EL_EXC12B = frozenset(('αλ', 'αρ', 'εκτελ', 'ζ', 'μ', 'ξ',
                        'παρακαλ', 'προ', 'νισ'))
_EL_EXC13 = frozenset(('διαθ', 'θ', 'παρακαταθ', 'προσθ', 'συνθ'))
_EL_EXC14 = frozenset((
    'φαρμακ', 'χαδ', 'αγκ', 'αναρρ', 'βρομ', 'εκλιπ', 'λαμπιδ',
    'λεχ', 'μ', 'πατ', 'ρ', 'λ', 'μεδ', 'μεσαζ', 'υποτειν', 'αμ',
    'αιθ', 'ανηκ', 'δεσποζ', 'ενδιαφερ', 'δε', 'δευτερευ',
    'καθαρευ', 'πλε', 'τσα'))
_EL_EXC15A = frozenset((
    'αβαστ', 'πολυφ', 'αδηφ', 'παμφ', 'ρ', 'ασπ', 'αφ', 'αμαλ',
    'αμαλλι', 'ανυστ', 'απερ', 'ασπαρ', 'αχαρ', 'δερβεν', 'δροσοπ',
    'ξεφ', 'νεοπ', 'νομοτ', 'ολοπ', 'ομοτ', 'προστ', 'προσωποπ',
    'συμπ', 'συντ', 'τ', 'υποτ', 'χαρ', 'αειπ', 'αιμοστ', 'ανυπ',
    'αποτ', 'αρτιπ', 'διατ', 'εν', 'επιτ', 'κροκαλοπ', 'σιδηροπ',
    'λ', 'ναυ', 'ουλαμ', 'ουρ', 'π', 'τρ', 'μ'))
_EL_EXC15B = frozenset(('ψοφ', 'ναυλοχ'))
_EL_EXC16 = frozenset(('ν', 'χερσον', 'δωδεκαν', 'ερημον', 'μεγαλον',
                       'επταν'))
_EL_EXC17 = frozenset(('ασβ', 'σβ', 'αχρ', 'χρ', 'απλ', 'αειμν',
                       'δυσχρ', 'ευχρ', 'κοινοχρ', 'παλιμψ'))
_EL_EXC18 = frozenset(('ν', 'ρ', 'σπι', 'στραβομουτσ', 'κακομουτσ',
                       'εξων'))
_EL_EXC19 = frozenset(('παρασουσ', 'φ', 'χ', 'ωριοπλ', 'αζ',
                       'αλλοσουσ', 'ασουσ'))

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")


def _ev(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _evny(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


def _r0(w):
    n = len(w)
    if n > 9 and w.endswith(("καθεστωτοσ", "καθεστωτων")):
        return w[:-4]
    if n > 8 and w.endswith(("γεγονοτοσ", "γεγονοτων")):
        return w[:-4]
    if n > 8 and w.endswith("καθεστωτα"):
        return w[:-3]
    if n > 7 and w.endswith(("τατογιου", "τατογιων")):
        return w[:-4]
    if n > 7 and w.endswith("γεγονοτα"):
        return w[:-3]
    if n > 7 and w.endswith("καθεστωσ"):
        return w[:-2]
    # the reference's (len>6 && A) || B ... grouping is equivalent to
    # a plain guard here: every suffix is 7 chars
    if n > 6 and w.endswith(("σκαγιου", "σκαγιων", "ολογιου",
                             "ολογιων", "κρεατοσ", "κρεατων",
                             "περατοσ", "περατων", "τερατοσ",
                             "τερατων")):
        return w[:-4]
    if n > 6 and w.endswith("τατογια"):
        return w[:-3]
    if n > 6 and w.endswith("γεγονοσ"):
        return w[:-2]
    if n > 5 and w.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return w[:-4]
    if n > 5 and w.endswith(("σκαγια", "ολογια", "κρεατα", "περατα",
                             "τερατα")):
        return w[:-3]
    if n > 4 and w.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return w[:-3]
    if n > 4 and w.endswith(("κρεασ", "περασ", "τερασ")):
        return w[:-2]
    if n > 3 and w.endswith("φωτα"):
        return w[:-2]
    if n > 2 and w.endswith("φωσ"):
        return w[:-1]
    return w


def _r1(w):
    if len(w) > 4 and w.endswith(("αδεσ", "αδων")):
        s = w[:-4]
        if not s.endswith(("οκ", "μαμ", "μαν", "μπαμπ", "πατερ",
                           "γιαγι", "νταντ", "κυρ", "θει", "πεθερ")):
            return w[:-2]        # keep -αδ
        return s
    return w


def _r2(w):
    if len(w) > 4 and w.endswith(("εδεσ", "εδων")):
        s = w[:-4]
        if s.endswith(("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ",
                       "κρασπ", "μιλ")):
            return w[:-2]        # keep -εδ
        return s
    return w


def _r3(w):
    if len(w) > 5 and w.endswith(("ουδεσ", "ουδων")):
        s = w[:-5]
        if s.endswith(("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
                       "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ",
                       "τραγ", "φε")):
            return w[:-2]        # keep -ουδ
        return s
    return w


def _r4(w):
    if len(w) > 3 and w.endswith(("εωσ", "εων")):
        s = w[:-3]
        return s + "ε" if s in _EL_EXC4 else s
    return w


def _r5(w):
    if len(w) > 2 and w.endswith("ια"):
        s = w[:-2]
        return s + "ι" if _ev(s) else s
    if len(w) > 3 and w.endswith(("ιου", "ιων")):
        s = w[:-3]
        return s + "ι" if _ev(s) else s
    return w


def _r6(w):
    s = None
    if len(w) > 3 and w.endswith(("ικα", "ικο")):
        s = w[:-3]
    elif len(w) > 4 and w.endswith(("ικου", "ικων")):
        s = w[:-4]
    if s is None:
        return w
    return s + "ικ" if (_ev(s) or s in _EL_EXC6) else s


def _r7(w):
    n = len(w)
    if n == 5 and w.endswith("αγαμε"):
        return w[:-1]
    if n > 7 and w.endswith("ηθηκαμε"):
        w = w[:-7]
    elif n > 6 and w.endswith("ουσαμε"):
        w = w[:-6]
    elif n > 5 and w.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        w = w[:-5]
    if len(w) > 3 and w.endswith("αμε"):
        s = w[:-3]
        return s + "αμ" if s in _EL_EXC7 else s
    return w


def _r8(w):
    n = len(w)
    removed = False
    if n > 8 and w.endswith("ιουντανε"):
        w = w[:-8]
        removed = True
    # precedence quirks: the 7/6/5-char alternates have NO len guard
    elif (n > 7 and w.endswith("ιοντανε")) \
            or w.endswith(("ουντανε", "ηθηκανε")):
        w = w[:-7]
        removed = True
    elif (n > 6 and w.endswith("ιοτανε")) \
            or w.endswith(("οντανε", "ουσανε")):
        w = w[:-6]
        removed = True
    elif (n > 5 and w.endswith("αγανε")) \
            or w.endswith(("ησανε", "οτανε", "ηκανε")):
        w = w[:-5]
        removed = True
    if removed and w in _EL_EXC8A:
        w = w + "αγαν"
    if len(w) > 3 and w.endswith("ανε"):
        s = w[:-3]
        return s + "αν" if (_evny(s) or s in _EL_EXC8B) else s
    return w


def _r9(w):
    if len(w) > 5 and w.endswith("ησετε"):
        w = w[:-5]
    if len(w) > 3 and w.endswith("ετε"):
        s = w[:-3]
        if (s in _EL_EXC9 or _evny(s)
                or s.endswith(("οδ", "αιρ", "φορ", "ταθ", "διαθ",
                               "σχ", "ενδ", "ευρ", "τιθ", "υπερθ",
                               "ραθ", "ενθ", "ροθ", "σθ", "πυρ",
                               "αιν", "συνδ", "συν", "συνθ", "χωρ",
                               "πον", "βρ", "καθ", "ευθ", "εκθ",
                               "νετ", "ρον", "αρκ", "βαρ", "βολ",
                               "ωφελ"))):
            return s + "ετ"
        return s
    return w


def _r10(w):
    if len(w) > 5 and w.endswith(("οντασ", "ωντασ")):
        s = w[:-5]
        if len(s) == 3 and s.endswith("αρχ"):
            s = s + "οντ"
        if s.endswith("κρε"):
            s = s + "ωντ"
        return s
    return w


def _r11(w):
    if len(w) > 6 and w.endswith("ομαστε"):
        s = w[:-6]
        return w[:-1] if (len(s) == 2 and s.endswith("ον")) else s
    if len(w) > 7 and w.endswith("ιομαστε"):
        s = w[:-7]
        return s + "ομαστ" if (len(s) == 2 and s.endswith("ον")) \
            else s
    return w


def _r12(w):
    if len(w) > 5 and w.endswith("ιεστε"):
        s = w[:-5]
        w = s + "ιεστ" if s in _EL_EXC12A else s
    if len(w) > 4 and w.endswith("εστε"):
        s = w[:-4]
        return s + "εστ" if s in _EL_EXC12B else s
    return w


def _r13(w):
    if len(w) > 6 and w.endswith("ηθηκεσ"):
        w = w[:-6]
    elif len(w) > 5 and w.endswith(("ηθηκα", "ηθηκε")):
        w = w[:-5]
    removed = False
    if len(w) > 4 and w.endswith("ηκεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ηκα", "ηκε")):
        w = w[:-3]
        removed = True
    if removed and (w in _EL_EXC13
                    or w.endswith(("σκωλ", "σκουλ", "ναρθ", "σφ",
                                   "οθ", "πιθ"))):
        w = w + "ηκ"
    return w


def _r14(w):
    removed = False
    if len(w) > 5 and w.endswith("ουσεσ"):
        w = w[:-5]
        removed = True
    elif len(w) > 4 and w.endswith(("ουσα", "ουσε")):
        w = w[:-4]
        removed = True
    if removed and (w in _EL_EXC14 or _ev(w)
                    or w.endswith(("ποδαρ", "βλεπ", "πανταχ", "φρυδ",
                                   "μαντιλ", "μαλλ", "κυματ", "λαχ",
                                   "ληγ", "φαγ", "ομ", "πρωτ"))):
        w = w + "ουσ"
    return w


def _r15(w):
    removed = False
    if len(w) > 4 and w.endswith("αγεσ"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("αγα", "αγε")):
        w = w[:-3]
        removed = True
    if removed:
        cond1 = (w in _EL_EXC15A
                 or w.endswith(("οφ", "πελ", "χορτ", "λλ", "σφ",
                                "ρπ", "φρ", "πρ", "λοχ", "σμην")))
        cond2 = w in _EL_EXC15B or w.endswith("κολλ")
        if cond1 and not cond2:
            w = w + "αγ"
    return w


def _r16(w):
    removed = False
    if len(w) > 4 and w.endswith("ησου"):
        w = w[:-4]
        removed = True
    elif len(w) > 3 and w.endswith(("ησε", "ησα")):
        w = w[:-3]
        removed = True
    if removed and w in _EL_EXC16:
        w = w + "ησ"
    return w


def _r17(w):
    if len(w) > 4 and w.endswith("ηστε"):
        s = w[:-4]
        return s + "ηστ" if s in _EL_EXC17 else s
    return w


def _r18(w):
    removed = False
    if len(w) > 6 and w.endswith(("ησουνε", "ηθουνε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουνε"):
        w = w[:-4]
        removed = True
    if removed and w in _EL_EXC18:
        w = w + "ουν"
    return w


def _r19(w):
    removed = False
    if len(w) > 6 and w.endswith(("ησουμε", "ηθουμε")):
        w = w[:-6]
        removed = True
    elif len(w) > 4 and w.endswith("ουμε"):
        w = w[:-4]
        removed = True
    if removed and w in _EL_EXC19:
        w = w + "ουμ"
    return w


def _r20(w):
    if len(w) > 5 and w.endswith(("ματων", "ματοσ")):
        return w[:-3]
    if len(w) > 4 and w.endswith("ματα"):
        return w[:-2]
    return w


_R21_GROUPS = (
    (9, 9, ("ιοντουσαν",)),
    (8, 8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
    (7, 7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
            "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
            "ουμαστε")),
    (6, 6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν",
            "ομουνα", "οσαστε", "οσουνα", "ουνται", "ουνταν",
            "ουσατε")),
    (5, 5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα",
            "ηθεισ", "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν",
            "ονται", "ονταν", "οσουν", "ουμαι", "ουσαν")),
    (4, 4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται",
            "ηδεσ", "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ",
            "ομαι", "οταν")),
    (3, 3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
    (2, 2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου",
            "υσ", "ων")),
)


def _r21(w):
    for guard, strip, sufs in _R21_GROUPS:
        if len(w) > guard and w.endswith(sufs):
            return w[:-strip]
    if len(w) > 1 and _ev(w):
        return w[:-1]
    return w


def _r22(w):
    if w.endswith(("εστερ", "εστατ")):
        return w[:-5]
    if w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return w[:-4]
    return w


_SHORT_RULES = (_r0, _r1, _r2, _r3, _r4, _r5, _r6, _r7, _r8, _r9,
                _r10, _r11, _r12, _r13, _r14, _r15, _r16, _r17, _r18,
                _r19, _r20)


def greek_stem(w: str) -> str:
    """el/GreekStemmer.java:42 — expects greek_lower'd input."""
    if len(w) < 4:
        return w
    orig = w
    for r in _SHORT_RULES:
        w = r(w)
    if w == orig:
        w = _r21(w)
    return _r22(w)
