"""Light stemmers (Savoy's "Light Stemming Approaches" family, as shipped
in the reference's analysis/common):

- German  — de/GermanLightStemmer.java:40  (umlaut/accent fold + two
  suffix-strip steps)
- Spanish — es/SpanishLightStemmer.java:40
- Italian — it/ItalianLightStemmer.java:40
- Swedish — sv/SwedishLightStemmer.java:40
- Russian — ru/RussianLightStemmer.java:40 (removeCase + normalize)
- French  — fr/FrenchLightStemmer.java:40  (suffix rewrites + norm with
  accent fold, duplicate-letter deletion, ie/r/e tail strip)

Each stemmer is validated against the reference's complete vocabulary
test files ({de,es,it,sv,ru,fr}light.txt — ~200k word/stem pairs) in
tests/test_lightstem.py.  All are registered as vocabulary-level token
filters (analysis_en.TOKEN_FILTERS), so
``Index.build(analyzer="german_light")`` etc. run them through the
standard chain.
"""

from __future__ import annotations

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST = frozenset("bdfghklmnt")


def german_light_stem(w: str) -> str:
    w = w.translate(_DE_FOLD)
    n = len(w)
    # step 1
    if n > 5 and w.endswith("ern"):
        w = w[:-3]
    elif n > 4 and n >= 2 and w[-2] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif n > 3 and w.endswith("e"):
        w = w[:-1]
    elif n > 3 and w.endswith("s") and n >= 2 and w[-2] in _DE_ST:
        w = w[:-1]
    # step 2
    n = len(w)
    if n > 5 and w.endswith("est"):
        w = w[:-3]
    elif n > 4 and (w.endswith("er") or w.endswith("en")):
        w = w[:-2]
    elif n > 4 and w.endswith("st") and w[-3] in _DE_ST:
        w = w[:-2]
    return w


_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(w: str) -> str:
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    last = w[-1]
    if last in "oae":
        return w[:-1]
    if last == "s":
        if w[-4:-1] == "ese":
            return w[:-2]
        if w[-3:-1] == "ce":
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


_IT_FOLD = _ES_FOLD


def italian_light_stem(w: str) -> str:
    if len(w) < 6:
        return w
    w = w.translate(_IT_FOLD)
    last, prev = w[-1], w[-2]
    if last == "e":
        return w[:-2] if prev in "ih" else w[:-1]
    if last == "i":
        return w[:-2] if prev in "hi" else w[:-1]
    if last == "a":
        return w[:-2] if prev == "i" else w[:-1]
    if last == "o":
        return w[:-2] if prev == "i" else w[:-1]
    return w


def swedish_light_stem(w: str) -> str:
    if len(w) > 4 and w.endswith("s"):
        w = w[:-1]
    n = len(w)
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:-5]
    if n > 6 and w[-4:] in ("arne", "erna", "ande", "else", "aste",
                            "orna", "aren"):
        return w[:-4]
    if n > 5 and w[-3:] in ("are", "ast", "het"):
        return w[:-3]
    if n > 4 and w[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


_RU_4 = ("иями", "оями")
_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
         "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
         "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")
_RU_1 = frozenset("аеиоуйыяь")


def russian_light_stem(w: str) -> str:
    n = len(w)
    # removeCase
    if n > 6 and w[-4:] in _RU_4:
        w = w[:-4]
    elif n > 5 and w[-3:] in _RU_3:
        w = w[:-3]
    elif n > 4 and w[-2:] in _RU_2:
        w = w[:-2]
    elif n > 3 and w[-1] in _RU_1:
        w = w[:-1]
    # normalize
    n = len(w)
    if n > 3:
        if w[-1] in "ьи":
            w = w[:-1]
        elif w[-1] == "н" and w[-2] == "н":
            w = w[:-1]
    return w


_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(w: str) -> str:
    if len(w) > 4:
        w = w.translate(_FR_FOLD)
        # delete successive duplicate letters anywhere in the word
        out = [w[0]]
        for c in w[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        w = "".join(out)
    if len(w) > 4 and w.endswith("ie"):
        w = w[:-2]
    if len(w) > 4:
        if w[-1] == "r":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if w[-1] == "e":
            w = w[:-1]
        if len(w) >= 2 and w[-1] == w[-2] and w[-1].isalpha():
            w = w[:-1]
    return w


def french_light_stem(w: str) -> str:
    n = len(w)
    if n > 5 and w[-1] == "x":
        if w[-3:-1] == "au" and w[-4] != "e":
            w = w[:-2] + "l"
        else:
            w = w[:-1]
    if len(w) > 3 and w[-1] == "x":
        w = w[:-1]
    if len(w) > 3 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 9 and w.endswith("issement"):
        w = w[:-6]
        return _fr_norm(w[:-1] + "r")
    if n > 8 and w.endswith("issant"):
        return _fr_norm(w[:-4][:-1] + "r")
    if n > 6 and w.endswith("ement"):
        w = w[:-4]
        if len(w) > 3 and w.endswith("ive"):
            w = w[:-1]
            w = w[:-1] + "f"
        return _fr_norm(w)
    if n > 11 and w.endswith("ficatrice"):
        w = w[:-5]
        return _fr_norm(w[:-2] + "er")
    if n > 10 and w.endswith("ficateur"):
        w = w[:-4]
        return _fr_norm(w[:-2] + "er")
    if n > 9 and w.endswith("catrice"):
        w = w[:-3]
        return _fr_norm(w[:-4] + "que" + w[-1])
    if n > 8 and w.endswith("cateur"):
        w = w[:-2]
        return _fr_norm(w[:-4] + "quer")
    if n > 8 and w.endswith("atrice"):
        w = w[:-4]
        return _fr_norm(w[:-2] + "er")
    if n > 7 and w.endswith("ateur"):
        w = w[:-3]
        return _fr_norm(w[:-2] + "er")
    if n > 6 and w.endswith("trice"):
        w = w[:-1]
        w = w[:-3] + "eur"
    n = len(w)
    if n > 5 and w.endswith("ième"):
        return _fr_norm(w[:-4])
    if n > 7 and w.endswith("teuse"):
        w = w[:-2]
        return _fr_norm(w[:-1] + "r")
    if n > 6 and w.endswith("teur"):
        w = w[:-1]
        return _fr_norm(w[:-1] + "r")
    if n > 5 and w.endswith("euse"):
        return _fr_norm(w[:-2])
    if n > 8 and w.endswith("ère"):
        w = w[:-1]
        return _fr_norm(w[:-2] + "e" + w[-1])
    if n > 7 and w.endswith("ive"):
        w = w[:-1]
        return _fr_norm(w[:-1] + "f")
    if n > 4 and (w.endswith("folle") or w.endswith("molle")):
        w = w[:-2]
        return _fr_norm(w[:-1] + "u")
    if n > 9 and w.endswith("nnelle"):
        return _fr_norm(w[:-5])
    if n > 9 and w.endswith("nnel"):
        return _fr_norm(w[:-3])
    if n > 4 and w.endswith("ète"):
        w = w[:-1]
        w = w[:-2] + "e" + w[-1]
    n = len(w)
    if n > 8 and w.endswith("ique"):
        w = w[:-4]
    n = len(w)
    if n > 8 and w.endswith("esse"):
        return _fr_norm(w[:-3])
    if n > 7 and w.endswith("inage"):
        return _fr_norm(w[:-3])
    if n > 9 and w.endswith("isation"):
        w = w[:-7]
        if len(w) > 5 and w.endswith("ual"):
            w = w[:-2] + "e" + w[-1]
        return _fr_norm(w)
    if n > 9 and w.endswith("isateur"):
        return _fr_norm(w[:-7])
    if n > 8 and w.endswith("ation"):
        return _fr_norm(w[:-5])
    if n > 8 and w.endswith("ition"):
        return _fr_norm(w[:-5])
    return _fr_norm(w)


_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(w: str) -> str:
    n = len(w)
    if n > 4 and w.endswith("es") and w[-3] in "rslz":
        return w[:-2]
    if n > 3 and w.endswith("ns"):
        return w[:-2] + "m"
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        return w[:-3] + "el"
    if n > 4 and w.endswith("ais"):
        return w[:-2] + "l"
    if n > 4 and w.endswith("óis"):
        return w[:-3] + "ol"
    if n > 4 and w.endswith("is"):
        return w[:-1] + "l"
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        return w[:-3] + "ão"
    if n > 6 and w.endswith("mente"):
        return w[:-5]
    if n > 3 and w.endswith("s"):
        return w[:-1]
    return w


def _pt_norm_feminine(w: str) -> str:
    n = len(w)
    if n > 7 and (w.endswith("inha") or w.endswith("iaca")
                  or w.endswith("eira")):
        return w[:-1] + "o"
    if n > 6:
        if w[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return w[:-1] + "o"
        if w.endswith("ona"):
            return w[:-3] + "ão"
        if w.endswith("ora"):
            return w[:-1]
        if w.endswith("esa"):
            return w[:-3] + "ês"
        if w.endswith("na"):
            return w[:-1] + "o"
    return w


def portuguese_light_stem(w: str) -> str:
    """pt/PortugueseLightStemmer.java:40: suffix removal, feminine
    normalization, final-vowel strip, THEN the accent fold."""
    if len(w) < 4:
        return w
    w = _pt_remove_suffix(w)
    if len(w) > 3 and w.endswith("a"):
        w = _pt_norm_feminine(w)
    if len(w) > 4 and w[-1] in "eao":
        w = w[:-1]
    return w.translate(_PT_FOLD)


def _make_norwegian(bokmaal: bool, nynorsk: bool):
    def stem(w: str) -> str:
        if len(w) > 4 and w.endswith("s"):
            w = w[:-1]
        n = len(w)
        if n > 7 and ((bokmaal and (w.endswith("heter")
                                    or w.endswith("heten")))
                      or (nynorsk and w.endswith("heita"))):
            return w[:-5]
        if n > 8 and nynorsk and (w.endswith("heiter")
                                  or w.endswith("leiken")
                                  or w.endswith("leikar")):
            return w[:-6]
        if n > 5 and (w.endswith("dom")
                      or (bokmaal and w.endswith("het"))):
            return w[:-3]
        if n > 6 and nynorsk and (w.endswith("heit") or w.endswith("semd")
                                  or w.endswith("leik")):
            return w[:-4]
        if n > 7 and (w.endswith("elser") or w.endswith("elsen")):
            return w[:-5]
        if n > 6 and ((bokmaal and w.endswith("ende"))
                      or (nynorsk and w.endswith("ande"))
                      or w.endswith("else")
                      or (bokmaal and w.endswith("este"))
                      or (nynorsk and w.endswith("aste"))
                      or (bokmaal and w.endswith("eren"))
                      or (nynorsk and w.endswith("aren"))):
            return w[:-4]
        if n > 5 and ((bokmaal and w.endswith("ere"))
                      or (nynorsk and w.endswith("are"))
                      or (bokmaal and w.endswith("est"))
                      or (nynorsk and w.endswith("ast"))
                      or w.endswith("ene")
                      or (nynorsk and w.endswith("ane"))):
            return w[:-3]
        if n > 4 and (w.endswith("er") or w.endswith("en")
                      or w.endswith("et")
                      or (nynorsk and w.endswith("ar"))
                      or (bokmaal and w.endswith("st"))
                      or w.endswith("te")):
            return w[:-2]
        if n > 3 and w[-1] in "aen":
            return w[:-1]
        return w
    return stem


norwegian_light_stem = _make_norwegian(True, False)     # BOKMAAL default
norwegian_light_stem_nn = _make_norwegian(False, True)  # NYNORSK


_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(w: str) -> str:
    if len(w) > 8:
        if w.endswith("kin"):
            return _fi_step1(w[:-3])
        if w.endswith("ko"):
            return _fi_step1(w[:-2])
    if len(w) > 11:
        if w.endswith("dellinen"):
            return w[:-8]
        if w.endswith("dellisuus"):
            return w[:-9]
    return w


def _fi_step2(w: str) -> str:
    if len(w) > 5:
        if w[-3:] in ("lla", "tse", "sti"):
            return w[:-3]
        if w.endswith("ni"):
            return w[:-2]
        if w.endswith("aa"):
            return w[:-1]
    return w


def _fi_step3(w: str) -> str:
    n = len(w)
    if n > 8:
        if w.endswith("nnen"):
            return w[:-4] + "s"
        if w.endswith("ntena"):
            return w[:-5] + "s"
        if w.endswith("tten"):
            return w[:-4]
        if w.endswith("eiden"):
            return w[:-5]
    if n > 6:
        if w[-4:] in ("neen", "niin", "seen", "teen", "inen"):
            return w[:-4]
        if w[-3] == "h" and w[-2] in _FI_VOWELS and w[-1] == "n":
            return w[:-3]
        if w.endswith("den"):
            return w[:-3] + "s"
        if w.endswith("ksen"):
            return w[:-4] + "s"
        if w[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
            return w[:-3]
    if n > 5:
        if w[-2:] in ("na", "ne"):
            return w[:-2]
        if w.endswith("nei"):
            return w[:-3]
    if n > 4:
        if w[-2:] in ("ja", "ta"):
            return w[:-2]
        if w[-1] == "a":
            return w[:-1]
        if w[-1] == "n" and w[-2] in _FI_VOWELS:
            return w[:-2]
        if w[-1] == "n":
            return w[:-1]
    return w


def _fi_norm1(w: str) -> str:
    if len(w) > 5 and w.endswith("hde"):
        w = w[:-3] + "ksi"
    if len(w) > 4 and (w.endswith("ei") or w.endswith("at")):
        return w[:-2]
    if len(w) > 3 and w[-1] in "tsjeai":
        return w[:-1]
    return w


def _fi_norm2(w: str) -> str:
    if len(w) > 8 and w[-1] in "eou":
        w = w[:-1]
    if len(w) > 4:
        if w[-1] == "i":
            w = w[:-1]
        if len(w) > 4:
            out = [w[0]]
            for c in w[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            w = "".join(out)
    return w


def finnish_light_stem(w: str) -> str:
    """fi/FinnishLightStemmer.java:40."""
    if len(w) < 4:
        return w
    w = w.translate(_FI_FOLD)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(w)))))


_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = _FI_VOWELS


def _hu_remove_case(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("kent"):
        return w[:-4]
    if n > 5:
        if w[-3:] in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                      "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
            return w[:-3]
        if (w.endswith("al") or w.endswith("el")) and \
                w[-3] not in _HU_VOWELS and w[-3] == w[-4]:
            return w[:-3]
    if n > 4:
        if w[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                      "be", "ul", "ig"):
            return w[:-2]
        if w[-2:] in ("on", "en") and w[-3] not in _HU_VOWELS:
            return w[:-2]
        if w[-1] in "tn":
            return w[:-1]
        if w[-1] in "ae" and w[-2] == w[-3] and w[-2] not in _HU_VOWELS:
            return w[:-2]
    return w


def _hu_remove_possessive(w: str) -> str:
    n = len(w)
    if n > 6:
        if w[-5] not in _HU_VOWELS and w[-4:] in ("atok", "otok", "etek"):
            return w[:-4]
        if w[-4:] in ("itek", "itok"):
            return w[:-4]
    if n > 5:
        if w[-4] not in _HU_VOWELS and w[-3:] in ("unk", "tok", "tek"):
            return w[:-3]
        if w[-4] in _HU_VOWELS and w.endswith("juk"):
            return w[:-3]
        if w.endswith("ink"):
            return w[:-3]
    if n > 4:
        if w[-3] not in _HU_VOWELS and w[-2:] in ("am", "em", "om", "ad",
                                                  "ed", "od", "uk"):
            return w[:-2]
        if w[-3] in _HU_VOWELS and w[-2:] in ("nk", "ja", "je"):
            return w[:-2]
        if w[-2:] in ("im", "id", "ik"):
            return w[:-2]
    if n > 3:
        if w[-1] in "ae" and w[-2] not in _HU_VOWELS:
            return w[:-1]
        if w[-1] in "md" and w[-2] in _HU_VOWELS:
            return w[:-1]
        if w[-1] == "i":
            return w[:-1]
    return w


def _hu_remove_plural(w: str) -> str:
    if len(w) > 3 and w[-1] == "k":
        if w[-2] in "aoe" and len(w) > 4:
            return w[:-2]
        return w[:-1]
    return w


def hungarian_light_stem(w: str) -> str:
    """hu/HungarianLightStemmer.java:40."""
    w = w.translate(_HU_FOLD)
    w = _hu_remove_plural(_hu_remove_possessive(_hu_remove_case(w)))
    if len(w) > 3 and w[-1] in "aeio":
        return w[:-1]
    return w


def _as_token_filter(stem_fn):
    def filt(tokens: "list[str]") -> "list[str | None]":
        return [stem_fn(t) if t else t for t in tokens]
    return filt


LIGHT_STEMMERS = {
    "german_light": german_light_stem,
    "spanish_light": spanish_light_stem,
    "italian_light": italian_light_stem,
    "swedish_light": swedish_light_stem,
    "russian_light": russian_light_stem,
    "french_light": french_light_stem,
    "portuguese_light": portuguese_light_stem,
    "norwegian_light": norwegian_light_stem,        # Bokmål (the
    "norwegian_light_nn": norwegian_light_stem_nn,  # filter default)
    "finnish_light": finnish_light_stem,
    "hungarian_light": hungarian_light_stem,
}
