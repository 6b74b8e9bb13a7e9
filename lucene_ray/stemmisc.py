"""Minimal and language-specific stemmers (the analysis/common long
tail), each a faithful port of the published algorithm the reference
ships:

- ``en/EnglishMinimalStemmer.java:27`` — S-stemmer (Donna Harman's
  "How effective is suffixing?").
- ``de/GermanMinimalStemmer.java:40`` — minimal German plural stemmer.
- ``fr/FrenchMinimalStemmer.java:40`` — Savoy's minimal French.
- ``no/NorwegianMinimalStemmer.java:45`` — Bokmål/Nynorsk minimal.
- ``pt/PortugueseMinimalStemmer.java:31`` / ``gl/
  GalicianMinimalStemmer.java:28`` — the RSLP "Plural" step (Orengo &
  Huyck's RSLP algorithm; rule data from the reference resources
  ``pt/portuguese.rslp`` and ``gl/galician.rslp``, whole-word
  exception sets per the type-1 step header).
- ``cz/CzechStemmer.java:32`` — Dolamic & Savoy's light Czech
  (case + possessive removal + palatalization normalize).
- ``bg/BulgarianStemmer.java:30`` — Nakov's light Bulgarian.
- ``hi/HindiStemmer.java:25`` — Ramanathan & Rao's lightweight Hindi.
- ``ckb/SoraniStemmer.java:25`` — Sorani Kurdish affix stripping.
"""

from __future__ import annotations


def english_minimal_stem(w: str) -> str:
    if len(w) < 3 or w[-1] != "s":
        return w
    p = w[-2]
    if p in "us":
        return w
    if p == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"
        if w[-3] in "iaoe":
            return w
    return w[:-1]


_DE_MIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(w: str) -> str:
    if len(w) < 5:
        return w
    w = w.translate(_DE_MIN_FOLD)
    n = len(w)
    if n > 6 and w.endswith("nen"):
        return w[:-3]
    if n > 5 and w[-2:] in ("en", "se", "es", "er"):
        return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


def french_minimal_stem(w: str) -> str:
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3:-1] == "au":        # aux -> al (u rewritten, x dropped)
            return w[:-2] + "l"
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2] and w[-1].isalpha():
        w = w[:-1]
    return w


def _make_norwegian_minimal(nynorsk: bool):
    def stem(w: str) -> str:
        if len(w) > 4 and w.endswith("s"):
            w = w[:-1]
        n = len(w)
        if n > 5 and (w.endswith("ene")
                      or (nynorsk and w.endswith("ane"))):
            return w[:-3]
        if n > 4 and (w[-2:] in ("er", "en", "et")
                      or (nynorsk and w.endswith("ar"))):
            return w[:-2]
        if n > 3 and w[-1] in "ae":
            return w[:-1]
        return w
    return stem


norwegian_minimal_stem = _make_norwegian_minimal(False)
norwegian_minimal_stem_nn = _make_norwegian_minimal(True)


# RSLP "Plural" step (type-1: whole-word exception sets); step header
# { "Plural", 3, 1, {"s"} } in both resources.
_PT_PLURAL = [
    ("ns", 1, "m", ()),
    ("ões", 3, "ão", ()),
    ("ães", 1, "ão", ("mães",)),
    ("ais", 1, "al", ("cais", "mais")),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", ()),
    ("is", 2, "il", ("lápis", "cais", "mais", "crúcis", "biquínis",
                     "pois", "depois", "dois", "leis")),
    ("les", 3, "l", ()),
    ("res", 3, "r", ("árvores",)),
    ("s", 2, "", ("aliás", "pires", "lápis", "cais", "mais", "mas",
                  "menos", "férias", "fezes", "pêsames", "crúcis",
                  "gás", "atrás", "moisés", "através", "convés", "ês",
                  "país", "após", "ambas", "ambos", "messias",
                  "depois")),
]

_GL_PLURAL = [
    ("ns", 1, "n", ("luns", "furatapóns", "furatapons")),
    ("ós", 3, "ón", ()),
    ("ões", 3, "ón", ()),
    ("ães", 1, "ão", ("mães", "magalhães")),
    ("ais", 2, "al", ("cais", "tais", "mais", "pais", "ademais")),
    ("áis", 2, "al", ("cáis", "táis", "máis", "páis", "ademáis")),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", ("escornabóis",)),
    ("ois", 2, "ol", ("escornabois",)),
    ("ís", 2, "il", ("país",)),
    ("is", 2, "il", ("menfis", "pais", "kinguis")),
    ("les", 2, "l", ("ingles", "marselles", "montreales", "senegales",
                     "manizales", "móstoles", "nápoles")),
    ("res", 3, "r", ("petres", "henares", "cáceres", "baleares",
                     "linares", "londres", "mieres", "miraflores",
                     "mércores", "venres", "pires")),
    ("ces", 2, "z", ()),
    ("zes", 2, "z", ()),
    ("ises", 3, "z", ()),
    ("ás", 1, "al", ("más",)),
    ("ses", 2, "s", ()),
    ("s", 2, "", ("barbadés", "barcelonés", "cantonés", "gabonés",
                  "llanés", "medinés", "escocés", "escocês",
                  "francês", "barcelonês", "cantonês", "macramés",
                  "reves", "barcelones", "cantones", "gabones",
                  "llanes", "magallanes", "medines", "escoces",
                  "frances", "xoves", "martes", "aliás", "pires",
                  "lápis", "cais", "mais", "mas", "menos", "férias",
                  "pêsames", "crúcis", "país", "cangas", "atenas",
                  "asturias", "canarias", "filipinas", "honduras",
                  "molucas", "caldas", "mascareñas", "micenas",
                  "covarrubias", "psoas", "óculos", "nupcias",
                  "xoves", "martes", "llanes")),
]


def _rslp_plural(rules):
    sets = [(suf, mn, rep, frozenset(exc)) for suf, mn, rep, exc in rules]

    def step(w: str) -> str:
        if len(w) < 3 or not w.endswith("s"):
            return w
        for suf, mn, rep, exc in sets:
            if len(w) - len(suf) >= mn and w.endswith(suf) \
                    and w not in exc:
                return w[:-len(suf)] + rep
        return w
    return step


portuguese_minimal_stem = _rslp_plural(_PT_PLURAL)
galician_minimal_stem = _rslp_plural(_GL_PLURAL)


_CZ_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")


def czech_stem(w: str) -> str:
    n = len(w)
    # removeCase
    if n > 7 and w.endswith("atech"):
        w = w[:-5]
    elif n > 6 and w[-4:] in ("ětem", "etem", "atům"):
        w = w[:-4]
    elif n > 5 and w[-3:] in _CZ_3:
        w = w[:-3]
    elif n > 4 and w[-2:] in _CZ_2:
        w = w[:-2]
    elif n > 3 and w[-1] in "aeiouůyáéíýě":
        w = w[:-1]
    # removePossessives
    if len(w) > 5 and w[-2:] in ("ov", "in", "ův"):
        w = w[:-2]
    # normalize (palatalization)
    if not w:
        return w
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


def bulgarian_stem(w: str) -> str:
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    # article removal
    n = len(w)
    if n > 6 and w.endswith("ият"):
        w = w[:-3]
    elif n > 5 and w[-2:] in ("ът", "то", "те", "та", "ия"):
        w = w[:-2]
    elif n > 4 and w.endswith("ят"):
        w = w[:-2]
    # plural removal
    n = len(w)
    if n > 6 and w.endswith("овци"):
        w = w[:-3]
    elif n > 6 and w.endswith("ове"):
        w = w[:-3]
    elif n > 6 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif n > 5 and w.endswith("ища"):
        w = w[:-3]
    elif n > 5 and w.endswith("та"):
        w = w[:-2]
    elif n > 5 and w.endswith("ци"):
        w = w[:-2] + "к"
    elif n > 5 and w.endswith("зи"):
        w = w[:-2] + "г"
    elif n > 5 and w[-3] == "е" and w[-1] == "и":
        w = w[:-3] + "я" + w[-2]
    elif n > 4 and w.endswith("си"):
        w = w[:-2] + "х"
    elif n > 4 and w.endswith("и"):
        w = w[:-1]
    if len(w) > 3:          # guard checked ONCE pre-strip, as in the
        if w.endswith("я"):  # reference (both strips may fire)
            w = w[:-1]
        if w and w[-1] in "аое":
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


_HI_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे",
         "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं",
         "ताएं", "ियाँ", "ियों", "ियां")
_HI_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे",
         "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं",
         "ुओं", "ुएं", "ुआं")
_HI_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
         "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(w: str) -> str:
    n = len(w)
    if n > 6 and w[-5:] in _HI_5:
        return w[:-5]
    if n > 5 and w[-4:] in _HI_4:
        return w[:-4]
    if n > 4 and w[-3:] in _HI_3:
        return w[:-3]
    if n > 3 and w[-2:] in _HI_2:
        return w[:-2]
    if n > 2 and w[-1:] in _HI_1:
        return w[:-1]
    return w


def sorani_stem(w: str) -> str:
    n = len(w)
    # postposition
    if n > 5 and w.endswith("دا"):
        w = w[:-2]
    elif n > 4 and w.endswith("نا"):
        w = w[:-1]
    elif n > 6 and w.endswith("ەوە"):
        w = w[:-3]
    # possessive pronoun
    if len(w) > 6 and w[-3:] in ("مان", "یان", "تان"):
        w = w[:-3]
    n = len(w)
    if n > 6 and w.endswith("ێکی"):
        return w[:-3]
    if n > 7 and w.endswith("یەکی"):
        return w[:-4]
    if n > 5 and w.endswith("ێک"):
        return w[:-2]
    if n > 6 and w.endswith("یەک"):
        return w[:-3]
    if n > 6 and w.endswith("ەکە"):
        return w[:-3]
    if n > 5 and w.endswith("کە"):
        return w[:-2]
    if n > 7 and w.endswith("ەکان"):
        return w[:-4]
    if n > 6 and w.endswith("کان"):
        return w[:-3]
    if n > 7 and w.endswith("یانی"):
        return w[:-4]
    if n > 6 and w.endswith("انی"):
        return w[:-3]
    if n > 6 and w.endswith("یان"):
        return w[:-3]
    if n > 5 and w.endswith("ان"):
        return w[:-2]
    if n > 7 and w.endswith("یانە"):
        return w[:-4]
    if n > 6 and w.endswith("انە"):
        return w[:-3]
    if n > 5 and (w.endswith("ایە") or w.endswith("ەیە")):
        return w[:-2]
    if n > 4 and w.endswith("ە"):
        return w[:-1]
    if n > 4 and w.endswith("ی"):
        return w[:-1]
    return w



def swedish_minimal_stem(w: str) -> str:
    """sv/SwedishMinimalStemmer.java:65 — only the most common noun
    plural suffixes (adapted from the light stemmer)."""
    if len(w) > 4 and w.endswith("s"):
        w = w[:-1]
    n = len(w)
    if n > 6 and w[-4:] in ("arne", "erna", "arna", "orna", "aren"):
        return w[:-4]
    if n > 5 and w.endswith("are"):
        return w[:-3]
    if n > 4 and w[-2:] in ("ar", "at", "er", "et", "or", "en"):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


MISC_STEMMERS = {
    "english_minimal": english_minimal_stem,
    "german_minimal": german_minimal_stem,
    "french_minimal": french_minimal_stem,
    "norwegian_minimal": norwegian_minimal_stem,
    "norwegian_minimal_nn": norwegian_minimal_stem_nn,
    "portuguese_minimal": portuguese_minimal_stem,
    "galician_minimal": galician_minimal_stem,
    "czech_stem": czech_stem,
    "bulgarian_stem": bulgarian_stem,
    "hindi_stem": hindi_stem,
    "sorani_stem": sorani_stem,
    "swedish_minimal": swedish_minimal_stem,
}
