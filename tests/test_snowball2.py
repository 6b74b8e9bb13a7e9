"""Snowball stemmers, second batch (lucene_ray.snowball2).

Gates:
- re-extraction equality: the generated among tables and stop lists
  are re-parsed from the reference programs/resources live;
- the per-language analyzer goldens (Test*Analyzer.java);
- hand-traced branch batteries exercising region gates and the
  find_among_b commit semantics.
"""

import pathlib
import re

import pytest

REF = pathlib.Path("/root/reference/lucene/analysis/common/src")
EXT = REF / "java/org/tartarus/snowball/ext"

_AMONG_RE = re.compile(
    r'new Among\("((?:[^"\\]|\\.)*)",\s*(-?\d+),\s*(-?\d+)'
    r'(?:,\s*"(r_\w+)",\s*methodObject)?\)')
_TABLE_RE = re.compile(
    r'private static final Among (a_\d+)\[\] = \{(.*?)\};', re.S)


def _decode(s: str) -> str:
    return re.sub(
        r'\\u([0-9a-fA-F]{4})|\\(.)',
        lambda m: chr(int(m.group(1), 16)) if m.group(1)
        else {"n": "\n", "t": "\t"}.get(m.group(2), m.group(2)), s)


def _parse_amongs(java: str):
    tables = {}
    for name, body in _TABLE_RE.findall(java):
        rows = []
        for s, _sub, res, cond in _AMONG_RE.findall(body):
            rows.append((_decode(s), int(res)) if not cond
                        else (_decode(s), int(res), cond))
        tables[name] = tuple(rows)
    return tables


LANGS = ["Romanian", "Catalan", "Basque", "Irish", "Hungarian",
         "Finnish", "Turkish", "Lithuanian", "Armenian", "Estonian",
         "Nepali", "Tamil", "Serbian"]


def test_among_tables_match_reference():
    import lucene_ray.snowball2_data as mod
    for lang in LANGS:
        want = _parse_amongs((EXT / f"{lang}Stemmer.java").read_text())
        assert getattr(mod, lang.upper()) == want, lang


_STOP_SOURCES = {
    "catalan": ("ca/stopwords.txt", "#"),
    "estonian": ("et/stopwords.txt", "#"),
    "basque": ("eu/stopwords.txt", "#"),
    "finnish": ("snowball/finnish_stop.txt", "|"),
    "irish": ("snowball/irish_stop.txt", "|"),
    "hungarian": ("snowball/hungarian_stop.txt", "|"),
    "armenian": ("hy/stopwords.txt", "#"),
    "lithuanian": ("lt/stopwords.txt", "#"),
    "nepali": ("ne/stopwords.txt", "#"),
    "romanian": ("ro/stopwords.txt", "#"),
    "serbian": ("sr/stopwords.txt", "#"),
    "tamil": ("ta/stopwords.txt", "#"),
    "turkish": ("tr/stopwords.txt", "#"),
}


def test_stop_lists_match_reference():
    import lucene_ray.snowball2_stop_data as mod
    base = REF / "resources/org/apache/lucene/analysis"
    for lang, (rel, style) in _STOP_SOURCES.items():
        words = []
        for line in (base / rel).read_text(encoding="utf-8").splitlines():
            if style == "|":
                words.extend(line.split("|", 1)[0].split())
            else:
                line = line.strip()
                if line and not line.startswith("#"):
                    words.append(line)
        assert getattr(mod, lang.upper() + "_STOP") == frozenset(words), lang


def _golden_pairs(lang_dir: str, test_file: str):
    src = (REF / f"test/org/apache/lucene/analysis/{lang_dir}/"
           f"{test_file}").read_text()
    return re.findall(r'checkOneTerm\(a, "([^"]*)", "([^"]*)"\)', src)


# --- Armenian (ArmenianStemmer.java:13) ---

def test_armenian_reference_goldens():
    from lucene_ray.snowball2 import armenian_stem
    pairs = _golden_pairs("hy", "TestArmenianAnalyzer.java")
    assert len(pairs) >= 4
    # the third golden asserts the stem-EXCLUSION path (the raw word
    # survives); the stemmer itself still stems it
    for word, want in pairs:
        if word == want:
            continue
        assert armenian_stem(word) == want, (word, want)


def test_armenian_branches():
    from lucene_ray.snowball2 import armenian_stem as st
    # ending (a_3) gated on R2: ության fits pV but starts before p2,
    # no fallback to a shorter entry — the verb ան still fires after
    assert st("տեսության") == "տեսությ"
    # ending + noun chain: ն in R2, then noun ուն
    assert st("ազատություն") == "ազատությ"
    # ending ին with R2 exactly at the boundary
    assert st("մարդկային") == "մարդկայ"
    # verb suffixes at pV: ալ / ում
    assert st("կարդալ") == "կարդ"
    assert st("կարդում") == "կարդ"
    # ending ան (R2 boundary) then verb աց
    assert st("մեծացան") == "մեծ"
    # R2 empty: ը / ի commit but do not delete
    assert st("գիրքը") == "գիրքը"
    assert st("տների") == "տների"
    # suffix would stick out of pV: untouched
    assert st("տներ") == "տներ"


def test_registered_chains():
    from lucene_ray.analysis_en import TOKEN_FILTERS
    from lucene_ray.snowball2 import SNOWBALL2_STEMMERS
    for name in SNOWBALL2_STEMMERS:
        assert name in TOKEN_FILTERS
        lang = name.removeprefix("snowball_")
        assert lang in TOKEN_FILTERS
    hy = TOKEN_FILTERS["armenian"]
    assert hy(["այդ", "արծիվներ"]) == [None, "արծ"]


def _check_goldens(stem, lang_dir: str, test_file: str, minimum: int):
    pairs = _golden_pairs(lang_dir, test_file)
    assert len(pairs) >= minimum
    for word, want in pairs:
        if word == want:        # stem-exclusion battery rows
            continue
        assert stem(word) == want, (word, want)


# --- Irish (IrishStemmer.java:13) ---

def test_irish_reference_goldens():
    from lucene_ray.snowball2 import irish_stem
    _check_goldens(irish_stem, "ga", "TestIrishAnalyzer.java", 4)


def test_irish_branches():
    from lucene_ray.snowball2 import irish_stem as st
    # initial mutations / eclipsis rewrites (find_among forward)
    assert st("n-athair") == "athair"
    assert st("fhearr") == "fearr"
    assert st("bhfuil") == "fuil"
    assert st("gcarr") == "carr"
    assert st("tsagart") == "sagart"
    # deriv substitutions fire without a region gate
    assert st("síceapatacha") == "síceapaite"
    # noun act 1 needs R1, act 2 needs R2
    assert st("siopadóireacht") == "siopadóir"


# --- Basque (BasqueStemmer.java:13) ---

def test_basque_reference_goldens():
    from lucene_ray.snowball2 import basque_stem
    _check_goldens(basque_stem, "eu", "TestBasqueAnalyzer.java", 4)


def test_basque_branches():
    from lucene_ray.snowball2 import basque_stem as st
    assert st("zaldiak") == "zaldi"
    assert st("mendiari") == "mendi"
    # izenak repeats: two case endings come off one after the other
    assert st("etxekoa") == "etxe"      # -ko then -a (genitive chain)
    # substitutions move the cursor PAST the replacement — the repeat
    # loop never rescans it (stem():587 restores only on failure), so
    # minutuko -> minutu stops instead of stripping a fresh -tu
    assert st("minutuko") == "minutu"
    assert st("trako") == "tra"


# --- Nepali (NepaliStemmer.java:13) ---

def test_nepali_reference_goldens():
    from lucene_ray.snowball2 import nepali_stem
    pairs = [(w, want)
             for w, want in _golden_pairs("ne", "TestNepaliAnalyzer.java")
             if any("ऀ" <= ch <= "ॿ" for ch in w)
             and any("ऀ" <= ch <= "ॿ" for ch in want)]
    assert len(pairs) >= 2     # the rest exercise lowercase/digit folds
    for word, want in pairs:
        if word == want:
            continue
        assert nepali_stem(word) == want, (word, want)


def test_nepali_branches():
    from lucene_ray.snowball2 import nepali_stem as st
    assert st("मित्रहरु") == "मित्र"
    # category-1 को survives after े (the ए/े guard)
    assert st("गरेको") == "गर"          # cat1 guarded, cat3 एको fires
    # the loop strips category-3 suffixes repeatedly
    assert st("गरेका") == "गर"


# --- Romanian (RomanianStemmer.java:13) ---

def test_romanian_reference_goldens():
    from lucene_ray.snowball2 import romanian_stem
    _check_goldens(romanian_stem, "ro", "TestRomanianAnalyzer.java", 4)


def test_romanian_branches():
    from lucene_ray.snowball2 import romanian_stem as st
    # r_norm folds cedilla forms before anything else
    assert st("absenţa") == st("absența") == "absenț"
    # u/i between vowels are protected, then unprotected by postlude
    # (the protected I blocks the a_6 'ie' vowel-suffix match; only the
    # final 'e' comes off)
    assert st("groaie") == "groai"
    # verb suffix 'ut' needs a non-vowel (or u) before it, inside RV
    assert st("absolut") == "absol"


# --- Lithuanian (LithuanianStemmer.java:13) ---

def test_lithuanian_reference_battery():
    """The full 372-pair wikipedia/corpus battery
    (TestLithuanianStemming.java:56-...)."""
    from lucene_ray.snowball2 import lithuanian_stem as st
    src = (REF / "test/org/apache/lucene/analysis/lt/"
           "TestLithuanianStemming.java").read_text()
    pairs = re.findall(r'checkOneTerm\(a, "([^"]*)", "([^"]*)"\)', src)
    assert len(pairs) == 372
    for word, want in pairs:
        assert st(word) == want, (word, want)


def test_lithuanian_branches():
    from lucene_ray.snowball2 import lithuanian_stem as st
    # fix_chdz after the steps: trailing č -> t
    assert st("vaikščioti") == "vaikšt"
    # a word > 6 chars starting with 'a' marks R1 from index 1: arkliai
    # has no non-vowel after the post-shift vowel run, so R1 is empty
    # and the ending survives (without the shift 'iai' would come off)
    assert st("arkliai") == "arkliai"
    assert st("akmenys") == "akmen"


# --- Hungarian (HungarianStemmer.java:13) ---

def test_hungarian_reference_goldens():
    from lucene_ray.snowball2 import hungarian_stem
    _check_goldens(hungarian_stem, "hu", "TestHungarianAnalyzer.java", 3)


def test_hungarian_branches():
    from lucene_ray.snowball2 import hungarian_stem as st
    # instrum: -val/-vel assimilated to a double consonant, undoubled
    assert st("házakkal") == "ház"
    assert st("házzal") == "ház"
    assert st("fákkal") == "fák"
    # case endings (with the v_ending á->a normalization inside)
    assert st("házát") == "ház"
    assert st("házával") == "ház"
    # R1 for a vowel-initial word swallows a whole digraph
    assert st("asszonnyal") == "asszony"


# --- Estonian (EstonianStemmer.java:13) ---

def test_estonian_reference_goldens():
    from lucene_ray.snowball2 import estonian_stem
    _check_goldens(estonian_stem, "et", "TestEstonianAnalyzer.java", 19)


def test_estonian_branches():
    from lucene_ray.snowball2 import estonian_stem as st
    # full-word verb exceptions replace and stop
    assert st("joob") == "joo"
    assert st("tegime") == "tegi"
    assert st("nägid") == "nägi"
    # emphasis -gi after a GI letter (vowels qualify); -ki needs a KI
    # consonant, so autoki survives
    assert st("autogi") == "auto"
    assert st("autoki") == "autoki"
    # emphasis then the nu-rule (-tu) on the remainder
    assert st("raamatugi") == "raama"
    # undouble kk/pp/tt before a final vowel
    assert st("pakkuda") == "paku"


# --- Tamil (TamilStemmer.java:13) ---

def test_tamil_reference_goldens():
    from lucene_ray.snowball2 import tamil_stem
    pairs = [(w, want)
             for w, want in _golden_pairs("ta", "TestTamilAnalyzer.java")
             if any("஀" <= ch <= "௿" for ch in want)]
    assert len(pairs) >= 2     # digit/lowercase rows are analyzer-level
    for word, want in pairs:
        if word == want:
            continue
        assert tamil_stem(word) == want, (word, want)


def test_tamil_branches():
    from lucene_ray.snowball2 import tamil_stem as st
    # plural -கள் comes off, then fix_endings resolves the stem
    assert st("நண்பர்கள்") == "நண்"
    assert st("கோவில்கள்") == "கோவில்"
    # min-length floor: short words pass through
    assert st("கோ") == "கோ"


# --- Serbian (SerbianStemmer.java:13) ---

def test_serbian_sub_tables_match_reference():
    """snowball2_sub_data is GENERATED from the r_Step_1/r_Step_2
    switch bodies; re-parse and compare."""
    import lucene_ray.snowball2_sub_data as mod
    src = (EXT / "SerbianStemmer.java").read_text()

    def parse(name):
        body = src.split(f"private boolean {name}()")[1]
        body = body.split("private boolean")[0]
        cases = {}
        parts = re.split(r"case (\d+):", body)
        for i in range(1, len(parts), 2):
            blk = parts[i + 1]
            m = re.search(r'slice_from\("((?:[^"\\]|\\.)*)"\)', blk)
            cases[int(parts[i])] = (_decode(m.group(1)),
                                    "B_no_diacritics" in blk)
        return cases

    assert mod.SERBIAN_STEP1 == parse("r_Step_1")
    assert mod.SERBIAN_STEP2 == parse("r_Step_2")


def test_serbian_reference_goldens():
    """TestSerbianAnalyzer goldens go through the full chain order
    (sr/SerbianAnalyzer.java:133: stem THEN normalize)."""
    from lucene_ray.snowball2 import serbian_stem
    from lucene_ray.langnorm import serbian_normalize
    pairs = _golden_pairs("sr", "TestSerbianAnalyzer.java")
    assert len(pairs) >= 3
    for word, want in pairs:
        if word == want:
            continue
        assert serbian_normalize(serbian_stem(word)) == want, (word, want)


def test_serbian_branches():
    from lucene_ray.snowball2 import serbian_stem as st
    # Cyrillic transliterates (including the lj/nj/dž digraph targets)
    assert st("студенти") == "student"
    # prelude: consonant+ije+consonant and consonant+je+consonant -> e
    assert st("дјеца") == st("djeca")
    # syllabic-r region adjustment: the vowel-based R1 of prvi would
    # start after 'i' (empty region); the r at index 1 re-marks it so
    # the ending still comes off
    assert st("prvi") == "prv"
    assert st("prva") == "prv"
    # Step_2 needs R1; Step_3 deletes a plain ending in R1
    assert st("decimalnim") == "decimaln"


def test_registered_serbian_chain_normalizes():
    from lucene_ray.analysis_en import TOKEN_FILTERS
    sr = TOKEN_FILTERS["serbian"]
    assert sr(["đubrište"]) == ["djubrist"]


# --- Finnish (FinnishStemmer.java:13) ---

def test_finnish_reference_goldens():
    from lucene_ray.snowball2 import finnish_stem
    _check_goldens(finnish_stem, "fi", "TestFinnishAnalyzer.java", 2)


def test_finnish_branches():
    from lucene_ray.snowball2 import finnish_stem as st
    # a_6 conditional among: 'seen' fires only after a long vowel
    # (r_LONG), then tidy shortens the long vowel
    assert st("huoneeseen") == "huone"
    # r_VI: 'hin'/'siin' after vowel+i
    assert st("taloihin") == "talo"
    # a failed among condition falls back to the parent "n" entry
    assert st("edeltäjistään") == "edeltäj"
    assert st("edeltäjiinsä") == "edeltäj"
    # t_plural runs only when no case ending came off
    assert st("miehet") == "miehe"
    # tidy: AEI after consonant, then the final undouble
    assert st("tyttöjen") == "tyttöj"


# --- Turkish (TurkishStemmer.java:13) ---

def test_turkish_reference_goldens():
    from lucene_ray.snowball2 import turkish_stem
    pairs = [(w, want)
             for w, want in _golden_pairs("tr", "TestTurkishAnalyzer.java")
             if "'" not in w and w == w.lower()]
    assert len(pairs) >= 2     # apostrophe/case rows are analyzer-level
    for word, want in pairs:
        if word == want:
            continue
        assert turkish_stem(word) == want, (word, want)


def test_turkish_branches():
    from lucene_ray.snowball2 import turkish_stem as st
    # possessive then postlude devoicing c->ç, b->p, ğ->k
    assert st("ağacı") == "ağaç"
    assert st("kitabı") == "kitap"
    assert st("geleceğim") == "gelecek"
    # noun chains: plural, locative+possessive, instrumental with the
    # optional buffer y (vowel harmony checked per suffix)
    assert st("kitaplar") == "kitap"
    assert st("evlerinde") == "ev"
    assert st("arabalarla") == "araba"
    assert st("arkadaşımla") == "arkadaş"
    # nominal verb suffixes: yDU / ymUs_ / yUm / sUnUz
    assert st("güzeldi") == "güzel"
    assert st("güzelmiş") == "güzel"
    assert st("öğrenciyim") == "öğrenci"
    assert st("öğrencisiniz") == "öğrenci"
    # the lAr nominal-verb alternative stops noun stemming AND skips
    # the postlude (stem():2078 returns before r_postlude)
    assert st("evler") == "ev"
    # reserved words are never U-appended
    assert st("soyadı") == "soyad"
    assert st("soyad") == "soyad"
    # one-syllable words pass through untouched
    assert st("ev") == "ev"
    # vowel harmony gate: the suffix vowel must harmonize with the
    # previous vowel, else the mark fails
    assert st("gözlükçülükten") == "gözlükçülük"


# --- Catalan (CatalanStemmer.java:13) ---

def test_catalan_reference_goldens():
    from lucene_ray.snowball2 import catalan_stem
    _check_goldens(catalan_stem, "ca", "TestCatalanAnalyzer.java", 3)


def test_catalan_branches():
    from lucene_ray.snowball2 import catalan_stem as st
    assert st("llengües") == "llengu"
    assert st("llengua") == "llengu"
    # cleaning deaccents at the very end
    assert st("perquè") == "perque"
    # verb pass is tried only when the standard pass failed
    assert st("cantaria") == "cant"
