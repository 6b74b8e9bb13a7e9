"""WordDelimiterGraphFilter goldens — term sequences (and position
increments where the reference test asserts them) pinned to
TestWordDelimiterGraphFilter.java cases (doSplit/doSplitPossessive,
testLotsOfConcatenating/2, testOriginalTokenEmittedFirst,
testCatenateAllEmittedBeforeParts, testBasicGraphSplits)."""

import pytest

from lucene_ray.wordgraph import (CATENATE_ALL, CATENATE_NUMBERS,
                                  CATENATE_WORDS, GENERATE_NUMBER_PARTS,
                                  GENERATE_WORD_PARTS, PRESERVE_ORIGINAL,
                                  SPLIT_ON_CASE_CHANGE, SPLIT_ON_NUMERICS,
                                  STEM_ENGLISH_POSSESSIVE, WDGF_ALL,
                                  wdgf_stream, word_delimiter_graph)

SPLIT = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE
         | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)
CONCATS = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_WORDS
           | CATENATE_NUMBERS | CATENATE_ALL | SPLIT_ON_CASE_CHANGE
           | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)


def terms(tok, flags):
    return [t for t, _, _ in word_delimiter_graph(tok, flags)]


@pytest.mark.parametrize("tok,want", [
    # testSplits (TestWordDelimiterGraphFilter.java:188)
    ("basic-split", ["basic", "split"]),
    ("camelCase", ["camel", "Case"]),
    ("บ้าน", ["บ้าน"]),  # Thai NSM
    ("test's'", ["test"]),          # possessive followed by delimiter
    ("Роберт", ["Роберт"]),
    ("РобЕрт", ["Роб", "Ерт"]),     # russian camelCase
    ("aǅungla", ["aǅungla"]),       # composed titlecase: no split
    ("ســـــــــــــــــلام", ["ســـــــــــــــــلام"]),  # modifier letter
    ("test⃝", ["test⃝"]),            # enclosing mark
    ("हिन्दी", ["हिन्दी"]),             # combining spacing mark (virama)
    ("١٢٣٤", ["١٢٣٤"]),             # non-ascii digits: no split
    ("𠀀𠀀", ["𠀀𠀀"]),              # supplementary plane
    ("O'Neil's", ["O", "Neil"]),
    ("//hello---there", ["hello", "there"]),
])
def test_splits_golden(tok, want):
    assert terms(tok, SPLIT) == want


def test_possessive_toggle():
    # testPossessives (java:236)
    assert terms("ra's", SPLIT) == ["ra"]
    assert terms("ra's", SPLIT & ~STEM_ENGLISH_POSSESSIVE) == ["ra", "s"]


def test_lots_of_concatenating():
    # testLotsOfConcatenating (java:626): terms AND posIncs
    out = word_delimiter_graph("abc-def-123-456", CONCATS)
    assert [t for t, _, _ in out] == [
        "abcdef123456", "abcdef", "abc", "def", "123456", "123", "456"]
    wp, incs = 0, []
    for _, sp, _ in out:
        incs.append(sp - wp + (1 if not incs else 0))
        wp = sp
    assert incs == [1, 0, 0, 1, 1, 0, 1]


def test_lots_of_concatenating2_preserve():
    # testLotsOfConcatenating2 (java:664): original first
    assert terms("abc-def-123-456", CONCATS | PRESERVE_ORIGINAL) == [
        "abc-def-123-456", "abcdef123456", "abcdef", "abc", "def",
        "123456", "123", "456"]


def test_original_token_emitted_first():
    # testOriginalTokenEmittedFirst (java:504)
    assert terms("abc-def", WDGF_ALL) == ["abc-def", "abcdef", "abc", "def"]
    assert terms("abcDEF", WDGF_ALL) == ["abcDEF", "abcDEF", "abc", "DEF"]
    assert terms("abc123", WDGF_ALL) == ["abc123", "abc123", "abc", "123"]


def test_catenate_all_emitted_before_parts():
    # testCatenateAllEmittedBeforeParts (java:540): number parts NOT
    # generated, yet preserve-original and concatenate-all show first
    fl = PRESERVE_ORIGINAL | GENERATE_WORD_PARTS | CATENATE_ALL
    assert terms("8-other", fl) == ["8-other", "8other", "other"]
    assert terms("other-9", fl) == ["other-9", "other9", "other"]


def test_basic_graph_splits():
    # testBasicGraphSplits (java:1015)
    assert terms("PowerShotPlus", 0) == ["PowerShotPlus"]
    assert terms("PowerShotPlus", GENERATE_WORD_PARTS) == ["PowerShotPlus"]
    assert terms("PowerShotPlus",
                 GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE) == [
        "Power", "Shot", "Plus"]
    assert terms("Power-Shot-Plus", GENERATE_WORD_PARTS) == [
        "Power", "Shot", "Plus"]
    assert terms("PowerShot1000Plus",
                 GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE) == [
        "Power", "Shot1000Plus"]
    # catenation sorts before its first part (same startPart, longer
    # endPart — PositionSorter, java:444)
    assert terms("PowerShotPlus",
                 GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE
                 | CATENATE_WORDS) == [
        "PowerShotPlus", "Power", "Shot", "Plus"]


def test_catenate_words_simple():
    assert terms("wi-fi", CATENATE_WORDS) == ["wifi"]
    assert terms("500-42", GENERATE_NUMBER_PARTS) == ["500", "42"]
    assert terms("wi-fi-4000", CATENATE_ALL) == ["wifi4000"]


def test_all_delimiter_token_swallowed():
    assert terms("----", SPLIT) == []
    assert terms("----", SPLIT | PRESERVE_ORIGINAL) == ["----"]


def test_protected_words_pass_through():
    assert word_delimiter_graph("wi-fi", WDGF_ALL,
                                prot_words={"wi-fi"}) == [("wi-fi", 0, 1)]


def test_stream_shape():
    assert wdgf_stream(["camelCase", "x"], SPLIT) == ["camel", "Case", "x"]


@pytest.mark.parametrize("inp,want", [
    # TestICUFoldingFilter.java vectors
    ("This", "this"),
    ("Ruß", "russ"),                      # full case folding
    ("ΜΆΪΟΣ", "μαιοσ"),                   # case fold + accent removal
    ("Μάϊος", "μαιοσ"),
    ("𐐖", "𐐾"),                           # supplementary case folding
    ("ﴳﴺﰧ", "طمطمطم"),                    # compatibility normalization
    ("क्‍ष", "कष"),                  # default-ignorable removal
    ("résumé", "resume"),                 # composed accents
    ("résumé", "resume"),     # decomposed accents
    ("৭০৬", "706"),                       # native digit folding
    ("đis", "dis"),                       # stroke diacritic
    ("cræzy", "craezy"),                  # multigraph expansion
    ("ﬁsh１", "fish1"),                   # ligature + width folding
])
def test_icu_fold_golden(inp, want):
    from lucene_ray.icufold import icu_fold
    assert icu_fold(inp) == want
