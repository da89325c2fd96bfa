"""UAX#29 word-break conformance — golden cases transcribed from the
reference's ``TestStandardAnalyzer``
(core/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java)
against the r5 full-grammar tokenizer (WB4 absorption, Hebrew quote rules,
ExtendNumLet joins, Extended_Pictographic emoji, ENL-run skip rule).

``tokenize`` is the raw no-case-fold tokenizer — the reference tests run a
bare ``StandardTokenizer`` the same way (capitalization is preserved in
their expected arrays).
"""

import time

import pytest

from lucene_spark.analysis.analyzer import (
    _ASCII_RE,
    _TOKEN_RE,
    StandardAnalyzer,
    tokenize,
)

A = StandardAnalyzer()


# ---------------------------------------------------------------------------
# WB4 absorption: combining marks / format chars stay inside the token
# ---------------------------------------------------------------------------


def test_lucene1545_combining_mark_kept():
    # TestStandardAnalyzer.testLUCENE1545: U+0364 COMBINING LATIN SMALL
    # LETTER E must not split the word
    assert tokenize("moͤchte") == ["moͤchte"]


def test_combining_marks_cjk():
    # TestStandardAnalyzer.testCombiningMarks (U+3099 = combining voiced
    # sound mark, WB:Extend, Script=Inherited)
    assert tokenize("ざ") == ["ざ"]  # hiragana
    assert tokenize("ザ") == ["ザ"]  # katakana
    assert tokenize("壹゙") == ["壹゙"]  # ideographic
    assert tokenize("아゙") == ["아゙"]  # hangul


@pytest.mark.parametrize(
    "text,expected",
    [
        # testArabic (harakat = WB:Extend; Latin embedded mid-sentence)
        (
            "الفيلم الوثائقي الأول عن ويكيبيديا يسمى \"الحقيقة بالأرقام: "
            "قصة ويكيبيديا\" (بالإنجليزية: Truth in Numbers: The Wikipedia "
            "Story)، سيتم إطلاقه في 2008.",
            [
                "الفيلم", "الوثائقي", "الأول", "عن", "ويكيبيديا", "يسمى",
                "الحقيقة", "بالأرقام", "قصة", "ويكيبيديا", "بالإنجليزية",
                "Truth", "in", "Numbers", "The", "Wikipedia", "Story",
                "سيتم", "إطلاقه", "في", "2008",
            ],
        ),
        # testAramaic (Syriac combining marks ride their base runs)
        (
            "ܘܝܩܝܦܕܝܐ (ܐܢܓܠܝܐ: Wikipedia) ܗܘ ܐܝܢܣܩܠܘܦܕܝܐ ܚܐܪܬܐ ܕܐܢܛܪܢܛ "
            "ܒܠܫܢ̈ܐ ܣܓܝܐ̈ܐ܂ ܫܡܗ ܐܬܐ ܡܢ ܡ̈ܠܬܐ ܕ\"ܘܝܩܝ\" ܘ\"ܐܝܢܣܩܠܘܦܕܝܐ\"܀",
            [
                "ܘܝܩܝܦܕܝܐ", "ܐܢܓܠܝܐ", "Wikipedia", "ܗܘ", "ܐܝܢܣܩܠܘܦܕܝܐ",
                "ܚܐܪܬܐ", "ܕܐܢܛܪܢܛ", "ܒܠܫܢ̈ܐ", "ܣܓܝܐ̈ܐ", "ܫܡܗ", "ܐܬܐ",
                "ܡܢ", "ܡ̈ܠܬܐ", "ܕ", "ܘܝܩܝ", "ܘ", "ܐܝܢܣܩܠܘܦܕܝܐ",
            ],
        ),
        # testAmharic (Ethiopic syllabary = ALetter)
        (
            "ዊኪፔድያ የባለ ብዙ ቋንቋ የተሟላ ትክክለኛና ነጻ መዝገበ ዕውቀት (ኢንሳይክሎፒዲያ) ነው። ማንኛውም",
            [
                "ዊኪፔድያ", "የባለ", "ብዙ", "ቋንቋ", "የተሟላ", "ትክክለኛና", "ነጻ",
                "መዝገበ", "ዕውቀት", "ኢንሳይክሎፒዲያ", "ነው", "ማንኛውም",
            ],
        ),
        # testArmenian (with the 4,600` numeric + MidNum case)
        (
            "Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն "
            "վիքիպեդիայում) գրվել",
            [
                "Վիքիպեդիայի", "13", "միլիոն", "հոդվածները", "4,600",
                "հայերեն", "վիքիպեդիայում", "գրվել",
            ],
        ),
    ],
)
def test_multilingual_absorption(text, expected):
    assert tokenize(text) == expected


# ---------------------------------------------------------------------------
# testMid — the full consecutive-Mid split matrix
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,expected",
    [
        ("A:B", ["A:B"]),
        ("A::B", ["A", "B"]),
        ("1.2", ["1.2"]),
        ("A.B", ["A.B"]),
        ("1..2", ["1", "2"]),
        ("A..B", ["A", "B"]),
        ("1,2", ["1,2"]),
        ("1,,2", ["1", "2"]),
        ("A.:B", ["A", "B"]),
        ("A:.B", ["A", "B"]),
        ("1,.2", ["1", "2"]),
        ("1.,2", ["1", "2"]),
        ("A:B_A:B", ["A:B_A:B"]),
        ("A:B_A::B", ["A:B_A", "B"]),
        ("1.2_1.2", ["1.2_1.2"]),
        ("A.B_A.B", ["A.B_A.B"]),
        ("1.2_1..2", ["1.2_1", "2"]),
        ("A.B_A..B", ["A.B_A", "B"]),
        ("1,2_1,2", ["1,2_1,2"]),
        ("1,2_1,,2", ["1,2_1", "2"]),
        ("C_A.:B", ["C_A", "B"]),
        ("C_A:.B", ["C_A", "B"]),
        ("3_1,.2", ["3_1", "2"]),
        ("3_1.,2", ["3_1", "2"]),
    ],
)
def test_mid_matrix(text, expected):
    # TestStandardAnalyzer.testMid, verbatim
    assert tokenize(text) == expected


# ---------------------------------------------------------------------------
# Emoji suite (testEmoji*, Extended_Pictographic property semantics)
# ---------------------------------------------------------------------------


def test_emoji_simple_and_sequences():
    # testEmoji / testEmojiSequence / testEmojiSequenceWithModifier
    assert tokenize("💩 💩💩") == ["💩", "💩", "💩"]
    assert tokenize("👩‍❤️‍👩") == ["👩‍❤️‍👩"]
    assert tokenize("👨🏼‍⚕️") == ["👨🏼‍⚕️"]
    # testEmojiRegionalIndicator
    assert tokenize("🇺🇸🇺🇸") == ["🇺🇸", "🇺🇸"]
    # testEmojiTokenization
    assert tokenize("poo💩poo") == ["poo", "💩", "poo"]
    assert tokenize("💩中國💩") == ["💩", "中", "國", "💩"]


def test_emoji_variation_sequences():
    # testEmojiVariationSequence, verbatim
    assert tokenize("#️⃣") == ["#️⃣"]
    assert tokenize("3️⃣") == ["3️⃣"]
    assert tokenize("#︎") == []
    assert tokenize("3︎") == ["3︎"]  # FE0E is WB:Extend -> NUM
    assert tokenize("⭕︎") == ["⭕"]
    # the second token keeps its LEADING ZWJ (jflex ZWJ* inside the elem)
    assert tokenize("⭕︎‍⭕︎") == ["⭕", "‍⭕"]


def test_emoji_lone_modifier_and_accidental():
    # jflex EmojiCharOrPresSeqOrModSeq second branch: a standalone
    # Emoji_Modifier (skin tone) is an EMOJI token
    assert tokenize("🏼") == ["🏼"]
    assert tokenize("x 🏼 y") == ["x", "🏼", "y"]
    # ...but after a base it is absorbed
    assert tokenize("👍🏼") == ["👍🏼"]
    # AccidentalEmoji / Extended_Pictographic singletons: ©®™ are tokens
    assert tokenize("©®™") == ["©", "®", "™"]


# ---------------------------------------------------------------------------
# ExtendNumLet / ENL-run skip rule
# ---------------------------------------------------------------------------


def test_extendnumlet_runs():
    # ENL may lead/trail/join (WB13a/b) but never stands alone
    assert tokenize("__foo__") == ["__foo__"]
    assert tokenize("_a_a") == ["_a_a"]
    assert tokenize("___") == []
    assert tokenize("_ __ a_b _") == ["a_b"]
    # undertie U+203F is ENL too
    assert tokenize("a‿b") == ["a‿b"]
    assert tokenize("‿‿") == []


def test_enl_skip_leaves_token_starters():
    # the skip rule must not swallow chars that START a token: leading-ZWJ
    # emoji, lone modifiers, SEA combining marks
    assert tokenize("_‍💩") == ["‍💩"]
    assert tokenize("_🏼") == ["🏼"]
    assert tokenize("_ั") == ["ั"]  # Thai MAI HAN-AKAT (LB:SA)


# ---------------------------------------------------------------------------
# Hebrew quote rules WB7a-c
# ---------------------------------------------------------------------------


def test_hebrew_quotes():
    # WB7b/c: Hebrew_Letter DoubleQuote Hebrew_Letter stays joined
    assert tokenize('מה"פ') == ['מה"פ']
    # WB7a: trailing single quote after a Hebrew letter is kept
    assert tokenize("שלום'") == ["שלום'"]
    # a double quote NOT between Hebrew letters splits
    assert tokenize('ab"cd') == ["ab", "cd"]


# ---------------------------------------------------------------------------
# ASCII fast path: byte-identical to the full grammar on ASCII input
# ---------------------------------------------------------------------------


def _full_grammar_tokens(text):
    return [m.group(1) for m in _TOKEN_RE.finditer(text) if m.group(1)]


def _ascii_tokens(text):
    return [m.group(1) for m in _ASCII_RE.finditer(text) if m.group(1)]


def test_ascii_path_equivalence_exhaustive():
    # every 4-char string over a class-representative alphabet
    import itertools

    alphabet = "a1_.:,' "
    for tup in itertools.product(alphabet, repeat=4):
        s = "".join(tup)
        assert _ascii_tokens(s) == _full_grammar_tokens(s), repr(s)


def test_ascii_path_equivalence_random():
    import random

    rng = random.Random(42)
    alphabet = "abzAZ019_.:,;'\"-/ \t#*"
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 40)))
        assert _ascii_tokens(s) == _full_grammar_tokens(s), repr(s)


# ---------------------------------------------------------------------------
# Generated AH table: equivalent to the class-subtraction it replaces
# ---------------------------------------------------------------------------


def test_generated_ah_class_matches_subtraction():
    """WB_AH_CLASS (generated range table) must equal ``[^\\W\\d_]`` minus
    the analyzer's per-char CJK/SEA classes, over the full codepoint
    space — and the generator's copy of those classes must not drift
    from the analyzer's."""
    import re
    import sys
    from pathlib import Path

    from lucene_spark.analysis.analyzer import _HIRA, _IDEO, _KATA, _SEA
    from lucene_spark.analysis.unicode_wb import WB_AH_CLASS

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    try:
        from gen_unicode_wb import CJK_SEA_LITERALS, expand_class_literal
    finally:
        sys.path.pop(0)

    assert expand_class_literal(CJK_SEA_LITERALS) == expand_class_literal(
        _HIRA + _KATA + _IDEO + _SEA
    ), "generator CJK/SEA literal drifted from analyzer classes"

    table = re.compile(f"[{WB_AH_CLASS}]")
    subtraction = re.compile(rf"(?:(?![{_HIRA}{_KATA}{_IDEO}{_SEA}])[^\W\d_])")
    divergent = [
        cp
        for cp in range(0x110000)
        if bool(table.match(chr(cp))) != bool(subtraction.match(chr(cp)))
    ]
    assert not divergent, [hex(c) for c in divergent[:10]]


# ---------------------------------------------------------------------------
# LUCENE-5897: adversarial ENL/Extend runs must tokenize in linear time
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,text",
    [
        ("underscores", "_" * 20000),
        ("underscore_marks", ("_" + "́") * 10000),
        ("underscore_marks_tail", ("_" + "́") * 10000 + "a"),
        ("marks_only", "́" * 20000),
        ("digit_mid_tail", "1," * 10000),
        ("letter_mid_tail", "a:" * 10000),
    ],
)
def test_pathological_runs_linear(name, text):
    # the LUCENE-5897 shape: (ExtendNumLet [Format Extend]*)+ and friends.
    # Pre-fix these were O(n^2)-to-exponential (1+ s at 4k chars); the
    # possessive-quantifier + skip-rule grammar is linear.  500 ms at 20k
    # chars is ~50x headroom over the observed post-fix cost.
    t0 = time.perf_counter()
    tokenize(text)
    assert time.perf_counter() - t0 < 0.5, name
