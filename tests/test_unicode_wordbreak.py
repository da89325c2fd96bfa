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
# True-property fidelity (review findings): Mid sets, WB:Numeric,
# WB:Extend members the category approximation missed
# ---------------------------------------------------------------------------


def test_full_mid_property_sets():
    # U+2018 LEFT SINGLE QUOTATION MARK is MidNumLet (joins letters AND
    # digits); U+055F ARMENIAN ABBREVIATION MARK is MidLetter; U+0589
    # ARMENIAN FULL STOP is MidNum
    assert tokenize("don‘t") == ["don‘t"]
    assert tokenize("1‘2") == ["1‘2"]
    assert tokenize("a՟b") == ["a՟b"]
    assert tokenize("1։2") == ["1։2"]
    # ...but as always a Mid needs the right class on BOTH sides
    assert tokenize("a։b") == ["a", "b"]


def test_wb_numeric_beyond_nd():
    # WB:Numeric includes the Cf prepended signs (U+0600 ARABIC NUMBER
    # SIGN) and U+066B ARABIC DECIMAL SEPARATOR — all one NUM token
    assert tokenize("؀123") == ["؀123"]
    assert tokenize("3٫14") == ["3٫14"]


def test_halfwidth_sound_marks_are_extend():
    # U+FF9E/FF9F are WB:Extend (category Lm), NOT Katakana bases:
    # absorbed into whatever precedes, never a token start
    assert tokenize("ｱﾞ") == ["ｱﾞ"]
    assert tokenize("aﾞ") == ["aﾞ"]
    assert tokenize("3ﾞ") == ["3ﾞ"]
    assert tokenize(" ﾞx") == ["x"]


def test_aletter_beyond_python_w():
    # WB:ALetter members Python \w misses: U+05F3 HEBREW GERESH joins
    # letter runs directly (it is ALetter, not a quote rule)
    assert tokenize("א׳ב") == ["א׳ב"]
    # circled letters are ALetter too
    assert tokenize("Ⓐx") == ["Ⓐx"]


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


def test_generated_tables_match_wb_properties():
    """Every generated table must equal the true Unicode property it
    claims to be (cross-checked against the ``regex`` module, the same
    source the generator uses — this catches hand edits and stale
    regeneration), and the BMP/astral splits must union back exactly."""
    import sys
    from pathlib import Path

    rx = pytest.importorskip("regex")
    from lucene_spark.analysis import unicode_wb as uwb

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    try:
        from gen_unicode_wb import expand_class_literal
    finally:
        sys.path.pop(0)

    all_cps = "".join(
        chr(cp) for cp in range(0x110000) if not 0xD800 <= cp <= 0xDFFF
    )

    def prop(pat):
        return {ord(c) for c in rx.compile(pat).findall(all_cps)}

    wb = lambda v: prop(rf"\p{{WordBreak={v}}}")  # noqa: E731
    ext = wb("Extend") | wb("Format") | {0x200D}
    ah = wb("ALetter") | wb("Hebrew_Letter")
    expected = {
        "WB_EXT_CLASS": ext,
        "WB_AH_CLASS": ah,
        "WB_NUM_CLASS": wb("Numeric"),
        "WB_KATA_CLASS": wb("Katakana"),
        "WB_HIRA_CLASS": prop(r"\p{Script=Hiragana}") - ext - ah,
        "WB_IDEO_CLASS": prop(r"\p{Script=Han}") - ext - ah,
        "WB_SEA_CLASS": prop(r"\p{LineBreak=Complex_Context}"),
        "WB_ENL_CLASS": wb("ExtendNumLet"),
        "WB_MIDL_CLASS": wb("MidLetter") | wb("MidNumLet") | wb("Single_Quote"),
        "WB_MIDN_CLASS": wb("MidNum") | wb("MidNumLet") | wb("Single_Quote"),
        "WB_HEB_CLASS": wb("Hebrew_Letter"),
        "WB_RI_CLASS": wb("Regional_Indicator"),
        "EXT_PICT_CLASS": prop(r"\p{Extended_Pictographic}"),
        "EMOJI_MOD_CLASS": prop(r"\p{Emoji_Modifier}"),
    }
    for name, want in expected.items():
        got = expand_class_literal(getattr(uwb, name))
        assert got == want, (name, len(got ^ want))
    for base in ("WB_EXT", "WB_AH", "WB_NUM", "WB_KATA", "WB_HIRA",
                 "WB_IDEO", "WB_SEA", "EXT_PICT"):
        whole = expand_class_literal(getattr(uwb, f"{base}_CLASS"))
        bmp = expand_class_literal(getattr(uwb, f"{base}_BMP_CLASS"))
        astral = expand_class_literal(getattr(uwb, f"{base}_ASTRAL_CLASS"))
        assert bmp | astral == whole and not bmp & astral, base
        assert all(c <= 0xFFFF for c in bmp) and all(c > 0xFFFF for c in astral)


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
        # guard-char interleavings: the skip rule must stop before these
        # (they start tokens), so the WORD rule's LEADING absorption is
        # guarded too — with full leading absorption these were O(n^2)
        # (18 s at 20k chars for the modifier case)
        ("underscore_zwj", ("_" + "‍") * 10000),
        ("underscore_modifier", ("_" + "\U0001f3fb") * 10000),
        ("underscore_thai_mark", ("_" + "่") * 10000),
        ("zwj_only", "‍" * 20000),
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
