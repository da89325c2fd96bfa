"""Analyzer golden token-stream tests.

Mirrors the reference's ``TestStandardAnalyzer`` /
``BaseTokenStreamTestCase.assertTokenStreamContents`` pattern
(core/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java)
for the ALPHANUM/NUM conformance envelope documented in analyzer.py.
"""

import pandas as pd
import pytest

from lucene_spark.analysis import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    java_lower,
    tokenize,
)

A = StandardAnalyzer()  # empty stop set, like the reference default
AE = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("", []),
        ("   \t\n ", []),
        ("B2B", ["b2b"]),
        ("2B", ["2b"]),
        ("some-dashed-phrase", ["some", "dashed", "phrase"]),
        ("dogs,chase,cats", ["dogs", "chase", "cats"]),
        ("ac/dc", ["ac", "dc"]),
        # apostrophes: MidNumLet/MidLetter joins
        ("O'Reilly", ["o'reilly"]),
        ("you're", ["you're"]),
        ("you’re", ["you’re"]),
        # numerics: MidNum joins
        ("3.5", ["3.5"]),
        ("1,000", ["1,000"]),
        ("21.35", ["21.35"]),
        ("R2D2 C3PO", ["r2d2", "c3po"]),
        ("216.239.63.104", ["216.239.63.104"]),
        # mixed-type mids break
        ("a,b", ["a", "b"]),
        ("safari-1.2.1", ["safari", "1.2.1"]),
        # ExtendNumLet underscore folds
        ("foo_bar", ["foo_bar"]),
        ("x_3", ["x_3"]),
        # letters joined by dots (MidNumLet)
        ("U.S.A.", ["u.s.a"]),
        ("example.com", ["example.com"]),
        # punctuation stripping
        ("QUOTED word", ["quoted", "word"]),
        ('"hello" (world)!', ["hello", "world"]),
        # unicode
        ("Besançon café", ["besançon", "café"]),
        ("İstanbul", ["istanbul"]),  # Java 1:1 lowercase of U+0130
        ("ΑΣ ΣΟΦΟΣ", ["ασ", "σοφοσ"]),  # no contextual final sigma
    ],
)
def test_golden_tokens(text, expected):
    assert A.analyze(text) == expected


def test_stopwords_removed_post_lowercase():
    assert AE.analyze("The quick AND the dead") == ["quick", "dead"]
    assert AE.analyze("THE THE THE") == []
    # default analyzer keeps them
    assert A.analyze("The quick") == ["the", "quick"]


def test_max_token_length_skips_not_truncates():
    long_tok = "x" * 256
    ok_tok = "y" * 255
    assert A.analyze(f"start {long_tok} end") == ["start", "end"]
    assert A.analyze(f"a {ok_tok} b") == ["a", ok_tok, "b"]


def test_english_stop_set_is_the_canonical_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"a", "the", "will", "with", "into"} <= ENGLISH_STOP_WORDS
    assert "you" not in ENGLISH_STOP_WORDS


def test_java_lower_divergent_codepoints():
    assert java_lower("İ") == "i"
    assert java_lower("ΣΑΣ") == "σασ"
    assert java_lower("STRASSE") == "strasse"


def test_series_vectorized_and_null_safe():
    s = pd.Series(["Hello World", None, "", "3.5 tips"])
    out = StandardAnalyzer().analyze_series(s)
    assert list(out) == [["hello", "world"], [], [], ["3.5", "tips"]]


def test_tokenize_no_case_fold():
    assert tokenize("Hello") == ["Hello"]


def test_cjk_token_classes():
    """TestStandardAnalyzer CJK cases (StandardTokenizerImpl.jflex classes):
    ideographs and hiragana emit one token per codepoint, katakana and
    hangul emit runs, and CJK never merges with adjacent Latin."""
    from lucene_spark.analysis.analyzer import StandardAnalyzer

    a = StandardAnalyzer()
    assert a.analyze("仮名遣い カタカナ") == ["仮", "名", "遣", "い", "カタカナ"]
    assert a.analyze("我是中国人。 １２３４ Ｔｅｓｔｓ") == [
        "我", "是", "中", "国", "人", "１２３４", "ｔｅｓｔｓ",
    ]
    assert a.analyze("これは本ではない") == ["こ", "れ", "は", "本", "で", "は", "な", "い"]
    assert a.analyze("훈민정음") == ["훈민정음"]
    assert a.analyze("abc日本xyz") == ["abc", "日", "本", "xyz"]
    # positions advance per emitted token (phrase queries over CJK work)
    pos = a.analyze_with_positions("日本 abc")
    assert pos == [("日", 0), ("本", 1), ("abc", 2)]


def test_emoji_token_class():
    """EMOJI class (StandardTokenizer EMOJI type envelope): ZWJ sequences,
    skin-tone modifiers, and regional-indicator flag pairs are ONE token."""
    from lucene_spark.analysis.analyzer import StandardAnalyzer

    a = StandardAnalyzer()
    got = a.analyze(
        "smile \U0001F600 family \U0001F468‍\U0001F469‍\U0001F467 "
        "flag \U0001F1FA\U0001F1F8 thumbs \U0001F44D\U0001F3FD done"
    )
    assert got == [
        "smile", "\U0001F600", "family",
        "\U0001F468‍\U0001F469‍\U0001F467",
        "flag", "\U0001F1FA\U0001F1F8",
        "thumbs", "\U0001F44D\U0001F3FD", "done",
    ]
    assert a.analyze("mixed\U0001F600emoji") == ["mixed", "\U0001F600", "emoji"]


def test_emoji_keycap_and_tag_sequences():
    """r5 UTS#51 tail (golden cases from
    ``TestStandardAnalyzer.testEmojiVariationSequence/testEmojiTagSequence``):
    keycap sequences are ONE EMOJI token (not a NUM), subdivision-flag tag
    sequences ride the base emoji, a text-presentation selector after a
    base leaves the bare emoji token, and '#' with a text selector yields
    nothing."""
    from lucene_spark.analysis.analyzer import StandardAnalyzer, tokenize

    a = StandardAnalyzer()
    assert a.analyze("#️⃣") == ["#️⃣"]
    assert a.analyze("3️⃣") == ["3️⃣"]
    assert tokenize("#︎") == []
    assert tokenize("⭕︎") == ["⭕"]
    # England flag: black flag + tag letters + tag terminator
    tag_flag = (
        "\U0001f3f4\U000e0067\U000e0062\U000e0065\U000e006e"
        "\U000e0067\U000e007f"
    )
    assert a.analyze(f"go {tag_flag} go") == ["go", tag_flag, "go"]
    # keycap must not eat ordinary numerics
    assert a.analyze("3,000 and #5") == ["3,000", "and", "5"]
    # keycap marks after a word run are ABSORBED into it (jflex maximal
    # munch: NumericEx = Numeric {ExtFmtZwj} where ExtFmtZwj includes
    # FE0F/20E3, and the 4-char NUM match beats any EMOJI-rule prefix —
    # StandardTokenizerImpl.jflex:92,211-216).  Only a keycap that STARTS
    # a token comes out of the EMOJI rule (the "3️⃣" cases above).
    assert tokenize("12️⃣") == ["12️⃣"]
    assert tokenize("123️⃣") == ["123️⃣"]
    # same WB4 absorption after a letter run: the mark rides the token
    assert tokenize("table⃣ x") == ["table⃣", "x"]
    # offsets stay aligned through the keycap form
    assert a.analyze_with_offsets("x 3️⃣ y") == [
        ("x", 0, 0, 1), ("3️⃣", 1, 2, 5), ("y", 2, 6, 7),
    ]
