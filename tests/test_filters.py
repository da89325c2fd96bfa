"""Token filters: possessive, ASCII folding, Porter stemmer, chain wiring."""

import pytest

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.analysis.filters import ascii_fold, english_possessive, porter_stem


def test_english_possessive():
    assert english_possessive("john's") == "john"
    assert english_possessive("john’s") == "john"
    assert english_possessive("its") == "its"
    assert english_possessive("'s") == ""


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("über") == "uber"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("plain") == "plain"


# canonical pairs from the published Porter (1980) examples
PORTER_PAIRS = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("formaliti", "formal"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("effective", "effect"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
]


@pytest.mark.parametrize("word,stem", PORTER_PAIRS)
def test_porter(word, stem):
    assert porter_stem(word) == stem


def test_analyzer_filter_chain():
    a = StandardAnalyzer(
        stop_words=ENGLISH_STOP_WORDS,
        token_filters=(english_possessive, ascii_fold),
        post_stop_filters=(porter_stem,),
    )
    # 'The'/'was' stopped BEFORE stemming (EnglishAnalyzer order)
    assert a.analyze("The Café's Owner was HOPPING") == ["cafe", "owner", "hop"]
    # positions keep holes for stops under the filtered chain too
    assert a.analyze_with_positions("the caresses") == [("caress", 1)]
