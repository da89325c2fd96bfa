"""FreeTextSuggester — ngram-LM suggestions with stupid backoff
(``suggest/.../analyzing/FreeTextSuggester.java``)."""

import pytest

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.search.features import FreeTextSuggester

SEP = FreeTextSuggester.SEPARATOR
MAXD = float(2**63)

CORPUS = [
    "merge sort is stable",
    "merge join beats hash join here",
    "merge sort again and again",
    "quick sort is unstable",
]


@pytest.fixture(scope="module")
def sug(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    s = FreeTextSuggester(docs, analyzer=StandardAnalyzer(), grams=2)
    yield s
    s.close()


def test_model_counts_and_tot(sug):
    m = {r["ngram"]: r["cnt"] for r in sug.model.collect()}
    assert m["merge"] == 3 and m[f"merge{SEP}sort"] == 2 and m[f"merge{SEP}join"] == 1
    # tot tokens = sum of unigram occurrences
    assert sug.tot_tokens == sum(len(t.split()) for t in CORPUS)


def test_next_word_prediction(sug):
    # trailing space -> predict the word after "merge": sort (2) > join (1)
    out = sug.lookup("merge ", num=5)
    keys = [k for k, _ in out]
    assert keys[0] == f"merge{SEP}sort" and keys[1] == f"merge{SEP}join"
    # value = (long)(2^63 * 1.0 * count / count("merge"))
    assert out[0][1] == int(MAXD * 1.0 * 2.0 / 3.0)


def test_backoff_and_seen_dedup(sug):
    # "quick s": bigram level has quick<sep>sort (backoff 1.0); the
    # unigram level's "sort" and "stable" — sort is SEEN, stable emits at
    # backoff 0.4 over tot_tokens
    out = dict(sug.lookup("quick s", num=5))
    assert f"quick{SEP}sort" in out
    assert "stable" in out and "sort" not in out
    assert out["stable"] == int(MAXD * 0.4 * 1.0 / sug.tot_tokens)


def test_word_completion_unigram(sug):
    # single partial token: unigram completions ranked by count
    out = sug.lookup("s", num=5)
    frags = [k for k, _ in out]
    assert frags[0] == "sort"  # count 3 beats stable/is/...


def test_empty_key_raises(sug):
    with pytest.raises(ValueError):
        sug.lookup("", num=5)


def test_trailing_punctuation_ends_token(sug):
    """The offset rule (FreeTextSuggester.java:591-593): ANY trailing
    consumed text — not just whitespace — ends the last token, so
    'merge,' predicts the NEXT word exactly like 'merge '."""
    assert sug.lookup("merge,", num=5) == sug.lookup("merge ", num=5)


def test_fuzzy_suggester(spark):
    from lucene_spark.search.features import FuzzySuggester

    entries = spark.createDataFrame(
        [("merge", 50), ("merged", 20), ("verge", 30), ("marge", 10), ("me", 5)],
        "surface string, weight long",
    )
    s = FuzzySuggester(entries, analyzer=StandardAnalyzer())
    # transposed typo: "mrege" ~ merge/merged (OSA 1 prefix), weight order;
    # "verge" is excluded — the first byte is never edited
    got = [r["surface"] for r in s.lookup("mrege").collect()]
    assert got == ["merge", "merged"]
    # "marge" needs one substitution: also within distance 1 of "merge"
    got = [r["surface"] for r in s.lookup("merge").collect()]
    assert got == ["merge", "merged", "marge"]
    # below MIN_FUZZY_LENGTH: exact prefix only
    got = [r["surface"] for r in s.lookup("me").collect()]
    assert set(got) == {"merge", "merged", "me"}


def test_blended_infix_position_discount(spark):
    from lucene_spark.search.features import BlendedInfixSuggester

    entries = spark.createDataFrame(
        [
            ("merge early entry", 100),   # merge at position 0
            ("the big merge", 100),       # merge at position 2
            ("one two three four five six seven eight nine ten eleven merge", 100),
        ],
        "surface string, weight long",
    )
    s = BlendedInfixSuggester(
        entries, analyzer=StandardAnalyzer(), blender_type="linear"
    )
    got = {r["surface"]: r["weight"] for r in s.lookup("merge", num=5).collect()}
    # "merge early entry" starts with the raw key -> coefficient 1
    assert got["merge early entry"] == 100
    # position 2 -> 1 - 0.2 = 0.8
    assert got["the big merge"] == 80
    # position 11 -> 1 - 1.1 = -0.1 -> negative score, truncated toward 0
    assert (
        got["one two three four five six seven eight nine ten eleven merge"]
        == -10
    )
    # reciprocal blender: 1/(pos+1)
    s2 = BlendedInfixSuggester(
        entries, analyzer=StandardAnalyzer(), blender_type="reciprocal"
    )
    got2 = {r["surface"]: r["weight"] for r in s2.lookup("merge", num=5).collect()}
    assert got2["the big merge"] == int(100 * (1.0 / 3.0))


# ------------------------------------------------------------------ infix


def test_infix_suggester(spark):
    from lucene_spark.search.features import AnalyzingInfixSuggester

    entries = spark.createDataFrame(
        [
            ("merge sort basics", 10),
            ("big data merge", 30),
            ("quick sort", 20),
            ("merge two sorted runs", 25),
        ],
        "surface string, weight long",
    )
    s = AnalyzingInfixSuggester(entries, analyzer=StandardAnalyzer())
    # infix: "merge" matches mid-entry; prefix "so" completes sort/sorted
    got = [(r["surface"], r["weight"]) for r in s.lookup("merge so").collect()]
    assert got == [("merge two sorted runs", 25), ("merge sort basics", 10)]
    # trailing space makes the last token EXACT: "so" matches nothing
    assert s.lookup("merge so ").count() == 0
    # allTermsRequired=False: any clause may match, weight order
    got = [r["surface"] for r in s.lookup("merge so", all_terms_required=False).collect()]
    assert got == [
        "big data merge",
        "merge two sorted runs",
        "quick sort",
        "merge sort basics",
    ]
