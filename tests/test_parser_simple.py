"""SimpleQueryParser — the lenient end-user syntax
(``queryparser/simple/SimpleQueryParser.java``)."""

import pytest

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.search.parser_simple import (
    FUZZY_OPERATOR,
    PHRASE_OPERATOR,
    SimpleQueryParser,
)
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)

AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
P = SimpleQueryParser(AN, "text")


def B(*clauses, msm=0):
    return BooleanQuery(tuple(clauses), msm)


def C(occur, q):
    return BooleanClause(occur, q)


def T(t):
    return TermQuery(t, "text")


def test_single_and_default_or():
    assert P.parse("merge") == T("merge")
    assert P.parse("merge join") == B(
        C(Occur.SHOULD, T("merge")), C(Occur.SHOULD, T("join"))
    )


def test_explicit_operators_and_precedence():
    assert P.parse("merge + join") == B(
        C(Occur.MUST, T("merge")), C(Occur.MUST, T("join"))
    )
    # operation change wraps the existing tree (left precedence)
    got = P.parse("scan + merge | join")
    assert got == B(
        C(Occur.SHOULD, B(C(Occur.MUST, T("scan")), C(Occur.MUST, T("merge")))),
        C(Occur.SHOULD, T("join")),
    )
    # stopword clauses drop out leniently (the lenient-analysis contract)
    assert P.parse("a + merge") == T("merge")
    # parenthesized group parsed as its own tree
    got = P.parse("data + (merge | join)")
    assert got == B(
        C(Occur.MUST, T("data")),
        C(
            Occur.MUST,
            B(C(Occur.SHOULD, T("merge")), C(Occur.SHOULD, T("join"))),
        ),
    )


def test_not_wraps_with_matchall():
    got = P.parse("-batch")
    assert got == B(
        C(Occur.MUST_NOT, T("batch")), C(Occur.SHOULD, MatchAllDocsQuery())
    )
    # double negation cancels
    assert P.parse("--batch") == T("batch")


def test_phrase_prefix_fuzzy():
    assert P.parse('"merge join"') == PhraseQuery(("merge", "join"), 0, "text")
    assert P.parse('"merge join"~2 x') == B(
        C(Occur.SHOULD, PhraseQuery(("merge", "join"), 2, "text")),
        C(Occur.SHOULD, T("x")),
    )
    assert P.parse("mer*") == PrefixQuery("mer", "text")
    assert P.parse("merge~1") == FuzzyQuery("merge", 1, "text")
    assert P.parse("merge~") == FuzzyQuery("merge", 2, "text")  # auto = 2
    assert P.parse("merge~9") == FuzzyQuery("merge", 2, "text")  # capped
    assert P.parse("merge~0") == T("merge")  # zero edits = plain term
    assert P.parse("merge~x") == T("merge")  # garbage swallowed


def test_leniency_never_raises():
    # unmatched parens/quotes are extraneous; syntax soup stays a query
    assert P.parse("((") == MatchNoDocsQuery()
    assert P.parse('"unclosed phrase') == B(
        C(Occur.SHOULD, T("unclosed")), C(Occur.SHOULD, T("phrase"))
    )
    assert P.parse(")merge(") == T("merge")
    assert P.parse("") == MatchNoDocsQuery()
    assert P.parse("*") == MatchAllDocsQuery()
    assert P.parse("+ | - ~") == MatchNoDocsQuery()


def test_flags_disable_features():
    # with PHRASE/FUZZY off, the operators are literal text (analyzed away)
    p = SimpleQueryParser(AN, "text", flags=~(PHRASE_OPERATOR | FUZZY_OPERATOR))
    assert p.parse('"merge join"') == B(
        C(Occur.SHOULD, T("merge")), C(Occur.SHOULD, T("join"))
    )
    # "merge~1" becomes one raw token whose analysis splits at the tilde
    assert p.parse("merge~1") == B(
        C(Occur.SHOULD, T("merge")), C(Occur.SHOULD, T("1"))
    )


def test_prefix_fuzzy_normalize_not_tokenize():
    """newPrefixQuery/newFuzzyQuery use Analyzer.normalize — case-fold
    WITHOUT tokenizing (a tokenizing pass would truncate 'Wi-Fi' to its
    first token)."""
    assert P.parse("Wi-Fi*") == PrefixQuery("wi-fi", "text")
    assert P.parse("Wi-Fi~1") == FuzzyQuery("wi-fi", 1, "text")


def test_escape_operator():
    # escaped star is literal, so the token analyzes as a plain term
    assert P.parse(r"mer\*") == T("mer")


def test_multi_field_weights():
    p = SimpleQueryParser(AN, weights={"text": 1.0, "title": 2.0})
    got = p.parse("merge")
    assert isinstance(got, BooleanQuery)
    assert {type(c.query).__name__ for c in got.clauses} == {
        "TermQuery",
        "BoostQuery",
    }
