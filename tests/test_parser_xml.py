"""XML query parser (round 5): the CoreParser element set over the
engine's query dataclasses, plus the SpanPositionRange interval filter.
"""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.search.intervals import IPositionRange, ITerm, eval_intervals
from lucene_spark.search.parser import ParseError
from lucene_spark.search.parser_xml import parse_xml
from lucene_spark.search.payloads import PayloadScoreQuery
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    TermQuery,
    TermRangeQuery,
)
from lucene_spark.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanTermQuery,
)

AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


def test_leaf_elements():
    assert parse_xml('<TermQuery fieldName="text">merge</TermQuery>', AN) == \
        TermQuery("merge", "text")
    q = parse_xml('<TermQuery fieldName="text" boost="2">merge</TermQuery>', AN)
    assert isinstance(q, BoostQuery) and q.boost == 2.0
    assert isinstance(parse_xml("<MatchAllDocsQuery/>", AN), MatchAllDocsQuery)
    rq = parse_xml(
        '<RangeQuery fieldName="text" lowerTerm="a" upperTerm="b"'
        ' includeUpper="false"/>',
        AN,
    )
    assert rq == TermRangeQuery("a", "b", True, False, "text")


def test_terms_query_analyzes():
    # stopword dropped, terms SHOULD-composed
    q = parse_xml('<TermsQuery fieldName="text">scan the merge</TermsQuery>', AN)
    assert isinstance(q, BooleanQuery)
    assert [c.query.term for c in q.clauses] == ["scan", "merge"]
    assert all(c.occur == Occur.SHOULD for c in q.clauses)


def test_boolean_clause_occurs_and_field_inheritance():
    q = parse_xml(
        '<BooleanQuery fieldName="text">'
        '<Clause occurs="must"><TermQuery>scan</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>table</TermQuery></Clause>'
        '<Clause occurs="filter"><TermQuery>merge</TermQuery></Clause>'
        "</BooleanQuery>",
        AN,
    )
    assert [c.occur for c in q.clauses] == [
        Occur.MUST, Occur.MUST_NOT, Occur.FILTER,
    ]
    # fieldName inherited from the enclosing BooleanQuery
    assert all(c.query.field == "text" for c in q.clauses)
    with pytest.raises(ParseError, match="occurs"):
        parse_xml(
            '<BooleanQuery fieldName="text">'
            '<Clause occurs="perhaps"><TermQuery>x</TermQuery></Clause>'
            "</BooleanQuery>",
            AN,
        )


def test_span_elements():
    q = parse_xml(
        '<SpanNear slop="2" inOrder="true" fieldName="text">'
        "<SpanTerm>scan</SpanTerm><SpanTerm>merge</SpanTerm></SpanNear>",
        AN,
    )
    assert q == SpanNearQuery(
        (SpanTermQuery("scan"), SpanTermQuery("merge")), 2, True
    )
    # inOrder defaults FALSE (SpanNearBuilder.java:41)
    q2 = parse_xml(
        '<SpanNear slop="1" fieldName="text">'
        "<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>",
        AN,
    )
    assert q2.in_order is False
    q3 = parse_xml(
        '<SpanOrTerms fieldName="text">scan the merge</SpanOrTerms>', AN
    )
    assert q3 == SpanOrQuery((SpanTermQuery("scan"), SpanTermQuery("merge")))
    q4 = parse_xml(
        '<SpanFirst end="3"><SpanTerm fieldName="text">x</SpanTerm></SpanFirst>',
        AN,
    )
    assert q4 == SpanFirstQuery(SpanTermQuery("x"), 3)
    q5 = parse_xml(
        '<SpanNot fieldName="text"><Include><SpanTerm>a</SpanTerm></Include>'
        "<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>",
        AN,
    )
    assert q5 == SpanNotQuery(SpanTermQuery("a"), SpanTermQuery("b"))
    q6 = parse_xml(
        '<SpanPositionRange start="1" end="5">'
        '<SpanTerm fieldName="text">x</SpanTerm></SpanPositionRange>',
        AN,
    )
    assert q6 == SpanPositionRangeQuery(SpanTermQuery("x"), 1, 5)


def test_boosting_term_is_payload_score():
    # the reference's 3-arg ctor includes the span score
    q = parse_xml('<BoostingTermQuery fieldName="text">merge</BoostingTermQuery>', AN)
    assert q == PayloadScoreQuery("merge", "avg", "text", include_span_score=True)


def test_defaults_and_malformed_inputs():
    # SpanFirst/SpanPositionRange default end/start to 1 (DOMUtils default)
    q = parse_xml('<SpanFirst><SpanTerm fieldName="text">x</SpanTerm></SpanFirst>', AN)
    assert q == SpanFirstQuery(SpanTermQuery("x"), 1)
    q2 = parse_xml(
        '<SpanPositionRange><SpanTerm fieldName="text">x</SpanTerm>'
        "</SpanPositionRange>",
        AN,
    )
    assert q2 == SpanPositionRangeQuery(SpanTermQuery("x"), 1, 1)
    # empty composites and malformed numerics fail at PARSE time
    with pytest.raises(ParseError, match="at least one child"):
        parse_xml('<SpanNear slop="1" fieldName="text"/>', AN)
    with pytest.raises(ParseError, match="at least one child"):
        parse_xml('<DisjunctionMaxQuery fieldName="text"/>', AN)
    with pytest.raises(ParseError, match="not a number"):
        parse_xml('<TermQuery fieldName="text" boost="two">x</TermQuery>', AN)
    with pytest.raises(ParseError, match="not a number"):
        parse_xml(
            '<SpanNear slop="wide" fieldName="text">'
            "<SpanTerm>a</SpanTerm></SpanNear>",
            AN,
        )
    # UserQuery's OWN fieldName becomes the classic parse default field
    uq = parse_xml('<UserQuery fieldName="title">big</UserQuery>', AN)
    assert uq == TermQuery("big", "title")


def test_composites_and_errors():
    q = parse_xml(
        '<DisjunctionMaxQuery tieBreaker="0.3" fieldName="text">'
        "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
        "</DisjunctionMaxQuery>",
        AN,
    )
    assert isinstance(q, DisjunctionMaxQuery) and q.tie_breaker == 0.3
    q2 = parse_xml(
        '<ConstantScoreQuery fieldName="text"><TermQuery>a</TermQuery>'
        "</ConstantScoreQuery>",
        AN,
    )
    assert isinstance(q2, ConstantScoreQuery)
    with pytest.raises(ParseError, match="delegated to Catalyst"):
        parse_xml('<PointRangeQuery fieldName="n" lowerTerm="1" upperTerm="2"/>', AN)
    with pytest.raises(ParseError, match="unknown XML"):
        parse_xml("<Nope/>", AN)
    with pytest.raises(ParseError, match="single-field"):
        parse_xml('<SpanTerm fieldName="other">x</SpanTerm>', AN)
    with pytest.raises(ParseError, match="malformed XML"):
        parse_xml("<oops", AN)
    with pytest.raises(ParseError, match="non-blank"):
        parse_xml('<TermQuery fieldName="text">  </TermQuery>', AN)


def test_position_range_eval():
    pm = {"t": np.array([0, 2, 4, 6], dtype=np.int64)}
    s, e, _ = eval_intervals(IPositionRange(2, 5, ITerm("t")), pm)
    assert list(s) == [2, 4]  # 0 < start; 6 has exclusive end 7 > 5


def test_xml_execution(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.analysis.filters import token_offset_payload

    rows = [
        (0, "big scan table merge wins"),
        (1, "scan then merge"),
        (2, "big data only"),
    ]
    an = StandardAnalyzer(
        stop_words=ENGLISH_STOP_WORDS, payload_fn=token_offset_payload
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = IndexSearcher(
        build_index(
            df, doc_id_col="doc_id", analyzer=an, with_positions=True,
            build_blocks=True,
        ).persist()
    )
    q = parse_xml(
        '<BooleanQuery fieldName="text">'
        '<Clause occurs="must"><UserQuery>big</UserQuery></Clause>'
        '<Clause occurs="must"><SpanNear slop="2" inOrder="true">'
        "<SpanTerm>scan</SpanTerm><SpanTerm>merge</SpanTerm>"
        "</SpanNear></Clause></BooleanQuery>",
        an,
    )
    got = s.search(q, k=10).collect()
    assert [r["doc_id"] for r in got] == [0]
    bm25 = {r["doc_id"]: r["score"] for r in s.search("big", k=10).collect()}
    sat = float(np.float32(1.0) - np.float32(1.0) / np.float32(1.5))
    assert got[0]["score"] == pytest.approx(bm25[0] + sat, abs=1e-6)
    # BoostingTermQuery: BM25 span score x avg payload (includeSpanScore)
    bq = parse_xml('<BoostingTermQuery fieldName="text">merge</BoostingTermQuery>', an)
    scores = {r["doc_id"]: r["score"] for r in s.search(bq, k=10).collect()}
    bm25m = {r["doc_id"]: r["score"] for r in s.search("merge", k=10).collect()}
    pay_avg = {0: np.float32(15.0), 1: np.float32(10.0)}
    want = {
        d: float(np.float32(np.float32(bm25m[d]) * pay_avg[d]))
        for d in pay_avg
    }
    assert scores == pytest.approx(want, abs=1e-7)
    # the standalone scores form stays payload-only
    from lucene_spark.search.payloads import payload_scores

    only = {
        r["doc_id"]: r["score"]
        for r in payload_scores(s.index, "merge", "avg").collect()
    }
    assert only == {0: 15.0, 1: 10.0}