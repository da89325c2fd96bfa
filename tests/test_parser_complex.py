"""ComplexPhrase parser (round 5): quoted phrases with embedded wildcards /
fuzzies / OR-groups / negations rewritten to span queries per
``queryparser/complexPhrase/ComplexPhraseQueryParser.java`` — plus the
classic-parser juxtaposition (implicit default-OR) it depends on, and span
clauses riding inside Boolean trees through the searcher.
"""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.parser import ParseError, parse
from lucene_spark.search.parser_complex import (
    NO_MATCH_SPAN,
    complex_phrase_to_query,
    parse_complex,
)
from lucene_spark.search.query import (
    BooleanQuery,
    Occur,
    TermQuery,
    WildcardQuery,
)
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.spans import (
    SpanMultiTermQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    span_topk,
)

AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)

DOCS = [
    (0, "scan the table then merge runs"),
    (1, "sort then merge the results"),
    (2, "scan now sort later never merge"),
    (3, "merge scan"),
    (4, "big scan table merge wins"),
]


@pytest.fixture(scope="module")
def idx(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_index(
        df, doc_id_col="doc_id", analyzer=AN, with_positions=True,
        build_blocks=True,
    ).persist()


# ------------------------------------------------- classic juxtaposition


def test_classic_parser_juxtaposition():
    q = parse("scan sort", AN)
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    q = parse("(scan sort) merge", AN)
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2


# ------------------------------------------------------- rewrite shapes


def test_or_group_phrase_shape():
    q = parse_complex('"(scan sort) merge"~2', AN)
    assert q == SpanNearQuery(
        (
            SpanOrQuery((SpanTermQuery("scan"), SpanTermQuery("sort"))),
            SpanTermQuery("merge"),
        ),
        slop=2,
        in_order=True,
    )


def test_wildcard_in_phrase_shape():
    q = parse_complex('"sc* merge"~1', AN)
    assert isinstance(q, SpanNearQuery)
    mt = q.clauses[0]
    assert isinstance(mt, SpanMultiTermQuery) and mt.kind == "wildcard"
    assert mt.pattern == "sc*"


def test_single_clause_passthrough():
    assert parse_complex('"scan"', AN) == TermQuery("scan", "text")
    assert isinstance(parse_complex('"sc*"', AN), WildcardQuery)


def test_negative_clause_quirk():
    # rewrite:332-361 — include widens slop by the negative count; exclude
    # keeps all clauses (negatives in place) at the original slop
    q = parse_complex('"scan -table merge"~2', AN)
    assert q == SpanNotQuery(
        include=SpanNearQuery(
            (SpanTermQuery("scan"), SpanTermQuery("merge")), slop=3,
            in_order=True,
        ),
        exclude=SpanNearQuery(
            (
                SpanTermQuery("scan"),
                SpanTermQuery("table"),
                SpanTermQuery("merge"),
            ),
            slop=2,
            in_order=True,
        ),
    )


def test_nested_group_composes_one_element():
    # a nested (sort -table) group is ONE SpanNot element inside the outer
    # or — NOT flattened into the parent's negative list
    q = parse_complex('"(scan (sort -table)) merge"', AN)
    outer_or = q.clauses[0]
    assert isinstance(outer_or, SpanOrQuery)
    inner = outer_or.clauses[1]
    assert isinstance(inner, SpanNotQuery)
    assert inner.include == SpanOrQuery((SpanTermQuery("sort"),))


def test_field_mismatch_raises():
    with pytest.raises(ParseError, match="nested in phrase"):
        parse_complex('"other:scan merge"', AN)


def test_all_negative_phrase_raises():
    # no positive clauses: fail at parse time, not with an IndexError
    # deep inside plan evaluation
    with pytest.raises(ParseError, match="no positive clauses"):
        parse_complex('"-scan -merge"~1', AN)


def test_stopword_only_phrase_drops():
    from lucene_spark.search.query import MatchNoDocsQuery

    assert isinstance(parse_complex('"the of"', AN), MatchNoDocsQuery)
    assert complex_phrase_to_query("the of", 0, "text", AN) is None


# -------------------------------------------------------- execution


def test_or_group_phrase_execution(idx):
    q = parse_complex('"(scan sort) merge"~2', AN)
    got = [(r["doc_id"], float(np.float32(r["score"])))
           for r in span_topk(idx, q, k=10).collect()]
    # doc1 [0,2] and doc4 [1,3]: freq 1/2 -> sat 1/3; doc2 [2,5]: 1/4 -> 0.2
    sat = lambda fr: float(np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + np.float32(fr)))  # noqa: E731
    assert got == [(1, sat(0.5)), (4, sat(0.5)), (2, sat(1 / 3))]


def test_negative_phrase_execution(idx):
    q = parse_complex('"scan -table merge"~2', AN)
    # every in-order scan..merge within slop 3 has table inside (doc 0, 4)
    # or fails the include (docs 2, 3)
    assert span_topk(idx, q, k=10).count() == 0


def test_empty_expansion_matches_nothing(idx):
    # "Fred Smithe*" with no Smithe* terms must NOT match on just Fred
    q = parse_complex('"scan zzz*"', AN)
    assert span_topk(idx, q, k=10).count() == 0
    assert NO_MATCH_SPAN.term.startswith("\x00")


def test_complex_phrase_inside_boolean(idx):
    s = IndexSearcher(idx)
    q = parse_complex('big AND "(scan sort) merge"~2', AN)
    rows = s.search(q, k=10).collect()
    assert [r["doc_id"] for r in rows] == [4]
    # score = BM25(big) + interval saturation of the span clause
    bm25 = {r["doc_id"]: r["score"] for r in s.search("big", k=10).collect()}
    sat = float(np.float32(1.0) - np.float32(1.0) / np.float32(1.5))
    assert rows[0]["score"] == pytest.approx(bm25[4] + sat, abs=1e-6)
