"""Surround parser: W/N distance operators, prefix forms, Booleans,
truncation, envelope errors, and end-to-end parity with the spans API."""

import pytest

from lucene_spark.search.parser import ParseError
from lucene_spark.search.parser_surround import parse_surround, surround_topk
from lucene_spark.search.query import (
    BooleanQuery,
    Occur,
    TermQuery,
    WildcardQuery,
)
from lucene_spark.search.spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    span_topk,
)


def test_distance_operators():
    assert parse_surround("scan W merge") == SpanNearQuery(
        (SpanTermQuery("scan"), SpanTermQuery("merge")), slop=0, in_order=True
    )
    assert parse_surround("scan 3W merge") == SpanNearQuery(
        (SpanTermQuery("scan"), SpanTermQuery("merge")), slop=2, in_order=True
    )
    assert parse_surround("scan 4N merge") == SpanNearQuery(
        (SpanTermQuery("scan"), SpanTermQuery("merge")), slop=3, in_order=False
    )
    # prefix operator form, n-ary, case-insensitive
    assert parse_surround("3w(a, b, c)") == SpanNearQuery(
        (SpanTermQuery("a"), SpanTermQuery("b"), SpanTermQuery("c")),
        slop=2,
        in_order=True,
    )
    # OR inside a distance operand → SpanOr; nesting composes
    q = parse_surround("2W(scan, OR(sort, merge))")
    assert q == SpanNearQuery(
        (
            SpanTermQuery("scan"),
            SpanOrQuery((SpanTermQuery("sort"), SpanTermQuery("merge"))),
        ),
        slop=1,
        in_order=True,
    )
    # infix chains collect into ONE flat n-ary near (reference grammar:
    # the slop is a TOTAL budget across the chain, not per adjacent pair)
    q = parse_surround("a 3W b 3W c")
    assert q == SpanNearQuery(
        (SpanTermQuery("a"), SpanTermQuery("b"), SpanTermQuery("c")),
        slop=2,
        in_order=True,
    )


def test_boolean_operators():
    q = parse_surround("scan AND merge")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST]
    q = parse_surround("scan OR merge OR sort")
    assert all(c.occur == Occur.SHOULD for c in q.clauses)
    q = parse_surround("scan NOT merge")
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST_NOT]
    q = parse_surround("AND(scan, mer*)")
    assert q.clauses[1].query == WildcardQuery("mer*")
    # grouping
    q = parse_surround("(scan OR sort) AND merge")
    assert isinstance(q.clauses[0].query, BooleanQuery)
    assert q.clauses[1].query == TermQuery("merge")


def test_envelope_errors():
    with pytest.raises(ParseError):
        parse_surround("(scan W merge) AND sort")  # Boolean over spans
    with pytest.raises(ParseError):
        parse_surround("")
    with pytest.raises(ParseError):
        parse_surround("scan AND")
    with pytest.raises(ParseError):
        parse_surround("3W(a)) extra")
    with pytest.raises(ParseError):
        parse_surround("a W b 3N c")  # mixed infix distance ops need parens


def test_r5_lifted_envelope():
    """Round 5: truncation inside a distance operand and repeated operands
    both parse now (multi-term interval sources / RepeatingIntervalsSource)."""
    from lucene_spark.search.spans import SpanMultiTermQuery, SpanNearQuery

    q = parse_surround("mer* W scan")
    assert isinstance(q, SpanNearQuery)
    assert q.clauses[0] == SpanMultiTermQuery(kind="prefix", pattern="mer")
    q = parse_surround("s?an 2N merge")
    assert q.clauses[0] == SpanMultiTermQuery(kind="wildcard", pattern="s?an")
    assert isinstance(parse_surround("a W a"), SpanNearQuery)
    assert isinstance(parse_surround("3N(a, b, a)"), SpanNearQuery)


def test_surround_end_to_end(spark):
    import numpy as np

    from lucene_spark.index.builder import build_index
    from lucene_spark.search.searcher import IndexSearcher

    rng = np.random.default_rng(9)
    vocab = ["scan", "sort", "merge", "table", "value", "pad"]
    rows = [
        (f"c{i}", 0, " ".join(rng.choice(vocab, size=rng.integers(4, 20)).tolist()))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(df, with_positions=True, build_blocks=True)
    s = IndexSearcher(idx)
    # distance query == the explicit spans API
    got = surround_topk(s, "scan 3W merge", k=10).collect()
    want = span_topk(
        idx,
        SpanNearQuery((SpanTermQuery("scan"), SpanTermQuery("merge")), slop=2),
        k=10,
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
    # Boolean query == the searcher's own Boolean path
    got_b = surround_topk(s, "scan AND merge", k=10).collect()
    want_b = s.search("scan AND merge", k=10).collect()
    assert [tuple(r) for r in got_b] == [tuple(r) for r in want_b]
