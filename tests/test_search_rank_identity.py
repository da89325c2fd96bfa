"""Rank-identity: distributed searcher == brute-force oracle (CheckHits).

Every query must return identical docIDs, bit-equal float32 scores, and the
same (score DESC, docID ASC) order as the independent in-memory oracle.
"""

import pytest

from lucene_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.oracle import BruteForceIndex
from lucene_spark.search.parser import parse
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
)
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.sources.transcripts import synth_transcripts

ANALYZER = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


@pytest.fixture(scope="module")
def corpus(spark):
    df = synth_transcripts(spark, n_convs=150, seed=7).persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def searcher(spark, corpus):
    idx = build_index(corpus, analyzer=ANALYZER, num_segments=6).persist()
    return IndexSearcher(idx)


@pytest.fixture(scope="module")
def oracle(spark, corpus, searcher):
    dm = searcher.index.docmap.select("doc_id", "text").collect()
    return BruteForceIndex([(r["doc_id"], r["text"]) for r in dm], analyzer=ANALYZER)


QUERIES = [
    TermQuery("spark"),
    TermQuery("water"),
    TermQuery("posting"),
    TermQuery("zzz-absent-term"),
    BooleanQuery.build(must=[TermQuery("spark"), TermQuery("index")]),
    BooleanQuery.build(should=[TermQuery("spark"), TermQuery("vector")]),
    BooleanQuery.build(
        must=[TermQuery("query")], must_not=[TermQuery("spark")]
    ),
    BooleanQuery.build(
        should=[TermQuery("index"), TermQuery("token"), TermQuery("merge")],
        minimum_should_match=2,
    ),
    BooleanQuery.build(must=[TermQuery("score")], filter=[TermQuery("batch")]),
    BoostQuery(TermQuery("segment"), 2.5),
    BooleanQuery.build(
        must=[BoostQuery(TermQuery("shard"), 3.0)], should=[TermQuery("rank")]
    ),
    SynonymQuery(("spark", "index")),
    DisjunctionMaxQuery((TermQuery("spark"), TermQuery("stream")), 0.3),
    DisjunctionMaxQuery((TermQuery("filter"), TermQuery("join")), 0.0),
    TermInSetQuery(("spark", "vector", "nonexistent")),
    MatchAllDocsQuery(),
]


@pytest.mark.parametrize("k", [1, 10, 100])
@pytest.mark.parametrize("query", QUERIES, ids=lambda q: type(q).__name__ + str(hash(q) % 9973))
def test_rank_identity(searcher, oracle, query, k):
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.search(query, k=k).orderBy("rank").collect()
    ]
    want = oracle.topk(query, k=k)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == [s for _, s in want]  # bit-equal float32


def test_count_matches_oracle(searcher, oracle):
    for q in [TermQuery("spark"), BooleanQuery.build(should=[TermQuery("spark"), TermQuery("water")])]:
        assert searcher.count(q) == oracle.count(q)


PARSED = [
    ("spark", TermQuery("spark")),
    ("spark AND index", BooleanQuery.build(must=[TermQuery("spark"), TermQuery("index")])),
    ("spark OR vector", BooleanQuery.build(should=[TermQuery("spark"), TermQuery("vector")])),
    (
        "query AND NOT spark",
        BooleanQuery.build(must=[TermQuery("query")], must_not=[TermQuery("spark")]),
    ),
    (
        "(index OR token) AND merge",
        BooleanQuery.build(
            must=[
                BooleanQuery.build(should=[TermQuery("index"), TermQuery("token")]),
                TermQuery("merge"),
            ]
        ),
    ),
    ("segment^2.5", BoostQuery(TermQuery("segment"), 2.5)),
]


@pytest.mark.parametrize("text,expected", PARSED, ids=[t for t, _ in PARSED])
def test_parser_and_parity_with_oracle(searcher, oracle, text, expected):
    q = parse(text, analyzer=ANALYZER)
    assert q == expected
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.search(text, k=10).orderBy("rank").collect()
    ]
    want = oracle.topk(expected, k=10)
    assert got == [(d, s) for d, s in want]


def test_stopword_clause_drops(searcher):
    from lucene_spark.search.query import rewrite_to_fixpoint

    q = parse("the AND spark", analyzer=ANALYZER)
    # "the" analyzes to nothing -> clause dropped; rewrite unwraps the
    # remaining 1-clause boolean (BooleanQuery.java:269-340)
    assert rewrite_to_fixpoint(q) == TermQuery("spark")


def test_multiterm_expansion(searcher, oracle):
    from lucene_spark.search.query import ConstantScoreQuery, PrefixQuery

    q = PrefixQuery("wat")  # water, ...
    res = searcher.search(q, k=50).collect()
    expanded_terms = tuple(
        sorted(t for t in oracle.tf if t.startswith("wat"))
    )
    want = oracle.topk(ConstantScoreQuery(TermInSetQuery(expanded_terms), 1.0), k=50)
    got = [(r["doc_id"], r["score"]) for r in sorted(res, key=lambda r: r["rank"])]
    assert got == want
