"""CoveringQuery — per-document minimum-should-match
(``sandbox/search/CoveringQuery.java``, ``CoveringScorer.java``)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.query import CoveringQuery, MatchNoDocsQuery, PrefixQuery, TermQuery
from lucene_spark.search.searcher import IndexSearcher

AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


@pytest.fixture(scope="module")
def searcher(spark):
    docs = spark.createDataFrame(
        [
            # (doc_id, text, min_match): per-doc required clause count
            (0, "alpha beta gamma", 1),
            (1, "alpha beta gamma", 2),
            (2, "alpha beta gamma", 3),
            (3, "alpha beta gamma", 4),  # only 3 clauses can match
            (4, "alpha delta zeta", 2),  # 1 match < 2 required
            (5, "alpha beta zeta", 2),  # 2 matches
            (6, "alpha beta gamma", None),  # NULL source: never matches
            (7, "alpha beta gamma", 0),  # < 1 treated as 1
        ],
        "doc_id long, text string, min_match long",
    )
    idx = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)
    return IndexSearcher(idx)


def _q(min_expr="min_match"):
    return CoveringQuery(
        queries=tuple(TermQuery(t, "text") for t in ("alpha", "beta", "gamma")),
        min_match_expr=min_expr,
    )


def test_per_doc_threshold_and_null(searcher):
    hits = {r["doc_id"] for r in searcher.search(_q(), k=20).collect()}
    # 3 can't reach 4 matches; 4 has 1 < 2; 6 is NULL; 7's 0 acts as 1
    assert hits == {0, 1, 2, 5, 7}


def test_score_equals_should_sum(searcher):
    """A doc accepted by the threshold scores exactly like the plain
    SHOULD disjunction of the same clauses (CoveringScorer sums the
    matching clauses' floats in double, cast float)."""
    from lucene_spark.search.query import BooleanQuery

    cov = {
        r["doc_id"]: r["score"] for r in searcher.search(_q(), k=20).collect()
    }
    bq = BooleanQuery.build(
        should=[TermQuery(t, "text") for t in ("alpha", "beta", "gamma")]
    )
    dis = {
        r["doc_id"]: r["score"] for r in searcher.search(bq, k=20).collect()
    }
    for d, s in cov.items():
        assert s == dis[d]


def test_expression_source_and_multiterm(searcher):
    # constant expression "2": docs with >= 2 matching clauses; multiterm
    # subqueries expand through the usual rewrite before scoring
    q = CoveringQuery(
        queries=(
            PrefixQuery("al", "text"),
            TermQuery("beta", "text"),
            TermQuery("gamma", "text"),
        ),
        min_match_expr="2",
    )
    hits = {r["doc_id"] for r in searcher.search(q, k=20).collect()}
    assert hits == {0, 1, 2, 3, 5, 6, 7}


def test_rewrite_drops_no_match_children(searcher):
    q = CoveringQuery(
        queries=(TermQuery("alpha", "text"), MatchNoDocsQuery()),
        min_match_expr="1",
    )
    assert searcher.search(q, k=20).count() == 8
    q_none = CoveringQuery(queries=(MatchNoDocsQuery(),), min_match_expr="1")
    assert searcher.search(q_none, k=20).count() == 0
