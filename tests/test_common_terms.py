"""CommonTermsQuery (``queries/CommonTermsQuery.java``)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.features import common_terms_query
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    MatchNoDocsQuery,
    Occur,
    TermQuery,
)

AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


@pytest.fixture(scope="module")
def idx(spark):
    # "common" in 4/5 docs; "rare" in 1
    docs = spark.createDataFrame(
        [
            (0, "common rare merge"),
            (1, "common merge"),
            (2, "common join"),
            (3, "common scan"),
            (4, "other words"),
        ],
        "doc_id long, text string",
    )
    return build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)


def _groups(q):
    """(low terms, low occur, low msm, high terms, high occur) of the
    rewritten tree (None when the group is absent)."""
    low = high = None
    for c in q.clauses:
        inner = c.query.query  # BoostQuery wrapper
        terms = tuple(cl.query.term for cl in inner.clauses)
        if c.occur == Occur.MUST:
            low = (terms, inner.clauses[0].occur, inner.minimum_should_match)
        else:
            high = (terms, inner.clauses[0].occur)
    return low, high


def test_frequency_split(idx):
    # relative cutoff 0.5 * 5 docs -> df > 3 is high: "common" (4) high,
    # "rare" (1) and the absent "ghost" low
    q = common_terms_query(idx, ["common", "rare", "ghost"], max_term_frequency=0.5)
    low, high = _groups(q)
    assert low == (("rare", "ghost"), Occur.SHOULD, 0)
    assert high == (("common",), Occur.SHOULD)


def test_high_only_upgrades_to_conjunction(idx):
    # all terms high -> the high group becomes a MUST conjunction
    q = common_terms_query(idx, ["common", "merge"], max_term_frequency=0.2)
    assert len(q.clauses) == 1 and q.clauses[0].occur == Occur.SHOULD
    inner = q.clauses[0].query.query
    assert all(c.occur == Occur.MUST for c in inner.clauses)


def test_fractional_msm(idx):
    q = common_terms_query(
        idx,
        ["rare", "ghost", "zeta"],
        max_term_frequency=0.9,
        low_freq_min_should_match=0.5,
    )
    low, high = _groups(q)
    # round(0.5 * 3) = 2
    assert low[2] == 2 and high is None


def test_edge_shapes(idx):
    assert common_terms_query(idx, []) == MatchNoDocsQuery()
    assert common_terms_query(idx, ["solo"]) == TermQuery("solo", "text")
    with pytest.raises(ValueError):
        common_terms_query(idx, ["x", "y"], low_freq_occur=Occur.MUST_NOT)


def test_scoring_recall_gated_by_rare_term(spark, idx):
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(idx)
    q = common_terms_query(idx, ["common", "rare"], max_term_frequency=0.5)
    hits = s.search(q, k=10).collect()
    # only doc 0 contains "rare"; "common" boosts but cannot match alone
    assert [r["doc_id"] for r in hits] == [0]
