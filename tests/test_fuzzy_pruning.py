"""Fuzzy expansion q-gram pruning: sound (no lost matches), engaged (the
terms-dict scan is bigram-bounded, not a full-vocabulary distance scan),
and result-identical to the unpruned banded scan.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.query import FuzzyQuery
from lucene_spark.search.searcher import IndexSearcher, _osa_distance


@pytest.fixture(scope="module")
def searcher(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(
        docs,
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        doc_id_col="doc_id",
    ).persist()
    yield IndexSearcher(idx)
    idx.unpersist()


def _vocab(searcher):
    return [
        r.term
        for r in searcher.index.termstats.filter(F.col("field") == "text")
        .select("term")
        .collect()
    ]


def test_pruned_candidates_superset_of_true_matches(searcher):
    vocab = _vocab(searcher)
    for qterm, e, transp in [
        ("merge", 1, True),
        ("partition", 2, True),
        ("stream", 1, False),
        ("window", 2, False),
    ]:
        q = FuzzyQuery(qterm, max_edits=e, field="text", transpositions=transp)
        cand = searcher._fuzzy_candidate_terms(q)
        if cand is None:  # vacuous bound: full-scan fallback, nothing to check
            continue
        cand_terms = {r.term for r in cand.collect()}
        true = {
            t
            for t in vocab
            if (_osa_distance(t, qterm) if transp else _lev(t, qterm)) <= e
        }
        assert true <= cand_terms, f"{qterm}: pruning lost {true - cand_terms}"
        # and it actually prunes: candidates must be well below the vocab
        assert len(cand_terms) < len(vocab)


def _lev(a, b):
    m, n = len(a), len(b)
    d = np.arange(n + 1)
    for i in range(1, m + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, n + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[n])


def test_pruned_expansion_identical_to_full_scan(searcher):
    q = FuzzyQuery("merge", max_edits=1, field="text", transpositions=True)
    pruned = searcher.search(q, k=10).collect()
    # force the fallback full scan by disabling the ngram path
    orig = searcher._fuzzy_candidate_terms
    searcher._fuzzy_candidate_terms = lambda _q: None
    try:
        full = searcher.search(q, k=10).collect()
    finally:
        searcher._fuzzy_candidate_terms = orig
    assert [tuple(r) for r in pruned] == [tuple(r) for r in full]


def test_vacuous_bound_falls_back(searcher):
    # 2 edits with transpositions ⇒ lev cap 4 ⇒ threshold ≤ 0 for short terms
    q = FuzzyQuery("scan", max_edits=2, field="text", transpositions=True)
    assert searcher._fuzzy_candidate_terms(q) is None
    assert searcher.search(q, k=5).count() > 0
