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
    # 2 edits with transpositions ⇒ 3·2 = 6 removable grams ⇒ threshold ≤ 0
    # for terms with ≤ 6 distinct bigrams ('scan' has 3)
    q = FuzzyQuery("scan", max_edits=2, field="text", transpositions=True)
    assert searcher._fuzzy_candidate_terms(q) is None
    assert searcher.search(q, k=5).count() > 0


def test_default_config_fuzzy_actually_prunes(searcher):
    """The r4-verdict hygiene item: at the Lucene defaults
    (transpositions=true, max_edits=1) the per-operation bound
    grams − 3·max_edits must FIRE for a 5-char query term — 'merge' has 4
    distinct bigrams ⇒ threshold 1 > 0 (the old 2·lev_cap route gave −0)."""
    q = FuzzyQuery("merge", max_edits=1, field="text", transpositions=True)
    cand = searcher._fuzzy_candidate_terms(q)
    assert cand is not None, "bound vacuous at default settings"
    n_cand = cand.count()
    n_vocab = len(_vocab(searcher))
    assert 0 < n_cand < n_vocab
    # and the pruned expansion still finds every true OSA<=1 match
    true = {t for t in _vocab(searcher) if _osa_distance(t, "merge") <= 1}
    got = {r.term for r in cand.collect()}
    assert true <= got


def test_searcher_close_releases_ngram_cache(searcher):
    q = FuzzyQuery("merge", max_edits=1, field="text", transpositions=True)
    searcher._fuzzy_candidate_terms(q).count()
    assert searcher._ngram_index is not None
    searcher.close()
    assert searcher._ngram_index is None
    assert searcher._termstats_memo == {}
    # caches rebuild lazily: the searcher stays usable after close()
    assert searcher.search(q, k=5).count() > 0
