"""Pluggable Similarity families: Classic TF-IDF, Boolean, BM25 default."""

import math

import numpy as np
import pytest

from lucene_spark.analysis.smallfloat import int_to_byte4_np
from lucene_spark.index.builder import build_index
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.similarities import (
    BM25Similarity,
    BooleanSimilarity,
    ClassicSimilarity,
    resolve,
)


def test_resolve():
    assert isinstance(resolve("bm25"), BM25Similarity)
    assert isinstance(resolve("classic"), ClassicSimilarity)
    assert isinstance(resolve("boolean"), BooleanSimilarity)
    s = ClassicSimilarity()
    assert resolve(s) is s


def test_classic_leaf_math():
    sim = ClassicSimilarity()
    doc_count, doc_freq = 100, 10
    leaf = sim.leaf_scorer(1.0, doc_freq, doc_count, 1000)
    freq = np.array([4.0], dtype=np.float32)
    norm = int_to_byte4_np(np.array([16]))  # doc length 16
    got = leaf.score(freq, norm)[0]
    idf = np.float32(math.log(101 / 11.0) + 1.0)
    want = np.float32(np.float32(idf * np.float32(2.0)) * np.float32(1.0 / 4.0))
    assert got == want  # sqrt(4)=2, lengthNorm = 1/sqrt(16)


def test_boolean_leaf_constant():
    leaf = BooleanSimilarity().leaf_scorer(2.5, 1, 10, 100)
    out = leaf.score(np.array([1, 7, 30], dtype=np.float32), np.array([3, 9, 100]))
    assert out.tolist() == [np.float32(2.5)] * 3


@pytest.fixture(scope="module")
def idx(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    rows = [
        ("c0", 0, "apple banana apple"),
        ("c0", 1, "apple cherry"),
        ("c1", 0, "banana banana banana cherry date elderberry fig grape"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    i = build_index(df, num_segments=1).persist()
    yield i
    i.unpersist()


def test_classic_end_to_end(idx):
    s = IndexSearcher(idx, similarity="classic")
    hits = s.search("apple", k=5).collect()
    assert len(hits) == 2
    # doc with freq=2, len=3 outranks freq=1, len=2:
    # sqrt(2)/sqrt(3) = 0.816 > 1/sqrt(2) = 0.707
    dm = {(r.conv_id, r.turn_idx): r.doc_id for r in idx.docmap.collect()}
    assert hits[0].doc_id == dm[("c0", 0)]
    # hand-check the top score
    idf = np.float32(math.log((3 + 1) / (2 + 1.0)) + 1.0)
    tf = np.float32(math.sqrt(2.0))
    nrm = np.float32(1.0 / math.sqrt(3.0))
    assert np.float32(hits[0].score) == np.float32(np.float32(idf * tf) * nrm)


def test_boolean_end_to_end(idx):
    s = IndexSearcher(idx, similarity="boolean")
    hits = s.search("banana", k=5).collect()
    assert [r.score for r in hits] == [1.0, 1.0]
    assert hits[0].doc_id < hits[1].doc_id  # constant score → docID order


def test_lmdirichlet_end_to_end(idx):
    s = IndexSearcher(idx, similarity="lmdirichlet")
    hits = s.search("banana", k=5).collect()
    assert len(hits) == 2
    # hand-check top score: LMDirichletSimilarity.java:76-82
    st = {
        (r.field, r.term): (r.doc_freq, r.total_term_freq)
        for r in idx.termstats.collect()
    }
    df_, ttf = st[("text", "banana")]
    doc_count, sttf = (
        idx.fieldstats.collect()[0]["doc_count"],
        idx.fieldstats.collect()[0]["sum_total_term_freq"],
    )
    mu, p = 2000.0, (ttf + 1.0) / (sttf + 1.0)
    # top doc: freq=3, len=8
    want = np.float32(math.log(1 + 3.0 / (mu * p)) + math.log(mu / (8.0 + mu)))
    assert np.float32(hits[0].score) == want
    # scores are non-negative by the clamp
    assert all(h.score >= 0 for h in hits)


def test_bm25_default_unchanged(idx):
    a = [(r.doc_id, r.score) for r in IndexSearcher(idx).search("apple", k=5).collect()]
    b = [
        (r.doc_id, r.score)
        for r in IndexSearcher(idx, similarity=BM25Similarity()).search("apple", k=5).collect()
    ]
    assert a == b
