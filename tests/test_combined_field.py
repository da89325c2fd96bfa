"""CombinedFieldQuery (BM25F) — ``sandbox/search/CombinedFieldQuery.java``
+ ``MultiNormsLeafSimScorer.java`` over a two-field union index."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.analysis.smallfloat import LENGTH_TABLE, int_to_byte4_np
from lucene_spark.index.builder import build_index, combine_fields
from lucene_spark.search.features import combined_field_topk

AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)

CORPUS = [
    (0, "merge sort", "merge the sorted runs into one output run"),
    (1, "data layout", "columnar data layout helps scan and merge speed"),
    (2, "query plan", "the planner picks a merge join for sorted data"),
    (3, "shuffle", "partitions shuffle data between executors"),
    (4, "metrics", "executor metrics roll up into the web ui"),
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        CORPUS, "doc_id long, title string, body string"
    )
    ti = build_index(
        docs.select("doc_id", F.col("title").alias("text")),
        text_col="text", doc_id_col="doc_id", analyzer=AN, field="title",
    )
    bi = build_index(
        docs.select("doc_id", F.col("body").alias("text")),
        text_col="text", doc_id_col="doc_id", analyzer=AN, field="body",
    )
    return combine_fields(bi, ti)


def _reference_bm25f(idx_rows, terms, weights, k1=1.2, b=0.75):
    """Direct float32 transcription of CombinedFieldWeight +
    MultiNormsLeafSimScorer over collected index tables."""
    import math

    (fstats, tstats, postings, doclens) = idx_rows
    fields = sorted(weights)
    df = 0
    for f in fields:
        for t in sorted(set(terms)):
            st = tstats.get((f, t))
            if st and st[0] > 0:
                df = max(df, st[0])
    dc = max(fstats[f][0] for f in fields if f in fstats)
    sttf = 0
    for f in fields:
        if f in fstats:
            sttf = int(sttf + weights[f] * fstats[f][1])
    avgdl = np.float32(sttf / float(dc))
    idf = np.float32(math.log(1.0 + (dc - df + 0.5) / (df + 0.5)))
    out = {}
    freqs, norms = {}, {}
    for (f, t, d), fr in postings.items():
        if t in terms and f in weights:
            freqs[d] = np.float32(freqs.get(d, np.float32(0.0)) + np.float32(weights[f]) * np.float32(fr))
    for (f, d), nb in doclens.items():
        if f in weights and d in freqs:
            norms[d] = np.float32(norms.get(d, np.float32(0.0)) + np.float32(weights[f]) * np.float32(LENGTH_TABLE[nb]))
    for d, fr in freqs.items():
        rnd = int(np.floor(np.float32(norms[d] + np.float32(0.5))))
        qlen = np.float32(LENGTH_TABLE[int(int_to_byte4_np(np.array([rnd]))[0])])
        inv = np.float32(
            np.float32(1.0)
            / np.float32(
                np.float32(k1)
                * np.float32(
                    np.float32(np.float32(1.0) - np.float32(b))
                    + np.float32(qlen * np.float32(b) / avgdl)
                )
            )
        )
        out[d] = np.float32(idf - np.float32(idf / np.float32(np.float32(1.0) + fr * inv)))
    return out


def test_matches_reference_transcription(spark, idx):
    weights = {"body": 1.0, "title": 2.0}
    terms = ("merge", "data")
    fstats = {
        r["field"]: (int(r["doc_count"]), int(r["sum_total_term_freq"]))
        for r in idx.fieldstats.collect()
    }
    tstats = {
        (r["field"], r["term"]): (int(r["doc_freq"]), int(r["total_term_freq"]))
        for r in idx.termstats.collect()
    }
    postings = {
        (r["field"], r["term"], int(r["doc_id"])): int(r["freq"])
        for r in idx.postings.collect()
    }
    doclens = {
        (r["field"], int(r["doc_id"])): int(r["norm_byte"]) & 0xFF
        for r in idx.doclens.collect()
    }
    want = _reference_bm25f((fstats, tstats, postings, doclens), terms, weights)
    got = {
        int(r["doc_id"]): np.float32(r["score"])
        for r in combined_field_topk(idx, terms, weights, k=10).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == np.float32(want[d]), (d, got[d], want[d])


def test_title_weight_boosts_title_matches(spark, idx):
    """doc 0 has 'merge' in its (short, heavily weighted) title — it must
    outrank body-only matches of equal term count."""
    rows = combined_field_topk(idx, ("merge",), {"body": 1.0, "title": 5.0}, k=5).collect()
    assert rows[0]["doc_id"] == 0


def test_weight_below_one_raises(spark, idx):
    with pytest.raises(ValueError):
        combined_field_topk(idx, ("merge",), {"body": 0.5, "title": 1.0})


def test_absent_terms_empty(spark, idx):
    assert combined_field_topk(idx, ("zzz",), {"body": 1.0, "title": 1.0}).count() == 0
