"""BM25 float32-parity tests.

Golden expectations are computed by independently re-deriving the formulas
from BM25Similarity.java:100-117,180-184,217-233 with explicit float32 steps,
and cross-checked against DuckDB FLOAT arithmetic (IEEE-754 single) which the
correctness oracle uses.
"""

import math

import numpy as np
import pytest

from lucene_spark.analysis import smallfloat as sf
from lucene_spark.search import bm25


def test_idf_is_float32_of_double_log():
    for df, n in [(1, 1), (1, 2), (17, 500), (499, 500), (3, 10**9)]:
        expected = np.float32(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        got = bm25.idf(df, n)
        assert got.dtype == np.float32
        assert np.float32(got) == expected


def test_avgdl_double_divide_then_float_cast():
    assert bm25.avgdl(1000003, 37) == np.float32(1000003 / 37.0)


def test_cache_entries_float32_op_order():
    avg = bm25.avgdl(52341, 1000)
    cache = bm25.norm_inverse_cache(avg)
    assert cache.dtype == np.float32
    k1, b, one = np.float32(1.2), np.float32(0.75), np.float32(1)
    for i in [0, 1, 24, 100, 255]:
        dl = np.float32(sf.byte4_to_int(i))
        expected = one / (k1 * ((one - b) + b * dl / avg))
        assert cache[i] == expected


def test_score_formula_and_monotonicity():
    scorer = bm25.BM25Scorer(doc_freq=17, doc_count=500, sum_total_term_freq=26170)
    # manual expansion
    w = scorer.weight
    norm_byte = sf.int_to_byte4(40)
    inv = scorer.cache[norm_byte]
    expected = w - w / (np.float32(1) + np.float32(3) * inv)
    got = scorer.score(np.array([3]), np.array([norm_byte]))
    assert got.dtype == np.float32
    assert got[0] == expected
    # monotonic in freq, anti-monotonic in doc length
    freqs = np.arange(1, 50)
    s = scorer.score(freqs, np.full(49, norm_byte))
    assert np.all(np.diff(s) >= 0)
    lens = np.array([sf.int_to_byte4(l) for l in [1, 10, 40, 100, 1000]])
    s2 = scorer.score(np.full(5, 3), lens)
    assert np.all(np.diff(s2) <= 0)
    # positive, finite, bounded by weight
    assert np.all(s > 0) and np.all(np.isfinite(s)) and np.all(s < w)


def test_duckdb_float_oracle_agreement():
    """The DuckDB-SQL oracle math must reproduce our float32 scores bit-exactly."""
    duckdb = pytest.importorskip("duckdb")
    df_, n, sttf = 17, 500, 26170
    scorer = bm25.BM25Scorer(doc_freq=df_, doc_count=n, sum_total_term_freq=sttf)
    norm_byte = sf.int_to_byte4(40)
    quant_len = sf.byte4_to_int(norm_byte)
    ours = float(scorer.score(np.array([3]), np.array([norm_byte]))[0])
    sql = f"""
    WITH s AS (
      SELECT CAST(ln(1 + ({n} - {df_} + 0.5)/({df_} + 0.5)) AS FLOAT) AS w,
             CAST({sttf} / CAST({n} AS DOUBLE) AS FLOAT) AS avgdl
    )
    SELECT w - w / (CAST(1 AS FLOAT) + CAST(3 AS FLOAT) *
           (CAST(1 AS FLOAT) / (CAST(1.2 AS FLOAT) *
            ((CAST(1 AS FLOAT) - CAST(0.75 AS FLOAT)) +
              CAST(0.75 AS FLOAT) * CAST({quant_len} AS FLOAT) / avgdl))))
    FROM s
    """
    theirs = duckdb.sql(sql).fetchone()[0]
    assert ours == theirs


def test_sum_idf_double_accumulation():
    idfs = [bm25.idf(3, 100), bm25.idf(7, 100), bm25.idf(50, 100)]
    expected = np.float32(float(idfs[0]) + float(idfs[1]) + float(idfs[2]))
    assert bm25.sum_idf(idfs) == expected
