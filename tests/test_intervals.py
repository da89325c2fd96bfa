"""Minimal intervals (ordered/unordered NEAR): unit + end-to-end + oracle.

Checks the minimal-interval semantics (OrderedIntervalsSource /
UnorderedIntervalsSource), the IntervalScorer float32 freq accumulation,
and Spark-vs-DuckDB parity of the gate oracle SQL.
"""

import numpy as np
import pytest

from lucene_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.intervals import (
    interval_freq,
    interval_near_topk,
    ordered_interval_lengths,
    unordered_interval_lengths,
)


def test_ordered_minimal_intervals():
    # A=[0,3], B=[2,5]: minimal ordered pairs (0,2) and (3,5)
    assert ordered_interval_lengths([0, 3], [2, 5]).tolist() == [3, 3]
    # A=[0,1], B=[2]: (0,2) contains a'=1 → only (1,2) is minimal
    assert ordered_interval_lengths([0, 1], [2]).tolist() == [2]
    # B before all A: nothing
    assert ordered_interval_lengths([5], [1]).tolist() == []
    # width filter
    assert ordered_interval_lengths([0], [4], max_width=3).tolist() == []
    assert ordered_interval_lengths([0], [4], max_width=5).tolist() == [5]


def test_unordered_minimal_intervals():
    # A=[0,9], B=[5]: adjacent opposite-type pairs (0,5) and (5,9)
    assert unordered_interval_lengths([0, 9], [5]).tolist() == [6, 5]
    # A=[0,1], B=[5]: (0,5) contains a'=1 → only (1,5)
    assert unordered_interval_lengths([0, 1], [5]).tolist() == [5]


def test_interval_freq_float32_accumulation():
    # freq = (float)(freq + 1.0/max(len-1, 1)) sequentially
    lens = np.array([2, 3, 5])
    want = np.float32(0.0)
    for ln in (2, 3, 5):
        want = np.float32(np.float64(want) + 1.0 / max(ln - 1, 1))
    assert interval_freq(lens) == want
    assert interval_freq(np.array([], dtype=np.int64)) == np.float32(0.0)


@pytest.fixture(scope="module")
def idx(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    rows = [
        ("c0", 0, "alpha beta gamma"),          # ordered (0,1): len 2
        ("c0", 1, "beta alpha"),                 # unordered only
        ("c1", 0, "alpha x x x x x x x beta"),   # len 9: width-gated
        ("c1", 1, "gamma delta"),                # no match
        ("c2", 0, "alpha beta alpha beta"),      # two ordered minimal pairs
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    i = build_index(
        df,
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        num_segments=2,
        with_positions=True,
    ).persist()
    yield i
    i.unpersist()


def test_interval_near_topk_end_to_end(idx):
    dm = {r.doc_id: (r.conv_id, r.turn_idx) for r in idx.docmap.collect()}

    hits = interval_near_topk(idx, "alpha", "beta", k=10, max_width=4).collect()
    got = {dm[r.doc_id]: r.score for r in hits}
    assert set(got) == {("c0", 0), ("c2", 0)}
    # c2/0 has two len-2 intervals: freq = f32(1.0) then f32(1+1) = 2
    # score = 1 - 1/(1+2) = 0.666..; c0/0 freq 1 → 0.5
    assert got[("c0", 0)] == np.float32(1.0) - np.float32(1.0) / np.float32(2.0)
    f2 = np.float32(np.float64(np.float32(1.0)) + 1.0)
    assert got[("c2", 0)] == np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + f2)

    # no width cap: the len-9 doc joins at rank bottom
    all_hits = interval_near_topk(idx, "alpha", "beta", k=10).collect()
    assert {dm[r.doc_id] for r in all_hits} == {("c0", 0), ("c1", 0), ("c2", 0)}

    # unordered picks up the reversed doc too
    un = interval_near_topk(idx, "alpha", "beta", k=10, max_width=4, ordered=False).collect()
    assert {dm[r.doc_id] for r in un} == {("c0", 0), ("c0", 1), ("c2", 0)}


def test_interval_oracle_parity_sf0001(spark):
    """Spark interval query ≡ DuckDB oracle on the real test corpus."""
    import duckdb

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    from lucene_spark.oracle_sql import interval_ordered_near_topk_sql

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    idx = build_index(
        docs,
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        doc_id_col="doc_id",
        with_positions=True,
    )
    sdf = interval_near_topk(idx, "merge", "join", k=10, max_width=8)
    srows = sorted((r.doc_id, r.score, r.rank) for r in sdf.collect())
    sql = interval_ordered_near_topk_sql("merge", "join", 8, 10)
    drows = sorted(
        (int(d), float(np.float32(s)), int(rk))
        for d, s, rk in con.execute(sql).fetchall()
    )
    assert len(srows) == len(drows) > 0
    assert srows == drows
