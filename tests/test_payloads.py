"""Payloads (round 5): per-position float32 payloads indexed by an analyzer
``payload_fn`` (``FieldInfo.storePayloads`` / the .pay postings section),
scored by ``PayloadScoreQuery`` analogs and filtered inside the intervals
algebra via ``IPayloadFilteredTerm`` (``Intervals.java:82-90``); persisted
through the on-disk segment layout with the stamp-once schema rule.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.analysis.filters import (
    position_payload,
    token_length_payload,
    token_offset_payload,
)
from lucene_spark.index.builder import build_index
from lucene_spark.search.intervals import (
    IMaxWidth,
    IOrdered,
    IPayloadFilteredTerm,
    ITerm,
    eval_intervals,
    interval_topk,
    interval_topk_wand,
    leaf_terms,
    min_extent,
    normalize,
    payload_terms,
    required_terms,
)
from lucene_spark.search.payloads import payload_score_topk

DOCS = [
    (0, "merge sort is a merge of runs"),
    (1, "the quick merge"),
    (2, "data flows then merge happens late in the data stream"),
    (3, "no match here"),
]


@pytest.fixture(scope="module")
def pay_idx(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    an = StandardAnalyzer(
        stop_words=ENGLISH_STOP_WORDS, payload_fn=token_offset_payload
    )
    return build_index(
        df, doc_id_col="doc_id", analyzer=an, with_positions=True,
        build_blocks=True,
    ).persist()


def test_analyzer_payload_stream():
    an = StandardAnalyzer(
        stop_words=ENGLISH_STOP_WORDS, payload_fn=token_offset_payload
    )
    out = an.analyze_with_payloads("merge sort is a merge of runs")
    # stops leave position holes; payload = raw start offset
    assert out == [
        ("merge", 0, 0, 5, 0.0),
        ("sort", 1, 6, 10, 6.0),
        ("merge", 4, 16, 21, 16.0),
        ("runs", 6, 25, 29, 25.0),
    ]
    an2 = StandardAnalyzer(payload_fn=position_payload)
    assert [p[4] for p in an2.analyze_with_payloads("a b c")] == [0.0, 1.0, 2.0]
    an3 = StandardAnalyzer(payload_fn=token_length_payload)
    assert [p[4] for p in an3.analyze_with_payloads("ab cdef")] == [2.0, 4.0]


def test_analyzer_payload_errors(spark):
    an = StandardAnalyzer()
    with pytest.raises(ValueError, match="payload_fn"):
        an.analyze_with_payloads("x")
    with pytest.raises(ValueError, match="payload op"):
        IPayloadFilteredTerm("x", "!=", 1.0)
    # payload_fn + whole-stream filters must fail fast on the DRIVER, not
    # inside an executor UDF mid-build
    def shingle(stream):
        return stream

    bad = StandardAnalyzer(
        payload_fn=token_offset_payload, stream_filters=(shingle,)
    )
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="whole-stream"):
        build_index(df, doc_id_col="doc_id", analyzer=bad, with_positions=True)


def test_positions_table_carries_aligned_payloads(pay_idx):
    rows = pay_idx.positions.collect()
    assert all(len(r["payloads"]) == len(r["positions"]) for r in rows)
    m = {(r["term"], r["doc_id"]): list(r["payloads"]) for r in rows}
    assert m[("merge", 0)] == [0.0, 16.0]
    assert m[("data", 2)] == [0.0, 42.0]
    # offsets still present (with_offsets default) and aligned
    assert all(len(r["start_offsets"]) == len(r["positions"]) for r in rows)


@pytest.mark.parametrize(
    "fn,expected",
    [
        ("max", {0: 16.0, 1: 10.0, 2: 16.0}),
        ("min", {0: 0.0, 1: 10.0, 2: 16.0}),
        ("sum", {0: 16.0, 1: 10.0, 2: 16.0}),
        ("avg", {0: 8.0, 1: 10.0, 2: 16.0}),
    ],
)
def test_payload_score_functions(pay_idx, fn, expected):
    got = {
        r["doc_id"]: r["score"]
        for r in payload_score_topk(pay_idx, "merge", fn, k=10).collect()
    }
    assert got == expected


def test_payload_score_rejects(pay_idx, spark):
    with pytest.raises(ValueError, match="payload function"):
        payload_score_topk(pay_idx, "merge", "median")
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plain = build_index(
        df, doc_id_col="doc_id", analyzer=StandardAnalyzer(),
        with_positions=True,
    )
    with pytest.raises(ValueError, match="payload-indexed"):
        payload_score_topk(plain, "merge", "max")
    with pytest.raises(ValueError, match="payload-indexed"):
        interval_topk(plain, IPayloadFilteredTerm("merge", "<", 10.0))


def test_eval_payload_filtered_leaf():
    pm = {"t": np.array([1, 4, 9], dtype=np.int64)}
    wm = {"t": np.array([5.0, 20.0, 40.0], dtype=np.float32)}
    s, e, g = eval_intervals(IPayloadFilteredTerm("t", "<=", 20.0), pm, wm)
    assert list(s) == [1, 4] and list(e) == [1, 4]
    s, _, _ = eval_intervals(IPayloadFilteredTerm("t", ">", 20.0), pm, wm)
    assert list(s) == [9]
    s, _, _ = eval_intervals(IPayloadFilteredTerm("t", "==", 20.0), pm, wm)
    assert list(s) == [4]
    # missing paymap is an explicit error, not a silent full-match
    with pytest.raises(ValueError, match="payload-indexed"):
        eval_intervals(IPayloadFilteredTerm("t", "<", 1.0), pm, None)


def test_tree_helpers_see_payload_leaf():
    node = IMaxWidth(
        8, IOrdered((IPayloadFilteredTerm("a", "<", 9.0), ITerm("b")))
    )
    assert leaf_terms(node) == {"a", "b"}
    assert required_terms(node) == {"a", "b"}
    assert payload_terms(node) == {"a"}
    assert min_extent(node) == 2
    assert normalize(node) == node  # leaf passes through untouched


def test_payload_filtered_interval_query(pay_idx):
    # merge occurrences in the first 10 chars: only doc 0 (offset 0)
    out = interval_topk(
        pay_idx, IPayloadFilteredTerm("merge", "<", 10.0), k=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == [(0, 0.5)]


def test_payload_filtered_composed_and_wand_delegates(pay_idx):
    node = IMaxWidth(
        12, IOrdered((IPayloadFilteredTerm("data", "<", 5.0), ITerm("merge")))
    )
    flat = interval_topk(pay_idx, node, k=10).collect()
    # doc 2: data kept at pos 0 only (payload 0 < 5 drops pos 8),
    # merge at pos 3 -> one [0,3] interval, freq 1/3, sat 0.25
    assert [(r["doc_id"], float(np.float32(r["score"]))) for r in flat] == [
        (2, 0.25)
    ]
    kern = interval_topk_wand(pay_idx, node, k=10).collect()
    assert [tuple(r) for r in kern] == [tuple(r) for r in flat]


def test_check_index_payload_invariant(pay_idx):
    from lucene_spark.index.segments import check_index

    report = check_index(pay_idx)
    assert report["payloads_aligned"] is True


def test_ondisk_payload_roundtrip(spark, tmp_path):
    from lucene_spark.index.segments import build_segments, read_index
    from lucene_spark.sources.transcripts import synth_transcripts

    src = synth_transcripts(spark, n_convs=30, seed=7, num_partitions=2)
    an = StandardAnalyzer(payload_fn=token_offset_payload)
    d = str(tmp_path / "payidx")
    plan = build_segments(src, d, num_segments=2, analyzer=an, with_positions=True)
    assert plan["positions"]["store_payloads"] is True
    idx = read_index(spark, d)
    assert "payloads" in idx.positions.columns
    # the payload score's positions scan carries the tbucket partition
    # filter (terms-dictionary pruning, same as phrase/interval scans)
    pq = idx.positions_for_terms("text", ["the"])
    assert "tbucket" in pq._jdf.queryExecution().executedPlan().toString()
    disk = payload_score_topk(idx, "the", "max", k=5).collect()
    mem = payload_score_topk(
        build_index(src, analyzer=an, with_positions=True, num_segments=2),
        "the",
        "max",
        k=5,
    ).collect()
    assert [tuple(r) for r in disk] == [tuple(r) for r in mem]
    # the stamp-once rule: resuming with a payload-less analyzer refuses
    with pytest.raises(ValueError, match="store_payloads"):
        build_segments(
            src, d, num_segments=2, analyzer=StandardAnalyzer(),
            with_positions=True,
        )


def test_check_index_offsets_invariant(pay_idx):
    from lucene_spark.index.segments import check_index

    report = check_index(pay_idx)
    assert report["offsets_consistent"] is True
