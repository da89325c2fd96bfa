"""Spans API over the intervals algebra: translation, new-combinator
semantics (brute-force cross-check), and end-to-end top-k."""

import numpy as np
import pytest

from lucene_spark.index.builder import build_index
from lucene_spark.search.intervals import (
    IContaining,
    IFirst,
    IMaxGaps,
    INonOverlapping,
    IOr,
    IOrdered,
    ITerm,
    IUnordered,
    eval_intervals,
    interval_topk,
)
from lucene_spark.search.spans import (
    SpanBoostQuery,
    SpanContainingQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    SpanWithinQuery,
    span_topk,
    to_interval_source,
)


def test_translation_shapes():
    near = SpanNearQuery(
        (SpanTermQuery("a"), SpanTermQuery("b"), SpanTermQuery("c")),
        slop=3,
        in_order=True,
    )
    src = to_interval_source(near)
    assert src == IMaxGaps(3, IOrdered((ITerm("a"), ITerm("b"), ITerm("c"))))
    un = to_interval_source(
        SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), 1, False)
    )
    assert un == IMaxGaps(1, IUnordered((ITerm("a"), ITerm("b"))))
    snot = to_interval_source(
        SpanNotQuery(near, SpanTermQuery("x"), pre=1, post=2)
    )
    assert isinstance(snot, INonOverlapping)
    assert (snot.pre, snot.post) == (1, 2)
    assert to_interval_source(SpanFirstQuery(SpanTermQuery("a"), 5)) == IFirst(
        5, ITerm("a")
    )
    cont = to_interval_source(SpanContainingQuery(near, SpanTermQuery("x")))
    assert isinstance(cont, IContaining)
    within = to_interval_source(SpanWithinQuery(near, SpanTermQuery("x")))
    # within: the little spans are the output
    assert within.small == ITerm("x")
    orq = to_interval_source(SpanOrQuery((SpanTermQuery("a"), SpanTermQuery("b"))))
    assert orq == IOr((ITerm("a"), ITerm("b")))


def _brute(node, pm):
    """Quadratic reference semantics for the three new combinators."""
    if isinstance(node, IContaining):
        bs, be, bg = eval_intervals(node.big, pm)
        ss, se, _ = eval_intervals(node.small, pm)
        keep = [
            i
            for i in range(len(bs))
            if any(ss[j] >= bs[i] and se[j] <= be[i] for j in range(len(ss)))
        ]
        return bs[keep], be[keep], bg[keep]
    if isinstance(node, INonOverlapping):
        ms, me, mg = eval_intervals(node.minuend, pm)
        bs, be, _ = eval_intervals(node.subtrahend, pm)
        keep = [
            i
            for i in range(len(ms))
            if not any(
                bs[j] <= me[i] + node.post and be[j] >= ms[i] - node.pre
                for j in range(len(bs))
            )
        ]
        return ms[keep], me[keep], mg[keep]
    if isinstance(node, IFirst):
        s, e, g = eval_intervals(node.sub, pm)
        m = e < node.n
        return s[m], e[m], g[m]
    raise TypeError


VOCAB = ["a", "b", "c", "x"]


def test_new_combinators_match_bruteforce():
    rng = np.random.default_rng(23)
    shapes = [
        IContaining(IOrdered((ITerm("a"), ITerm("b"))), ITerm("x")),
        IContaining(
            IUnordered((ITerm("a"), ITerm("b"))), IOrdered((ITerm("x"), ITerm("c")))
        ),
        INonOverlapping(IOrdered((ITerm("a"), ITerm("b"))), ITerm("x")),
        INonOverlapping(
            IOrdered((ITerm("a"), ITerm("b"))), ITerm("x"), pre=2, post=1
        ),
        INonOverlapping(
            IUnordered((ITerm("a"), ITerm("c"))),
            IOrdered((ITerm("x"), ITerm("b"))),
        ),
        IFirst(4, IOrdered((ITerm("a"), ITerm("b")))),
    ]
    for _ in range(300):
        pm = {
            t: np.unique(rng.integers(0, 25, size=rng.integers(0, 7)))
            for t in VOCAB
        }
        for node in shapes:
            got = eval_intervals(node, pm)
            want = _brute(node, pm)
            for g, w in zip(got, want):
                assert np.array_equal(g, w), (node, pm)


@pytest.fixture(scope="module")
def idx(spark):
    rng = np.random.default_rng(3)
    vocab = ["scan", "sort", "merge", "table", "value", "pad", "row"]
    rows = [
        (f"c{i}", 0, " ".join(rng.choice(vocab, size=rng.integers(4, 25)).tolist()))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    return build_index(df, with_positions=True, build_blocks=True, num_segments=3)


def test_span_topk_end_to_end(idx):
    qs = [
        SpanNearQuery((SpanTermQuery("scan"), SpanTermQuery("merge")), slop=3),
        SpanNearQuery(
            (SpanTermQuery("sort"), SpanTermQuery("table")), slop=4, in_order=False
        ),
        SpanNotQuery(
            SpanNearQuery((SpanTermQuery("scan"), SpanTermQuery("merge")), slop=5),
            SpanTermQuery("value"),
        ),
        SpanFirstQuery(SpanTermQuery("row"), 3),
        SpanContainingQuery(
            SpanNearQuery((SpanTermQuery("table"), SpanTermQuery("row")), slop=6),
            SpanTermQuery("value"),
        ),
    ]
    for q in qs:
        out = span_topk(idx, q, k=10).collect()
        # default = the flat intervals plan — same docs, scores, ranks
        flat = interval_topk(idx, to_interval_source(q), k=10).collect()
        assert [tuple(r) for r in out] == [tuple(r) for r in flat]
        assert len(out) > 0  # shapes chosen to hit the synthetic corpus
        src = to_interval_source(q)
        from lucene_spark.search.intervals import leaf_terms, required_terms

        if required_terms(src) == leaf_terms(src):
            # opt-in kernel strategy stays bit-identical
            kern = span_topk(idx, q, k=10, strategy="kernel").collect()
            assert [tuple(r) for r in kern] == [tuple(r) for r in flat]


def test_span_boost_scales_scores(idx):
    q = SpanNearQuery((SpanTermQuery("scan"), SpanTermQuery("merge")), slop=3)
    base = span_topk(idx, q, k=5).collect()
    boosted = span_topk(idx, SpanBoostQuery(q, 2.0), k=5).collect()
    assert [r.doc_id for r in base] == [r.doc_id for r in boosted]
    for a, b in zip(base, boosted):
        assert b.score == pytest.approx(
            np.float32(2.0) * np.float32(a.score), rel=1e-6
        )
