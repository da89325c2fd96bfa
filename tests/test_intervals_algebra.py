"""Full intervals algebra: evaluators vs brute-force minimal-interval
semantics on randomized inputs, plus end-to-end Spark parity.

Brute-force model (``queries/intervals/package-info.java`` minimal-interval
semantics): enumerate every candidate interval the combinator can produce,
then keep the containment-minimal, deduplicated set.  The lazy iterators in
the reference (and our transcriptions) must emit exactly that set for
ordered / unordered / or; containedBy / notContaining are checked against
their streaming two-pointer semantics directly.
"""

import itertools

import numpy as np
import pytest

from lucene_spark.search.intervals import (
    IContainedBy,
    IMaxGaps,
    IMaxWidth,
    INotContaining,
    IOr,
    IOrdered,
    ITerm,
    IUnordered,
    eval_intervals,
    interval_freq,
    interval_near_topk,
    interval_topk,
    leaf_terms,
    min_extent,
    required_terms,
)


def _minimal_set(cands):
    """Containment-minimal, deduplicated subset of candidate (s, e) pairs."""
    cands = set(cands)
    return sorted(
        (s, e)
        for (s, e) in cands
        if not any(
            (s2, e2) != (s, e) and s <= s2 and e2 <= e for (s2, e2) in cands
        )
    )


def _brute_ordered(fams):
    """All ordered chains (one interval per family, each starting after the
    previous end) -> minimal set."""
    out = []
    for combo in itertools.product(*[list(zip(*f[:2])) for f in fams]):
        ok = all(
            combo[i + 1][0] > combo[i][1] for i in range(len(combo) - 1)
        )
        if ok:
            out.append((combo[0][0], combo[-1][1]))
    return _minimal_set(out)


def _brute_unordered(fams):
    """All composite [min start, max end] covers -> minimal set."""
    out = []
    for combo in itertools.product(*[list(zip(*f[:2])) for f in fams]):
        out.append(
            (min(c[0] for c in combo), max(c[1] for c in combo))
        )
    return _minimal_set(out)


def _brute_or(fams):
    out = []
    for s, e, _ in fams:
        out.extend(zip(s.tolist(), e.tolist()))
    return _minimal_set(out)


def _rand_positions(rng, n_terms, npos=14, span=40):
    return {
        f"t{i}": np.sort(
            rng.choice(span, size=rng.integers(0, npos), replace=False)
        ).astype(np.int64)
        for i in range(n_terms)
    }


def _pairs(res):
    s, e, _ = res
    return sorted(zip(s.tolist(), e.tolist()))


def test_ordered_nary_matches_brute_force():
    rng = np.random.default_rng(7)
    for _ in range(300):
        n = int(rng.integers(2, 5))
        pm = _rand_positions(rng, n)
        node = IOrdered(tuple(ITerm(f"t{i}") for i in range(n)))
        got = _pairs(eval_intervals(node, pm))
        fams = [eval_intervals(ITerm(f"t{i}"), pm) for i in range(n)]
        assert got == _brute_ordered(fams)


def test_unordered_nary_matches_brute_force():
    rng = np.random.default_rng(11)
    for _ in range(300):
        n = int(rng.integers(2, 5))
        pm = _rand_positions(rng, n)
        node = IUnordered(tuple(ITerm(f"t{i}") for i in range(n)))
        got = _pairs(eval_intervals(node, pm))
        fams = [eval_intervals(ITerm(f"t{i}"), pm) for i in range(n)]
        assert got == _brute_unordered(fams)


def test_or_of_ordered_matches_brute_force():
    rng = np.random.default_rng(13)
    for _ in range(300):
        pm = _rand_positions(rng, 4)
        b1 = IOrdered((ITerm("t0"), ITerm("t1")))
        b2 = IOrdered((ITerm("t2"), ITerm("t3")))
        got = _pairs(eval_intervals(IOr((b1, b2)), pm))
        fams = [eval_intervals(b, pm) for b in (b1, b2)]
        assert got == _brute_or(fams)


def test_nested_ordered_of_unordered_matches_brute_force():
    rng = np.random.default_rng(17)
    for _ in range(200):
        pm = _rand_positions(rng, 3, npos=8, span=30)
        inner = IUnordered((ITerm("t0"), ITerm("t1")))
        node = IOrdered((inner, ITerm("t2")))
        got = _pairs(eval_intervals(node, pm))
        fams = [eval_intervals(inner, pm), eval_intervals(ITerm("t2"), pm)]
        assert got == _brute_ordered(fams)


def test_maxgaps_and_maxwidth_filters():
    pm = {"a": np.array([0, 10]), "b": np.array([2, 13])}
    node = IOrdered((ITerm("a"), ITerm("b")))
    s, e, g = eval_intervals(node, pm)
    assert list(zip(s, e, g)) == [(0, 2, 1), (10, 13, 2)]
    s, e, _ = eval_intervals(IMaxGaps(1, node), pm)
    assert list(zip(s, e)) == [(0, 2)]
    s, e, _ = eval_intervals(IMaxWidth(3, node), pm)
    assert list(zip(s, e)) == [(0, 2)]


def test_maxgaps_distributes_over_or():
    # FilteredIntervalsSource.maxGaps pulls up disjunctions: the filter is
    # applied per branch BEFORE the or-minimization merge
    pm = {
        "a": np.array([0]),
        "b": np.array([5]),  # branch1 interval (0,5) gaps=4
        "c": np.array([1]),
        "d": np.array([3]),  # branch2 interval (1,3) gaps=1
    }
    node = IMaxGaps(
        2, IOr((IOrdered((ITerm("a"), ITerm("b"))), IOrdered((ITerm("c"), ITerm("d")))))
    )
    s, e, _ = eval_intervals(node, pm)
    assert list(zip(s, e)) == [(1, 3)]


def test_contained_by():
    pm = {
        "x": np.array([1, 4, 9]),
        "a": np.array([0, 7]),
        "b": np.array([2, 8]),
    }
    # ordered(a,b) minimal intervals: (0,2), (7,8)
    node = IContainedBy(ITerm("x"), IOrdered((ITerm("a"), ITerm("b"))))
    s, e, _ = eval_intervals(node, pm)
    assert list(zip(s, e)) == [(1, 1)]


def test_not_containing_point_subtrahend():
    pm = {
        "a": np.array([0, 7]),
        "b": np.array([3, 9]),
        "x": np.array([1]),
    }
    # ordered(a,b) minimal: (0,3), (7,9); (0,3) contains x@1 -> dropped
    node = INotContaining(IOrdered((ITerm("a"), ITerm("b"))), ITerm("x"))
    s, e, _ = eval_intervals(node, pm)
    assert list(zip(s, e)) == [(7, 9)]


def test_not_containing_reference_quirk():
    # NotContainingIterator drops a minuend interval when the subtrahend
    # pointer rests on an interval that merely overlaps-or-contains it
    # (NotContainingIntervalsSource.java:74-83) — we match the reference
    pm = {
        "a": np.array([2]),
        "b": np.array([5]),
        "c": np.array([0]),
        "d": np.array([9]),
    }
    minuend = IOrdered((ITerm("a"), ITerm("b")))  # (2,5)
    sub = IOrdered((ITerm("c"), ITerm("d")))  # (0,9) contains (2,5)
    s, e, _ = eval_intervals(INotContaining(minuend, sub), pm)
    assert len(s) == 0


def test_leaf_required_minextent():
    node = IOr(
        (
            IOrdered((ITerm("a"), ITerm("b"), ITerm("c"))),
            IMaxGaps(1, IOrdered((ITerm("a"), ITerm("d")))),
        )
    )
    assert leaf_terms(node) == {"a", "b", "c", "d"}
    assert required_terms(node) == {"a"}
    assert min_extent(node) == 2  # min(3, 2)
    nc = INotContaining(IOrdered((ITerm("a"), ITerm("b"))), ITerm("x"))
    assert required_terms(nc) == {"a", "b"}
    assert min_extent(nc) == 2
    cb = IContainedBy(ITerm("x"), IOrdered((ITerm("a"), ITerm("b"))))
    assert required_terms(cb) == {"x", "a", "b"}
    assert min_extent(cb) == 1


def test_repeated_subsources_collapse_to_repeat():
    # r5: OrderedIntervalsSource.build / UnorderedIntervalsSource.build
    # deduplicate into RepeatingIntervalsSource instead of raising
    from lucene_spark.search.intervals import IRepeat, normalize

    assert normalize(IOrdered((ITerm("a"), ITerm("a")))) == IRepeat(ITerm("a"), 2)
    got = normalize(IUnordered((ITerm("a"), ITerm("b"), ITerm("a"))))
    assert got == IUnordered((IRepeat(ITerm("a"), 2), ITerm("b")))
    # minExtent quirk: Repeating reports the SUB extent
    assert min_extent(normalize(IOrdered((ITerm("a"), ITerm("a"))))) == 1


@pytest.fixture(scope="module")
def idx(spark):
    from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
    from lucene_spark.index.builder import build_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    i = build_index(
        docs,
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        doc_id_col="doc_id",
        with_positions=True,
    ).persist()
    yield i
    i.unpersist()


def test_general_engine_matches_two_term_near(idx):
    """interval_topk(maxwidth(8, ordered(a, b))) must be bit-identical to the
    round-3 two-term fast path (the gated query)."""
    old = interval_near_topk(idx, "merge", "join", k=10, max_width=8).collect()
    new = interval_topk(
        idx,
        IMaxWidth(8, IOrdered((ITerm("merge"), ITerm("join")))),
        k=10,
    ).collect()
    assert [tuple(r) for r in old] == [tuple(r) for r in new]


def test_interval_topk_unordered_end_to_end(idx):
    out = interval_topk(
        idx,
        IMaxWidth(12, IUnordered((ITerm("merge"), ITerm("join")))),
        k=10,
    ).collect()
    assert len(out) > 0
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s < 1 for s in scores)
