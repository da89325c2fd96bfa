"""Across-docs vectorized n-ary ordered interval kernel (round 5):
``batch_ordered_freqs`` must be bit-identical to the per-doc
``_minimal_ordered`` + ``interval_freq`` pipeline, and ``interval_topk``
must route eligible shapes to it without changing results.
"""

import numpy as np
import pytest

from lucene_spark.search.intervals import (
    IMaxGaps,
    IMaxWidth,
    IOr,
    IOrdered,
    ITerm,
    _minimal_ordered,
    _nary_ordered_shape,
    batch_ordered_freqs,
    interval_freq,
)


def _perdoc_freq(plists, max_width):
    fams = [
        (p, p, np.zeros(len(p), dtype=np.int64))
        for p in plists
    ]
    s, e, _ = _minimal_ordered(fams)
    lengths = e - s + 1
    if max_width is not None:
        lengths = lengths[lengths <= max_width]
    return interval_freq(lengths, min_extent=len(plists))


def _rand_doc(rng, k, max_len=10, max_pos=60):
    return [
        np.sort(
            rng.choice(max_pos, size=rng.integers(0, max_len), replace=False)
        ).astype(np.int64)
        for _ in range(k)
    ]


@pytest.mark.parametrize("k", [3, 4, 5])
def test_fuzz_bit_equal_to_perdoc(k):
    rng = np.random.default_rng(k * 101)
    for _trial in range(60):
        ndocs = int(rng.integers(1, 12))
        docs = [_rand_doc(rng, k) for _ in range(ndocs)]
        mw = int(rng.integers(k, 25)) if rng.random() < 0.8 else None
        cols = [[docs[d][t] for d in range(ndocs)] for t in range(k)]
        got = batch_ordered_freqs(cols, mw)
        want = np.array(
            [_perdoc_freq(docs[d], mw) for d in range(ndocs)],
            dtype=np.float32,
        )
        assert np.array_equal(got, want)


def test_shape_detection():
    t3 = IOrdered((ITerm("a"), ITerm("b"), ITerm("c")))
    assert _nary_ordered_shape(IMaxWidth(12, t3)) == (["a", "b", "c"], 12)
    # maxgaps(g) over n single terms == maxwidth(g + n)
    assert _nary_ordered_shape(IMaxGaps(2, t3)) == (["a", "b", "c"], 5)
    assert _nary_ordered_shape(t3) == (["a", "b", "c"], None)
    # pairs go to the near2 path, not this one
    assert _nary_ordered_shape(
        IMaxWidth(5, IOrdered((ITerm("a"), ITerm("b"))))
    ) is None
    # non-term leaves fall back to the general evaluator
    assert _nary_ordered_shape(
        IMaxWidth(5, IOrdered((ITerm("a"), IOr((ITerm("b"), ITerm("c"))), ITerm("d"))))
    ) is None
    # non-adjacent repeats are still a plain term chain
    assert _nary_ordered_shape(
        IMaxWidth(9, IOrdered((ITerm("a"), ITerm("b"), ITerm("a"))))
    ) == (["a", "b", "a"], 9)


def test_routing_matches_general_path(spark, monkeypatch):
    from lucene_spark.session import ship_package

    ship_package(spark)
    import lucene_spark.search.intervals as iv
    from lucene_spark.analysis.analyzer import StandardAnalyzer
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.intervals import interval_topk

    rows = [
        (0, "a b c x a b q c"),
        (1, "c b a"),
        (2, "a x x b x x c a b c"),
        (3, "a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        df, doc_id_col="doc_id", analyzer=StandardAnalyzer(),
        with_positions=True,
    ).persist()
    for node in [
        IMaxWidth(6, IOrdered((ITerm("a"), ITerm("b"), ITerm("c")))),
        # repeated non-adjacent term
        IMaxWidth(8, IOrdered((ITerm("a"), ITerm("b"), ITerm("a")))),
        IMaxGaps(3, IOrdered((ITerm("a"), ITerm("b"), ITerm("c")))),
    ]:
        assert _nary_ordered_shape(node) is not None
        fast = sorted(tuple(r) for r in interval_topk(idx, node, k=10).collect())
        # disable the fast path to exercise the general grouped evaluator
        monkeypatch.setattr(iv, "_nary_ordered_shape", lambda s: None)
        slow = sorted(tuple(r) for r in interval_topk(idx, node, k=10).collect())
        monkeypatch.undo()
        assert fast == slow and len(fast) > 0
