"""Legacy SpanScorer ranking (round 5): NearSpansOrdered's per-anchor match
enumeration + the float32 sloppy-freq accumulation
(``spans/NearSpansOrdered.java:62-120``, ``SpanScorer.java:112``), scored
by BM25 with weight = Σ idf over the span's distinct terms
(``SpanWeight.buildSimWeight``).
"""

import numpy as np
import pytest

from lucene_spark.search.searcher import near_spans_ordered_freq


def _reference_spans_freq(plists, slop):
    """Direct stateful transcription of the reference iterators: sub-spans
    only advance forward; subSpans[0] anchors; stretchToOrder advances each
    later stream to the first start >= prev end (term end = start + 1);
    one exhausted stream ends the doc's enumeration."""
    idx = [0] * len(plists)
    one = np.float32(1.0)
    freq = np.float32(0.0)
    n0 = len(plists[0])
    for a_i in range(n0):
        anchor = plists[0][a_i]
        prev_end = anchor + 1
        width = 0
        dead = False
        for s in range(1, len(plists)):
            lst = plists[s]
            while idx[s] < len(lst) and lst[idx[s]] < prev_end:
                idx[s] += 1
            if idx[s] >= len(lst):
                dead = True
                break
            width += int(lst[idx[s]] - prev_end)
            prev_end = lst[idx[s]] + 1
        if dead:
            break  # oneExhaustedInCurrentDoc ends the enumeration
        if width <= slop:
            freq = freq + one / (one + np.float32(width))
    return freq


def _rand_lists(rng, n_lists, max_len=12, max_pos=40):
    out = []
    for _ in range(n_lists):
        k = rng.integers(0, max_len)
        out.append(np.sort(rng.choice(max_pos, size=k, replace=False)).astype(np.int64))
    return out


def test_fuzz_matches_reference_transcription():
    rng = np.random.default_rng(42)
    for trial in range(400):
        n_lists = int(rng.integers(2, 5))
        plists = _rand_lists(rng, n_lists)
        slop = int(rng.integers(0, 8))
        got = near_spans_ordered_freq(plists, slop)
        want = _reference_spans_freq(plists, slop)
        assert got == want, (trial, plists, slop, got, want)


def test_known_values():
    # "a x b ... a b": spans counts BOTH anchors (not minimal-filtered)
    a = np.array([0, 5], dtype=np.int64)
    b = np.array([2, 6], dtype=np.int64)
    # anchor 0 -> b=2 (width 1); anchor 5 -> b=6 (width 0)
    one = np.float32(1.0)
    want = np.float32(one / (one + np.float32(1)))
    want = want + one / (one + np.float32(0))
    assert near_spans_ordered_freq([a, b], slop=3) == want
    # slop 0 keeps only the adjacent match
    assert near_spans_ordered_freq([a, b], slop=0) == np.float32(1.0)


def test_repeated_term_no_collision_algebra():
    # spans treat repeated terms as independent sub-spans over the same
    # postings: ordered(a, a) on positions [3, 7] matches anchor 3 -> 7
    p = np.array([3, 7], dtype=np.int64)
    got = near_spans_ordered_freq([p, p], slop=10)
    assert got == np.float32(1.0 / (1.0 + 3.0))


def test_exhaustion_and_empties():
    a = np.array([1, 2, 3], dtype=np.int64)
    assert near_spans_ordered_freq([a, np.array([], dtype=np.int64)], 5) == 0
    assert near_spans_ordered_freq([np.array([], dtype=np.int64), a], 5) == 0
    # second stream exhausts after the first anchor: later anchors dead
    b = np.array([2], dtype=np.int64)
    got = near_spans_ordered_freq([a, b], slop=5)
    assert got == np.float32(1.0)  # only anchor 1 -> 2 (width 0)


@pytest.fixture(scope="module")
def idx_pair(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
    from lucene_spark.index.builder import build_index
    from lucene_spark.search.searcher import IndexSearcher

    rows = [
        (0, "scan a merge then scan merge again"),
        (1, "scan far far far far far far merge"),
        (2, "merge before scan"),
        (3, "scan merge"),
    ]
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    i = build_index(df, doc_id_col="doc_id", analyzer=an, with_positions=True)
    return IndexSearcher(i.persist())


def test_searcher_legacy_topk(idx_pair):
    rows = idx_pair.span_near_topk_legacy(["scan", "merge"], slop=3, k=10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    # doc2 (wrong order) and doc1 (width 6 > 3) drop out
    assert set(got) == {0, 3}
    # doc0: anchors 0 and 4 both chain within slop -> freq > 1 -> outranks
    # doc3's single exact match at equal-ish norms? norms differ; just
    # assert both present and scores positive
    assert all(v > 0 for v in got.values())


def test_searcher_legacy_empty_cases(idx_pair):
    assert idx_pair.span_near_topk_legacy([], 2).count() == 0
    assert idx_pair.span_near_topk_legacy(["scan", "zzzz"], 2).count() == 0


def test_batch_kernel_bit_equal_fuzz():
    """``batch_near_spans_freqs`` (the across-docs form wired into
    ``span_near_topk_legacy``) is bit-identical to the per-doc
    enumeration for any term count, positions, and slop."""
    from lucene_spark.search.searcher import batch_near_spans_freqs

    rng = np.random.default_rng(31)
    for _trial in range(500):
        k = int(rng.integers(2, 5))
        ndocs = int(rng.integers(1, 8))
        slop = int(rng.integers(0, 7))
        cols = [[] for _ in range(k)]
        want = []
        for _ in range(ndocs):
            plists = []
            for t in range(k):
                kk = int(rng.integers(1, 9))
                plists.append(
                    np.sort(rng.choice(35, size=kk, replace=False)).astype(np.int64)
                )
                cols[t].append(plists[-1])
            want.append(near_spans_ordered_freq(plists, slop))
        got = batch_near_spans_freqs(cols, slop)
        assert np.array_equal(got, np.array(want, dtype=np.float32))
