"""Round-5 intervals: block (phrase), atLeast, repeats, extend/offset,
before/after/within/notWithin, overlapping, multi-term sources, and the
Disjunctions.pullUp rewrite — evaluators vs brute-force semantics on
randomized inputs, plus the nested-or maxgaps regression (the round-4
advice finding).
"""

import itertools

import numpy as np
import pytest

from lucene_spark.search.intervals import (
    IBlock,
    IContainedBy,
    IExtend,
    IMaxGaps,
    IMaxWidth,
    IOffset,
    IOr,
    IOrdered,
    IOverlapping,
    IRepeat,
    ITerm,
    IUnordered,
    after,
    at_least,
    before,
    eval_intervals,
    min_extent,
    normalize,
    not_within,
    phrase,
    pull_up_disjunctions,
    within,
)


def _rand_positions(rng, n_terms, npos=12, span=40):
    return {
        f"t{i}": np.sort(
            rng.choice(span, size=rng.integers(0, npos), replace=False)
        ).astype(np.int64)
        for i in range(n_terms)
    }


def _pairs(res):
    s, e, _ = res
    return sorted(zip(s.tolist(), e.tolist()))


def _minimal_set(cands):
    cands = set(cands)
    return sorted(
        (s, e)
        for (s, e) in cands
        if not any((s2, e2) != (s, e) and s <= s2 and e2 <= e for (s2, e2) in cands)
    )


# ------------------------------------------------------------------ block


def _brute_block(fams):
    """All chains with each sub starting exactly one past the previous end."""
    out = []
    for combo in itertools.product(*[list(zip(*f[:2])) for f in fams]):
        if all(combo[i + 1][0] == combo[i][1] + 1 for i in range(len(combo) - 1)):
            out.append((combo[0][0], combo[-1][1]))
    return sorted(set(out))


def test_block_matches_brute_force():
    rng = np.random.default_rng(23)
    for _ in range(400):
        n = int(rng.integers(2, 5))
        pm = _rand_positions(rng, n, npos=10, span=25)
        node = IBlock(tuple(ITerm(f"t{i}") for i in range(n)))
        fams = [eval_intervals(ITerm(f"t{i}"), pm) for i in range(n)]
        assert _pairs(eval_intervals(node, pm)) == _brute_block(fams)


def test_block_gaps_are_zero_and_phrase_factory():
    pm = {"a": np.array([0, 5]), "b": np.array([1, 9]), "c": np.array([2])}
    node = phrase(ITerm("a"), ITerm("b"), ITerm("c"))
    s, e, g = eval_intervals(normalize(node), pm)
    assert list(zip(s, e)) == [(0, 2)]
    assert list(g) == [0]
    assert phrase(ITerm("a")) == ITerm("a")
    assert min_extent(normalize(node)) == 3


def test_phrase_pullup_class_comment_example():
    """Intervals.java class comment: PHRASE(or(PHRASE(a,b,c), b), c)
    rewrites to OR(BLOCK(a,b,c,c), BLOCK(b,c)) so 'b c' still matches."""
    node = phrase(IOr((phrase(ITerm("a"), ITerm("b"), ITerm("c")), ITerm("b"))), ITerm("c"))
    norm = normalize(node)
    assert isinstance(norm, IOr)
    blocks = set(norm.subs)
    assert IBlock((ITerm("b"), ITerm("c"))) in blocks
    assert IBlock((ITerm("a"), ITerm("b"), ITerm("c"), ITerm("c"))) in blocks
    # and a doc with just "b c" matches
    pm = {"a": np.array([], dtype=np.int64), "b": np.array([3]), "c": np.array([4])}
    assert _pairs(eval_intervals(norm, pm)) == [(3, 4)]


# ---------------------------------------------------------------- atLeast


def _brute_at_least(fams, m):
    """Containment-minimal covers of every m-subset of the sub-sources."""
    out = []
    idxs = [i for i in range(len(fams)) if len(fams[i][0])]
    for sub in itertools.combinations(idxs, m):
        for combo in itertools.product(*[list(zip(*fams[i][:2])) for i in sub]):
            out.append((min(c[0] for c in combo), max(c[1] for c in combo)))
    return _minimal_set(out)


def test_at_least_golden_vs_reference_published_expectations():
    """Exact transcription check: the (s, e) sequences AND gaps the
    reference's own TestIntervals.testMinimumShouldMatch asserts
    (``TestIntervals.java:770-812``, field1 docs 1/2/4) — including the
    wide trailing windows produced by the monotone queueEnd."""

    def posmap(text):
        toks = [t.strip(".,").lower() for t in text.split() if t.strip(".,")]
        pm: dict = {}
        for i, t in enumerate(toks):
            pm.setdefault(t, []).append(i)
        return {k: np.array(v, dtype=np.int64) for k, v in pm.items()}

    docs = [
        "Pease porridge hot, pease porridge cold, pease porridge in the pot"
        " nine days old.  Some like it hot, some like it cold, some like it"
        " in the pot nine days old",
        "Pease porridge cold, pease porridge hot, pease porridge in the pot"
        " twelve days old.  Some like it cold, some like it hot, some like"
        " it in the fraggle",
        "Pease porridge hot, pease porridge cold, pease porridge in the pot"
        " nine years old.  Some like it hot, some like it twelve",
    ]
    expected = [
        ([(0, 2), (1, 3), (2, 4), (6, 11), (7, 17)], [0, 0, 0, 3, 8]),
        ([(3, 5), (4, 6), (5, 7), (6, 11), (7, 21)], None),
        ([(0, 2), (1, 3), (2, 4), (6, 11), (7, 17), (11, 21)], None),
    ]
    node = at_least(
        3,
        ITerm("porridge"),
        ITerm("hot"),
        ITerm("twelve"),
        ITerm("nine"),
        ITerm("pease"),
    )
    for d, (exp, exp_gaps) in zip(docs, expected):
        s, e, g = eval_intervals(node, posmap(d))
        assert list(zip(s.tolist(), e.tolist())) == exp
        if exp_gaps is not None:
            assert g.tolist() == exp_gaps


def test_at_least_subset_of_minimal_covers():
    """The streaming iterator emits a SUBSET of the ideal containment-
    minimal m-subset covers (it can stop early when a sub-source exhausts
    while leading — ``MinimumShouldMatchIntervalsSource.java:203-213``, no
    background refill on exhaust), but every emission must BE a minimal
    cover and the first cover is never missed."""
    rng = np.random.default_rng(31)
    checked = emitted = 0
    for _ in range(400):
        n = int(rng.integers(3, 6))
        m = int(rng.integers(2, n))
        pm = _rand_positions(rng, n, npos=8, span=30)
        node = at_least(m, *[ITerm(f"t{i}") for i in range(n)])
        fams = [eval_intervals(ITerm(f"t{i}"), pm) for i in range(n)]
        got = _pairs(eval_intervals(node, pm))
        brute = _brute_at_least(fams, m)
        assert set(got) <= set(brute), (pm, m)
        assert (len(got) > 0) == (len(brute) > 0)
        if brute:
            assert got[0] == brute[0]  # the first minimal cover always emits
            checked += 1
            emitted += len(got)
    assert checked > 100 and emitted > checked  # the fuzz exercised real work


def test_at_least_degenerate_forms():
    from lucene_spark.search.intervals import IAtLeast, INoMatch

    subs = (ITerm("a"), ITerm("b"))
    assert at_least(2, *subs) == IUnordered(subs)
    assert isinstance(at_least(3, *subs), INoMatch)
    node = at_least(2, ITerm("a"), ITerm("b"), ITerm("c"))
    assert isinstance(node, IAtLeast)
    # minExtent = sum of the m smallest sub extents
    assert min_extent(node) == 2
    wide = at_least(2, ITerm("a"), IOrdered((ITerm("b"), ITerm("c"))), ITerm("d"))
    assert min_extent(wide) == 2  # 1 + 1 beat 1 + 2


# ---------------------------------------------------------------- repeats


def test_repeat_windows():
    pm = {"a": np.array([1, 4, 6, 9])}
    s, e, g = eval_intervals(IRepeat(ITerm("a"), 2), pm)
    assert list(zip(s, e)) == [(1, 4), (4, 6), (6, 9)]
    assert list(g) == [2, 1, 2]  # span - 2 single positions
    s, e, g = eval_intervals(IRepeat(ITerm("a"), 3), pm)
    assert list(zip(s, e)) == [(1, 6), (4, 9)]
    # ordered("a","a") == the 2-windows via normalize
    node = normalize(IOrdered((ITerm("a"), ITerm("a"))))
    assert _pairs(eval_intervals(node, pm)) == [(1, 4), (4, 6), (6, 9)]


def test_repeat_mixed_with_other_terms():
    # ordered(a, a, b): adjacent equal subs collapse, then chain with b
    pm = {"a": np.array([0, 2, 8]), "b": np.array([4, 5])}
    node = normalize(IOrdered((ITerm("a"), ITerm("a"), ITerm("b"))))
    got = _pairs(eval_intervals(node, pm))
    # repeat-windows of a: (0,2), (2,8); chains: (0,2)->b@4, (2,8)->b? none >8
    assert got == [(0, 4)]


# ------------------------------------------- extend / offset / before / after


def test_extend_and_offset():
    pm = {"a": np.array([3, 10])}
    s, e, g = eval_intervals(IExtend(ITerm("a"), 5, 2), pm)
    assert list(zip(s, e)) == [(0, 5), (5, 12)]
    assert list(g) == [0, 0]  # gaps delegate to the inner (term) iterator
    s, e, _ = eval_intervals(IOffset(ITerm("a"), True), pm)
    assert list(zip(s, e)) == [(2, 2), (9, 9)]
    s, e, _ = eval_intervals(IOffset(ITerm("a"), False), pm)
    assert list(zip(s, e)) == [(4, 4), (11, 11)]
    # clamp at position 0 (OffsetIntervalsSource max(0, start-1))
    s, e, _ = eval_intervals(IOffset(ITerm("a"), True), {"a": np.array([0])})
    assert list(zip(s, e)) == [(0, 0)]


def _brute_exists_filter(src, keep):
    ss, se, _ = src
    return sorted((int(s), int(e)) for s, e in zip(ss, se) if keep(int(s), int(e)))


def test_before_after_within_matches_exists_semantics():
    rng = np.random.default_rng(41)
    for _ in range(300):
        pm = _rand_positions(rng, 2, npos=10, span=30)
        src = eval_intervals(ITerm("t0"), pm)
        ref = eval_intervals(ITerm("t1"), pm)
        rs, re_ = ref[0], ref[1]
        got_b = _pairs(eval_intervals(normalize(before(ITerm("t0"), ITerm("t1"))), pm))
        exp_b = _brute_exists_filter(
            src, lambda s, e: any(e <= max(0, int(r) - 1) for r in rs)
        )
        assert got_b == exp_b
        got_a = _pairs(eval_intervals(normalize(after(ITerm("t0"), ITerm("t1"))), pm))
        exp_a = _brute_exists_filter(src, lambda s, e: any(s >= int(r) + 1 for r in re_))
        assert got_a == exp_a
        p = int(rng.integers(0, 4))
        got_w = _pairs(
            eval_intervals(normalize(within(ITerm("t0"), p, ITerm("t1"))), pm)
        )
        exp_w = _brute_exists_filter(
            src,
            lambda s, e: any(
                max(0, int(r) - p) <= s and e <= int(r) + p for r in rs
            ),
        )
        assert got_w == exp_w
        got_nw = _pairs(
            eval_intervals(normalize(not_within(ITerm("t0"), p, ITerm("t1"))), pm)
        )
        exp_nw = _brute_exists_filter(
            src,
            lambda s, e: not any(
                max(0, int(r) - p) <= e and s <= int(r) + p for r in rs
            ),
        )
        assert got_nw == exp_nw


def test_overlapping_matches_exists_semantics():
    rng = np.random.default_rng(43)
    for _ in range(300):
        pm = _rand_positions(rng, 4, npos=8, span=30)
        src_node = IOrdered((ITerm("t0"), ITerm("t1")))
        ref_node = IOrdered((ITerm("t2"), ITerm("t3")))
        src = eval_intervals(src_node, pm)
        ref = eval_intervals(ref_node, pm)
        got = _pairs(eval_intervals(IOverlapping(src_node, ref_node), pm))
        rs, re_ = ref[0], ref[1]
        exp = _brute_exists_filter(
            src,
            lambda s, e: any(int(a) <= e and int(b) >= s for a, b in zip(rs, re_)),
        )
        assert got == exp


def test_not_contained_by_complements_contained_by():
    """notContainedBy keeps exactly the small intervals containedBy drops
    (``NotContainedByIntervalsSource`` vs ``ContainedByIntervalsSource``)."""
    from lucene_spark.search.intervals import INotContainedBy

    rng = np.random.default_rng(59)
    for _ in range(300):
        pm = _rand_positions(rng, 3, npos=10, span=30)
        small = ITerm("t0")
        big = IOrdered((ITerm("t1"), ITerm("t2")))
        inside = _pairs(eval_intervals(IContainedBy(small, big), pm))
        outside = _pairs(eval_intervals(INotContainedBy(small, big), pm))
        alls = _pairs(eval_intervals(small, pm))
        assert sorted(inside + outside) == alls
        # EXISTS semantics for the positive side already fuzz-covered; the
        # complement must be the literal set difference
        assert set(outside) == set(alls) - set(inside)


# --------------------------------------------------- Disjunctions.pullUp


def test_maxgaps_pulls_up_nested_or_under_ordered():
    """The round-4 advice repro: maxgaps(3, ordered(a, or(ordered(p1,p2),
    ordered(q1,q2)), c)) must match via the WIDE branch (gaps=3) even
    though minimization would pick the narrow one (gaps=7)."""
    pm = {
        "a": np.array([0]),
        "p1": np.array([2]),
        "p2": np.array([3]),
        "q1": np.array([4]),
        "q2": np.array([9]),
        "c": np.array([10]),
    }
    node = IMaxGaps(
        3,
        IOrdered(
            (
                ITerm("a"),
                IOr(
                    (
                        IOrdered((ITerm("p1"), ITerm("p2"))),
                        IOrdered((ITerm("q1"), ITerm("q2"))),
                    )
                ),
                ITerm("c"),
            )
        ),
    )
    # un-normalized evaluation shows the miss (the narrow branch shadows)
    assert _pairs(eval_intervals(node, pm)) == []
    # normalized evaluation hoists the wide branch and matches
    assert _pairs(eval_intervals(normalize(node), pm)) == [(0, 10)]


def test_pullup_groups_singleton_branches():
    """Disjunctions.splitDisjunctions: minExtent==1 branches regroup into
    ONE or() and do NOT multiply the cartesian expansion."""
    node = IOrdered((ITerm("a"), IOr((ITerm("x"), ITerm("y"))), ITerm("c")))
    assert pull_up_disjunctions(node) == [node]  # nothing to hoist
    wide = IOrdered(
        (
            ITerm("a"),
            IOr((IOrdered((ITerm("p"), ITerm("q"))), ITerm("x"))),
        )
    )
    ds = pull_up_disjunctions(wide)
    assert IOrdered((ITerm("a"), ITerm("x"))) in ds
    assert IOrdered((ITerm("a"), IOrdered((ITerm("p"), ITerm("q"))))) in ds
    assert len(ds) == 2


def test_maxgaps_pullup_fuzz_vs_manual_expansion():
    """Randomized: maxgaps over ordered chains with embedded wide
    disjunctions == or-merge of the per-branch filtered evaluations."""
    from lucene_spark.search.intervals import _minimal_or

    rng = np.random.default_rng(47)
    for _ in range(200):
        pm = _rand_positions(rng, 6, npos=6, span=24)
        b1 = IOrdered((ITerm("t2"), ITerm("t3")))
        b2 = IOrdered((ITerm("t4"), ITerm("t5")))
        g = int(rng.integers(0, 6))
        node = IMaxGaps(g, IOrdered((ITerm("t0"), IOr((b1, b2)), ITerm("t1"))))
        got = _pairs(eval_intervals(normalize(node), pm))
        fams = []
        for b in (b1, b2):
            s, e, gg = eval_intervals(IOrdered((ITerm("t0"), b, ITerm("t1"))), pm)
            keep = gg <= g
            fams.append((s[keep], e[keep], gg[keep]))
        assert got == _pairs(_minimal_or(fams))


# --------------------------------------------- vectorized 2-term NEAR kernel


def test_batch_near_freqs_bit_equal_to_per_doc_loop():
    """The r5 across-docs kernel must reproduce the per-doc pipeline
    (ordered/unordered_interval_lengths + interval_freq) bit-for-bit —
    including the float32 compound-assignment accumulation order."""
    from lucene_spark.search.intervals import (
        batch_near_freqs,
        interval_freq,
        ordered_interval_lengths,
        unordered_interval_lengths,
    )

    rng = np.random.default_rng(53)
    for trial in range(80):
        n_docs = int(rng.integers(1, 40))
        pa_col, pb_col = [], []
        for _ in range(n_docs):
            pa_col.append(
                np.sort(rng.choice(200, size=rng.integers(0, 30), replace=False))
            )
            pb_col.append(
                np.sort(rng.choice(200, size=rng.integers(0, 30), replace=False))
            )
        for is_ordered in (True, False):
            for mw in (None, int(rng.integers(2, 12))):
                got = batch_near_freqs(pa_col, pb_col, is_ordered, mw)
                f = ordered_interval_lengths if is_ordered else unordered_interval_lengths
                want = np.array(
                    [
                        interval_freq(f(pa_col[i], pb_col[i], mw))
                        for i in range(n_docs)
                    ],
                    dtype=np.float32,
                )
                assert np.array_equal(got, want), (trial, is_ordered, mw)


def test_near2_shape_detection():
    from lucene_spark.search.intervals import IMaxGaps, _near2_shape

    assert _near2_shape(IMaxWidth(8, IOrdered((ITerm("a"), ITerm("b"))))) == (
        "a", "b", True, 8,
    )
    # pair slop identity: maxgaps(g) == maxwidth(g + 2)
    assert _near2_shape(IMaxGaps(3, IUnordered((ITerm("a"), ITerm("b"))))) == (
        "a", "b", False, 5,
    )
    assert _near2_shape(IOrdered((ITerm("a"), ITerm("b")))) == ("a", "b", True, None)
    assert _near2_shape(IOrdered((ITerm("a"), ITerm("b"), ITerm("c")))) is None
    assert _near2_shape(normalize(IOrdered((ITerm("a"), ITerm("a"))))) is None


# ----------------------------------------------------- spark end-to-end


@pytest.fixture(scope="module")
def idx(spark):
    from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
    from lucene_spark.index.builder import build_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    i = build_index(
        docs,
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        doc_id_col="doc_id",
        build_blocks=True,
        with_positions=True,
    ).persist()
    yield i
    i.unpersist()


def test_multiterm_resolution_and_phrase_end_to_end(idx):
    from lucene_spark.search.intervals import (
        IMultiTerm,
        ITerm,
        interval_topk,
        resolve_multiterms,
    )

    mt = IMultiTerm(kind="prefix", pattern="mer")
    resolved = resolve_multiterms(mt, idx, "text")
    terms = (
        {s.term for s in resolved.subs}
        if isinstance(resolved, IOr)
        else {resolved.term}
    )
    assert "merge" in terms
    # tiny cap raises like the reference's IllegalStateException (an
    # unbounded range matches the whole vocabulary)
    with pytest.raises(ValueError):
        resolve_multiterms(
            IMultiTerm(kind="range", max_expansions=1), idx, "text"
        )
    out = interval_topk(idx, phrase(ITerm("table"), ITerm("value")), k=10).collect()
    assert len(out) > 0
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_surround_truncation_in_distance_end_to_end(idx):
    from lucene_spark.search.parser_surround import parse_surround
    from lucene_spark.search.spans import span_topk

    q = parse_surround("2W(sca*, merge)")
    out = span_topk(idx, q, k=10).collect()
    assert len(out) > 0
    # parity with the explicit term form on this corpus (sca* -> scan only
    # if the vocabulary has a single sca- term; otherwise subset check)
    q2 = parse_surround("2W(scan, merge)")
    out2 = {r.doc_id for r in span_topk(idx, q2, k=400).collect()}
    assert out2 <= {r.doc_id for r in span_topk(idx, q, k=400).collect()} or out2


def test_analyzed_text_factory():
    """``Intervals.analyzedText`` (IntervalBuilder.analyzeText simple-phrase
    path): stop holes become extend(), zero/one-token degenerate forms,
    maxGaps/ordered combination rules, synonym-stream refusal."""
    from lucene_spark.analysis.analyzer import (
        ENGLISH_STOP_WORDS,
        StandardAnalyzer,
    )
    from lucene_spark.search.intervals import (
        IBlock,
        IExtend,
        IMaxGaps,
        INoMatch,
        IOrdered,
        ITerm,
        IUnordered,
        analyzed_text,
        eval_intervals,
    )

    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    assert isinstance(analyzed_text(an, "the of"), INoMatch)
    assert analyzed_text(an, "merge") == ITerm("merge")
    q = analyzed_text(an, "merge the runs")
    assert q == IBlock((ITerm("merge"), IExtend(ITerm("runs"), 1, 0)))
    # the hole occupies its width: "merge X runs" matches, "merge runs" not
    import numpy as np

    pm_hole = {"merge": np.array([0], dtype=np.int64),
               "runs": np.array([2], dtype=np.int64)}
    s, e, _ = eval_intervals(q, pm_hole)
    assert list(s) == [0] and list(e) == [2]
    pm_tight = {"merge": np.array([0], dtype=np.int64),
                "runs": np.array([1], dtype=np.int64)}
    s, _, _ = eval_intervals(q, pm_tight)
    assert len(s) == 0
    assert analyzed_text(an, "scan merge", max_gaps=2) == IMaxGaps(
        2, IOrdered((ITerm("scan"), ITerm("merge")))
    )
    assert analyzed_text(an, "scan merge", max_gaps=-1, ordered=False) == \
        IUnordered((ITerm("scan"), ITerm("merge")))
    # synonym-position streams are out of envelope
    class FakeAn:
        def analyze_with_positions(self, text):
            return [("a", 0), ("b", 0)]

    import pytest as _pt
    with _pt.raises(ValueError, match="envelope"):
        analyzed_text(FakeAn(), "x")
