"""PhraseQuery over positional postings: position-increment semantics
(FilteringTokenFilter holes), exact-phrase matching, BM25 phrase scoring."""

import numpy as np
import pytest

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search import bm25
from lucene_spark.search.searcher import IndexSearcher


def test_positions_have_stopword_holes():
    a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    assert a.analyze_with_positions("quick the fox") == [("quick", 0), ("fox", 2)]


def test_positions_have_overlong_holes():
    a = StandardAnalyzer()
    long_tok = "x" * 256
    assert a.analyze_with_positions(f"one {long_tok} two") == [("one", 0), ("two", 2)]


def test_positions_lowercase():
    a = StandardAnalyzer()
    assert a.analyze_with_positions("Quick FOX") == [("quick", 0), ("fox", 1)]


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    rows = [
        ("c0", 0, "the quick brown fox jumps"),
        ("c0", 1, "quick brown shoes and a quick brown hat"),
        ("c1", 0, "quick the fox runs"),  # 'quick [the] fox': hole blocks phrase
        ("c1", 1, "brown quick reversed order"),
        ("c2", 0, "row row row your boat"),
        ("c2", 1, "totally unrelated text here"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(
        df,
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        num_segments=2,
        with_positions=True,
    ).persist()
    yield IndexSearcher(idx)
    idx.unpersist()


def _ids(searcher, q, k=10):
    return [r.doc_id for r in searcher.search(q, k=k).collect()]


def test_exact_phrase_matches(searcher):
    hits = _ids(searcher, '"quick brown"')
    docs = {r.doc_id: r for r in searcher.index.docmap.collect()}
    matched = {(docs[d].conv_id, docs[d].turn_idx) for d in hits}
    assert matched == {("c0", 0), ("c0", 1)}


def test_phrase_does_not_cross_stopword_hole(searcher):
    # 'quick the fox' has quick@0, fox@2 — "quick fox" must NOT match
    assert _ids(searcher, '"quick fox"') == []


def test_phrase_respects_order(searcher):
    assert _ids(searcher, '"brown quick"') != []  # c1/1 has it
    hits = _ids(searcher, '"brown quick"')
    docs = {r.doc_id: r for r in searcher.index.docmap.collect()}
    assert {(docs[d].conv_id, docs[d].turn_idx) for d in hits} == {("c1", 1)}


def test_repeated_term_phrase_freq(searcher):
    # "row row" occurs at starts 0 and 1 in 'row row row your boat' → freq 2
    hits = searcher.search('"row row"', k=5).collect()
    assert len(hits) == 1
    idx = searcher.index
    st = {("text", t): None for t in ("row",)}
    # score check: freq=2, weight = 2 * idf(row)
    doc_count, sttf = searcher._fieldstats()["text"]
    idf = bm25.idf(1, doc_count)  # 'row' appears in 1 doc
    weight = bm25.sum_idf([idf, idf])
    cache = bm25.norm_inverse_cache(bm25.avgdl(sttf, doc_count))
    doclen_row = idx.doclens.filter("doc_id = %d" % hits[0].doc_id).collect()[0]
    want = bm25.bm25_score(
        np.array([2], dtype=np.float32),
        np.array([doclen_row.norm_byte]),
        weight,
        cache,
    )[0]
    assert hits[0].score == pytest.approx(float(want), abs=0)


def test_three_term_phrase(searcher):
    hits = _ids(searcher, '"quick brown fox"')
    docs = {r.doc_id: r for r in searcher.index.docmap.collect()}
    assert {(docs[d].conv_id, docs[d].turn_idx) for d in hits} == {("c0", 0)}


def test_absent_term_phrase_empty(searcher):
    assert _ids(searcher, '"quick zebra"') == []


def test_sloppy_phrase_matches_across_hole(searcher):
    # 'quick the fox': shifted positions quick@0, fox@1 → span 1 ≤ slop 1
    docs = {r.doc_id: r for r in searcher.index.docmap.collect()}
    hits = _ids(searcher, '"quick fox"~1')
    assert {(docs[d].conv_id, docs[d].turn_idx) for d in hits} >= {("c1", 0)}
    # exact phrase still excludes it
    assert _ids(searcher, '"quick fox"') == []


def test_sloppy_phrase_reversed_order_within_slop(searcher):
    # 'brown quick': shifted brown@0, quick@0... reversed pair has span 2
    docs = {r.doc_id: r for r in searcher.index.docmap.collect()}
    hits = _ids(searcher, '"quick brown"~2')
    assert {(docs[d].conv_id, docs[d].turn_idx) for d in hits} >= {
        ("c0", 0),
        ("c0", 1),
        ("c1", 1),  # reversed 'brown quick' within slop 2
    }


def test_sloppy_freq_counts_anchors(searcher):
    # 'quick brown shoes and a quick brown hat' → two anchors in slop 0..2
    docs = {(r.conv_id, r.turn_idx): r.doc_id for r in searcher.index.docmap.collect()}
    hits = {r.doc_id: r.score for r in searcher.search('"quick brown"~2', k=10).collect()}
    # freq=2 doc must outscore a freq=1 doc of similar length
    assert hits[docs[("c0", 1)]] > hits[docs[("c1", 1)]]


def test_phrase_requires_positions(spark):
    rows = [("c0", 0, "a b c")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(df, num_segments=1)
    s = IndexSearcher(idx)
    with pytest.raises(ValueError):
        s.search('"a b"', k=5).collect()


def test_sloppy_freq_lucene_javadoc_example():
    """SloppyPhraseMatcher javadoc: doc 'x a b a y', query "a b"~2 matches
    twice — 'a b' (distance 0) and 'b a' (distance 2) — so sloppyFreq =
    1/(1+0) + 1/(1+2) accumulated in float32."""
    import numpy as np

    from lucene_spark.search.searcher import sloppy_phrase_freq

    # positions: a@{1,3}, b@{2}; shifted: A = {1,3}, B = {2-1} = {1}
    got = sloppy_phrase_freq([np.array([1, 3]), np.array([1])], slop=2)
    want = np.float32(np.float32(1.0) + np.float32(1.0) / np.float32(3.0))
    assert got == want
    # slop 0: only the exact match contributes
    assert sloppy_phrase_freq([np.array([1, 3]), np.array([1])], 0) == np.float32(1.0)
    # no match within slop
    assert sloppy_phrase_freq([np.array([10]), np.array([0])], 2) == np.float32(0.0)


def test_sloppy_fractional_freq_scores(searcher):
    """A reversed-order match (distance 2) contributes 1/3 of an exact match
    — scores must reflect the fractional float32 freq, not an integer."""
    import numpy as np

    hits = {r.doc_id: r.score for r in searcher.search('"quick brown"~2', k=20).collect()}
    flat = {r.doc_id: r.score for r in searcher.search('"quick brown"~2', k=20, strategy="flat").collect()}
    assert hits == flat
    assert hits  # non-empty


def test_sloppy_repeats_kernel_hand_cases():
    """Hand-traced SloppyPhraseMatcher repeats cases (rptGroups algebra,
    SloppyPhraseMatcher.java:392-480).  Streams are offset-shifted; the
    repeat group lists the colliding stream indices."""
    from lucene_spark.search.searcher import sloppy_phrase_freq

    # "x y x" over doc "x y x" (x@{0,2}, y@{1}): exactly one match, len 0
    got = sloppy_phrase_freq(
        [np.array([0, 2]), np.array([0]), np.array([-2, 0])], 2, ((0, 2),)
    )
    assert got == np.float32(1.0)

    # "x y x" over "x y x y x" (x@{0,2,4}, y@{1,3}): two overlapping matches
    got = sloppy_phrase_freq(
        [np.array([0, 2, 4]), np.array([0, 2]), np.array([-2, 0, 2])], 2, ((0, 2),)
    )
    assert got == np.float32(2.0)

    # "row row" over "row row row" (row@{0,1,2}): two adjacent matches
    got = sloppy_phrase_freq(
        [np.array([0, 1, 2]), np.array([-1, 0, 1])], 0, ((0, 1),)
    )
    assert got == np.float32(2.0)

    # repeat group needs a second occurrence: single "row" cannot match
    got = sloppy_phrase_freq([np.array([5]), np.array([4])], 2, ((0, 1),))
    assert got == np.float32(0.0)


def test_sloppy_repeats_end_to_end(searcher):
    """'"row row"~0' matches only the boat doc; scoring uses the doubled
    idf weight (PhraseQuery termStates carry one entry per phrase slot)."""
    docs = {r.doc_id: (r.conv_id, r.turn_idx) for r in searcher.index.docmap.collect()}
    hits = searcher.search('"row row"', k=10, strategy="flat").collect()
    assert {docs[r.doc_id] for r in hits} == {("c2", 0)}

    # freq = 2 (two adjacent "row row" occurrences in "row row row")
    stats = searcher._termstats({("text", "row")})
    doc_count, sttf = searcher._fieldstats()["text"]
    idf = searcher.similarity.idf(stats[("text", "row")][0], doc_count)
    weight = bm25.sum_idf([idf, idf])
    leaf = searcher.similarity.leaf_scorer_from_weight(weight, doc_count, sttf)
    doclen_row = searcher.index.doclens.filter(
        searcher.index.doclens.doc_id == hits[0].doc_id
    ).collect()[0]
    want = leaf.score(
        np.array([2.0], dtype=np.float32),
        np.array([doclen_row.norm_byte], dtype=np.int64),
    )[0]
    assert hits[0].score == want

    # "quick brown quick"~3 matches the two-quick doc with a single
    # width-3 match (freq = 0.25f); slop 2 finds nothing
    h3 = searcher.search('"quick brown quick"~3', k=10).collect()
    assert {docs[r.doc_id] for r in h3} == {("c0", 1)}
    assert not searcher.search('"quick brown quick"~2', k=10).collect()


def test_sloppy_freq_two_term_chain_model_fuzz():
    """Independent 2-term formulation: the pq leapfrog reduces to a leader
    chain (first leader = max of first shifted positions; each leader L
    emits matchLength = L - max{other <= L} and hands off to min{other > L}).
    Must agree with the matcher on random inputs — guards the kernel against
    regressions (this equivalence also underpins the SQL oracle)."""
    import numpy as np

    from lucene_spark.search.searcher import sloppy_phrase_freq

    def chain_freq(A, B, slop):
        A, B = sorted(A), sorted(B)
        ma, mb = A[0], B[0]
        leader, side = (ma, "a") if ma > mb else (mb, "b")
        one = np.float32(1.0)
        freq = np.float32(0.0)
        matched = False
        while True:
            other = B if side == "a" else A
            ml = leader - max(s for s in other if s <= leader)
            if ml <= slop:
                freq = freq + one / (one + np.float32(ml))
                matched = True
            nxts = [s for s in other if s > leader]
            if not nxts:
                break
            leader, side = min(nxts), ("b" if side == "a" else "a")
        return freq if matched else np.float32(0.0)

    rng = np.random.default_rng(1234)
    for _ in range(3000):
        na, nb = rng.integers(1, 8), rng.integers(1, 8)
        A = sorted(rng.choice(30, size=na, replace=False).tolist())
        B = sorted(rng.choice(30, size=nb, replace=False).tolist())
        slop = int(rng.integers(0, 6))
        got = sloppy_phrase_freq([np.array(A), np.array(B)], slop)
        want = chain_freq(A, B, slop)
        assert got == want, (A, B, slop, got, want)


def test_sloppy_freq_three_terms_hand_traced():
    """Hand-traced pq runs for 3-term phrases."""
    import numpy as np

    from lucene_spark.search.searcher import sloppy_phrase_freq

    # doc "a b c", query "a b c"~1: one exact alignment, matchLength 0
    assert sloppy_phrase_freq(
        [np.array([0]), np.array([0]), np.array([0])], 1
    ) == np.float32(1.0)
    # doc "a x b c", query "a b c"~1: shifted A={0} B={1} C={1} → span 1
    assert sloppy_phrase_freq(
        [np.array([0]), np.array([1]), np.array([1])], 1
    ) == np.float32(0.5)
    # same doc, slop 0: no match
    assert sloppy_phrase_freq(
        [np.array([0]), np.array([1]), np.array([1])], 0
    ) == np.float32(0.0)
