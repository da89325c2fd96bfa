"""Search features: MLT, suggest, term vectors, stored-field fetch, highlight,
query-time join (oracle parity for most is in the driver gate)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.builder import build_index
from lucene_spark.search.features import (
    fetch_docs,
    highlight,
    interesting_terms,
    join_query,
    more_like_this,
    suggest_terms,
    term_vectors,
)
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def corpus(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    rows = [
        (0, "spark index merge merge merge", "s0"),
        (1, "spark query planner", "s0"),
        (2, "merge sort algorithm details", "s1"),
        (3, "unrelated cooking recipe text", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@pytest.fixture(scope="module")
def idx(corpus):
    i = build_index(corpus, doc_id_col="doc_id").persist()
    yield i
    i.unpersist()


def test_interesting_terms_rank_rare_frequent_terms_first(idx):
    terms = interesting_terms(idx, 0, max_terms=2)
    assert terms[0] == "merge"  # freq 3 in doc, moderately rare


def test_mlt_finds_similar_docs(idx):
    s = IndexSearcher(idx)
    q = more_like_this(idx, 0, max_terms=3)
    hits = [r.doc_id for r in s.search(q, k=4).collect()]
    assert hits[0] == 0  # the source doc matches itself best
    assert 2 in hits and 1 in hits  # shares 'merge' / 'spark'
    assert 3 not in hits


def test_suggest_terms(idx):
    out = [(r.term, r.distance) for r in suggest_terms(idx, "merg", k=3).collect()]
    assert out[0] == ("merge", 1)


def test_term_vectors(idx):
    tv = [(r.doc_id, r.term, r.freq) for r in term_vectors(idx, [0]).collect()]
    assert (0, "merge", 3) in tv and (0, "spark", 1) in tv


def test_fetch_docs_stored_fields(idx, corpus):
    s = IndexSearcher(idx)
    hits = s.search("spark", k=5)
    out = fetch_docs(hits, corpus, ["text", "source"]).collect()
    assert all(r.text is not None and r.source is not None for r in out)
    assert len(out) == 2


def test_highlight(idx, corpus):
    s = IndexSearcher(idx)
    hits = fetch_docs(s.search("spark", k=5), corpus, ["text"])
    hl = {r.doc_id: r.highlighted for r in highlight(hits, ["spark"]).collect()}
    assert hl[1] == "<b>spark</b> query planner"


def test_join_query(idx, corpus):
    s = IndexSearcher(idx)
    hits = s.score_all("query")  # only doc 1 (source s0)
    out = sorted(
        r.doc_id for r in join_query(hits, corpus, "source", corpus, "source").collect()
    )
    assert out == [0, 1]  # all docs in source s0


def test_analyzing_suggester_lookup(spark):
    """AnalyzingSuggester: lookup prefix is analyzed (case-folded) like the
    stored keys; completions rank by (weight DESC, surface ASC)."""
    from lucene_spark.search.features import AnalyzingSuggester

    entries = spark.createDataFrame(
        [("Merge Policy", 50), ("merge sort", 80), ("merchant", 10), ("query", 99)],
        "surface string, weight long",
    )
    sug = AnalyzingSuggester(entries)
    got = [(r.surface, r.weight) for r in sug.lookup("MER", k=3).collect()]
    assert got == [("merge sort", 80), ("Merge Policy", 50), ("merchant", 10)]
    # multi-token prefix completes within the analyzed key space
    got2 = [r.surface for r in sug.lookup("merge s", k=2).collect()]
    assert got2 == ["merge sort"]


def test_unified_highlight_sentence_segmenter(spark):
    """Sentence-BreakIterator passages: passages are sentences, the best
    (and only matching) one is returned, multi-passage returns both."""
    from lucene_spark.search.features import unified_highlight

    rows = [
        (0, "The merge runs fast. Nothing here. Another merge happened today!"),
        (1, "No relevant words at all."),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string")
    hits = spark.createDataFrame([(0,), (1,)], "doc_id long")

    out = unified_highlight(
        hits, src, ["merge"], segmenter="sentence", max_passages=2
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc  # no matching sentence → no passage
    got = {r.passage_idx: r.snippet for r in by_doc[0]}
    assert got == {
        0: "The <b>merge</b> runs fast.",
        2: "Another <b>merge</b> happened today!",
    }

    # max_passages=1 keeps only the best-scoring sentence (earlier start
    # wins the norm bonus at equal tf)
    top1 = unified_highlight(
        hits, src, ["merge"], segmenter="sentence", max_passages=1
    ).collect()
    assert len(top1) == 1 and top1[0].passage_idx == 0


def test_sentence_starts_survive_multispace(spark):
    """Start offsets are exact even with multi-char separators (double
    space / newline) — progressive-find, not +1-per-separator."""
    from lucene_spark.search.features import unified_highlight

    text = "Alpha merge one.  Beta two.\n\nGamma merge three."
    src = spark.createDataFrame([(0, text)], "doc_id long, text string")
    hits = spark.createDataFrame([(0,)], "doc_id long")
    out = unified_highlight(
        hits, src, ["merge"], segmenter="sentence", max_passages=3
    ).collect()
    idxs = sorted(r.passage_idx for r in out)
    assert idxs == [0, 2]
    # exact snippet text confirms the right sentences were selected
    snippets = {r.passage_idx: r.snippet for r in out}
    assert snippets[0] == "Alpha <b>merge</b> one."
    assert snippets[2] == "Gamma <b>merge</b> three."
