"""Indexed offsets (IndexOptions ..._AND_OFFSETS) + offsets-fed highlighter.

The raw-word-equality highlighter cannot find analyzer-normalized tokens
("Merge" vs query term "merge"); the postings-offsets path must wrap the
original surface span.
"""

import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
)
from lucene_spark.index.builder import build_index
from lucene_spark.search.features import unified_highlight
from lucene_spark.search.searcher import IndexSearcher


def test_analyze_with_offsets_alignment():
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    text = "The Merge  of streams"
    out = an.analyze_with_offsets(text)
    # "The"/"of" are stopped but consume positions 0/2; offsets point at
    # raw spans (double space before "of" shifts nothing — offsets are
    # match offsets, not cumulative word math)
    assert out == [
        ("merge", 1, 4, 9),
        ("streams", 3, 14, 21),
    ]
    # parity with the positions-only stream
    assert [(t, p) for t, p, _s, _e in out] == an.analyze_with_positions(text)


def test_positions_table_carries_aligned_offsets(spark):
    rows = [("c0", 0, "alpha Beta alpha"), ("c0", 1, "beta gamma")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(df, with_positions=True)
    r = (
        idx.positions.filter(F.col("term") == "alpha")
        .orderBy("doc_id")
        .collect()[0]
    )
    assert list(r.positions) == [0, 2]
    assert list(r.start_offsets) == [0, 11]
    assert list(r.end_offsets) == [5, 16]


def test_offsets_highlight_normalized_token(spark):
    rows = [
        ("c0", 0, "Merge conflicts need a Merge tool"),
        ("c0", 1, "no relevant words here"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(
        df,
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        with_positions=True,
        build_blocks=False,
    )
    s = IndexSearcher(idx)
    hits = s.score_all("merge")
    out = unified_highlight(
        hits, idx.docmap, ["merge"], positions=idx.positions
    ).collect()
    assert len(out) == 1
    snip = out[0].snippet
    assert "<b>Merge</b> conflicts" in snip
    assert snip.count("<b>Merge</b>") == 2
    # the legacy raw-word path misses the uppercase surface forms entirely
    legacy = unified_highlight(hits, idx.docmap, ["merge"]).collect()
    assert legacy == [] or "<b>" not in legacy[0].snippet


def test_offsets_highlight_turkish_dotted_i(spark):
    # İ lowercases to "i̇" (i + combining dot above, Character.toLowerCase
    # semantics) — the indexed term differs from every raw word, but offsets
    # still recover the surface span
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    term = an.analyze("İstanbul")[0]
    rows = [("c0", 0, "visiting İstanbul in winter")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    idx = build_index(df, analyzer=an, with_positions=True)
    s = IndexSearcher(idx)
    hits = s.score_all(term)
    out = unified_highlight(
        hits, idx.docmap, [term], positions=idx.positions
    ).collect()
    assert len(out) == 1
    assert "<b>İstanbul</b>" in out[0].snippet
