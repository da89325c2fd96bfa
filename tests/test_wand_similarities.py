"""WAND kernel ≡ flat plan for EVERY similarity family (CheckHits pattern).

Round-3 extension: the block-max kernel's impact-frontier bounds are valid
for any freq/length-monotone SimScorer (MaxScoreCache.java:72-93 makes the
same assumption), so all ten families ride the kernel.  Bit-equal float32
scores and identical (score DESC, doc_id ASC) order are required.
"""

import pytest

from lucene_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.similarities import MultiSimilarity
from lucene_spark.sources.transcripts import synth_transcripts

ANALYZER = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)

SIMS = [
    "bm25",
    "classic",
    "boolean",
    "lmdirichlet",
    "dfr",
    "lmjm",
    "ib",
    "dfi",
    "f2exp",
]

QUERIES = [
    "merge",
    "merge AND join",
    "data OR row OR scan",
    "merge AND (data OR row) AND NOT window",
]


@pytest.fixture(scope="module")
def idx(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    df = synth_transcripts(spark, n_convs=120, seed=11).persist()
    df.count()
    i = build_index(df, analyzer=ANALYZER, num_segments=5, build_blocks=True).persist()
    yield i
    i.unpersist()


@pytest.mark.parametrize("sim", SIMS)
def test_wand_flat_parity_all_sims(idx, sim):
    s = IndexSearcher(idx, similarity=sim)
    assert s.similarity.supports_wand
    for q in QUERIES:
        wand = [(r.doc_id, r.score) for r in s.search(q, k=12, strategy="wand").collect()]
        flat = [(r.doc_id, r.score) for r in s.search(q, k=12, strategy="flat").collect()]
        assert wand == flat, f"{sim}: {q}"


def test_wand_flat_parity_multi_sim(idx):
    s = IndexSearcher(idx, similarity=MultiSimilarity(["bm25", "classic"]))
    wand = [(r.doc_id, r.score) for r in s.search("merge", k=10, strategy="wand").collect()]
    flat = [(r.doc_id, r.score) for r in s.search("merge", k=10, strategy="flat").collect()]
    assert wand == flat


def test_auto_strategy_uses_kernel_for_alt_sims(idx):
    # strategy='auto' must route alt-similarity flat Booleans to the kernel
    # (no doclens join in the plan); spot-check via the physical plan string
    s = IndexSearcher(idx, similarity="lmdirichlet")
    plan = s.search("merge AND join", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # the applyInPandas kernel stage


def test_flat_term_plan_is_join_free(idx):
    """Round-3 invariant: norms ride inside posting rows, so a flat term
    query's physical plan contains NO join operator at all (the round-2
    corpus-sized doclens join is gone)."""
    s = IndexSearcher(idx)
    plan = (
        s.search("merge", k=10, strategy="flat")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "doclens" not in plan
