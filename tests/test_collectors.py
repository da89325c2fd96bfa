"""Collectors: facets, grouping, block join, searchAfter, RRF, rescore."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.collectors import (
    block_join_parents,
    facet_counts,
    grouped_topk,
    range_facet_counts,
    rescore,
    rrf,
    search_after,
)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [(0, 3.0), (1, 2.5), (2, 2.5), (3, 1.0), (4, 0.5)]
    return spark.createDataFrame(rows, "doc_id long, score float")


@pytest.fixture(scope="module")
def meta(spark):
    rows = [
        (0, "s0", "c0", 10),
        (1, "s0", "c0", 20),
        (2, "s1", "c1", 30),
        (3, "s1", "c1", 40),
        (4, "s1", "c2", 50),
        (5, "s2", "c2", 60),  # doc 5 has no hit
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, conv string, n int")


def test_facet_counts(scored, meta):
    got = [(r.label, r.n) for r in facet_counts(scored, meta, "source").collect()]
    assert got == [("s1", 3), ("s0", 2)]


def test_range_facets(scored, meta):
    ranges = [("lo", 0, 25), ("hi", 25, 100)]
    got = {r.label: r.n for r in range_facet_counts(scored, meta, "n", ranges).collect()}
    assert got == {"lo": 2, "hi": 3}


def test_grouped_topk(scored, meta):
    got = [
        (r.source, r.doc_id, r.grp_rank)
        for r in grouped_topk(scored, meta, "source", 2).collect()
    ]
    assert got == [
        ("s0", 0, 0),
        ("s0", 1, 1),
        ("s1", 2, 0),  # tie 2.5/2.5 → docID asc? doc2 over doc3? scores 2.5 vs 1.0
        ("s1", 3, 1),
    ]


def test_block_join(scored, meta):
    got = [
        (r.parent, r.score, r.n_children)
        for r in block_join_parents(scored, meta, "conv", "max").collect()
    ]
    assert got == [("c0", 3.0, 2), ("c1", 2.5, 2), ("c2", 0.5, 1)]
    sums = {
        r.parent: r.score
        for r in block_join_parents(scored, meta, "conv", "sum").collect()
    }
    assert sums["c0"] == 5.5


def test_search_after(scored):
    # page after (2.5, doc 1): doc 2 ties score with larger id, then 3, 4
    got = [(r.doc_id, r.rank) for r in search_after(scored, 2.5, 1, 2).collect()]
    assert got == [(2, 0), (3, 1)]


def test_rrf(spark, scored):
    other = spark.createDataFrame([(4, 9.0), (0, 1.0)], "doc_id long, score float")
    got = [r.doc_id for r in rrf([scored, other], k=60, top_n=3).collect()]
    # doc 0: rank1 both lists → 1/61+1/62; doc 4: 1/61+1/65 → doc 0 first
    assert got[0] == 0 and got[1] == 4


def test_rescore(spark, scored):
    second = spark.createDataFrame([(3, 10.0)], "doc_id long, score float")
    got = [(r.doc_id, r.score) for r in rescore(scored, second).collect()]
    assert got[0] == (3, 11.0)  # boosted by second pass
    assert {d for d, _ in got} == {0, 1, 2, 3, 4}  # first-pass set preserved


def test_block_join_children_round_trip(spark):
    """ToChildBlockJoinQuery: children of matching parents inherit the
    parent's score; composes round-trip with the to-parent direction."""
    from lucene_spark.search.collectors import (
        block_join_children,
        block_join_parents,
    )
    from pyspark.sql import functions as F

    meta = spark.createDataFrame(
        [(0, "p1"), (1, "p1"), (2, "p2"), (3, "p2"), (4, "p3")],
        "doc_id long, conv string",
    )
    child_hits = spark.createDataFrame(
        [(0, 2.0), (1, 3.0), (2, 1.5)], "doc_id long, score float"
    )
    parents = block_join_parents(child_hits, meta, "conv", score_mode="max")
    rows = {r["parent"]: r["score"] for r in parents.collect()}
    assert rows == {"p1": 3.0, "p2": 1.5}
    kids = block_join_children(parents, meta, "conv").collect()
    got = {int(r["doc_id"]): r["score"] for r in kids}
    # every child of p1/p2 inherits its parent's rolled-up score; p3's
    # child is absent (parent did not match)
    assert got == {0: 3.0, 1: 3.0, 2: 1.5, 3: 1.5}
