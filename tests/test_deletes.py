"""Buffered deletes (live docs) + physical apply at merge."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import segments as seg
from lucene_spark.index.builder import build_index, delete_by_ids, delete_by_term
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def idx(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    turns = synth_transcripts(spark, n_convs=60, seed=9, num_partitions=2)
    i = build_index(turns, num_segments=2, build_blocks=True).persist()
    yield i
    i.unpersist()


def test_delete_by_ids_hides_docs(idx):
    s = IndexSearcher(idx)
    before = [r.doc_id for r in s.search("index", k=5).collect()]
    assert before
    spark = idx.postings.sparkSession
    dels = spark.createDataFrame([(before[0],)], "doc_id long")
    s2 = IndexSearcher(delete_by_ids(idx, dels))
    after = [r.doc_id for r in s2.search("index", k=5).collect()]
    assert before[0] not in after
    # scores unchanged for surviving docs (stats not refreshed until merge,
    # matching Lucene's buffered-delete semantics)
    sb = {r.doc_id: r.score for r in s.search("index", k=100).collect()}
    sa = {r.doc_id: r.score for r in s2.search("index", k=100).collect()}
    assert all(sb[d] == v for d, v in sa.items())


def test_delete_by_term_removes_all_matches(idx):
    idx2 = delete_by_term(idx, "vector")
    s = IndexSearcher(idx2)
    assert s.count("vector") == 0


def test_ondisk_delete_and_merge_applies(spark, tmp_path):
    d = str(tmp_path / "idx")
    turns = synth_transcripts(spark, n_convs=60, seed=9, num_partitions=2)
    seg.build_segments(turns, d, num_segments=2, batch_size=2)

    s = IndexSearcher(seg.read_index(spark, d))
    victims = [r.doc_id for r in s.search("index", k=3).collect()]
    n_before = s.count("index")

    n_del = seg.delete_documents(spark, d, doc_ids=victims)
    assert n_del == len(victims)

    s2 = IndexSearcher(seg.read_index(spark, d))
    assert s2.count("index") == n_before - len(victims)
    assert not {r.doc_id for r in s2.search("index", k=10).collect()} & set(victims)

    # compaction applies deletes physically and refreshes stats
    seg.merge_segments(spark, d, group_size=2)
    idx3 = seg.read_index(spark, d)
    assert idx3.deletes is None  # delete table cleared
    s3 = IndexSearcher(idx3)
    assert s3.count("index") == n_before - len(victims)
    # post-merge stats no longer count deleted docs
    df_idx = {
        r.term: r.doc_freq
        for r in idx3.termstats.filter(F.col("term") == "index").collect()
    }
    assert df_idx["index"] == n_before - len(victims)
    report = seg.check_index(idx3)
    assert report["docids_dense"] is False  # holes where victims were
