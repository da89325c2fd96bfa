"""Segmented on-disk index: build, resume-after-crash, merge, check_index.

Mirrors the reference's index-lifecycle tests: random build + CheckIndex
(SURVEY.md §5.5), resumability per FIXTURES.md §5 "killing the build mid-way
and restarting yields identical tables"."""

import os

import pytest

from lucene_spark.index import segments as seg
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.sources.transcripts import synth_transcripts

QUERY = "index OR query OR merge"


@pytest.fixture(scope="module")
def source(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    return synth_transcripts(spark, n_convs=120, seed=5, num_partitions=4)


def _search(spark, index_dir, qtext=QUERY, k=15):
    idx = seg.read_index(spark, index_dir)
    s = IndexSearcher(idx)
    return [(r.doc_id, r.score, r.rank) for r in s.search(qtext, k=k).collect()]


def test_build_read_search_and_check(spark, source, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_full"))
    plan = seg.build_segments(source, d, num_segments=4, batch_size=2)
    assert plan["total_rows"] == source.count()
    assert os.path.exists(os.path.join(d, "manifest", "plan.json"))

    idx = seg.read_index(spark, d)
    report = seg.check_index(idx)
    assert report["n_docs"] == plan["total_rows"]

    # on-disk search == in-memory build search (same analyzer, same docIDs)
    from lucene_spark.index.builder import build_index

    mem = build_index(source, num_segments=4).persist()
    want = [
        (r.doc_id, r.score, r.rank)
        for r in IndexSearcher(mem).search(QUERY, k=15).collect()
    ]
    got = _search(spark, d)
    mem.unpersist()
    assert got == want

    # metrics/lineage table
    m = seg.metrics_table(spark, d)
    rows = m.collect()
    assert len(rows) == plan["num_segments"]
    assert all(r.status == "done" for r in rows)


def test_resume_after_crash(spark, source, tmp_path_factory, monkeypatch):
    d_crash = str(tmp_path_factory.mktemp("idx_crash"))
    d_ref = str(tmp_path_factory.mktemp("idx_ref"))

    # reference build
    seg.build_segments(source, d_ref, num_segments=4, batch_size=2)

    # crashing build: die on the second batch
    real = seg._build_batch
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated executor loss")
        return real(*a, **kw)

    monkeypatch.setattr(seg, "_build_batch", flaky)
    with pytest.raises(RuntimeError):
        seg.build_segments(source, d_crash, num_segments=4, batch_size=2)
    monkeypatch.setattr(seg, "_build_batch", real)

    # restart completes, reusing the persisted plan + done segments
    states = seg.segment_states(d_crash, 4)
    assert any(s and s["status"] == "done" for s in states[:2])
    seg.build_segments(source, d_crash, num_segments=4, batch_size=2)

    # identical tables ⇒ identical search results
    assert _search(spark, d_crash) == _search(spark, d_ref)
    dm_a = sorted(
        (r.doc_id, r.conv_id, r.turn_idx)
        for r in seg.read_index(spark, d_crash).docmap.collect()
    )
    dm_b = sorted(
        (r.doc_id, r.conv_id, r.turn_idx)
        for r in seg.read_index(spark, d_ref).docmap.collect()
    )
    assert dm_a == dm_b


def test_merge_preserves_results(spark, source, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_merge"))
    seg.build_segments(source, d, num_segments=4, batch_size=4)
    before = _search(spark, d)

    seg.merge_segments(spark, d, group_size=2)
    after = _search(spark, d)
    assert after == before

    idx = seg.read_index(spark, d)
    live = {r.segment for r in idx.blocks.select("segment").distinct().collect()}
    assert len(live) <= 2
    seg.check_index(idx)


def test_term_bucket_parity_and_pruned_scan(spark, source, tmp_path_factory):
    """The on-disk blocks layout is bucketed by hash(term)%B; a query's block
    scan must resolve to a tbucket partition filter (terms-dictionary role)
    and read only the query terms' buckets."""
    from lucene_spark.index.blocks import (
        DEFAULT_TERM_BUCKETS,
        term_bucket_col,
        term_bucket_py,
    )
    from pyspark.sql import functions as F

    # Python and JVM bucket functions agree (driver computes partition filter)
    terms_df = spark.createDataFrame(
        [(t,) for t in ("the", "index", "query", "Σ", "naïve", "merge")], "term string"
    )
    got = {
        r.term: r.b
        for r in terms_df.select(
            "term", term_bucket_col(F.col("term"), DEFAULT_TERM_BUCKETS).alias("b")
        ).collect()
    }
    for t, b in got.items():
        assert b == term_bucket_py(t, DEFAULT_TERM_BUCKETS)

    d = str(tmp_path_factory.mktemp("idx_bucketed"))
    seg.build_segments(source, d, num_segments=4, batch_size=4)
    idx = seg.read_index(spark, d)
    assert idx.term_buckets == DEFAULT_TERM_BUCKETS and idx.disk_backed

    qb = idx.blocks_for_terms("text", ["index", "query"])
    plan_str = qb._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan_str  # partition filter reached the scan
    # pruned scan decodes to exactly the two terms' postings
    terms_seen = {r.term for r in qb.select("term").distinct().collect()}
    assert terms_seen == {"index", "query"}

    # and the pruned WAND search equals the unpruned in-memory result
    from lucene_spark.index.builder import build_index

    mem = build_index(source, num_segments=4, build_blocks=True).persist()
    want = [
        (r.doc_id, r.score, r.rank)
        for r in IndexSearcher(mem).search("index AND query", k=10).collect()
    ]
    got2 = _search(spark, d, "index AND query", k=10)
    mem.unpersist()
    assert got2 == want


def test_legacy_layout_resume_stays_unbucketed(spark, source, tmp_path_factory, monkeypatch):
    """Resuming a pre-bucketing (round-1) checkpointed build must NOT mix
    segment=*/ and segment=*/tbucket=*/ files — the plan records
    term_buckets=None and the build finishes on the legacy layout."""
    import json

    d = str(tmp_path_factory.mktemp("idx_legacy"))

    # simulate a round-1 partial build: run the first batch with the plan
    # stripped of the layout key and blocks written unbucketed
    real = seg._build_batch
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return real(*a, **kw)

    monkeypatch.setattr(seg, "_build_batch", flaky)
    with pytest.raises(RuntimeError):
        seg.build_segments(source, d, num_segments=4, batch_size=2)
    monkeypatch.undo()

    # strip the layout decision + flatten the written blocks to the legacy
    # layout (what a round-1 build left behind)
    pp = os.path.join(d, "manifest", "plan.json")
    plan = json.load(open(pp))
    del plan["term_buckets"]
    json.dump(plan, open(pp, "w"))
    import glob as _g
    import shutil as _sh

    for segdir in _g.glob(os.path.join(d, "blocks", "segment=*")):
        for bdir in _g.glob(os.path.join(segdir, "tbucket=*")):
            b = os.path.basename(bdir).split("=")[1]
            for f_ in _g.glob(os.path.join(bdir, "*.parquet")):
                # part files share names across bucket dirs — uniquify
                _sh.move(f_, os.path.join(segdir, f"b{b}-{os.path.basename(f_)}"))
            _sh.rmtree(bdir)  # leftovers: hadoop .crc shadow files

    # resume: must adopt term_buckets=None and complete on the flat layout
    seg.build_segments(source, d, num_segments=4, batch_size=2)
    plan2 = json.load(open(pp))
    assert plan2["term_buckets"] is None
    assert not _g.glob(os.path.join(d, "blocks", "segment=*", "tbucket=*"))
    idx = seg.read_index(spark, d)
    assert idx.term_buckets is None
    # queries still work (no bucket pruning, full correctness)
    s = IndexSearcher(idx)
    assert s.search(QUERY, k=5).count() == 5
    seg.check_index(idx)


def test_stats_refresh_drops_dead_vocabulary_buckets(spark, source, tmp_path_factory):
    """After delete + compaction removes a term, its stats row must vanish
    (static partition overwrite — dynamic mode would keep stale buckets)."""
    d = str(tmp_path_factory.mktemp("idx_deadterm"))
    seg.build_segments(source, d, num_segments=2, batch_size=2)
    # pick a low-frequency term and physically remove all its docs
    from pyspark.sql import functions as F

    ts = spark.read.parquet(os.path.join(d, "stats", "termstats"))
    victim = ts.orderBy(F.asc("doc_freq"), F.asc("term")).first()["term"]
    seg.delete_documents(spark, d, term=victim)
    seg.merge_segments(spark, d, group_size=2)
    ts2 = spark.read.parquet(os.path.join(d, "stats", "termstats"))
    assert ts2.filter(F.col("term") == victim).count() == 0
    s = IndexSearcher(seg.read_index(spark, d))
    assert s.count(victim) == 0  # the docFreq shortcut sees fresh stats
