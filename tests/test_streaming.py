"""Percolator (reverse search) + NRT streaming segment appends."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_spark.index.segments import read_index
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.streaming.ingest import append_batch, update_documents
from lucene_spark.streaming.percolator import Monitor


@pytest.fixture(scope="module")
def monitor(spark):
    from lucene_spark.session import ship_package

    ship_package(spark)
    return Monitor(
        spark,
        {
            1: "spark",
            2: "index AND query",
            3: "vector OR stream",
            4: "merge AND NOT window",
            5: "missingterm",
        },
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_percolator_matches(spark, monitor):
    batch = _batch(
        spark,
        [
            ("c0", 0, "spark makes the index fast"),
            ("c0", 1, "index query planning"),
            ("c1", 0, "a vector of values"),
            ("c1", 1, "merge the window state"),
            ("c1", 2, "merge two runs"),
            ("c2", 0, "nothing relevant here"),
        ],
    )
    got = {
        (r.conv_id, r.turn_idx, r.query_id) for r in monitor.match_batch(batch).collect()
    }
    assert got == {
        ("c0", 0, 1),  # 'spark'
        ("c0", 1, 2),  # index AND query
        ("c1", 0, 3),  # vector
        ("c1", 2, 4),  # merge AND NOT window ('c1',1 has window → excluded)
    }


def test_percolator_prefix_clauses(spark):
    """Prefix term-acceptors (Presearcher analog): 'mer*' style clauses in
    every occur position; multi-term prefix hits count the clause ONCE."""
    mon = Monitor(
        spark,
        {
            1: "ind*",                    # pure prefix
            2: "quer* AND NOT spar*",     # prefix MUST + prefix NOT
            3: "merge AND ind*",          # term + prefix conjunction
        },
    )
    batch = _batch(
        spark,
        [
            ("c0", 0, "index indexing query"),  # two ind* hits = one clause
            ("c0", 1, "query spark"),
            ("c1", 0, "merge index done"),
            ("c1", 1, "nothing here"),
        ],
    )
    got = {
        (r.conv_id, r.turn_idx, r.query_id) for r in mon.match_batch(batch).collect()
    }
    assert got == {
        ("c0", 0, 1),
        ("c1", 0, 1),
        ("c0", 0, 2),  # query matches quer*, no spar*
        ("c1", 0, 3),
    }


def test_percolator_metadata_and_stats(spark):
    """MonitorQuery metadata + registry introspection + match telemetry
    (``monitor/MonitorQuery.java:34-60``, ``Monitor.java:238-270``)."""
    mon = Monitor(spark, {1: "spark", 2: "index AND query"})
    assert mon.get_query_count() == 2
    assert mon.get_query_ids() == [1, 2]
    assert mon.get_query(1) == ("spark", {})
    mon.register(3, "vector", metadata={"owner": "alerts", "tier": "p1"})
    assert mon.get_query(3) == ("vector", {"owner": "alerts", "tier": "p1"})
    assert mon.get_query_count() == 3
    mon.unregister(3)
    assert mon.get_query(3) is None and mon.get_query_count() == 2
    batch = _batch(
        spark,
        [
            ("c0", 0, "spark makes the index fast"),
            ("c0", 1, "index query planning"),
            ("c2", 0, "nothing relevant"),
        ],
    )
    matches, stats = mon.match_batch_with_stats(batch)
    assert stats["queries_registered"] == 2
    assert stats["per_query_matches"] == {1: 1, 2: 1}
    assert stats["queries_matched"] == 2
    assert stats["match_pairs"] == 2 == matches.count()
    assert stats["wall_sec"] > 0


def test_percolator_rejects_unsupported(spark):
    # fuzzy acceptors (round 4) are distance-1 only
    with pytest.raises(ValueError):
        Monitor(spark, {1: "fuzz~2"})


def test_percolator_sloppy_phrase_clauses(spark):
    """Sloppy phrases (r4): presearch on the distinct terms, then the
    engine's SloppyPhraseMatcher decides per candidate doc."""
    mon = Monitor(
        spark,
        {
            1: '"merge runs"~2',                # slop 2, reorder costs extra
            2: 'spark AND "index fast"~1',      # term + sloppy conjunction
            3: '"table value"',                  # exact stays exact
        },
    )
    batch = _batch(
        spark,
        [
            ("c0", 0, "merge the two runs"),        # 1 gap ≤ 2 ✓
            ("c0", 1, "merge a b c runs"),          # 3 gaps > 2 ✗
            ("c0", 2, "runs then merge"),           # reversed: cost 3 > 2 ✗
            ("c1", 0, "spark index is fast"),       # gap 1 ≤ 1 ✓
            ("c1", 1, "index is fast no spark"),    # wait — has spark! see below
            ("c2", 0, "table value here"),           # exact ✓
            ("c2", 1, "table some value"),           # exact ✗
        ],
    )
    got = {
        (r.conv_id, r.turn_idx, r.query_id) for r in mon.match_batch(batch).collect()
    }
    # ('c1', 1) contains spark AND "index [is] fast" with one gap ≤ 1 → matches 2
    assert got == {
        ("c0", 0, 1),
        ("c1", 0, 2),
        ("c1", 1, 2),
        ("c2", 0, 3),
    }


def test_percolator_near_span_clauses(spark):
    """r5: two-term NEAR span clauses in surround syntax — presearch MUST
    of both terms, interval-pair verify (ordered gaps ≤ slop; unordered
    distinct-position window)."""
    mon = Monitor(
        spark,
        {
            1: "2W(scan, merge)",  # ordered, slop 1
            2: "2N(filter, sort)",  # unordered, slop 1
        },
    )
    batch = _batch(
        spark,
        [
            ("c0", 0, "scan then merge now"),    # scan@0 merge@2: gaps 1 ✓
            ("c0", 1, "scan a b merge"),         # gaps 2 > 1 ✗
            ("c0", 2, "merge scan"),             # reversed: ordered ✗
            ("c1", 0, "sort the filter"),        # unordered gaps 1 ✓
            ("c1", 1, "filter sort"),            # adjacent ✓
            ("c1", 2, "filter a b c sort"),      # gaps 3 ✗
            ("c1", 3, "filter only"),            # presearch kills (no sort)
        ],
    )
    got = {
        (r.conv_id, r.turn_idx, r.query_id) for r in mon.match_batch(batch).collect()
    }
    assert got == {("c0", 0, 1), ("c1", 0, 2), ("c1", 1, 2)}
    # register/unregister cycle keeps working with span clauses
    mon.register(3, "1W(scan, merge)")  # slop 0: adjacency only
    got2 = {
        (r.conv_id, r.turn_idx, r.query_id) for r in mon.match_batch(batch).collect()
    }
    assert ("c0", 0, 3) not in got2  # scan..merge has a gap
    mon.unregister(1)
    got3 = {r.query_id for r in mon.match_batch(batch).collect()}
    assert 1 not in got3
    # envelope: >2 clauses / repeated operands stay rejected
    import pytest as _pt

    with _pt.raises(ValueError):
        Monitor(spark, {9: "2W(a, b, c)"})


def test_percolator_wildcard_clauses(spark):
    """General wildcard acceptors ('s?an' shapes): broadcast LIKE join;
    prefix-shaped wildcards keep riding the cheaper substring equi-join."""
    mon = Monitor(
        spark,
        {
            1: "s?ark",                # ? wildcard
            2: "m*e AND NOT f?st",     # inner-star MUST + wildcard NOT
        },
    )
    batch = _batch(
        spark,
        [
            ("c0", 0, "spark shark stark"),   # 3 matches = one clause hit
            ("c0", 1, "merge was fast"),      # m*e but f?st blocks
            ("c1", 0, "make it mode"),        # m*e twice, no f?st
            ("c1", 1, "nothing"),
        ],
    )
    got = {
        (r.conv_id, r.turn_idx, r.query_id) for r in mon.match_batch(batch).collect()
    }
    assert got == {("c0", 0, 1), ("c1", 0, 2)}


def test_percolator_fuzzy_clauses(spark):
    """Distance-1 fuzzy acceptors: OSA semantics (substitution, indel, and
    one adjacent transposition each = 1 edit); distance-2 terms miss."""
    mon = Monitor(
        spark,
        {
            1: "megre~1",            # transposed registration
            2: "spark AND fasst~1",  # term + fuzzy conjunction
        },
    )
    batch = _batch(
        spark,
        [
            ("c0", 0, "merge the runs"),    # OSA(merge, megre) = 1 ✓
            ("c0", 1, "marge here"),        # OSA(marge, megre) = 2 ✗
            ("c1", 0, "spark is fast"),     # fast ← fasst: one deletion ✓
            ("c1", 1, "fast alone"),        # missing MUST spark
        ],
    )
    got = {
        (r.conv_id, r.turn_idx, r.query_id) for r in mon.match_batch(batch).collect()
    }
    assert got == {("c0", 0, 1), ("c1", 0, 2)}


def test_percolator_foreachbatch_stream(spark, monitor, tmp_path):
    """End-to-end micro-batch stream through the percolator (rate-less:
    a file source fed by one parquet drop)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _batch(spark, [("s0", 0, "spark streaming test")]).write.parquet(src)
    stream = spark.readStream.schema("conv_id string, turn_idx int, text string").parquet(src)
    q = monitor.run_stream(stream, ckpt, out)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out).collect()
    assert {(r.conv_id, r.turn_idx, r.query_id) for r in got} == {("s0", 0, 1)}


def test_nrt_append_batches(spark, tmp_path):
    """Two appended micro-batches = two segments, contiguous docIDs,
    searchable after each commit, idempotent on epoch replay."""
    d = str(tmp_path / "idx")
    r1 = append_batch(
        _batch(spark, [("a", 0, "spark index alpha"), ("a", 1, "beta spark")]),
        d,
        epoch_id=0,
    )
    assert r1["segment"] == 0 and r1["rows"] == 2 and r1["doc_base"] == 0

    idx1 = read_index(spark, d)
    s1 = IndexSearcher(idx1)
    assert s1.search("spark", k=10).count() == 2

    r2 = append_batch(
        _batch(spark, [("b", 0, "gamma spark late arrival")]), d, epoch_id=1
    )
    assert r2["segment"] == 1 and r2["doc_base"] == 2

    idx2 = read_index(spark, d)
    s2 = IndexSearcher(idx2)
    assert s2.search("spark", k=10).count() == 3
    # stats freshness: docFreq('spark') spans both segments
    st = {
        (r.field, r.term): r.doc_freq
        for r in idx2.termstats.filter(F.col("term") == "spark").collect()
    }
    assert st[("text", "spark")] == 3

    # epoch replay (streaming retry) is a no-op
    r3 = append_batch(
        _batch(spark, [("b", 0, "gamma spark late arrival")]), d, epoch_id=1
    )
    assert r3.get("skipped") is True
    assert IndexSearcher(read_index(spark, d)).search("spark", k=10).count() == 3


def test_update_documents(spark, tmp_path):
    """updateDocument = atomic delete-by-key + add: new version wins."""
    d = str(tmp_path / "idx_upd")
    append_batch(
        _batch(spark, [("a", 0, "old spark text"), ("a", 1, "keep me spark")]),
        d,
        epoch_id=0,
    )
    rec = update_documents(
        _batch(spark, [("a", 0, "new replacement words")]), d, epoch_id=1
    )
    assert rec["deleted"] == 1

    idx = read_index(spark, d)
    s = IndexSearcher(idx)
    assert s.count("old") == 0  # old version invisible
    assert s.count("replacement") == 1
    assert s.count("spark") == 1  # only the untouched turn remains
    # docmap still has the tombstoned row until compaction; deletes table set
    assert idx.deletes is not None and idx.deletes.count() == 1


def test_update_documents_replay_is_noop(spark, tmp_path):
    """At-least-once foreachBatch replay of a committed update epoch must not
    soft-delete the replacement docs written by the first attempt."""
    d = str(tmp_path / "idx_upd_replay")
    append_batch(
        _batch(spark, [("a", 0, "old spark text"), ("a", 1, "keep me spark")]),
        d,
        epoch_id=0,
    )
    update_documents(_batch(spark, [("a", 0, "new replacement words")]), d, epoch_id=1)
    # replay of the SAME epoch: must skip before computing victims
    rec = update_documents(
        _batch(spark, [("a", 0, "new replacement words")]), d, epoch_id=1
    )
    assert rec.get("skipped") is True and rec["deleted"] == 0
    s = IndexSearcher(read_index(spark, d))
    assert s.count("replacement") == 1  # replacement still visible
    assert s.count("old") == 0


def test_monitor_register_unregister(spark):
    """Monitor.register / deleteById: query-set updates take effect for the
    next batch (Monitor.java register/deleteById)."""
    from lucene_spark.streaming.percolator import Monitor

    mon = Monitor(spark, {1: "spark"}, key_cols=("doc_id",), text_col="text")
    batch = spark.createDataFrame(
        [(0, "spark rows"), (1, "only words here")], "doc_id long, text string"
    )
    assert {(r.doc_id, r.query_id) for r in mon.match_batch(batch).collect()} == {(0, 1)}
    mon.register(2, "words AND here")
    got = {(r.doc_id, r.query_id) for r in mon.match_batch(batch).collect()}
    assert got == {(0, 1), (1, 2)}
    mon.unregister(1)
    got = {(r.doc_id, r.query_id) for r in mon.match_batch(batch).collect()}
    assert got == {(1, 2)}


def test_percolator_phrase_positionally_verified(spark):
    """Phrase percolation: term-presearch candidates are verified with
    positions — both-terms-but-not-adjacent docs must NOT match."""
    from lucene_spark.streaming.percolator import Monitor

    mon = Monitor(
        spark,
        {1: '"quick fox"', 2: 'lazy AND "quick fox"', 3: "quick"},
        key_cols=("doc_id",),
        text_col="text",
    )
    batch = spark.createDataFrame(
        [
            (0, "the quick fox jumps"),        # phrase present
            (1, "quick brown fox"),            # terms present, NOT adjacent
            (2, "lazy dog quick fox naps"),    # phrase + lazy
            (3, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.query_id) for r in mon.match_batch(batch).collect()}
    assert got == {(0, 1), (2, 1), (2, 2), (0, 3), (1, 3), (2, 3)}


def test_append_honors_custom_bucket_layout(spark, tmp_path):
    """A streaming append to an index built with a non-default term_buckets
    must bucket its blocks with the SAME hash%B, or the appended docs would
    be invisible to the pruned query scan."""
    import glob
    import os

    from lucene_spark.index import segments as seg
    from lucene_spark.sources.transcripts import synth_transcripts

    d = str(tmp_path / "idx_custom_buckets")
    turns = synth_transcripts(spark, n_convs=40, seed=31, num_partitions=2)
    seg.build_segments(turns, d, num_segments=2, batch_size=2, term_buckets=32)

    n_before = IndexSearcher(seg.read_index(spark, d)).count("spark")
    append_batch(
        _batch(spark, [("zzz", 0, "fresh spark turn appended")]), d, epoch_id=0
    )
    # every block partition (old and appended) uses %32 buckets
    buckets = {
        int(p.split("=")[-1])
        for p in glob.glob(os.path.join(d, "blocks", "segment=*", "tbucket=*"))
    }
    assert max(buckets) >= 16  # %16 layout could never produce a bucket >= 16
    idx = seg.read_index(spark, d)
    assert idx.term_buckets == 32
    # the appended doc is found through the bucket-pruned scan
    assert IndexSearcher(idx).count("spark") == n_before + 1
    seg.check_index(idx)  # incl. the tbucket-consistency invariant
