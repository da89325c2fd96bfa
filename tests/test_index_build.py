"""Index build invariants (the CheckIndex pattern, FIXTURES.md §6)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis import StandardAnalyzer
from lucene_spark.analysis.smallfloat import int_to_byte4
from lucene_spark.index.builder import assign_doc_ids, build_index
from lucene_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    return synth_transcripts(spark, n_convs=120, seed=42).persist()


@pytest.fixture(scope="module")
def index(spark, transcripts):
    return build_index(transcripts, num_segments=5).persist()


def test_docids_dense_and_key_ordered(spark, transcripts, index):
    n = transcripts.count()
    dm = index.docmap
    assert dm.count() == n
    agg = dm.agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.countDistinct("doc_id").alias("nd"),
    ).collect()[0]
    assert agg["lo"] == 0 and agg["hi"] == n - 1 and agg["nd"] == n
    # doc_id order == (conv_id, turn_idx) order
    sample = dm.orderBy("doc_id").select("conv_id", "turn_idx").limit(500).collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in sample]
    assert keys == sorted(keys)
    # per-turn text equality under stable ordering (input_hint invariant)
    src = transcripts.select("conv_id", "turn_idx", F.col("text").alias("src_text"))
    joined = dm.join(src, ["conv_id", "turn_idx"])
    assert joined.filter(F.col("text") != F.col("src_text")).count() == 0
    # segments partition the docID space contiguously
    segs = (
        dm.groupBy("segment")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"), F.count("*").alias("n"))
        .orderBy("segment")
        .collect()
    )
    expected_lo = 0
    for s in segs:
        assert s["lo"] == expected_lo
        assert s["hi"] == s["lo"] + s["n"] - 1
        expected_lo = s["hi"] + 1


def test_docid_assignment_partition_count_independent(spark, transcripts):
    a = assign_doc_ids(transcripts, ["conv_id", "turn_idx"], num_segments=3)
    b = assign_doc_ids(transcripts, ["conv_id", "turn_idx"], num_segments=11)
    am = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.select("doc_id", "conv_id", "turn_idx").collect()}
    bm = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.select("doc_id", "conv_id", "turn_idx").collect()}
    assert am == bm


def test_postings_invariants(index):
    p = index.postings
    # freqs >= 1, unique (term, doc)
    assert p.filter(F.col("freq") < 1).count() == 0
    assert p.groupBy("term", "doc_id").count().filter(F.col("count") > 1).count() == 0
    # docFreq == number of postings rows; ttf == sum freq
    joined = (
        p.groupBy("field", "term")
        .agg(F.count("*").alias("df2"), F.sum("freq").alias("ttf2"))
        .join(index.termstats, ["field", "term"])
    )
    bad = joined.filter(
        (F.col("df2") != F.col("doc_freq")) | (F.col("ttf2") != F.col("total_term_freq"))
    )
    assert bad.count() == 0


def test_doclens_and_norms(spark, transcripts, index):
    dl = index.doclens
    assert dl.count() == transcripts.count()
    # norms match the reference quantization, spot-check via recompute
    rows = dl.limit(300).collect()
    for r in rows:
        assert r["norm_byte"] == int_to_byte4(r["len"])
    # analyzer consistency: len == token count of source text
    an = StandardAnalyzer()
    sample = (
        index.docmap.join(dl, "doc_id").select("text", "len").limit(200).collect()
    )
    for r in sample:
        assert len(an.analyze(r["text"])) == r["len"]


def test_fieldstats_consistency(index):
    fs = index.fieldstats.collect()[0]
    dl = index.doclens
    assert fs["doc_count"] == dl.filter(F.col("len") > 0).count()
    assert fs["sum_total_term_freq"] == dl.agg(F.sum("len")).collect()[0][0]
    ts_sum = index.termstats.agg(
        F.sum("doc_freq").alias("sdf"), F.sum("total_term_freq").alias("sttf")
    ).collect()[0]
    assert fs["sum_doc_freq"] == ts_sum["sdf"]
    assert fs["sum_total_term_freq"] == ts_sum["sttf"]


def test_postings_embed_norms(index):
    """Round 3: every flat posting row carries its doc's norm byte — no
    scoring path needs the corpus-sized doclens join."""
    assert "norm_byte" in index.postings.columns
    joined = index.postings.select("doc_id", "norm_byte").distinct().join(
        index.doclens.select("doc_id", F.col("norm_byte").alias("nb2")), "doc_id"
    )
    assert joined.filter(F.col("norm_byte") != F.col("nb2")).count() == 0


def test_positions_embed_norms(spark, transcripts):
    """Positional rows carry the SAME norm byte as doclens (doc length =
    surviving-token count is identical between the inversion UDF and the
    positional analysis UDF)."""
    idx = build_index(transcripts, num_segments=3, with_positions=True)
    assert "norm_byte" in idx.positions.columns
    joined = idx.positions.select("doc_id", "norm_byte").distinct().join(
        idx.doclens.select("doc_id", F.col("norm_byte").alias("nb2")), "doc_id"
    )
    assert joined.filter(F.col("norm_byte") != F.col("nb2")).count() == 0


def test_legacy_postings_fallback_join(spark, transcripts, index):
    """Back-compat: an index whose postings LACK the embedded norm column
    (pre-round-3 layout) still scores correctly via the doclens join."""
    from dataclasses import replace

    from lucene_spark.search.searcher import IndexSearcher

    legacy = replace(
        index,
        postings=index.postings.drop("norm_byte"),
        positions=None,
    )
    a = [(r.doc_id, r.score) for r in IndexSearcher(index).search("merge", k=10, strategy="flat").collect()]
    b = [(r.doc_id, r.score) for r in IndexSearcher(legacy).search("merge", k=10, strategy="flat").collect()]
    assert a == b


def test_norm_byte_sql_bit_parity(spark):
    """The JVM norm-byte expression (norm_byte_sql) must be bit-identical
    to SmallFloat.intToByte4 (int_to_byte4_np) — it replaced the pandas UDF
    in the build hot path (round 3 perf fix)."""
    from lucene_spark.analysis.smallfloat import int_to_byte4_np
    from lucene_spark.index.builder import norm_byte_sql

    vals = list(range(0, 4096)) + [
        2**k + d for k in range(12, 31) for d in (-1, 0, 1, 7, 123)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "len long").select(
        "len", norm_byte_sql("len").alias("nb")
    )
    got = {r.len: r.nb for r in df.collect()}
    want = int_to_byte4_np(np.array(vals))
    assert all(got[v] == w for v, w in zip(vals, want))
