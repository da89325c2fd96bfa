"""misc module ports: SweetSpotSimilarity, DiversifiedTopDocsCollector,
HighFreqTerms — each vs its DuckDB oracle plus semantic checks."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.collectors import diversified_topk, high_freq_terms
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.similarities import ClassicSimilarity, SweetSpotSimilarity
from lucene_spark import oracle_sql as osql

SF_DIR = "/root/testdata/sf0.001"
AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def idx(docs):
    return build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN).persist()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_sweetspot_defaults_degrade_to_classic():
    # the javadoc's "degrades to 1/sqrt(x)" holds wherever the float32
    # plateau arithmetic is exact: x>0 (the formula has no 0 special case)
    # and x small enough that (x-1)+1f doesn't round (x < 2^24)
    ss, cl = SweetSpotSimilarity(), ClassicSimilarity()
    from lucene_spark.analysis.smallfloat import LENGTH_TABLE

    mask = (LENGTH_TABLE > 0) & (LENGTH_TABLE < (1 << 24))
    assert np.array_equal(ss._table()[mask], cl._table()[mask])
    freq = np.arange(1, 50, dtype=np.int64)
    norms = np.full(50 - 1, 120, dtype=np.int64)
    a = ss.leaf_scorer(1.0, 10, 100, 1000).score(freq, norms)
    b = cl.leaf_scorer(1.0, 10, 100, 1000).score(freq, norms)
    assert np.array_equal(a, b)


def test_sweetspot_plateau_and_tf_floor():
    ss = SweetSpotSimilarity(ln_min=3, ln_max=9, steepness=0.5, tf_base=1.5, tf_min=2.0)
    t = ss._table()
    from lucene_spark.analysis.smallfloat import LENGTH_TABLE

    inside = np.where((LENGTH_TABLE >= 3) & (LENGTH_TABLE <= 9))[0]
    assert np.all(t[inside] == np.float32(1.0))
    # freq 1 and 2 both floor at tf_base
    leaf = ss.leaf_scorer(1.0, 10, 100, 1000)
    s = leaf.score(np.array([1, 2, 3]), np.array([3, 3, 3]))
    assert s[0] == s[1]
    assert s[2] > s[1]


def test_sweetspot_matches_oracle(spark, idx, ddb):
    s = IndexSearcher(
        idx,
        similarity=SweetSpotSimilarity(
            ln_min=2, ln_max=10, steepness=0.5, tf_base=1.5, tf_min=2.0
        ),
    )
    got = sorted(
        (int(r["doc_id"]), float(r["score"]), int(r["rank"]))
        for r in s.search("merge", k=10)
        .select(
            F.col("doc_id").cast("long"),
            F.col("score").cast("double"),
            F.col("rank").cast("int"),
        )
        .collect()
    )
    want = sorted(
        (int(r[0]), float(r[1]), int(r[2]))
        for r in ddb.execute(
            osql.sweetspot_term_topk_sql("merge", 2, 10, 0.5, 1.5, 2.0, 10)
        ).fetchall()
    )
    assert got == want


def test_diversified_matches_oracle_and_caps_keys(spark, idx, docs, ddb):
    s = IndexSearcher(idx)
    scored = s.score_all("merge")
    out = diversified_topk(scored, docs, "source", max_per_key=2, k=10)
    rows = out.select(
        F.col("doc_id").cast("long"),
        F.col("score").cast("double"),
        F.col("rank").cast("int"),
    ).collect()
    got = sorted((int(r["doc_id"]), float(r["score"]), int(r["rank"])) for r in rows)
    want = sorted(
        (int(r[0]), float(r[1]), int(r[2]))
        for r in ddb.execute(
            osql.diversified_topk_sql("merge", "source", 2, 10)
        ).fetchall()
    )
    assert got == want
    # per-key cap holds
    key_of = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    from collections import Counter

    counts = Counter(key_of[r["doc_id"]] for r in rows)
    assert max(counts.values()) <= 2
    # and it genuinely diversifies vs the vanilla top-10
    vanilla = [r["doc_id"] for r in s.search("merge", k=10).collect()]
    vcounts = Counter(key_of[d] for d in vanilla)
    if max(vcounts.values()) > 2:
        assert [r["doc_id"] for r in rows] != vanilla


def test_high_freq_terms_matches_oracle(spark, idx, ddb):
    got = [
        (r["term"], int(r["doc_freq"]), int(r["total_term_freq"]))
        for r in high_freq_terms(idx.termstats, 25, by="ttf").collect()
    ]
    want = [
        (r[0], int(r[1]), int(r[2]))
        for r in ddb.execute(osql.high_freq_terms_sql(25, by="ttf")).fetchall()
    ]
    assert got == want
    # df ordering variant agrees with the oracle too
    got_df = [
        (r["term"], int(r["doc_freq"]), int(r["total_term_freq"]))
        for r in high_freq_terms(idx.termstats, 25, by="df").collect()
    ]
    want_df = [
        (r[0], int(r[1]), int(r[2]))
        for r in ddb.execute(osql.high_freq_terms_sql(25, by="df")).fetchall()
    ]
    assert got_df == want_df


def test_doc_values_stats(spark):
    """DocValuesStats (misc/search/DocValuesStats.java): closed-form
    population stats equal a direct transcription of the reference's
    Welford accumulation to double rounding."""
    from lucene_spark.search.collectors import doc_values_stats

    vals = [3, 1, 4, 1, 5, 9, 2, 6, None, 5]
    docs = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, x long"
    )
    row = doc_values_stats(docs, "x").collect()[0]
    # reference Welford transcription (docID order)
    count = missing = 0
    mean = variance = 0.0
    mn, mx, total = float("inf"), float("-inf"), 0
    for v in vals:
        if v is None:
            missing += 1
            continue
        count += 1
        mn, mx, total = min(mn, v), max(mx, v), total + v
        old = mean
        mean += (v - mean) / count
        variance += (v - mean) * (v - old)
    assert (row["count"], row["missing"], row["sum"]) == (count, missing, total)
    assert (row["min"], row["max"]) == (mn, mx)
    assert row["mean"] == pytest.approx(mean, rel=1e-12)
    assert row["variance"] == pytest.approx(variance / count, rel=1e-12)
    assert row["stdev"] == pytest.approx((variance / count) ** 0.5, rel=1e-12)
    # empty doc set: undefined stats are NULL
    empty = doc_values_stats(docs.filter("doc_id < 0"), "x").collect()[0]
    assert empty["count"] == 0 and empty["mean"] is None
