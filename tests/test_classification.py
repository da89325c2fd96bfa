"""Classification module: Naive Bayes + KNN vs the DuckDB oracle and a
direct Python transcription of the reference math
(``classification/SimpleNaiveBayesClassifier.java``,
``KNearestNeighborClassifier.java``)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.index.builder import build_index
from lucene_spark.search.classification import (
    assign_class,
    bm25_nb_classify,
    knn_classify,
    knn_fuzzy_classify,
    naive_bayes_classify,
)
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
def classes(docs):
    return docs.select("doc_id", F.col("source").alias("class"))


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def _rows(df):
    return sorted(
        (int(r["input_id"]), r["class"], float(r["score"]), int(r["rank"]))
        for r in df.collect()
    )


def _oracle_rows(ddb, sql):
    return sorted(
        (int(r[0]), r[1], float(r[2]), int(r[3])) for r in ddb.execute(sql).fetchall()
    )


def test_naive_bayes_matches_oracle(spark, idx, classes, docs, ddb):
    inputs = docs.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("input_id"), "text"
    )
    got = _rows(naive_bayes_classify(idx, classes, inputs, AN, top_n=3))
    want = _oracle_rows(ddb, osql.naive_bayes_classify_sql("source", 30, 3))
    assert got == want
    # 30 inputs x top-3 classes
    assert len(got) == 90


def test_knn_matches_oracle(spark, idx, classes, docs, ddb):
    inputs = docs.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("input_id"), "text"
    )
    got = _rows(knn_classify(idx, classes, inputs, AN, k=10, top_n=3))
    want = _oracle_rows(ddb, osql.knn_classify_sql("source", 30, 10, 25, 1, 1, 3))
    assert got == want
    assert len(got) == 90


def test_knn_fuzzy_matches_oracle(spark, idx, classes, docs, ddb):
    inputs = docs.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("input_id"), "text"
    )
    got = _rows(knn_fuzzy_classify(idx, classes, inputs, AN, k=10, top_n=3))
    want = _oracle_rows(ddb, osql.knn_fuzzy_classify_sql("source", 30, 10, 3))
    assert got == want
    assert len(got) == 90


def test_knn_fuzzy_matches_misspellings(spark):
    """The fuzzy expansion is what distinguishes this classifier: a
    misspelled input ("sparc", "executer") still reaches the right class
    because each term fuzzifies against the dictionary (prefixLength 2,
    maxEdits 1 — NearestFuzzyQuery.java:55-58), while plain KNN's MLT
    selection finds no dictionary terms at all."""
    corpus = [
        "spark shuffle partition executor",
        "spark join broadcast executor",
        "cat dog pet animal",
        "dog animal veterinarian pet",
        "cat pet whiskers",
    ]
    labels = ["tech", "tech", "pets", "pets", "pets"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)
    classes = spark.createDataFrame(
        list(enumerate(labels)), "doc_id long, class string"
    )
    inputs = spark.createDataFrame(
        [(0, "sparc executer"), (1, "dob pet")], "input_id long, text string"
    )
    rows = knn_fuzzy_classify(idx, classes, inputs, AN, k=3, top_n=1).collect()
    by_input = {int(r["input_id"]): r["class"] for r in rows}
    assert by_input == {0: "tech", 1: "pets"}
    # plain KNN sees no dictionary terms for the all-misspelled input
    assert (
        knn_classify(idx, classes, inputs.filter(F.col("input_id") == 0), AN, k=3)
        .count()
        == 0
    )


def test_bm25_nb_matches_oracle(spark, idx, docs, ddb):
    from lucene_spark.analysis.analyzer import KeywordAnalyzer
    from lucene_spark.index.builder import build_index, combine_fields

    # the class field is KEYWORD-indexed (whole untokenized values) per
    # the reference's class-field contract
    cidx = build_index(
        docs.select("doc_id", F.col("source").alias("text")),
        text_col="text", doc_id_col="doc_id",
        analyzer=KeywordAnalyzer(), field="class",
    )
    midx = combine_fields(idx, cidx)
    inputs = docs.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("input_id"), "text"
    )
    got = _rows(bm25_nb_classify(midx, inputs, AN, top_n=3))
    want = _oracle_rows(ddb, osql.bm25_nb_classify_sql("source", 30, 3))
    assert got == want
    assert len(got) == 90
    # softmax: per input the scores over ALL classes sum to ~1
    full = bm25_nb_classify(midx, inputs, AN, top_n=10**9).collect()
    by_input = {}
    for r in full:
        by_input.setdefault(int(r["input_id"]), 0.0)
        by_input[int(r["input_id"])] += r["score"]
    assert all(abs(s - 1.0) < 1e-9 for s in by_input.values())


def test_bm25_nb_deleted_class_and_missing_field(spark):
    """A class whose docs are ALL deleted still enumerates from the terms
    dictionary at raw = 0 (prior 0, every P = 1 — BM25NBClassifier
    :219,:230); an index with no class field yields an empty result."""
    from lucene_spark.analysis.analyzer import KeywordAnalyzer
    from lucene_spark.index.builder import build_index, combine_fields, delete_by_ids

    corpus = [(0, "spark executor", "tech"), (1, "dog pet", "pets")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, cls string")
    ti = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)
    ci = build_index(
        docs.select("doc_id", F.col("cls").alias("text")),
        text_col="text", doc_id_col="doc_id",
        analyzer=KeywordAnalyzer(), field="class",
    )
    midx = delete_by_ids(
        combine_fields(ti, ci),
        spark.createDataFrame([(1,)], "doc_id long"),  # kill all of "pets"
    )
    inputs = spark.createDataFrame([(0, "spark")], "input_id long, text string")
    rows = {
        r["class"]: r["score"]
        for r in bm25_nb_classify(midx, inputs, AN, top_n=5).collect()
    }
    # pets survives at raw = 0 exactly as the reference computes — and on
    # this tiny corpus that OUTRANKS tech, whose raw = ln(sc) + Σ ln P is
    # negative (BM25 leaf scores < 1 ⇒ negative logs); the deleted class
    # is not dropped, it rides the softmax at e^0
    assert set(rows) == {"tech", "pets"}
    assert rows["pets"] > rows["tech"] > 0.0
    assert abs(sum(rows.values()) - 1.0) < 1e-12
    # no class field at all -> empty typed frame, no crash
    assert bm25_nb_classify(ti, inputs, AN).count() == 0


def test_knn_unlabeled_docs_are_not_hits(spark):
    """The class-exists wildcard rides as a scoring MUST (knnSearch,
    KNearestNeighborClassifier.java:174-176): on a partially-labeled
    corpus, unlabeled docs can never occupy top-k slots — the k nearest
    LABELED docs vote, and max_score comes from a labeled doc."""
    corpus = [
        (0, "spark executor shuffle"),  # labeled tech
        (1, "spark executor"),  # unlabeled — the HIGHEST-scoring doc
        (2, "spark executor broadcast"),  # unlabeled
        (3, "dog cat pet"),  # labeled pets (no query-term overlap)
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    idx = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)
    classes = spark.createDataFrame(
        [(0, "tech"), (3, "pets")], "doc_id long, class string"
    )
    inputs = spark.createDataFrame(
        [(0, "spark executor")], "input_id long, text string"
    )
    # With the wildcard enforced the ONLY hit is labeled doc 0, so
    # max_score is its own score and the vote is exactly
    # (1 · (s/s))/k · k/1 = 1.0.  Were unlabeled docs admitted as hits,
    # doc 1 (shortest, highest BM25) would hold max_score and the
    # surviving vote would be s0/s1 < 1.
    for fn in (knn_classify, knn_fuzzy_classify):
        rows = fn(idx, classes, inputs, AN, k=2, top_n=2).collect()
        assert [(r["class"], r["rank"]) for r in rows] == [("tech", 0)]
        assert rows[0]["score"] == pytest.approx(1.0, abs=0.0)


def _nb_reference(corpus, labels, text):
    """Line-for-line double transcription of SimpleNaiveBayesClassifier
    (:137-231, :279-319) over a token-list corpus."""
    tokens = [AN.analyze(t) for t in corpus]
    classes = sorted(set(labels))
    docs_with_class = len(labels)
    # avg unique terms per doc over docs with at least one token
    non_empty = [t for t in tokens if t]
    sum_doc_freq = sum(len(set(t)) for t in non_empty)
    avg_unique = sum_doc_freq / float(len(non_empty))
    q = AN.analyze(text)
    out = {}
    for c in classes:
        dfc = sum(1 for l in labels if l == c)
        prior = math.log(dfc) - math.log(docs_with_class)
        ll = 0.0
        for w in q:
            hits = sum(
                1 for t, l in zip(tokens, labels) if l == c and w in set(t)
            )
            ll += math.log((hits + 1) / (avg_unique * dfc + docs_with_class))
        out[c] = prior + ll
    # softmax
    smax = max(out.values())
    loga = smax + math.log(sum(math.exp(v - smax) for v in out.values()))
    return {c: math.exp(v - loga) for c, v in out.items()}


def test_naive_bayes_semantics_tiny(spark):
    corpus = [
        "spark shuffle partition executor",
        "spark join broadcast executor",
        "cat dog pet animal",
        "dog animal veterinarian pet",
        "cat pet whiskers",
    ]
    labels = ["tech", "tech", "pets", "pets", "pets"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)
    classes = spark.createDataFrame(
        list(enumerate(labels)), "doc_id long, class string"
    )
    for text in ["spark executor broadcast", "dog cat pet", "spark dog"]:
        want = _nb_reference(corpus, labels, text)
        best = max(want, key=want.get)
        assert sum(1 for v in want.values() if v == want[best]) == 1
        got = assign_class(idx, classes, text, AN, method="naive_bayes")
        assert got is not None
        assert got[0] == best
        assert got[1] == pytest.approx(want[best], rel=1e-5)


def test_knn_semantics_tiny(spark):
    corpus = [
        "spark shuffle partition executor",
        "spark join broadcast executor",
        "cat dog pet animal",
        "dog animal veterinarian pet",
        "cat pet whiskers",
    ]
    labels = ["tech", "tech", "pets", "pets", "pets"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)
    classes = spark.createDataFrame(
        list(enumerate(labels)), "doc_id long, class string"
    )
    got = assign_class(idx, classes, "spark executor shuffle", AN, method="knn", k=3)
    assert got is not None and got[0] == "tech"
    got = assign_class(idx, classes, "cat dog animal", AN, method="knn", k=3)
    assert got is not None and got[0] == "pets"
    # fewer matches than k: the sumdoc<k correction renormalizes to 1
    inputs = spark.createDataFrame(
        [(0, "whiskers")], "input_id long, text string"
    )
    rows = knn_classify(idx, classes, inputs, AN, k=5, top_n=5).collect()
    assert sum(r["score"] for r in rows) == pytest.approx(1.0)


def test_zero_token_input_keeps_prior_only(spark):
    corpus = ["spark executor", "dog pet"]
    labels = ["tech", "pets"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer=AN)
    classes = spark.createDataFrame(
        list(enumerate(labels)), "doc_id long, class string"
    )
    # "the" is a stopword: the token stream is empty, priors decide (equal
    # priors here -> uniform softmax, tie broken class ASC)
    inputs = spark.createDataFrame([(7, "the")], "input_id long, text string")
    rows = naive_bayes_classify(idx, classes, inputs, AN, top_n=2).collect()
    assert {r["class"] for r in rows} == {"tech", "pets"}
    for r in rows:
        assert r["score"] == pytest.approx(0.5)
