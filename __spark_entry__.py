"""Driver contract for the spark-graft builder (PySpark target).

Flagship engine: ``lucene_spark`` — a PySpark-native inverted-index +
BM25 full-text engine (see SURVEY.md).  The correctness-gate corpus is the
driver-provided ``documents`` table (dense ``doc_id``, simple-word text);
each ``queries()`` entry has a DuckDB ``oracle_sql()`` twin that recomputes
the identical float32 BM25 pipeline in pure SQL (lucene_spark/oracle_sql.py).
"""

from __future__ import annotations

import os
import sys

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:  # driver-side import safety for any cwd
    sys.path.insert(0, _REPO_DIR)

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark import oracle_sql as osql
from lucene_spark.extras import oracles as xor
from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_spark.analysis.smallfloat import byte4_to_int_np
from lucene_spark.index.builder import IndexTables, build_index
from lucene_spark.search.searcher import IndexSearcher

_CACHE: dict[str, IndexSearcher] = {}

GATE_ANALYZER = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


def _searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    if sf_dir not in _CACHE:
        from lucene_spark.session import ship_package

        ship_package(spark)  # executors import lucene_spark from a shipped zip
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = build_index(
            docs,
            text_col="text",
            doc_id_col="doc_id",
            analyzer=GATE_ANALYZER,
            build_blocks=True,  # term/AND/OR gate queries run block-max WAND
            with_positions=True,  # phrase gate query
        ).persist()
        # per-doc KNN vectors (vec_id == doc_id in the gate corpus) — the
        # KnnFloatVectorQuery composable-vector-search path
        idx.vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").alias("doc_id"), "embedding"
        )
        _CACHE[sf_dir] = IndexSearcher(idx)
    return _CACHE[sf_dir]


def _as_gate_schema(topk: DataFrame) -> DataFrame:
    return topk.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("score").cast("double").alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 for merge AND join."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    return _as_gate_schema(s.search("merge AND join", k=10))


# ---------------------------------------------------------------- gate queries


def _q_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _as_gate_schema(_searcher(spark, sf_dir).search("merge", k=10))


def _q_and_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _as_gate_schema(_searcher(spark, sf_dir).search("merge AND join", k=10))


def _q_or_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _as_gate_schema(_searcher(spark, sf_dir).search("spark OR vector", k=15))


def _q_and_not_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _as_gate_schema(
        _searcher(spark, sf_dir).search("merge AND NOT window", k=10)
    )


def _q_wand_or3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-term disjunction forced through the block-max WAND kernel."""
    return _as_gate_schema(
        _searcher(spark, sf_dir).search("data OR row OR scan", k=12, strategy="wand")
    )


def _q_flat_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as the WAND term query, forced through the flat plan."""
    return _as_gate_schema(
        _searcher(spark, sf_dir).search("batch", k=10, strategy="flat")
    )


def _q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase over positional postings."""
    return _as_gate_schema(_searcher(spark, sf_dir).search('"table value"', k=10))


def _q_term_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _searcher(spark, sf_dir).count("merge")
    return spark.createDataFrame([(n,)], "n_hits long")


def _q_doclens_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _searcher(spark, sf_dir).index

    @F.pandas_udf(T.LongType())
    def qlen(norm_byte: pd.Series) -> pd.Series:
        return pd.Series(byte4_to_int_np(norm_byte.to_numpy()), dtype="int64")

    return idx.doclens.select(
        F.col("doc_id").cast("long"),
        F.col("len").cast("int").alias("len"),
        F.col("norm_byte").cast("short").alias("norm_byte"),
        qlen(F.col("norm_byte")).alias("qlen"),
    )


def _q_termstats_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _searcher(spark, sf_dir).index
    return (
        idx.termstats.orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(50)
        .select("term", "doc_freq", "total_term_freq")
    )


def _q_classic_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(_searcher(spark, sf_dir).index, similarity="classic")
    return _as_gate_schema(s.search("merge", k=10))


def _q_boolean_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(_searcher(spark, sf_dir).index, similarity="boolean")
    return _as_gate_schema(s.search("merge", k=400))


def _q_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _as_gate_schema(_searcher(spark, sf_dir).search("mer*", k=400))


def _q_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _as_gate_schema(_searcher(spark, sf_dir).search("s?an", k=400))


def _q_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _as_gate_schema(_searcher(spark, sf_dir).search("merge~1", k=400))


def _q_fuzzy_blended_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FuzzyQuery with Lucene's scoring default (TOP_TERMS_BLENDED_FREQ):
    expanded terms score with similarity boosts + blended stats instead of
    constant 1.0."""
    from lucene_spark.search.query import FuzzyQuery

    q = FuzzyQuery("merge", max_edits=1, rewrite_method="top_terms_blended")
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=10))


def _q_prefix_scoring_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PrefixQuery with SCORING_BOOLEAN_REWRITE: ranked hits, each expanded
    term contributing its own BM25 score."""
    from lucene_spark.search.query import PrefixQuery

    q = PrefixQuery("mer", rewrite_method="scoring_boolean")
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=10))


def _q_sloppy_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy phrase with SloppyPhraseMatcher semantics (fractional float32
    sloppyFreq = Σ 1/(1+matchLength); see searcher._score_sloppy_phrase)."""
    return _as_gate_schema(_searcher(spark, sf_dir).search('"table value"~3', k=10))


def _q_dismax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.query import DisjunctionMaxQuery, TermQuery

    q = DisjunctionMaxQuery((TermQuery("data"), TermQuery("scan")), tie_breaker=0.3)
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=12))


def _q_synonym_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.query import SynonymQuery

    q = SynonymQuery(("fast", "slow"))
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=12))


def _q_bool_mixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUST + SHOULD×2 + MUST_NOT, answered by the Boolean WAND kernel
    (strategy='wand' asserts the kernel accepts the shape)."""
    from lucene_spark.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )

    q = BooleanQuery(
        (
            BooleanClause(Occur.MUST, TermQuery("merge")),
            BooleanClause(Occur.SHOULD, TermQuery("data")),
            BooleanClause(Occur.SHOULD, TermQuery("row")),
            BooleanClause(Occur.MUST_NOT, TermQuery("window")),
        )
    )
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=12, strategy="wand"))


def _q_nested_bool_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge AND (data OR row) — nested disjunction inside a conjunction,
    served by the Boolean WAND kernel (the q_bool_nested query class)."""
    return _as_gate_schema(
        _searcher(spark, sf_dir).search(
            "merge AND (data OR row)", k=12, strategy="wand"
        )
    )


def _q_msm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )

    q = BooleanQuery(
        tuple(
            BooleanClause(Occur.SHOULD, TermQuery(t)) for t in ("data", "row", "scan")
        ),
        minimum_should_match=2,
    )
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=12))


# ------------------------------------------------------ collectors gate


def _q_facet_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import facet_counts

    s = _searcher(spark, sf_dir)
    return facet_counts(s.score_all("merge"), _docs(spark, sf_dir), "source")


def _q_facet_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical facets: counts at every source/lang path prefix."""
    from lucene_spark.search.collectors import taxonomy_facet_counts

    s = _searcher(spark, sf_dir)
    return taxonomy_facet_counts(
        s.score_all("merge"), _docs(spark, sf_dir), ["source", "lang"]
    )


_NCHAR_RANGES = (("small", 0, 200), ("mid", 200, 350), ("big", 350, 10_000))


def _q_range_facet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import range_facet_counts

    s = _searcher(spark, sf_dir)
    return range_facet_counts(
        s.score_all("merge"), _docs(spark, sf_dir), "n_chars", _NCHAR_RANGES
    )


def _q_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import grouped_topk

    s = _searcher(spark, sf_dir)
    out = grouped_topk(s.score_all("merge"), _docs(spark, sf_dir), "source", 2)
    return out.withColumn("score", F.col("score").cast("double"))


def _q_block_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import block_join_parents

    s = _searcher(spark, sf_dir)
    out = block_join_parents(s.score_all("merge"), _docs(spark, sf_dir), "source", "max")
    return out.withColumn("score", F.col("score").cast("double"))


def _q_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import search_after

    s = _searcher(spark, sf_dir)
    scored = s.score_all("merge")
    page1 = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10).collect()
    anchor = page1[-1]
    out = search_after(scored, anchor.score, anchor.doc_id, 10)
    return out.withColumn("score", F.col("score").cast("double"))


def _q_sort_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import sort_topk

    s = _searcher(spark, sf_dir)
    out = sort_topk(s.score_all("merge"), _docs(spark, sf_dir), [("n_chars", True)], 10)
    return out.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "rank"
    )


def _q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import function_score

    # integer-exact expression: no transcendental cross-engine drift
    return function_score(
        _docs(spark, sf_dir),
        "(n_chars % 97) * 0.5 + (doc_id % 7)",
        k=10,
    )


def _q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import rrf

    s = _searcher(spark, sf_dir)
    return rrf([s.score_all("merge"), s.score_all("join")], k=60, top_n=15)


def _q_bm25_params_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with non-default k1=0.9, b=0.4 (parameterized similarity)."""
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(_searcher(spark, sf_dir).index, k1=0.9, b=0.4)
    return _as_gate_schema(s.search("merge", k=10))


def _q_lmdirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(_searcher(spark, sf_dir).index, similarity="lmdirichlet")
    return _as_gate_schema(s.search("merge", k=10))


def _q_similarity_topk(similarity: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from lucene_spark.search.searcher import IndexSearcher

        s = IndexSearcher(_searcher(spark, sf_dir).index, similarity=similarity)
        return _as_gate_schema(s.search("merge", k=10))

    return q


def _q_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IndexSearcher.explain: score breakdown of the top 'merge' hit."""
    s = _searcher(spark, sf_dir)
    top = s.search("merge", k=1).collect()[0]
    e = s.explain("merge", top.doc_id)
    return spark.createDataFrame(
        [(e["doc_id"], e["freq"], e["doc_len"], float(e["idf"]), float(e["score"]))],
        "doc_id long, freq int, doc_len int, idf double, score double",
    )


def _q_term_range_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermRangeQuery [mer TO mes] (lexicographic terms-dict range)."""
    return _as_gate_schema(_searcher(spark, sf_dir).search("[mer TO mes]", k=400))


def _q_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QueryRescorer: top-30 of 'merge' re-ranked with 0.5x 'join' scores."""
    from lucene_spark.search.collectors import rescore
    from pyspark.sql import Window

    s = _searcher(spark, sf_dir)
    first = (
        s.score_all("merge").orderBy(F.desc("score"), F.asc("doc_id")).limit(30)
    )
    out = rescore(first, s.score_all("join"), weight_first=1.0, weight_second=0.5)
    topk = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return _as_gate_schema(topk.withColumn("rank", w.cast("int")))


def _q_feature_score_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FeatureField: BM25('merge') + saturation(n_chars/1000) feature."""
    from lucene_spark.search.features import feature_score
    from pyspark.sql import Window

    s = _searcher(spark, sf_dir)
    out = feature_score(
        s.score_all("merge"),
        _docs(spark, sf_dir),
        "n_chars / 1000.0",
        function="saturation",
        weight=2.0,
        pivot=0.5,
    )
    topk = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return _as_gate_schema(topk.withColumn("rank", w.cast("int")))


def _q_multi_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiSimilarity(BM25 + Classic): sub-scores summed."""
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.search.similarities import (
        BM25Similarity,
        ClassicSimilarity,
        MultiSimilarity,
    )

    sim = MultiSimilarity([BM25Similarity(), ClassicSimilarity()])
    s = IndexSearcher(_searcher(spark, sf_dir).index, similarity=sim)
    return _as_gate_schema(s.search("merge", k=10))


def _q_percolator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse search: registered queries matched against the doc batch."""
    from lucene_spark.streaming.percolator import Monitor

    mon = Monitor(
        spark,
        {1: "merge", 2: "data AND row", 3: "scan OR batch", 4: "merge AND NOT window"},
        analyzer=GATE_ANALYZER,
        key_cols=("doc_id",),
    )
    out = mon.match_batch(_docs(spark, sf_dir))
    return out.select(F.col("doc_id").cast("long"), F.col("query_id").cast("int")).orderBy(
        "doc_id", "query_id"
    )


def _q_percolator_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positions-aware phrase percolation: exact-phrase queries verified
    against batch token positions after term presearch."""
    from lucene_spark.streaming.percolator import Monitor

    mon = Monitor(
        spark,
        {1: '"table value"', 2: 'merge AND "table value"', 3: "batch"},
        analyzer=GATE_ANALYZER,
        key_cols=("doc_id",),
    )
    out = mon.match_batch(_docs(spark, sf_dir))
    return out.select(F.col("doc_id").cast("long"), F.col("query_id").cast("int")).orderBy(
        "doc_id", "query_id"
    )


def _q_check_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CheckIndex integrity report over the gate index (rows-only check)."""
    from lucene_spark.index.segments import check_index

    report = check_index(_searcher(spark, sf_dir).index)
    rows = [(k, str(report[k])) for k in sorted(report)]
    return spark.createDataFrame(rows, "invariant string, value string")


# -------------------------------------------------------- features gate


def _q_hybrid_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scoring + Catalyst-pushed numeric range filter (BKD analog)."""
    from pyspark.sql import Window

    s = _searcher(spark, sf_dir)
    docs = _docs(spark, sf_dir).filter(F.col("n_chars").between(200, 350))
    scored = s.score_all("merge").join(docs.select("doc_id"), "doc_id", "left_semi")
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return topk.select(
        "doc_id", F.col("score").cast("double").alias("score")
    ).withColumn("rank", w.cast("int"))


def _knn_query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return tuple(
        float(x)
        for x in emb.filter(F.col("vec_id") == vec_id).select("embedding").collect()[0][0]
    )


def _q_knn_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filtered KNN as a Query: k nearest among docs matching 'merge'."""
    from lucene_spark.search.query import KnnFloatVectorQuery, TermQuery

    qv = _knn_query_vec(spark, sf_dir)
    q = KnnFloatVectorQuery(qv, k=10, filter=TermQuery("merge"))
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=10))


def _q_knn_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid: MUST bm25('merge') + SHOULD knn-top-50 similarity bonus."""
    from lucene_spark.search.query import (
        BooleanClause,
        BooleanQuery,
        KnnFloatVectorQuery,
        Occur,
        TermQuery,
    )

    qv = _knn_query_vec(spark, sf_dir)
    q = BooleanQuery(
        (
            BooleanClause(Occur.MUST, TermQuery("merge")),
            BooleanClause(Occur.SHOULD, KnnFloatVectorQuery(qv, k=50)),
        )
    )
    return _as_gate_schema(_searcher(spark, sf_dir).search(q, k=10))


def _q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best passage per hit doc (UnifiedHighlighter analog), terms wrapped."""
    from lucene_spark.search.features import unified_highlight

    s = _searcher(spark, sf_dir)
    out = unified_highlight(
        s.score_all("merge"), _docs(spark, sf_dir), ["merge"]
    )
    return out.withColumn("pscore", F.col("pscore").cast("double"))


def _q_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.features import suggest_terms

    return suggest_terms(_searcher(spark, sf_dir).index, "merg", k=5, max_edits=2)


def _q_suggest_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete: corpus-vocabulary completions of 'mer' by docFreq."""
    from lucene_spark.search.features import AnalyzingSuggester

    sug = AnalyzingSuggester.from_index_terms(_searcher(spark, sf_dir).index)
    return sug.lookup("mer", k=5)


def _q_shingle_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle token-stream filter: top-20 stop-aware word bigrams."""
    from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer
    from lucene_spark.analysis.filters import make_shingle_filter
    from lucene_spark.index.builder import make_analyze_udf

    an = StandardAnalyzer(
        stop_words=ENGLISH_STOP_WORDS,
        stream_filters=(make_shingle_filter(output_unigrams=False),),
    )
    analyze = make_analyze_udf(an)
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(analyze(F.col("text"))).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("shingle"))
        .limit(20)
    )


def _q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.features import term_vectors

    return term_vectors(_searcher(spark, sf_dir).index, [1, 2, 3])


def _q_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.features import more_like_this

    s = _searcher(spark, sf_dir)
    q = more_like_this(s.index, doc_id=0, max_terms=3)
    return _as_gate_schema(s.search(q, k=10))


def _q_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import distinct_values

    s = _searcher(spark, sf_dir)
    return distinct_values(s.score_all("merge"), _docs(spark, sf_dir), "source")


def _q_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.features import join_query

    s = _searcher(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    out = join_query(s.score_all("merge"), docs, "source", docs, "source")
    return out.select("doc_id").orderBy("doc_id")


def _q_drill_sideways(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.search.collectors import drill_sideways

    s = _searcher(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    base = s.score_all("merge").select("doc_id")
    dims = {
        "source": docs.filter(F.col("source") == "src1").select("doc_id"),
        "lang": docs.filter(F.col("lang") == "en").select("doc_id"),
    }
    counts = drill_sideways(dims, base, docs)
    union = None
    for dim in ("lang", "source"):
        part = counts[dim].select(F.lit(dim).alias("dim"), "label", "n")
        union = part if union is None else union.unionByName(part)
    return union.orderBy("dim", "label")


# ------------------------------------------------------- lifecycle/disk gate

_DISK_CACHE: dict[str, DataFrame] = {}


def _docs_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-keyed as (conv_id, turn_idx): zero-padded doc_id keeps
    lexicographic == numeric order, so the segment build assigns
    docID == doc_id (dense rank under the stable key)."""
    return _docs(spark, sf_dir).select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        "text",
    )


def _q_ondisk_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term top-k served from the *on-disk* bucketed block layout: the block
    scan is pruned to the query term's (segment, tbucket) partitions
    (terms-dictionary role — see IndexTables.blocks_for_terms)."""
    import tempfile

    from lucene_spark.index.segments import build_segments, read_index

    key = f"ondisk:{sf_dir}"
    if key not in _DISK_CACHE:
        from lucene_spark.session import ship_package

        ship_package(spark)
        d = tempfile.mkdtemp(prefix="lucene_spark_gate_ondisk_")
        build_segments(
            _docs_as_transcripts(spark, sf_dir), d, num_segments=8,
            analyzer=GATE_ANALYZER,
        )
        _DISK_CACHE[key] = IndexSearcher(read_index(spark, d))
    return _as_gate_schema(_DISK_CACHE[key].search("scan", k=10))


def _q_lifecycle_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deleteDocuments(Term('window')) + merge (physical compaction with
    delete-aware stats refresh) + term query — rank-identity preserved."""
    import tempfile

    from lucene_spark.index.segments import (
        build_segments,
        delete_documents,
        merge_segments,
        read_index,
    )

    key = f"merge:{sf_dir}"
    if key not in _DISK_CACHE:
        from lucene_spark.session import ship_package

        ship_package(spark)
        d = tempfile.mkdtemp(prefix="lucene_spark_gate_merge_")
        build_segments(
            _docs_as_transcripts(spark, sf_dir), d, num_segments=8,
            analyzer=GATE_ANALYZER,
        )
        delete_documents(spark, d, term="window")
        merge_segments(spark, d, group_size=4)
        _DISK_CACHE[key] = IndexSearcher(read_index(spark, d))
    return _as_gate_schema(_DISK_CACHE[key].search("merge", k=10))


def _q_lifecycle_update_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """updateDocument lifecycle: every 50th doc is replaced (text + one extra
    token) and re-appended with a fresh docID; buffered-delete semantics keep
    the tombstoned versions in the stats until compaction (Lucene behavior),
    but out of the hit set."""
    import tempfile

    from lucene_spark.index.segments import read_index
    from lucene_spark.streaming.ingest import append_batch, update_documents

    key = f"update:{sf_dir}"
    if key not in _DISK_CACHE:
        from lucene_spark.session import ship_package

        ship_package(spark)
        d = tempfile.mkdtemp(prefix="lucene_spark_gate_update_")
        base = _docs_as_transcripts(spark, sf_dir)
        append_batch(base, d, analyzer=GATE_ANALYZER, epoch_id=0)
        upd = _docs(spark, sf_dir).filter(F.col("doc_id") % 50 == 0).select(
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
            F.lit(0).alias("turn_idx"),
            F.concat(F.col("text"), F.lit(" lifecycle")).alias("text"),
        )
        update_documents(upd, d, analyzer=GATE_ANALYZER, epoch_id=1)
        _DISK_CACHE[key] = IndexSearcher(read_index(spark, d))
    return _as_gate_schema(_DISK_CACHE[key].search("merge", k=10))


# ------------------------------------------------- training-data extras gate


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every gate path that runs package UDFs without building the searcher
    # (percolator, dedup, textstats, …) still needs lucene_spark importable
    # on executor workers regardless of the driver's cwd
    from lucene_spark.session import ship_package

    ship_package(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + injected exact duplicates (doc_id%50==0 shifted +100000) —
    mirrors oracles.DOCS_WITH_DUPS so dedup queries have real work."""
    d = _docs(spark, sf_dir)
    dup = d.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return d.select("doc_id", "text").unionByName(dup.select("doc_id", "text"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.dedup import exact_dup_groups

    return exact_dup_groups(_docs_with_dups(spark, sf_dir))


def _q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs_with_dups(spark, sf_dir), threshold=0.5)


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_with_dups(spark, sf_dir), threshold=0.5)


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.dedup import simhash_pairs

    return simhash_pairs(_docs_with_dups(spark, sf_dir), max_distance=3)


def _q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # 0.4: ~60 pairs at sf0.01 (the synthetic embeddings' near-dup tail)
    return embedding_near_dup_pairs(emb, threshold=0.4)


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.similarity import knn_brute

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return knn_brute(emb, qv, k=10)


def _q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.textstats import token_counts

    return token_counts(_docs(spark, sf_dir))


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.textstats import quality_scores

    return quality_scores(_docs(spark, sf_dir))


def _q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def _q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.textstats import fingerprints

    return fingerprints(_docs(spark, sf_dir))


def _q_multimodal_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lucene_spark.extras.multimodal import attach_fake_payload, media_summary

    return media_summary(attach_fake_payload(_docs(spark, sf_dir)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_term_topk": _q_term_topk,
        "bm25_and_topk": _q_and_topk,
        "bm25_or_topk": _q_or_topk,
        "bm25_and_not_topk": _q_and_not_topk,
        "bm25_wand_or3_topk": _q_wand_or3_topk,
        "bm25_flat_term_topk": _q_flat_term_topk,
        "bm25_phrase_topk": _q_phrase_topk,
        "bm25_sloppy_phrase_topk": _q_sloppy_phrase_topk,
        "bm25_dismax_topk": _q_dismax_topk,
        "bm25_synonym_topk": _q_synonym_topk,
        "bm25_msm_topk": _q_msm_topk,
        "bm25_bool_mixed_topk": _q_bool_mixed_topk,
        "bm25_nested_bool_topk": _q_nested_bool_topk,
        "classic_tfidf_topk": _q_classic_topk,
        "boolean_sim_topk": _q_boolean_sim_topk,
        "prefix_topk": _q_prefix_topk,
        "wildcard_topk": _q_wildcard_topk,
        "fuzzy_topk": _q_fuzzy_topk,
        "fuzzy_blended_topk": _q_fuzzy_blended_topk,
        "prefix_scoring_topk": _q_prefix_scoring_topk,
        "term_count": _q_term_count,
        "explain_term_doc": _q_explain,
        "term_range_topk": _q_term_range_topk,
        "rescore_topk": _q_rescore_topk,
        "feature_score_topk": _q_feature_score_topk,
        "doclens_norms": _q_doclens_norms,
        "termstats_top50": _q_termstats_top50,
        "facet_source_counts": _q_facet_source,
        "facet_nchars_ranges": _q_range_facet,
        "facet_path_counts": _q_facet_paths,
        "grouped_topk_source": _q_grouped_topk,
        "block_join_source_max": _q_block_join,
        "search_after_page2": _q_search_after,
        "rrf_merge_join": _q_rrf,
        "sort_by_field_topk": _q_sort_by_field,
        "function_score_topk": _q_function_score,
        "bm25_params_topk": _q_bm25_params_topk,
        "lmdirichlet_topk": _q_lmdirichlet_topk,
        "dfr_topk": _q_similarity_topk("dfr"),
        "lmjm_topk": _q_similarity_topk("lmjm"),
        "ib_topk": _q_similarity_topk("ib"),
        "dfi_topk": _q_similarity_topk("dfi"),
        "f2exp_topk": _q_similarity_topk("f2exp"),
        "multi_sim_topk": _q_multi_sim_topk,
        "percolator_matches": _q_percolator,
        "percolator_phrase_matches": _q_percolator_phrase,
        "check_index_report": _q_check_index,
        "ondisk_term_topk": _q_ondisk_term_topk,
        "lifecycle_merge_topk": _q_lifecycle_merge_topk,
        "lifecycle_update_topk": _q_lifecycle_update_topk,
        "hybrid_range_topk": _q_hybrid_range,
        "highlight_passages": _q_highlight,
        "knn_filtered_topk": _q_knn_filtered_topk,
        "knn_hybrid_topk": _q_knn_hybrid_topk,
        "suggest_terms": _q_suggest,
        "suggest_complete": _q_suggest_complete,
        "shingle_top20": _q_shingle_top,
        "term_vectors": _q_term_vectors,
        "more_like_this_topk": _q_mlt,
        "distinct_values": _q_distinct_values,
        "join_query": _q_join_query,
        "drill_sideways": _q_drill_sideways,
        "dedup_exact_groups": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding_cos": _q_dedup_embedding,
        "ann_cosine_topk": _q_ann_topk,
        "text_token_counts": _q_text_tokens,
        "text_quality_scores": _q_text_quality,
        "text_lang_id": _q_text_langid,
        "text_fingerprints": _q_text_fingerprint,
        "multimodal_summary": _q_multimodal_summary,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_term_topk": osql.term_topk_sql("merge", 10),
        "bm25_and_topk": osql.and_topk_sql("merge", "join", 10),
        "bm25_or_topk": osql.or_topk_sql("spark", "vector", 15),
        "bm25_and_not_topk": osql.and_not_topk_sql("merge", "window", 10),
        "bm25_wand_or3_topk": osql.multi_or_topk_sql(["data", "row", "scan"], 12),
        "bm25_flat_term_topk": osql.term_topk_sql("batch", 10),
        "bm25_phrase_topk": osql.phrase_topk_sql(["table", "value"], 10),
        "bm25_sloppy_phrase_topk": osql.sloppy_phrase_topk_sql("table", "value", 3, 10),
        "bm25_dismax_topk": osql.dismax_topk_sql("data", "scan", 0.3, 12),
        "bm25_synonym_topk": osql.synonym_topk_sql(["fast", "slow"], 12),
        "bm25_msm_topk": osql.msm_topk_sql(["data", "row", "scan"], 2, 12),
        "bm25_bool_mixed_topk": osql.bool_mixed_topk_sql(
            "merge", ["data", "row"], "window", 12
        ),
        "bm25_nested_bool_topk": osql.nested_and_or_topk_sql(
            "merge", ["data", "row"], 12
        ),
        "classic_tfidf_topk": osql.classic_term_topk_sql("merge", 10),
        "boolean_sim_topk": osql.boolean_sim_term_topk_sql("merge", 400),
        "prefix_topk": osql.prefix_topk_sql("mer", 400),
        "wildcard_topk": osql.wildcard_topk_sql("s_an", 400),
        "fuzzy_topk": osql.fuzzy_topk_sql("merge", 1, 400),
        "fuzzy_blended_topk": osql.fuzzy_blended_topk_sql("merge", 1, 50, 10),
        "prefix_scoring_topk": osql.prefix_scoring_topk_sql("mer", 10),
        "term_count": osql.term_count_sql("merge"),
        "explain_term_doc": osql.explain_term_doc_sql("merge"),
        "term_range_topk": osql.term_range_topk_sql("mer", "mes", 400),
        "rescore_topk": osql.rescore_topk_sql("merge", "join", 30, 1.0, 0.5, 10),
        "feature_score_topk": osql.feature_score_topk_sql("merge", "d.n_chars / 1000.0", "saturation", 2.0, 0.5, 10),
        "doclens_norms": osql.doclens_norms_sql(),
        "termstats_top50": osql.termstats_topn_sql(50),
        "facet_source_counts": osql.facet_counts_sql("merge", "source"),
        "facet_nchars_ranges": osql.range_facet_sql("merge", "n_chars", _NCHAR_RANGES),
        "facet_path_counts": osql.taxonomy_facet_sql("merge", "source", "lang"),
        "grouped_topk_source": osql.grouped_topk_sql("merge", "source", 2),
        "block_join_source_max": osql.block_join_sql("merge", "source", "max"),
        "search_after_page2": osql.search_after_sql("merge", 10),
        "rrf_merge_join": osql.rrf_sql("merge", "join", 60, 15),
        "sort_by_field_topk": osql.sort_by_field_sql("merge", "n_chars", 10),
        "function_score_topk": osql.function_score_sql(
            "(n_chars % 97) * 0.5 + (doc_id % 7)", 10
        ),
        "bm25_params_topk": osql.term_topk_params_sql("merge", 0.9, 0.4, 10),
        "lmdirichlet_topk": osql.lmdirichlet_term_topk_sql("merge", 2000.0, 10),
        "dfr_topk": osql.dfr_term_topk_sql("merge", 10),
        "lmjm_topk": osql.lmjm_term_topk_sql("merge", 0.7, 10),
        "ib_topk": osql.ib_term_topk_sql("merge", 10),
        "dfi_topk": osql.dfi_term_topk_sql("merge", 10),
        "f2exp_topk": osql.f2exp_term_topk_sql("merge", 10),
        "multi_sim_topk": osql.multi_sim_term_topk_sql("merge", 10),
        "percolator_matches": osql.percolator_matches_sql(),
        "percolator_phrase_matches": osql.percolator_phrase_matches_sql(),
        # check_index_report intentionally has NO oracle: integrity
        # invariants are engine-internal (rows-only gate check)
        "ondisk_term_topk": osql.term_topk_sql("scan", 10),
        "lifecycle_merge_topk": osql.term_topk_after_delete_merge_sql(
            "merge", "window", 10
        ),
        "lifecycle_update_topk": osql.term_topk_after_update_sql(
            "merge", 50, "lifecycle", 10
        ),
        "hybrid_range_topk": osql.hybrid_range_topk_sql("merge", "n_chars", 200, 350, 10),
        "highlight_passages": osql.highlight_passages_sql("merge", 10),
        "knn_filtered_topk": osql.knn_filtered_topk_sql("merge", 0, 10),
        "knn_hybrid_topk": osql.knn_hybrid_topk_sql("merge", 0, 50, 10),
        "suggest_terms": osql.suggest_terms_sql("merg", 2, 5),
        "suggest_complete": osql.suggest_complete_sql("mer", 5),
        "shingle_top20": osql.shingle_top_sql(20),
        "term_vectors": osql.term_vectors_sql([1, 2, 3]),
        "more_like_this_topk": osql.mlt_topk_sql(0, 3, 10),
        "distinct_values": osql.distinct_values_sql("merge", "source"),
        "join_query": osql.join_query_sql("merge", "source", "source"),
        "drill_sideways": osql.drill_sideways_sql("merge", "src1", "en"),
        "dedup_exact_groups": xor.exact_dup_groups_sql(),
        "dedup_ngram_jaccard": xor.ngram_jaccard_pairs_sql(0.5),
        "dedup_minhash_lsh": xor.minhash_lsh_pairs_sql(threshold=0.5),
        "dedup_simhash": xor.simhash_pairs_sql(3),
        "dedup_embedding_cos": xor.embedding_near_dup_sql(0.4),
        "ann_cosine_topk": xor.knn_cosine_topk_sql(0, 10),
        "text_token_counts": xor.token_counts_sql(),
        "text_quality_scores": xor.quality_scores_sql(),
        "text_lang_id": xor.lang_id_sql(),
        "text_fingerprints": xor.fingerprints_sql(),
        "multimodal_summary": xor.media_summary_sql(),
    }
