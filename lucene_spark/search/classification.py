"""Index-backed text classification — the reference's ``classification``
module re-expressed as distributed DataFrame plans.

* :func:`naive_bayes_classify` —
  ``classification/SimpleNaiveBayesClassifier.java``: add-one-smoothed
  multinomial Naive Bayes whose per-class token likelihoods come straight
  from index statistics (docs containing word w AND class c), priors from
  class doc counts, scores softmax-normalized to 0–1
  (``normClassificationResults``, :209-319).
* :func:`knn_classify` — ``classification/KNearestNeighborClassifier.java``:
  a MoreLikeThis query built from the input text (boosted top tf·idf
  terms, ``:156-180``), BM25 top-k neighbours, then the class vote of
  ``buildListFromTopDocs`` (:193-236): per class, count and
  max-score-normalized boost sum, score = (count · boost/count)/k with the
  sumdoc<k correction applied exactly as the reference does.
* :func:`knn_fuzzy_classify` — ``classification/KNearestFuzzyClassifier
  .java`` + ``classification/utils/NearestFuzzyQuery.java``: every
  distinct input term fuzzified against the terms dictionary (maxEdits 1,
  prefixLength 2, ≤ 50 variants/term), variant score = boost² · idf with
  the source term's df (avg variant df when absent), global top-300 terms,
  BM25 with ARTIFICIAL df=1 stats per variant, nested per-source-term
  float32 sums, then the identical class vote.

Both are **batch** operators: they classify a whole DataFrame of input
texts in one distributed plan (the reference classifies one string at a
time; :func:`assign_class` provides that single-text surface on top of
the batch path).  Nothing here loops per input on the driver — token
streams explode through the analyzer UDF, per-(term, class) statistics
are one aggregation over term-pruned postings, and per-input work is
window functions.  At 100 TB the expensive side (postings, classes) stays
partitioned; only the input-derived term dictionaries are broadcast.

Envelope (documented divergences from the reference, mirrored bit-exactly
by the DuckDB oracles):

* MLT term selection uses this repo's established MoreLikeThis weight
  (``features.interesting_terms``: freq · ln(1+(N−df+0.5)/(df+0.5)), ties
  term ASC) rather than the reference MLT's ClassicSimilarity idf², and
  the gate uses min_doc_freq=1 / min_term_freq=1 (reference defaults are
  5 / 2 — tuned for far larger corpora than the gate's).
* ``BooleanPerceptronClassifier`` is not ported: an iterative
  sequential trainer (per-doc weight updates) outside this engine's
  query scope.  :func:`knn_fuzzy_classify` ports
  ``KNearestFuzzyClassifier`` (NearestFuzzyQuery expansion + the same
  class vote); :func:`bm25_nb_classify` ports ``BM25NBClassifier`` over
  a ``combine_fields`` multi-field reader (the indexed class field the
  reference requires).

Float discipline (the house rule every oracle-gated score follows):
transcendentals go through scalar libm (``math.log`` / ``math.exp`` — the
same library DuckDB calls, avoiding numpy's and the JVM's last-ULP
drift), each is cast to float32 at a declared quantization point, and
sums of float32 values accumulate in double (exact for these magnitudes,
so shuffle order cannot perturb the result).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_spark.index.builder import IndexTables
from lucene_spark.search import bm25
from lucene_spark.analysis.smallfloat import LENGTH_TABLE

_LENGTH_TABLE_F32 = LENGTH_TABLE.astype(np.float32)


# ------------------------------------------------------------------ libm UDFs
#
# Scalar-libm transcendentals, vectorized over the column's unique values
# (the _LMDirichletLeaf memo trick): per-row Python cost is bounded by the
# number of DISTINCT inputs in the batch, which for classification columns
# is small (ratios repeat across the (term, class) grid).


def _libm_udf(fn, out_dtype):
    @F.pandas_udf("float" if out_dtype is np.float32 else "double")
    def udf(x: pd.Series) -> pd.Series:
        arr = x.to_numpy(dtype=np.float64)
        uniq, inv = np.unique(arr, return_inverse=True)
        vals = np.array([fn(v) for v in uniq.tolist()], dtype=out_dtype)
        return pd.Series(vals[inv])

    return udf


def _ln_f32():
    return _libm_udf(math.log, np.float32)


def _ln_f64():
    return _libm_udf(math.log, np.float64)


def _exp_f64():
    return _libm_udf(math.exp, np.float64)


def _exp_f32():
    return _libm_udf(math.exp, np.float32)


def _qlen_f32():
    """norm byte -> decoded quantized length as float32 (the BM25 cache's
    length input, ``SmallFloat.byte4ToInt``)."""

    @F.pandas_udf("float")
    def udf(norm_byte: pd.Series) -> pd.Series:
        idx = norm_byte.to_numpy(dtype=np.int64) & 0xFF
        return pd.Series(_LENGTH_TABLE_F32[idx])

    return udf


# ------------------------------------------------------------------ BM25 leaf


def _bm25_leaf(df, weight_col: str, out_col: str, k1f: float, bf: float, avgdl: float):
    """The float32 BM25 leaf score shared by every classifier:
    ``sc = w − f32(w / (1 + freq·inv))`` with the norm-inverse-cache
    ``inv = f32(1/(k1·((1−b) + f32((qlen·b)/avgdl))))``.  ``df`` must
    carry ``freq`` and the decoded ``qlen``; every cast point here is
    load-bearing for oracle parity (Spark promotes float/float to
    double; casting each quotient back to float is bit-identical to a
    native float32 op since double carries ≥ 2p+2 bits)."""
    one = F.lit(1.0).cast("float")
    inv = (
        one
        / (
            F.lit(k1f).cast("float")
            * (
                (one - F.lit(bf).cast("float"))
                + (
                    (F.col("qlen") * F.lit(bf).cast("float"))
                    / F.lit(avgdl).cast("float")
                ).cast("float")
            )
        )
    ).cast("float")
    return df.withColumn("_inv", inv).withColumn(
        out_col,
        F.col(weight_col)
        - (
            F.col(weight_col)
            / (one + F.col("freq").cast("float") * F.col("_inv"))
        ).cast("float"),
    ).drop("_inv")


# ------------------------------------------------------------------ tokenize


def tokenize_inputs(
    inputs_df: DataFrame,
    analyzer,
    id_col: str = "input_id",
    text_col: str = "text",
) -> DataFrame:
    """(input_id, term, cnt) — the analyzer's token stream per input with
    occurrence counts (the reference loops over every occurrence,
    ``SimpleNaiveBayesClassifier.java:213``; summing cnt · ln(p) is the
    exact same double because each ln is float32-quantized first)."""

    an = analyzer

    @F.pandas_udf("array<string>")
    def toks(texts: pd.Series) -> pd.Series:
        return an.analyze_series(texts)

    return (
        inputs_df.select(F.col(id_col).alias("input_id"), toks(text_col).alias("ts"))
        .select("input_id", F.explode("ts").alias("term"))
        .groupBy("input_id", "term")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


# ------------------------------------------------------------------ NB


def naive_bayes_classify(
    idx: IndexTables,
    classes_df: DataFrame,
    inputs_df: DataFrame,
    analyzer,
    top_n: int = 3,
    field: str = "text",
    id_col: str = "input_id",
    text_col: str = "text",
) -> DataFrame:
    """SimpleNaiveBayesClassifier over a batch of inputs.

    ``classes_df``: (doc_id, class) — every doc carrying a class value
    (the class field; ``countDocsWithClass``, :167-185).  Returns
    (input_id, class, score, rank): per input the ``top_n`` classes by
    softmax-normalized posterior, rank 0 = ``assignClass``'s answer.

    Per class c (``assignClassNormalizedList``, :137-159):
      log prior   = ln(docFreq(c)) − ln(docsWithClass)              (:279)
      log p(w|c)  = ln((hits(w,c) + 1) / (avgUnique·docFreq(c)
                                          + docsWithClass))     (:209-231)
    with avgUnique = sumDocFreq(field)/docCount(field)          (:241-252)
    and hits(w,c) = #docs containing w with class c — one aggregation
    over query-term-pruned postings joined to the class table.
    """
    spark = inputs_df.sparkSession
    ln32, exp64, exp32 = _ln_f32(), _exp_f64(), _exp_f32()

    toks = tokenize_inputs(inputs_df, analyzer, id_col, text_col)
    qterms = toks.select("term").distinct()

    n_class_docs = classes_df.count()
    if n_class_docs == 0:
        return spark.createDataFrame(
            [], "input_id long, class string, score double, rank int"
        )
    class_stats = classes_df.groupBy("class").agg(F.count("*").alias("dfc"))

    fs = idx.fieldstats.filter(F.col("field") == field).collect()[0]
    # numPostings / (double) docCount — one double division, exact mirror
    avg_unique = int(fs["sum_doc_freq"]) / float(fs["doc_count"])

    # hits(w, c): postings rows are unique (term, doc) pairs
    hits = (
        idx.postings.filter(F.col("field") == field)
        .join(F.broadcast(qterms), "term")
        .join(classes_df, "doc_id")
        .groupBy("term", "class")
        .agg(F.count("*").cast("long").alias("hits"))
    )
    # full (input term × class) grid; absent pairs smooth to hits = 0
    grid = (
        qterms.crossJoin(F.broadcast(class_stats))
        .join(hits, ["term", "class"], "left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0).cast("long")))
        .withColumn(
            "den",
            F.lit(avg_unique) * F.col("dfc").cast("double")
            + F.lit(float(n_class_docs)),
        )
        # float32 quantization point: one ln per (term, class)
        .withColumn(
            "ll_tok",
            ln32((F.col("hits").cast("double") + F.lit(1.0)) / F.col("den")),
        )
        .select("term", "class", "ll_tok")
    )

    # Σ over input occurrences: cnt · float32-value in double is exact,
    # so the shuffle's summation order cannot change the result
    loglik = (
        toks.join(grid, "term")
        .groupBy("input_id", "class")
        .agg(
            F.sum(F.col("cnt").cast("double") * F.col("ll_tok").cast("double")).alias(
                "ll"
            )
        )
    )

    # every input scores every class (zero-token inputs keep prior-only)
    all_pairs = (
        inputs_df.select(F.col(id_col).alias("input_id"))
        .crossJoin(F.broadcast(class_stats))
        .join(loglik, ["input_id", "class"], "left")
        .withColumn("ll", F.coalesce(F.col("ll"), F.lit(0.0)))
        .withColumn(
            "prior",
            ln32(F.col("dfc").cast("double")).cast("double")
            - ln32(F.lit(float(n_class_docs))).cast("double"),
        )
        .withColumn("raw", (F.col("prior") + F.col("ll")).cast("float"))
    )

    # softmax (normClassificationResults, :293-319): stable log-sum-exp
    w_in = Window.partitionBy("input_id")
    scored = (
        all_pairs.withColumn("smax", F.max("raw").over(w_in).cast("double"))
        .withColumn("e", exp64(F.col("raw").cast("double") - F.col("smax")))
        .withColumn("sumexp", F.sum("e").over(w_in))
        .withColumn(
            "loga", F.col("smax") + ln32(F.col("sumexp")).cast("double")
        )
        .withColumn("score", exp32(F.col("raw").cast("double") - F.col("loga")))
    )
    w_rank = Window.partitionBy("input_id").orderBy(F.desc("score"), F.asc("class"))
    return (
        scored.withColumn("rank", (F.row_number().over(w_rank) - 1).cast("int"))
        .filter(F.col("rank") < top_n)
        .select(
            F.col("input_id").cast("long"),
            F.col("class").cast("string"),
            F.col("score").cast("double"),
            "rank",
        )
    )


# ------------------------------------------------------------------ KNN


def knn_classify(
    idx: IndexTables,
    classes_df: DataFrame,
    inputs_df: DataFrame,
    analyzer,
    k: int = 10,
    max_query_terms: int = 25,
    min_doc_freq: int = 1,
    min_term_freq: int = 1,
    top_n: int = 3,
    field: str = "text",
    id_col: str = "input_id",
    text_col: str = "text",
    k1: float = bm25.K1,
    b: float = bm25.B,
) -> DataFrame:
    """KNearestNeighborClassifier over a batch of inputs.

    Per input: MLT term selection from the input text (``knnSearch``,
    :156-180 — boosted, boost = weight/bestWeight with ``setBoost(true)``),
    BM25 top-k over the index (ties doc_id ASC, the collector's tie-break),
    then the reference's exact class vote (``buildListFromTopDocs``):

      boost_c = Σ_{hits of class c} float32(score/maxScore)   (:213-217)
      score_c = (count_c · (boost_c/count_c)) / k             (:225-229)
      if Σcount < k:  score_c = score_c · k / Σcount          (:233-236)

    Returns (input_id, class, score, rank), rank 0 per input =
    ``assignClass``'s answer.
    """
    spark = inputs_df.sparkSession
    ln32, ln64 = _ln_f32(), _ln_f64()
    qlen32 = _qlen_f32()

    fs = idx.fieldstats.filter(F.col("field") == field).collect()[0]
    n_docs, sttf = int(fs["doc_count"]), int(fs["sum_total_term_freq"])
    avgdl = float(bm25.avgdl(sttf, n_docs))
    k1f, bf = float(np.float32(k1)), float(np.float32(b))

    toks = tokenize_inputs(inputs_df, analyzer, id_col, text_col).filter(
        F.col("cnt") >= min_term_freq
    )

    # MLT selection: the repo's MoreLikeThis weight (features.py envelope)
    ts = idx.termstats.filter(
        (F.col("field") == field) & (F.col("doc_freq") >= min_doc_freq)
    ).select("term", "doc_freq")
    w_in = Window.partitionBy("input_id")
    sel = (
        toks.join(ts, "term")
        .withColumn(
            "mlt_w",
            F.col("cnt").cast("double")
            * ln64(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("doc_freq") + F.lit(0.5))
                / (F.col("doc_freq") + F.lit(0.5))
            ),
        )
        .withColumn(
            "sel_rank",
            F.row_number().over(
                Window.partitionBy("input_id").orderBy(
                    F.desc("mlt_w"), F.asc("term")
                )
            ),
        )
        .filter(F.col("sel_rank") <= max_query_terms)
        .withColumn("best_w", F.max("mlt_w").over(w_in))
        .withColumn("boost", (F.col("mlt_w") / F.col("best_w")).cast("float"))
        # float32 idf and weight, the BM25Scorer quantization points
        .withColumn(
            "idf",
            ln32(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("doc_freq") + F.lit(0.5))
                / (F.col("doc_freq") + F.lit(0.5))
            ),
        )
        .withColumn("weight", F.col("boost") * F.col("idf"))
        .select("input_id", "term", "weight")
    )

    # BM25 per (input, doc): the shared float32 leaf (JVM-side expression
    # algebra in lockstep with numpy's stepwise-f32 ``bm25.bm25_score``
    # and the DuckDB oracle's FLOAT expressions)
    postings = idx.postings.filter(F.col("field") == field)
    norms = idx.doclens.filter(F.col("field") == field).select(
        "doc_id", qlen32(F.col("norm_byte")).alias("qlen")
    )
    contrib = _bm25_leaf(
        postings.join(F.broadcast(sel), "term").join(norms, "doc_id"),
        "weight",
        "sc",
        k1f,
        bf,
        avgdl,
    )
    # the MUST class-exists wildcard (knnSearch adds WildcardQuery(class,
    # "*") as a scoring MUST, :174-176): only LABELED docs are eligible
    # hits (semi-join before top-k — on a partially-labeled corpus
    # unlabeled docs must not occupy top-k slots), and its ConstantScore
    # 1.0 is summed by the conjunction in double, cast float — constant
    # across docs so ranking is unchanged, but the vote's score/maxScore
    # normalization sees (s+1)/(smax+1) exactly as the reference does
    per_doc = (
        contrib.groupBy("input_id", "doc_id")
        .agg(F.sum(F.col("sc").cast("double")).alias("dsc"))
        .withColumn(
            "score",
            (F.col("dsc").cast("float").cast("double") + F.lit(1.0)).cast("float"),
        )
        .join(classes_df.select("doc_id").distinct(), "doc_id", "left_semi")
    )
    if idx.deletes is not None:
        per_doc = per_doc.join(idx.deletes, "doc_id", "left_anti")
    topk = (
        per_doc.withColumn(
            "hit_rank",
            F.row_number().over(
                Window.partitionBy("input_id").orderBy(
                    F.desc("score"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("hit_rank") <= k)
        .withColumn("max_score", F.max("score").over(w_in))
    )

    return _class_vote(topk, classes_df, k, top_n)


def _class_vote(topk: DataFrame, classes_df: DataFrame, k: int, top_n: int) -> DataFrame:
    """``buildListFromTopDocs`` (KNearestNeighborClassifier.java:193-236,
    identical in KNearestFuzzyClassifier): per class the hit count and
    max-score-normalized boost sum, score = (count · boost/count)/k with
    the sumdoc<k correction — operation sequence mirrored line-for-line.
    ``topk``: (input_id, doc_id, score, max_score)."""
    w_in = Window.partitionBy("input_id")
    votes = (
        topk.join(classes_df, "doc_id")
        .withColumn("sb", (F.col("score") / F.col("max_score")).cast("float"))
        .groupBy("input_id", "class")
        .agg(
            F.count("*").cast("double").alias("cnt"),
            F.sum(F.col("sb").cast("double")).alias("boost"),
        )
        .withColumn("sumdoc", F.sum("cnt").over(w_in))
        .withColumn(
            "tmp",
            (F.col("cnt") * (F.col("boost") / F.col("cnt"))) / F.lit(float(k)),
        )
        .withColumn(
            "vote",
            F.when(
                F.col("sumdoc") < F.lit(float(k)),
                F.col("tmp") * F.lit(float(k)) / F.col("sumdoc"),
            ).otherwise(F.col("tmp")),
        )
        .withColumn("score", F.col("vote").cast("float"))
    )
    w_rank = Window.partitionBy("input_id").orderBy(F.desc("score"), F.asc("class"))
    return (
        votes.withColumn("rank", (F.row_number().over(w_rank) - 1).cast("int"))
        .filter(F.col("rank") < top_n)
        .select(
            F.col("input_id").cast("long"),
            F.col("class").cast("string"),
            F.col("score").cast("double"),
            "rank",
        )
    )


# ------------------------------------------------------------------ fuzzy KNN

# NearestFuzzyQuery's fixed parameters (NearestFuzzyQuery.java:55-58)
_FUZZY_MAX_VARIANTS_PER_TERM = 50
_FUZZY_MAX_NUM_TERMS = 300
_FUZZY_PREFIX_LENGTH = 2
_FUZZY_MAX_EDITS = 1  # MIN_SIMILARITY = 1f


def _fuzzy_ed_boost_udf():
    """(variant, query, prefix_len) -> struct(ed, boost): the exact OSA
    distance of the POST-PREFIX suffixes (``FuzzyTermsEnum.java:238-248``
    — the automata encode the shared prefix exactly, so the counted edits
    are the suffix's) and the enum's boost, 1f − ed/min(cpLen) in float32
    (``FuzzyTermsEnum.java:251-257``) over the FULL term lengths."""
    from lucene_spark.search.searcher import _osa_distance

    @F.pandas_udf("struct<ed:int,boost:float>")
    def udf(v: pd.Series, q: pd.Series, rp: pd.Series) -> pd.DataFrame:
        eds = np.empty(len(v), dtype=np.int32)
        boosts = np.empty(len(v), dtype=np.float32)
        for i, (vt, qt, p) in enumerate(zip(v, q, rp)):
            e = _osa_distance(vt[p:], qt[p:])
            eds[i] = e
            if e == 0:
                boosts[i] = np.float32(1.0)
            else:
                boosts[i] = np.float32(1.0) - np.float32(e) / np.float32(
                    min(len(vt), len(qt))
                )
        return pd.DataFrame({"ed": eds, "boost": boosts})

    return udf


def knn_fuzzy_classify(
    idx: IndexTables,
    classes_df: DataFrame,
    inputs_df: DataFrame,
    analyzer,
    k: int = 10,
    top_n: int = 3,
    field: str = "text",
    id_col: str = "input_id",
    text_col: str = "text",
    k1: float = bm25.K1,
    b: float = bm25.B,
) -> DataFrame:
    """KNearestFuzzyClassifier over a batch of inputs
    (``KNearestFuzzyClassifier.java`` + ``utils/NearestFuzzyQuery.java``).

    Per input, ``knnSearch`` (:135-148) builds NearestFuzzyQuery(text)
    MUST + class-exists wildcard MUST, takes BM25 top-k, then the same
    class vote as the plain KNN classifier.  NearestFuzzyQuery.rewrite
    (:130-264):

    * each DISTINCT analyzed term fuzzifies against the terms dict with
      maxEdits=1, prefixLength=2 — candidates share the first
      min(2, len) codepoints and sit within suffix-OSA 1;
    * per source term the top ≤ 50 variants by (boost DESC, term ASC),
      boost = 1f − ed/min(len) (exact match 1f);
    * variant score = float32(float32(boost²) · idf), idf =
      float32(ln((numDocs+1)/(df+1)) + 1.0) with df = the SOURCE term's
      docFreq, or the integer-mean variant docFreq when 0 (:173-190);
    * global top ≤ 300 (term, variant) pairs per input (:220);
    * scoring: each variant is a BoostQuery(TermQuery) with ARTIFICIAL
      df=1 stats (:202-215), so BM25 idf uses docFreq 1; variants of one
      source term sum in a nested SHOULD boolean (float32 of the double
      sum, :242-259), source-term groups sum again to float32, and the
      wildcard MUST adds constant 1.0 (double add, cast float).

    The expensive side (termstats, postings) stays partitioned; only the
    input-derived candidate/variant frames are broadcast.  Returns
    (input_id, class, score, rank).
    """
    ln64 = _ln_f64()
    qlen32 = _qlen_f32()
    ed_boost = _fuzzy_ed_boost_udf()

    fs = idx.fieldstats.filter(F.col("field") == field).collect()[0]
    n_field, sttf = int(fs["doc_count"]), int(fs["sum_total_term_freq"])
    avgdl = float(bm25.avgdl(sttf, n_field))
    k1f, bf = float(np.float32(k1)), float(np.float32(b))
    # reader.numDocs() (KNearestFuzzyClassifier passes the whole reader,
    # NearestFuzzyQuery.java:140) — live docs across all fields
    if idx.deletes is not None:
        n_docs = idx.docmap.join(idx.deletes, "doc_id", "left_anti").count()
    else:
        n_docs = idx.docmap.count()
    # the artificial-TermStates BM25 idf: every variant scores with df=1
    idf1 = float(
        np.float32(math.log(1.0 + (float(n_field) - 1.0 + 0.5) / (1.0 + 0.5)))
    )

    # distinct analyzed terms per input (processedTerms, :141-145)
    qterms = (
        tokenize_inputs(inputs_df, analyzer, id_col, text_col)
        .select("input_id", F.col("term").alias("src"))
        .distinct()
        .withColumn("rp", F.least(F.lit(_FUZZY_PREFIX_LENGTH), F.length("src")))
    )

    # candidate variants: broadcast the (small) input-term side into the
    # (large) terms dictionary keyed on the FULL non-fuzzy prefix — the
    # automaton's exact first min(2, len) codepoints, so the join itself
    # enforces the prefix constraint (a first-char key measured ~30×
    # more joined rows on many-term inputs at the 84k-turn bench
    # corpus); the rare single-char terms join on their 1-char key.
    # Length-window + JVM levenshtein (OSA ≤ 1 ⇒ lev ≤ 2) prune before
    # the exact suffix-OSA cut in one Arrow batch.
    ts = idx.termstats.filter(F.col("field") == field).select(
        F.col("term").alias("vterm"), F.col("doc_freq").alias("vdf")
    )
    q2 = qterms.filter(F.col("rp") == _FUZZY_PREFIX_LENGTH).withColumn(
        "jk", F.substring("src", 1, _FUZZY_PREFIX_LENGTH)
    )
    q1 = qterms.filter(F.col("rp") < _FUZZY_PREFIX_LENGTH).withColumn(
        "jk", F.substring("src", 1, 1)
    )
    cand0 = ts.withColumn(
        "jk", F.substring("vterm", 1, _FUZZY_PREFIX_LENGTH)
    ).join(F.broadcast(q2), "jk")
    if q1.limit(1).count() > 0:
        cand0 = cand0.unionByName(
            ts.withColumn("jk", F.substring("vterm", 1, 1)).join(
                F.broadcast(q1), "jk"
            )
        )
    cand = (
        cand0.filter(
            F.length("vterm").between(F.length("src") - 1, F.length("src") + 1)
        )
        .filter(
            F.levenshtein(
                F.expr("substring(vterm, rp + 1)"), F.expr("substring(src, rp + 1)")
            )
            <= 2 * _FUZZY_MAX_EDITS
        )
        .withColumn("eb", ed_boost("vterm", "src", "rp"))
        .select("input_id", "src", "vterm", "vdf", "eb.ed", "eb.boost")
        .filter(F.col("ed") <= _FUZZY_MAX_EDITS)
    )

    # per-source-term stats over ALL enumerated variants (:156-177):
    # numVariants, Σ variant docFreqs, then the ≤ 50 variant cap.  The
    # source term's own docFreq (reader.docFreq(startTerm)) needs no
    # second terms-dict join: when the source term is in the dictionary
    # it IS the ed=0 variant (it always matches itself), so a window max
    # over the candidates recovers it on the same shuffle
    w_src = Window.partitionBy("input_id", "src")
    variants = (
        cand.withColumn("nvar", F.count("*").over(w_src))
        .withColumn("totvdf", F.sum("vdf").over(w_src))
        .withColumn(
            "src_df", F.max(F.when(F.col("ed") == 0, F.col("vdf"))).over(w_src)
        )
        .withColumn(
            "vrank",
            F.row_number().over(
                w_src.orderBy(F.desc("boost"), F.asc("vterm"))
            ),
        )
        .filter(F.col("vrank") <= _FUZZY_MAX_VARIANTS_PER_TERM)
        # df == 0 -> avgDf = totalVariantDocFreqs / numVariants (Java int
        # division; both positive, so long-cast truncation == floor)
        .withColumn(
            "df",
            F.coalesce(
                F.col("src_df"),
                (F.col("totvdf") / F.col("nvar")).cast("long"),
            ),
        )
        # st.score = f32(f32(boost·boost) · f32(ln((N+1)/(df+1)) + 1.0))
        .withColumn(
            "idf_src",
            (
                ln64(
                    F.lit(float(n_docs + 1)) / (F.col("df") + F.lit(1)).cast("double")
                )
                + F.lit(1.0)
            ).cast("float"),
        )
        .withColumn(
            "b2", (F.col("boost").cast("double") * F.col("boost")).cast("float")
        )
        .withColumn(
            "stsc", (F.col("b2").cast("double") * F.col("idf_src")).cast("float")
        )
    )
    w_in = Window.partitionBy("input_id")
    # (stsc, vterm) alone is not total: two source terms can fuzzify to
    # the SAME variant with equal score — src as the final key keeps the
    # 300-boundary deterministic and in lockstep with the oracle
    sel = (
        variants.withColumn(
            "grank",
            F.row_number().over(
                w_in.orderBy(F.desc("stsc"), F.asc("vterm"), F.asc("src"))
            ),
        )
        .filter(F.col("grank") <= _FUZZY_MAX_NUM_TERMS)
        .withColumn(
            "weight", (F.col("stsc").cast("double") * F.lit(idf1)).cast("float")
        )
        .select("input_id", "src", F.col("vterm").alias("term"), "weight")
    )

    # BM25 leaf scores (the shared float32 leaf, same lockstep as
    # knn_classify)
    postings = idx.postings.filter(F.col("field") == field)
    norms = idx.doclens.filter(F.col("field") == field).select(
        "doc_id", qlen32(F.col("norm_byte")).alias("qlen")
    )
    contrib = _bm25_leaf(
        postings.join(F.broadcast(sel), "term").join(norms, "doc_id"),
        "weight",
        "sc",
        k1f,
        bf,
        avgdl,
    )
    # nested disjunction rounding (:242-259): variants of one source term
    # -> f32, source-term groups -> f32, + the wildcard MUST's 1.0
    gsum = (
        contrib.groupBy("input_id", "doc_id", "src")
        .agg(F.sum(F.col("sc").cast("double")).alias("gs"))
        .withColumn("gsc", F.col("gs").cast("float"))
    )
    per_doc = (
        gsum.groupBy("input_id", "doc_id")
        .agg(F.sum(F.col("gsc").cast("double")).alias("ds"))
        .withColumn(
            "score",
            (F.col("ds").cast("float").cast("double") + F.lit(1.0)).cast("float"),
        )
        # the class-exists wildcard MUST: only labeled docs are hits
        .join(classes_df.select("doc_id").distinct(), "doc_id", "left_semi")
    )
    if idx.deletes is not None:
        per_doc = per_doc.join(idx.deletes, "doc_id", "left_anti")
    topk = (
        per_doc.withColumn(
            "hit_rank",
            F.row_number().over(
                Window.partitionBy("input_id").orderBy(
                    F.desc("score"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("hit_rank") <= k)
        .withColumn("max_score", F.max("score").over(w_in))
    )
    return _class_vote(topk, classes_df, k, top_n)


# ------------------------------------------------------------------ BM25 NB


def bm25_nb_classify(
    idx: IndexTables,
    inputs_df: DataFrame,
    analyzer,
    class_field: str = "class",
    top_n: int = 3,
    field: str = "text",
    id_col: str = "input_id",
    text_col: str = "text",
    k1: float = bm25.K1,
    b: float = bm25.B,
) -> DataFrame:
    """BM25NBClassifier (``classification/BM25NBClassifier.java``) over a
    batch of inputs: a Naive Bayes whose probabilities are BM25 scores.

    ``idx`` is a MULTI-FIELD index (:func:`~lucene_spark.index.builder
    .combine_fields`) carrying both the text field and an indexed class
    field — the reference enumerates classes from the class field's terms
    dictionary (:124-136) and runs every probe against the same reader.
    Index the class field with
    :class:`~lucene_spark.analysis.analyzer.KeywordAnalyzer`: the
    reference requires the class field "must not be heavely analyzed"
    (:74-75) — a tokenizing analyzer would split/lowercase labels into
    different class terms than the stored values.

    Per class c (all double until the final score, as the reference):

    * log prior   = ln(top-1 score of ``TermQuery(class:c)``)   (:222-231)
    * P(w|c)      = top-1 float32 score of ``class:c MUST + text:w
      SHOULD`` (:205-220) — per doc the conjunction adds the two float32
      leaf scores in double and casts float; the top-1 maximizes that
      per-doc float over the class's docs (docs without w score the
      class leaf alone)
    * log lik.    = Σ_w cnt(w) · ln P(w|c)                      (:197-203)
    * softmax     = exp(raw − (smax + ln Σ exp(raw − smax)))    (:147-173)

    A class whose docs are ALL deleted still appears: its prior query has
    no live hits → prior 0 (:230) and every P(w|c) = 1 → ln 0 (:219), so
    it rides at raw = 0 exactly as the reference computes.

    Envelope (documented, mirrored exactly by the DuckDB twin): the
    reference accumulates the likelihood per token occurrence in token
    order and the softmax denominator in score-sorted class order — both
    pure-double sums whose ULPs depend on association.  This engine (and
    the oracle) fold multiplicity as cnt·ln P and run BOTH sums as
    deterministic ordered left folds (terms by term ASC; classes by
    raw DESC, class ASC — the reference's own sort order), so the two
    engines agree bit-for-bit and match the reference up to double
    summation association.
    """
    ln32, ln64, exp64 = _ln_f32(), _ln_f64(), _exp_f64()
    qlen32 = _qlen_f32()
    spark = inputs_df.sparkSession
    k1f, bf = float(np.float32(k1)), float(np.float32(b))

    # ---- class-field side: per-doc class leaf scores, per-class max
    fsc_rows = idx.fieldstats.filter(F.col("field") == class_field).collect()
    if not fsc_rows or int(fsc_rows[0]["doc_count"]) == 0:
        # no indexed class field -> no classes -> empty result, the
        # reference's empty assignedClasses list
        return spark.createDataFrame(
            [], "input_id long, class string, score double, rank int"
        )
    fsc = fsc_rows[0]
    nC, sttfC = int(fsc["doc_count"]), int(fsc["sum_total_term_freq"])
    avgdlC = float(bm25.avgdl(sttfC, nC))
    cls_stats = (
        idx.termstats.filter(F.col("field") == class_field)
        .select("term", "doc_freq")
        .withColumn(
            "cidf",
            ln32(
                F.lit(1.0)
                + (F.lit(float(nC)) - F.col("doc_freq") + F.lit(0.5))
                / (F.col("doc_freq") + F.lit(0.5))
            ),
        )
        .select("term", "cidf")
    )
    cls_norms = idx.doclens.filter(F.col("field") == class_field).select(
        "doc_id", qlen32(F.col("norm_byte")).alias("qlen")
    )
    cls_doc_scores = _bm25_leaf(
        idx.postings.filter(F.col("field") == class_field)
        .join(F.broadcast(cls_stats), "term")
        .join(cls_norms, "doc_id"),
        "cidf",
        "csc",
        k1f,
        bf,
        avgdlC,
    ).select("doc_id", F.col("term").alias("class"), "csc")
    if idx.deletes is not None:
        cls_doc_scores = cls_doc_scores.join(idx.deletes, "doc_id", "left_anti")
    # classes enumerate from the terms DICTIONARY (:124-136) — a class
    # whose docs are all deleted keeps a row with sc NULL (-> raw 0)
    sc_max = (
        idx.termstats.filter(F.col("field") == class_field)
        .select(F.col("term").alias("class"))
        .join(
            cls_doc_scores.groupBy("class").agg(F.max("csc").alias("sc")),
            "class",
            "left",
        )
    )

    # ---- text side: per-doc word leaf scores over the inputs' terms
    fst = idx.fieldstats.filter(F.col("field") == field).collect()[0]
    nT, sttfT = int(fst["doc_count"]), int(fst["sum_total_term_freq"])
    avgdlT = float(bm25.avgdl(sttfT, nT))
    toks = tokenize_inputs(inputs_df, analyzer, id_col, text_col)
    qterms = toks.select("term").distinct()
    w_stats = (
        idx.termstats.filter(F.col("field") == field)
        .join(F.broadcast(qterms), "term")
        .withColumn(
            "widf",
            ln32(
                F.lit(1.0)
                + (F.lit(float(nT)) - F.col("doc_freq") + F.lit(0.5))
                / (F.col("doc_freq") + F.lit(0.5))
            ),
        )
        .select("term", "widf")
    )
    txt_norms = idx.doclens.filter(F.col("field") == field).select(
        "doc_id", qlen32(F.col("norm_byte")).alias("qlen")
    )
    word_doc_scores = _bm25_leaf(
        idx.postings.filter(F.col("field") == field)
        .join(F.broadcast(w_stats), "term")
        .join(txt_norms, "doc_id"),
        "widf",
        "wsc",
        k1f,
        bf,
        avgdlT,
    ).select("doc_id", "term", "wsc")
    if idx.deletes is not None:
        word_doc_scores = word_doc_scores.join(idx.deletes, "doc_id", "left_anti")

    # per (class, word): max over the class's docs of the per-doc
    # conjunction float32(csc + wsc); docs without w contribute csc alone,
    # so the top-1 is greatest(joint max, class max)
    joint = (
        word_doc_scores.join(cls_doc_scores, "doc_id")
        .withColumn(
            "t",
            (F.col("csc").cast("double") + F.col("wsc").cast("double")).cast("float"),
        )
        .groupBy("class", "term")
        .agg(F.max("t").alias("m"))
    )
    grid = (
        sc_max.crossJoin(F.broadcast(qterms))
        .join(joint, ["class", "term"], "left")
        .withColumn(
            "p",
            F.when(F.col("m").isNull(), F.col("sc")).otherwise(
                F.greatest(F.col("m"), F.col("sc"))
            ),
        )
        # sc NULL (all-deleted class): no live hits -> P = 1 -> ln 0
        .withColumn(
            "lnp",
            F.when(F.col("sc").isNull(), F.lit(0.0)).otherwise(
                ln64(F.col("p").cast("double"))
            ),
        )
        .select("class", "term", "lnp")
    )

    # ordered likelihood sum (envelope: term ASC): a term-sorted
    # left fold keeps the double additions in one defined association on
    # both engines
    ll = (
        toks.join(grid, "term")
        .withColumn("v", F.col("cnt").cast("double") * F.col("lnp"))
        .groupBy("input_id", "class")
        .agg(F.collect_list(F.struct(F.col("term"), F.col("v"))).alias("xs"))
        .withColumn(
            "ll",
            F.aggregate(
                F.array_sort("xs"), F.lit(0.0), lambda acc, x: acc + x["v"]
            ),
        )
        .select("input_id", "class", "ll")
    )

    raw = (
        inputs_df.select(F.col(id_col).alias("input_id"))
        .crossJoin(F.broadcast(sc_max))
        .join(ll, ["input_id", "class"], "left")
        # sc NULL (all-deleted class): prior query has no hits -> ln = 0
        .withColumn(
            "raw",
            F.when(F.col("sc").isNull(), F.lit(0.0)).otherwise(
                ln64(F.col("sc").cast("double"))
            )
            + F.coalesce(F.col("ll"), F.lit(0.0)),
        )
    )

    # normClassificationResults: double log-sum-exp; the denominator is a
    # left fold in (raw DESC, class ASC) — the reference's sorted-class
    # order — via an ordered-window collect_list (window running SUMS
    # leave the double association engine-defined; a fold of the ordered
    # list does not), all on one lineage (no self-join recompute)
    w_in = Window.partitionBy("input_id")
    w_full = (
        Window.partitionBy("input_id")
        .orderBy(F.desc("raw"), F.asc("class"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    scored = (
        raw.withColumn("smax", F.max("raw").over(w_in))
        .withColumn("e", exp64(F.col("raw") - F.col("smax")))
        .withColumn("es", F.collect_list("e").over(w_full))
        .withColumn(
            "sumexp",
            F.aggregate(F.col("es"), F.lit(0.0), lambda acc, x: acc + x),
        )
        .withColumn("loga", F.col("smax") + ln64(F.col("sumexp")))
        .withColumn("score", exp64(F.col("raw") - F.col("loga")))
    )
    w_rank = Window.partitionBy("input_id").orderBy(F.desc("score"), F.asc("class"))
    return (
        scored.withColumn("rank", (F.row_number().over(w_rank) - 1).cast("int"))
        .filter(F.col("rank") < top_n)
        .select(
            F.col("input_id").cast("long"),
            F.col("class").cast("string"),
            F.col("score").cast("double"),
            "rank",
        )
    )


# ------------------------------------------------------------------ surface


def assign_class(
    idx: IndexTables,
    classes_df: DataFrame,
    text: str,
    analyzer,
    method: str = "naive_bayes",
    **kwargs,
) -> tuple[str, float] | None:
    """The reference's single-text ``assignClass(String)`` surface: one
    input row through the batch path, returning (class, score) or None.
    ``method``: ``naive_bayes`` | ``knn`` | ``knn_fuzzy``."""
    methods = {
        "naive_bayes": naive_bayes_classify,
        "knn": knn_classify,
        "knn_fuzzy": knn_fuzzy_classify,
    }
    if method not in methods:
        raise ValueError(f"unknown classification method {method!r}")
    spark = classes_df.sparkSession
    inputs = spark.createDataFrame([(0, text)], "input_id long, text string")
    rows = methods[method](
        idx, classes_df, inputs, analyzer, top_n=1, **kwargs
    ).collect()
    if not rows:
        return None
    return rows[0]["class"], float(rows[0]["score"])
