"""Collectors: facets, grouping, block join, pagination, fusion, rescoring.

Spark-first re-expressions of the reference's aggregation/collection
operators (SURVEY.md §2.5–2.7):

* facet counts (``facet/FacetsCollector.java``, ``StringValueFacetCounts``):
  GROUP BY label COUNT over the hit set — one shuffle, map-side combined,
* numeric range facets (``facet/range/LongRangeFacetCounts.java``): bucket
  CASE expression + groupBy,
* grouping / top-k per group (``grouping/FirstPassGroupingCollector`` +
  ``SecondPassGroupingCollector``): a window ``row_number() <= k`` — Spark
  does in one pass what Lucene needs two passes for,
* parent/child block join (``join/ToParentBlockJoinQuery.java``): child
  scores rolled up per parent with max/sum/avg — for transcripts this is
  the turn → conversation rollup,
* ``searchAfter`` pagination (``IndexSearcher.java:576-591``): strict
  (score, docID) anchor filter before the top-k,
* reciprocal-rank fusion (``TopDocs.rrf``, ``search/TopDocs.java:372``),
* rescoring (``search/QueryRescorer.java``): second-pass re-rank of top-N.

All operate on a *scored* DataFrame (doc_id, score) — the output of
``IndexSearcher.score_all`` — joined against doc metadata, so they compose
with every query type.
"""

from __future__ import annotations

import re
from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def facet_counts(scored: DataFrame, docmeta: DataFrame, facet_col: str) -> DataFrame:
    """(label, count) of hit docs per ``facet_col`` value, count DESC."""
    return (
        scored.join(docmeta.select("doc_id", facet_col), "doc_id")
        .groupBy(F.col(facet_col).alias("label"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("label"))
    )


def taxonomy_facet_counts(
    scored: DataFrame,
    docmeta: DataFrame,
    path_cols: Sequence[str],
    sep: str = "/",
) -> DataFrame:
    """Hierarchical (taxonomy) facet counts: every path *prefix* gets a
    count, so drilling down a level is a lookup, not a re-aggregation
    (``facet/taxonomy/TaxonomyReader.java:59`` ordinal tree +
    ``FastTaxonomyFacetCounts`` rollup, re-expressed as a prefix explode).

    ``path_cols`` are the dimension components in order (e.g. ``["source",
    "lang"]`` ⇒ paths like ``src1`` and ``src1/en``).  Returns (path,
    depth, n) ordered by path.  The 100 TB shape: one explode (× depth,
    small constant) + one map-side-combined groupBy — no joins per level.
    """
    cols = [F.col(c).cast("string") for c in path_cols]
    prefixes = F.array(
        *[F.concat_ws(sep, *cols[: i + 1]) for i in range(len(path_cols))]
    )
    joined = scored.join(docmeta.select("doc_id", *path_cols), "doc_id")
    return (
        joined.select(F.explode(prefixes).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .withColumn(
            # literal-escaped: F.split treats the separator as a REGEX, so
            # sep='.' (or '|') would otherwise conflate every path.  Path
            # components themselves must not contain sep (documented).
            "depth", (F.size(F.split(F.col("path"), re.escape(sep)))).cast("int")
        )
        .select("path", "depth", "n")
        .orderBy("path")
    )


def range_facet_counts(
    scored: DataFrame,
    docmeta: DataFrame,
    value_col: str,
    ranges: Sequence[tuple[str, float, float]],
) -> DataFrame:
    """Counts per declared [lo, hi) bucket (LongRangeFacetCounts shape)."""
    joined = scored.join(docmeta.select("doc_id", value_col), "doc_id")
    bucket = None
    for label, lo, hi in ranges:
        cond = (F.col(value_col) >= lo) & (F.col(value_col) < hi)
        bucket = F.when(cond, label) if bucket is None else bucket.when(cond, label)
    joined = joined.withColumn("label", bucket)
    return (
        joined.filter(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .orderBy(F.asc("label"))
    )


def grouped_topk(
    scored: DataFrame,
    docmeta: DataFrame,
    group_col: str,
    k_per_group: int,
) -> DataFrame:
    """Top-k hits per group by (score DESC, doc_id ASC) — the two-pass
    grouping collectors as one windowed pass."""
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.join(docmeta.select("doc_id", group_col), "doc_id")
        .withColumn("grp_rank", (F.row_number().over(w) - 1).cast("int"))
        .filter(F.col("grp_rank") < k_per_group)
        .select(group_col, "doc_id", "score", "grp_rank")
        .orderBy(F.asc(group_col), F.asc("grp_rank"))
    )


def diversified_topk(
    scored: DataFrame,
    docmeta: DataFrame,
    key_col: str,
    max_per_key: int,
    k: int,
) -> DataFrame:
    """``misc/search/DiversifiedTopDocsCollector.java``: global top-k with
    at most ``max_per_key`` hits per key (the "max 3 Beatles hits on the
    compilation" collector, :37-67).

    The collector's per-key/global queue dance maintains exactly the
    invariant "each doc is within its key's top-``max_per_key`` by score"
    (a doc displaced from its key queue is removed from the global queue,
    :136-156, and vice versa :164-170), so the closed form is one window
    rank per key followed by the global top-k.  Ties break doc_id ASC in
    both rankings (the PQ's insertion-order tie-break is not deterministic
    in the reference; docID ASC is this port's declared policy, mirrored
    by the oracle).  Returns (doc_id, score, rank)."""
    wk = Window.partitionBy(key_col).orderBy(F.desc("score"), F.asc("doc_id"))
    wg = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.join(docmeta.select("doc_id", key_col), "doc_id")
        .withColumn("key_rank", F.row_number().over(wk))
        .filter(F.col("key_rank") <= max_per_key)
        .withColumn("rank", (F.row_number().over(wg) - 1).cast("int"))
        .filter(F.col("rank") < k)
        .select("doc_id", "score", "rank")
        .orderBy("rank")
    )


def high_freq_terms(termstats: DataFrame, n: int, by: str = "ttf") -> DataFrame:
    """``misc/HighFreqTerms.java``: the top-``n`` terms by total term
    frequency (``-t`` flag; ``by="df"`` for the docFreq ordering, :36-48).
    One ORDER BY + LIMIT over the terms dictionary; ties term ASC (the
    reference's PQ breaks ties by term comparison too)."""
    order = (
        [F.desc("total_term_freq"), F.asc("term")]
        if by == "ttf"
        else [F.desc("doc_freq"), F.asc("term")]
    )
    return (
        termstats.orderBy(*order)
        .limit(n)
        .select("term", "doc_freq", "total_term_freq")
    )


def block_join_parents(
    scored: DataFrame,
    docmeta: DataFrame,
    parent_col: str,
    score_mode: str = "max",
) -> DataFrame:
    """Child hits rolled up to parents (ToParentBlockJoinQuery ScoreMode):
    (parent, score float32 via double-acc agg, n_children)."""
    agg = {
        "max": F.max,
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
    }[score_mode](F.col("score").cast("double"))
    return (
        scored.join(docmeta.select("doc_id", parent_col), "doc_id")
        .groupBy(F.col(parent_col).alias("parent"))
        .agg(
            agg.cast("float").alias("score"),
            F.count("*").alias("n_children"),
        )
        .orderBy(F.desc("score"), F.asc("parent"))
    )


def block_join_children(
    parent_hits: DataFrame, docmeta: DataFrame, parent_col: str
) -> DataFrame:
    """The reverse block join (``join/ToChildBlockJoinQuery.java``):
    every CHILD of a matching parent becomes a hit carrying its parent's
    score — the reference's scorer returns ``parentScore`` for each
    child it advances through in the block.  ``parent_hits``: (parent,
    score), e.g. :func:`block_join_parents` output or any parent-side
    query keyed by the parent value; composes round-trip with the
    to-parent direction."""
    return (
        docmeta.select("doc_id", parent_col)
        .join(
            parent_hits.select(
                F.col("parent").alias(parent_col), F.col("score")
            ),
            parent_col,
        )
        .select("doc_id", F.col("score").cast("float").alias("score"))
    )


def sort_topk(
    scored: DataFrame,
    docmeta: DataFrame,
    sort_cols: Sequence[tuple[str, bool]],
    k: int,
) -> DataFrame:
    """TopFieldCollector: top-k of the hit set by arbitrary field sort
    (``search/TopFieldCollector.java`` / ``Sort``/``SortField``); docID ASC
    is always the final tie-break.  Spark's TakeOrderedAndProject is the
    distributed per-partition-heap + merge."""
    meta_cols = [c for c, _ in sort_cols if c in docmeta.columns]
    joined = scored.join(docmeta.select("doc_id", *meta_cols), "doc_id")
    order = [
        (F.desc(c) if desc else F.asc(c)) for c, desc in sort_cols
    ] + [F.asc("doc_id")]
    topk = joined.orderBy(*order).limit(k)
    w = F.row_number().over(Window.orderBy(*order)) - 1
    return topk.withColumn("rank", w.cast("int"))


def function_score(
    docs: DataFrame, expr: str, k: int | None = None
) -> DataFrame:
    """FunctionQuery / expressions-module analog: score every doc by a SQL
    expression over its (doc-values) columns — Spark's ``expr()`` IS the
    compiled expression engine (richer than
    ``expressions/js/JavascriptCompiler.java``)."""
    scored = docs.select("doc_id", F.expr(expr).cast("double").alias("score"))
    if k is None:
        return scored
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return topk.withColumn("rank", w.cast("int"))


def distinct_values(scored: DataFrame, docmeta: DataFrame, col: str) -> DataFrame:
    """AllGroupsCollector/DistinctValuesCollector: distinct values of
    ``col`` over the hit set + total distinct count column."""
    vals = (
        scored.join(docmeta.select("doc_id", col), "doc_id")
        .select(F.col(col).alias("value"))
        .distinct()
        .orderBy("value")
    )
    return vals


def drill_sideways(
    dim_hits: dict[str, DataFrame],
    base_hits: DataFrame | None,
    docmeta: DataFrame,
) -> dict[str, DataFrame]:
    """DrillSideways (facet/DrillSideways.java): for each drilled dimension,
    facet counts computed with every OTHER dimension's filter applied but
    its own dropped (the N+1 aggregations share the per-dim hit sets).

    ``dim_hits[dim]`` = docs passing that dim's drill-down filter;
    ``base_hits`` = docs matching the base query (or None = match-all).
    Returns {dim: (label, n) facet counts over docmeta[dim]}.
    """
    out = {}
    dims = list(dim_hits)
    for dim in dims:
        hits = base_hits
        for other in dims:
            if other == dim:
                continue
            oh = dim_hits[other].select("doc_id")
            hits = oh if hits is None else hits.join(oh, "doc_id", "left_semi")
        if hits is None:
            hits = docmeta.select("doc_id")
        out[dim] = facet_counts(hits.select("doc_id"), docmeta, dim)
    return out


def search_after(
    scored: DataFrame, after_score: float, after_doc: int, k: int
) -> DataFrame:
    """Hits strictly after the (score, docID) anchor, top-k
    (IndexSearcher.searchAfter bounds)."""
    cond = (F.col("score") < F.lit(after_score)) | (
        (F.col("score") == F.lit(after_score)) & (F.col("doc_id") > F.lit(after_doc))
    )
    topk = scored.filter(cond).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return topk.withColumn("rank", w.cast("int"))


def rrf(results: Sequence[DataFrame], k: int = 60, top_n: int | None = None) -> DataFrame:
    """Reciprocal-rank fusion of scored lists: Σ 1/(k + rank_i + 1)
    (TopDocs.rrf semantics; rank is 0-based here so +1 keeps the classic
    1/(k+r) with r starting at 1)."""
    ranked = []
    for i, df in enumerate(results):
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ranked.append(
            df.select(
                "doc_id", (F.lit(1.0) / (F.lit(k) + F.row_number().over(w))).alias("rr")
            )
        )
    fused = (
        reduce(lambda a, b: a.unionByName(b), ranked)
        .groupBy("doc_id")
        .agg(F.sum("rr").alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    )
    return fused.limit(top_n) if top_n else fused


def rescore(
    topn: DataFrame, second: DataFrame, weight_first: float = 1.0, weight_second: float = 1.0
) -> DataFrame:
    """QueryRescorer: combine first-pass top-N scores with a second query's
    scores (missing second-pass score = 0)."""
    return (
        topn.select("doc_id", F.col("score").alias("_s1"))
        .join(second.select("doc_id", F.col("score").alias("_s2")), "doc_id", "left")
        .select(
            "doc_id",
            (
                F.lit(weight_first) * F.col("_s1").cast("double")
                + F.lit(weight_second) * F.coalesce(F.col("_s2").cast("double"), F.lit(0.0))
            )
            .cast("float")
            .alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def doc_values_stats(docs: DataFrame, col: str) -> DataFrame:
    """DocValuesStats / DocValuesStatsCollector
    (``misc/search/DocValuesStats.java:76-140``): one-pass numeric
    doc-values statistics over a doc set (pass a query's hits joined to
    doc values to mirror the collector wiring).

    Returns one row: count, missing (docs with NULL), sum, min, max,
    mean, variance (population, ``variance/count``, :104-107), stdev.

    Envelope (documented): the reference accumulates Welford-style in
    docID order — a sequential recurrence a distributed engine cannot
    replay; mean/variance delegate to the engine's pairwise-mergeable
    moment aggregation (``avg``/``var_pop`` — Chan's parallel update,
    the distributed generalization of the same recurrence, numerically
    stable for any magnitude; NOT the sum-of-squares closed form, which
    overflows on large values and cancels catastrophically).  Values
    agree with the reference to double rounding; partition merge order
    sets the final ULP.  Undefined stats on an empty doc set return
    NULLs."""
    c = F.col(col).cast("double")
    agg = docs.agg(
        F.count(F.col(col)).alias("count"),
        (F.count(F.lit(1)) - F.count(F.col(col))).alias("missing"),
        F.sum(F.col(col)).alias("sum"),
        F.min(F.col(col)).alias("min"),
        F.max(F.col(col)).alias("max"),
        F.avg(c).alias("_mean"),
        F.var_pop(c).alias("_var"),
    )
    return agg.select(
        F.col("count").cast("long"),
        F.col("missing").cast("long"),
        "sum",
        "min",
        "max",
        F.when(F.col("count") > 0, F.col("_mean")).alias("mean"),
        F.when(F.col("count") > 0, F.col("_var")).alias("variance"),
        F.when(F.col("count") > 0, F.sqrt(F.col("_var"))).alias("stdev"),
    )
