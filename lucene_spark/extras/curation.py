"""Corpus curation: the composed training-data filter pipeline.

The operation an LLM-data pipeline actually runs over 100 TB: one pass that
decides, per document, *keep or drop and why* — exact dedup, near dedup,
length, language, quality — with a deterministic, auditable reason column
(the per-rule counts are the curation report every data card needs).

Design for scale: every rule is a column expression or a join against a
rule-specific side table (md5 keepers: one map-side-combined groupBy;
near-dup drops: the MinHash-LSH candidate pipeline, verified pairs only;
quality / language / token counts: pure column math).  The final frame is
``docs ⋈ sides`` on doc_id — no corpus² anywhere, no driver collect.

Near-dup policies:

* ``near_policy="keep_first"`` (default, greedy): a doc is dropped when it
  is the GREATER doc_id of any verified near-duplicate pair — the standard
  single-pass web-dedup policy (drop later crawls).  Not transitive: in a
  star A~C, B~C the center C drops but A and B both survive.
* ``near_policy="components"`` (round 5): connected components over the
  verified-pair graph via iterated min-label propagation
  (:func:`near_dup_components`); exactly ONE doc (the smallest doc_id)
  survives per component — cluster-level dedup.  The propagation runs over
  the PAIR graph only (≪ corpus; docs with no near-dup pair never enter
  it), and each round is one broadcast-joinable aggregation, so the loop
  costs O(diameter) tiny jobs, not corpus passes.

Rule precedence (first failing rule names the reason):
``exact_dup > near_dup > length > lang > quality > kept``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.extras.dedup import minhash_lsh_pairs
from lucene_spark.extras.textstats import lang_id, quality_scores


def near_dup_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(doc_id, component) — per pair-graph member, the smallest doc_id
    reachable through verified near-duplicate pairs.

    Connected components by min-label propagation WITH path halving: each
    round takes the min over (own label, neighbors' labels, label of the
    current label-node).  The pointer-jumping step makes convergence
    O(log·diameter) rounds instead of O(diameter) — a 52-doc chain cluster
    (versioned/crawled pages edited incrementally) converges in ~7 rounds,
    not 51 — so the ``max_rounds`` guard is a genuine runaway backstop,
    not a cliff real data can hit.  Convergence is checked every round."""
    edges = pairs.select(
        F.col("doc_a").cast("long").alias("a"),
        F.col("doc_b").cast("long").alias("b"),
    )
    edges = (
        edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .persist()
    )
    labels.count()
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .groupBy("a")
            .agg(F.min("component").alias("_nmin"))
        )
        # path halving: the label of my current label (component is always
        # a member doc_id, so the self-join is total for non-root members)
        hop = labels.select(
            F.col("doc_id").alias("component"), F.col("component").alias("_cc")
        )
        new = (
            labels.join(neigh, labels["doc_id"] == neigh["a"], "left")
            .join(hop, "component", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_nmin"), F.col("component")),
                    F.coalesce(F.col("_cc"), F.col("component")),
                ).alias("component"),
            )
            # localCheckpoint (eager) TRUNCATES the lineage — without it
            # each round's plan nests every previous round's joins and the
            # optimizer blows up exponentially after a handful of rounds
            # (the standard iterative-algorithm discipline; a cluster job
            # would checkpoint to reliable storage instead)
            .localCheckpoint(eager=True)
        )
        changed = (
            new.withColumnRenamed("component", "_c")
            .join(labels, "doc_id")
            .filter(F.col("_c") != F.col("component"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            edges.unpersist()
            return labels
    labels.unpersist()
    edges.unpersist()
    raise RuntimeError(
        f"near_dup_components did not converge in {max_rounds} rounds"
    )


def curate(
    docs: DataFrame,
    text_col: str = "text",
    near_threshold: float = 0.5,
    min_words: int = 1,
    max_words: int = 1_000_000,
    allowed_langs: tuple = ("en",),
    min_quality: float = 0.0,
    near_policy: str = "keep_first",
    max_substring_dup_ratio: float | None = None,
    substring_window: int = 10,
) -> DataFrame:
    """(doc_id, keep boolean, reason string) per input document.

    ``max_substring_dup_ratio`` (opt-in, round 5) adds a SUBSTRING-level
    rule between ``near_dup`` and ``length``: a doc drops with reason
    ``substring_dup`` when the fraction of its words covered by
    corpus-duplicated spans (:func:`~lucene_spark.extras.dedup.
    duplicated_substring_spans`, window = ``substring_window``) exceeds
    the ratio — the boilerplate/templated-page signal document-level
    near-dup misses (the page differs, the passages repeat)."""
    if near_policy not in ("keep_first", "components"):
        raise ValueError(f"unknown near_policy {near_policy!r}")
    d = docs.select("doc_id", F.col(text_col).alias("text"))

    keepers = d.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("_keeper")
    )
    exact = d.join(keepers, F.md5(d["text"]) == keepers["_h"]).select(
        "doc_id", (F.col("doc_id") != F.col("_keeper")).alias("_exact_dup")
    )

    pairs = minhash_lsh_pairs(d, threshold=near_threshold)
    if near_policy == "components":
        near_drops = (
            near_dup_components(pairs)
            .filter(F.col("doc_id") != F.col("component"))
            .select("doc_id")
            .withColumn("_near_dup", F.lit(True))
        )
    else:
        near_drops = (
            pairs.select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .withColumn("_near_dup", F.lit(True))
        )

    q = quality_scores(d).select("doc_id", "n_words", "quality")
    lang = lang_id(d).select("doc_id", "lang")

    joined = (
        exact.join(near_drops, "doc_id", "left")
        .join(q, "doc_id")
        .join(lang, "doc_id")
        .fillna({"_near_dup": False})
    )
    if max_substring_dup_ratio is not None:
        from lucene_spark.extras.dedup import duplicated_substring_spans

        # spans never overlap after the island merge, so covered words =
        # Σ span lengths — one tiny per-doc aggregation joined back
        cov = (
            duplicated_substring_spans(d, window=substring_window)
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("span_end") - F.col("span_start") + 1).alias(
                    "_dup_words"
                )
            )
        )
        joined = joined.join(cov, "doc_id", "left").withColumn(
            "_sub_dup",
            F.coalesce(F.col("_dup_words"), F.lit(0))
            / F.greatest(F.col("n_words"), F.lit(1))
            > max_substring_dup_ratio,
        )
    else:
        joined = joined.withColumn("_sub_dup", F.lit(False))
    reason = (
        F.when(F.col("_exact_dup"), F.lit("exact_dup"))
        .when(F.col("_near_dup"), F.lit("near_dup"))
        .when(F.col("_sub_dup"), F.lit("substring_dup"))
        .when(
            (F.col("n_words") < min_words) | (F.col("n_words") > max_words),
            F.lit("length"),
        )
        .when(~F.col("lang").isin(list(allowed_langs)), F.lit("lang"))
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        "doc_id",
        (reason == "kept").alias("keep"),
        reason.alias("reason"),
    )


def curation_report(decisions: DataFrame) -> DataFrame:
    """(reason, n_docs) — the data-card summary of a curate() pass."""
    return decisions.groupBy("reason").agg(
        F.count("*").cast("long").alias("n_docs")
    )
