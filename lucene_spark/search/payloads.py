"""Payload-driven scoring (the reference's ``queries/payloads`` module).

``PayloadScoreQuery(SpanQuery, PayloadFunction, PayloadDecoder,
includeSpanScore)`` (``queries/payloads/PayloadScoreQuery.java:47-75``)
scores a doc by folding the payloads found at the matched spans' leaf
positions through a :class:`PayloadFunction`
(``queries/payloads/PayloadFunction.java`` —
``Min/Max/Average/SumPayloadFunction``).  With ``includeSpanScore=false``
the payload aggregate IS the score (the common feature-ranking use).

This engine stores payloads float32-decoded (``PayloadDecoder.java:34``
FLOAT_DECODER convention — see ``builder.build_positions``), so scoring is
pure column math over the positional table:

* the positions scan is term + tbucket pruned (one partition-pruned file
  read per query term, never a full scan),
* a doc's payloads for a term live in ONE aligned array on ONE row (docs
  are never split across segments), so min/max/avg/sum are per-row array
  expressions — whole-stage-codegen JVM work, no shuffle beyond the
  distributed TakeOrderedAndProject top-k.

Envelope (documented): the span operand is a single term
(``SpanTermQuery`` — every position is one matched span, so "payloads at
matched spans" = the term's whole payload array).  Composite spans would
need per-match leaf-position tracking that the interval evaluator does not
retain; payload FILTERING inside composite interval/span trees is covered
by :class:`lucene_spark.search.intervals.IPayloadFilteredTerm`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.index.builder import IndexTables
from lucene_spark.search.intervals import _rank_topk

__all__ = [
    "PAYLOAD_FUNCTIONS",
    "PayloadScoreQuery",
    "payload_scores",
    "payload_score_topk",
]

PAYLOAD_FUNCTIONS = ("min", "max", "avg", "sum")


@dataclass(frozen=True)
class PayloadScoreQuery:
    """The query-tree form (``PayloadScoreQuery.java:47-83``): usable as a
    clause inside a ``BooleanQuery`` (``IndexSearcher._score`` dispatches
    it).  With ``include_span_score`` (the 3-arg reference ctor's default)
    the doc score is the wrapped term's BM25 span score MULTIPLIED by the
    payload aggregate (``scoreCurrentDoc: getSpanScore() *
    getPayloadScore()``, float32 product); without it the payload
    aggregate alone is the score.  The XML parser's ``BoostingTermQuery``
    element builds the include-span-score form with ``avg``."""

    term: str
    function: str = "avg"
    field: str = "text"
    include_span_score: bool = False

    def rewrite(self):
        """Identity — satisfies the ``Query.rewrite`` fixpoint contract so
        the query can sit inside a ``BooleanQuery`` tree."""
        return self


def payload_scores(
    idx: IndexTables,
    term: str,
    function: str = "max",
    field: str = "text",
    boost: float = 1.0,
) -> DataFrame:
    """All matching docs' payload-aggregate scores (doc_id, score float)
    for ``PayloadScoreQuery(SpanTermQuery(term), fn,
    includeSpanScore=false)`` — the Scorer form;
    :func:`payload_score_topk` adds the top-k collector.

    Float32 parity notes: payloads are stored float32; ``min``/``max`` are
    exact; ``sum``/``avg`` fold in position order with float32
    compound-assignment semantics (``SumPayloadFunction.currentScore`` /
    ``AveragePayloadFunction.docScore``'s ``payloadScore + currentScore``
    float adds), reproduced by an ``aggregate`` fold cast back to float
    per step.  Envelope hair (documented): ``avg``'s final division is
    computed in double then rounded to float32 — Java divides in float
    directly; the two can differ by 1 ulp only in adversarial
    double-rounding cases, never on integer-valued payloads.
    """
    if function not in PAYLOAD_FUNCTIONS:
        raise ValueError(f"payload function must be one of {PAYLOAD_FUNCTIONS}")
    pos = idx.positions_for_terms(field, [term])
    if "payloads" not in pos.columns:
        raise ValueError(
            "payload scoring needs a payload-indexed positional table"
            " (build the index with an analyzer payload_fn)"
        )
    if function == "max":
        score = F.array_max("payloads")
    elif function == "min":
        score = F.array_min("payloads")
    else:
        # float32 left fold in emission (position) order
        s = F.expr(
            "aggregate(payloads, CAST(0.0 AS FLOAT),"
            " (acc, x) -> CAST(acc + x AS FLOAT))"
        )
        if function == "avg":
            score = (s.cast("double") / F.size("payloads")).cast("float")
        else:
            score = s
    if boost != 1.0:
        import numpy as np

        score = (
            (F.lit(float(np.float32(boost))) * score.cast("float"))
            .cast("float")
        )
    return pos.select("doc_id", score.alias("score"))


def payload_score_topk(
    idx: IndexTables,
    term: str,
    function: str = "max",
    k: int = 10,
    field: str = "text",
) -> DataFrame:
    """Top-k docs for the payload score — (doc_id, score float, rank int),
    ties by doc_id ascending (TopDocs order)."""
    return _rank_topk(payload_scores(idx, term, function, field=field), k)
