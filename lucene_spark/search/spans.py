"""Span queries — the classic proximity API, answered by the intervals
algebra.

Re-expression of the reference's ``queries/spans/`` family
(``SpanTermQuery.java``, ``SpanNearQuery.java:47``, ``SpanOrQuery.java``,
``SpanNotQuery.java:38``, ``SpanFirstQuery.java``,
``SpanContainingQuery.java``, ``SpanWithinQuery.java``,
``SpanBoostQuery.java``).  Modern Lucene subsumes spans under intervals
(the spans module is in maintenance; ``Intervals.java`` is the successor),
and this engine does the same: every span query *translates* to an
:mod:`lucene_spark.search.intervals` source tree via
:func:`to_interval_source`, then runs through :func:`interval_topk` /
:func:`interval_topk_wand` (block-max pruned when every leaf term is
required).

Matching parity:

* ``SpanNearQuery(clauses, slop, inOrder)`` ⇔ ``maxgaps(slop,
  ordered/unordered(clauses))`` — a doc has an in-order spans match with
  total internal gaps ≤ slop iff a minimal ordered interval with
  gaps ≤ slop exists (minimal intervals minimize width, hence gaps, over
  the matches they represent),
* ``SpanNotQuery(include, exclude, pre, post)`` ⇔
  ``nonOverlapping`` with the exclusion window padded by pre/post
  (``SpanNotQuery.java:38-58``; pre = post = 0 is
  ``Intervals.nonOverlapping`` exactly),
* ``SpanFirstQuery(match, n)`` ⇔ intervals with exclusive end ≤ n,
* ``SpanContaining/SpanWithin`` ⇔ ``Intervals.containing/containedBy``.

Scoring: the translated query scores with the interval saturation function
(``IntervalQuery`` semantics), not the legacy ``SpanScorer`` sloppy-freq —
the envelope choice the reference itself made when it moved proximity
scoring to intervals.  Callers needing Boolean-only semantics can treat
the scores as a match ranking.  The LEGACY SpanScorer ranking (per-anchor
NearSpansOrdered enumeration + BM25 over the fractional float32 sloppy
freq) is available for ordered term NEARs via
``IndexSearcher.span_near_topk_legacy``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from lucene_spark.index.builder import IndexTables
from lucene_spark.search.intervals import (
    IContainedBy,
    IContaining,
    IFirst,
    IMaxGaps,
    INonOverlapping,
    IOr,
    IOrdered,
    ITerm,
    IUnordered,
    IntervalSource,
    interval_topk,
    interval_topk_wand,
    leaf_terms,
    required_terms,
)


class SpanQuery:
    """Base of the span-query tree (``SpanQuery.java`` analog)."""

    __slots__ = ()

    def rewrite(self):
        """Identity — spans rewrite at translation time
        (:func:`to_interval_source` + ``normalize``); this satisfies the
        ``Query.rewrite`` fixpoint contract so a span query can ride as a
        clause inside a ``BooleanQuery`` tree (the complexPhrase parser's
        output shape)."""
        return self


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    term: str


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    """``SpanNearQuery(clauses, slop, inOrder)`` — subspans within ``slop``
    total gap positions, optionally in clause order."""

    clauses: tuple
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    clauses: tuple


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    """Include spans not overlapping exclude spans; ``pre``/``post`` widen
    the exclusion window backwards/forwards (``SpanNotQuery.java:38-58``)."""

    include: SpanQuery
    exclude: SpanQuery
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    """Spans of ``match`` whose exclusive end ≤ ``n`` (near field start)."""

    match: SpanQuery
    n: int


@dataclass(frozen=True)
class SpanPositionRangeQuery(SpanQuery):
    """Spans of ``match`` lying entirely within positions [start, end)
    (``SpanPositionRangeQuery.java:42-47``); SpanFirst is the start=0
    case."""

    match: SpanQuery
    start: int
    end: int


@dataclass(frozen=True)
class SpanContainingQuery(SpanQuery):
    """``big`` spans that contain a ``little`` span."""

    big: SpanQuery
    little: SpanQuery


@dataclass(frozen=True)
class SpanWithinQuery(SpanQuery):
    """``little`` spans that lie within a ``big`` span."""

    big: SpanQuery
    little: SpanQuery


@dataclass(frozen=True)
class SpanBoostQuery(SpanQuery):
    query: SpanQuery
    boost: float = 1.0


@dataclass(frozen=True)
class SpanMultiTermQuery(SpanQuery):
    """``SpanMultiTermQueryWrapper`` analog: a multi-term query (prefix /
    wildcard / regexp / fuzzy / term-range) usable inside span clauses —
    translated to the intervals multi-term source
    (``Intervals.prefix/wildcard/...``, ``MultiTermIntervalsSource``) and
    expanded against the terms dictionary at query time, capped at
    ``max_expansions`` (``Intervals.DEFAULT_MAX_EXPANSIONS`` = 128)."""

    kind: str  # 'prefix' | 'wildcard' | 'regexp' | 'fuzzy' | 'range'
    pattern: str = ""
    max_expansions: int = 128
    max_edits: int = 1
    transpositions: bool = True
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


def to_interval_source(q: SpanQuery) -> IntervalSource:
    """Translate a span-query tree to its intervals-algebra equivalent."""
    if isinstance(q, SpanTermQuery):
        return ITerm(q.term)
    if isinstance(q, SpanNearQuery):
        subs = tuple(to_interval_source(c) for c in q.clauses)
        inner = IOrdered(subs) if q.in_order else IUnordered(subs)
        return IMaxGaps(q.slop, inner) if q.slop >= 0 else inner
    if isinstance(q, SpanOrQuery):
        return IOr(tuple(to_interval_source(c) for c in q.clauses))
    if isinstance(q, SpanNotQuery):
        return INonOverlapping(
            to_interval_source(q.include),
            to_interval_source(q.exclude),
            q.pre,
            q.post,
        )
    if isinstance(q, SpanFirstQuery):
        return IFirst(q.n, to_interval_source(q.match))
    if isinstance(q, SpanPositionRangeQuery):
        from lucene_spark.search.intervals import IPositionRange

        return IPositionRange(q.start, q.end, to_interval_source(q.match))
    if isinstance(q, SpanContainingQuery):
        return IContaining(
            to_interval_source(q.big), to_interval_source(q.little)
        )
    if isinstance(q, SpanWithinQuery):
        return IContainedBy(
            to_interval_source(q.little), to_interval_source(q.big)
        )
    if isinstance(q, SpanBoostQuery):
        return to_interval_source(q.query)  # boost applied at scoring time
    if isinstance(q, SpanMultiTermQuery):
        from lucene_spark.search.intervals import IMultiTerm

        return IMultiTerm(
            kind=q.kind,
            pattern=q.pattern,
            max_expansions=q.max_expansions,
            max_edits=q.max_edits,
            transpositions=q.transpositions,
            lower=q.lower,
            upper=q.upper,
            include_lower=q.include_lower,
            include_upper=q.include_upper,
        )
    raise TypeError(f"unsupported span query {type(q).__name__}")


def span_topk(
    idx: IndexTables,
    q: SpanQuery,
    k: int = 10,
    field: str = "text",
    pivot: float = 1.0,
    strategy: str = "flat",
) -> DataFrame:
    """Top-k docs for a span query: translate to intervals and run.

    ``strategy="flat"`` (default) uses the positional plan — measured
    faster for typical proximity shapes because the positions shuffle
    dominates and block-max cannot reduce it (BENCH.md §1e).
    ``strategy="kernel"`` opts into the block-max path (bit-identical;
    worthwhile for deep nested algebra where per-candidate evaluation is
    the cost); it requires blocks + every leaf term required — SpanOr of
    disjoint branches and SpanNot excludes always take the flat plan."""
    boost = 1.0
    while isinstance(q, SpanBoostQuery):
        boost *= q.boost
        q = q.query
    from lucene_spark.search.intervals import resolve_multiterms

    # multi-term clauses expand against the terms dictionary up front so
    # the kernel-eligibility check sees concrete leaf terms
    source = resolve_multiterms(to_interval_source(q), idx, field)
    kernel_ok = (
        idx.blocks is not None
        and idx.positions is not None
        and required_terms(source) == leaf_terms(source)
    )
    if strategy == "kernel" and not kernel_ok:
        raise ValueError(
            "kernel strategy needs blocks + a conjunctive source "
            "(required_terms == leaf_terms)"
        )
    run = interval_topk_wand if strategy == "kernel" else interval_topk
    return run(idx, source, k=k, field=field, pivot=pivot, boost=boost)
