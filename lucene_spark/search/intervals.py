"""Minimal intervals subset: ordered / unordered two-term NEAR queries.

Re-expression of the reference's intervals query family
(``queries/intervals/``): :func:`interval_near_topk` is
``IntervalQuery(field, Intervals.maxwidth(w, Intervals.ordered(a, b)))``
(or ``Intervals.unordered``) over the positional postings table.

Semantics implemented (two single-term sub-sources):

* **minimal ordered intervals** (``OrderedIntervalsSource.java:101-185``,
  ``MinimizingConjunctionIntervalsSource``): the pairs ``(s, e)`` with
  ``s`` an A-position, ``e = min{B > s}``, and no other A-position inside
  ``(s, e)`` — i.e. per distinct ``e`` keep the largest ``s``,
* **minimal unordered intervals** (``UnorderedIntervalsSource``): adjacent
  opposite-term pairs in the merged position sequence (any pair with
  another A/B position strictly inside contains a smaller valid interval),
* **width filter** (``Intervals.maxwidth`` → ``FilteredIntervalsSource``):
  keep intervals with ``end - start + 1 <= max_width``,
* **scoring** (``IntervalScorer.java:59-68``): per doc,
  ``freq = (float)(freq + 1.0 / max(length - minExtent + 1, 1))`` over the
  kept intervals in emission order (double division added into a float32
  accumulator — Java compound assignment), ``minExtent = 2`` for a
  two-term source, then the saturation score function
  (``IntervalScoreFunction.java:66-74``):
  ``score = boost * (1f - pivot / (pivot + freq))`` in float32
  (``IntervalQuery`` defaults ``pivot = 1``).

The plan is the positional-verify shape: per-term position arrays join on
doc_id (postings-sized, never corpus-sized — norms are not needed, the
score depends only on interval structure), one vectorized pandas UDF
computes the per-doc freq, and ``TakeOrderedAndProject`` does the
distributed top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.index.builder import IndexTables


def ordered_interval_lengths(
    pa: np.ndarray, pb: np.ndarray, max_width: int | None = None
) -> np.ndarray:
    """Lengths (end - start + 1) of the minimal ordered intervals [A...B],
    in emission (start ascending) order."""
    pa = np.asarray(pa, dtype=np.int64)
    pb = np.asarray(pb, dtype=np.int64)
    if len(pa) == 0 or len(pb) == 0:
        return np.array([], dtype=np.int64)
    idx = np.searchsorted(pb, pa, side="right")
    valid = idx < len(pb)
    s = pa[valid]
    e = pb[idx[valid]]
    if len(e) == 0:
        return np.array([], dtype=np.int64)
    # minimality: keep the LAST (largest) s per distinct e — s ascending
    # and e non-decreasing, so "last of each e-run" does it
    keep = np.concatenate([e[1:] != e[:-1], [True]])
    lengths = (e - s + 1)[keep]
    if max_width is not None:
        lengths = lengths[lengths <= max_width]
    return lengths


def unordered_interval_lengths(
    pa: np.ndarray, pb: np.ndarray, max_width: int | None = None
) -> np.ndarray:
    """Lengths of the minimal unordered intervals: adjacent opposite-term
    pairs of the merged position sequence."""
    pa = np.asarray(pa, dtype=np.int64)
    pb = np.asarray(pb, dtype=np.int64)
    if len(pa) == 0 or len(pb) == 0:
        return np.array([], dtype=np.int64)
    pos = np.concatenate([pa, pb])
    lab = np.concatenate([np.zeros(len(pa), np.int8), np.ones(len(pb), np.int8)])
    order = np.argsort(pos, kind="stable")
    pos, lab = pos[order], lab[order]
    adj = lab[1:] != lab[:-1]
    lengths = (pos[1:] - pos[:-1] + 1)[adj]
    if max_width is not None:
        lengths = lengths[lengths <= max_width]
    return lengths


def interval_freq(lengths: np.ndarray, min_extent: int = 2) -> np.float32:
    """``IntervalScorer.ensureFreq``: float32 accumulator, double division
    (Java ``freq += 1.0 / Math.max(length - minExtent + 1, 1)``)."""
    freq = np.float32(0.0)
    for ln in lengths:
        freq = np.float32(
            np.float64(freq) + 1.0 / max(int(ln) - min_extent + 1, 1)
        )
    return freq


# ---------------------------------------------------------------------------
# Full intervals algebra (round 4): n-ary ordered/unordered, or, maxwidth,
# maxgaps, containedBy, notContaining — arbitrary nesting.
#
# Each combinator is a per-doc transcription of the corresponding reference
# iterator's *semantics* (minimal-interval algebra, ``queries/intervals/``):
# sources produce their minimal-interval family as sorted numpy arrays
# (starts, ends, gaps), strictly increasing in both endpoints, in emission
# order.  The distributed plan stays Spark-native: one postings-sized shuffle
# groups the query terms' position arrays per candidate doc (docs prefiltered
# to those containing every *required* leaf term), a vectorized pandas UDF
# evaluates the algebra per doc, and TakeOrderedAndProject does the top-k.
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dataclass


class IntervalSource:
    """Base of the intervals-source tree (``IntervalsSource.java`` analog)."""

    __slots__ = ()


@_dataclass(frozen=True)
class ITerm(IntervalSource):
    """``Intervals.term`` — each position p is the interval [p, p]."""

    term: str


_PAYLOAD_OPS = ("<", "<=", ">", ">=", "==")


@_dataclass(frozen=True)
class IPayloadFilteredTerm(IntervalSource):
    """``Intervals.payloadFilteredTerm(term, filter)``
    (``Intervals.java:82-90`` → ``PayloadFilteredTermIntervalsSource``):
    the term's positions whose indexed payload satisfies the predicate —
    each surviving position p is the interval [p, p].

    The reference's predicate is opaque (``Predicate<BytesRef>``); here it
    is a comparison ``payload <op> value`` over the float32-decoded payload
    (the PayloadDecoder.FLOAT convention the index stores directly), which
    keeps the leaf oracle-expressible.  Requires an index built with an
    analyzer ``payload_fn`` (``FieldInfo.storePayloads``)."""

    term: str
    op: str
    value: float

    def __post_init__(self):
        if self.op not in _PAYLOAD_OPS:
            raise ValueError(f"payload op must be one of {_PAYLOAD_OPS}")


@_dataclass(frozen=True)
class IOrdered(IntervalSource):
    """``Intervals.ordered`` (``OrderedIntervalsSource.java:101-185``):
    minimal intervals of the ordered conjunction.  Adjacent equal
    sub-sources collapse to :class:`IRepeat` in :func:`normalize`
    (``OrderedIntervalsSource.build`` deduplicate →
    ``RepeatingIntervalsSource``)."""

    subs: tuple


@_dataclass(frozen=True)
class IUnordered(IntervalSource):
    """``Intervals.unordered`` (``UnorderedIntervalsSource.java:101-191``):
    minimal windows containing one interval from every sub-source.
    Duplicate sub-sources collapse to :class:`IRepeat` in
    :func:`normalize` (``UnorderedIntervalsSource.build`` deduplicate)."""

    subs: tuple


@_dataclass(frozen=True)
class IOr(IntervalSource):
    """``Intervals.or`` (``DisjunctionIntervalsSource.java:154-247``):
    containment-minimal, deduplicated union of the sub families."""

    subs: tuple


@_dataclass(frozen=True)
class IMaxWidth(IntervalSource):
    """``Intervals.maxwidth`` (``FilteredIntervalsSource.MaxWidth``):
    keep intervals with end - start + 1 <= width."""

    width: int
    sub: IntervalSource


@_dataclass(frozen=True)
class IMaxGaps(IntervalSource):
    """``Intervals.maxgaps`` (``FilteredIntervalsSource.MaxGaps``): keep
    intervals whose internal gap count (slop) is <= gaps.  Per the reference
    factory, the filter distributes over a disjunction sub-source
    (``FilteredIntervalsSource.maxGaps`` pulls up disjunctions)."""

    gaps: int
    sub: IntervalSource


@_dataclass(frozen=True)
class IContainedBy(IntervalSource):
    """``Intervals.containedBy(small, big)``
    (``ContainedByIntervalsSource.java:42-67``): intervals of *small* lying
    inside some interval of *big*."""

    small: IntervalSource
    big: IntervalSource


@_dataclass(frozen=True)
class IContaining(IntervalSource):
    """``Intervals.containing(big, small)``
    (``ContainingIntervalsSource.java``): intervals of *big* containing at
    least one interval of *small* (the mirror of containedBy; also the
    translation target of ``SpanContainingQuery``)."""

    big: IntervalSource
    small: IntervalSource


@_dataclass(frozen=True)
class INonOverlapping(IntervalSource):
    """``Intervals.nonOverlapping(minuend, subtrahend)``
    (``NonOverlappingIntervalsSource``): minuend intervals overlapping no
    subtrahend interval.  ``pre``/``post`` pad the exclusion window — the
    ``SpanNotQuery(include, exclude, pre, post)`` translation knob (0/0 is
    the reference's nonOverlapping exactly)."""

    minuend: IntervalSource
    subtrahend: IntervalSource
    pre: int = 0
    post: int = 0


@_dataclass(frozen=True)
class IFirst(IntervalSource):
    """``SpanFirstQuery(match, n)`` support shim: intervals with exclusive
    end ≤ n (inclusive end < n) — matches near the start of the field."""

    n: int
    sub: IntervalSource


@_dataclass(frozen=True)
class IPositionRange(IntervalSource):
    """``SpanPositionRangeQuery(match, start, end)`` support shim
    (``queries/spans/SpanPositionRangeQuery.java:42-47`` acceptPosition):
    intervals with start ≥ ``start`` and exclusive end ≤ ``end``
    (inclusive end < ``end``).  :class:`IFirst` is the start=0 case."""

    start: int
    end: int
    sub: IntervalSource


@_dataclass(frozen=True)
class INotContaining(IntervalSource):
    """``Intervals.notContaining(minuend, subtrahend)``
    (``NotContainingIntervalsSource.java:63-87``): the reference's streaming
    two-pointer semantics, quirks included (for point subtrahends this is
    exactly "no subtrahend position inside the interval")."""

    minuend: IntervalSource
    subtrahend: IntervalSource


# --------------------------------------------------------------------------
# round 5: block (phrase), atLeast, extend/offset (⇒ before/after/within/
# notWithin), overlapping, repeats, multi-term sources, no-match sentinel
# --------------------------------------------------------------------------


@_dataclass(frozen=True)
class INotContainedBy(IntervalSource):
    """``Intervals.notContainedBy(small, big)``
    (``NotContainedByIntervalsSource.java:70-85``): small intervals NOT
    lying inside any big interval — the streaming complement of
    :class:`IContainedBy` (first big ending at/after the small decides)."""

    small: IntervalSource
    big: IntervalSource


@_dataclass(frozen=True)
class IBlock(IntervalSource):
    """``Intervals.phrase`` (``BlockIntervalsSource.java:28-137``): each
    sub-source interval must start exactly one position after the previous
    sub's end (contiguous chain); gaps are always 0.  Construct via
    :func:`phrase` — like ``BlockIntervalsSource.build`` it pulls nested
    disjunctions up FIRST (``Intervals.or(Disjunctions.pullUp(...))``), so
    minimization cannot hide a longer branch inside a block."""

    subs: tuple


@_dataclass(frozen=True)
class IAtLeast(IntervalSource):
    """``Intervals.atLeast(m, sources)``
    (``MinimumShouldMatchIntervalsSource.java:138-260``): minimal windows
    spanning intervals from at least ``min_match`` of the sub-sources —
    the unordered-AND/OR hybrid with proximity + background queues."""

    min_match: int
    subs: tuple


@_dataclass(frozen=True)
class IExtend(IntervalSource):
    """``Intervals.extend`` (``ExtendedIntervalsSource``,
    ``ExtendedIntervalIterator.java:44-76``): widen each sub interval to
    ``[max(0, s - before), e + after]``; ``gaps()`` delegates to the inner
    iterator (extensions never count as gaps)."""

    sub: IntervalSource
    before: int
    after: int


@_dataclass(frozen=True)
class IOffset(IntervalSource):
    """``OffsetIntervalsSource.java:51-97``: the zero-width point just
    before each sub interval (``max(0, start - 1)``) when ``before``, else
    just after (``end + 1``).  The building block of ``Intervals.before``/
    ``after`` (PRECEDING/FOLLOWING)."""

    sub: IntervalSource
    before: bool


@_dataclass(frozen=True)
class IOverlapping(IntervalSource):
    """``Intervals.overlapping(source, reference)``
    (``OverlappingIntervalsSource.java:36-62``): source intervals touching
    at least one reference interval.  A conjunction source — docs must
    contain BOTH sides (the reference extends
    ``ConjunctionIntervalsSource``)."""

    source: IntervalSource
    reference: IntervalSource


@_dataclass(frozen=True)
class IRepeat(IntervalSource):
    """``RepeatingIntervalsSource.java:42-215`` (``DuplicateIntervalIterator``):
    sliding windows of ``count`` consecutive sub-source intervals, no
    minimization — how the reference matches ``ordered("a", "a")`` and
    repeated-term phrases.  ``min_extent`` is the SUB source's extent, not
    count× (``RepeatingIntervalsSource.minExtent:93-95`` — a scoring quirk
    transcribed faithfully).  Gaps = span − Σ sub-interval widths (the
    reference's ``width()`` sums ``start − end + 1``, a sign slip that only
    cancels for single-position subs; we keep the sane sum, identical for
    the term repeats the reference actually exercises)."""

    sub: IntervalSource
    count: int


@_dataclass(frozen=True)
class IMultiTerm(IntervalSource):
    """``Intervals.prefix/wildcard/regexp/fuzzyTerm/range``
    (``Intervals.java:160-370``, ``MultiTermIntervalsSource.java:43-105``):
    the disjunction of every matching term's intervals, capped at
    ``max_expansions`` (default 128, ``Intervals.DEFAULT_MAX_EXPANSIONS``)
    — exceeding the cap raises, mirroring the IllegalStateException.
    Resolved against the terms dictionary by :func:`resolve_multiterms`
    before evaluation."""

    kind: str  # 'prefix' | 'wildcard' | 'regexp' | 'fuzzy' | 'range'
    pattern: str = ""
    max_expansions: int = 128
    # fuzzy knobs (Lucene FuzzyQuery defaults)
    max_edits: int = 1
    transpositions: bool = True
    # range bounds
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


@_dataclass(frozen=True)
class INoMatch(IntervalSource):
    """``NoMatchIntervalsSource``: never emits (empty multi-term expansion,
    ``atLeast`` with too few live sources)."""

    reason: str = ""


# ------------------------------------------------------------- factory sugar
# (mirrors the Intervals.java factory compositions, reference lines cited)

_BIG = 1 << 40  # stands in for Integer.MAX_VALUE in the extend compositions


def phrase(*subs: IntervalSource) -> IntervalSource:
    """``Intervals.phrase`` (``Intervals.java:97-121``): single sub passes
    through; otherwise nested disjunctions pull up at CONSTRUCTION
    (``BlockIntervalsSource.build``) — apply :func:`normalize` afterwards
    as usual."""
    if len(subs) == 1:
        return subs[0]
    return IBlock(tuple(subs))


def analyzed_text(
    analyzer, text: str, max_gaps: int = 0, ordered: bool = True
) -> IntervalSource:
    """``Intervals.analyzedText`` (``Intervals.java:618-647`` →
    ``IntervalBuilder.analyzeText:69-121``, the simple-phrase path): run
    the analyzer over ``text`` and combine the token intervals —

    * zero tokens → no-match, one token → a bare term,
    * stopword holes become ``Intervals.extend(term, precedingSpaces, 0)``
      (``IntervalBuilder.analyzeTerms:151-170``) so the hole still
      occupies its width inside the phrase,
    * ``max_gaps == 0 and ordered`` → :func:`phrase` (the block source);
      otherwise ordered/unordered, wrapped in ``maxgaps`` unless
      ``max_gaps == -1`` (``IntervalBuilder.combineSources:131-148``).

    Envelope: single-token-per-position streams (this engine's analyzers);
    the reference's synonym (posIncr 0) and graph (posLen > 1) branches
    raise."""
    toks = analyzer.analyze_with_positions(text)
    if not toks:
        return INoMatch("analyzedText produced no tokens")
    if len(set(p for _t, p in toks)) != len(toks):
        raise ValueError(
            "analyzed_text: synonym/graph token streams are out of envelope"
        )
    if len(toks) == 1:
        return ITerm(toks[0][0])
    sources = []
    prev = -1
    for t, p in toks:
        spaces = p - prev - 1
        src: IntervalSource = ITerm(t)
        if spaces > 0:
            src = IExtend(src, spaces, 0)
        sources.append(src)
        prev = p
    if max_gaps == 0 and ordered:
        return phrase(*sources)
    inner = IOrdered(tuple(sources)) if ordered else IUnordered(tuple(sources))
    if max_gaps == -1:
        return inner
    return IMaxGaps(max_gaps, inner)


def at_least(min_match: int, *subs: IntervalSource) -> IntervalSource:
    """``Intervals.atLeast`` (``Intervals.java:561-577``): m == n degrades
    to ``unordered``, m > n to a no-match source."""
    if min_match == len(subs):
        return IUnordered(tuple(subs))
    if min_match > len(subs):
        return INoMatch(f"too few sources to match minimum of [{min_match}]")
    return IAtLeast(min_match, tuple(subs))


def before(source: IntervalSource, reference: IntervalSource) -> IntervalSource:
    """``Intervals.before`` (``Intervals.java:582-585``): source intervals
    contained by [0, ref.start − 1] for some reference interval — i.e.
    ending before a reference interval starts."""
    return IContainedBy(source, IExtend(IOffset(reference, True), _BIG, 0))


def after(source: IntervalSource, reference: IntervalSource) -> IntervalSource:
    """``Intervals.after`` (``Intervals.java:588-593``)."""
    return IContainedBy(source, IExtend(IOffset(reference, False), 0, _BIG))


def within(
    source: IntervalSource, positions: int, reference: IntervalSource
) -> IntervalSource:
    """``Intervals.within`` (``Intervals.java:509-513``): source intervals
    within ``positions`` of a reference interval = containedBy the
    reference extended both ways."""
    return IContainedBy(source, IExtend(reference, positions, positions))


def not_within(
    minuend: IntervalSource, positions: int, subtrahend: IntervalSource
) -> IntervalSource:
    """``Intervals.notWithin`` (``Intervals.java:494-499``): minuend
    intervals farther than ``positions`` from every subtrahend interval =
    nonOverlapping with the subtrahend extended both ways."""
    return INonOverlapping(minuend, IExtend(subtrahend, positions, positions))


def leaf_terms(node: IntervalSource) -> set:
    """All terms whose position lists the evaluator needs."""
    if isinstance(node, (ITerm, IPayloadFilteredTerm)):
        return {node.term}
    if isinstance(node, (IOrdered, IUnordered, IOr, IBlock, IAtLeast)):
        out = set()
        for s in node.subs:
            out |= leaf_terms(s)
        return out
    if isinstance(node, (IMaxWidth, IMaxGaps, IExtend, IOffset, IRepeat, IFirst, IPositionRange)):
        return leaf_terms(node.sub)
    if isinstance(node, (IContainedBy, INotContainedBy)):
        return leaf_terms(node.small) | leaf_terms(node.big)
    if isinstance(node, IContaining):
        return leaf_terms(node.big) | leaf_terms(node.small)
    if isinstance(node, (INotContaining, INonOverlapping)):
        return leaf_terms(node.minuend) | leaf_terms(node.subtrahend)
    if isinstance(node, IOverlapping):
        return leaf_terms(node.source) | leaf_terms(node.reference)
    if isinstance(node, INoMatch):
        return set()
    if isinstance(node, IMultiTerm):
        raise TypeError(
            "multi-term interval source must be resolved against the terms"
            " dictionary first (resolve_multiterms)"
        )
    raise TypeError(f"unknown interval source {node!r}")


def required_terms(node: IntervalSource) -> set:
    """Terms a doc MUST contain to emit any interval — drives the candidate
    prefilter join (conjunctive pushdown; an OR requires only the terms
    common to every branch, a NOT-CONTAINING only its minuend's).  A
    payload-filtered leaf still REQUIRES its term present (presence is
    necessary, not sufficient — sound for a prefilter)."""
    if isinstance(node, (ITerm, IPayloadFilteredTerm)):
        return {node.term}
    if isinstance(node, (IOrdered, IUnordered, IBlock)):
        out = set()
        for s in node.subs:
            out |= required_terms(s)
        return out
    if isinstance(node, IOr):
        parts = [required_terms(s) for s in node.subs]
        out = parts[0]
        for p in parts[1:]:
            out &= p
        return out
    if isinstance(node, IAtLeast):
        # a term is required iff dropping it leaves fewer than min_match
        # live sub-sources (the sources requiring it all die together)
        n = len(node.subs)
        reqs = [required_terms(s) for s in node.subs]
        out = set()
        for t in set().union(*reqs):
            k = sum(1 for r in reqs if t in r)
            if n - k < node.min_match:
                out.add(t)
        return out
    if isinstance(node, (IMaxWidth, IMaxGaps, IExtend, IOffset, IRepeat, IFirst, IPositionRange)):
        return required_terms(node.sub)
    if isinstance(node, IContainedBy):
        return required_terms(node.small) | required_terms(node.big)
    if isinstance(node, INotContainedBy):
        return required_terms(node.small)
    if isinstance(node, IContaining):
        return required_terms(node.big) | required_terms(node.small)
    if isinstance(node, (INotContaining, INonOverlapping)):
        return required_terms(node.minuend)
    if isinstance(node, IOverlapping):
        return required_terms(node.source) | required_terms(node.reference)
    if isinstance(node, INoMatch):
        return set()
    if isinstance(node, IMultiTerm):
        raise TypeError(
            "multi-term interval source must be resolved against the terms"
            " dictionary first (resolve_multiterms)"
        )
    raise TypeError(f"unknown interval source {node!r}")


def min_extent(node: IntervalSource) -> int:
    """``IntervalsSource.minExtent`` — the scorer's length normalizer."""
    if isinstance(node, (ITerm, IPayloadFilteredTerm, IOffset, IMultiTerm)):
        return 1
    if isinstance(node, (IOrdered, IUnordered, IBlock)):
        return sum(min_extent(s) for s in node.subs)
    if isinstance(node, IOr):
        return min(min_extent(s) for s in node.subs)
    if isinstance(node, IAtLeast):
        # sum of the min_match smallest sub extents
        # (MinimumShouldMatchIntervalsSource.minExtent:104-115)
        return sum(sorted(min_extent(s) for s in node.subs)[: node.min_match])
    if isinstance(node, (IMaxWidth, IMaxGaps, IFirst, IPositionRange)):
        return min_extent(node.sub)
    if isinstance(node, IExtend):
        return node.before + min_extent(node.sub) + node.after
    if isinstance(node, IRepeat):
        # the reference returns the SUB extent (RepeatingIntervalsSource
        # .minExtent:93-95), not count× — transcribed for scoring parity
        return min_extent(node.sub)
    if isinstance(node, (IContainedBy, INotContainedBy)):
        return min_extent(node.small)
    if isinstance(node, IContaining):
        return min_extent(node.big)
    if isinstance(node, (INotContaining, INonOverlapping)):
        return min_extent(node.minuend)
    if isinstance(node, IOverlapping):
        return min_extent(node.source)
    if isinstance(node, INoMatch):
        return 0
    raise TypeError(f"unknown interval source {node!r}")


# ---------------------------------------------------------------------------
# Disjunction pull-up (``Disjunctions.java:34-100``) + source normalization.
#
# Gap-sensitive wrappers (maxgaps, phrase/block) must see disjunctions at the
# TOP of the tree: minimal-interval iterators minimize width, so a narrow
# disjunction branch can shadow a wide one that would have satisfied the gap
# filter (the reference's Intervals.java class-comment example).  The
# reference rewrites at factory-construction time; here :func:`normalize`
# applies the same rewrite over the already-built dataclass tree — called
# once at query entry (interval_topk / interval_topk_wand / span_topk).
# ---------------------------------------------------------------------------


MAX_PULLUP_CLAUSES = 1024  # IndexSearcher.getMaxClauseCount() analog


def pull_up_disjunctions(node: IntervalSource) -> list:
    """``IntervalsSource.pullUpDisjunctions`` per concrete type: the list of
    disjuncts this source can split into (singleton = atomic)."""
    if isinstance(node, IOr):
        return list(node.subs)
    if isinstance(node, (IOrdered, IUnordered)):
        ctor = IOrdered if isinstance(node, IOrdered) else IUnordered
        return _pull_up_list(list(node.subs), lambda subs: ctor(tuple(subs)))
    if isinstance(node, IBlock):
        return _pull_up_list(list(node.subs), _make_block)
    if isinstance(node, IMaxWidth):
        # FilteredIntervalsSource.MaxWidth.pullUpDisjunctions
        return [IMaxWidth(node.width, d) for d in _split_disjunctions(node.sub)]
    if isinstance(node, IContainedBy):
        # only the BIG side pulls up (ContainedByIntervalsSource.java:83-85)
        return [
            IContainedBy(node.small, d) for d in _split_disjunctions(node.big)
        ]
    if isinstance(node, IContaining):
        return [
            IContaining(d, node.small) for d in _split_disjunctions(node.big)
        ]
    if isinstance(node, IOverlapping):
        return _pull_up_list(
            [node.source, node.reference],
            lambda subs: IOverlapping(subs[0], subs[1]),
        )
    if isinstance(node, IExtend):
        return [
            IExtend(d, node.before, node.after)
            for d in pull_up_disjunctions(node.sub)
        ]
    # Term / MultiTerm / MaxGaps / NotContaining / NonOverlapping / Repeat /
    # AtLeast / Offset / First / NoMatch: atomic (singleton pullUp)
    return [node]


def _make_block(subs) -> IntervalSource:
    """Raw block constructor with nested-block flattening
    (``BlockIntervalsSource`` ctor → ``flatten:36-47`` — gap-0 chains
    compose)."""
    flat: list = []
    for s in subs:
        flat.extend(s.subs if isinstance(s, IBlock) else [s])
    return flat[0] if len(flat) == 1 else IBlock(tuple(flat))


def _split_disjunctions(node: IntervalSource) -> list:
    """``Disjunctions.splitDisjunctions``: disjuncts with minExtent == 1 are
    regrouped into ONE or() (length-1 intervals are interchangeable under
    minimization); wider disjuncts stay separate."""
    singles, non = [], []
    for d in pull_up_disjunctions(node):
        (singles if min_extent(d) == 1 else non).append(d)
    out = []
    if singles:
        out.append(singles[0] if len(singles) == 1 else IOr(tuple(singles)))
    out.extend(non)
    return out


def _pull_up_list(subs: list, ctor) -> list:
    """``Disjunctions.pullUp(List, Function)``: cartesian expansion of each
    slot's split disjuncts, combined by ``ctor`` (the RAW constructor — no
    re-deduplication, matching the reference)."""
    rewritten: list[list] = [[]]
    for s in subs:
        ds = _split_disjunctions(s)
        if len(ds) == 1:
            for lst in rewritten:
                lst.append(ds[0])
        else:
            if len(rewritten) * len(ds) > MAX_PULLUP_CLAUSES:
                raise ValueError("too many disjunctions to expand")
            rewritten = [lst + [d] for d in ds for lst in rewritten]
    return [ctor(lst) for lst in rewritten]


def normalize(node: IntervalSource) -> IntervalSource:
    """One-pass bottom-up normalization matching the reference's factory
    builders: adjacent-equal ordered subs / duplicate unordered subs →
    :class:`IRepeat` (``OrderedIntervalsSource.build`` /
    ``UnorderedIntervalsSource.build``); nested or flattening + dedup
    (``DisjunctionIntervalsSource.create``); no-match propagation; and the
    gap-sensitive pull-up for :class:`IMaxGaps`
    (``FilteredIntervalsSource.maxGaps``) and :class:`IBlock`
    (``BlockIntervalsSource.build``).  Idempotent."""
    if isinstance(node, (ITerm, IPayloadFilteredTerm, IMultiTerm, INoMatch)):
        return node
    if isinstance(node, IOrdered):
        subs = [normalize(s) for s in node.subs]
        if any(isinstance(s, INoMatch) for s in subs):
            return INoMatch("ordered over a no-match sub")
        subs = _collapse_adjacent(subs)
        return subs[0] if len(subs) == 1 else IOrdered(tuple(subs))
    if isinstance(node, IUnordered):
        subs = [normalize(s) for s in node.subs]
        if any(isinstance(s, INoMatch) for s in subs):
            return INoMatch("unordered over a no-match sub")
        counts: dict = {}
        for s in subs:
            counts[s] = counts.get(s, 0) + 1
        dedup = [
            (IRepeat(s, c) if c > 1 else s) for s, c in counts.items()
        ]
        return dedup[0] if len(dedup) == 1 else IUnordered(tuple(dedup))
    if isinstance(node, IBlock):
        subs = []
        for s in node.subs:
            ns = normalize(s)
            if isinstance(ns, INoMatch):
                return INoMatch("phrase over a no-match sub")
            subs.extend(ns.subs if isinstance(ns, IBlock) else [ns])
        # BlockIntervalsSource.build: or(Disjunctions.pullUp(subs, Block))
        # with nested blocks flattened by the ctor
        blocks = _pull_up_list(subs, _make_block)
        return blocks[0] if len(blocks) == 1 else IOr(tuple(blocks))
    if isinstance(node, IOr):
        flat: list = []
        for s in node.subs:
            ns = normalize(s)
            if isinstance(ns, INoMatch):
                continue
            for d in ns.subs if isinstance(ns, IOr) else [ns]:
                if d not in flat:
                    flat.append(d)
        if not flat:
            return INoMatch("all disjuncts empty")
        return flat[0] if len(flat) == 1 else IOr(tuple(flat))
    if isinstance(node, IAtLeast):
        subs = [
            s for s in (normalize(x) for x in node.subs)
            if not isinstance(s, INoMatch)
        ]
        if len(subs) < node.min_match:
            return INoMatch("too few live sources for atLeast")
        if len(subs) == node.min_match:
            return normalize(IUnordered(tuple(subs)))
        return IAtLeast(node.min_match, tuple(subs))
    if isinstance(node, IMaxGaps):
        sub = normalize(node.sub)
        if isinstance(sub, INoMatch):
            return sub
        # FilteredIntervalsSource.maxGaps: distribute over the sub's OWN
        # pullUpDisjunctions (one level of or; recursive hoisting of
        # minExtent>1 branches nested under ordered/unordered/maxwidth —
        # Disjunctions.pullUp — happens inside those sources' pullUp)
        ds = pull_up_disjunctions(sub)
        if len(ds) == 1:
            return IMaxGaps(node.gaps, ds[0])
        return IOr(tuple(IMaxGaps(node.gaps, d) for d in ds))
    if isinstance(node, IMaxWidth):
        sub = normalize(node.sub)
        return sub if isinstance(sub, INoMatch) else IMaxWidth(node.width, sub)
    if isinstance(node, IFirst):
        sub = normalize(node.sub)
        return sub if isinstance(sub, INoMatch) else IFirst(node.n, sub)
    if isinstance(node, IPositionRange):
        sub = normalize(node.sub)
        return (
            sub
            if isinstance(sub, INoMatch)
            else IPositionRange(node.start, node.end, sub)
        )
    if isinstance(node, IExtend):
        sub = normalize(node.sub)
        return (
            sub
            if isinstance(sub, INoMatch)
            else IExtend(sub, node.before, node.after)
        )
    if isinstance(node, IOffset):
        sub = normalize(node.sub)
        return sub if isinstance(sub, INoMatch) else IOffset(sub, node.before)
    if isinstance(node, IRepeat):
        sub = normalize(node.sub)
        if isinstance(sub, INoMatch):
            return sub
        return sub if node.count == 1 else IRepeat(sub, node.count)
    if isinstance(node, IContainedBy):
        small, big = normalize(node.small), normalize(node.big)
        if isinstance(small, INoMatch) or isinstance(big, INoMatch):
            return INoMatch("containedBy over a no-match side")
        return IContainedBy(small, big)
    if isinstance(node, INotContainedBy):
        small, big = normalize(node.small), normalize(node.big)
        if isinstance(small, INoMatch):
            return small
        return small if isinstance(big, INoMatch) else INotContainedBy(small, big)
    if isinstance(node, IContaining):
        big, small = normalize(node.big), normalize(node.small)
        if isinstance(big, INoMatch) or isinstance(small, INoMatch):
            return INoMatch("containing over a no-match side")
        return IContaining(big, small)
    if isinstance(node, IOverlapping):
        src, ref = normalize(node.source), normalize(node.reference)
        if isinstance(src, INoMatch) or isinstance(ref, INoMatch):
            return INoMatch("overlapping over a no-match side")
        return IOverlapping(src, ref)
    if isinstance(node, INotContaining):
        minu, sub = normalize(node.minuend), normalize(node.subtrahend)
        if isinstance(minu, INoMatch):
            return minu
        return minu if isinstance(sub, INoMatch) else INotContaining(minu, sub)
    if isinstance(node, INonOverlapping):
        minu, sub = normalize(node.minuend), normalize(node.subtrahend)
        if isinstance(minu, INoMatch):
            return minu
        if isinstance(sub, INoMatch):
            return minu
        return INonOverlapping(minu, sub, node.pre, node.post)
    raise TypeError(f"unknown interval source {node!r}")


def _collapse_adjacent(subs: list) -> list:
    """``OrderedIntervalsSource.deduplicate``: runs of equal adjacent subs
    become one :class:`IRepeat`."""
    out: list = []
    run: list = []
    for s in subs:
        if not run or run[0] == s:
            run.append(s)
        else:
            out.append(IRepeat(run[0], len(run)) if len(run) > 1 else run[0])
            run = [s]
    out.append(IRepeat(run[0], len(run)) if len(run) > 1 else run[0])
    return out


def resolve_multiterms(
    node: IntervalSource, idx: IndexTables, field: str = "text"
) -> IntervalSource:
    """Expand every :class:`IMultiTerm` leaf against the index's terms
    dictionary into an :class:`IOr` of :class:`ITerm` (the reference expands
    per-segment from the terms enum, ``MultiTermIntervalsSource.java:57-88``;
    the global termstats table IS this engine's terms dictionary).  The scan
    is a driver-side lookup over the pruned vocabulary; > max_expansions
    matching terms raises (``IllegalStateException`` analog)."""
    mts = _collect_multiterms(node)
    if not mts:
        return node
    lookup = {}
    for mt in mts:
        lookup[mt] = _expand_multiterm_source(mt, idx, field)
    return _substitute_multiterms(node, lookup)


def _collect_multiterms(node: IntervalSource) -> list:
    if isinstance(node, IMultiTerm):
        return [node]
    out = []
    for child in _children(node):
        out.extend(_collect_multiterms(child))
    return out


def _children(node: IntervalSource) -> tuple:
    if isinstance(node, (IOrdered, IUnordered, IOr, IBlock, IAtLeast)):
        return node.subs
    if isinstance(node, (IMaxWidth, IMaxGaps, IExtend, IOffset, IRepeat, IFirst, IPositionRange)):
        return (node.sub,)
    if isinstance(node, (IContainedBy, INotContainedBy)):
        return (node.small, node.big)
    if isinstance(node, IContaining):
        return (node.big, node.small)
    if isinstance(node, (INotContaining, INonOverlapping)):
        return (node.minuend, node.subtrahend)
    if isinstance(node, IOverlapping):
        return (node.source, node.reference)
    return ()


def _substitute_multiterms(node: IntervalSource, lookup: dict) -> IntervalSource:
    if isinstance(node, IMultiTerm):
        return lookup[node]
    if isinstance(node, (ITerm, IPayloadFilteredTerm, INoMatch)):
        return node
    sub = lambda n: _substitute_multiterms(n, lookup)  # noqa: E731
    if isinstance(node, (IOrdered, IUnordered, IOr, IBlock)):
        return type(node)(tuple(sub(s) for s in node.subs))
    if isinstance(node, IAtLeast):
        return IAtLeast(node.min_match, tuple(sub(s) for s in node.subs))
    if isinstance(node, IMaxWidth):
        return IMaxWidth(node.width, sub(node.sub))
    if isinstance(node, IMaxGaps):
        return IMaxGaps(node.gaps, sub(node.sub))
    if isinstance(node, IFirst):
        return IFirst(node.n, sub(node.sub))
    if isinstance(node, IPositionRange):
        return IPositionRange(node.start, node.end, sub(node.sub))
    if isinstance(node, IExtend):
        return IExtend(sub(node.sub), node.before, node.after)
    if isinstance(node, IOffset):
        return IOffset(sub(node.sub), node.before)
    if isinstance(node, IRepeat):
        return IRepeat(sub(node.sub), node.count)
    if isinstance(node, IContainedBy):
        return IContainedBy(sub(node.small), sub(node.big))
    if isinstance(node, INotContainedBy):
        return INotContainedBy(sub(node.small), sub(node.big))
    if isinstance(node, IContaining):
        return IContaining(sub(node.big), sub(node.small))
    if isinstance(node, INotContaining):
        return INotContaining(sub(node.minuend), sub(node.subtrahend))
    if isinstance(node, INonOverlapping):
        return INonOverlapping(
            sub(node.minuend), sub(node.subtrahend), node.pre, node.post
        )
    if isinstance(node, IOverlapping):
        return IOverlapping(sub(node.source), sub(node.reference))
    raise TypeError(f"unknown interval source {node!r}")


def _expand_multiterm_source(
    mt: IMultiTerm, idx: IndexTables, field: str
) -> IntervalSource:
    from pyspark.sql import functions as _F

    terms_df = idx.termstats.filter(_F.col("field") == field).select("term")
    if mt.kind == "prefix":
        cond = _F.col("term").startswith(mt.pattern)
    elif mt.kind == "wildcard":
        from lucene_spark.search.searcher import wildcard_to_regex

        cond = _F.col("term").rlike(wildcard_to_regex(mt.pattern))
    elif mt.kind == "regexp":
        cond = _F.col("term").rlike("^(?:" + mt.pattern + ")$")
    elif mt.kind == "fuzzy":
        # JVM-side loose prefilter (OSA ≤ e ⇒ Levenshtein ≤ 2e), exact OSA
        # cut on the collected candidates — same recipe as the searcher's
        # FuzzyQuery expansion
        lev_cap = 2 * mt.max_edits if mt.transpositions else mt.max_edits
        cond = (
            _F.length("term").between(
                len(mt.pattern) - mt.max_edits, len(mt.pattern) + mt.max_edits
            )
            & (_F.levenshtein(_F.col("term"), _F.lit(mt.pattern)) <= lev_cap)
        )
    elif mt.kind == "range":
        cond = _F.lit(True)
        if mt.lower is not None:
            cond = cond & (
                _F.col("term") >= mt.lower
                if mt.include_lower
                else _F.col("term") > mt.lower
            )
        if mt.upper is not None:
            cond = cond & (
                _F.col("term") <= mt.upper
                if mt.include_upper
                else _F.col("term") < mt.upper
            )
    else:
        raise ValueError(f"unknown multi-term kind {mt.kind!r}")
    # fuzzy-with-transpositions prefilters LOOSELY (lev ≤ 2e ⊇ OSA ≤ e):
    # fetch headroom before the exact cut so truncation cannot silently
    # drop true matches (the searcher's FuzzyQuery expansion rule)
    loose = mt.kind == "fuzzy" and mt.transpositions
    fetch = (4 * mt.max_expansions if loose else mt.max_expansions) + 1
    matched = sorted(r["term"] for r in terms_df.filter(cond).limit(fetch).collect())
    if loose:
        if len(matched) >= fetch:
            raise ValueError(
                f"automaton [{mt.pattern}] candidate set exceeds {fetch - 1} terms"
            )
        from lucene_spark.search.searcher import _osa_distance

        matched = [t for t in matched if _osa_distance(t, mt.pattern) <= mt.max_edits]
    if len(matched) > mt.max_expansions:
        raise ValueError(
            f"automaton [{mt.pattern}] expanded to too many terms"
            f" (limit {mt.max_expansions})"
        )
    if not matched:
        return INoMatch(f"no terms match {mt.pattern!r}")
    if len(matched) == 1:
        return ITerm(matched[0])
    return IOr(tuple(ITerm(t) for t in matched))


_EMPTY3 = (
    np.array([], dtype=np.int64),
    np.array([], dtype=np.int64),
    np.array([], dtype=np.int64),
)


def _minimal_ordered(fams):
    """Greedy-chain closed form of ``OrderedIntervalsSource``'s minimizing
    iterator: for each first-family interval, chain each subsequent family to
    its first interval starting after the previous end; keep, per distinct
    final end, the chain with the largest start (the minimal interval).
    Gaps (slop) = width - sum of chained sub-interval widths
    (``OrderedIntervalsSource.java:163-171``)."""
    s0, e0, _ = fams[0]
    if len(s0) == 0:
        return _EMPTY3
    S = s0.copy()
    E = e0.copy()
    wsum = (e0 - s0 + 1).astype(np.int64)
    valid = np.ones(len(S), dtype=bool)
    for sk, ek, _ in fams[1:]:
        if len(sk) == 0:
            return _EMPTY3
        j = np.searchsorted(sk, E, side="right")
        valid &= j < len(sk)
        j = np.minimum(j, len(sk) - 1)
        E = ek[j]
        wsum = wsum + (ek[j] - sk[j] + 1)
    S, E, wsum = S[valid], E[valid], wsum[valid]
    if len(E) == 0:
        return _EMPTY3
    # E is non-decreasing in the first-interval order; minimality keeps the
    # last (max-start) chain of each distinct end
    keep = np.concatenate([E[1:] != E[:-1], [True]])
    S, E, wsum = S[keep], E[keep], wsum[keep]
    gaps = E - S + 1 - wsum
    return S, E, gaps


def _minimal_unordered(fams):
    """Transcription of ``UnorderedIntervalIterator.nextInterval``
    (``UnorderedIntervalsSource.java:142-172``): priority queue on
    (start asc, end desc), right extreme = max sub end; each emitted interval
    is minimized by popping the leading sub-interval while the composite end
    is unchanged."""
    import heapq

    n = len(fams)
    ptr = [0] * n
    heap = []
    queue_end = -1
    for i, (sk, ek, _) in enumerate(fams):
        if len(sk) == 0:
            return _EMPTY3
        heapq.heappush(heap, (int(sk[0]), -int(ek[0]), i))
        queue_end = max(queue_end, int(ek[0]))

    def _advance(i):
        nonlocal queue_end
        ptr[i] += 1
        sk, ek, _ = fams[i]
        if ptr[i] < len(sk):
            heapq.heappush(heap, (int(sk[ptr[i]]), -int(ek[ptr[i]]), i))
            queue_end = max(queue_end, int(ek[ptr[i]]))

    out_s, out_e, out_g = [], [], []
    start = -1
    while True:
        while len(heap) == n and heap[0][0] == start:
            _, _, i = heapq.heappop(heap)
            _advance(i)
        if len(heap) < n:
            break
        while True:
            start = heap[0][0]
            end = queue_end
            slop = (end - start + 1) - sum(
                int(fams[i][1][ptr[i]]) - int(fams[i][0][ptr[i]]) + 1
                for i in range(n)
            )
            if -heap[0][1] == end:
                break
            _, _, i = heapq.heappop(heap)
            _advance(i)
            if not (len(heap) == n and end == queue_end):
                break
        out_s.append(start)
        out_e.append(end)
        out_g.append(slop)
    return (
        np.asarray(out_s, dtype=np.int64),
        np.asarray(out_e, dtype=np.int64),
        np.asarray(out_g, dtype=np.int64),
    )


def _minimal_or(fams):
    """Transcription of ``DisjunctionIntervalIterator.nextInterval``
    (``DisjunctionIntervalsSource.java:222-247``): queue on (end asc,
    start desc); after each emission, pop-and-advance every branch whose
    current interval contains (incl. equals) the emitted one."""
    import heapq

    ptr = [0] * len(fams)
    heap = []
    for i, (sk, ek, _) in enumerate(fams):
        if len(sk):
            heapq.heappush(heap, (int(ek[0]), -int(sk[0]), i))
    out_s, out_e, out_g = [], [], []
    while heap:
        e0, ns0, i0 = heap[0]
        s0 = -ns0
        out_s.append(s0)
        out_e.append(e0)
        out_g.append(int(fams[i0][2][ptr[i0]]))
        while heap:
            e_i, ns_i, i = heap[0]
            if -ns_i <= s0 and e_i >= e0:  # contains the emitted interval
                heapq.heappop(heap)
                ptr[i] += 1
                sk, ek, _ = fams[i]
                if ptr[i] < len(sk):
                    heapq.heappush(
                        heap, (int(ek[ptr[i]]), -int(sk[ptr[i]]), i)
                    )
            else:
                break
    return (
        np.asarray(out_s, dtype=np.int64),
        np.asarray(out_e, dtype=np.int64),
        np.asarray(out_g, dtype=np.int64),
    )


def _contained_by(small, big):
    """``ContainedByIntervalsSource.combine``: for each small interval, the
    first big interval ending at/after it decides containment (equivalent to
    EXISTS over minimal families — both have strictly increasing endpoints)."""
    ss, se, sg = small
    bs, be, _ = big
    if len(ss) == 0 or len(bs) == 0:
        return _EMPTY3
    j = np.searchsorted(be, se, side="left")
    ok = j < len(bs)
    jj = np.minimum(j, len(bs) - 1)
    ok &= bs[jj] <= ss
    return ss[ok], se[ok], sg[ok]


def _not_contained_by(small, big):
    """``NotContainedByIntervalsSource.java:70-85``: the streaming
    complement of :func:`_contained_by` — keep small intervals for which
    the first big ending at/after them starts AFTER them."""
    ss, se, sg = small
    bs, be, _ = big
    if len(ss) == 0 or len(bs) == 0:
        return small
    j = np.searchsorted(be, se, side="left")
    jj = np.minimum(j, len(bs) - 1)
    contained = (j < len(bs)) & (bs[jj] <= ss)
    keep = ~contained
    return ss[keep], se[keep], sg[keep]


def _containing(big, small):
    """``ContainingIntervalsSource``: big intervals containing some small.
    Minimal families have strictly increasing starts AND ends, so the first
    small starting at/after the big's start has the least end among them —
    containment reduces to one searchsorted + compare."""
    bs, be, bg = big
    ss, se, _ = small
    if len(bs) == 0 or len(ss) == 0:
        return _EMPTY3
    j = np.searchsorted(ss, bs, side="left")
    ok = j < len(ss)
    jj = np.minimum(j, len(ss) - 1)
    ok &= se[jj] <= be
    return bs[ok], be[ok], bg[ok]


def _non_overlapping(minuend, subtrahend, pre=0, post=0):
    """``NonOverlappingIntervalsSource`` (+ SpanNot's pre/post padding):
    minuend intervals whose [s-pre, e+post] window touches no subtrahend
    interval.  First subtrahend with end ≥ s-pre has the least start among
    candidates — overlap reduces to one searchsorted + compare."""
    ms, me, mg = minuend
    bs, be, _ = subtrahend
    if len(bs) == 0 or len(ms) == 0:
        return minuend
    j = np.searchsorted(be, ms - pre, side="left")
    jj = np.minimum(j, len(bs) - 1)
    overlap = (j < len(bs)) & (bs[jj] <= me + post)
    keep = ~overlap
    return ms[keep], me[keep], mg[keep]


def _not_containing(minuend, subtrahend):
    """Transcription of ``NotContainingIterator.nextInterval``
    (``NotContainingIntervalsSource.java:70-86``)."""
    ms, me, mg = minuend
    bs, be, _ = subtrahend
    if len(bs) == 0:
        return minuend
    keep = np.zeros(len(ms), dtype=bool)
    bi = 0
    bpos = True
    for i in range(len(ms)):
        if not bpos:
            keep[i] = True
            continue
        while bs[bi] < ms[i] and be[bi] < me[i]:
            bi += 1
            if bi == len(bs):
                bpos = False
                break
        if not bpos or bs[bi] > me[i]:
            keep[i] = True
    return ms[keep], me[keep], mg[keep]


def _block(fams):
    """Transcription of ``BlockIntervalIterator.nextInterval``
    (``BlockIntervalsSource.java:94-125``): forward-only chaining that
    requires each sub interval to start exactly one position after the
    previous sub's end; gaps are 0 by construction."""
    n = len(fams)
    if any(len(f[0]) == 0 for f in fams):
        return _EMPTY3
    S0, E0 = fams[0][0], fams[0][1]
    ptrs = [0] * n
    out_s, out_e = [], []
    p0 = 0
    exhausted = False
    while p0 < len(S0) and not exhausted:
        prev_end = int(E0[p0])
        i = 1
        while i < n:
            sk, ek, _ = fams[i]
            while ptrs[i] < len(sk) and sk[ptrs[i]] <= prev_end:
                ptrs[i] += 1
            if ptrs[i] >= len(sk):
                exhausted = True  # a sub ran out: no more blocks anywhere
                break
            if sk[ptrs[i]] == prev_end + 1:
                prev_end = int(ek[ptrs[i]])
                i += 1
            else:
                break  # chain broken: advance the first iterator
        if not exhausted and i == n:
            out_s.append(int(S0[p0]))
            out_e.append(prev_end)
        p0 += 1
    return (
        np.asarray(out_s, dtype=np.int64),
        np.asarray(out_e, dtype=np.int64),
        np.zeros(len(out_s), dtype=np.int64),
    )


def _at_least(fams, m):
    """Transcription of ``MinimumShouldMatchIntervalIterator``
    (``MinimumShouldMatchIntervalsSource.java:155-260``): an OR-ordered
    *background* queue (end asc, start desc) feeds an AND-ordered
    *proximity* queue (start asc, end desc) of capacity m; the composite
    right extreme (queueEnd) only ever grows; minimization pops the leading
    member while the composite end is unchanged.  Quirks preserved: a
    member exhausting during the leading-edge advance ends iteration even
    if the background queue still holds intervals (``:203-213``)."""
    import heapq

    live = [i for i in range(len(fams)) if len(fams[i][0])]
    if len(live) < m:
        return _EMPTY3
    ptr = {i: 0 for i in live}
    bg: list = []  # (end, -start, i)
    prox: list = []  # (start, -end, i)
    queue_end = -1
    for i in live:
        heapq.heappush(bg, (int(fams[i][1][0]), -int(fams[i][0][0]), i))
    for _ in range(m):
        e, ns, i = heapq.heappop(bg)
        heapq.heappush(prox, (-ns, -e, i))
        queue_end = max(queue_end, e)

    def _advance_to_bg(i) -> bool:
        ptr[i] += 1
        sk, ek, _ = fams[i]
        if ptr[i] < len(sk):
            heapq.heappush(bg, (int(ek[ptr[i]]), -int(sk[ptr[i]]), i))
            return True
        return False

    def _widths_in_prox() -> int:
        return sum((-ne) - s + 1 for s, ne, _ in prox)

    start = -1
    out_s, out_e, out_g = [], [], []
    while True:
        # advance past the previous start (nextInterval's leading while)
        while len(prox) == m and prox[0][0] == start:
            s, ne, i = heapq.heappop(prox)
            if _advance_to_bg(i):
                e2, ns2, j = heapq.heappop(bg)
                heapq.heappush(prox, (-ns2, -e2, j))
                queue_end = max(queue_end, e2)
            # else: NO background refill — the reference's quirk
        if len(prox) < m:
            break
        # minimize (the do-while)
        while True:
            start = prox[0][0]
            end = queue_end
            slop = (end - start + 1) - _widths_in_prox()
            if -prox[0][1] == end:
                break
            s, ne, i = heapq.heappop(prox)
            _advance_to_bg(i)  # lead goes back to the background if alive
            if bg:
                e2, ns2, j = heapq.heappop(bg)
                heapq.heappush(prox, (-ns2, -e2, j))
                queue_end = max(queue_end, e2)
            if not (len(prox) == m and end == queue_end):
                break
        out_s.append(start)
        out_e.append(end)
        out_g.append(slop)
    return (
        np.asarray(out_s, dtype=np.int64),
        np.asarray(out_e, dtype=np.int64),
        np.asarray(out_g, dtype=np.int64),
    )


def _repeat(fam, count):
    """``DuplicateIntervalIterator`` (``RepeatingIntervalsSource.java:126-
    215``): sliding windows of ``count`` consecutive sub intervals, no
    minimization.  Gaps = span − Σ window-member widths (see the
    :class:`IRepeat` docstring for the width-sign note)."""
    S, E, _ = fam
    if len(S) < count:
        return _EMPTY3
    s_out = S[: len(S) - count + 1]
    e_out = E[count - 1 :]
    w = (E - S + 1).astype(np.int64)
    cw = np.concatenate([[0], np.cumsum(w)])
    wsum = cw[count:] - cw[:-count]
    gaps = (e_out - s_out + 1) - wsum
    return s_out.copy(), e_out.copy(), gaps


def _extend(fam, before_n, after_n):
    """``ExtendedIntervalIterator.java:44-76``: widen to
    [max(0, s−before), e+after]; gaps delegate to the inner intervals."""
    s, e, g = fam
    if len(s) == 0:
        return fam
    return np.maximum(s - before_n, 0), e + after_n, g


def _offset(fam, before_flag):
    """``OffsetIntervalsSource.java:51-97``: the zero-width point
    max(0, s−1) (PRECEDING) or e+1 (FOLLOWING) of each sub interval."""
    s, e, _ = fam
    if len(s) == 0:
        return fam
    p = np.maximum(s - 1, 0) if before_flag else e + 1
    return p, p.copy(), np.zeros(len(p), dtype=np.int64)


def _overlapping(src, ref):
    """``OverlappingIntervalsSource.java:36-62``: keep source intervals a
    for which the first reference interval with end ≥ a.start has
    start ≤ a.end (streaming filter over sorted minimal families)."""
    ss, se, sg = src
    rs, re, _ = ref
    if len(ss) == 0 or len(rs) == 0:
        return _EMPTY3
    j = np.searchsorted(re, ss, side="left")
    jj = np.minimum(j, len(rs) - 1)
    ok = (j < len(rs)) & (rs[jj] <= se)
    return ss[ok], se[ok], sg[ok]


def eval_intervals(node: IntervalSource, posmap: dict, paymap: dict | None = None):
    """Evaluate the source tree for one doc.  ``posmap`` maps term -> sorted
    int64 position array; returns (starts, ends, gaps) in emission order.
    ``paymap`` (term -> float32 payload array aligned with the positions)
    is needed only when the tree has :class:`IPayloadFilteredTerm` leaves."""
    if isinstance(node, ITerm):
        p = posmap.get(node.term)
        if p is None or len(p) == 0:
            return _EMPTY3
        p = np.asarray(p, dtype=np.int64)
        return p, p, np.zeros(len(p), dtype=np.int64)
    if isinstance(node, IPayloadFilteredTerm):
        p = posmap.get(node.term)
        if p is None or len(p) == 0:
            return _EMPTY3
        if paymap is None or node.term not in paymap:
            raise ValueError(
                "payload-filtered intervals need a payload-indexed"
                " positional table (analyzer payload_fn)"
            )
        p = np.asarray(p, dtype=np.int64)
        w = np.asarray(paymap[node.term], dtype=np.float32)
        v = np.float32(node.value)
        if node.op == "<":
            m = w < v
        elif node.op == "<=":
            m = w <= v
        elif node.op == ">":
            m = w > v
        elif node.op == ">=":
            m = w >= v
        else:
            m = w == v
        p = p[m]
        return p, p, np.zeros(len(p), dtype=np.int64)
    if isinstance(node, IOrdered):
        return _minimal_ordered([eval_intervals(s, posmap, paymap) for s in node.subs])
    if isinstance(node, IUnordered):
        return _minimal_unordered(
            [eval_intervals(s, posmap, paymap) for s in node.subs]
        )
    if isinstance(node, IOr):
        return _minimal_or([eval_intervals(s, posmap, paymap) for s in node.subs])
    if isinstance(node, IMaxWidth):
        s, e, g = eval_intervals(node.sub, posmap, paymap)
        m = (e - s + 1) <= node.width
        return s[m], e[m], g[m]
    if isinstance(node, IMaxGaps):
        # gap-sensitive pull-up happens in normalize() (Disjunctions.pullUp
        # — including disjunctions NESTED under ordered/unordered subs);
        # here the filter is a plain gap cut
        s, e, g = eval_intervals(node.sub, posmap, paymap)
        m = g <= node.gaps
        return s[m], e[m], g[m]
    if isinstance(node, IBlock):
        return _block([eval_intervals(s, posmap, paymap) for s in node.subs])
    if isinstance(node, IAtLeast):
        return _at_least(
            [eval_intervals(s, posmap, paymap) for s in node.subs], node.min_match
        )
    if isinstance(node, IExtend):
        return _extend(eval_intervals(node.sub, posmap, paymap), node.before, node.after)
    if isinstance(node, IOffset):
        return _offset(eval_intervals(node.sub, posmap, paymap), node.before)
    if isinstance(node, IOverlapping):
        return _overlapping(
            eval_intervals(node.source, posmap, paymap),
            eval_intervals(node.reference, posmap, paymap),
        )
    if isinstance(node, IRepeat):
        return _repeat(eval_intervals(node.sub, posmap, paymap), node.count)
    if isinstance(node, INoMatch):
        return _EMPTY3
    if isinstance(node, IContainedBy):
        return _contained_by(
            eval_intervals(node.small, posmap, paymap),
            eval_intervals(node.big, posmap, paymap),
        )
    if isinstance(node, INotContainedBy):
        return _not_contained_by(
            eval_intervals(node.small, posmap, paymap),
            eval_intervals(node.big, posmap, paymap),
        )
    if isinstance(node, IContaining):
        return _containing(
            eval_intervals(node.big, posmap, paymap),
            eval_intervals(node.small, posmap, paymap),
        )
    if isinstance(node, INonOverlapping):
        return _non_overlapping(
            eval_intervals(node.minuend, posmap, paymap),
            eval_intervals(node.subtrahend, posmap, paymap),
            node.pre,
            node.post,
        )
    if isinstance(node, IFirst):
        s, e, g = eval_intervals(node.sub, posmap, paymap)
        m = e < node.n  # exclusive end ≤ n
        return s[m], e[m], g[m]
    if isinstance(node, IPositionRange):
        s, e, g = eval_intervals(node.sub, posmap, paymap)
        m = (s >= node.start) & (e < node.end)
        return s[m], e[m], g[m]
    if isinstance(node, INotContaining):
        return _not_containing(
            eval_intervals(node.minuend, posmap, paymap),
            eval_intervals(node.subtrahend, posmap, paymap),
        )
    raise TypeError(f"unknown interval source {node!r}")


def _empty_interval_topk(idx: IndexTables) -> DataFrame:
    spark = idx.postings.sparkSession
    return spark.createDataFrame([], "doc_id long, score float, rank int")


def batch_near_freqs(
    pa_col, pb_col, ordered: bool, max_width: int | None
) -> np.ndarray:
    """Vectorized-across-docs 2-term NEAR scorer frequencies (float32),
    bit-identical to the per-doc ``ordered/unordered_interval_lengths`` +
    ``interval_freq`` pipeline.

    One Arrow batch of per-doc position arrays becomes ONE flat int64
    workspace: each doc's positions shift by ``doc_index · 2⁴⁰`` so a
    single global ``searchsorted`` (ordered) or merge-argsort (unordered)
    replaces the per-doc Python loop — the ``block_uppers`` trick applied
    to proximity.  The float32 accumulation folds in emission order via a
    per-rank sweep (``freq = f32(f64(freq) + 1/max(len−1, 1))``, Java
    compound-assignment semantics), so scores stay bit-equal to
    :func:`interval_freq`.
    """
    n = len(pa_col)
    out = np.zeros(n, dtype=np.float32)
    if n == 0:
        return out
    pa_lists = [np.asarray(v, dtype=np.int64) for v in pa_col]
    pb_lists = [np.asarray(v, dtype=np.int64) for v in pb_col]
    ca = np.array([len(v) for v in pa_lists], dtype=np.int64)
    cb = np.array([len(v) for v in pb_lists], dtype=np.int64)
    if not ca.sum() or not cb.sum():
        return out
    OFF = np.int64(1) << 40  # beyond any real position; doc separator
    doc_a = np.repeat(np.arange(n, dtype=np.int64), ca)
    doc_b = np.repeat(np.arange(n, dtype=np.int64), cb)
    pa = np.concatenate(pa_lists) + doc_a * OFF
    pb = np.concatenate(pb_lists) + doc_b * OFF

    if ordered:
        j = np.searchsorted(pb, pa, side="right")
        ok = j < len(pb)
        jj = np.minimum(j, len(pb) - 1)
        ok &= doc_b[jj] == doc_a  # the next B must be in the same doc
        s = pa[ok]
        e = pb[jj[ok]]
        docs = doc_a[ok]
        if len(e) == 0:
            return out
        # minimality: last (largest) start per distinct end — runs cannot
        # span docs because of the OFF separation
        keep = np.concatenate([e[1:] != e[:-1], [True]])
        s, e, docs = s[keep], e[keep], docs[keep]
    else:
        pos = np.concatenate([pa, pb])
        lab = np.concatenate(
            [np.zeros(len(pa), np.int8), np.ones(len(pb), np.int8)]
        )
        dall = np.concatenate([doc_a, doc_b])
        order = np.argsort(pos, kind="stable")
        pos, lab, dall = pos[order], lab[order], dall[order]
        adj = (lab[1:] != lab[:-1]) & (dall[1:] == dall[:-1])
        s, e, docs = pos[:-1][adj], pos[1:][adj], dall[:-1][adj]

    lengths = e - s + 1  # offsets cancel within a doc
    if max_width is not None:
        m = lengths <= max_width
        lengths, docs = lengths[m], docs[m]
    if len(lengths) == 0:
        return out
    # emission order within each doc is position-ascending == array order;
    # fold rank-by-rank: the r-th interval of every doc adds in one
    # vectorized float32 step (exact Java compound-assignment semantics)
    terms = 1.0 / np.maximum(lengths - 1, 1).astype(np.float64)
    counts = np.bincount(docs, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(terms), dtype=np.int64) - starts[docs]
    order = np.argsort(rank, kind="stable")
    terms_o, docs_o, rank_o = terms[order], docs[order], rank[order]
    bounds = np.searchsorted(rank_o, np.arange(int(rank_o[-1]) + 2))
    for r in range(len(bounds) - 1):
        lo, hi = bounds[r], bounds[r + 1]
        if lo == hi:
            continue
        d = docs_o[lo:hi]
        out[d] = (out[d].astype(np.float64) + terms_o[lo:hi]).astype(np.float32)
    return out


def batch_ordered_freqs(cols: list, max_width: int | None) -> np.ndarray:
    """Vectorized-across-docs n-ary ordered scorer frequencies (float32),
    bit-identical to the per-doc ``_minimal_ordered`` + ``interval_freq``
    pipeline for an all-single-term ordered chain (minExtent = n terms).

    The :func:`batch_near_freqs` trick generalized: every doc's per-term
    position arrays shift by ``doc_index · 2⁴⁰`` into ONE global int64
    workspace per term; the greedy chain is then n−1 global
    ``searchsorted`` passes with a same-doc validity check per level,
    minimality is the global last-of-each-distinct-end cut (ends are
    non-decreasing within a doc's anchor run and doc offsets separate
    runs), and the float32 fold sweeps rank-by-rank in emission order.
    """
    k = len(cols)
    n = len(cols[0])
    out = np.zeros(n, dtype=np.float32)
    if n == 0:
        return out
    OFF = np.int64(1) << 40
    docs_of = []
    glob = []
    for c in cols:
        lists = [np.asarray(v, dtype=np.int64) for v in c]
        cnt = np.array([len(v) for v in lists], dtype=np.int64)
        if not cnt.sum():
            return out
        d = np.repeat(np.arange(n, dtype=np.int64), cnt)
        docs_of.append(d)
        glob.append(np.concatenate(lists) + d * OFF)
    S = glob[0]
    E = glob[0].copy()
    docs = docs_of[0]
    valid = np.ones(len(S), dtype=bool)
    for t in range(1, k):
        pt, dt = glob[t], docs_of[t]
        j = np.searchsorted(pt, E, side="right")
        valid &= j < len(pt)
        jj = np.minimum(j, len(pt) - 1)
        valid &= dt[jj] == docs
        E = pt[jj]
    S, E, docs = S[valid], E[valid], docs[valid]
    if len(E) == 0:
        return out
    # minimality: last (max-start) chain per distinct end; E is
    # non-decreasing inside each doc's (sorted) anchor run, and the OFF
    # separation keeps runs from spanning docs
    keep = np.concatenate([E[1:] != E[:-1], [True]])
    S, E, docs = S[keep], E[keep], docs[keep]
    lengths = E - S + 1
    if max_width is not None:
        m = lengths <= max_width
        lengths, docs = lengths[m], docs[m]
    if len(lengths) == 0:
        return out
    terms = 1.0 / np.maximum(lengths - k + 1, 1).astype(np.float64)
    counts = np.bincount(docs, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(terms), dtype=np.int64) - starts[docs]
    order = np.argsort(rank, kind="stable")
    terms_o, docs_o, rank_o = terms[order], docs[order], rank[order]
    bounds = np.searchsorted(rank_o, np.arange(int(rank_o[-1]) + 2))
    for r in range(len(bounds) - 1):
        lo, hi = bounds[r], bounds[r + 1]
        if lo == hi:
            continue
        d = docs_o[lo:hi]
        out[d] = (out[d].astype(np.float64) + terms_o[lo:hi]).astype(np.float32)
    return out


def payload_terms(node: IntervalSource) -> set:
    """Terms whose PAYLOAD arrays the evaluator needs (the
    :class:`IPayloadFilteredTerm` leaves) — drives the optional ``_paymap``
    aggregation in :func:`interval_topk`."""
    if isinstance(node, IPayloadFilteredTerm):
        return {node.term}
    out = set()
    for child in _children(node):
        out |= payload_terms(child)
    return out


def _nary_ordered_shape(source: IntervalSource):
    """Detect the vectorizable n-ary (≥ 3) ordered chain of single terms
    under an optional width/gaps filter.  Returns (terms, max_width) or
    None.  For all-single-term chains ``gaps = width − n``, so
    ``maxgaps(g) ⇔ maxwidth(g + n)``."""
    mw = None
    node = source
    if isinstance(node, (IMaxWidth, IMaxGaps)):
        inner = node.sub
        if not isinstance(inner, IOrdered):
            return None
        if isinstance(node, IMaxWidth):
            mw = node.width
        else:
            mw = node.gaps + len(inner.subs)
        node = inner
    if not isinstance(node, IOrdered) or len(node.subs) < 3:
        return None
    if not all(type(s) is ITerm for s in node.subs):
        return None
    return [s.term for s in node.subs], mw


def _near2_shape(source: IntervalSource):
    """Detect the vectorizable 2-term NEAR shapes: (max)width/gaps filters
    over an ordered/unordered pair of DISTINCT single terms.  Returns
    (term_a, term_b, ordered, max_width) or None.  Pair slop identity:
    ``maxgaps(g, pair) ⇔ maxwidth(g + 2, pair)`` (width − 2 internal
    gaps for two single-position sub-sources)."""
    mw = None
    node = source
    if isinstance(node, IMaxWidth):
        mw, node = node.width, node.sub
    elif isinstance(node, IMaxGaps):
        mw, node = node.gaps + 2, node.sub
    if not isinstance(node, (IOrdered, IUnordered)) or len(node.subs) != 2:
        return None
    a, b = node.subs
    if not (isinstance(a, ITerm) and isinstance(b, ITerm)) or a == b:
        return None
    return a.term, b.term, isinstance(node, IOrdered), mw


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """(doc_id, score) → top-k with TopDocs tie-breaking + dense rank."""
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return topk.withColumn("rank", w.cast("int"))


def interval_scores(
    idx: IndexTables,
    source: IntervalSource,
    field: str = "text",
    pivot: float = 1.0,
    boost: float = 1.0,
) -> DataFrame:
    """All matching docs' saturation scores (doc_id, score float > 0) for
    ``IntervalQuery(field, source)`` — the Weight/Scorer form, used both by
    :func:`interval_topk` and when an interval/span query rides as a clause
    inside a Boolean tree (the complexPhrase parser's rewrite target).

    Plan shape (designed for the 100-TB corpus): the positions scan is
    pruned to the query's leaf terms (predicate pushdown on ``term``), one
    doc_id shuffle groups the per-term position arrays (postings-sized, never
    corpus-sized), candidate docs are prefiltered to those containing every
    *required* term inside the same aggregation (no extra join), and the
    saturation score (``IntervalScorer.java:59-68``,
    ``IntervalScoreFunction.java:66-74``) is computed by one Arrow-batched
    pandas UDF.
    """
    if idx.positions is None:
        raise ValueError("interval queries need a positional index")
    source = normalize(resolve_multiterms(source, idx, field))
    if isinstance(source, INoMatch):
        spark = idx.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score float")
    near2 = _near2_shape(source)
    if near2 is not None:
        # vectorized-across-docs fast path for the workhorse 2-term NEAR
        # (bit-identical scores; see batch_near_freqs)
        ta, tb, is_ordered, mw = near2
        return interval_near_scores(
            idx, ta, tb, max_width=mw, ordered=is_ordered,
            field=field, pivot=pivot, boost=boost,
        )
    leafs = sorted(leaf_terms(source))
    required = required_terms(source)
    payterms = payload_terms(source)
    pos = idx.positions_for_terms(field, leafs)
    if payterms and "payloads" not in pos.columns:
        raise ValueError(
            "payload-filtered intervals need a payload-indexed positional"
            " table (build the index with an analyzer payload_fn)"
        )
    aggs = [
        F.map_from_entries(
            F.collect_list(F.struct("term", "positions"))
        ).alias("_posmap")
    ]
    if payterms:
        # payload arrays ship only for the payload-filtered leaves — the
        # plain leaves' (larger) payload arrays are pruned out of the shuffle
        aggs.append(
            F.map_from_entries(
                F.collect_list(
                    F.when(
                        F.col("term").isin(sorted(payterms)),
                        F.struct("term", "payloads"),
                    )
                )
            ).alias("_paymap")
        )
    if required:
        aggs.append(
            F.sum(
                F.when(F.col("term").isin(sorted(required)), 1).otherwise(0)
            ).alias("_nreq")
        )
    grouped = pos.groupBy("doc_id").agg(*aggs)
    if required:
        grouped = grouped.filter(F.col("_nreq") >= len(required))

    mext = min_extent(source)
    p32 = np.float32(pivot)
    b32 = np.float32(boost)

    @F.pandas_udf(T.FloatType())
    def sat_score(maps: pd.Series) -> pd.Series:
        out = np.zeros(len(maps), dtype=np.float32)
        for r in range(len(maps)):
            pm = {
                t: np.asarray(v, dtype=np.int64)
                for t, v in maps.iloc[r].items()
            }
            s, e, _ = eval_intervals(source, pm)
            fr = interval_freq(e - s + 1, min_extent=mext)
            if fr > 0:
                out[r] = b32 * (np.float32(1.0) - p32 / (p32 + fr))
        return pd.Series(out, dtype="float32")

    @F.pandas_udf(T.FloatType())
    def sat_score_pay(maps: pd.Series, pays: pd.Series) -> pd.Series:
        out = np.zeros(len(maps), dtype=np.float32)
        for r in range(len(maps)):
            pm = {
                t: np.asarray(v, dtype=np.int64)
                for t, v in maps.iloc[r].items()
            }
            wm = {
                t: np.asarray(v, dtype=np.float32)
                for t, v in pays.iloc[r].items()
                if v is not None
            }
            s, e, _ = eval_intervals(source, pm, wm)
            fr = interval_freq(e - s + 1, min_extent=mext)
            if fr > 0:
                out[r] = b32 * (np.float32(1.0) - p32 / (p32 + fr))
        return pd.Series(out, dtype="float32")

    naryo = _nary_ordered_shape(source)
    nary_terms, nary_mw = naryo if naryo is not None else (None, None)

    @F.pandas_udf(T.FloatType())
    def sat_score_nary(maps: pd.Series) -> pd.Series:
        # r5: all-single-term ordered chains evaluate ALL the batch's docs
        # through ONE numpy kernel (the batch_near_freqs trick, n-ary) —
        # same grouped single-shuffle plan, no per-doc Python loop.  The
        # required-terms prefilter guarantees every map has every term.
        cols = [
            [maps.iloc[r][t] for r in range(len(maps))] for t in nary_terms
        ]
        fr = batch_ordered_freqs(cols, nary_mw)
        out = np.where(
            fr > 0,
            (b32 * (np.float32(1.0) - p32 / (p32 + fr))).astype(np.float32),
            np.float32(0.0),
        ).astype(np.float32)
        return pd.Series(out, dtype="float32")

    if payterms:
        scorer = sat_score_pay(F.col("_posmap"), F.col("_paymap"))
    elif naryo is not None:
        scorer = sat_score_nary(F.col("_posmap"))
    else:
        scorer = sat_score(F.col("_posmap"))
    return (
        grouped.withColumn("score", scorer)
        .filter(F.col("score") > 0)
        .select("doc_id", "score")
    )


def interval_topk(
    idx: IndexTables,
    source: IntervalSource,
    k: int = 10,
    field: str = "text",
    pivot: float = 1.0,
    boost: float = 1.0,
) -> DataFrame:
    """Top-k docs for ``IntervalQuery(field, source)`` — the general algebra
    entry point: :func:`interval_scores` + a distributed
    TakeOrderedAndProject collector (TopDocs tie-breaking)."""
    return _rank_topk(
        interval_scores(idx, source, field=field, pivot=pivot, boost=boost), k
    )


# ---------------------------------------------------------------------------
# Block-max WAND for interval queries (round-4 stretch): the saturation
# score is monotone in interval freq, and interval freq is bounded by pure
# counting algebra over term frequencies — so the SAME windowed block-max
# machinery that prunes Boolean queries prunes proximity queries.
# ---------------------------------------------------------------------------


def freq_count_bound(node: IntervalSource, tfmap: dict) -> np.ndarray:
    """Per-doc upper bound on the number of emitted minimal intervals, from
    term frequencies alone (vectorized over aligned doc arrays).

    Soundness, per combinator: a term family has exactly tf intervals;
    ordered keeps ≤ the min of its sub-family sizes (one chain per
    first-family interval, ≤ one survivor per distinct last-family end);
    unordered and or emit ≤ the sum (every emission advances at least one
    sub-interval); filters and notContaining only drop; containedBy keeps
    ≤ its small family.  Each interval contributes ≤ 1 to the scorer's freq
    (``1/max(len - minExtent + 1, 1)``), so freq ≤ this count.
    """
    if isinstance(node, (ITerm, IPayloadFilteredTerm)):
        # payload filtering only DROPS positions: tf stays a sound bound
        v = tfmap.get(node.term)
        if v is None:
            raise KeyError(node.term)
        return v
    if isinstance(node, (IOrdered, IBlock)):
        return np.minimum.reduce(
            [freq_count_bound(s, tfmap) for s in node.subs]
        )
    if isinstance(node, (IUnordered, IOr, IAtLeast)):
        out = np.asarray(freq_count_bound(node.subs[0], tfmap)).copy()
        for s in node.subs[1:]:
            out = out + freq_count_bound(s, tfmap)
        return out
    if isinstance(node, (IMaxWidth, IMaxGaps, IExtend, IOffset, IFirst, IPositionRange)):
        return freq_count_bound(node.sub, tfmap)
    if isinstance(node, IRepeat):
        # windows of `count` consecutive sub intervals: ≤ sub-family size
        return freq_count_bound(node.sub, tfmap)
    if isinstance(node, IOverlapping):
        return freq_count_bound(node.source, tfmap)
    if isinstance(node, (IContainedBy, INotContainedBy)):
        # one big interval can contain MANY smalls: only the small family
        # size bounds the output (the fuzz test caught min(small, big))
        return freq_count_bound(node.small, tfmap)
    if isinstance(node, IContaining):
        return freq_count_bound(node.big, tfmap)
    if isinstance(node, (INotContaining, INonOverlapping)):
        return freq_count_bound(node.minuend, tfmap)
    raise TypeError(f"unknown interval source {node!r}")


def _sat_upper(
    counts: np.ndarray, pivot: float, boost: float
) -> np.ndarray:
    """Float32 upper bound on the saturation score of any doc whose interval
    count is ≤ ``counts``.

    The real score is ``f32(b * f32(1 - f32(p / f32(p + fr))))`` with ``fr``
    a float32 accumulation of ≤ count terms each ≤ 1.  Accumulation round-up
    is ≤ count²·2⁻²⁴ absolute (standard recursive-summation bound with sum
    and term-count both ≤ count), covered by the inflation below; the four
    float32 ops after it contribute ≤ 2 ulp, covered by three nextafter
    bumps on top of the down-cast.  Monotonicity of the saturation function
    does the rest.
    """
    c = counts.astype(np.float64)
    c = c * (1.0 + c * 1.2e-7) + 1e-6
    s64 = float(boost) * (1.0 - float(pivot) / (float(pivot) + c))
    f = s64.astype(np.float32)
    for _ in range(3):
        f = np.nextafter(f, np.float32(np.inf))
    return f


def segment_interval_topk(
    bl_pdf: pd.DataFrame,
    pos_pdf: pd.DataFrame,
    source: IntervalSource,
    leafs: list[str],
    k: int,
    pivot: float,
    boost: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-segment top-k for an interval query via windowed block-max
    pruning: windows are bounded by the counting algebra over block-max term
    freqs, candidate docs by their real per-doc freqs, and only survivors
    pay the positional evaluation (``eval_intervals``)."""
    from lucene_spark.index.codec import decode_block

    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.float32))
    by_term = {t: g.sort_values("block_id") for t, g in bl_pdf.groupby("term")}
    if any(t not in by_term for t in leafs):
        return empty  # every leaf is required: conjunction dead here

    # positions lookup: term -> (sorted doc ids, aligned position arrays)
    posidx: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t, g in pos_pdf.groupby("term"):
        d = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(d)
        posidx[t] = (d[order], g["positions"].to_numpy()[order])

    groups = [by_term[t] for t in leafs]
    firsts = [g["first_doc"].to_numpy(dtype=np.int64) for g in groups]
    lasts = [g["last_doc"].to_numpy(dtype=np.int64) for g in groups]
    bounds = np.unique(np.concatenate(firsts + [a + 1 for a in lasts]))
    w_start = bounds[:-1]
    n_win = len(w_start)
    if n_win == 0:
        return empty

    blk_of = np.full((len(leafs), n_win), -1, dtype=np.int64)
    for ti in range(len(leafs)):
        idx = np.searchsorted(firsts[ti], w_start, side="right") - 1
        ok = (idx >= 0) & (w_start <= lasts[ti][np.clip(idx, 0, None)])
        blk_of[ti, ok] = idx[ok]
    live = (blk_of >= 0).all(axis=0)
    if not live.any():
        return empty

    # window count bounds from per-block max tf (the impacts frontier)
    tfmap_win = {}
    for ti, t in enumerate(leafs):
        bmax = np.fromiter(
            (max(p["freq"] for p in imp) for imp in groups[ti]["impacts"]),
            dtype=np.int64,
            count=len(groups[ti]),
        )
        tf = np.zeros(n_win, dtype=np.int64)
        cov = blk_of[ti] >= 0
        tf[cov] = bmax[blk_of[ti, cov]]
        tfmap_win[t] = tf
    w_bound = _sat_upper(freq_count_bound(source, tfmap_win), pivot, boost)
    w_bound[~live] = -np.inf

    order = np.argsort(-w_bound[live], kind="stable")
    w_ids = np.flatnonzero(live)[order]

    mext = min_extent(source)
    p32 = np.float32(pivot)
    b32 = np.float32(boost)
    top_s = np.array([], dtype=np.float32)
    top_d = np.array([], dtype=np.int64)
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _block(ti: int, bi: int):
        key = (ti, bi)
        if key not in decoded:
            row = groups[ti].iloc[bi]
            d, f = decode_block(
                int(row["first_doc"]), int(row["num_docs"]),
                row["doc_blob"], row["freq_blob"],
            )
            decoded[key] = (d, f.astype(np.int64))
        return decoded[key]

    for wi in w_ids:
        theta = _theta_f32(top_s, k)
        if w_bound[wi] < theta:  # strict: ties still checked
            break
        lo, hi = int(w_start[wi]), int(bounds[wi + 1] - 1)
        # conjunction over every leaf term, carrying per-doc tf
        base_d = None
        tf_doc: dict[str, np.ndarray] = {}
        for ti, t in enumerate(leafs):
            d, f = _block(ti, int(blk_of[ti, wi]))
            sel = (d >= lo) & (d <= hi)
            d, f = d[sel], f[sel]
            if base_d is None:
                base_d, tf_doc[t] = d, f
            else:
                idx = np.searchsorted(d, base_d)
                idx_c = np.clip(idx, 0, max(len(d) - 1, 0))
                ok = (
                    (idx < len(d)) & (d[idx_c] == base_d)
                    if len(d)
                    else np.zeros(len(base_d), dtype=bool)
                )
                base_d = base_d[ok]
                for tt in tf_doc:
                    tf_doc[tt] = tf_doc[tt][ok]
                tf_doc[t] = f[idx_c[ok]] if len(d) else f[:0]
            if len(base_d) == 0:
                break
        if base_d is None or len(base_d) == 0:
            continue
        ub = _sat_upper(freq_count_bound(source, tf_doc), pivot, boost)
        cand = ub >= theta
        if not cand.any():
            continue
        # positional verification — the flat path's exact float32 arithmetic
        ver_d, ver_s = [], []
        for doc in base_d[cand]:
            pm = {}
            for t in leafs:
                dd, pp = posidx[t]
                j = np.searchsorted(dd, doc)
                pm[t] = (
                    np.asarray(pp[j], dtype=np.int64)
                    if j < len(dd) and dd[j] == doc
                    else np.array([], dtype=np.int64)
                )
            s, e, _ = eval_intervals(source, pm)
            fr = interval_freq(e - s + 1, min_extent=mext)
            if fr > 0:
                ver_d.append(int(doc))
                ver_s.append(b32 * (np.float32(1.0) - p32 / (p32 + fr)))
        if ver_d:
            new_d = np.asarray(ver_d, dtype=np.int64)
            new_s = np.asarray(ver_s, dtype=np.float32)
            s_all = np.concatenate([top_s, new_s])
            d_all = np.concatenate([top_d, new_d])
            if len(s_all) > k:
                keep = np.lexsort((d_all, -s_all.astype(np.float64)))[:k]
                s_all, d_all = s_all[keep], d_all[keep]
            top_s, top_d = s_all, d_all

    return top_d, top_s


def _theta_f32(scores: np.ndarray, k: int) -> float:
    return float(scores.min()) if len(scores) >= k else -np.inf


def interval_topk_wand(
    idx: IndexTables,
    source: IntervalSource,
    k: int = 10,
    field: str = "text",
    pivot: float = 1.0,
    boost: float = 1.0,
) -> DataFrame:
    """Top-k for ``IntervalQuery(field, source)`` through the block-max
    kernel — bit-identical to :func:`interval_topk`, with window pruning.

    Plan: the blocks scan AND the positions scan are both pruned to the
    query's leaf terms (bucket/partition-pruned on disk); one cogrouped
    ``applyInPandas`` per segment runs windowed block-max pruning
    (impact-frontier count bounds → saturation-score bounds), decodes only
    surviving windows' blocks, and evaluates the interval algebra only for
    docs whose per-doc bound beats the running θ; TopDocs-merge reduces the
    per-segment heaps.  Requires every leaf term to be required
    (``required_terms == leaf_terms``) so the window conjunction is sound —
    sources with non-conjunctive branches (``or`` of disjoint branches,
    ``notContaining`` subtrahends) take :func:`interval_topk` instead.

    Measured regime (BENCH.md §1e): the positions shuffle dominates both
    paths and block-max cannot reduce it, so the pruning saves only the
    per-doc ``eval_intervals`` work — for a cheap 2-term NEAR the flat
    plan is ~20% faster even at 51M postings; this path earns its keep on
    deep nested algebra where per-candidate evaluation is the cost.
    """
    if idx.positions is None or idx.blocks is None:
        raise ValueError("interval WAND needs blocks + positional index")
    source = normalize(resolve_multiterms(source, idx, field))
    if isinstance(source, INoMatch):
        return _empty_interval_topk(idx)
    if payload_terms(source):
        # the kernel cogroup ships (term, doc, positions) only; payload
        # arrays ride the flat path's _paymap aggregation instead
        return interval_topk(
            idx, source, k=k, field=field, pivot=pivot, boost=boost
        )
    leafs = sorted(leaf_terms(source))
    if not leafs or required_terms(source) != set(leafs):
        raise ValueError(
            "kernel path needs every leaf term required "
            "(required_terms == leaf_terms); use interval_topk"
        )
    bl = idx.blocks_for_terms(field, leafs).select(
        "segment", "term", "block_id", "first_doc", "last_doc", "num_docs",
        "doc_blob", "freq_blob", "impacts",
    )
    ps = idx.positions_for_terms(field, leafs).select(
        "segment", "term", "doc_id", "positions"
    )

    out_schema = "doc_id long, score float"

    def run(bl_pdf: pd.DataFrame, pos_pdf: pd.DataFrame) -> pd.DataFrame:
        d, s = segment_interval_topk(
            bl_pdf, pos_pdf, source, leafs, k, pivot, boost
        )
        return pd.DataFrame({"doc_id": d, "score": s.astype(np.float32)})

    per_seg = (
        bl.groupBy("segment")
        .cogroup(ps.groupBy("segment"))
        .applyInPandas(lambda _k, l, r: run(l, r), schema=out_schema)
    )
    topk = per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return topk.withColumn("rank", w.cast("int"))


def interval_near_scores(
    idx: IndexTables,
    term_a: str,
    term_b: str,
    max_width: int | None = None,
    ordered: bool = True,
    field: str = "text",
    pivot: float = 1.0,
    boost: float = 1.0,
) -> DataFrame:
    """All matching docs' scores (doc_id, score float > 0) for the 2-term
    NEAR fast path — the Scorer form; :func:`interval_near_topk` adds the
    top-k collector."""
    if idx.positions is None:
        raise ValueError("interval queries need a positional index")
    pos = idx.positions_for_terms(field, [term_a, term_b])
    pa = pos.filter(F.col("term") == term_a).select(
        "doc_id", F.col("positions").alias("_pa")
    )
    pb = pos.filter(F.col("term") == term_b).select(
        "doc_id", F.col("positions").alias("_pb")
    )
    joined = pa.join(pb, "doc_id")

    mw = max_width
    is_ordered = ordered
    p32 = np.float32(pivot)
    b32 = np.float32(boost)

    @F.pandas_udf(T.FloatType())
    def sat_score(a_col: pd.Series, b_col: pd.Series) -> pd.Series:
        # r5: ONE vectorized kernel per Arrow batch instead of a per-doc
        # Python loop — same minimal intervals, same float32 fold
        fr = batch_near_freqs(a_col, b_col, is_ordered, mw)
        out = np.where(
            fr > 0,
            (b32 * (np.float32(1.0) - p32 / (p32 + fr))).astype(np.float32),
            np.float32(0.0),
        ).astype(np.float32)
        return pd.Series(out, dtype="float32")

    return (
        joined.withColumn("score", sat_score(F.col("_pa"), F.col("_pb")))
        .filter(F.col("score") > 0)
        .select("doc_id", "score")
    )


def interval_near_topk(
    idx: IndexTables,
    term_a: str,
    term_b: str,
    k: int = 10,
    max_width: int | None = None,
    ordered: bool = True,
    field: str = "text",
    pivot: float = 1.0,
    boost: float = 1.0,
) -> DataFrame:
    """Top-k docs for ``IntervalQuery(maxwidth(w, ordered/unordered(a, b)))``.

    Returns (doc_id, score float, rank int) — saturation-scored interval
    frequency, ties broken by doc_id ascending (TopDocs order).
    """
    scored = interval_near_scores(
        idx, term_a, term_b, max_width=max_width, ordered=ordered,
        field=field, pivot=pivot, boost=boost,
    )
    return _rank_topk(scored, k)
