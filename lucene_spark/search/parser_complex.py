"""ComplexPhrase query parser — phrases with embedded wildcards / fuzzies /
ranges / OR-groups / negations.

Re-expression of the reference's
``queryparser/complexPhrase/ComplexPhraseQueryParser.java``: the classic
grammar, except quoted phrase contents get a SECOND parse with the full
classic syntax, and the resulting Boolean tree is rewritten into span
queries — e.g. ``"(john jon) smith*"~2`` matches *john* or *jon* followed
within 2 gaps by any *smith*-prefixed term.

Faithful rewrite rules (``ComplexPhraseQuery.rewrite:258-361``):

* single-clause contents (one term / multi-term / synonym) stay a PLAIN
  query — no span wrapping (``rewrite:261-265``),
* each top-level Boolean clause is one ``SpanNearQuery`` slot
  (``slop``, ``inOrder=True`` by default — ``setInOrder``),
* a term clause → ``SpanTermQuery``; a multi-term clause (wildcard /
  prefix / fuzzy / range / regexp) → :class:`SpanMultiTermQuery`, the
  deferred equivalent of the reference's rewrite-to-Boolean + SpanOr
  (an expansion with no matching terms makes the phrase match NOTHING —
  the reference inserts an unfindable dummy term for this,
  ``rewrite:303-316``; here the empty expansion is a no-match source),
* a group ``(a b -c)`` → ``SpanOr`` of the positives, wrapped in
  ``SpanNot`` against the ``SpanOr`` of the negatives
  (``addComplexPhraseClause:372-421``, nested groups flatten),
* top-level ``MUST_NOT`` clauses use the quirky include/exclude scheme
  (``rewrite:332-361``): include = SpanNear of the positives with the
  slop budget widened by the number of negatives; exclude = SpanNear of
  ALL clauses (negatives in place) at the original slop; result =
  ``SpanNot(include, exclude)``,
* every clause must target the phrase's field
  (``checkPhraseClauseIsForSameField``) — a mismatch raises.

Scoring envelope: span queries score by interval saturation (see
``spans.py``), and a rewritten complex phrase rides as a Boolean clause
through ``IndexSearcher._score`` like any other clause.
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.search.parser import ParseError, _Parser
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_spark.search.spans import (
    SpanMultiTermQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

__all__ = ["parse_complex", "complex_phrase_to_query", "NO_MATCH_SPAN"]

# The reference prevents a partial match when a sub-clause expands to
# nothing by inserting a term that cannot exist in any index
# (``rewrite:306-308``); "\x00" can never survive tokenization here, so
# this span matches no document.
NO_MATCH_SPAN = SpanTermQuery("\x00complex-phrase-no-match\x00")

_MULTITERM = (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery, TermRangeQuery)


def _unwrap_boost(q: Query) -> Query:
    while isinstance(q, BoostQuery):
        q = q.query
    return q


def _check_field(q: Query, field: str) -> None:
    got = getattr(q, "field", field)
    if got != field:
        raise ParseError(
            f'cannot have clause for field "{got}" nested in phrase for'
            f' field "{field}"'
        )


def _to_span_multiterm(q: Query) -> SpanMultiTermQuery:
    if isinstance(q, PrefixQuery):
        return SpanMultiTermQuery(kind="prefix", pattern=q.prefix)
    if isinstance(q, WildcardQuery):
        return SpanMultiTermQuery(kind="wildcard", pattern=q.pattern)
    if isinstance(q, RegexpQuery):
        return SpanMultiTermQuery(kind="regexp", pattern=q.pattern)
    if isinstance(q, FuzzyQuery):
        return SpanMultiTermQuery(
            kind="fuzzy",
            pattern=q.term,
            max_edits=q.max_edits,
            transpositions=q.transpositions,
        )
    return SpanMultiTermQuery(
        kind="range",
        lower=q.lower,
        upper=q.upper,
        include_lower=q.include_lower,
        include_upper=q.include_upper,
    )


def _add_complex_phrase_clause(
    span_clauses: list, bq: BooleanQuery, field: str
) -> None:
    """``addComplexPhraseClause:372-421``: one group becomes ONE span
    element — the SpanOr of its positive members, wrapped in SpanNot when
    the group carries negatives; a nested group composes into its parent's
    chosen list as a single element (NOT flattened across levels)."""
    ors: list = []
    nots: list = []
    for clause in bq.clauses:
        child = _unwrap_boost(clause.query)
        chosen = nots if clause.occur == Occur.MUST_NOT else ors
        if isinstance(child, TermQuery):
            _check_field(child, field)
            chosen.append(SpanTermQuery(child.term))
        elif isinstance(child, SynonymQuery):
            _check_field(child, field)
            chosen.extend(SpanTermQuery(t) for t in child.terms)
        elif isinstance(child, _MULTITERM):
            _check_field(child, field)
            chosen.append(_to_span_multiterm(child))
        elif isinstance(child, BooleanQuery):
            _add_complex_phrase_clause(chosen, child, field)
        elif isinstance(child, MatchNoDocsQuery):
            chosen.append(NO_MATCH_SPAN)
        else:
            raise ParseError(
                f"unknown query type in phrase group: {type(child).__name__}"
            )
    if not ors:
        return
    soq: SpanQuery = SpanOrQuery(tuple(ors))
    if nots:
        span_clauses.append(SpanNotQuery(soq, SpanOrQuery(tuple(nots))))
    else:
        span_clauses.append(soq)


def _clause_to_span(q: Query, field: str) -> SpanQuery:
    q = _unwrap_boost(q)
    if isinstance(q, TermQuery):
        _check_field(q, field)
        return SpanTermQuery(q.term)
    if isinstance(q, SynonymQuery):
        _check_field(q, field)
        return SpanOrQuery(tuple(SpanTermQuery(t) for t in q.terms))
    if isinstance(q, _MULTITERM):
        _check_field(q, field)
        return _to_span_multiterm(q)
    if isinstance(q, MatchNoDocsQuery):
        return NO_MATCH_SPAN
    if isinstance(q, BooleanQuery):
        sc: list = []
        _add_complex_phrase_clause(sc, q, field)
        # the reference takes the first produced element, or the dummy
        # no-match term when the group expanded to nothing (rewrite:300-309)
        return sc[0] if sc else NO_MATCH_SPAN
    raise ParseError(
        f"unknown query type in phrase query string: {type(q).__name__}"
    )


def complex_phrase_to_query(
    contents: str,
    slop: int = 0,
    field: str = "text",
    analyzer: StandardAnalyzer | None = None,
    in_order: bool = True,
) -> Query | SpanQuery | None:
    """``ComplexPhraseQuery.rewrite`` — parse the phrase contents with the
    classic grammar and turn the Boolean tree into spans."""
    from lucene_spark.search.parser import parse

    analyzer = analyzer or StandardAnalyzer()
    inner = parse(contents, analyzer, default_field=field)
    if isinstance(inner, MatchNoDocsQuery):
        return None  # all content analyzed away (stopwords)
    if isinstance(inner, (TermQuery, SynonymQuery) + _MULTITERM):
        _check_field(inner, field)
        return inner  # single clause: plain scoring, no span wrapping
    if isinstance(inner, MatchAllDocsQuery) or not isinstance(inner, BooleanQuery):
        raise ParseError(
            f"unknown query type in phrase query string: {type(inner).__name__}"
        )
    spans = []
    neg = []
    for clause in inner.clauses:
        spans.append(_clause_to_span(clause.query, field))
        neg.append(clause.occur == Occur.MUST_NOT)
    num_neg = sum(neg)
    if num_neg == 0:
        return SpanNearQuery(tuple(spans), slop, in_order)
    positives = tuple(s for s, n in zip(spans, neg) if not n)
    if not positives:
        # all-negative phrase: the reference's SpanNearQuery over zero
        # include clauses is unusable — fail at parse time, not mid-plan
        raise ParseError("complex phrase has no positive clauses")
    include: SpanQuery = (
        positives[0]
        if len(positives) == 1
        # slop budget widened by the gaps the negatives would occupy
        else SpanNearQuery(positives, slop + num_neg, in_order)
    )
    exclude = SpanNearQuery(tuple(spans), slop, in_order)
    return SpanNotQuery(include, exclude)


class _ComplexParser(_Parser):
    """Classic parser whose quoted-phrase production runs the second-pass
    complex rewrite (the two-pass scheme collapsed: the rewrite needs no
    index access, multi-term expansion being deferred to query time)."""

    def __init__(self, text, analyzer, default_field, in_order=True):
        super().__init__(text, analyzer, default_field)
        self.in_order = in_order

    def _phrase_query(self, text: str, slop: int, field: str):
        return complex_phrase_to_query(
            text, slop, field, self.analyzer, self.in_order
        )


def parse_complex(
    text: str,
    analyzer: StandardAnalyzer | None = None,
    default_field: str = "text",
    in_order: bool = True,
) -> Query:
    """Parse a full classic query where quoted phrases use the complex
    grammar.  The result is a standard query tree whose phrase leaves are
    span queries — runnable via ``IndexSearcher.score_all``/``search`` or,
    when the whole query is one phrase, ``span_topk``."""
    analyzer = analyzer or StandardAnalyzer()
    p = _ComplexParser(text, analyzer, default_field, in_order)
    q = p.parse_expr()
    if p.pos != len(p.toks):
        raise ParseError(f"trailing input at token {p.pos}: {p.toks[p.pos:]}")
    return q if q is not None else MatchNoDocsQuery()
