"""XML query parser — the reference's ``queryparser/xml/CoreParser.java``
element set re-expressed over this engine's Query/SpanQuery dataclasses.

Element registry (``CoreParser.java:90-135``), all implemented except the
numeric ``PointRangeQuery`` (this engine delegates numeric ranges to
Catalyst/parquet stats — the element raises with that guidance):

* leaf queries — ``TermQuery`` (RAW text, like ``TermQueryBuilder.java:
  32-41``: the XML author supplies index terms), ``TermsQuery`` (analyzed
  text → SHOULD Booleans + minimumNumberShouldMatch,
  ``TermsQueryBuilder.java:46-63``), ``MatchAllDocsQuery``, ``RangeQuery``
  (→ TermRangeQuery, includeLower/Upper default true),
* composites — ``BooleanQuery`` (``Clause occurs=
  should|must|mustNot|filter`` children + minimumNumberShouldMatch,
  ``BooleanQueryBuilder.java:45-82``), ``DisjunctionMaxQuery``
  (tieBreaker), ``ConstantScoreQuery``, ``UserQuery`` (classic-syntax
  passthrough, ``UserInputQueryBuilder``),
* spans — ``SpanTerm`` (raw text), ``SpanOr``, ``SpanOrTerms`` (analyzed),
  ``SpanNear`` (slop required, inOrder default FALSE per
  ``SpanNearBuilder.java:39-49``), ``SpanFirst`` (end), ``SpanNot``
  (``Include``/``Exclude`` wrapper children), ``SpanPositionRange``
  (start/end),
* ``BoostingTermQuery`` (``BoostingTermBuilder.java:33-42``) →
  :class:`~lucene_spark.search.payloads.PayloadScoreQuery` with the
  average function AND ``include_span_score=True`` — the reference's
  3-arg ``PayloadScoreQuery(SpanTermQuery, AveragePayloadFunction,
  FLOAT_DECODER)`` ctor includes the underlying span score
  (``PayloadScoreQuery.java:80-83``), so the doc score is
  BM25(term) × avg(payload).

``fieldName`` attributes inherit from enclosing elements
(``DOMUtils.getAttributeWithInheritance``); ``boost`` wraps the built
query.  Span elements must target the engine's (single) text field —
a different fieldName raises, the documented envelope.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.search.parser import ParseError
from lucene_spark.search.payloads import PayloadScoreQuery
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    Query,
    TermQuery,
    TermRangeQuery,
)
from lucene_spark.search.spans import (
    SpanBoostQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanQuery,
    SpanTermQuery,
)

__all__ = ["parse_xml"]

_OCCURS = {
    "": Occur.SHOULD,
    "should": Occur.SHOULD,
    "must": Occur.MUST,
    "mustnot": Occur.MUST_NOT,
    "filter": Occur.FILTER,
}


def _text_or_fail(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise ParseError(f"<{e.tag}> requires non-blank text")
    return t


def _field(e: ET.Element, inherited: str | None) -> str:
    f = e.get("fieldName") or inherited
    if not f:
        raise ParseError(f"<{e.tag}> needs a fieldName (own or inherited)")
    return f


def _num(e: ET.Element, attr: str, default: str, conv=int):
    """Numeric attribute with the module's ParseError contract."""
    raw = e.get(attr, default)
    try:
        return conv(raw)
    except ValueError as ex:
        raise ParseError(
            f'<{e.tag}> attribute {attr}={raw!r} is not a number'
        ) from ex


def _boost(e: ET.Element, q):
    b = _num(e, "boost", "1", float)
    if b == 1.0:
        return q
    return SpanBoostQuery(q, b) if isinstance(q, SpanQuery) else BoostQuery(q, b)


def _children(e: ET.Element):
    return list(e)


def _children_or_fail(e: ET.Element):
    kids = list(e)
    if not kids:
        raise ParseError(f"<{e.tag}> needs at least one child query element")
    return kids


class _XmlParser:
    def __init__(self, analyzer: StandardAnalyzer, default_field: str):
        self.analyzer = analyzer
        self.default_field = default_field

    # ------------------------------------------------------------ queries

    def query(self, e: ET.Element, field: str | None):
        tag = e.tag
        if tag == "TermQuery":
            return _boost(e, TermQuery(_text_or_fail(e), _field(e, field)))
        if tag == "TermsQuery":
            f = _field(e, field)
            terms = self.analyzer.analyze(_text_or_fail(e))
            if not terms:
                return MatchNoDocsQuery()
            bq = BooleanQuery(
                tuple(BooleanClause(Occur.SHOULD, TermQuery(t, f)) for t in terms),
                minimum_should_match=_num(e, "minimumNumberShouldMatch", "0"),
            )
            return _boost(e, bq)
        if tag == "MatchAllDocsQuery":
            return _boost(e, MatchAllDocsQuery())
        if tag == "BooleanQuery":
            clauses = []
            for c in _children(e):
                if c.tag != "Clause":
                    continue
                occ = _OCCURS.get(c.get("occurs", "").lower())
                if occ is None:
                    raise ParseError(
                        f'invalid "occurs" value: {c.get("occurs")!r}'
                    )
                kids = _children(c)
                if not kids:
                    raise ParseError("<Clause> needs a child query element")
                clauses.append(
                    BooleanClause(occ, self.query(kids[0], _field_opt(e, field)))
                )
            bq = BooleanQuery(
                tuple(clauses),
                minimum_should_match=_num(e, "minimumNumberShouldMatch", "0"),
            )
            return _boost(e, bq)
        if tag == "RangeQuery":
            f = _field(e, field)
            return _boost(
                e,
                TermRangeQuery(
                    e.get("lowerTerm"),
                    e.get("upperTerm"),
                    e.get("includeLower", "true").lower() == "true",
                    e.get("includeUpper", "true").lower() == "true",
                    f,
                ),
            )
        if tag == "DisjunctionMaxQuery":
            subs = tuple(
                self.query(c, _field_opt(e, field)) for c in _children_or_fail(e)
            )
            return _boost(
                e, DisjunctionMaxQuery(subs, _num(e, "tieBreaker", "0", float))
            )
        if tag == "ConstantScoreQuery":
            kids = _children(e)
            if not kids:
                raise ParseError("<ConstantScoreQuery> needs a child query")
            inner = self.query(kids[0], _field_opt(e, field))
            return _boost(e, ConstantScoreQuery(inner))
        if tag == "UserQuery":
            from lucene_spark.search.parser import parse

            # the element's OWN fieldName (not inherited) becomes the
            # classic parse's default field, falling back to the parser
            # default (``UserInputQueryBuilder.java:69-72``)
            f = e.get("fieldName") or self.default_field
            return _boost(e, parse(_text_or_fail(e), self.analyzer, f))
        if tag == "PointRangeQuery":
            raise ParseError(
                "PointRangeQuery is delegated to Catalyst numeric predicates"
                " in this engine (filter the source DataFrame instead)"
            )
        if tag == "BoostingTermQuery":
            # the reference's 3-arg PayloadScoreQuery ctor sets
            # includeSpanScore=TRUE (``PayloadScoreQuery.java:80-83``):
            # span BM25 score × average payload
            f = _field(e, field)
            return _boost(
                e,
                PayloadScoreQuery(
                    _text_or_fail(e), "avg", field=f, include_span_score=True
                ),
            )
        # span elements are valid at query position too (CoreParser
        # registers every span builder in BOTH factories)
        return self.span(e, field)

    # -------------------------------------------------------------- spans

    def span(self, e: ET.Element, field: str | None) -> SpanQuery:
        tag = e.tag
        if tag in ("SpanTerm", "SpanOrTerms", "SpanNear", "SpanOr",
                   "SpanFirst", "SpanNot", "SpanPositionRange"):
            # spans are single-field in this engine: the element's field
            # (own or inherited) must be the default text field
            f = e.get("fieldName") or field or self.default_field
            if f != self.default_field:
                raise ParseError(
                    f"span elements are single-field (engine field"
                    f" {self.default_field!r}); got {f!r}"
                )
        if tag == "SpanTerm":
            return _boost(e, SpanTermQuery(_text_or_fail(e)))
        if tag == "SpanOrTerms":
            terms = self.analyzer.analyze(_text_or_fail(e))
            if not terms:
                raise ParseError("<SpanOrTerms> analyzed to no terms")
            return _boost(e, SpanOrQuery(tuple(SpanTermQuery(t) for t in terms)))
        if tag == "SpanOr":
            return _boost(
                e,
                SpanOrQuery(tuple(self.span(c, field) for c in _children_or_fail(e))),
            )
        if tag == "SpanNear":
            if e.get("slop") is None:
                raise ParseError("<SpanNear> requires a slop attribute")
            in_order = e.get("inOrder", "false").lower() == "true"
            return _boost(
                e,
                SpanNearQuery(
                    tuple(self.span(c, field) for c in _children_or_fail(e)),
                    _num(e, "slop", "0"),
                    in_order,
                ),
            )
        if tag == "SpanFirst":
            kids = _children(e)
            if not kids:
                raise ParseError("<SpanFirst> needs a child span")
            return _boost(
                e, SpanFirstQuery(self.span(kids[0], field), _num(e, "end", "1"))
            )
        if tag == "SpanPositionRange":
            kids = _children(e)
            if not kids:
                raise ParseError("<SpanPositionRange> needs a child span")
            return _boost(
                e,
                SpanPositionRangeQuery(
                    self.span(kids[0], field),
                    _num(e, "start", "1"),
                    _num(e, "end", "1"),
                ),
            )
        if tag == "SpanNot":
            inc = e.find("Include")
            exc = e.find("Exclude")
            if inc is None or exc is None or not _children(inc) or not _children(exc):
                raise ParseError("<SpanNot> needs Include and Exclude children")
            return _boost(
                e,
                SpanNotQuery(
                    self.span(_children(inc)[0], field),
                    self.span(_children(exc)[0], field),
                ),
            )
        raise ParseError(f"unknown XML query element <{tag}>")


def _field_opt(e: ET.Element, inherited: str | None) -> str | None:
    """fieldName attribute with inheritance, optionally absent."""
    return e.get("fieldName") or inherited


def parse_xml(
    xml_text: str,
    analyzer: StandardAnalyzer | None = None,
    default_field: str = "text",
) -> Query | SpanQuery:
    """Parse an XML query document into the engine's query tree
    (``CoreParser.parse``).  External entities never resolve
    (``ElementTree`` does not expand them — the reference's
    secure-by-default stance)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as ex:
        raise ParseError(f"malformed XML query: {ex}") from ex
    p = _XmlParser(analyzer or StandardAnalyzer(), default_field)
    return p.query(root, None)
