"""Surround query-language parser — proximity operators over the spans API.

Re-expression of the reference's ``queryparser/surround`` module
(``surround/parser/QueryParser.jj``, ``surround/query/DistanceQuery.java``,
``SpanNearClauseFactory.java``): the classic W/N proximity syntax

* ``a W b`` / ``a 3W b``  — ordered within distance 1 / 3,
* ``a N b`` / ``a 4N b``  — unordered within distance 1 / 4,
* prefix operator form     — ``3W(a, b, c)``, ``AND(a, b)``, ``OR(a, b)``,
* infix Booleans           — ``a AND b``, ``a OR b``, ``a NOT b``,
* truncation               — ``ab*`` / ``a?c`` (Boolean level only),
* parentheses for grouping; operators are case-insensitive.

Distance expressions translate to :class:`SpanNearQuery` with
``slop = distance − 1`` (exactly ``SpanNearClauseFactory.makeSpanNearClause``),
``OR`` inside a distance operand to :class:`SpanOrQuery`, and nesting
composes (``2W(scan, OR(sort, merge))``).  Boolean operators over plain
terms/truncations build the engine's :class:`BooleanQuery`.

Truncations inside a distance operand (``2W(sca*, merge)``) expand against
the terms dictionary through the intervals multi-term sources
(``SpanMultiTermQueryWrapper`` analog, 128-term cap) — lifted in round 5.
Envelope (documented, raising): Boolean operators over distance subqueries
need span-clause Boolean scoring — out of scope; the error message names
the unsupported construct.
"""

from __future__ import annotations

import re

from lucene_spark.search.parser import ParseError
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    Query,
    TermQuery,
    WildcardQuery,
)
from lucene_spark.search.spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

_TOKEN = re.compile(r"\(|\)|,|[^\s(),]+")
_DIST_OP = re.compile(r"^(\d*)([WwNn])$")
_BOOL_OPS = {"and", "or", "not"}


def _tokens(text: str) -> list[str]:
    return _TOKEN.findall(text)


def _is_dist_op(tok: str) -> re.Match | None:
    m = _DIST_OP.match(tok)
    # bare "w"/"n" could be a term; Lucene's grammar reserves them as ops —
    # we follow the reference (quote via OR(...) form is not needed for the
    # synthetic corpora; a literal term "w" is out of envelope)
    return m


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.pos = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self) -> str:
        if self.pos >= len(self.toks):
            raise ParseError("unexpected end of surround query")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, t: str) -> None:
        got = self.take()
        if got != t:
            raise ParseError(f"expected {t!r}, got {got!r}")

    # grammar: or_expr := and_expr (OR and_expr)* ; and_expr := not_expr
    # (AND not_expr)* ; not_expr := dist_expr (NOT dist_expr)* ;
    # dist_expr := prim ((nW|nN) prim)* ; prim := term | '(' or_expr ')'
    # | OP '(' args ')'
    def parse(self):
        q = self.or_expr()
        if self.pos != len(self.toks):
            raise ParseError(f"trailing input: {self.toks[self.pos:]}")
        return q

    def or_expr(self):
        parts = [self.and_expr()]
        while (p := self.peek()) is not None and p.lower() == "or":
            self.take()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else _combine_or(parts)

    def and_expr(self):
        parts = [self.not_expr()]
        while (p := self.peek()) is not None and p.lower() == "and":
            self.take()
            parts.append(self.not_expr())
        if len(parts) == 1:
            return parts[0]
        return _bool(parts, Occur.MUST)

    def not_expr(self):
        q = self.dist_expr()
        while (p := self.peek()) is not None and p.lower() == "not":
            self.take()
            ex = self.dist_expr()
            q = BooleanQuery(
                (
                    BooleanClause(Occur.MUST, _as_bool_operand(q)),
                    BooleanClause(Occur.MUST_NOT, _as_bool_operand(ex)),
                )
            )
        return q

    def dist_expr(self):
        # Lucene's surround grammar collects ALL infix operands of one
        # distance operator into a single n-ary DistanceQuery (the slop is
        # a TOTAL budget, not per adjacent pair); mixing different distance
        # operators without parentheses is rejected like the reference.
        q = self.prim()
        p = self.peek()
        if p is None or not _is_dist_op(p) or p.lower() in _BOOL_OPS:
            return q
        op = self.take().lower()
        operands = [q, self.prim()]
        while (p := self.peek()) is not None and _is_dist_op(p) and p.lower() not in _BOOL_OPS:
            if p.lower() != op:
                raise ParseError(
                    f"mixed infix distance operators ({op!r} then "
                    f"{p.lower()!r}) need parentheses"
                )
            self.take()
            operands.append(self.prim())
        m = _DIST_OP.match(op)
        dist = int(m.group(1)) if m.group(1) else 1
        return _span_near(
            [_as_span(a) for a in operands],
            slop=dist - 1,
            in_order=m.group(2) == "w",
        )

    def prim(self):
        tok = self.take()
        if tok == "(":
            q = self.or_expr()
            self.expect(")")
            return q
        if tok in (")", ","):
            raise ParseError(f"unexpected {tok!r}")
        low = tok.lower()
        nxt = self.peek()
        if nxt == "(" and (low in _BOOL_OPS or _is_dist_op(tok)):
            self.take()
            args = [self.or_expr()]
            while self.peek() == ",":
                self.take()
                args.append(self.or_expr())
            self.expect(")")
            if low == "and":
                return _bool(args, Occur.MUST)
            if low == "or":
                return _combine_or(args)
            if low == "not":
                if len(args) < 2:
                    raise ParseError("NOT(...) needs >= 2 arguments")
                return BooleanQuery(
                    (BooleanClause(Occur.MUST, _as_bool_operand(args[0])),)
                    + tuple(
                        BooleanClause(Occur.MUST_NOT, _as_bool_operand(a))
                        for a in args[1:]
                    )
                )
            m = _is_dist_op(tok)
            dist = int(m.group(1)) if m.group(1) else 1
            return _span_near(
                [_as_span(a) for a in args],
                slop=dist - 1,
                in_order=m.group(2).lower() == "w",
            )
        if "*" in tok or "?" in tok:
            return WildcardQuery(low)
        return TermQuery(low)


def _span_near(clauses: list, slop: int, in_order: bool) -> SpanNearQuery:
    """Build the n-ary near query.  Repeated operands are fine since r5:
    the intervals normalizer collapses them to RepeatingIntervalsSource
    semantics (``OrderedIntervalsSource.build`` deduplicate)."""
    return SpanNearQuery(tuple(clauses), slop=slop, in_order=in_order)


def _combine_or(parts: list):
    if all(isinstance(p, (SpanQuery, TermQuery)) for p in parts) and any(
        isinstance(p, SpanQuery) for p in parts
    ):
        return SpanOrQuery(tuple(_as_span(p) for p in parts))
    if all(isinstance(p, TermQuery) for p in parts):
        # keep term-level ORs Boolean-shaped so they compose with AND/NOT;
        # _as_span converts them back when a distance operator needs them
        return _bool(parts, Occur.SHOULD)
    return _bool(parts, Occur.SHOULD)


def _bool(parts: list, occur: Occur) -> BooleanQuery:
    return BooleanQuery(
        tuple(BooleanClause(occur, _as_bool_operand(p)) for p in parts)
    )


def _as_span(q) -> SpanQuery:
    """Coerce a parsed operand into a span (distance-operand position)."""
    if isinstance(q, SpanQuery):
        return q
    if isinstance(q, TermQuery):
        return SpanTermQuery(q.term)
    if isinstance(q, WildcardQuery):
        # r5: truncation inside a distance operand expands against the
        # terms dictionary (SpanMultiTermQueryWrapper analog over
        # Intervals.prefix/wildcard, 128-term default cap)
        from lucene_spark.search.spans import SpanMultiTermQuery

        pat = q.pattern
        if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
            return SpanMultiTermQuery(kind="prefix", pattern=pat[:-1])
        return SpanMultiTermQuery(kind="wildcard", pattern=pat)
    if isinstance(q, BooleanQuery) and all(
        c.occur == Occur.SHOULD and isinstance(c.query, TermQuery)
        for c in q.clauses
    ):
        return SpanOrQuery(tuple(SpanTermQuery(c.query.term) for c in q.clauses))
    raise ParseError(
        f"cannot use {type(q).__name__} inside a distance operator"
    )


def _as_bool_operand(q) -> Query:
    """Coerce a parsed operand into a Boolean-clause query."""
    if isinstance(q, SpanQuery):
        raise ParseError(
            "Boolean operators over distance subqueries need span-clause "
            "Boolean scoring — out of envelope; use a pure distance "
            "expression or Boolean-of-terms"
        )
    return q


def parse_surround(text: str):
    """Parse surround syntax → a :class:`SpanQuery` (pure proximity) or a
    :class:`~lucene_spark.search.query.Query` (Boolean of terms)."""
    toks = _tokens(text)
    if not toks:
        raise ParseError("empty surround query")
    return _Parser(toks).parse()


def surround_topk(searcher, text: str, k: int = 10):
    """Parse + run: span queries via :func:`span_topk` over the searcher's
    index, Boolean/term queries via the searcher itself."""
    from lucene_spark.search.spans import span_topk

    q = parse_surround(text)
    if isinstance(q, SpanQuery):
        return span_topk(searcher.index, q, k=k)
    return searcher.search(q, k=k)
