"""Classic query-syntax parser (subset).

Grammar follows the reference's classic QueryParser
(``queryparser/.../classic/QueryParser.jj:66-67``): clauses with ``+``/``-``
prefixes, ``AND``/``OR``/``NOT``, field prefixes ``f:term``, parentheses,
quoted phrases ``"a b"~slop``, fuzzy ``term~n``, wildcards ``*``/``?``,
ranges ``[a TO b]`` / ``{a TO b}``, boosts ``^2``.

Critical invariant carried over from ``QueryParserBase``: query terms pass
through the *same* analyzer as index terms — a term that analyzes to nothing
(a stopword) drops its clause, exactly like the reference.
"""

from __future__ import annotations

import re

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_SPEC = [
    ("LPAREN", r"\("),
    ("RPAREN", r"\)"),
    ("AND", r"AND\b|&&"),
    ("OR", r"OR\b|\|\|"),
    ("NOT", r"NOT\b"),
    ("PLUS", r"\+"),
    ("MINUS", r"-"),
    ("RANGE", r"[\[{][^\]}]*[\]}]"),
    ("QUOTED", r'"[^"]*"(?:~\d+)?'),
    ("BOOST", r"\^\d+(?:\.\d+)?"),
    ("FUZZY", r"~\d*"),
    ("COLON", r":"),
    ("TERM", r"[^\s()+\-:^~\"]+"),
    ("WS", r"\s+"),
]
_TOKEN_RE = re.compile("|".join(f"(?P<{n}>{p})" for n, p in _TOKEN_SPEC))


class ParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str, analyzer: StandardAnalyzer, default_field: str):
        self.toks = [
            (m.lastgroup, m.group())
            for m in _TOKEN_RE.finditer(text)
            if m.lastgroup != "WS"
        ]
        self.pos = 0
        self.analyzer = analyzer
        self.field = default_field

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    # expr := and_expr (OR and_expr)*
    def parse_expr(self) -> Query | None:
        parts = [self.parse_and()]
        while self.peek()[0] == "OR":
            self.next()
            parts.append(self.parse_and())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return BooleanQuery(tuple(BooleanClause(Occur.SHOULD, p) for p in parts))

    # and_expr := unary ((AND)? unary)* — juxtaposed clauses without an
    # operator are SHOULD (the classic parser's default-OR operator,
    # ``QueryParser.jj`` Query := Clause (Conjunction? Modifiers Clause)*)
    _CLAUSE_STARTERS = frozenset(
        ["NOT", "PLUS", "MINUS", "LPAREN", "QUOTED", "RANGE", "TERM"]
    )

    def parse_and(self) -> Query | None:
        # AND binds its two OPERANDS (both become MUST); juxtaposed clauses
        # keep the default SHOULD — so "a AND b c" is (+a +b c), like the
        # reference's conjunction handling
        parts = [self.parse_unary()]
        musts = [False]
        while True:
            kind = self.peek()[0]
            if kind == "AND":
                self.next()
                musts[-1] = True
                parts.append(self.parse_unary())
                musts.append(True)
            elif kind in self._CLAUSE_STARTERS:
                parts.append(self.parse_unary())
                musts.append(False)
            else:
                break
        clauses: list[BooleanClause] = []
        for p, must in zip(parts, musts):
            if p is None:
                continue
            if isinstance(p, tuple):  # (occur, query) from +/-/NOT
                clauses.append(BooleanClause(p[0], p[1]))
            else:
                clauses.append(
                    BooleanClause(Occur.MUST if must else Occur.SHOULD, p)
                )
        if not clauses:
            return None
        if len(clauses) == 1 and clauses[0].occur == Occur.SHOULD:
            return clauses[0].query
        return BooleanQuery(tuple(clauses))

    # unary := (NOT|+|-)? primary — returns Query or (Occur, Query)
    def parse_unary(self):
        kind, _ = self.peek()
        if kind in ("NOT", "MINUS"):
            self.next()
            inner = self.parse_unary()
            if inner is None:
                return None
            q = inner[1] if isinstance(inner, tuple) else inner
            return (Occur.MUST_NOT, q)
        if kind == "PLUS":
            self.next()
            inner = self.parse_unary()
            if inner is None:
                return None
            q = inner[1] if isinstance(inner, tuple) else inner
            return (Occur.MUST, q)
        return self.parse_primary()

    def parse_primary(self) -> Query | None:
        kind, val = self.peek()
        field = self.field
        if kind == "TERM" and self.pos + 1 < len(self.toks) and self.toks[self.pos + 1][0] == "COLON":
            field = val
            self.next()
            self.next()
            kind, val = self.peek()
        if kind == "LPAREN":
            self.next()
            inner = self.parse_expr()
            if self.peek()[0] != "RPAREN":
                raise ParseError("expected )")
            self.next()
            return self._maybe_boost(inner)
        if kind == "QUOTED":
            self.next()
            m = re.match(r'"([^"]*)"(?:~(\d+))?', val)
            return self._maybe_boost(
                self._phrase_query(m.group(1), int(m.group(2) or 0), field)
            )

        if kind == "RANGE":
            self.next()
            m = re.match(r"([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])", val)
            if not m:
                raise ParseError(f"bad range: {val}")
            lo = None if m.group(2) == "*" else self.analyzer.analyze(m.group(2))[0]
            hi = None if m.group(3) == "*" else self.analyzer.analyze(m.group(3))[0]
            return self._maybe_boost(
                TermRangeQuery(lo, hi, m.group(1) == "[", m.group(4) == "]", field)
            )
        if kind == "TERM":
            self.next()
            fuzzy = None
            if self.peek()[0] == "FUZZY":
                _, fz = self.next()
                fuzzy = int(fz[1:]) if len(fz) > 1 else 2
            if val == "*":
                return self._maybe_boost(MatchAllDocsQuery())
            if "*" in val or "?" in val:
                # wildcard patterns are lowercased but not tokenized
                return self._maybe_boost(WildcardQuery(_lower_keep_wild(val), field))
            analyzed = self.analyzer.analyze(val)
            if not analyzed:
                return None  # stopword clause drops out
            q = TermQuery(analyzed[0], field)
            if fuzzy is not None:
                q = FuzzyQuery(analyzed[0], min(fuzzy, 2), field)
            return self._maybe_boost(q)
        return None

    def _phrase_query(self, text: str, slop: int, field: str) -> Query | None:
        """The quoted-phrase production (``QueryParserBase.getFieldQuery``
        with slop) — overridden by the complexPhrase parser to give phrase
        contents their richer grammar."""
        terms = tuple(self.analyzer.analyze(text))
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field)
        return PhraseQuery(terms, slop, field)

    def _maybe_boost(self, q: Query | None) -> Query | None:
        if q is None:
            return None
        if self.peek()[0] == "BOOST":
            _, b = self.next()
            return BoostQuery(q, float(b[1:]))
        return q


def _lower_keep_wild(pattern: str) -> str:
    from lucene_spark.analysis.analyzer import java_lower

    return java_lower(pattern)


def parse(
    text: str,
    analyzer: StandardAnalyzer | None = None,
    default_field: str = "text",
) -> Query:
    analyzer = analyzer or StandardAnalyzer()
    p = _Parser(text, analyzer, default_field)
    q = p.parse_expr()
    if p.pos != len(p.toks):
        raise ParseError(f"trailing input at token {p.pos}: {p.toks[p.pos:]}")
    return q if q is not None else MatchNoDocsQuery()
