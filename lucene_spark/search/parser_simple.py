"""SimpleQueryParser — the LENIENT end-user syntax
(``queryparser/simple/SimpleQueryParser.java``): never raises on query
text; any unparseable construct degrades gracefully to terms.

Operators (each individually switchable via ``flags``, :30-65):

* ``+`` AND, ``|`` OR, ``-`` NOT (double negation cancels, :258-262)
* ``"…"`` phrase, ``"…"~N`` sloppy phrase (NEAR)
* ``term*`` prefix, ``term~N`` fuzzy (``~`` alone = 2, capped at 2,
  negative/garbage → 0 → plain term, :393-434)
* ``( … )`` precedence groups, ``\\`` escape, whitespace = implicit
  operator (the default operator, SHOULD)

Tree building mirrors ``buildQueryTree`` (:345-390): clauses accumulate
FLAT while the operation stays the same; an operation CHANGE wraps the
current tree as the first clause of a new Boolean (the parser's
left-to-right precedence).  Negation wraps the branch as
``(MUST_NOT branch, SHOULD MatchAll)`` (:351-357).  ``"*"`` alone is
MatchAllDocs; an empty/agrammatical string yields MatchNoDocs
(:58-72).  Unmatched ``(`` / ``"`` are treated as extraneous and
re-scanned as text (:175-181, :239-245) — the leniency contract.

Multi-field weights use the reference's SHOULD-of-boosted-fields shape
(:455-500) via :class:`BoostQuery`.  Fuzzy terms keep this engine's
dataclass rewrite default (the classic parser's convention).
"""

from __future__ import annotations

from dataclasses import dataclass

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
)

# feature flags (SimpleQueryParser.java:30-65)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_WS = " \t\n\r"


@dataclass
class _State:
    data: str
    index: int
    length: int
    top: Query | None = None
    current_op: Occur | None = None
    previous_op: Occur | None = None
    not_count: int = 0


class SimpleQueryParser:
    """Single- or multi-field lenient parser; ``weights`` maps field →
    boost (a bare ``field`` is weight 1.0)."""

    def __init__(self, analyzer=None, field: str = "text",
                 weights: dict[str, float] | None = None, flags: int = -1):
        from lucene_spark.analysis.analyzer import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        self.weights = dict(weights) if weights else {field: 1.0}
        self.flags = flags
        self.default_operator = Occur.SHOULD

    # ------------------------------------------------------------- public
    def parse(self, text: str) -> Query:
        if text.strip() == "*":
            return MatchAllDocsQuery()
        state = _State(data=text, index=0, length=len(text))
        self._parse_sub(state)
        return state.top if state.top is not None else MatchNoDocsQuery()

    # ------------------------------------------------------ main scanner
    def _on(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def _parse_sub(self, state: _State) -> None:
        while state.index < state.length:
            c = state.data[state.index]
            if c == "(" and self._on(PRECEDENCE_OPERATORS):
                self._consume_subquery(state)
            elif c == ")" and self._on(PRECEDENCE_OPERATORS):
                state.index += 1  # extraneous, ignored
            elif c == '"' and self._on(PHRASE_OPERATOR):
                self._consume_phrase(state)
            elif c == "+" and self._on(AND_OPERATOR):
                # ignored when an op is already set or nothing precedes it
                if state.current_op is None and state.top is not None:
                    state.current_op = Occur.MUST
                state.index += 1
            elif c == "|" and self._on(OR_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = Occur.SHOULD
                state.index += 1
            elif c == "-" and self._on(NOT_OPERATOR):
                # two NOTs in a row negate each other; even whitespace
                # resets the pending negation (the continue mirrors :267)
                state.not_count += 1
                state.index += 1
                continue
            elif c in _WS and self._on(WHITESPACE_OPERATOR):
                state.index += 1
            else:
                self._consume_token(state)
            state.not_count = 0

    def _consume_subquery(self, state: _State) -> None:
        start = state.index = state.index + 1
        precedence, escaped = 1, False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                elif c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the opening one is extraneous
            state.index = start
        elif state.index == start:
            # "()" — the pending operation dies with the empty group
            state.current_op = None
            state.index += 1
        else:
            sub = _State(data=state.data, index=start, length=state.index)
            self._parse_sub(sub)
            self._build(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        start = state.index = state.index + 1
        copied: list[str] = []
        escaped = has_slop = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                elif c == '"':
                    if (
                        state.length > state.index + 1
                        and state.data[state.index + 1] == "~"
                        and self._on(NEAR_OPERATOR)
                    ):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            copied.append(c)
            state.index += 1
        if state.index == state.length:
            state.index = start  # unmatched quote: extraneous
        elif state.index == start:
            state.current_op = None
            state.index += 1
        else:
            phrase = "".join(copied)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build(state, self._new_phrase(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        copied: list[str] = []
        escaped = prefix = fuzzy = False
        while state.index < state.length:
            c = state.data[state.index]
            if not escaped:
                if c == "\\" and self._on(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                elif self._token_finished(state):
                    break
                elif copied and c == "~" and self._on(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = bool(copied) and c == "*" and self._on(PREFIX_OPERATOR)
            escaped = False
            copied.append(c)
            state.index += 1
        if copied:
            if fuzzy:
                token = "".join(copied)
                fuzziness = min(self._parse_fuzziness(state), 2)
                if fuzziness == 0:
                    branch = self._new_default(token)
                else:
                    branch = self._new_fuzzy(token, fuzziness)
            elif prefix:
                branch = self._new_prefix("".join(copied[:-1]))
            else:
                branch = self._new_default("".join(copied))
            self._build(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        slop: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                slop.append(state.data[state.index])
        text = "".join(slop)
        if not text:
            return 2  # bare "~" = automatic fuzziness
        try:
            fuzz = int(text)
        except ValueError:
            return 0  # garbage swallowed, leniently
        return max(fuzz, 0)

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        return (
            (c == '"' and self._on(PHRASE_OPERATOR))
            or (c == "|" and self._on(OR_OPERATOR))
            or (c == "+" and self._on(AND_OPERATOR))
            or (c in "()" and self._on(PRECEDENCE_OPERATORS))
            or (c in _WS and self._on(WHITESPACE_OPERATOR))
        )

    # ------------------------------------------------------ tree builder
    def _build(self, state: _State, branch: Query | None) -> None:
        if branch is None:
            return
        if state.not_count % 2 == 1:
            branch = BooleanQuery(
                (
                    BooleanClause(Occur.MUST_NOT, branch),
                    BooleanClause(Occur.SHOULD, MatchAllDocsQuery()),
                )
            )
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                state.top = BooleanQuery(
                    (BooleanClause(state.current_op, state.top),)
                )
            state.top = BooleanQuery(
                tuple(state.top.clauses)
                + (BooleanClause(state.current_op, branch),),
                state.top.minimum_should_match,
            )
            state.previous_op = state.current_op
        state.current_op = None

    # --------------------------------------------------------- factories
    def _fields(self, make) -> Query | None:
        subs = []
        for f, w in self.weights.items():
            q = make(f)
            if q is not None:
                subs.append(BoostQuery(q, float(w)) if w != 1.0 else q)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]  # QueryBuilder.simplify
        return BooleanQuery(tuple(BooleanClause(Occur.SHOULD, q) for q in subs))

    def _new_default(self, text: str) -> Query | None:
        def make(f):
            terms = self.analyzer.analyze(text)
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0], f)
            return BooleanQuery(
                tuple(
                    BooleanClause(self.default_operator, TermQuery(t, f))
                    for t in terms
                )
            )

        return self._fields(make)

    def _new_phrase(self, text: str, slop: int) -> Query | None:
        def make(f):
            terms = tuple(self.analyzer.analyze(text))
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0], f)
            return PhraseQuery(terms, slop, f)

        return self._fields(make)

    @staticmethod
    def _normalize(text: str) -> str:
        """``Analyzer.normalize`` (the reference's prefix/fuzzy path,
        :470-476): case-fold the WHOLE text without tokenizing — a
        tokenizing pass would silently truncate multi-token inputs like
        ``wi-fi`` to their first token."""
        from lucene_spark.analysis.analyzer import java_lower

        return java_lower(text)

    def _new_prefix(self, text: str) -> Query | None:
        token = self._normalize(text)
        return self._fields(lambda f: PrefixQuery(token, f))

    def _new_fuzzy(self, text: str, fuzziness: int) -> Query | None:
        token = self._normalize(text)
        return self._fields(lambda f: FuzzyQuery(token, fuzziness, f))
