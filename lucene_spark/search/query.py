"""Query tree: the logical algebra of the search side.

Mirrors the reference's ``Query`` hierarchy (``search/Query.java``,
``search/TermQuery.java``, ``search/BooleanQuery.java``,
``search/BooleanClause.java``) plus its rewrite rules
(``search/BooleanQuery.java:269-440``, ``search/IndexSearcher.java:866-875``),
re-expressed as plain dataclasses rewritten to fixpoint in Python before
being planned into DataFrame operations by the searcher.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Sequence


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"
    FILTER = "FILTER"


@dataclass(frozen=True)
class Query:
    def rewrite(self) -> "Query":
        return self


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    field: str = "text"


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float = 1.0

    def rewrite(self) -> Query:
        inner = self.query.rewrite()
        if self.boost == 1.0:
            return inner
        if isinstance(inner, BoostQuery):  # fold nested boosts
            return BoostQuery(inner.query, self.boost * inner.boost)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        return BoostQuery(inner, self.boost)


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    score: float = 1.0


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Terms scored as one: per-doc freq = sum of member freqs
    (search/SynonymQuery.java)."""

    terms: tuple[str, ...]
    field: str = "text"


# Multi-term rewrite methods (MultiTermQuery.java:80-128):
#   constant_score    — CONSTANT_SCORE_REWRITE: every match scores 1.0
#   scoring_boolean   — SCORING_BOOLEAN_REWRITE: SHOULD-of-TermQuery, each
#                       term scored with its own stats, per-doc sum
#   top_terms_blended — TopTermsBlendedFreqScoringRewrite (FuzzyQuery's
#                       Lucene default): top-N terms by (boost DESC, term
#                       ASC), scored via BlendedTermQuery


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    field: str = "text"
    rewrite_method: str = "constant_score"


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # Lucene syntax: * (any run) and ? (one char)
    field: str = "text"
    rewrite_method: str = "constant_score"


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str
    field: str = "text"


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2
    field: str = "text"
    rewrite_method: str = "constant_score"
    max_expansions: int = 50  # FuzzyQuery.defaultMaxExpansions
    # Lucene default (FuzzyQuery.java:82-91): adjacent transposition = ONE
    # edit (OSA distance, TestLevenshteinAutomata.getTDistance)
    transpositions: bool = True


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """(term, boost) disjunction with BLENDED statistics: every member term
    scores with docFreq = max(df) and totalTermFreq = sum(ttf) over the
    members (``BlendedTermQuery.java:281-291`` adjustFrequencies), combined
    as SHOULD (``BlendedTermQuery.BOOLEAN_REWRITE``, scores summed).  Fuzzy
    boosts are ``1f - editDistance/minTermLength``
    (``FuzzyTermsEnum.java:251-257``)."""

    terms: tuple[tuple[str, float], ...]
    field: str = "text"


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    field: str = "text"


@dataclass(frozen=True)
class TermInSetQuery(Query):
    terms: tuple[str, ...]
    field: str = "text"


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: tuple[str, ...]
    slop: int = 0
    field: str = "text"


@dataclass(frozen=True)
class KnnFloatVectorQuery(Query):
    """k-nearest-neighbor vector query, composable with Boolean/filter
    clauses (``search/KnnFloatVectorQuery.java:49``): matches exactly the k
    docs nearest to ``vector`` among docs accepted by ``filter`` (Lucene's
    pre-filtered KNN — the filter restricts the candidate set BEFORE the
    top-k, it does not post-filter the neighbors), scored with
    ``VectorSimilarityFunction.COSINE`` scaling ``(1 + cos) / 2``.  Cosines
    are rounded to 6 decimals before scaling for cross-engine determinism
    (documented divergence)."""

    vector: tuple[float, ...]
    k: int = 10
    filter: "Query | None" = None
    field: str = "embedding"


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: Query


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...]
    minimum_should_match: int = 0

    @staticmethod
    def build(
        must: Sequence[Query] = (),
        should: Sequence[Query] = (),
        must_not: Sequence[Query] = (),
        filter: Sequence[Query] = (),
        minimum_should_match: int = 0,
    ) -> "BooleanQuery":
        cl = (
            tuple(BooleanClause(Occur.MUST, q) for q in must)
            + tuple(BooleanClause(Occur.SHOULD, q) for q in should)
            + tuple(BooleanClause(Occur.MUST_NOT, q) for q in must_not)
            + tuple(BooleanClause(Occur.FILTER, q) for q in filter)
        )
        return BooleanQuery(cl, minimum_should_match)

    def rewrite(self) -> Query:
        """BooleanQuery.java:269-440 simplifications (the relevant subset)."""
        clauses: list[BooleanClause] = []
        for c in self.clauses:
            q = c.query.rewrite()
            if isinstance(q, MatchNoDocsQuery):
                if c.occur in (Occur.MUST, Occur.FILTER):
                    return MatchNoDocsQuery()  # annihilates the conjunction
                continue  # SHOULD/MUST_NOT MatchNoDocs clauses drop out
            clauses.append(BooleanClause(c.occur, q))
        # dedup FILTER / MUST_NOT
        seen: set = set()
        deduped: list[BooleanClause] = []
        for c in clauses:
            if c.occur in (Occur.FILTER, Occur.MUST_NOT):
                key = (c.occur, c.query)
                if key in seen:
                    continue
                seen.add(key)
            deduped.append(c)
        clauses = deduped
        # MUST and MUST_NOT on the same query -> MatchNoDocs
        musts = {c.query for c in clauses if c.occur in (Occur.MUST, Occur.FILTER)}
        if any(c.query in musts for c in clauses if c.occur == Occur.MUST_NOT):
            return MatchNoDocsQuery()
        if not clauses:
            return MatchNoDocsQuery()
        # single positive clause unwrap
        positive = [c for c in clauses if c.occur in (Occur.MUST, Occur.SHOULD)]
        if (
            len(clauses) == 1
            and len(positive) == 1
            and self.minimum_should_match <= 1
        ):
            return positive[0].query
        return BooleanQuery(tuple(clauses), self.minimum_should_match)


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """max(score) + tie_breaker * sum(other scores)
    (search/DisjunctionMaxQuery.java)."""

    queries: tuple[Query, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class CoveringQuery(Query):
    """Per-document minimum-should-match disjunction
    (``sandbox/search/CoveringQuery.java:40-90``): a doc matches when at
    least ``max(1, minimumNumberMatch(doc))`` of the sub-queries match it;
    docs where the source evaluates to NULL never match.  Score = float32
    of the double sum of the MATCHING clauses' scores
    (``CoveringScorer.java:208-216``) — identical arithmetic to a SHOULD
    disjunction, only the acceptance threshold is per-doc.

    ``min_match_expr`` is a Spark-SQL expression over the docmap's
    per-doc columns — the ``LongValuesSource`` analog (``fromLongField``
    is just a bare column name; arithmetic compositions are arbitrary
    expressions, matching LongValuesSource's constant/field algebra).
    """

    queries: tuple[Query, ...]
    min_match_expr: str

    def rewrite(self) -> Query:
        # MatchNoDocs children never match and never score; dropping them
        # changes neither the count nor the sum (the reference keeps the
        # clause but its scorer contributes nothing)
        subs = tuple(
            s
            for s in (sub.rewrite() for sub in self.queries)
            if not isinstance(s, MatchNoDocsQuery)
        )
        if not subs:
            return MatchNoDocsQuery()
        if subs != self.queries:
            return CoveringQuery(subs, self.min_match_expr)
        return self


def rewrite_to_fixpoint(q: Query, max_iters: int = 16) -> Query:
    """IndexSearcher.java:866-875 rewrite loop."""
    for _ in range(max_iters):
        nxt = q.rewrite()
        if nxt == q:
            return q
        q = nxt
    return q


def collect_terms(q: Query) -> set[tuple[str, str]]:
    """All (field, term) pairs whose stats the scorer will need."""
    out: set[tuple[str, str]] = set()
    if isinstance(q, TermQuery):
        out.add((q.field, q.term))
    elif isinstance(q, SynonymQuery):
        out.update((q.field, t) for t in q.terms)
    elif isinstance(q, PhraseQuery):
        out.update((q.field, t) for t in q.terms)
    elif isinstance(q, TermInSetQuery):
        out.update((q.field, t) for t in q.terms)
    elif isinstance(q, BlendedTermQuery):
        out.update((q.field, t) for t, _b in q.terms)
    elif isinstance(q, KnnFloatVectorQuery):
        if q.filter is not None:
            out |= collect_terms(q.filter)
    elif isinstance(q, (BoostQuery, ConstantScoreQuery)):
        out |= collect_terms(q.query)
    elif isinstance(q, BooleanQuery):
        for c in q.clauses:
            out |= collect_terms(c.query)
    elif isinstance(q, (DisjunctionMaxQuery, CoveringQuery)):
        for sub in q.queries:
            out |= collect_terms(sub)
    return out
