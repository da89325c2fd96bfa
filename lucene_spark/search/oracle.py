"""Brute-force in-memory reference scorer (the CheckHits pattern).

A completely independent, non-Spark evaluation of the same query semantics:
python dicts + numpy float32, no pruning, no joins.  Used by tests to assert
that the distributed plans (and later the WAND kernel) are *rank-identical* —
same docIDs, bit-equal float32 scores, same (score DESC, docID ASC) tie-break
(test-framework/.../search/CheckHits.java pattern, tie-break per
TopScoreDocCollector.java:26-28).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.smallfloat import byte4_to_int, int_to_byte4
from lucene_spark.search import bm25
from lucene_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    Query,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    rewrite_to_fixpoint,
)


class BruteForceIndex:
    """In-memory inverted index over (doc_id, text) pairs."""

    def __init__(self, docs: list[tuple[int, str]], analyzer: StandardAnalyzer | None = None):
        self.analyzer = analyzer or StandardAnalyzer()
        self.tf: dict[str, dict[int, int]] = {}
        self.doclen: dict[int, int] = {}
        self.norm: dict[int, int] = {}
        for doc_id, text in docs:
            toks = self.analyzer.analyze(text or "")
            self.doclen[doc_id] = len(toks)
            self.norm[doc_id] = int_to_byte4(len(toks))
            for t, c in Counter(toks).items():
                self.tf.setdefault(t, {})[doc_id] = c
        self.doc_count = sum(1 for v in self.doclen.values() if v > 0)
        self.sum_ttf = sum(self.doclen.values())
        self.all_docs = sorted(self.doclen)

    # ---------------------------------------------------------------- scoring

    def _score_tree(self, q: Query, boost: float) -> dict[int, np.float32]:
        if isinstance(q, MatchNoDocsQuery):
            return {}
        if isinstance(q, MatchAllDocsQuery):
            s = np.float32(boost)
            return {d: s for d in self.all_docs}
        if isinstance(q, BoostQuery):
            return self._score_tree(q.query, boost * q.boost)
        if isinstance(q, ConstantScoreQuery):
            docs = self._score_tree(q.query, 1.0)
            s = np.float32(boost) * np.float32(q.score)
            return {d: s for d in docs}
        if isinstance(q, TermQuery):
            posting = self.tf.get(q.term)
            if not posting:
                return {}
            scorer = bm25.BM25Scorer(len(posting), self.doc_count, self.sum_ttf, boost)
            return {
                d: np.float32(
                    bm25.bm25_score(
                        np.array([f], dtype=np.float32),
                        np.array([self.norm[d]]),
                        scorer.weight,
                        scorer.cache,
                    )[0]
                )
                for d, f in posting.items()
            }
        if isinstance(q, SynonymQuery):
            present = [t for t in q.terms if t in self.tf]
            if not present:
                return {}
            doc_freq = max(len(self.tf[t]) for t in present)
            merged: dict[int, int] = {}
            for t in present:
                for d, f in self.tf[t].items():
                    merged[d] = merged.get(d, 0) + f
            scorer = bm25.BM25Scorer(doc_freq, self.doc_count, self.sum_ttf, boost)
            return {
                d: np.float32(
                    bm25.bm25_score(
                        np.array([f], dtype=np.float32),
                        np.array([self.norm[d]]),
                        scorer.weight,
                        scorer.cache,
                    )[0]
                )
                for d, f in merged.items()
            }
        if isinstance(q, TermInSetQuery):
            docs: set[int] = set()
            for t in q.terms:
                docs.update(self.tf.get(t, {}))
            s = np.float32(boost)
            return {d: s for d in docs}
        if isinstance(q, DisjunctionMaxQuery):
            subs = [self._score_tree(s, boost) for s in q.queries]
            alldocs: set[int] = set().union(*[set(s) for s in subs]) if subs else set()
            out: dict[int, np.float32] = {}
            tb = q.tie_breaker
            for d in alldocs:
                vals = [float(s[d]) for s in subs if d in s]
                mx = max(vals)
                out[d] = np.float32(mx + tb * (sum(vals) - mx))
            return out
        if isinstance(q, BooleanQuery):
            return self._score_boolean(q, boost)
        raise TypeError(f"oracle does not support {type(q).__name__}")

    def _score_boolean(self, q: BooleanQuery, boost: float) -> dict[int, np.float32]:
        musts = [self._score_tree(c.query, boost) for c in q.clauses if c.occur == Occur.MUST]
        shoulds = [self._score_tree(c.query, boost) for c in q.clauses if c.occur == Occur.SHOULD]
        filters = [self._score_tree(c.query, 1.0) for c in q.clauses if c.occur == Occur.FILTER]
        nots = [self._score_tree(c.query, 1.0) for c in q.clauses if c.occur == Occur.MUST_NOT]
        msm = q.minimum_should_match

        should_sum: dict[int, float] = {}
        should_count: dict[int, int] = {}
        for s in shoulds:
            for d, v in s.items():
                should_sum[d] = should_sum.get(d, 0.0) + float(v)
                should_count[d] = should_count.get(d, 0) + 1

        if musts:
            docs = set(musts[0])
            for m in musts[1:]:
                docs &= set(m)
            out: dict[int, np.float32] = {}
            for d in docs:
                if msm > 0 and should_count.get(d, 0) < msm:
                    continue
                total = sum(float(m[d]) for m in musts) + should_sum.get(d, 0.0)
                out[d] = np.float32(total)
        elif shoulds:
            need = max(1, msm)
            out = {
                d: np.float32(should_sum[d])
                for d in should_sum
                if should_count[d] >= need
            }
        elif filters:
            docs = set(filters[0])
            for f_ in filters[1:]:
                docs &= set(f_)
            out = {d: np.float32(0.0) for d in docs}
            filters = []
        else:
            return {}

        for f_ in filters:
            out = {d: v for d, v in out.items() if d in f_}
        for n in nots:
            out = {d: v for d, v in out.items() if d not in n}
        return out

    def topk(self, query: Query, k: int = 10) -> list[tuple[int, float]]:
        """[(doc_id, float32-score)] sorted by (score DESC, doc_id ASC)."""
        q = rewrite_to_fixpoint(query)
        scores = self._score_tree(q, 1.0)
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

    def count(self, query: Query) -> int:
        return len(self._score_tree(rewrite_to_fixpoint(query), 1.0))
