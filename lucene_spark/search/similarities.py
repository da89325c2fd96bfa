"""Pluggable Similarity families (the reference's ``search/similarities/``).

Lucene ships ten similarity families behind one SimScorer contract
(``Similarity.java:92,152``: ``score(freq, norm)`` from per-term collection
stats).  We implement the three most used, each with strict float32 parity
and a vectorized numpy kernel usable inside Arrow UDFs:

* :class:`BM25Similarity` — ``BM25Similarity.java`` (the default; delegates
  to :mod:`lucene_spark.search.bm25`),
* :class:`ClassicSimilarity` — TF-IDF (``ClassicSimilarity.java`` /
  ``TFIDFSimilarity.java``): ``idf = (float)(ln((docCount+1)/(docFreq+1))+1)``,
  ``tf = (float) sqrt(freq)``, ``lengthNorm = (float)(1/sqrt(dl))`` via the
  shared SmallFloat length quantization; ``score = weight · tf · norm`` with
  per-operation float32 rounding,
* :class:`BooleanSimilarity` — ``BooleanSimilarity.java``: score = boost.

Others (DFR, IB, LM-Dirichlet, …) plug in through the same
``leaf_scorer(boost, doc_freq, doc_count, sum_ttf)`` contract.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_spark.analysis.smallfloat import LENGTH_TABLE
from lucene_spark.search import bm25


class LeafScorer:
    """SimScorer: vectorized ``score(freq_f32, norm_bytes) -> float32[]``."""

    def score(self, freq: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        raise NotImplementedError


@dataclass
class _BM25Leaf(LeafScorer):
    weight: np.float32
    cache: np.ndarray

    def score(self, freq, norm_bytes):
        return bm25.bm25_score(freq, norm_bytes, self.weight, self.cache)


@dataclass
class _TableLeaf(LeafScorer):
    """weight · tf(freq) · table[norm] in strict float32 (TFIDFScorer)."""

    weight: np.float32
    table: np.ndarray  # float32[256] lengthNorm per norm byte

    def score(self, freq, norm_bytes):
        f = np.asarray(freq, dtype=np.float64)
        tf = np.sqrt(f).astype(np.float32)  # (float) Math.sqrt(freq)
        nrm = self.table[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return (self.weight * tf).astype(np.float32) * nrm


@dataclass
class _ConstLeaf(LeafScorer):
    weight: np.float32

    def score(self, freq, norm_bytes):
        return np.full(len(np.asarray(freq)), self.weight, dtype=np.float32)


class Similarity:
    name = "abstract"
    supports_wand = False

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        raise NotImplementedError

    def leaf_scorer(
        self, boost: float, doc_freq: int, doc_count: int, sum_ttf: int
    ) -> LeafScorer:
        raise NotImplementedError

    def leaf_scorer_from_weight(
        self, weight: np.float32, doc_count: int, sum_ttf: int
    ) -> LeafScorer:
        """SimScorer from a precomputed weight (multi-term/phrase: weight =
        boost · Σ idf(term_i), BM25Similarity.java:166-174)."""
        raise NotImplementedError


class BM25Similarity(Similarity):
    name = "bm25"
    supports_wand = True

    def __init__(self, k1: float = bm25.K1, b: float = bm25.B):
        self.k1 = k1
        self.b = b

    def idf(self, doc_freq, doc_count):
        return bm25.idf(doc_freq, doc_count)

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf):
        sc = bm25.BM25Scorer(doc_freq, doc_count, sum_ttf, boost=boost, k1=self.k1, b=self.b)
        return _BM25Leaf(sc.weight, sc.cache)

    def leaf_scorer_from_weight(self, weight, doc_count, sum_ttf):
        cache = bm25.norm_inverse_cache(bm25.avgdl(sum_ttf, doc_count), self.k1, self.b)
        return _BM25Leaf(np.float32(weight), cache)


class ClassicSimilarity(Similarity):
    name = "classic"

    def idf(self, doc_freq, doc_count):
        # (float)(Math.log((docCount + 1) / (double)(docFreq + 1)) + 1.0)
        return np.float32(math.log((doc_count + 1) / float(doc_freq + 1)) + 1.0)

    def _table(self) -> np.ndarray:
        dl = LENGTH_TABLE.astype(np.float64)
        with np.errstate(divide="ignore"):
            table = (1.0 / np.sqrt(dl)).astype(np.float32)  # lengthNorm
        table[dl == 0] = np.float32(0.0)
        return table

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf):
        weight = np.float32(boost) * self.idf(doc_freq, doc_count)
        return _TableLeaf(weight, self._table())

    def leaf_scorer_from_weight(self, weight, doc_count, sum_ttf):
        return _TableLeaf(np.float32(weight), self._table())


class BooleanSimilarity(Similarity):
    name = "boolean"

    def idf(self, doc_freq, doc_count):
        return np.float32(1.0)

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf):
        return _ConstLeaf(np.float32(boost))

    def leaf_scorer_from_weight(self, weight, doc_count, sum_ttf):
        return _ConstLeaf(np.float32(weight))


def resolve(similarity) -> Similarity:
    if isinstance(similarity, Similarity):
        return similarity
    return {
        "bm25": BM25Similarity,
        "classic": ClassicSimilarity,
        "boolean": BooleanSimilarity,
    }[similarity]()
