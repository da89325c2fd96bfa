"""Pluggable Similarity families (the reference's ``search/similarities/``).

Lucene ships ten similarity families behind one SimScorer contract
(``Similarity.java:92,152``: ``score(freq, norm)`` from per-term collection
stats).  All ten families are implemented, each with strict float32
parity and a vectorized numpy kernel usable inside Arrow UDFs (and inside
the block-max WAND kernel — every shipped scorer is freq/length-monotone,
so the impact-frontier bounds hold; see ``Similarity.supports_wand``):

* :class:`BM25Similarity` — ``BM25Similarity.java`` (the default; delegates
  to :mod:`lucene_spark.search.bm25`),
* :class:`ClassicSimilarity` — TF-IDF (``ClassicSimilarity.java`` /
  ``TFIDFSimilarity.java``): ``idf = (float)(ln((docCount+1)/(docFreq+1))+1)``,
  ``tf = (float) sqrt(freq)``, ``lengthNorm = (float)(1/sqrt(dl))`` via the
  shared SmallFloat length quantization; ``score = weight · tf · norm`` with
  per-operation float32 rounding,
* :class:`BooleanSimilarity` — ``BooleanSimilarity.java``: score = boost,
* :class:`LMDirichletSimilarity` — ``LMDirichletSimilarity.java:76-82``:
  Dirichlet-smoothed language model with p(t|C) from
  ``LMSimilarity.DefaultCollectionModel``.

Others (DFR, IB, …) plug in through the same
``leaf_scorer(boost, doc_freq, doc_count, sum_ttf, total_term_freq)``
contract.
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
    # True for scorers non-decreasing in freq and non-increasing in doc
    # length: the block-max WAND kernel's impact-frontier upper bounds are
    # valid for exactly this class (MaxScoreCache.java:72-93 makes the same
    # assumption — impacts pareto-dominate the block's (freq, norm) pairs).
    # All ten shipped families qualify; a custom non-monotone similarity
    # must leave this False to stay on the flat path.
    supports_wand = False

    def idf(self, doc_freq: int, doc_count: int) -> np.float32:
        raise NotImplementedError

    def leaf_scorer(
        self, boost: float, doc_freq: int, doc_count: int, sum_ttf: int,
        total_term_freq: int | None = None,
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

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        sc = bm25.BM25Scorer(doc_freq, doc_count, sum_ttf, boost=boost, k1=self.k1, b=self.b)
        return _BM25Leaf(sc.weight, sc.cache)

    def leaf_scorer_from_weight(self, weight, doc_count, sum_ttf):
        cache = bm25.norm_inverse_cache(bm25.avgdl(sum_ttf, doc_count), self.k1, self.b)
        return _BM25Leaf(np.float32(weight), cache)


class ClassicSimilarity(Similarity):
    name = "classic"
    supports_wand = True

    def idf(self, doc_freq, doc_count):
        # (float)(Math.log((docCount + 1) / (double)(docFreq + 1)) + 1.0)
        return np.float32(math.log((doc_count + 1) / float(doc_freq + 1)) + 1.0)

    def _table(self) -> np.ndarray:
        dl = LENGTH_TABLE.astype(np.float64)
        with np.errstate(divide="ignore"):
            table = (1.0 / np.sqrt(dl)).astype(np.float32)  # lengthNorm
        table[dl == 0] = np.float32(0.0)
        return table

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        weight = np.float32(boost) * self.idf(doc_freq, doc_count)
        return _TableLeaf(weight, self._table())

    def leaf_scorer_from_weight(self, weight, doc_count, sum_ttf):
        return _TableLeaf(np.float32(weight), self._table())


@dataclass
class _SweetSpotLeaf(LeafScorer):
    """weight · baselineTf(freq) · plateauNorm[norm] in stepwise float32
    (``misc/SweetSpotSimilarity.java:128-147``: tf delegates to baselineTf;
    0 → 0, freq ≤ tf_min → tf_base, else (float)sqrt(freq + tf_base² −
    tf_min) — the float sum feeds a double sqrt, cast back to float)."""

    weight: np.float32
    table: np.ndarray  # float32[256] plateau lengthNorm per norm byte
    tf_base: np.float32
    tf_min: np.float32

    def score(self, freq, norm_bytes):
        f = np.asarray(freq, dtype=np.float32)
        b2 = self.tf_base * self.tf_base  # float32 multiply, as in Java
        inner = (f + b2) - self.tf_min
        tf = np.sqrt(inner.astype(np.float64)).astype(np.float32)
        tf = np.where(f <= self.tf_min, self.tf_base, tf)
        tf = np.where(f == np.float32(0.0), np.float32(0.0), tf)
        nrm = self.table[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return (self.weight * tf).astype(np.float32) * nrm


class SweetSpotSimilarity(ClassicSimilarity):
    """``misc/SweetSpotSimilarity.java``: ClassicSimilarity with a plateau
    lengthNorm — docs whose length sits inside [ln_min, ln_max] norm to 1,
    lengths outside decay as 1/sqrt(steepness·2·distance + 1) (:111-120) —
    and the baselineTf floor (:128-147).  Defaults degrade to Classic
    exactly (min=max=1, steepness=0.5, tf_base=tf_min=0 → 1/sqrt(len),
    sqrt(freq)).

    ``supports_wand`` stays False: the plateau is NOT monotone in doc
    length (shorter-than-min docs also score lower), so a block's minimum
    norm byte no longer upper-bounds its scores and the WAND impact
    frontier would be unsound — sweet-spot queries take the flat plan."""

    name = "sweetspot"
    supports_wand = False

    def __init__(
        self,
        ln_min: int = 1,
        ln_max: int = 1,
        steepness: float = 0.5,
        tf_base: float = 0.0,
        tf_min: float = 0.0,
    ):
        self.ln_min = int(ln_min)
        self.ln_max = int(ln_max)
        self.steepness = float(steepness)
        self.tf_base = np.float32(tf_base)
        self.tf_min = np.float32(tf_min)

    def _table(self) -> np.ndarray:
        # lengthNorm(numTerms) over the decoded quantized lengths:
        # (float)(1.0f / sqrt(s·(float)(|x−l|+|x−h|−(h−l)) + 1.0f))
        dl = LENGTH_TABLE.astype(np.int64)
        abssum = np.abs(dl - self.ln_min) + np.abs(dl - self.ln_max) - (
            self.ln_max - self.ln_min
        )
        inner = np.float32(self.steepness) * abssum.astype(np.float32) + np.float32(
            1.0
        )
        return (1.0 / np.sqrt(inner.astype(np.float64))).astype(np.float32)

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        weight = np.float32(boost) * self.idf(doc_freq, doc_count)
        return _SweetSpotLeaf(weight, self._table(), self.tf_base, self.tf_min)

    def leaf_scorer_from_weight(self, weight, doc_count, sum_ttf):
        return _SweetSpotLeaf(
            np.float32(weight), self._table(), self.tf_base, self.tf_min
        )


@dataclass
class _LMDirichletLeaf(LeafScorer):
    """score = (float) max(0, boost·(ln(1 + freq/(mu·p)) + ln(mu/(dl+mu))))
    — ``LMDirichletSimilarity.java:76-82`` with
    p = (ttf+1)/(sumTtf+1) (``LMSimilarity.DefaultCollectionModel:151-153``)
    and dl = float LENGTH_TABLE[norm] (``SimilarityBase.java:183-189``).

    All logs use scalar libm ``math.log`` (np.log drifts in the last double
    ULP vs libm ~30% of the time — see bm25.idf); the norm-log is a 256-
    entry table and freq-logs are memoized over the few distinct freqs.
    """

    boost: float
    mu: float
    p: float
    norm_log: np.ndarray  # float64[256] = ln(mu / (dl + mu))

    def score(self, freq, norm_bytes):
        f = np.asarray(freq, dtype=np.float64)
        uniq, inv = np.unique(f, return_inverse=True)
        logs = np.array(
            [math.log(1.0 + v / (self.mu * self.p)) for v in uniq.tolist()],
            dtype=np.float64,
        )
        freq_log = logs[inv]
        nl = self.norm_log[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        s = self.boost * (freq_log + nl)
        return np.maximum(s, 0.0).astype(np.float32)


class LMDirichletSimilarity(Similarity):
    name = "lmdirichlet"
    supports_wand = True

    def __init__(self, mu: float = 2000.0):
        self.mu = float(np.float32(mu))

    def idf(self, doc_freq, doc_count):  # not idf-based; unused by phrase path
        raise NotImplementedError("LMDirichlet has no idf; phrase path unsupported")

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        if total_term_freq is None:
            total_term_freq = doc_freq  # lower bound; callers should pass ttf
        p = (total_term_freq + 1.0) / (sum_ttf + 1.0)
        dl = LENGTH_TABLE.astype(np.float32).astype(np.float64)
        norm_log = np.array(
            [math.log(self.mu / (d + self.mu)) for d in dl.tolist()], dtype=np.float64
        )
        return _LMDirichletLeaf(float(boost), self.mu, p, norm_log)


_LOG2 = math.log(2.0)


@dataclass
class _PairMemoLeaf(LeafScorer):
    """SimilarityBase.BasicSimScorer: double-precision ``score(stats, freq,
    dl)`` cast to float32 at the end (``SimilarityBase.java:176-191``).
    Scores are memoized over distinct (freq, norm) pairs — scalar libm
    ``math.log`` everywhere, so the DuckDB ``ln`` oracle is bit-identical
    (vectorized np.log drifts in the last double ULP)."""

    fn: object  # scalar (freq: float, dl: float) -> float, double math

    def score(self, freq, norm_bytes):
        f = np.asarray(freq, dtype=np.float64)
        nb = np.asarray(norm_bytes, dtype=np.int64) & 0xFF
        dl = LENGTH_TABLE.astype(np.float64)
        # evaluate the scalar fn once per DISTINCT (freq, norm) pair and
        # scatter — the Python loop is O(distinct pairs), bounded by
        # 256 · |distinct freqs|, never O(rows) (kernel-hot path)
        # key = f32 bit pattern (inputs are float32 freqs — lossless) ⊕ norm
        fbits = np.asarray(freq, dtype=np.float32).view(np.int32).astype(np.int64)
        key = (fbits << np.int64(8)) | nb
        uk, first_idx, inv = np.unique(key, return_index=True, return_inverse=True)
        fn = self.fn
        vals = np.empty(len(uk), dtype=np.float64)
        for j, i0 in enumerate(first_idx):
            vals[j] = fn(float(f[i0]), float(dl[int(nb[i0])]))
        return vals[inv].astype(np.float32)


class DFRSimilarity(Similarity):
    """DFR G·B·H2 (``DFRSimilarity.java:127-131`` with ``BasicModelG.java:
    36-51``, ``AfterEffectB.java:32-36``, ``NormalizationH2.java:57-59``):

        tfn  = freq · log2(1 + c·avgdl/dl)
        ae1p = (ttf + 2) / (df + 1)
        λ    = (ttf + 1) / (N + ttf + 1)
        A, B = log2(λ + 1), log2((1 + λ)/λ)
        score = (float)(boost · (B − (B − A)/(1 + tfn)) · ae1p)
    """

    name = "dfr"
    supports_wand = True

    def __init__(self, c: float = 1.0):
        self.c = float(np.float32(c))

    def idf(self, doc_freq, doc_count):
        raise NotImplementedError("DFR has no idf; phrase path unsupported")

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        if total_term_freq is None:
            total_term_freq = doc_freq
        avgdl = sum_ttf / float(doc_count)  # double (SimilarityBase.java:88)
        F = total_term_freq + 1.0
        ae1p = (F + 1.0) / (doc_freq + 1.0)
        lam = F / (doc_count + F)
        A = math.log(lam + 1.0) / _LOG2
        B = math.log((1.0 + lam) / lam) / _LOG2
        c = self.c
        bst = float(boost)

        def fn(freq: float, dl: float) -> float:
            tfn = freq * (math.log(1.0 + c * avgdl / dl) / _LOG2)
            return bst * (B - (B - A) / (1.0 + tfn)) * ae1p

        return _PairMemoLeaf(fn)


class LMJelinekMercerSimilarity(Similarity):
    """``LMJelinekMercerSimilarity.java:68-74``: score = (float)(boost ·
    ln(1 + ((1−λ)·freq/dl) / (λ·p))) with λ a float32 parameter and
    p = (ttf+1)/(sumTtf+1) (``LMSimilarity.DefaultCollectionModel``)."""

    name = "lmjm"
    supports_wand = True

    def __init__(self, lam: float = 0.7):
        self.lam = float(np.float32(lam))  # float field widened into double math

    def idf(self, doc_freq, doc_count):
        raise NotImplementedError("LMJM has no idf; phrase path unsupported")

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        if total_term_freq is None:
            total_term_freq = doc_freq
        p = (total_term_freq + 1.0) / (sum_ttf + 1.0)
        lam = self.lam
        bst = float(boost)

        def fn(freq: float, dl: float) -> float:
            return bst * math.log(1.0 + ((1.0 - lam) * freq / dl) / (lam * p))

        return _PairMemoLeaf(fn)


class IBSimilarity(Similarity):
    """IB LL·DF·H2 (``IBSimilarity.java:114-119`` with ``DistributionLL.java:
    33-35``, ``LambdaDF.java:31-38`` incl. the nextDown(1f) guard,
    ``NormalizationH2.java:57-59``): score = (float)(boost ·
    −ln(λ/(tfn + λ))), λ = (float)((df+1)/(N+1))."""

    name = "ib"
    supports_wand = True

    def __init__(self, c: float = 1.0):
        self.c = float(np.float32(c))

    def idf(self, doc_freq, doc_count):
        raise NotImplementedError("IB has no idf; phrase path unsupported")

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        avgdl = sum_ttf / float(doc_count)
        lam32 = np.float32((doc_freq + 1.0) / (doc_count + 1.0))
        if lam32 == np.float32(1.0):  # LambdaDF.java:33-36
            lam32 = np.nextafter(lam32, np.float32(0.0))
        lam = float(lam32)
        c = self.c
        bst = float(boost)

        def fn(freq: float, dl: float) -> float:
            tfn = freq * (math.log(1.0 + c * avgdl / dl) / _LOG2)
            return bst * -math.log(lam / (tfn + lam))

        return _PairMemoLeaf(fn)


class DFISimilarity(Similarity):
    """Divergence-from-independence with the ChiSquared measure
    (``DFISimilarity.java:70-81``, ``IndependenceChiSquared.java:33-36``):

        expected = (ttf + 1) · dl / (sumTtf + 1)
        score    = 0                    if freq <= expected
                 = (float)(boost · log2((freq − expected)²/expected + 1))
    """

    name = "dfi"
    supports_wand = True

    def idf(self, doc_freq, doc_count):
        raise NotImplementedError("DFI has no idf; phrase path unsupported")

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        if total_term_freq is None:
            total_term_freq = doc_freq
        ttf1 = total_term_freq + 1
        sttf1 = sum_ttf + 1
        bst = float(boost)

        def fn(freq: float, dl: float) -> float:
            expected = ttf1 * dl / sttf1
            if freq <= expected:
                return 0.0
            measure = (freq - expected) * (freq - expected) / expected
            return bst * (math.log(measure + 1.0) / _LOG2)

        return _PairMemoLeaf(fn)


class AxiomaticF2EXP(Similarity):
    """Axiomatic F2EXP (``AxiomaticF2EXP.java:58-86``, base combination
    ``Axiomatic.java:106-116``): score = (float) max(0, boost ·
    freq/(freq + s + s·dl/avgdl) · ((N+1)/df)^k) with float32 parameters
    s=0.25, k=0.35 widened into the double math."""

    name = "f2exp"
    supports_wand = True

    def __init__(self, s: float = 0.25, k: float = 0.35):
        self.s = float(np.float32(s))
        self.k = float(np.float32(k))

    def idf(self, doc_freq, doc_count):
        raise NotImplementedError("Axiomatic has no idf; phrase path unsupported")

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        avgdl = sum_ttf / float(doc_count)
        idf = math.pow((doc_count + 1.0) / doc_freq, self.k)
        s = self.s
        bst = float(boost)

        def fn(freq: float, dl: float) -> float:
            tfln = freq / (freq + s + s * dl / avgdl)
            return max(0.0, tfln * idf * bst)

        return _PairMemoLeaf(fn)


@dataclass
class _MultiLeaf(LeafScorer):
    """MultiSimilarity.MultiSimScorer: float32 sub-scores summed in double,
    cast float (``MultiSimilarity.java:64-70``)."""

    subs: list

    def score(self, freq, norm_bytes):
        acc = np.zeros(len(np.asarray(freq)), dtype=np.float64)
        for leaf in self.subs:
            acc += leaf.score(freq, norm_bytes).astype(np.float64)
        return acc.astype(np.float32)


class MultiSimilarity(Similarity):
    """``MultiSimilarity.java``: sums the scores of its sub-similarities
    (norms come from the first one — all ours share the SmallFloat norm)."""

    name = "multi"
    supports_wand = True

    def __init__(self, sims):
        self.sims = [resolve(s) for s in sims]

    def idf(self, doc_freq, doc_count):
        raise NotImplementedError("Multi has no single idf; phrase unsupported")

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        return _MultiLeaf(
            [
                s.leaf_scorer(boost, doc_freq, doc_count, sum_ttf, total_term_freq)
                for s in self.sims
            ]
        )


class BooleanSimilarity(Similarity):
    name = "boolean"
    supports_wand = True

    def idf(self, doc_freq, doc_count):
        return np.float32(1.0)

    def leaf_scorer(self, boost, doc_freq, doc_count, sum_ttf, total_term_freq=None):
        return _ConstLeaf(np.float32(boost))

    def leaf_scorer_from_weight(self, weight, doc_count, sum_ttf):
        return _ConstLeaf(np.float32(weight))


def resolve(similarity) -> Similarity:
    if isinstance(similarity, Similarity):
        return similarity
    return {
        "bm25": BM25Similarity,
        "classic": ClassicSimilarity,
        "sweetspot": SweetSpotSimilarity,
        "boolean": BooleanSimilarity,
        "lmdirichlet": LMDirichletSimilarity,
        "dfr": DFRSimilarity,
        "lmjm": LMJelinekMercerSimilarity,
        "ib": IBSimilarity,
        "dfi": DFISimilarity,
        "f2exp": AxiomaticF2EXP,
    }[similarity]()
