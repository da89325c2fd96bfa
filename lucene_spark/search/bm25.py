"""BM25 scoring math with Lucene float32 parity.

Reproduces, bit-for-bit in IEEE-754 single precision, the scoring pipeline
of the reference's ``BM25Similarity``
(``lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java``):

* ``idf = (float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))``
  — computed in double, cast to float32 (BM25Similarity.java:100-103).
* multi-term idf: per-term float32 idf values summed in double, cast to
  float32 (BM25Similarity.java:166-174).
* ``avgdl = (float)(sumTotalTermFreq / (double) docCount)``
  (BM25Similarity.java:106-108).
* 256-entry norm-inverse cache
  ``cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))``
  — all float32 ops (BM25Similarity.java:180-184).
* ``weight = boost * idf`` (float32, BM25Similarity.java:217).
* ``score = weight - weight / (1 + freq * cache[norm])`` — float32
  (BM25Similarity.java:221-233).

All functions are pure numpy (no Spark imports) so the identical code runs
in the driver, in Arrow UDFs, and in the brute-force oracle.  Keeping every
intermediate in explicit ``np.float32`` is what guarantees parity — pandas
silently promotes to float64, so arrays are used throughout.
"""

from __future__ import annotations

import math

import numpy as np

from lucene_spark.analysis.smallfloat import LENGTH_TABLE

__all__ = ["K1", "B", "idf", "avgdl", "norm_inverse_cache", "bm25_score", "BM25Scorer"]

K1 = 1.2
B = 0.75

# float32 view of the quantized-length decode table (BM25Similarity.java:106-113)
_LENGTH_TABLE_F32 = LENGTH_TABLE.astype(np.float32)


def idf(doc_freq, doc_count) -> np.ndarray:
    """float32 idf(s); doc_freq may be an array, doc_count a scalar."""
    df = np.asarray(doc_freq, dtype=np.float64)
    n = float(doc_count)
    # NOT log1p: Java evaluates 1 + x in double then log(), mirror exactly.
    # math.log (libm) — NOT np.log, whose vectorized implementation differs
    # from libm in the last double ULP for ~30% of inputs, which can flip the
    # float32 cast and break bit-parity with the DuckDB/Java oracle.
    x = 1.0 + (n - df + 0.5) / (df + 0.5)
    if x.ndim == 0:
        return np.float32(math.log(float(x)))
    return np.array([math.log(v) for v in x.ravel()], dtype=np.float32).reshape(x.shape)


def sum_idf(idfs) -> np.float32:
    """Multi-term weight: sum per-term float32 idfs in double, cast to f32."""
    return np.float32(np.sum(np.asarray(idfs, dtype=np.float32).astype(np.float64)))


def avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(avg_dl, k1: float = K1, b: float = B) -> np.ndarray:
    """The 256-entry ``1/(k1*((1-b)+b*dl/avgdl))`` cache, float32 ops only."""
    k1f = np.float32(k1)
    bf = np.float32(b)
    one = np.float32(1.0)
    dl_over_avg = _LENGTH_TABLE_F32 * bf / np.float32(avg_dl)
    return one / (k1f * ((one - bf) + dl_over_avg))


def bm25_score(freq, norm_bytes, weight, cache) -> np.ndarray:
    """score = weight - weight / (1 + freq * cache[norm]) in float32."""
    f = np.asarray(freq, dtype=np.float32)
    inv = cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
    w = np.float32(weight)
    return w - w / (np.float32(1.0) + f * inv)


class BM25Scorer:
    """Per-(query-term, field) scorer holding precomputed weight + cache.

    Equivalent of the reference's ``BM25Scorer`` SimScorer
    (BM25Similarity.java:190-233): constructed once per term from global
    collection stats, then applied vectorized to (freq, norm) arrays.
    """

    def __init__(
        self,
        doc_freq: int,
        doc_count: int,
        sum_total_term_freq: int,
        boost: float = 1.0,
        k1: float = K1,
        b: float = B,
    ):
        self.idf = np.float32(idf(doc_freq, doc_count))
        self.avgdl = avgdl(sum_total_term_freq, doc_count)
        self.cache = norm_inverse_cache(self.avgdl, k1, b)
        self.weight = np.float32(boost) * self.idf

    def score(self, freq, norm_bytes) -> np.ndarray:
        return bm25_score(freq, norm_bytes, self.weight, self.cache)

    def max_score(self, max_freq: int, min_norm_byte: int) -> np.float32:
        """Upper bound used by WAND block skipping (MaxScoreCache.java:72-93)."""
        return np.float32(
            bm25_score(
                np.array([max_freq], dtype=np.float32),
                np.array([min_norm_byte]),
                self.weight,
                self.cache,
            )[0]
        )
