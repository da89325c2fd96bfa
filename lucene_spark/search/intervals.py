"""Minimal intervals subset: ordered / unordered two-term NEAR queries.

Re-expression of the reference's intervals query family
(``queries/intervals/``): :func:`interval_near_topk` is
``IntervalQuery(field, Intervals.maxwidth(w, Intervals.ordered(a, b)))``
(or ``Intervals.unordered``) over the positional postings table.

Semantics implemented (two single-term sub-sources):

* **minimal ordered intervals** (``OrderedIntervalsSource.java:101-185``,
  ``MinimizingConjunctionIntervalsSource``): the pairs ``(s, e)`` with
  ``s`` an A-position, ``e = min{B > s}``, and no other A-position inside
  ``(s, e)`` — i.e. per distinct ``e`` keep the largest ``s``,
* **minimal unordered intervals** (``UnorderedIntervalsSource``): adjacent
  opposite-term pairs in the merged position sequence (any pair with
  another A/B position strictly inside contains a smaller valid interval),
* **width filter** (``Intervals.maxwidth`` → ``FilteredIntervalsSource``):
  keep intervals with ``end - start + 1 <= max_width``,
* **scoring** (``IntervalScorer.java:59-68``): per doc,
  ``freq = (float)(freq + 1.0 / max(length - minExtent + 1, 1))`` over the
  kept intervals in emission order (double division added into a float32
  accumulator — Java compound assignment), ``minExtent = 2`` for a
  two-term source, then the saturation score function
  (``IntervalScoreFunction.java:66-74``):
  ``score = boost * (1f - pivot / (pivot + freq))`` in float32
  (``IntervalQuery`` defaults ``pivot = 1``).

The plan is the positional-verify shape: per-term position arrays join on
doc_id (postings-sized, never corpus-sized — norms are not needed, the
score depends only on interval structure), one vectorized pandas UDF
computes the per-doc freq, and ``TakeOrderedAndProject`` does the
distributed top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.index.builder import IndexTables


def ordered_interval_lengths(
    pa: np.ndarray, pb: np.ndarray, max_width: int | None = None
) -> np.ndarray:
    """Lengths (end - start + 1) of the minimal ordered intervals [A...B],
    in emission (start ascending) order."""
    pa = np.asarray(pa, dtype=np.int64)
    pb = np.asarray(pb, dtype=np.int64)
    if len(pa) == 0 or len(pb) == 0:
        return np.array([], dtype=np.int64)
    idx = np.searchsorted(pb, pa, side="right")
    valid = idx < len(pb)
    s = pa[valid]
    e = pb[idx[valid]]
    if len(e) == 0:
        return np.array([], dtype=np.int64)
    # minimality: keep the LAST (largest) s per distinct e — s ascending
    # and e non-decreasing, so "last of each e-run" does it
    keep = np.concatenate([e[1:] != e[:-1], [True]])
    lengths = (e - s + 1)[keep]
    if max_width is not None:
        lengths = lengths[lengths <= max_width]
    return lengths


def unordered_interval_lengths(
    pa: np.ndarray, pb: np.ndarray, max_width: int | None = None
) -> np.ndarray:
    """Lengths of the minimal unordered intervals: adjacent opposite-term
    pairs of the merged position sequence."""
    pa = np.asarray(pa, dtype=np.int64)
    pb = np.asarray(pb, dtype=np.int64)
    if len(pa) == 0 or len(pb) == 0:
        return np.array([], dtype=np.int64)
    pos = np.concatenate([pa, pb])
    lab = np.concatenate([np.zeros(len(pa), np.int8), np.ones(len(pb), np.int8)])
    order = np.argsort(pos, kind="stable")
    pos, lab = pos[order], lab[order]
    adj = lab[1:] != lab[:-1]
    lengths = (pos[1:] - pos[:-1] + 1)[adj]
    if max_width is not None:
        lengths = lengths[lengths <= max_width]
    return lengths


def interval_freq(lengths: np.ndarray, min_extent: int = 2) -> np.float32:
    """``IntervalScorer.ensureFreq``: float32 accumulator, double division
    (Java ``freq += 1.0 / Math.max(length - minExtent + 1, 1)``)."""
    freq = np.float32(0.0)
    for ln in lengths:
        freq = np.float32(
            np.float64(freq) + 1.0 / max(int(ln) - min_extent + 1, 1)
        )
    return freq


def interval_near_topk(
    idx: IndexTables,
    term_a: str,
    term_b: str,
    k: int = 10,
    max_width: int | None = None,
    ordered: bool = True,
    field: str = "text",
    pivot: float = 1.0,
    boost: float = 1.0,
) -> DataFrame:
    """Top-k docs for ``IntervalQuery(maxwidth(w, ordered/unordered(a, b)))``.

    Returns (doc_id, score float, rank int) — saturation-scored interval
    frequency, ties broken by doc_id ascending (TopDocs order).
    """
    if idx.positions is None:
        raise ValueError("interval queries need a positional index")
    pos = idx.positions.filter(F.col("field") == field)
    pa = pos.filter(F.col("term") == term_a).select(
        "doc_id", F.col("positions").alias("_pa")
    )
    pb = pos.filter(F.col("term") == term_b).select(
        "doc_id", F.col("positions").alias("_pb")
    )
    joined = pa.join(pb, "doc_id")

    lengths_of = ordered_interval_lengths if ordered else unordered_interval_lengths
    mw = max_width
    p32 = np.float32(pivot)
    b32 = np.float32(boost)

    @F.pandas_udf(T.FloatType())
    def sat_score(a_col: pd.Series, b_col: pd.Series) -> pd.Series:
        out = np.zeros(len(a_col), dtype=np.float32)
        for r in range(len(a_col)):
            lens = lengths_of(
                np.asarray(a_col[r], dtype=np.int64),
                np.asarray(b_col[r], dtype=np.int64),
                mw,
            )
            fr = interval_freq(lens)
            if fr > 0:
                out[r] = b32 * (np.float32(1.0) - p32 / (p32 + fr))
        return pd.Series(out, dtype="float32")

    scored = (
        joined.withColumn("score", sat_score(F.col("_pa"), F.col("_pb")))
        .filter(F.col("score") > 0)
        .select("doc_id", "score")
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return topk.withColumn("rank", w.cast("int"))
