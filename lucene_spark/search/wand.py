"""Block-max WAND top-k over the compressed block-postings table.

Distributed re-expression of the reference's dynamic-pruning search path
(``search/WANDScorer.java:57-213``, ``search/ImpactsDISI.java:28``,
``search/MaxScoreCache.java:72-93``):

* each *segment* (contiguous global docID range — one index partition) is
  scored independently by a vectorized numpy kernel inside
  ``applyInPandas``; this mirrors Lucene's per-LeafSlice concurrent search
  (``IndexSearcher.java:341-430``), with Spark tasks as the slices,
* only the **query terms' blocks** are shuffled — norms travel inside the
  blocks (``norm_blob``), so query cost is proportional to posting size,
  never corpus size,
* per segment the kernel runs *window-at-a-time* block-max WAND: docID space
  is partitioned into windows at block boundaries; a window's score upper
  bound is the sum (AND: sum, but only if every term overlaps) of the
  overlapping blocks' impact-frontier maxima (exactly Lucene's
  ``getMaxScore`` per block); windows are processed in descending
  upper-bound order, so once the running k-th best score θ exceeds the next
  window's bound the loop *terminates* — the remaining windows are provably
  non-competitive (the WAND invariant: skip only when upper < θ strictly,
  ties must still be checked for the docID-ascending tie-break,
  ``TopScoreDocCollector.java:26-28``),
* per-segment top-k rows are reduced by a global
  ``ORDER BY score DESC, doc_id ASC LIMIT k`` (``TopDocs.merge`` semantics,
  ``search/TopDocs.java:278-360``).

Exactness: block upper bounds are computed with the *same* float32 BM25
kernel as real scores over the impact frontier, so they are true maxima —
the WAND path returns bit-identical results to the brute-force scorer
(asserted by tests, the ``CheckHits`` pattern).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.index.codec import decode_block, decode_norms
from lucene_spark.search import bm25


@dataclass
class TermScorer:
    """Per-query-term float32 scorer constants, shipped to executors."""

    term: str
    weight: np.float32
    cache: np.ndarray  # 256-entry float32 norm-inverse cache

    def score(self, freqs: np.ndarray, norms: np.ndarray) -> np.ndarray:
        return bm25.bm25_score(freqs, norms, self.weight, self.cache)

    def upper(self, impacts) -> np.float32:
        """Max score over the block's impact frontier (MaxScoreCache.java:72-93)."""
        fr = np.array([p["freq"] for p in impacts], dtype=np.float32)
        nm = np.array([p["norm"] for p in impacts], dtype=np.int64)
        return np.float32(self.score(fr, nm).max())


def _topk_update(
    scores: np.ndarray, docs: np.ndarray, new_s: np.ndarray, new_d: np.ndarray, k: int
):
    """Merge candidates into the running top-k (score DESC, doc ASC)."""
    s = np.concatenate([scores, new_s])
    d = np.concatenate([docs, new_d])
    if len(s) > k:
        # lexsort on (-score, doc): top-k with Lucene tie-break
        order = np.lexsort((d, -s.astype(np.float64)))[:k]
        s, d = s[order], d[order]
    return s, d


def _theta(scores: np.ndarray, k: int) -> float:
    return float(scores.min()) if len(scores) >= k else -np.inf


def segment_wand_topk(
    pdf: pd.DataFrame, scorers: list[TermScorer], k: int, mode: str
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of one segment's blocks for an OR/AND of scored terms.

    ``pdf`` columns: term, block_id, first_doc, last_doc, num_docs,
    doc_blob, freq_blob, norm_blob, impacts.  Returns (doc_ids, scores_f32).
    """
    by_term: dict[str, pd.DataFrame] = {
        t: g.sort_values("block_id") for t, g in pdf.groupby("term")
    }
    present = [s for s in scorers if s.term in by_term]
    if not present or (mode == "and" and len(present) < len(scorers)):
        return np.array([], dtype=np.int64), np.array([], dtype=np.float32)
    scorers = present
    nterms = len(scorers)

    # per term: block ranges + impact-derived upper bounds
    firsts, lasts, uppers, groups = [], [], [], []
    for s in scorers:
        g = by_term[s.term]
        firsts.append(g["first_doc"].to_numpy(dtype=np.int64))
        lasts.append(g["last_doc"].to_numpy(dtype=np.int64))
        uppers.append(
            np.array([s.upper(imp) for imp in g["impacts"]], dtype=np.float64)
        )
        groups.append(g)

    # windows: docID space cut at every block boundary of every term
    bounds = np.unique(np.concatenate(firsts + [arr + 1 for arr in lasts]))
    w_start = bounds[:-1]
    n_win = len(w_start)
    if n_win == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float32)

    # per term, per window: index of the block overlapping the window (or -1)
    w_upper = np.zeros(n_win, dtype=np.float64)
    w_cover = np.zeros(n_win, dtype=np.int64)  # how many terms overlap
    blk_of = np.full((nterms, n_win), -1, dtype=np.int64)
    for ti in range(nterms):
        idx = np.searchsorted(firsts[ti], w_start, side="right") - 1
        ok = (idx >= 0) & (w_start <= lasts[ti][np.clip(idx, 0, None)])
        blk_of[ti, ok] = idx[ok]
        w_upper[ok] += uppers[ti][idx[ok]]
        w_cover[ok] += 1

    # ULP-safe float32 view of the bound: the true doc score is a double sum
    # cast to float32 (round-nearest, may round *up*); rounding the bound
    # toward +inf guarantees score <= bound always (the WANDScorer.java:90-120
    # "upper bounds must over-estimate" rule, float32 edition).
    w_bound = w_upper.astype(np.float32)
    bump = w_bound.astype(np.float64) < w_upper
    w_bound[bump] = np.nextafter(w_bound[bump], np.float32(np.inf))

    if mode == "and":
        live = w_cover == nterms
    else:
        live = w_cover > 0
    order = np.argsort(-w_bound[live], kind="stable")
    w_ids = np.flatnonzero(live)[order]

    top_s = np.array([], dtype=np.float32)
    top_d = np.array([], dtype=np.int64)
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    for wi in w_ids:
        if w_bound[wi] < _theta(top_s, k):  # strict: ties still checked
            break  # windows sorted by bound desc ⇒ all remaining are pruned
        lo, hi = w_start[wi], bounds[wi + 1] - 1
        cand_d, cand_s = [], []
        for ti, s in enumerate(scorers):
            bi = blk_of[ti, wi]
            if bi < 0:
                if mode == "and":
                    cand_d = []
                    break
                continue
            key = (ti, int(bi))
            if key not in decoded:
                row = groups[ti].iloc[int(bi)]
                d, f = decode_block(
                    int(row["first_doc"]), int(row["num_docs"]),
                    row["doc_blob"], row["freq_blob"],
                )
                nm = decode_norms(row["norm_blob"])
                decoded[key] = (d, f, nm)
            d, f, nm = decoded[key]
            sel = (d >= lo) & (d <= hi)
            if sel.any():
                cand_d.append(d[sel])
                cand_s.append(
                    s.score(f[sel].astype(np.float32), nm[sel]).astype(np.float64)
                )
            elif mode == "and":
                cand_d = []
                break
        if not cand_d:
            continue
        alld = np.concatenate(cand_d)
        alls = np.concatenate(cand_s)
        uniq, inv, counts = np.unique(alld, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, alls)
        if mode == "and":
            keep = counts == nterms
            uniq, sums = uniq[keep], sums[keep]
        if len(uniq) == 0:
            continue
        # per-doc: float32 leaf scores summed in double, cast to float32
        # (ConjunctionScorer.java:57-63 / DisjunctionSumScorer)
        top_s, top_d = _topk_update(top_s, top_d, sums.astype(np.float32), uniq, k)

    return top_d, top_s


def wand_topk(
    blocks: DataFrame,
    scorers: list[TermScorer],
    k: int,
    mode: str = "or",
    field: str = "text",
) -> DataFrame:
    """Distributed block-max WAND: per-segment kernel + TopDocs-merge reduce.

    Returns (doc_id long, score float) — un-ranked; caller applies the final
    ``ORDER BY score DESC, doc_id ASC LIMIT k``.
    """
    terms = [s.term for s in scorers]
    q_blocks = blocks.filter((F.col("field") == field) & F.col("term").isin(terms))

    out_schema = "doc_id long, score float"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        d, s = segment_wand_topk(pdf, scorers, k, mode)
        return pd.DataFrame({"doc_id": d, "score": s.astype(np.float32)})

    per_seg = q_blocks.groupBy("segment").applyInPandas(
        lambda key, pdf: run(pdf), schema=out_schema
    )
    return per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
