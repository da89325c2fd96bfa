"""Block-max WAND top-k over the compressed block-postings table.

Distributed re-expression of the reference's dynamic-pruning search path
(``search/WANDScorer.java:57-213``, ``search/ImpactsDISI.java:28``,
``search/MaxScoreCache.java:72-93``, ``search/BooleanScorerSupplier.java:
130-246`` scorer selection, ``search/ReqExclScorer.java`` exclusion):

* each *segment* (contiguous global docID range — one index partition) is
  scored independently by a vectorized numpy kernel inside
  ``applyInPandas``; this mirrors Lucene's per-LeafSlice concurrent search
  (``IndexSearcher.java:341-430``), with Spark tasks as the slices,
* only the **query terms' blocks** are shuffled — norms travel inside the
  blocks (``norm_blob``), so query cost is proportional to posting size,
  never corpus size (and on the bucketed on-disk layout the scan itself is
  partition-pruned to the terms' buckets),
* the kernel accepts the full flat Boolean shape Lucene's
  ``BooleanScorerSupplier`` handles with WAND + ReqExcl: a list of
  *clauses*, each an OR-group of scored terms, marked required
  (MUST / FILTER — FILTER members carry weight 0 so they gate without
  scoring), optional (SHOULD, with ``minimumNumberShouldMatch``), or
  prohibited (MUST_NOT — pure doc-set exclusion, no score, no effect on
  upper bounds, which keeps pruning safe: exclusions only shrink the
  candidate set).  Buffered deletes enter the same way, as a per-query
  exclusion array (Lucene checks liveDocs inside the scorer),
* per segment the kernel runs *window-at-a-time* block-max WAND: docID
  space is partitioned into windows at every block boundary of every
  involved term; a window's score upper bound is the float32-rounded-up sum
  of the overlapping blocks' impact-frontier maxima (Lucene's
  ``getMaxScore``); windows are processed in descending bound order, so
  once the running k-th best score θ exceeds the next bound the loop
  terminates — remaining windows are provably non-competitive (skip only
  when upper < θ strictly; ties still checked for the docID tie-break,
  ``TopScoreDocCollector.java:26-28``).  Windows failing required-coverage
  or optional-coverage < msm are dead a priori,
* per-segment top-k rows are reduced by a global
  ``ORDER BY score DESC, doc_id ASC LIMIT k`` (``TopDocs.merge`` semantics,
  ``search/TopDocs.java:278-360``).

Exactness: block upper bounds are computed with the *same* float32 BM25
kernel as real scores over the impact frontier; per-clause scores are
float32 casts of double sums of member float32 leaf scores, and the final
doc score is the float32 cast of the double sum of clause scores — exactly
the flat DataFrame plan's arithmetic (ConjunctionScorer.java:57-63 /
DisjunctionSumScorer), so the WAND path returns bit-identical results to
the brute-force scorer (asserted by tests, the ``CheckHits`` pattern).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.index.codec import decode_block, decode_norms



@dataclass
class TermScorer:
    """Per-query-term SimScorer shipped to executors.

    ``leaf`` is any :class:`lucene_spark.search.similarities.LeafScorer` —
    the kernel is similarity-agnostic exactly the way Lucene's
    ``MaxScoreCache.java:72-93`` is: the block upper bound is the max of
    the REAL scorer over the impact frontier, which dominates every doc in
    the block for any scorer non-decreasing in freq and non-increasing in
    doc length (all ten shipped families are; the frontier pairs pareto-
    dominate every (freq, norm) in the block).  BM25 keeps its fast path;
    LM/DFR/IB/DFI/Axiomatic ride the same impacts.
    """

    term: str
    leaf: object  # LeafScorer: vectorized score(freq_f32, norm_bytes)->f32

    def score(self, freqs: np.ndarray, norms: np.ndarray) -> np.ndarray:
        return self.leaf.score(np.asarray(freqs, dtype=np.float32), norms)

    def upper(self, impacts) -> np.float32:
        """Max score over the block's impact frontier (MaxScoreCache.java:72-93)."""
        fr = np.array([p["freq"] for p in impacts], dtype=np.float32)
        nm = np.array([p["norm"] for p in impacts], dtype=np.int64)
        return np.float32(self.score(fr, nm).max())


def block_uppers(scorer: "TermScorer", impacts_list) -> np.ndarray:
    """Per-block impact-frontier maxima for a whole term group at once.

    Equivalent to ``[scorer.upper(imp) for imp in impacts_list]`` but with
    ONE vectorized leaf-scorer call over the concatenated frontiers and a
    segmented max (``np.maximum.reduceat``) — the round-3 per-block Python
    loop showed up as the WAND single-term latency drift (VERDICT r3 §perf);
    hot terms have hundreds of blocks per segment and each ``upper`` call
    paid array-allocation + scorer-dispatch overhead.
    """
    counts = np.fromiter(
        (len(x) for x in impacts_list), dtype=np.int64, count=len(impacts_list)
    )
    fr = np.array(
        [p["freq"] for x in impacts_list for p in x], dtype=np.float32
    )
    nm = np.array(
        [p["norm"] for x in impacts_list for p in x], dtype=np.int64
    )
    if len(fr) == 0:
        return np.array([], dtype=np.float32)
    scores = scorer.score(fr, nm).astype(np.float32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.maximum.reduceat(scores, offsets).astype(np.float32)


def bm25_term_scorer(term: str, weight: np.float32, cache: np.ndarray) -> TermScorer:
    """Convenience constructor for the classic BM25 kernel entry points."""
    from lucene_spark.search.similarities import _BM25Leaf

    return TermScorer(term, _BM25Leaf(np.float32(weight), cache))


# A clause is ("must" | "should", [TermScorer, ...]) — an OR-group that
# matches a doc when ANY member matches and scores the float32 cast of the
# double sum of member scores — or ("not", [term, ...]) for pure exclusion.
Clause = tuple


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


_EMPTY = (np.array([], dtype=np.int64), np.array([], dtype=np.float32))


def segment_wand_topk_boolean(
    pdf: pd.DataFrame,
    clauses: list[Clause],
    msm: int,
    k: int,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k of one segment's blocks for a flat Boolean of term groups.

    ``pdf`` columns: term, block_id, first_doc, last_doc, num_docs,
    doc_blob, freq_blob, norm_blob, impacts.  Returns (doc_ids, scores_f32).
    """
    by_term: dict[str, pd.DataFrame] = {
        t: g.sort_values("block_id") for t, g in pdf.groupby("term")
    }

    # Segment-local clause resolution: drop absent members; a required
    # clause with no member present can match nothing in this segment.
    req: list[list[TermScorer]] = []
    opt: list[list[TermScorer]] = []
    proh_terms: list[str] = []
    for occ, members in clauses:
        if occ == "not":
            proh_terms.extend(t for t in members if t in by_term)
            continue
        present = [s for s in members if s.term in by_term]
        if occ == "must":
            if not present:
                return _EMPTY
            req.append(present)
        elif present:
            opt.append(present)
    need_opt = msm if req else max(1, msm)
    if not req and not opt:
        return _EMPTY
    if need_opt > len(opt):
        return _EMPTY

    # distinct involved terms → block ranges (+ member upper bounds)
    term_list = sorted(
        {s.term for c in req + opt for s in c} | set(proh_terms)
    )
    t_idx = {t: i for i, t in enumerate(term_list)}
    firsts, lasts, groups = [], [], []
    for t in term_list:
        g = by_term[t]
        firsts.append(g["first_doc"].to_numpy(dtype=np.int64))
        lasts.append(g["last_doc"].to_numpy(dtype=np.int64))
        groups.append(g)

    # windows: docID space cut at every block boundary of every term, so a
    # window overlaps at most ONE block per term
    bounds = np.unique(np.concatenate(firsts + [arr + 1 for arr in lasts]))
    w_start = bounds[:-1]
    n_win = len(w_start)
    if n_win == 0:
        return _EMPTY

    # per term, per window: overlapping block index (or -1)
    blk_of = np.full((len(term_list), n_win), -1, dtype=np.int64)
    for ti in range(len(term_list)):
        idx = np.searchsorted(firsts[ti], w_start, side="right") - 1
        ok = (idx >= 0) & (w_start <= lasts[ti][np.clip(idx, 0, None)])
        blk_of[ti, ok] = idx[ok]

    # Window upper bounds mirror the score arithmetic's rounding structure
    # exactly: per clause, member block uppers (float32 values, held in
    # float64) are summed in float64 — EXACT, since float32 addends need
    # ≤ 24+log2(k) significand bits — then cast to float32 (the clause-level
    # cast of the flat plan); clause uppers are summed in float64 (exact
    # again) and cast to float32.  Because float32 rounding is monotone and
    # every doc's clause score ≤ its clause upper componentwise, the doc's
    # final float32 score ≤ this bound — no ULP bump needed, and the bound
    # stays valid for multi-member clauses (whose own f32 cast could
    # otherwise round a hair above a raw member-sum bound).
    w_upper = np.zeros(n_win, dtype=np.float64)
    for c in req + opt:
        clause_upper = np.zeros(n_win, dtype=np.float64)
        for s in c:
            ti = t_idx[s.term]
            mu = block_uppers(s, list(groups[ti]["impacts"])).astype(np.float64)
            cov = blk_of[ti] >= 0
            clause_upper[cov] += mu[blk_of[ti, cov]]
        w_upper += clause_upper.astype(np.float32).astype(np.float64)

    # clause coverage per window: required all covered; optional count >= need
    def _cov(members: list[TermScorer]) -> np.ndarray:
        m = np.zeros(n_win, dtype=bool)
        for s in members:
            m |= blk_of[t_idx[s.term]] >= 0
        return m

    live = np.ones(n_win, dtype=bool)
    for c in req:
        live &= _cov(c)
    if need_opt > 0 and opt:
        opt_cover = np.zeros(n_win, dtype=np.int64)
        for c in opt:
            opt_cover += _cov(c)
        live &= opt_cover >= need_opt

    # final float32 view (monotone rounding of the double sum of clause
    # uppers ⇒ an over-estimate, WANDScorer.java:90-120 rule).  One extra
    # ULP guards the residual case where the double accumulations round in
    # different orders on the score and bound sides (clause-score exponent
    # spreads beyond 2^28 make f64 addition inexact by sub-f32-ulp amounts).
    w_bound = np.nextafter(
        w_upper.astype(np.float32), np.float32(np.inf)
    )

    order = np.argsort(-w_bound[live], kind="stable")
    w_ids = np.flatnonzero(live)[order]

    top_s = np.array([], dtype=np.float32)
    top_d = np.array([], dtype=np.int64)
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def _block(ti: int, bi: int):
        key = (ti, bi)
        if key not in decoded:
            row = groups[ti].iloc[bi]
            d, f = decode_block(
                int(row["first_doc"]), int(row["num_docs"]),
                row["doc_blob"], row["freq_blob"],
            )
            nm = decode_norms(row["norm_blob"])
            decoded[key] = (d, f, nm)
        return decoded[key]

    def _clause_eval(members: list[TermScorer], wi: int, lo: int, hi: int):
        """(sorted docs, float32 clause scores) within the window, or None."""
        ds, ss = [], []
        for s in members:
            ti = t_idx[s.term]
            bi = int(blk_of[ti, wi])
            if bi < 0:
                continue
            d, f, nm = _block(ti, bi)
            sel = (d >= lo) & (d <= hi)
            if sel.any():
                ds.append(d[sel])
                ss.append(
                    s.score(f[sel].astype(np.float32), nm[sel]).astype(np.float64)
                )
        if not ds:
            return None
        alld = np.concatenate(ds)
        alls = np.concatenate(ss)
        uniq, inv = np.unique(alld, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, alls)
        # clause output = float32 (the flat plan casts every sub-Boolean's
        # score column to float before the parent combines it)
        return uniq, sums.astype(np.float32)

    for wi in w_ids:
        if w_bound[wi] < _theta(top_s, k):  # strict: ties still checked
            break  # windows sorted by bound desc ⇒ all remaining are pruned
        lo, hi = int(w_start[wi]), int(bounds[wi + 1] - 1)

        # required clauses: intersect doc sets, sum clause scores in double
        base_d = base_s = None
        dead = False
        for c in req:
            out = _clause_eval(c, wi, lo, hi)
            if out is None:
                dead = True
                break
            cd, cs = out
            if base_d is None:
                base_d, base_s = cd, cs.astype(np.float64)
            else:
                idx = np.searchsorted(cd, base_d)
                idx_c = np.clip(idx, 0, len(cd) - 1)
                ok = (idx < len(cd)) & (cd[idx_c] == base_d)
                base_d = base_d[ok]
                base_s = base_s[ok] + cs[idx_c[ok]].astype(np.float64)
            if len(base_d) == 0:
                dead = True
                break
        if dead:
            continue

        # optional clauses: per-doc sum + matched-clause count
        opt_d = opt_s = opt_c = None
        if opt:
            ds, ss = [], []
            for c in opt:
                out = _clause_eval(c, wi, lo, hi)
                if out is None:
                    continue
                cd, cs = out
                ds.append(cd)
                ss.append(cs.astype(np.float64))
            if ds:
                alld = np.concatenate(ds)
                alls = np.concatenate(ss)
                opt_d, inv, opt_c = np.unique(
                    alld, return_inverse=True, return_counts=True
                )
                opt_s = np.zeros(len(opt_d), dtype=np.float64)
                np.add.at(opt_s, inv, alls)

        if req:
            if opt_d is not None:
                idx = np.searchsorted(opt_d, base_d)
                idx_c = np.clip(idx, 0, len(opt_d) - 1)
                ok = (idx < len(opt_d)) & (opt_d[idx_c] == base_d)
                add = np.zeros(len(base_d), dtype=np.float64)
                add[ok] = opt_s[idx_c[ok]]
                cnt = np.zeros(len(base_d), dtype=np.int64)
                cnt[ok] = opt_c[idx_c[ok]]
            else:
                add = np.zeros(len(base_d), dtype=np.float64)
                cnt = np.zeros(len(base_d), dtype=np.int64)
            if msm > 0:
                keep = cnt >= msm
                base_d = base_d[keep]
                final_s = (base_s[keep] + add[keep])
            else:
                final_s = base_s + add
            final_d = base_d
        else:
            if opt_d is None:
                continue
            keep = opt_c >= need_opt
            final_d = opt_d[keep]
            final_s = opt_s[keep]
        if len(final_d) == 0:
            continue

        # exclusions: prohibited clauses + buffered deletes (ReqExclScorer /
        # liveDocs) — applied after scoring, before the heap; they only
        # shrink the candidate set so pruning bounds stay safe
        for t in proh_terms:
            ti = t_idx[t]
            bi = int(blk_of[ti, wi])
            if bi < 0:
                continue
            d, _f, _nm = _block(ti, bi)
            sel = d[(d >= lo) & (d <= hi)]
            if len(sel):
                keep = ~np.isin(final_d, sel)
                final_d, final_s = final_d[keep], final_s[keep]
        if exclude is not None and len(exclude) and len(final_d):
            keep = ~np.isin(final_d, exclude)
            final_d, final_s = final_d[keep], final_s[keep]
        if len(final_d) == 0:
            continue

        # per-doc: clause float32 scores summed in double, cast to float32
        top_s, top_d = _topk_update(
            top_s, top_d, final_s.astype(np.float32), final_d, k
        )

    return top_d, top_s


def segment_wand_topk(
    pdf: pd.DataFrame, scorers: list[TermScorer], k: int, mode: str
) -> tuple[np.ndarray, np.ndarray]:
    """Classic shapes: pure AND-of-terms / OR-of-terms (kept for the simple
    entry points and kernel fuzz tests; delegates to the Boolean kernel)."""
    if mode == "and":
        clauses = [("must", [s]) for s in scorers]
    else:
        clauses = [("should", [s]) for s in scorers]
    return segment_wand_topk_boolean(pdf, clauses, 0, k)


def wand_topk_boolean(
    blocks: DataFrame,
    clauses: list[Clause],
    msm: int,
    k: int,
    field: str = "text",
    exclude: np.ndarray | None = None,
) -> DataFrame:
    """Distributed Boolean block-max WAND: per-segment kernel + TopDocs-merge
    reduce.  Returns (doc_id long, score float) — un-ranked; caller applies
    the final ``ORDER BY score DESC, doc_id ASC LIMIT k``."""
    terms = sorted(
        {s.term for occ, ms in clauses if occ != "not" for s in ms}
        | {t for occ, ms in clauses if occ == "not" for t in ms}
    )
    q_blocks = blocks.filter((F.col("field") == field) & F.col("term").isin(terms))

    out_schema = "doc_id long, score float"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        d, s = segment_wand_topk_boolean(pdf, clauses, msm, k, exclude)
        return pd.DataFrame({"doc_id": d, "score": s.astype(np.float32)})

    per_seg = q_blocks.groupBy("segment").applyInPandas(
        lambda key, pdf: run(pdf), schema=out_schema
    )
    return per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_topk(
    blocks: DataFrame,
    scorers: list[TermScorer],
    k: int,
    mode: str = "or",
    field: str = "text",
) -> DataFrame:
    """Classic AND/OR entry point (see :func:`wand_topk_boolean`)."""
    if mode == "and":
        clauses = [("must", [s]) for s in scorers]
    else:
        clauses = [("should", [s]) for s in scorers]
    return wand_topk_boolean(blocks, clauses, 0, k, field=field)
