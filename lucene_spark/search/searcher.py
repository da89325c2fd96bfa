"""IndexSearcher: plans a Query tree into DataFrame operations.

Spark-first re-expression of the reference's search path
(``search/IndexSearcher.java:612-885``):

* rewrite to fixpoint (IndexSearcher.java:866-875) in Python — the query tree
  is tiny; Catalyst then optimizes the *generated* DataFrame plan,
* term stats resolved once per query from the broadcast-small stats tables
  (TermQuery.java:61-73, IndexSearcher.java:1140-1155) via a driver lookup —
  the Lucene equivalent of TermStates/CollectionStatistics resolution,
* leaf scoring is a vectorized Arrow UDF evaluating BM25 in strict float32
  (BM25Similarity.java:221-233); every leaf emits float32 scores,
* boolean combination follows BooleanScorerSupplier semantics: MUST = inner
  join on docID with scores summed in double then cast to float
  (ConjunctionScorer.java:57-63), SHOULD = union + groupBy-sum
  (DisjunctionSumScorer), MUST_NOT = anti join (ReqExclScorer), FILTER =
  semi join (BooleanClause.Occur.FILTER), minimumNumberShouldMatch = HAVING
  count >= m (BooleanQuery.java:130-167),
* top-k = ``ORDER BY score DESC, doc_id ASC LIMIT k`` — Spark's
  TakeOrderedAndProject *is* the distributed per-partition-heap + merge of
  TopScoreDocCollector/TopDocs.merge (tie-break parity:
  TopScoreDocCollector.java:26-28).

Multi-term queries (prefix/wildcard/regexp/fuzzy/range/set) rewrite against
the terms dictionary (= termstats table) with CONSTANT_SCORE semantics
(MultiTermQuery.java:80-128 CONSTANT_SCORE_REWRITE) — Spark LIKE/RLIKE/
levenshtein do the automaton's job.
"""

from __future__ import annotations

import re
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.index.builder import IndexTables
from lucene_spark.search import bm25
from lucene_spark.search.query import (
    BlendedTermQuery,
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    CoveringQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    KnnFloatVectorQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    collect_terms,
    rewrite_to_fixpoint,
)

MAX_CLAUSE_COUNT = 1024  # IndexSearcher.java:876-885


def _make_score_udf(weight: float, cache: np.ndarray):
    """Vectorized BM25 leaf scorer; captures the tiny per-term cache."""
    w = np.float32(weight)
    cache = np.asarray(cache, dtype=np.float32)

    @F.pandas_udf(T.FloatType())
    def score(freq: pd.Series, norm_byte: pd.Series) -> pd.Series:
        s = bm25.bm25_score(
            freq.to_numpy(dtype=np.float32), norm_byte.to_numpy(dtype=np.int64), w, cache
        )
        return pd.Series(s, dtype="float32")

    return score


def _make_leaf_udf(leaf):
    """Vectorized SimScorer UDF for any pluggable Similarity leaf."""

    @F.pandas_udf(T.FloatType())
    def score(freq: pd.Series, norm_byte: pd.Series) -> pd.Series:
        s = leaf.score(
            freq.to_numpy(dtype=np.float32), norm_byte.to_numpy(dtype=np.int64)
        )
        return pd.Series(s, dtype="float32")

    return score


def _levenshtein(a: str, b: str) -> int:
    """Classic Levenshtein (matches Spark's and DuckDB's ``levenshtein``;
    the transpositions=false FuzzyQuery variant)."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _osa_distance(a: str, b: str) -> int:
    """Optimal-string-alignment distance: Levenshtein + adjacent
    transposition as ONE edit — Lucene's transpositions=true fuzzy metric
    (the automaton's reference oracle, ``TestLevenshteinAutomata.
    getTDistance``; ``FuzzyQuery.java:82-91`` defaults transpositions on).
    At max_edits <= 1 this coincides with unrestricted Damerau-Levenshtein
    (DuckDB's ``damerau_levenshtein``), the envelope the oracle gates use.
    """
    if a == b:
        return 0
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return d[n][m]


def near_spans_ordered_freq(plists: list[np.ndarray], slop: int) -> np.float32:
    """Legacy ``NearSpansOrdered`` + ``SpanScorer`` sloppy freq, per doc.

    Enumeration (``spans/NearSpansOrdered.java:62-120``): every position of
    the FIRST term anchors one match attempt; ``stretchToOrder`` advances
    each later sub-span to the first position at/after the previous span's
    end (term spans: end = start + 1, so strictly after), accumulating
    ``matchWidth = Σ (start_i − end_{i−1})``; matches with width ≤ slop
    emit in anchor order.  Sub-spans never retreat — but the greedy
    earliest-after chain is monotone in the anchor, so per-anchor
    independent chaining is equivalent (and once a later stream exhausts
    for one anchor it is exhausted for every later anchor, matching the
    reference's early loop exit).  Unlike ``SloppyPhraseMatcher`` there is
    no repeat-group collision algebra: repeated terms are independent
    sub-spans over the same postings.

    Freq (``SpanScorer.java:112``): float32 running sum of
    ``1f/(1f + width)`` in emission order — the same fold convention as
    :func:`sloppy_phrase_freq`.
    """
    anchors = plists[0]
    n = len(anchors)
    if n == 0:
        return np.float32(0.0)
    prev_end = anchors + 1
    width = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    for lst in plists[1:]:
        if len(lst) == 0:
            return np.float32(0.0)
        j = np.searchsorted(lst, prev_end, side="left")
        alive &= j < len(lst)
        if not alive.any():
            return np.float32(0.0)
        j = np.minimum(j, len(lst) - 1)
        starts = lst[j]
        width = np.where(alive, width + starts - prev_end, width)
        prev_end = np.where(alive, starts + 1, prev_end)
    one = np.float32(1.0)
    freq = np.float32(0.0)
    for w in width[alive & (width <= slop)]:
        freq = freq + one / (one + np.float32(w))
    return freq


def sloppy_phrase_freq(
    plists: list[np.ndarray], slop: int, rpt_groups: tuple = ()
) -> np.float32:
    """Lucene ``SloppyPhraseMatcher`` + ``PhraseScorer`` float32 freq
    accumulation, per document — including the repeated-term case.

    ``plists[i]`` = sorted offset-shifted positions of phrase term i
    (``s = position - i``; the stream index IS the phrase offset and the
    ord).  ``rpt_groups`` lists, per repeated term, the stream indices that
    share it, ascending (``SloppyPhraseMatcher.gatherRptGroups`` for the
    single-term-per-position case: PPs of the same term always collide at
    first-positions, so the groups are exactly the terms with >= 2 phrase
    slots, sorted by offset — ``sortRptGroups``).

    Returns the sloppy freq (0.0 if no match): the float32 running sum of
    ``1f/(1f + matchLength)`` over matches in emission order
    (``PhraseScorer.java:85-95``).  The matcher is the pq leapfrog of
    ``SloppyPhraseMatcher.java:190-220`` — always advance the least stream;
    a match is emitted when it overtakes the next-least or exhausts, with
    matchLength minimized on the way and discarded when > slop — with the
    repeats algebra of ``SloppyPhraseMatcher.java:392-480``:

    * init (``advanceRepeatGroups``, no multi-term case): within a group
      sorted by offset, stream j starts advanced j positions, so no two
      streams of one term sit on the same token,
    * after any advance (``advanceRpts``): while the advanced stream
      *collides* with a group-mate (same actual doc position
      ``tpPos = s + offset``), advance the lesser of the two by
      (position, offset) — collisions chain through the rebound stream.

    The pq is a linear-scan min over the tiny stream set (phrase length)
    keyed (position, offset) — Lucene's comparator with ord folded in
    (offsets are unique here, so the ord tie-break never fires).
    """
    n = len(plists)
    if n == 0 or any(len(p) == 0 for p in plists):
        return np.float32(0.0)
    pls = [np.asarray(p, dtype=np.int64) for p in plists]
    ptr = [0] * n
    pos = [int(p[0]) for p in pls]
    end = -(1 << 62)

    grp_of = [-1] * n
    groups = [list(g) for g in rpt_groups]
    for gi, g in enumerate(groups):
        for i in g:
            grp_of[i] = gi

    def advance(i: int) -> bool:  # advancePP
        nonlocal end
        ptr[i] += 1
        if ptr[i] >= len(pls[i]):
            return False
        pos[i] = int(pls[i][ptr[i]])
        if pos[i] > end:
            end = pos[i]
        return True

    def collide(i: int) -> int:
        tpi = pos[i] + i  # tpPos: actual doc position (position + offset)
        for j in groups[grp_of[i]]:
            if j != i and pos[j] + j == tpi:
                return j
        return -1

    def advance_rpts(i: int) -> bool:
        if grp_of[i] < 0:
            return True
        cur = i
        while True:
            k = collide(cur)
            if k < 0:
                return True
            # advance the lesser of the two colliding streams (by
            # (position, offset)); collisions chain through it
            cur = cur if (pos[cur], cur) < (pos[k], k) else k
            if not advance(cur):
                return False

    # initComplex / advanceRepeatGroups: group stream j starts j ahead
    for g in groups:
        for j in range(1, len(g)):
            for _ in range(j):
                if not advance(g[j]):
                    return np.float32(0.0)  # PPs exhausted: no match
    for p in pos:  # fillQueue's end update
        if p > end:
            end = p

    in_queue = set(range(n))

    def pop_min() -> int:
        i = min(in_queue, key=lambda x: (pos[x], x))
        in_queue.remove(i)
        return i

    one = np.float32(1.0)
    freq = np.float32(0.0)
    matched = False

    cur = pop_min()
    match_len = end - pos[cur]
    nxt = min(pos[j] for j in in_queue)
    while True:
        if not advance(cur):
            break  # exhausted: fall through to the final match check
        if grp_of[cur] >= 0 and not advance_rpts(cur):
            break  # same ending as exhaustion (nextMatch's rpts break)
        if pos[cur] > nxt:  # done minimizing the current match length
            in_queue.add(cur)
            if match_len <= slop:
                freq = freq + one / (one + np.float32(match_len))
                matched = True
            cur = pop_min()
            match_len = end - pos[cur]
            nxt = min(pos[j] for j in in_queue)
        else:
            ml2 = end - pos[cur]
            if ml2 < match_len:
                match_len = ml2
    if match_len <= slop:  # positioned=false path still emits its match
        freq = freq + one / (one + np.float32(match_len))
        matched = True
    return freq if matched else np.float32(0.0)


def batch_near_spans_freqs(cols: list, slop: int) -> np.ndarray:
    """Vectorized-across-docs legacy ``NearSpansOrdered`` + ``SpanScorer``
    freqs, bit-identical to :func:`near_spans_ordered_freq` per doc.

    Same global-workspace chaining as the intervals kernel
    (``intervals.batch_ordered_freqs``) but WITHOUT the minimal-interval
    cut — the legacy enumeration keeps one match per first-term anchor —
    and with the SpanScorer fold ``1f/(1f + width)`` over
    ``width = Σ gaps = (last − first + 1) − k`` for term chains.  The
    reference's one-exhausted early exit is equivalent here: a chain that
    dies for anchor p also dies for every later anchor (sub-spans only
    move forward), so the dead chains the vectorized form drops are
    exactly the anchors the reference never tries.
    """
    k = len(cols)
    n = len(cols[0])
    out = np.zeros(n, dtype=np.float32)
    if n == 0:
        return out
    OFF = np.int64(1) << 40
    docs_of = []
    glob = []
    for c in cols:
        lists = [np.asarray(v, dtype=np.int64) for v in c]
        cnt = np.array([len(v) for v in lists], dtype=np.int64)
        if not cnt.sum():
            return out
        d = np.repeat(np.arange(n, dtype=np.int64), cnt)
        docs_of.append(d)
        glob.append(np.concatenate(lists) + d * OFF)
    S = glob[0]
    E = glob[0].copy()
    docs = docs_of[0]
    valid = np.ones(len(S), dtype=bool)
    for t in range(1, k):
        pt, dt = glob[t], docs_of[t]
        j = np.searchsorted(pt, E, side="right")
        valid &= j < len(pt)
        jj = np.minimum(j, len(pt) - 1)
        valid &= dt[jj] == docs
        E = pt[jj]
    S, E, docs = S[valid], E[valid], docs[valid]
    if len(E) == 0:
        return out
    widths = (E - S + 1) - k  # Σ gaps for single-term sub-spans
    m = widths <= slop
    widths, docs = widths[m], docs[m]
    if len(widths) == 0:
        return out
    # emission (anchor) order within each doc == array order; fold
    # rank-by-rank with the engine's f32 convention
    one = np.float32(1.0)
    terms = one / (one + widths.astype(np.float32))
    counts = np.bincount(docs, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(terms), dtype=np.int64) - starts[docs]
    order = np.argsort(rank, kind="stable")
    terms_o, docs_o, rank_o = terms[order], docs[order], rank[order]
    bounds = np.searchsorted(rank_o, np.arange(int(rank_o[-1]) + 2))
    for r in range(len(bounds) - 1):
        lo, hi = bounds[r], bounds[r + 1]
        if lo == hi:
            continue
        d = docs_o[lo:hi]
        out[d] = (out[d] + terms_o[lo:hi]).astype(np.float32)
    return out


def batch_sloppy_pair_freqs(a_col, b_col, slop: int) -> np.ndarray:
    """Vectorized-across-docs 2-term sloppy-phrase freqs, bit-identical to
    :func:`sloppy_phrase_freq` on two distinct-term streams.

    For two distinct terms the pq leapfrog reduces to the *leader chain*
    (the equivalence the oracle's recursive CTE rests on, fuzz-verified
    both there and here): the first leader is the larger of the two first
    shifted positions; each leader L from list X emits one match
    ``matchLength = L − max{other ≤ L}`` and hands off to
    ``min{other > L}``, alternating lists until exhaustion; matches with
    length ≤ slop fold ``1f/(1f+len)`` into a float32 freq in chain order.

    Vectorization: one state row per doc (leader, side, active) over
    doc-offset global arrays; every chain in the Arrow batch advances one
    link per loop iteration (two searchsorted calls), so the iteration
    count is the LONGEST chain, not the candidate count — the same
    across-docs batching as ``batch_near_freqs``, applied to the stateful
    leapfrog.
    """
    n = len(a_col)
    out = np.zeros(n, dtype=np.float32)
    if n == 0:
        return out
    al = [np.asarray(v, dtype=np.int64) for v in a_col]
    bl = [np.asarray(v, dtype=np.int64) for v in b_col]
    ca = np.array([len(v) for v in al], dtype=np.int64)
    cb = np.array([len(v) for v in bl], dtype=np.int64)
    active = (ca > 0) & (cb > 0)
    if not active.any():
        return out
    OFF = np.int64(1) << 40  # dominates any shifted position (can be -1)
    A = np.concatenate(al) + np.repeat(np.arange(n, dtype=np.int64), ca) * OFF
    B = np.concatenate(bl) + np.repeat(np.arange(n, dtype=np.int64), cb) * OFF
    eA = np.cumsum(ca)
    sA = eA - ca
    eB = np.cumsum(cb)
    sB = eB - cb

    leader = np.zeros(n, dtype=np.int64)
    side_a = np.zeros(n, dtype=bool)  # True: current leader is from A
    act_ids = np.nonzero(active)[0]
    ma = A[sA[act_ids]]
    mb = B[sB[act_ids]]
    leader[act_ids] = np.maximum(ma, mb)
    side_a[act_ids] = ma > mb  # tie → side b (the oracle's CASE order)

    matched = np.zeros(n, dtype=bool)
    one = np.float32(1.0)
    while active.any():
        # the OTHER list serves both the match length and the next leader
        for other, s_, e_, is_a in ((B, sB, eB, True), (A, sA, eA, False)):
            ids = np.nonzero(active & (side_a == is_a))[0]
            if ids.size == 0:
                continue
            l = leader[ids]
            jr = np.searchsorted(other, l, side="right")
            # max{other ≤ L} exists in-doc: the first leader is the max of
            # the two list minima, and every later leader exceeds an
            # element of the list it hands off from
            ml = l - other[jr - 1]
            ok = ml <= slop
            fold = one / (one + ml.astype(np.float32))
            out[ids] = np.where(
                ok, (out[ids] + fold).astype(np.float32), out[ids]
            )
            matched[ids] |= ok
            has_next = jr < e_[ids]
            nid = ids[has_next]
            leader[nid] = other[jr[has_next]]
            side_a[nid] = not is_a  # the next leader is from the other list
            active[ids[~has_next]] = False
    return np.where(matched, out, np.float32(0.0))


def wildcard_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


class IndexSearcher:
    def __init__(
        self,
        index: IndexTables,
        k1: float = bm25.K1,
        b: float = bm25.B,
        similarity="bm25",
    ):
        from lucene_spark.search.similarities import BM25Similarity, resolve

        self.index = index
        self.similarity = (
            BM25Similarity(k1, b) if similarity == "bm25" else resolve(similarity)
        )
        # WAND scorers are built from self.k1/self.b — keep them in sync with
        # an *instance*-passed parameterized BM25Similarity, or strategy=auto
        # would silently rank with default k1/b while flat uses the custom
        # values (WAND≡flat parity break)
        if isinstance(self.similarity, BM25Similarity):
            self.k1, self.b = self.similarity.k1, self.similarity.b
        else:
            self.k1, self.b = k1, b
        self._spark = index.postings.sparkSession
        self._fieldstats_cache: dict[str, tuple[int, int]] | None = None
        # TermStates cache (index/TermStates.java): stats are immutable per
        # reader/snapshot, so repeated queries skip the lookup job
        self._termstats_memo: dict[tuple[str, str], tuple[int, int] | None] = {}
        # lazy terms-dictionary bigram index (fuzzy candidate pruning).
        # Reader-snapshot contract (IndexReader immutability): a searcher
        # wraps ONE immutable index snapshot — _termstats_memo,
        # _fieldstats_cache and _ngram_index are all keyed to it.  A
        # refreshed/replaced index must be wrapped in a NEW IndexSearcher
        # (the reference's reopen-returns-new-reader discipline); call
        # close() on the old one to release the persisted bigram index.
        self._ngram_index: DataFrame | None = None

    def close(self) -> None:
        """Release executor-cached state (the persisted terms-dictionary
        bigram index) and drop the stats memos.  Idempotent; the searcher
        stays usable (caches rebuild lazily against the same snapshot)."""
        if self._ngram_index is not None:
            self._ngram_index.unpersist()
            self._ngram_index = None
        self._termstats_memo.clear()
        self._fieldstats_cache = None

    # ------------------------------------------------------------------ stats

    def _fieldstats(self) -> dict[str, tuple[int, int]]:
        if self._fieldstats_cache is None:
            rows = self.index.fieldstats.collect()
            self._fieldstats_cache = {
                r["field"]: (int(r["doc_count"]), int(r["sum_total_term_freq"]))
                for r in rows
            }
        return self._fieldstats_cache

    def _termstats(self, terms: set[tuple[str, str]]) -> dict[tuple[str, str], tuple[int, int]]:
        """One driver lookup for all *unseen* query terms (TermStates
        resolution, memoized per searcher)."""
        missing = [t for t in terms if t not in self._termstats_memo]
        if missing:
            by_field: dict[str, list[str]] = {}
            for f_, t_ in missing:
                by_field.setdefault(f_, []).append(t_)
            conds = [
                (F.col("field") == f_) & F.col("term").isin(ts)
                for f_, ts in by_field.items()
            ]
            ts_df = self.index.termstats
            if self.index.term_buckets and "tbucket" in ts_df.columns:
                # bucketed terms dictionary: the lookup scans only the query
                # terms' partitions (mirrors the blocks-table pruning)
                from lucene_spark.index.blocks import term_bucket_py

                buckets = sorted(
                    {term_bucket_py(t_, self.index.term_buckets) for _f, t_ in missing}
                )
                ts_df = ts_df.filter(F.col("tbucket").isin(buckets))
            rows = ts_df.filter(reduce(lambda a, b: a | b, conds)).collect()
            found = {
                (r["field"], r["term"]): (int(r["doc_freq"]), int(r["total_term_freq"]))
                for r in rows
            }
            for key in missing:
                self._termstats_memo[key] = found.get(key)
        return {
            t: self._termstats_memo[t]
            for t in terms
            if self._termstats_memo.get(t) is not None
        }

    # ------------------------------------------------------------------ public

    def search(self, query: Query | str, k: int = 10, strategy: str = "auto") -> DataFrame:
        """Top-k hits: (doc_id, score float32, rank 0-based).

        ``strategy``: ``"auto"`` uses the block-max WAND kernel when the index
        has a blocks table and the query is a flat Boolean over term groups —
        any mix of MUST / SHOULD / MUST_NOT / FILTER clauses with
        minimumNumberShouldMatch, where each clause is a term or a
        SHOULD-of-terms sub-Boolean (the shapes BooleanScorerSupplier serves
        with WAND + ReqExcl); buffered deletes ride along as a kernel
        exclusion set.  ``"flat"`` forces the flat-postings DataFrame plan;
        ``"wand"`` requires the WAND path.
        """
        if isinstance(query, str):
            from lucene_spark.search.parser import parse

            query = parse(query)
        query = rewrite_to_fixpoint(query)
        query = rewrite_to_fixpoint(self._expand_multiterm(query))
        stats = self._termstats(collect_terms(query))

        if (
            strategy != "flat"
            and self.index.blocks is not None
            and self.similarity.supports_wand
        ):
            plan = self._wand_plan(query)
            if plan is not None:
                # buffered deletes flow into the kernel as a per-query
                # exclusion array (Lucene checks liveDocs inside the scorer);
                # only a pathologically large delete set forces the flat
                # anti-join path.  Fetched only when the plan is kernel-bound
                # — flat-path queries must not pay the collect.
                exclude, deletes_ok = self._deletes_array()
                if deletes_ok:
                    return self._search_wand_boolean(plan, stats, k, exclude)
                if strategy == "wand":
                    raise ValueError(
                        "delete set too large for the WAND exclusion path"
                    )
            elif strategy == "wand":
                raise ValueError("query shape not supported by the WAND path")
        elif strategy == "wand":
            if self.index.blocks is None:
                raise ValueError("index has no blocks table (build_blocks=True)")
            raise ValueError(
                f"similarity {self.similarity.name!r} does not support the "
                "WAND path (supports_wand=False)"
            )

        scored = self._apply_deletes(self._score(query, stats, boost=1.0))
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        # rank over the <=k collected hits (tiny single-partition window)
        w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
        return topk.withColumn("rank", w.cast("int"))

    def count(self, query: Query | str) -> int:
        """IndexSearcher.count analog with Lucene's sub-linear shortcuts
        (``IndexSearcher.java:495-517``): a pure term query with no deletes
        is answered from the terms dictionary (docFreq) without touching
        postings; everything else counts exactly (cheap in Spark)."""
        if isinstance(query, str):
            from lucene_spark.search.parser import parse

            query = parse(query)
        query = rewrite_to_fixpoint(self._expand_multiterm(rewrite_to_fixpoint(query)))
        stats = self._termstats(collect_terms(query))
        if isinstance(query, TermQuery) and self.index.deletes is None:
            st = stats.get((query.field, query.term))
            return int(st[0]) if st is not None else 0
        return self._apply_deletes(self._score(query, stats, boost=1.0)).count()

    def explain(self, query: Query | str, doc_id: int) -> dict:
        """IndexSearcher.explain analog (``search/IndexSearcher.java`` /
        ``Weight.explain``): the score breakdown of one document for a term
        query — boost, idf(docFreq, docCount), tf components (freq,
        quantized doc length, avgdl) and the final float32 score, straight
        from the same stats/postings tables the scorer uses."""
        if isinstance(query, str):
            from lucene_spark.search.parser import parse

            query = parse(query)
        query = rewrite_to_fixpoint(query)
        if not isinstance(query, TermQuery):
            raise ValueError("explain supports term queries (Lucene explains "
                             "per-leaf; compose clause explains client-side)")
        stats = self._termstats({(query.field, query.term)})
        st = stats.get((query.field, query.term))
        doc_count, sttf = self._fieldstats()[query.field]
        out = {
            "doc_id": int(doc_id),
            "term": query.term,
            "field": query.field,
            "doc_count": doc_count,
            "sum_total_term_freq": sttf,
            "matched": False,
        }
        if st is None:
            return out
        doc_freq, ttf = st
        out.update(doc_freq=doc_freq, total_term_freq=ttf)
        row = (
            self.index.postings_for_terms(query.field, [query.term])
            .filter(
                (F.col("field") == query.field)
                & (F.col("term") == query.term)
                & (F.col("doc_id") == int(doc_id))
            )
            .select("freq")
            .collect()
        )
        if not row:
            return out
        freq = int(row[0]["freq"])
        nrow = self.index.doclens.filter(
            (F.col("field") == query.field) & (F.col("doc_id") == int(doc_id))
        ).select("norm_byte", "len").collect()
        norm_byte = int(nrow[0]["norm_byte"])
        leaf = self.similarity.leaf_scorer(
            1.0, doc_freq, doc_count, sttf, total_term_freq=ttf
        )
        score = float(
            leaf.score(np.array([freq], dtype=np.float32),
                       np.array([norm_byte], dtype=np.int64))[0]
        )
        out.update(
            matched=True,
            freq=freq,
            doc_len=int(nrow[0]["len"]),
            norm_byte=norm_byte,
            avgdl=float(bm25.avgdl(sttf, doc_count)),
            score=score,
        )
        try:
            out["idf"] = float(self.similarity.idf(doc_freq, doc_count))
        except NotImplementedError:
            pass  # idf-free similarity families (LM/DFR/IB/DFI/Axiomatic)
        return out

    def score_all(self, query: Query | str, stats=None) -> DataFrame:
        """All matching docs with scores (the brute-force/oracle path)."""
        if isinstance(query, str):
            from lucene_spark.search.parser import parse

            query = parse(query)
        query = rewrite_to_fixpoint(self._expand_multiterm(rewrite_to_fixpoint(query)))
        stats = stats or self._termstats(collect_terms(query))
        return self._apply_deletes(self._score(query, stats, boost=1.0))

    def _with_norms(self, matched: DataFrame, field: str) -> DataFrame:
        """Ensure (freq-bearing) rows carry the doc's norm byte.

        New-format postings/positions embed ``norm_byte`` per row (the build
        interleaves norms the way Lucene's postings carry impacts), so this
        is a no-op — scoring touches only O(posting) rows.  Legacy tables
        without the column fall back to the corpus-sized doclens join (the
        round-2 scale-killer, kept for back-compat only)."""
        if "norm_byte" in matched.columns:
            return matched
        norms = self.index.doclens.filter(F.col("field") == field).select(
            "doc_id", "norm_byte"
        )
        return matched.join(norms, "doc_id")

    def _apply_deletes(self, scored: DataFrame) -> DataFrame:
        """Live-docs filter: anti-join the buffered delete set
        (PendingDeletes / Lucene90LiveDocsFormat semantics)."""
        if self.index.deletes is None:
            return scored
        return scored.join(self.index.deletes, "doc_id", "left_anti")

    def _score_sloppy_phrase(self, q: PhraseQuery, stats, boost: float) -> DataFrame:
        """Sloppy phrase (slop > 0) with Lucene's ``SloppyPhraseMatcher``
        semantics (``search/SloppyPhraseMatcher.java:190-220`` nextMatch,
        ``search/PhraseScorer.java:85-95`` freq accumulation):

        * PhrasePositions = per-term offset-shifted position streams
          ``s = position - phrase_offset``; a min-PQ ordered by
          (position, offset) always advances the least stream,
        * a *match* is emitted each time the advanced stream overtakes the
          next-least one (or exhausts), with ``matchLength = end - popped
          position`` minimized while the advanced stream stays behind;
          matches with matchLength > slop are discarded,
        * ``sloppyFreq`` = running float32 sum of ``1f/(1f + matchLength)``
          in match order (PhraseScorer keeps ``freq`` in float), so BM25 is
          scored with a *fractional* float32 freq,
        * repeated phrase terms run Lucene's repeat-group collision algebra
          (``SloppyPhraseMatcher.java:392-480`` initComplex/rptGroups) —
          see :func:`sloppy_phrase_freq`.
        """
        if not q.terms:
            return self._empty_scored()
        if len(q.terms) == 1:  # PhraseQuery.rewrite: 1-term phrase ≡ TermQuery
            return self._score_term(q.field, q.terms[0], stats, boost)
        if any((q.field, t) not in stats for t in q.terms):
            return self._empty_scored()
        # repeat groups: stream indices per term with >= 2 phrase slots,
        # ascending offset (gatherRptGroups/sortRptGroups, single-term case)
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(q.terms):
            by_term.setdefault(t, []).append(i)
        rpt_groups = tuple(
            tuple(g) for g in by_term.values() if len(g) > 1
        )

        doc_count, sttf = self._fieldstats()[q.field]
        idfs = [self.similarity.idf(stats[(q.field, t)][0], doc_count) for t in q.terms]
        weight = np.float32(boost) * bm25.sum_idf(idfs)
        leaf = self.similarity.leaf_scorer_from_weight(weight, doc_count, sttf)
        score_udf = _make_leaf_udf(leaf)

        # term+tbucket-pruned positional scan (partition filter on the
        # bucketed on-disk layout — see positions_for_terms)
        pos = self.index.positions_for_terms(q.field, list(q.terms))

        def shift_by(off: int):
            # single-arg lambda (2-arg transform lambdas receive the index)
            return lambda x: x - F.lit(off)

        has_norm = "norm_byte" in pos.columns
        joined: DataFrame | None = None
        for i, t in enumerate(q.terms):
            sel = ["doc_id", F.transform("positions", shift_by(i)).alias(f"_s{i}")]
            if i == 0 and has_norm:
                sel.append(F.col("norm_byte"))
            p = pos.filter(F.col("term") == t).select(*sel)
            joined = p if joined is None else joined.join(p, "doc_id")

        n_terms = len(q.terms)
        slop = int(q.slop)

        if n_terms == 2 and not rpt_groups:
            # r5: the 2-distinct-term workhorse evaluates the WHOLE Arrow
            # batch through one vectorized leader-chain kernel instead of a
            # per-doc Python leapfrog (bit-equal, fuzz-asserted)
            @F.pandas_udf(T.FloatType())
            def sloppy_freq(*cols: pd.Series) -> pd.Series:
                return pd.Series(
                    batch_sloppy_pair_freqs(cols[0], cols[1], slop),
                    dtype="float32",
                )
        else:

            @F.pandas_udf(T.FloatType())
            def sloppy_freq(*cols: pd.Series) -> pd.Series:
                out = np.zeros(len(cols[0]), dtype=np.float32)
                for r in range(len(cols[0])):
                    plists = [
                        np.asarray(cols[i][r], dtype=np.int64)
                        for i in range(n_terms)
                    ]
                    out[r] = sloppy_phrase_freq(plists, slop, rpt_groups)
                return pd.Series(out, dtype="float32")

        out_cols = ["doc_id", "freq"] + (["norm_byte"] if has_norm else [])
        matched = (
            joined.withColumn(
                "freq", sloppy_freq(*[F.col(f"_s{i}") for i in range(n_terms)])
            )
            .filter(F.col("freq") > 0)
            .select(*out_cols)
        )
        return self._with_norms(matched, q.field).select(
            "doc_id", score_udf(F.col("freq"), F.col("norm_byte")).alias("score")
        )

    def span_near_topk_legacy(
        self,
        terms: list[str] | tuple[str, ...],
        slop: int,
        k: int = 10,
        field: str = "text",
        boost: float = 1.0,
    ) -> DataFrame:
        """Top-k for ``SpanNearQuery(terms, slop, inOrder=true)`` under the
        LEGACY ``SpanScorer`` similarity scoring — the pre-intervals span
        semantics (``spans/SpanWeight.java:98-124`` builds one SimScorer
        over ALL the query's term statistics, so weight = Σ idf; freq =
        :func:`near_spans_ordered_freq`'s sloppy accumulation; score =
        BM25(freq, norm) with a fractional float32 freq).

        This complements ``span_topk``'s interval-saturation scoring (the
        envelope the reference itself moved to): callers wanting the
        classic SpanScorer ranking get it here.  Envelope: ordered NEAR of
        single-term clauses — the dominant legacy spans shape; composite
        clauses keep the intervals path.
        """
        terms = list(terms)
        if not terms:
            return self._empty_scored()
        stats = self._termstats([(field, t) for t in terms])
        if any((field, t) not in stats for t in terms):
            return self._empty_scored()
        doc_count, sttf = self._fieldstats()[field]
        # SpanWeight's termStates is a Map<Term, ...>: a repeated term
        # contributes its idf ONCE (SpanWeight.java:101-118)
        idfs = [
            self.similarity.idf(stats[(field, t)][0], doc_count)
            for t in dict.fromkeys(terms)
        ]
        weight = np.float32(boost) * bm25.sum_idf(idfs)
        leaf = self.similarity.leaf_scorer_from_weight(weight, doc_count, sttf)
        score_udf = _make_leaf_udf(leaf)

        pos = self.index.positions_for_terms(field, terms)
        has_norm = "norm_byte" in pos.columns
        joined: DataFrame | None = None
        for i, t in enumerate(terms):
            sel = ["doc_id", F.col("positions").alias(f"_s{i}")]
            if i == 0 and has_norm:
                sel.append(F.col("norm_byte"))
            p = pos.filter(F.col("term") == t).select(*sel)
            joined = p if joined is None else joined.join(p, "doc_id")

        slop_i = int(slop)

        @F.pandas_udf(T.FloatType())
        def span_freq(*cols: pd.Series) -> pd.Series:
            # whole Arrow batch through one across-docs chain kernel
            # (bit-equal to the per-doc enumeration, fuzz-asserted)
            return pd.Series(
                batch_near_spans_freqs(list(cols), slop_i), dtype="float32"
            )

        out_cols = ["doc_id", "freq"] + (["norm_byte"] if has_norm else [])
        matched = (
            joined.withColumn(
                "freq", span_freq(*[F.col(f"_s{i}") for i in range(len(terms))])
            )
            .filter(F.col("freq") > 0)
            .select(*out_cols)
        )
        scored = self._with_norms(matched, field).select(
            "doc_id", score_udf(F.col("freq"), F.col("norm_byte")).alias("score")
        )
        if self.index.deletes is not None:
            scored = scored.join(self.index.deletes, "doc_id", "left_anti")
        from lucene_spark.search.intervals import _rank_topk

        return _rank_topk(scored, k)

    # ------------------------------------------------------------- WAND path

    # Buffered deletes above this size fall back to the flat anti-join path
    # (Lucene's BufferedUpdates are likewise RAM-bounded before being forced
    # to disk; the exclusion set ships to every kernel task)
    MAX_WAND_DELETES = 100_000

    def _deletes_array(self):
        """(exclusion ndarray | None, ok) — buffered deletes as a kernel
        exclusion set; ok=False when the set is too large for shipping."""
        if self.index.deletes is None:
            return None, True
        # memo keyed on the deletes DataFrame identity: if IndexTables.deletes
        # is swapped in place (delete_by_ids returns a new frame), the WAND
        # path must not keep serving the stale exclusion array while the flat
        # path anti-joins the live one.  The memo holds a STRONG reference
        # and compares with `is` — comparing raw id() would alias a freed
        # frame with a new allocation at the same address (CPython id reuse)
        if getattr(self, "_deletes_src", None) is not self.index.deletes:
            rows = self.index.deletes.limit(self.MAX_WAND_DELETES + 1).collect()
            if len(rows) > self.MAX_WAND_DELETES:
                self._deletes_np = None
            else:
                self._deletes_np = np.array(
                    sorted(r["doc_id"] for r in rows), dtype=np.int64
                )
            self._deletes_src = self.index.deletes
        return self._deletes_np, self._deletes_np is not None

    @staticmethod
    def _term_group(q: Query) -> tuple | None:
        """Flatten a clause into an OR-group of TermQuerys (the shape
        BooleanScorerSupplier's WAND handles): a bare term, or a pure
        SHOULD-of-terms sub-Boolean (msm <= 1 ≡ plain disjunction).
        Neutral ``BoostQuery(_, 1.0)`` wrappers never reach here:
        ``BoostQuery.rewrite`` strips them and ``search()`` rewrites to
        fixpoint before planning — which is what keeps CommonTermsQuery's
        always-boost-wrapped groups on the kernel path."""
        if isinstance(q, TermQuery):
            return (q,)
        if (
            isinstance(q, BooleanQuery)
            and q.minimum_should_match <= 1
            and q.clauses
            and all(
                c.occur == Occur.SHOULD and isinstance(c.query, TermQuery)
                for c in q.clauses
            )
        ):
            return tuple(c.query for c in q.clauses)
        return None

    def _wand_plan(self, q: Query):
        """(field, clauses, msm) when the query is a flat Boolean over term
        groups (incl. MUST_NOT / FILTER / minShouldMatch and one level of
        SHOULD-of-terms nesting), else None — the shapes Lucene serves with
        WANDScorer + ReqExclScorer (BooleanScorerSupplier.java:130-246)."""
        if isinstance(q, TermQuery):
            return q.field, [("should", (q,))], 0
        if not isinstance(q, BooleanQuery) or not q.clauses:
            return None
        clauses, fields = [], set()
        occ_map = {
            Occur.MUST: "must",
            Occur.FILTER: "filter",
            Occur.SHOULD: "should",
            Occur.MUST_NOT: "not",
        }
        for c in q.clauses:
            group = self._term_group(c.query)
            if group is None:
                return None
            clauses.append((occ_map[c.occur], group))
            fields.update(t.field for t in group)
        if len(fields) != 1:
            return None
        if not any(o in ("must", "filter", "should") for o, _ in clauses):
            return None  # pure-negative (rewrite normally kills this anyway)
        return fields.pop(), clauses, q.minimum_should_match

    def _search_wand_boolean(self, plan, stats, k: int, exclude=None) -> DataFrame:
        from lucene_spark.search.wand import TermScorer, wand_topk_boolean

        field, cl, msm = plan
        doc_count, sttf = self._fieldstats()[field]

        def _empty_topk():
            return self._empty_scored().withColumn(
                "rank", F.lit(0).cast("int")
            ).limit(0)

        clauses = []
        n_should = 0
        for occ, group in cl:
            if occ == "not":
                members = [t.term for t in group if (t.field, t.term) in stats]
                if members:
                    clauses.append(("not", members))
                continue
            scorers = []
            for tq in group:
                st = stats.get((tq.field, tq.term))
                if st is None:
                    continue  # absent member of an OR-group contributes nothing
                if occ == "filter":
                    # FILTER gates without scoring: constant-0 leaf ⇒ adds
                    # nothing to the double accumulator or the bounds
                    from lucene_spark.search.similarities import _ConstLeaf

                    leaf = _ConstLeaf(np.float32(0.0))
                else:
                    # the query's Similarity supplies the kernel SimScorer —
                    # BM25 keeps its cached fast path, the other families
                    # ride the same impact frontiers (monotone scorers)
                    leaf = self.similarity.leaf_scorer(
                        1.0, st[0], doc_count, sttf, total_term_freq=st[1]
                    )
                scorers.append(TermScorer(tq.term, leaf))
            if occ in ("must", "filter"):
                if not scorers:  # required clause entirely absent: no hits
                    return _empty_topk()
                clauses.append(("must", scorers))
            elif scorers:
                clauses.append(("should", scorers))
                n_should += 1
        has_req = any(o == "must" for o, _ in clauses)
        need = msm if has_req else max(1, msm)
        if n_should < need and not (has_req and msm == 0):
            return _empty_topk()
        if not has_req and n_should == 0:
            return _empty_topk()

        all_terms = sorted(
            {s.term for occ, ms in clauses if occ != "not" for s in ms}
            | {t for occ, ms in clauses if occ == "not" for t in ms}
        )
        # term-pruned block scan: on a bucketed on-disk layout this filter
        # becomes a tbucket partition filter — only the query terms' buckets
        # are read (terms-dictionary role; see IndexTables.blocks_for_terms)
        q_blocks = self.index.blocks_for_terms(field, all_terms)
        topk = wand_topk_boolean(
            q_blocks, clauses, msm, k, field=field, exclude=exclude
        )
        w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
        return topk.withColumn("rank", w.cast("int"))

    # ------------------------------------------------------ multi-term rewrite

    def _term_ngram_index(self) -> DataFrame:
        """Distinct (field, term, gram) bigrams of the terms dictionary —
        the Spark-native stand-in for Lucene's Levenshtein-automaton ∩
        terms-FST intersection (``util/automaton/LevenshteinAutomata.java``):
        instead of walking an automaton, fuzzy expansion reads only the rows
        matching the query's own bigrams (a pushdown-able ``isin`` — on a
        gram-bucketed on-disk layout this becomes a partition filter) and
        count-filters them with the q-gram lemma before the distance scan.
        Built lazily once per searcher and persisted (the terms dictionary
        is immutable per reader snapshot)."""
        if self._ngram_index is None:
            self._ngram_index = (
                self.index.termstats.select("field", "term")
                .filter(F.length("term") >= 2)
                .select(
                    "field",
                    "term",
                    F.explode(
                        F.array_distinct(
                            F.expr(
                                "transform(sequence(1, length(term) - 1),"
                                " i -> substring(term, i, 2))"
                            )
                        )
                    ).alias("gram"),
                )
                .persist()
            )
        return self._ngram_index

    def _fuzzy_candidate_terms(self, q) -> DataFrame | None:
        """Bigram-pruned fuzzy candidates, or None when the q-gram bound is
        vacuous (short terms / high edit budgets fall back to the banded
        full-dictionary distance scan).

        Soundness (per-operation gram bound): a substitution or indel at
        position i rewrites only the ≤ 2 bigrams covering i, so it removes
        at most 2 distinct query grams from the intersection; an adjacent
        transposition ab→ba rewrites the ≤ 3 bigrams (x,a)(a,b)(b,y), so it
        removes at most 3.  Hence a true match within OSA distance
        ``max_edits`` shares ≥ distinct_grams(q) − 3·max_edits of the
        query's bigrams (− 2·max_edits for classic Levenshtein).  This is
        strictly tighter than the former ``grams − 2·lev_cap`` route
        through OSA ≤ e ⇒ Levenshtein ≤ 2e: at the Lucene defaults
        (transpositions=true, max_edits=1) pruning now fires from 5-char
        terms (4 distinct grams) instead of 6+."""
        per_edit = 3 if q.transpositions else 2
        grams = sorted({q.term[i : i + 2] for i in range(len(q.term) - 1)})
        thresh = len(grams) - per_edit * q.max_edits
        if thresh <= 0:
            return None
        return (
            self._term_ngram_index()
            .filter((F.col("field") == q.field) & F.col("gram").isin(grams))
            .groupBy("term")
            .agg(F.count("*").alias("_shared"))
            .filter(F.col("_shared") >= thresh)
            .select("term")
        )

    def _expand_multiterm(self, q: Query) -> Query:
        """Rewrite automaton-style queries against the terms dictionary."""
        if isinstance(q, (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery, TermRangeQuery)):
            terms_df = self.index.termstats.filter(F.col("field") == q.field).select("term")
            if isinstance(q, FuzzyQuery):
                pruned = self._fuzzy_candidate_terms(q)
                if pruned is not None:
                    terms_df = pruned
            if isinstance(q, PrefixQuery):
                cond = F.col("term").startswith(q.prefix)
            elif isinstance(q, WildcardQuery):
                cond = F.col("term").rlike(wildcard_to_regex(q.pattern))
            elif isinstance(q, RegexpQuery):
                cond = F.col("term").rlike("^(?:" + q.pattern + ")$")
            elif isinstance(q, FuzzyQuery):
                # transpositions=true: one transposition costs 2 classic
                # edits, so lev <= 2·max_edits is a sound JVM-side prefilter
                # (OSA <= e ⇒ lev <= 2e); the exact OSA cut happens on the
                # collected candidate list below
                lev_cap = 2 * q.max_edits if q.transpositions else q.max_edits
                cond = (
                    F.length("term").between(
                        F.lit(len(q.term) - q.max_edits), F.lit(len(q.term) + q.max_edits)
                    )
                    & (F.levenshtein(F.col("term"), F.lit(q.term)) <= lev_cap)
                )
            else:  # TermRangeQuery
                cond = F.lit(True)
                if q.lower is not None:
                    cond = cond & (
                        F.col("term") >= q.lower if q.include_lower else F.col("term") > q.lower
                    )
                if q.upper is not None:
                    cond = cond & (
                        F.col("term") <= q.upper if q.include_upper else F.col("term") < q.upper
                    )
            # fuzzy-with-transpositions prefilters LOOSELY (lev <= 2e ⊇
            # OSA <= e), so its collect cap must leave room for the exact
            # cut below — truncating the loose set first would silently
            # drop true matches without ever tripping the clause-count error
            loose = isinstance(q, FuzzyQuery) and q.transpositions
            cap = (4 * MAX_CLAUSE_COUNT if loose else MAX_CLAUSE_COUNT) + 1
            matched = [r["term"] for r in terms_df.filter(cond).limit(cap).collect()]
            if len(matched) >= cap:
                raise ValueError(
                    f"multi-term query candidate set exceeds {cap - 1} terms"
                )
            if loose:
                # exact OSA cut over the (complete) prefiltered candidate set
                matched = [
                    t for t in matched if _osa_distance(t, q.term) <= q.max_edits
                ]
            if len(matched) > MAX_CLAUSE_COUNT:
                raise ValueError(f"multi-term query expands to > {MAX_CLAUSE_COUNT} terms")
            if not matched:
                return MatchNoDocsQuery()
            method = getattr(q, "rewrite_method", "constant_score")
            if method == "scoring_boolean":
                # SCORING_BOOLEAN_REWRITE (ScoringRewrite.java): disjunction
                # of real TermQuerys — each term keeps its own stats, per-doc
                # scores summed.  Users get ranked prefix/wildcard hits
                # instead of constant 1.0.
                return BooleanQuery(
                    tuple(
                        BooleanClause(Occur.SHOULD, TermQuery(t, q.field))
                        for t in sorted(matched)
                    )
                )
            if method == "top_terms_blended":
                # TopTermsBlendedFreqScoringRewrite (TopTermsRewrite.java:
                # 104-120 queue, FuzzyTermsEnum.java:251-257 boost): keep the
                # top max_expansions terms by (boost DESC, term ASC), score
                # through BlendedTermQuery
                if not isinstance(q, FuzzyQuery):
                    raise ValueError(
                        "top_terms_blended needs edit-distance boosts — it is "
                        "FuzzyQuery-only (use scoring_boolean for prefix/wildcard)"
                    )
                qlen = len(q.term)
                dist = _osa_distance if q.transpositions else _levenshtein
                pairs = []
                for t in matched:
                    ed = dist(t, q.term)
                    if ed == 0:
                        b = np.float32(1.0)
                    else:
                        b = np.float32(1.0) - np.float32(ed) / np.float32(
                            min(len(t), qlen)
                        )
                    pairs.append((t, float(b)))
                pairs.sort(key=lambda p: (-p[1], p[0]))
                pairs = pairs[: q.max_expansions]
                return BlendedTermQuery(tuple(pairs), q.field)
            return ConstantScoreQuery(TermInSetQuery(tuple(sorted(matched)), q.field), 1.0)
        if isinstance(q, BoostQuery):
            return BoostQuery(self._expand_multiterm(q.query), q.boost)
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(self._expand_multiterm(q.query), q.score)
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                tuple(
                    type(c)(c.occur, self._expand_multiterm(c.query)) for c in q.clauses
                ),
                q.minimum_should_match,
            )
        if isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                tuple(self._expand_multiterm(s) for s in q.queries), q.tie_breaker
            )
        if isinstance(q, CoveringQuery):
            return CoveringQuery(
                tuple(self._expand_multiterm(s) for s in q.queries),
                q.min_match_expr,
            )
        return q

    # ------------------------------------------------------------------ planning

    def _empty_scored(self) -> DataFrame:
        return self._spark.createDataFrame(
            [], "doc_id long, score float"
        )

    def _score(self, q: Query, stats, boost: float) -> DataFrame:
        """Plan a scored (doc_id, score:float32) DataFrame for the subtree."""
        if isinstance(q, MatchNoDocsQuery):
            return self._empty_scored()
        if isinstance(q, MatchAllDocsQuery):
            return self.index.docmap.select(
                "doc_id", F.lit(float(np.float32(boost))).cast("float").alias("score")
            )
        if isinstance(q, BoostQuery):
            return self._score(q.query, stats, boost * q.boost)
        if isinstance(q, ConstantScoreQuery):
            docs = self._score(q.query, stats, 1.0).select("doc_id")
            const = float(np.float32(boost) * np.float32(q.score))
            return docs.select("doc_id", F.lit(const).cast("float").alias("score"))
        if isinstance(q, TermQuery):
            return self._score_term(q.field, q.term, stats, boost)
        if isinstance(q, SynonymQuery):
            return self._score_synonym(q, stats, boost)
        if isinstance(q, BlendedTermQuery):
            return self._score_blended(q, stats, boost)
        if isinstance(q, TermInSetQuery):
            docs = (
                self.index.postings_for_terms(q.field, list(q.terms))
                .filter((F.col("field") == q.field) & F.col("term").isin(list(q.terms)))
                .select("doc_id")
                .distinct()
            )
            return docs.select(
                "doc_id", F.lit(float(np.float32(boost))).cast("float").alias("score")
            )
        if isinstance(q, BooleanQuery):
            return self._score_boolean(q, stats, boost)
        if isinstance(q, DisjunctionMaxQuery):
            return self._score_dismax(q, stats, boost)
        if isinstance(q, CoveringQuery):
            return self._score_covering(q, stats, boost)
        if isinstance(q, PhraseQuery):
            return self._score_phrase(q, stats, boost)
        if isinstance(q, KnnFloatVectorQuery):
            return self._score_knn(q, stats, boost)
        from lucene_spark.search.payloads import PayloadScoreQuery, payload_scores

        if isinstance(q, PayloadScoreQuery):
            if not q.include_span_score:
                return payload_scores(
                    self.index, q.term, q.function, field=q.field, boost=boost
                )
            # includeSpanScore (PayloadScoreQuery.java:128-131): span BM25
            # score × payload aggregate, float32 product.  For a term span
            # the SpanScorer sloppy freq is exactly float(tf), so the span
            # score equals the regular term score; boost rides the span
            # weight (the payload factor is unboosted)
            if (q.field, q.term) not in stats:
                stats = self._termstats({(q.field, q.term)})
            if (q.field, q.term) not in stats:
                return self._empty_scored()
            span = self._score_term(q.field, q.term, stats, boost)
            pay = payload_scores(
                self.index, q.term, q.function, field=q.field
            ).withColumnRenamed("score", "_pscore")
            return span.join(pay, "doc_id").select(
                "doc_id",
                (F.col("score") * F.col("_pscore")).cast("float").alias("score"),
            )
        from lucene_spark.search.spans import SpanQuery, to_interval_source

        if isinstance(q, SpanQuery):
            # span clauses inside Boolean trees (the complexPhrase parser's
            # rewrite target): interval saturation scores, the engine's
            # documented span-scoring envelope (spans.py module docstring)
            from lucene_spark.search.intervals import interval_scores

            return interval_scores(
                self.index, to_interval_source(q), boost=boost
            )
        raise TypeError(f"unsupported query type: {type(q).__name__}")

    def _score_knn(self, q: KnnFloatVectorQuery, stats, boost: float) -> DataFrame:
        """Pre-filtered KNN (KnnFloatVectorQuery.java:49): top-k by cosine
        among docs accepted by the filter, scored (1+cos)/2
        (VectorSimilarityFunction.COSINE).  The result is a doc-set query —
        composable as a Boolean clause exactly like Lucene's rewritten
        DocAndScoreQuery.  Cosine math is JVM-side (zip_with/aggregate);
        the scan is one pass over the vector column, TakeOrderedAndProject
        does the distributed top-k."""
        if self.index.vectors is None:
            raise ValueError(
                "KNN queries need per-doc vectors: IndexTables.vectors"
            )
        from lucene_spark.extras.dedup import cosine_expr

        vecs = self.index.vectors.select(
            "doc_id", F.col(q.field).cast("array<double>").alias("_v")
        )
        if q.filter is not None:
            allowed = self._score(q.filter, stats, 1.0).select("doc_id")
            vecs = vecs.join(allowed, "doc_id", "left_semi")
        qv = F.array(*[F.lit(float(x)) for x in q.vector]).cast("array<double>")
        scored = vecs.select(
            "doc_id",
            (
                (F.lit(1.0) + F.round(cosine_expr(F.col("_v"), qv), 6)) / F.lit(2.0)
            ).alias("_sim"),
        )
        topk = scored.orderBy(F.desc("_sim"), F.asc("doc_id")).limit(q.k)
        b32 = float(np.float32(boost))
        return topk.select(
            "doc_id", (F.lit(b32) * F.col("_sim")).cast("float").alias("score")
        )

    def _score_phrase(self, q: PhraseQuery, stats, boost: float) -> DataFrame:
        """Exact phrase (slop=0) over the positional postings table.

        PhraseQuery.java:71-143 semantics: the query matches docs where the
        terms occur at consecutive positions; scoring is BM25 with
        weight = boost · Σ idf(term_i) (idfExplain over the TermStatistics
        array, BM25Similarity.java:166-174) and freq = number of phrase
        start positions (ExactPhraseMatcher).  The plan is the two-phase
        shape (TwoPhaseIterator): conjunction join on docID (approximation)
        + position-intersection verify — here a single JVM expression
        ``array_intersect`` over per-term positions shifted by their phrase
        offset, so verification is vectorized and shuffle-free beyond the
        join itself.
        """
        if self.index.positions is None:
            raise ValueError(
                "phrase queries need a positional index: build_index(..., "
                "with_positions=True)"
            )
        if q.slop != 0:
            return self._score_sloppy_phrase(q, stats, boost)
        if not q.terms:
            return self._empty_scored()
        missing = [t for t in q.terms if (q.field, t) not in stats]
        if missing:
            return self._empty_scored()

        doc_count, sttf = self._fieldstats()[q.field]
        idfs = [self.similarity.idf(stats[(q.field, t)][0], doc_count) for t in q.terms]
        weight = np.float32(boost) * bm25.sum_idf(idfs)
        leaf = self.similarity.leaf_scorer_from_weight(weight, doc_count, sttf)
        score_udf = _make_leaf_udf(leaf)

        # term+tbucket-pruned positional scan (on the bucketed on-disk
        # layout this is a partition filter — a phrase reads only its own
        # terms' buckets, not the whole positional table)
        pos = self.index.positions_for_terms(q.field, list(q.terms))

        def shift_by(off: int):
            # single-arg lambda: a 2-arg lambda would receive the ARRAY INDEX
            # as its second argument (F.transform(col, (x, i) -> ...))
            return lambda x: x - F.lit(off)

        has_norm = "norm_byte" in pos.columns
        joined: DataFrame | None = None
        for i, t in enumerate(q.terms):
            sel = ["doc_id", F.transform("positions", shift_by(i)).alias(f"_s{i}")]
            if i == 0 and has_norm:
                sel.append(F.col("norm_byte"))
            p = pos.filter(F.col("term") == t).select(*sel)
            joined = p if joined is None else joined.join(p, "doc_id")
        inter = F.col("_s0")
        for i in range(1, len(q.terms)):
            inter = F.array_intersect(inter, F.col(f"_s{i}"))
        out_cols = ["doc_id", "freq"] + (["norm_byte"] if has_norm else [])
        matched = (
            joined.withColumn("freq", F.size(inter).cast("int"))
            .filter(F.col("freq") > 0)
            .select(*out_cols)
        )
        return self._with_norms(matched, q.field).select(
            "doc_id", score_udf(F.col("freq"), F.col("norm_byte")).alias("score")
        )

    def _score_term(self, field: str, term: str, stats, boost: float) -> DataFrame:
        st = stats.get((field, term))
        if st is None:
            return self._empty_scored()
        doc_freq, ttf = st
        doc_count, sttf = self._fieldstats()[field]
        leaf = self.similarity.leaf_scorer(
            boost, doc_freq, doc_count, sttf, total_term_freq=ttf
        )
        score_udf = _make_leaf_udf(leaf)
        pf = self.index.postings_for_terms(field, [term])
        cols = ["doc_id", "freq"] + (["norm_byte"] if "norm_byte" in pf.columns else [])
        matched = pf.filter(
            (F.col("field") == field) & (F.col("term") == term)
        ).select(*cols)
        return self._with_norms(matched, field).select(
            "doc_id", score_udf(F.col("freq"), F.col("norm_byte")).alias("score")
        )

    def _score_synonym(self, q: SynonymQuery, stats, boost: float) -> DataFrame:
        """SynonymQuery.java: per-doc freq = sum of member freqs, scored once
        with docFreq = max over members, totalTermFreq = sum over members."""
        present = [t for t in q.terms if (q.field, t) in stats]
        if not present:
            return self._empty_scored()
        doc_freq = max(stats[(q.field, t)][0] for t in present)
        ttf = sum(stats[(q.field, t)][1] for t in present)
        doc_count, sttf = self._fieldstats()[q.field]
        leaf = self.similarity.leaf_scorer(
            boost, doc_freq, doc_count, sttf, total_term_freq=ttf
        )
        score_udf = _make_leaf_udf(leaf)
        pf = self.index.postings_for_terms(q.field, present)
        hits = pf.filter((F.col("field") == q.field) & F.col("term").isin(present))
        if "norm_byte" in pf.columns:
            merged = hits.groupBy("doc_id").agg(
                F.sum("freq").cast("int").alias("freq"),
                F.min("norm_byte").alias("norm_byte"),  # constant per doc
            )
        else:
            merged = hits.groupBy("doc_id").agg(F.sum("freq").cast("int").alias("freq"))
        return self._with_norms(merged, q.field).select(
            "doc_id", score_udf(F.col("freq"), F.col("norm_byte")).alias("score")
        )

    def _score_blended(self, q: BlendedTermQuery, stats, boost: float) -> DataFrame:
        """BlendedTermQuery (BOOLEAN_REWRITE): one postings scan over the
        member terms; every member scores with the blended stats (df = max,
        ttf = sum — BlendedTermQuery.java:281-291) and its own boost; the
        disjunction sums per-doc scores (double acc → float32).

        Plan shape: a single ``term isin`` scan (bucket-pruned on disk) with
        a per-term vectorized leaf dispatch inside one Arrow UDF — no
        50-branch union for a 50-term fuzzy expansion.
        """
        present = [(t, b) for t, b in q.terms if (q.field, t) in stats]
        if not present:
            return self._empty_scored()
        df_blend = max(stats[(q.field, t)][0] for t, _b in present)
        ttf_blend = sum(stats[(q.field, t)][1] for t, _b in present)
        doc_count, sttf = self._fieldstats()[q.field]
        leafs = {
            t: self.similarity.leaf_scorer(
                float(np.float32(boost) * np.float32(b)),
                df_blend,
                doc_count,
                sttf,
                total_term_freq=ttf_blend,
            )
            for t, b in present
        }

        @F.pandas_udf(T.FloatType())
        def score(term: pd.Series, freq: pd.Series, norm_byte: pd.Series) -> pd.Series:
            tv = term.to_numpy()
            f = freq.to_numpy(dtype=np.float32)
            nb = norm_byte.to_numpy(dtype=np.int64)
            out = np.zeros(len(tv), dtype=np.float32)
            for t, leaf in leafs.items():
                m = tv == t
                if m.any():
                    out[m] = leaf.score(f[m], nb[m])
            return pd.Series(out, dtype="float32")

        terms = [t for t, _b in present]
        pf = self.index.postings_for_terms(q.field, terms)
        cols = ["term", "doc_id", "freq"] + (
            ["norm_byte"] if "norm_byte" in pf.columns else []
        )
        matched = pf.filter(
            (F.col("field") == q.field) & F.col("term").isin(terms)
        ).select(*cols)
        leaf_scores = self._with_norms(matched, q.field).select(
            "doc_id", score(F.col("term"), F.col("freq"), F.col("norm_byte")).alias("score")
        )
        return (
            leaf_scores.groupBy("doc_id")
            .agg(F.sum(F.col("score").cast("double")).alias("_s"))
            .select("doc_id", F.col("_s").cast("float").alias("score"))
        )

    def _score_boolean(self, q: BooleanQuery, stats, boost: float) -> DataFrame:
        # Lucene folds the boost into leaf weights (BoostQuery rewrite);
        # we propagate it down the same way.
        musts = [c.query for c in q.clauses if c.occur == Occur.MUST]
        shoulds = [c.query for c in q.clauses if c.occur == Occur.SHOULD]
        filters = [c.query for c in q.clauses if c.occur == Occur.FILTER]
        nots = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]
        msm = q.minimum_should_match

        must_dfs = [
            self._score(m, stats, boost).withColumnRenamed("score", f"_m{i}")
            for i, m in enumerate(musts)
        ]
        base: DataFrame | None = None
        if must_dfs:
            base = reduce(lambda a, b: a.join(b, "doc_id"), must_dfs)
            must_sum = reduce(
                lambda a, b: a + b,
                [F.col(f"_m{i}").cast("double") for i in range(len(musts))],
            )
            base = base.select("doc_id", must_sum.alias("_msum"))

        should_agg: DataFrame | None = None
        if shoulds:
            union = reduce(
                lambda a, b: a.unionByName(b),
                [self._score(s, stats, boost) for s in shoulds],
            )
            should_agg = union.groupBy("doc_id").agg(
                F.sum(F.col("score").cast("double")).alias("_ssum"),
                F.count("*").alias("_scount"),
            )

        if base is not None:
            if should_agg is not None:
                base = base.join(should_agg, "doc_id", "left")
                if msm > 0:
                    base = base.filter(F.coalesce(F.col("_scount"), F.lit(0)) >= msm)
                out = base.select(
                    "doc_id",
                    (F.col("_msum") + F.coalesce(F.col("_ssum"), F.lit(0.0)))
                    .cast("float")
                    .alias("score"),
                )
            else:
                out = base.select("doc_id", F.col("_msum").cast("float").alias("score"))
        elif should_agg is not None:
            need = max(1, msm)
            out = should_agg.filter(F.col("_scount") >= need).select(
                "doc_id", F.col("_ssum").cast("float").alias("score")
            )
        elif filters:
            # pure-filter query: constant score 0 over the filtered set
            out = None
        else:
            return self._empty_scored()

        if out is None:
            first, *rest = [self._score(f_, stats, 1.0).select("doc_id") for f_ in filters]
            docs = reduce(lambda a, b: a.join(b, "doc_id", "left_semi"), rest, first)
            out = docs.select("doc_id", F.lit(0.0).cast("float").alias("score"))
            filters = []

        for f_ in filters:
            out = out.join(self._score(f_, stats, 1.0).select("doc_id"), "doc_id", "left_semi")
        for n in nots:
            out = out.join(self._score(n, stats, 1.0).select("doc_id"), "doc_id", "left_anti")
        return out

    def _score_covering(self, q: CoveringQuery, stats, boost: float) -> DataFrame:
        """CoveringQuery (``sandbox/search/CoveringQuery.java:40-90``,
        ``CoveringScorer.java:152-216``): per-doc minimum-number-match.
        The disjunction scores exactly like a SHOULD union (float32 of the
        double sum of matching clauses); acceptance joins the per-doc long
        value — docs with NULL never match, values < 1 behave as 1.  The
        doc-value join is doc_id-aligned (no corpus re-shuffle beyond the
        one the disjunction aggregation already pays)."""
        if len(q.queries) > MAX_CLAUSE_COUNT:
            raise ValueError(f"CoveringQuery expands to > {MAX_CLAUSE_COUNT} clauses")
        subs = [self._score(s, stats, boost) for s in q.queries]
        union = reduce(lambda a, b: a.unionByName(b), subs)
        agg = union.groupBy("doc_id").agg(
            F.sum(F.col("score").cast("double")).alias("_csum"),
            F.count("*").alias("_ccnt"),
        )
        mm = self.index.docmap.select(
            "doc_id", F.expr(q.min_match_expr).cast("long").alias("_mm")
        ).filter(F.col("_mm").isNotNull())
        return (
            agg.join(mm, "doc_id")
            .filter(F.col("_ccnt") >= F.greatest(F.lit(1).cast("long"), F.col("_mm")))
            .select("doc_id", F.col("_csum").cast("float").alias("score"))
        )

    def _score_dismax(self, q: DisjunctionMaxQuery, stats, boost: float) -> DataFrame:
        subs = [self._score(s, stats, boost) for s in q.queries]
        union = reduce(lambda a, b: a.unionByName(b), subs)
        tb = float(q.tie_breaker)
        agg = union.groupBy("doc_id").agg(
            F.max(F.col("score").cast("double")).alias("_max"),
            F.sum(F.col("score").cast("double")).alias("_sum"),
        )
        return agg.select(
            "doc_id",
            (F.col("_max") + F.lit(tb) * (F.col("_sum") - F.col("_max")))
            .cast("float")
            .alias("score"),
        )
