"""Percolator (reverse search) + NRT streaming ingest — Structured Streaming.

Re-expression of the reference's ``monitor`` module (``monitor/Monitor.java:42``,
``Presearcher.java``, ``QueryIndex.java``): queries are *registered*, documents
*stream through*, and (document, query) match pairs are emitted.

Design (SURVEY.md §2.9):

* the registered query set lives in two small broadcast-able tables —
  ``query_terms(query_id, term, clause)`` (the presearcher's query-term
  index) and ``query_reqs(query_id, n_must, min_should, has_should)``,
* per micro-batch (``foreachBatch`` or a direct call on a static frame):
  analyze the batch (the same Arrow UDF as the index build), explode to
  distinct (doc, term), join against the query-term index → per-(doc,
  query) matched-clause counts → verify against the requirements:
  ``must_hits == n_must AND should_hits >= max(min_should, 1 if pure-OR)
  AND not_hits == 0`` — Boolean-of-terms semantics without building an
  index for the batch (the ``MemoryIndex``/``DocumentBatch`` shape,
  ``memory/MemoryIndex.java:198``),
* supported query shapes: single terms, prefixes (``mer*`` — matched via
  per-length substring projections + broadcast equi-joins, the
  ``Presearcher.java`` term-acceptor analog), general wildcards (``s?an`` —
  broadcast LIKE join), distance-1 fuzzy (OSA ≤ 1 with the transposition
  branch, broadcast non-equi join), phrases at any slop (exact via the
  shifted-position SQL; sloppy via the engine's SloppyPhraseMatcher
  transcription per candidate doc), r5: two-term NEAR span clauses in
  surround syntax (``3W(scan, merge)`` / ``2N(filter, sort)`` — presearch
  MUST of both terms, positional verify via the interval minimal-pair
  functions), and one-level Booleans
  of them (MUST / SHOULD / MUST_NOT / FILTER, minimumNumberShouldMatch) —
  the envelope Lucene's presearcher optimizes well; anything else would
  need a per-batch scoring pass with
  :class:`~lucene_spark.search.searcher.IndexSearcher`.

Scale shape: the query tables are broadcast (thousands of registered
queries ≈ KBs); the only shuffle is the per-batch (doc, query) groupBy,
proportional to candidate pairs, never to corpus size.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.index.builder import make_analyze_udf
from lucene_spark.search.parser import parse
from lucene_spark.search.query import (
    BooleanQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)


def _as_prefix(q) -> str | None:
    """The prefix of a PrefixQuery or a trailing-star-only WildcardQuery
    (the parser emits 'ind*' as a wildcard; the percolator accepts exactly
    the prefix-shaped ones)."""
    if isinstance(q, PrefixQuery):
        return q.prefix
    if isinstance(q, WildcardQuery):
        pat = q.pattern
        if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
            return pat[:-1]
    return None


def _to_like(pattern: str) -> str:
    """Wildcard pattern → SQL LIKE pattern (* → %, ? → _, LIKE specials
    escaped) — evaluated JVM-side against batch tokens at match time."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _as_fuzzy(q, query_id: int) -> str | None:
    """The target term of a distance-1 fuzzy acceptor clause.  The match
    predicate is OSA distance ≤ 1 (FuzzyQuery's transpositions=true default:
    one adjacent swap = one edit); at distance 1 OSA and full
    Damerau-Levenshtein coincide, so the DuckDB oracle can use
    ``damerau_levenshtein``.  Larger edit budgets would need the full OSA
    matrix per (token, clause) pair — out of the percolator envelope."""
    if not isinstance(q, FuzzyQuery):
        return None
    if q.max_edits != 1:
        raise ValueError(
            f"query {query_id}: percolator fuzzy acceptors are "
            f"distance-1 only, got max_edits={q.max_edits}"
        )
    return q.term


# OSA(token, _t) ≤ 1, pure JVM column math: 0/1 classic edits, or one
# adjacent transposition (equal prefix, swapped pair, equal suffix)
_OSA1_COND = """
abs(length(term) - length(_t)) <= 1 AND (
  levenshtein(term, _t) <= 1 OR (
    length(term) = length(_t) AND length(_t) >= 2 AND
    exists(sequence(1, length(_t) - 1), i ->
      substring(term, 1, i - 1) = substring(_t, 1, i - 1) AND
      substring(term, i, 1) = substring(_t, i + 1, 1) AND
      substring(term, i + 1, 1) = substring(_t, i, 1) AND
      substring(term, i + 2, length(term)) = substring(_t, i + 2, length(_t))
    )
  )
)
"""


@dataclass
class _Registered:
    query_id: int
    # (term_or_prefix, clause, clause_id, kind): clause ∈ must/should/not,
    # kind ∈ term/prefix.  clause_id groups alternative acceptors of ONE
    # Boolean clause (a prefix clause matches via ANY term with the prefix
    # — Presearcher.java's term-acceptor set — so hit counting is DISTINCT
    # clause_ids, never raw matched-term rows).
    terms: list[tuple[str, str, int, str]]
    n_must: int
    min_should: int
    pure_should: bool
    # exact phrases to verify positionally: each is the term tuple in order
    # (presearch approximates a phrase by MUST of its distinct terms — the
    # Presearcher's term-based pruning — then positions verify the candidates)
    phrases: list[tuple[str, ...]] = field(default_factory=list)
    # r5: two-term NEAR span clauses (term_a, term_b, ordered, slop) —
    # presearched as MUST of both terms, positionally verified
    nears: list[tuple[str, str, bool, int]] = field(default_factory=list)


def _decompose_span(query_id: int, q) -> _Registered:
    """Two-term SpanNearQuery → presearch MUST rows + a NEAR verify spec
    (the percolator's span envelope; wider span algebra would need a
    per-batch IndexSearcher pass)."""
    from lucene_spark.search.spans import SpanNearQuery, SpanTermQuery

    if not (
        isinstance(q, SpanNearQuery)
        and len(q.clauses) == 2
        and all(isinstance(c, SpanTermQuery) for c in q.clauses)
        and q.clauses[0] != q.clauses[1]
    ):
        raise ValueError(
            f"query {query_id}: percolator span clauses are two-distinct-"
            f"term NEAR only, got {q!r}"
        )
    ta, tb = q.clauses[0].term, q.clauses[1].term
    rows = [(t, "must", i, "term") for i, t in enumerate(sorted({ta, tb}))]
    return _Registered(
        query_id,
        rows,
        len(rows),
        0,
        False,
        nears=[(ta, tb, bool(q.in_order), int(q.slop))],
    )


# Surround routing requires an EXPLICIT digit on the distance operator
# (``3W(a, b)`` / ``a 2N b``): a bare W/N is ambiguous with classic queries
# containing literal w/n tokens ('"rock n roll"' is a valid classic phrase
# and must stay one), so percolator registrations write distance-1 as
# 1W/1N.  The prefix form needs the operator at the start or after
# whitespace/'('; the infix form needs whitespace on both sides.
_SURROUND_HINT = re.compile(r"(?:^|[\s(])\d+[WwNn]\s*\(|\s\d+[WwNn]\s")


def _parse_monitor(query_id: int, qs: str):
    """Classic syntax by default; strings using explicitly-numbered
    surround W/N distance operators route through the surround parser →
    span decomposition."""
    if _SURROUND_HINT.search(qs):
        from lucene_spark.search.parser_surround import parse_surround

        return _decompose_span(query_id, parse_surround(qs))
    return _decompose(query_id, parse(qs))


def _phrase_parts(q: PhraseQuery, query_id: int, cid0: int):
    """Presearch rows (MUST of the distinct terms) + the positional-verify
    spec (terms in order, slop).  Exact phrases verify via the shifted-
    position SQL; sloppy ones (r4) via the engine's ``sloppy_phrase_freq``
    matcher — the same fuzz-verified ``SloppyPhraseMatcher`` transcription
    the searcher uses, so Monitor and IndexSearcher agree by construction."""
    if not q.terms:
        raise ValueError(f"query {query_id}: empty phrase")
    rows = [
        (t, "must", cid0 + i, "term") for i, t in enumerate(sorted(set(q.terms)))
    ]
    return rows, (tuple(q.terms), int(q.slop))


def _decompose(query_id: int, q) -> _Registered:
    if isinstance(q, TermQuery):
        return _Registered(query_id, [(q.term, "should", 0, "term")], 0, 1, True)
    if (pfx := _as_prefix(q)) is not None:
        return _Registered(query_id, [(pfx, "should", 0, "prefix")], 0, 1, True)
    if isinstance(q, WildcardQuery):
        return _Registered(
            query_id, [(_to_like(q.pattern), "should", 0, "wild")], 0, 1, True
        )
    if (ft := _as_fuzzy(q, query_id)) is not None:
        return _Registered(query_id, [(ft, "should", 0, "fuzzy")], 0, 1, True)
    if isinstance(q, PhraseQuery):
        rows, phrase = _phrase_parts(q, query_id, 0)
        return _Registered(query_id, rows, len(rows), 0, False, [phrase])
    if isinstance(q, BooleanQuery):
        terms: list[tuple[str, str, int, str]] = []
        phrases: list[tuple[str, ...]] = []
        n_must = 0
        cid = 0
        for c in q.clauses:
            if isinstance(c.query, PhraseQuery) and c.occur in (
                Occur.MUST,
                Occur.FILTER,
            ):
                rows, phrase = _phrase_parts(c.query, query_id, cid)
                terms.extend(rows)
                cid += len(rows)
                n_must += len(rows)
                phrases.append(phrase)
                continue
            if (pfx := _as_prefix(c.query)) is not None:
                # Presearcher term-acceptor analog: the clause matches via
                # ANY document term carrying the prefix
                kind, key = "prefix", pfx
            elif isinstance(c.query, WildcardQuery):
                kind, key = "wild", _to_like(c.query.pattern)
            elif (ft := _as_fuzzy(c.query, query_id)) is not None:
                kind, key = "fuzzy", ft
            elif isinstance(c.query, TermQuery):
                kind, key = "term", c.query.term
            else:
                raise ValueError(
                    f"query {query_id}: percolator supports terms, prefixes, "
                    f"wildcards, distance-1 fuzzy, phrases (MUST, any slop), "
                    f"and one-level Booleans of them, got {type(c.query).__name__}"
                )
            if c.occur in (Occur.MUST, Occur.FILTER):
                terms.append((key, "must", cid, kind))
                n_must += 1
            elif c.occur == Occur.SHOULD:
                terms.append((key, "should", cid, kind))
            else:
                terms.append((key, "not", cid, kind))
            cid += 1
        n_should = sum(1 for _t, cl, _c, _k in terms if cl == "should")
        pure = n_must == 0 and n_should > 0
        min_should = q.minimum_should_match
        if pure and min_should == 0:
            min_should = 1  # Lucene: no MUST ⇒ at least one SHOULD must hit
        return _Registered(query_id, terms, n_must, min_should, pure, phrases)
    raise ValueError(f"query {query_id}: unsupported percolator query {type(q).__name__}")


class Monitor:
    """Register queries once; match document batches / streams against them."""

    def __init__(
        self,
        spark: SparkSession,
        queries: dict[int, str],
        analyzer: StandardAnalyzer | None = None,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        text_col: str = "text",
    ):
        self.spark = spark
        self.analyzer = analyzer or StandardAnalyzer()
        self.key_cols = list(key_cols)
        self.text_col = text_col

        self._regs: dict[int, _Registered] = {
            qid: _parse_monitor(qid, qs) for qid, qs in sorted(queries.items())
        }
        # MonitorQuery keeps the original string + opaque metadata alongside
        # the parsed form (``monitor/MonitorQuery.java:34-60``)
        self._sources: dict[int, tuple[str, dict]] = {
            qid: (qs, {}) for qid, qs in sorted(queries.items())
        }
        self._rebuild()

    def _rebuild(self) -> None:
        """Re-materialize the broadcast query tables (driver-resident KBs;
        a rebuild is the atomic-swap analog of QueryIndex's commit)."""
        regs = [self._regs[qid] for qid in sorted(self._regs)]
        self.query_terms = self.spark.createDataFrame(
            [(r.query_id, t, cl, c, k) for r in regs for t, cl, c, k in r.terms],
            "query_id int, term string, clause string, cid int, kind string",
        )
        # distinct registered prefix lengths: each becomes ONE substring
        # projection + broadcast equi-join at match time (no theta-join)
        self._prefix_lens = sorted(
            {len(t) for r in regs for t, _cl, _c, k in r.terms if k == "prefix"}
        )
        kinds = {k for r in regs for _t, _cl, _c, k in r.terms}
        self._has_wild = "wild" in kinds
        self._has_fuzzy = "fuzzy" in kinds
        # n_phrases counts EVERY positional check (phrases + NEAR spans)
        self.query_reqs = self.spark.createDataFrame(
            [
                (r.query_id, r.n_must, r.min_should, len(r.phrases) + len(r.nears))
                for r in regs
            ],
            "query_id int, n_must int, min_should int, n_phrases int",
        )
        phrase_rows = [
            (r.query_id, pid, t, off, len(ph), slop)
            for r in regs
            for pid, (ph, slop) in enumerate(r.phrases)
            for off, t in enumerate(ph)
        ]
        self.query_phrase_terms = (
            self.spark.createDataFrame(
                phrase_rows,
                "query_id int, phrase_id int, term string, offset int, "
                "plen int, slop int",
            )
            if phrase_rows
            else None
        )
        self._has_sloppy = any(s > 0 for _q, _p, _t, _o, _l, s in phrase_rows)
        self._has_exact_phrase = any(
            s == 0 for _q, _p, _t, _o, _l, s in phrase_rows
        )
        # NEAR verify table: one row per (clause, side) — check ids live in
        # a disjoint namespace (10000+) so phrase_ok can count them together
        near_rows = [
            (r.query_id, 10_000 + nid, t, side, ordered, slop)
            for r in regs
            for nid, (ta, tb, ordered, slop) in enumerate(r.nears)
            for side, t in (("a", ta), ("b", tb))
        ]
        self.query_near_terms = (
            self.spark.createDataFrame(
                near_rows,
                "query_id int, phrase_id int, term string, side string,"
                " ordered boolean, slop int",
            )
            if near_rows
            else None
        )

    def register(
        self, query_id: int, query_str: str, metadata: dict | None = None
    ) -> None:
        """Monitor.register (``monitor/Monitor.java``): add or replace a
        query; takes effect for the next batch.  ``metadata`` is the
        MonitorQuery's opaque per-query map (owner, routing key, …),
        stored verbatim and returned by :meth:`get_query`."""
        self._regs[query_id] = _parse_monitor(query_id, query_str)
        self._sources[query_id] = (query_str, dict(metadata or {}))
        self._rebuild()

    def unregister(self, query_id: int) -> None:
        """Monitor.deleteById: remove a registered query."""
        self._regs.pop(query_id, None)
        self._sources.pop(query_id, None)
        self._rebuild()

    # ---- registry introspection (Monitor.getQuery/getQueryIds/
    # getQueryCount, ``monitor/Monitor.java:238-270``)

    def get_query(self, query_id: int) -> tuple[str, dict] | None:
        """(query_string, metadata) for a registered id, or None."""
        src = self._sources.get(query_id)
        return (src[0], dict(src[1])) if src is not None else None

    def get_query_ids(self) -> list[int]:
        return sorted(self._regs)

    def get_query_count(self) -> int:
        return len(self._regs)

    def match_batch_with_stats(self, batch: DataFrame):
        """(matches, stats) — the QueryTimeListener/MatchingQueries analog
        (``monitor/Monitor.java`` match telemetry): stats carries the wall
        time, registered-query count, total match pairs, per-query match
        counts, and how many registered queries matched at least one doc.
        The stats aggregation is one extra pass over the match plan (NOT
        cached — a persist here would leak executor storage across
        streaming micro-batches; callers wanting to reuse the matches
        frame cheaply can persist/unpersist it themselves)."""
        import time as _time

        t0 = _time.perf_counter()
        matches = self.match_batch(batch)
        per_query = {
            r["query_id"]: r["n"]
            for r in matches.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        stats = {
            "wall_sec": round(_time.perf_counter() - t0, 4),
            "queries_registered": self.get_query_count(),
            "queries_matched": len(per_query),
            "match_pairs": int(sum(per_query.values())),
            "per_query_matches": per_query,
        }
        return matches, stats

    def match_batch(self, batch: DataFrame) -> DataFrame:
        """(key_cols..., query_id) pairs for documents matching each query."""
        keys = [F.col(c) for c in self.key_cols]
        tpos = None
        needs_positions = (
            self.query_phrase_terms is not None
            or self.query_near_terms is not None
        )
        if needs_positions:
            # ONE analysis pass serves both steps when phrases are
            # registered: the positional stream is computed once and the
            # term presearch is a projection of it
            from lucene_spark.index.builder import make_analyze_pos_udf

            analyze_pos = make_analyze_pos_udf(self.analyzer)
            tpos = batch.select(
                *keys, F.explode(analyze_pos(F.col(self.text_col))).alias("tp")
            ).select(
                *self.key_cols,
                F.col("tp.term").alias("term"),
                F.col("tp.pos").alias("pos"),
            ).persist()
            # cache spans presearch + verify of THIS batch only
            if getattr(self, "_last_tpos", None) is not None:
                self._last_tpos.unpersist()
            self._last_tpos = tpos
            toks = tpos.select(*self.key_cols, "term").distinct()
        else:
            analyze = make_analyze_udf(self.analyzer)
            toks = (
                batch.select(
                    *keys, F.explode(analyze(F.col(self.text_col))).alias("term")
                )
                .distinct()
            )
        qt = self.query_terms
        matched = toks.join(
            F.broadcast(qt.filter(F.col("kind") == "term")), "term"
        ).select(*self.key_cols, "query_id", "clause", "cid")
        for plen in self._prefix_lens:
            pq = qt.filter(
                (F.col("kind") == "prefix") & (F.length("term") == plen)
            ).withColumnRenamed("term", "_pfx")
            pref_hits = (
                toks.select(
                    *self.key_cols, F.substring("term", 1, plen).alias("_pfx")
                )
                .join(F.broadcast(pq), "_pfx")
                .select(*self.key_cols, "query_id", "clause", "cid")
            )
            matched = matched.unionByName(pref_hits)
        # wildcard / fuzzy acceptors: broadcast non-equi joins — per DISTINCT
        # batch token × the handful of such clauses, evaluated JVM-side
        # (LIKE; levenshtein + transposition algebra), never per raw token
        if self._has_wild:
            wq = F.broadcast(
                qt.filter(F.col("kind") == "wild").withColumnRenamed(
                    "term", "_pat"
                )
            )
            wild_hits = toks.join(
                wq, F.expr("term like _pat escape '\\\\'")
            ).select(*self.key_cols, "query_id", "clause", "cid")
            matched = matched.unionByName(wild_hits)
        if self._has_fuzzy:
            fq = F.broadcast(
                qt.filter(F.col("kind") == "fuzzy").withColumnRenamed(
                    "term", "_t"
                )
            )
            fuzzy_hits = toks.join(fq, F.expr(_OSA1_COND)).select(
                *self.key_cols, "query_id", "clause", "cid"
            )
            matched = matched.unionByName(fuzzy_hits)
        # hit counting is DISTINCT clause ids: a prefix clause matched by
        # many doc terms (or a term hit twice via union) counts ONCE
        hits = matched.groupBy(*self.key_cols, "query_id").agg(
            F.count_distinct(
                F.when(F.col("clause") == "must", F.col("cid"))
            ).alias("must_hits"),
            F.count_distinct(
                F.when(F.col("clause") == "should", F.col("cid"))
            ).alias("should_hits"),
            F.count_distinct(
                F.when(F.col("clause") == "not", F.col("cid"))
            ).alias("not_hits"),
        )
        verified = (
            hits.join(F.broadcast(self.query_reqs), "query_id")
            .filter(
                (F.col("must_hits") == F.col("n_must"))
                & (F.col("should_hits") >= F.col("min_should"))
                & (F.col("not_hits") == 0)
            )
            .select(*self.key_cols, "query_id", "n_phrases")
        )
        if not needs_positions:
            return verified.select(*self.key_cols, "query_id")

        # positional verification of phrase candidates (the MemoryIndex
        # verify step for phrase queries): exact phrases (slop=0) — a
        # phrase matches a doc iff some start s has ALL its offsets present
        # at s+offset (count distinct offsets at shifted position s ==
        # phrase length); sloppy phrases (slop>0, r4) — the engine's
        # ``sloppy_phrase_freq`` matcher (the fuzz-verified
        # SloppyPhraseMatcher transcription incl. repeats algebra) runs per
        # candidate (doc, phrase) group and a doc matches iff freq > 0.
        # Both paths broadcast-join the phrase-term table first, so the
        # positional work is restricted to docs containing phrase terms.
        pt = self.query_phrase_terms
        hits_parts = []
        if pt is not None and self._has_exact_phrase:
            ph = tpos.join(F.broadcast(pt.filter(F.col("slop") == 0)), "term")
            starts = ph.groupBy(
                *self.key_cols,
                "query_id",
                "phrase_id",
                "plen",
                (F.col("pos") - F.col("offset")).alias("s"),
            ).agg(F.countDistinct("offset").alias("n_off"))
            hits_parts.append(
                starts.filter(F.col("n_off") == F.col("plen"))
                .select(*self.key_cols, "query_id", "phrase_id")
                .distinct()
            )
        if pt is not None and self._has_sloppy:
            sp = tpos.join(F.broadcast(pt.filter(F.col("slop") > 0)), "term")
            key_schema = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in tpos.schema
                if f.name in self.key_cols
            )
            out_schema = key_schema + ", query_id int, phrase_id int"
            key_cols = self.key_cols

            def verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
                import numpy as np

                from lucene_spark.search.searcher import sloppy_phrase_freq

                empty = pdf.iloc[0:0][key_cols + ["query_id", "phrase_id"]]
                plen = int(pdf["plen"].iloc[0])
                slop = int(pdf["slop"].iloc[0])
                plists = []
                for off in range(plen):
                    p = pdf.loc[pdf["offset"] == off, "pos"].to_numpy(np.int64)
                    if len(p) == 0:
                        return empty
                    plists.append(np.sort(p - off))
                by_term: dict = {}
                for off, t in zip(pdf["offset"], pdf["term"]):
                    by_term.setdefault(t, set()).add(int(off))
                rpt = tuple(
                    tuple(sorted(v))
                    for _t, v in sorted(
                        by_term.items(), key=lambda kv: min(kv[1])
                    )
                    if len(v) >= 2
                )
                if sloppy_phrase_freq(plists, slop, rpt) > 0:
                    return pdf.iloc[0:1][key_cols + ["query_id", "phrase_id"]]
                return empty

            hits_parts.append(
                sp.groupBy(*self.key_cols, "query_id", "phrase_id").applyInPandas(
                    verify, out_schema
                )
            )
        if self.query_near_terms is not None:
            # r5 NEAR span verify: per candidate (doc, clause) group run the
            # interval minimal-pair functions (maxgaps(slop) over the pair
            # ⇔ width ≤ slop + 2) — the same machinery span_topk uses
            nt = self.query_near_terms
            np_cand = tpos.join(F.broadcast(nt), "term")
            key_schema = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in tpos.schema
                if f.name in self.key_cols
            )
            near_schema = key_schema + ", query_id int, phrase_id int"
            near_keys = self.key_cols

            def near_verify(pdf: "pd.DataFrame") -> "pd.DataFrame":
                import numpy as np

                from lucene_spark.search.intervals import (
                    ordered_interval_lengths,
                    unordered_interval_lengths,
                )

                empty = pdf.iloc[0:0][near_keys + ["query_id", "phrase_id"]]
                pa = np.sort(pdf.loc[pdf["side"] == "a", "pos"].to_numpy(np.int64))
                pb = np.sort(pdf.loc[pdf["side"] == "b", "pos"].to_numpy(np.int64))
                if len(pa) == 0 or len(pb) == 0:
                    return empty
                slop = int(pdf["slop"].iloc[0])
                fn = (
                    ordered_interval_lengths
                    if bool(pdf["ordered"].iloc[0])
                    else unordered_interval_lengths
                )
                if len(fn(pa, pb, slop + 2)):
                    return pdf.iloc[0:1][near_keys + ["query_id", "phrase_id"]]
                return empty

            hits_parts.append(
                np_cand.groupBy(*self.key_cols, "query_id", "phrase_id")
                .applyInPandas(near_verify, near_schema)
            )
        phrase_hit = hits_parts[0]
        for extra in hits_parts[1:]:
            phrase_hit = phrase_hit.unionByName(extra)
        phrase_ok = phrase_hit.groupBy(*self.key_cols, "query_id").agg(
            F.countDistinct("phrase_id").alias("n_ok")
        )
        out = (
            verified.join(phrase_ok, [*self.key_cols, "query_id"], "left")
            .filter(F.coalesce(F.col("n_ok"), F.lit(0)) >= F.col("n_phrases"))
            .select(*self.key_cols, "query_id")
        )
        return out

    def run_stream(self, stream: DataFrame, checkpoint_dir: str, output_dir: str):
        """Wire a streaming source through the percolator via foreachBatch."""

        def step(batch: DataFrame, epoch_id: int) -> None:
            (
                self.match_batch(batch)
                .withColumn("epoch", F.lit(epoch_id))
                .write.mode("append")
                .parquet(output_dir)
            )

        return (
            stream.writeStream.foreachBatch(step)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .start()
        )
