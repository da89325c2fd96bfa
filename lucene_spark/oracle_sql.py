"""DuckDB oracle-SQL generators for the correctness gate.

Each generator emits ANSI SQL that recomputes, **bit-exactly in float32**,
what the Spark engine computes for the same query over the ``documents``
table: tokenization (the gate corpus is single-space-separated ``[a-z0-9]+``
words, so ``string_split`` equals the StandardAnalyzer token stream — verified
by test), English stop removal, doc lengths, SmallFloat norm quantization
(``util/SmallFloat.java:103-167`` re-derived with ``bin()`` bit-width), BM25
idf/avgdl/score (``BM25Similarity.java:100-117,180-184,221-233``) with every
intermediate CAST to FLOAT (DuckDB FLOAT arithmetic is IEEE-754 single — the
parity is asserted in tests/test_bm25.py), and the (score DESC, docID ASC)
top-k tie-break (``TopScoreDocCollector.java:26-28``).
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import ENGLISH_STOP_WORDS

K1_SQL = "CAST(1.2 AS FLOAT)"
B_SQL = "CAST(0.75 AS FLOAT)"
F1 = "CAST(1 AS FLOAT)"

_STOPS = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

# Shared CTEs: token stream, doc lengths, field stats, quantized lengths.
# qlen = byte4ToInt(intToByte4(len)): identity below 32 (24 free values + 8
# subnormals), else keep top-4-bits of (len - 24) via bin() bit-width.


def base_ctes(source: str = "documents") -> str:
    """The shared CTE block over an arbitrary corpus relation (lifecycle
    oracles swap in a mutated corpus CTE instead of ``documents``)."""
    return f"""
toks AS (
    SELECT doc_id, t.term AS term
    FROM {source}, unnest(string_split(text, ' ')) AS t(term)
    WHERE t.term <> '' AND t.term NOT IN ({_STOPS})
),
dl AS (SELECT doc_id, count(*)::BIGINT AS len FROM toks GROUP BY doc_id),
fs AS (SELECT count(*)::BIGINT AS n, sum(len)::BIGINT AS sttf FROM dl WHERE len > 0),
norm AS (
    SELECT doc_id, len,
        CASE WHEN len < 32 THEN len
             ELSE 24 + (((len - 24) >> (length(bin(len - 24)) - 4))
                        << (length(bin(len - 24)) - 4))
        END AS qlen
    FROM dl
)
"""


BASE_CTES = base_ctes()


def _term_cte(name: str, term: str) -> str:
    """Scored postings for one term: sc_<name>(doc_id, score FLOAT)."""
    return f"""
tf_{name} AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
w_{name} AS (
    SELECT CAST(ln(1 + (fs.n - st.df + 0.5) / (st.df + 0.5)) AS FLOAT) AS w,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs, (SELECT count(*)::BIGINT AS df FROM tf_{name}) st
),
sc_{name} AS (
    SELECT tf.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(tf.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(n.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM tf_{name} tf
    JOIN norm n USING (doc_id)
    CROSS JOIN w_{name} w
)
"""


def _topk(select_from: str, k: int) -> str:
    return f"""
SELECT doc_id,
       CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS INT) AS rank
FROM {select_from}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def term_topk_sql(term: str, k: int) -> str:
    return f"WITH {BASE_CTES}, {_term_cte('a', term)} {_topk('sc_a', k)}"


def and_topk_sql(term_a: str, term_b: str, k: int) -> str:
    # ConjunctionScorer.java:57-63 — sum clause float scores in double, cast float
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term_a)}, {_term_cte('b', term_b)},
combined AS (
    SELECT a.doc_id,
           CAST(CAST(a.score AS DOUBLE) + CAST(b.score AS DOUBLE) AS FLOAT) AS score
    FROM sc_a a JOIN sc_b b USING (doc_id)
)
{_topk('combined', k)}
"""


def or_topk_sql(term_a: str, term_b: str, k: int) -> str:
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term_a)}, {_term_cte('b', term_b)},
unioned AS (
    SELECT doc_id, score FROM sc_a UNION ALL SELECT doc_id, score FROM sc_b
),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM unioned GROUP BY doc_id
)
{_topk('combined', k)}
"""


def term_topk_params_sql(term: str, k1: float, b: float, k: int) -> str:
    """Single-term BM25 with non-default (k1, b) — parameterized similarity."""
    k1s = f"CAST({k1} AS FLOAT)"
    bs = f"CAST({b} AS FLOAT)"
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
w_a AS (
    SELECT CAST(ln(1 + (fs.n - st.df + 0.5) / (st.df + 0.5)) AS FLOAT) AS w,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs, (SELECT count(*)::BIGINT AS df FROM tf_a) st
),
sc_a AS (
    SELECT tf.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(tf.freq AS FLOAT) *
                ({F1} / ({k1s} * (({F1} - {bs}) +
                     {bs} * CAST(n.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id) CROSS JOIN w_a w
)
{_topk('sc_a', k)}
"""


def lmdirichlet_term_topk_sql(term: str, mu: float, k: int) -> str:
    """LMDirichletSimilarity (LMDirichletSimilarity.java:76-82): score =
    (float) max(0, boost·(ln(1 + freq/(mu·p)) + ln(mu/(dl + mu)))) with
    p = (ttf+1)/(sumTtf+1) in double; dl = quantized length."""
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
st AS (SELECT count(*)::BIGINT AS ttf FROM toks WHERE term = '{term}'),
sc AS (
    SELECT tf.doc_id,
        CAST(
            CASE WHEN ln(1 + CAST(tf.freq AS DOUBLE) /
                         ({mu} * ((st.ttf + 1.0) / (fs.sttf + 1.0))))
                     + ln({mu} / (CAST(n.qlen AS DOUBLE) + {mu})) > 0
                 THEN ln(1 + CAST(tf.freq AS DOUBLE) /
                         ({mu} * ((st.ttf + 1.0) / (fs.sttf + 1.0))))
                     + ln({mu} / (CAST(n.qlen AS DOUBLE) + {mu}))
                 ELSE 0.0 END
        AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id), st, fs
)
{_topk('sc', k)}
"""


def percolator_matches_sql() -> str:
    """The registered-query set of the percolator gate, as doc sets."""
    return f"""
WITH {BASE_CTES},
d AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT doc_id, 1 AS query_id FROM d WHERE term = 'merge'
UNION
SELECT a.doc_id, 2 FROM d a JOIN d b USING (doc_id)
WHERE a.term = 'data' AND b.term = 'row'
UNION
SELECT doc_id, 3 FROM d WHERE term IN ('scan', 'batch')
UNION
SELECT doc_id, 4 FROM d m
WHERE m.term = 'merge'
  AND NOT EXISTS (SELECT 1 FROM d w WHERE w.doc_id = m.doc_id AND w.term = 'window')
ORDER BY doc_id, query_id
"""


def percolator_suite_sql() -> str:
    """Every supported percolator shape in one gate: terms / Booleans /
    MUST_NOT (1-4), exact phrases (5-6), prefix term-acceptors (7-8),
    wildcard (9), distance-1 fuzzy (10; OSA ≤ 1 == Damerau-Levenshtein
    ≤ 1, so DuckDB's ``damerau_levenshtein`` is the exact twin), a
    sloppy phrase (11), and r5 two-term NEAR span clauses (12 ordered:
    some pair with b after a and gaps ≤ slop; 13 unordered: some
    distinct-position pair with window gaps ≤ slop — a minimal interval
    within maxgaps exists iff ANY such pair does).  For TWO distinct terms
    a SloppyPhraseMatcher
    match with matchLength ≤ slop exists iff SOME pair of shifted
    positions lies within slop: every chain leader matches its closest
    predecessor, and for the globally closest pair (F, L) either L itself
    becomes a leader (matchLength ≤ L−F) or the last leader before it
    already pairs within L−F — so membership reduces to the EXISTS below."""
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
ph AS (
    SELECT DISTINCT a.doc_id
    FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.term = 'table' AND b.term = 'value'
),
d AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT doc_id, 1 AS query_id FROM d WHERE term = 'merge'
UNION
SELECT a.doc_id, 2 FROM d a JOIN d b USING (doc_id)
WHERE a.term = 'data' AND b.term = 'row'
UNION
SELECT doc_id, 3 FROM d WHERE term IN ('scan', 'batch')
UNION
SELECT doc_id, 4 FROM d m
WHERE m.term = 'merge'
  AND NOT EXISTS (SELECT 1 FROM d w WHERE w.doc_id = m.doc_id AND w.term = 'window')
UNION
SELECT doc_id, 5 FROM ph
UNION
SELECT ph.doc_id, 6 FROM ph JOIN d ON d.doc_id = ph.doc_id AND d.term = 'merge'
UNION
SELECT DISTINCT doc_id, 7 FROM d WHERE term LIKE 'mer%'
UNION
SELECT doc_id, 8 FROM d m
WHERE m.term = 'data'
  AND NOT EXISTS (SELECT 1 FROM d w WHERE w.doc_id = m.doc_id AND w.term LIKE 'win%')
UNION
SELECT DISTINCT doc_id, 9 FROM d WHERE term LIKE 's_an'
UNION
SELECT DISTINCT a.doc_id, 10 FROM d a JOIN d b USING (doc_id)
WHERE a.term = 'batch' AND damerau_levenshtein(b.term, 'megre') <= 1
UNION
SELECT DISTINCT a.doc_id, 11 FROM tp a JOIN tp b ON b.doc_id = a.doc_id
WHERE a.term = 'table' AND b.term = 'value'
  AND abs((b.pos - 1) - a.pos) <= 2
UNION
SELECT DISTINCT a.doc_id, 12 FROM tp a JOIN tp b ON b.doc_id = a.doc_id
WHERE a.term = 'scan' AND b.term = 'merge'
  AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
UNION
SELECT DISTINCT a.doc_id, 13 FROM tp a JOIN tp b ON b.doc_id = a.doc_id
WHERE a.term = 'filter' AND b.term = 'sort'
  AND a.pos <> b.pos AND abs(b.pos - a.pos) - 1 <= 1
ORDER BY doc_id, query_id
"""


def multi_or_topk_sql(terms: list[str], k: int) -> str:
    """OR of N terms: per-doc sum of float32 leaf scores (double acc)."""
    names = [f"t{i}" for i in range(len(terms))]
    ctes = ", ".join(_term_cte(n, t) for n, t in zip(names, terms))
    union = " UNION ALL ".join(f"SELECT doc_id, score FROM sc_{n}" for n in names)
    return f"""
WITH {BASE_CTES}, {ctes},
unioned AS ({union}),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM unioned GROUP BY doc_id
)
{_topk('combined', k)}
"""


def multi_and_topk_sql(terms: list[str], k: int) -> str:
    """AND of N terms: docs matching all; float32 leaf scores summed in double."""
    names = [f"t{i}" for i in range(len(terms))]
    ctes = ", ".join(_term_cte(n, t) for n, t in zip(names, terms))
    union = " UNION ALL ".join(f"SELECT doc_id, score FROM sc_{n}" for n in names)
    return f"""
WITH {BASE_CTES}, {ctes},
unioned AS ({union}),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM unioned GROUP BY doc_id HAVING count(*) = {len(terms)}
)
{_topk('combined', k)}
"""


def and_not_topk_sql(term_a: str, term_not: str, k: int) -> str:
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term_a)}, {_term_cte('n', term_not)},
combined AS (
    SELECT a.doc_id, a.score FROM sc_a a
    ANTI JOIN sc_n n ON a.doc_id = n.doc_id
)
{_topk('combined', k)}
"""


def phrase_topk_sql(terms: list[str], k: int) -> str:
    """Exact phrase BM25 top-k (PhraseQuery.java semantics): positions are
    pre-stop-removal word indices (holes preserved), phrase freq = number of
    start positions, weight = float32(Σ double(float32 idf_i))."""
    names = [f"p{i}" for i in range(len(terms))]
    pos_ctes = ", ".join(
        f"{nm} AS (SELECT doc_id, pos FROM tp WHERE term = '{t}')"
        for nm, t in zip(names, terms)
    )
    joins = " ".join(
        f"JOIN {nm} ON {nm}.doc_id = p0.doc_id AND {nm}.pos = p0.pos + {i}"
        for i, nm in enumerate(names[1:], start=1)
    )
    idf_sum = " + ".join(
        f"CAST(CAST(ln(1 + (fs.n - (SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{t}') + 0.5) "
        f"/ ((SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{t}') + 0.5)) AS FLOAT) AS DOUBLE)"
        for t in terms
    )
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
{pos_ctes},
match AS (
    SELECT p0.doc_id, count(*)::INT AS freq
    FROM p0 {joins}
    GROUP BY p0.doc_id
),
w AS (
    SELECT CAST({idf_sum} AS FLOAT) AS w,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs
),
sc AS (
    SELECT m.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(m.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(nm.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM match m JOIN norm nm USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def dismax_topk_sql(term_a: str, term_b: str, tie_breaker: float, k: int) -> str:
    """DisjunctionMaxQuery: max(score) + tieBreaker·(sum − max), double acc,
    cast float (DisjunctionMaxScorer)."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term_a)}, {_term_cte('b', term_b)},
unioned AS (
    SELECT doc_id, score FROM sc_a UNION ALL SELECT doc_id, score FROM sc_b
),
combined AS (
    SELECT doc_id,
           CAST(max(CAST(score AS DOUBLE)) +
                {tie_breaker} * (sum(CAST(score AS DOUBLE)) - max(CAST(score AS DOUBLE)))
                AS FLOAT) AS score
    FROM unioned GROUP BY doc_id
)
{_topk('combined', k)}
"""


def synonym_topk_sql(terms: list[str], k: int) -> str:
    """SynonymQuery: per-doc freq = SUM of member freqs, scored ONCE with
    docFreq = max over members (SynonymQuery.java)."""
    freq_unions = " UNION ALL ".join(
        f"SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{t}' GROUP BY doc_id"
        for t in terms
    )
    df_exprs = ", ".join(
        f"(SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{t}')" for t in terms
    )
    return f"""
WITH {BASE_CTES},
merged AS (
    SELECT doc_id, sum(freq)::INT AS freq FROM ({freq_unions}) GROUP BY doc_id
),
w AS (
    SELECT CAST(ln(1 + (fs.n - st.df + 0.5) / (st.df + 0.5)) AS FLOAT) AS w,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs, (SELECT greatest({df_exprs})::BIGINT AS df) st
),
sc AS (
    SELECT m.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(m.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(nm.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM merged m JOIN norm nm USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def msm_topk_sql(terms: list[str], msm: int, k: int) -> str:
    """SHOULD disjunction with minimumNumberShouldMatch
    (BooleanQuery.java:130-167): HAVING count >= msm, scores summed."""
    names = [f"t{i}" for i in range(len(terms))]
    ctes = ", ".join(_term_cte(n, t) for n, t in zip(names, terms))
    union = " UNION ALL ".join(f"SELECT doc_id, score FROM sc_{n}" for n in names)
    return f"""
WITH {BASE_CTES}, {ctes},
unioned AS ({union}),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM unioned GROUP BY doc_id HAVING count(*) >= {msm}
)
{_topk('combined', k)}
"""


def suggest_terms_sql(text: str, max_edits: int, k: int) -> str:
    """DirectSpellChecker ranking: (distance ASC, docFreq DESC, term ASC)."""
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq FROM toks GROUP BY term
)
SELECT term, CAST(levenshtein(term, '{text}') AS INT) AS distance, doc_freq
FROM ts
WHERE length(term) BETWEEN {len(text) - max_edits} AND {len(text) + max_edits}
  AND term <> '{text}'
  AND levenshtein(term, '{text}') <= {max_edits}
ORDER BY distance ASC, doc_freq DESC, term ASC
LIMIT {k}
"""


def term_vectors_sql(doc_ids: list[int]) -> str:
    ids = ", ".join(str(int(d)) for d in doc_ids)
    return f"""
WITH {BASE_CTES}
SELECT doc_id, term, count(*)::INT AS freq
FROM toks WHERE doc_id IN ({ids})
GROUP BY doc_id, term
ORDER BY doc_id, term
"""


def mlt_topk_sql(source_doc_id: int, max_terms: int, k: int) -> str:
    """MoreLikeThis: top tf·idf terms of the source doc → OR query, BM25."""
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
),
src_tf AS (
    SELECT term, count(*)::BIGINT AS freq FROM toks
    WHERE doc_id = {source_doc_id} GROUP BY term
),
sel AS (
    SELECT s.term
    FROM src_tf s JOIN ts USING (term) CROSS JOIN fs
    ORDER BY s.freq * ln(1 + (fs.n - ts.df + 0.5) / (ts.df + 0.5)) DESC, s.term ASC
    LIMIT {max_terms}
),
tf AS (
    SELECT doc_id, term, count(*)::INT AS freq FROM toks
    WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
),
w AS (
    SELECT ts.term,
           CAST(ln(1 + (fs.n - ts.df + 0.5) / (ts.df + 0.5)) AS FLOAT) AS w,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM ts, fs WHERE ts.term IN (SELECT term FROM sel)
),
sc AS (
    SELECT tf.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(tf.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(n.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM tf JOIN w USING (term) JOIN norm n USING (doc_id)
),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM sc GROUP BY doc_id
)
{_topk('combined', k)}
"""


def distinct_values_sql(term: str, col: str) -> str:
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT DISTINCT d.{col} AS value
FROM sc_a JOIN documents d USING (doc_id)
ORDER BY value
"""


def join_query_sql(term: str, from_col: str, to_col: str) -> str:
    """JoinUtil: docs whose ``to_col`` matches any hit's ``from_col``."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
keys AS (
    SELECT DISTINCT d.{from_col} AS k
    FROM sc_a JOIN documents d USING (doc_id)
)
SELECT doc_id FROM documents WHERE {to_col} IN (SELECT k FROM keys)
ORDER BY doc_id
"""


def drill_sideways_sql(term: str, source_val: str, lang_val: str) -> str:
    """Two-dim drill-sideways: each dim's counts exclude its own filter."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT 'source' AS dim, d.source AS label, count(*)::BIGINT AS n
FROM sc_a JOIN documents d USING (doc_id)
WHERE d.lang = '{lang_val}'
GROUP BY d.source
UNION ALL
SELECT 'lang' AS dim, d.lang AS label, count(*)::BIGINT AS n
FROM sc_a JOIN documents d USING (doc_id)
WHERE d.source = '{source_val}'
GROUP BY d.lang
ORDER BY dim, label
"""


def hybrid_range_topk_sql(term: str, value_col: str, lo: int, hi: int, k: int) -> str:
    """BM25 term + numeric doc-values range filter (PointRangeQuery /
    IndexOrDocValuesQuery pattern: the filter contributes no score)."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT doc_id, CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS INT) AS rank
FROM sc_a JOIN documents d USING (doc_id)
WHERE d.{value_col} BETWEEN {lo} AND {hi}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def facet_counts_sql(term: str, facet_col: str) -> str:
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT d.{facet_col} AS label, count(*)::BIGINT AS n
FROM sc_a JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY n DESC, label ASC
"""


def range_facet_sql(term: str, value_col: str, ranges) -> str:
    case = " ".join(
        f"WHEN d.{value_col} >= {lo} AND d.{value_col} < {hi} THEN '{label}'"
        for label, lo, hi in ranges
    )
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT label, count(*)::BIGINT AS n
FROM (
    SELECT CASE {case} END AS label
    FROM sc_a JOIN documents d USING (doc_id)
)
WHERE label IS NOT NULL
GROUP BY 1 ORDER BY label ASC
"""


def grouped_topk_sql(term: str, group_col: str, k_per_group: int) -> str:
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT {group_col}, doc_id, CAST(score AS DOUBLE) AS score, grp_rank
FROM (
    SELECT sc_a.doc_id, sc_a.score, d.{group_col},
           CAST(row_number() OVER (
               PARTITION BY d.{group_col}
               ORDER BY sc_a.score DESC, sc_a.doc_id ASC) - 1 AS INT) AS grp_rank
    FROM sc_a JOIN documents d USING (doc_id)
)
WHERE grp_rank < {k_per_group}
ORDER BY {group_col} ASC, grp_rank ASC
"""


def block_join_sql(term: str, parent_col: str, score_mode: str = "max") -> str:
    agg = {"max": "max", "sum": "sum", "avg": "avg", "min": "min"}[score_mode]
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT d.{parent_col} AS parent,
       CAST(CAST({agg}(CAST(score AS DOUBLE)) AS FLOAT) AS DOUBLE) AS score,
       count(*)::BIGINT AS n_children
FROM sc_a JOIN documents d USING (doc_id)
GROUP BY 1 ORDER BY score DESC, parent ASC
"""


def search_after_sql(term: str, k: int) -> str:
    """Page 2 of the term top-k: identical ordering, OFFSET k."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT doc_id,
       CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 - {k} AS INT) AS rank
FROM sc_a
ORDER BY score DESC, doc_id ASC
LIMIT {k} OFFSET {k}
"""


def rrf_sql(term_a: str, term_b: str, rrf_k: int, top_n: int) -> str:
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term_a)}, {_term_cte('b', term_b)},
ra AS (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn FROM sc_a
),
rb AS (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn FROM sc_b
),
u AS (
    SELECT doc_id, CAST(1.0 AS DOUBLE) / ({rrf_k} + rn) AS rr FROM ra
    UNION ALL
    SELECT doc_id, CAST(1.0 AS DOUBLE) / ({rrf_k} + rn) AS rr FROM rb
)
SELECT doc_id, sum(rr) AS rrf_score
FROM u GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {top_n}
"""


def classic_term_topk_sql(term: str, k: int) -> str:
    """ClassicSimilarity (TF-IDF): idf=(f32)(ln((N+1)/(df+1))+1), tf=(f32)
    sqrt(freq), lengthNorm=(f32)(1/sqrt(qlen)); score = (w·tf)·norm with
    per-op float32 rounding (TFIDFSimilarity.java)."""
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
w AS (
    SELECT CAST(ln((fs.n + 1) / CAST(st.df + 1 AS DOUBLE)) + 1.0 AS FLOAT) AS w
    FROM fs, (SELECT count(*)::BIGINT AS df FROM tf_a) st
),
sc AS (
    SELECT tf.doc_id,
           CAST(CAST(w.w * CAST(sqrt(CAST(tf.freq AS DOUBLE)) AS FLOAT) AS FLOAT)
                * CAST(1.0 / sqrt(CAST(n.qlen AS DOUBLE)) AS FLOAT) AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def boolean_sim_term_topk_sql(term: str, k: int) -> str:
    """BooleanSimilarity: every match scores the boost (1.0)."""
    return f"""
WITH {BASE_CTES},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE term = '{term}')
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY doc_id ASC) - 1 AS INT) AS rank
FROM matched ORDER BY doc_id ASC LIMIT {k}
"""


def _constant_score_docs_sql(term_cond: str, k: int) -> str:
    """CONSTANT_SCORE multi-term rewrite (MultiTermQuery.java:80-128): docs
    containing ANY term matching ``term_cond``, score 1.0, docID order."""
    return f"""
WITH {BASE_CTES},
matched AS (SELECT DISTINCT doc_id FROM toks WHERE {term_cond})
SELECT doc_id, CAST(1.0 AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY doc_id ASC) - 1 AS INT) AS rank
FROM matched ORDER BY doc_id ASC LIMIT {k}
"""


def prefix_topk_sql(prefix: str, k: int) -> str:
    return _constant_score_docs_sql(f"term LIKE '{prefix}%'", k)


def wildcard_topk_sql(like_pattern: str, k: int) -> str:
    return _constant_score_docs_sql(f"term LIKE '{like_pattern}'", k)


def fuzzy_topk_sql(
    term: str, max_edits: int, k: int, transpositions: bool = True
) -> str:
    """Constant-score fuzzy expansion.  With ``transpositions`` (Lucene's
    FuzzyQuery default, ``FuzzyQuery.java:82-91``) the distance counts an
    adjacent transposition as ONE edit.  DuckDB's ``damerau_levenshtein``
    is the unrestricted variant while Lucene's automaton is OSA
    (TestLevenshteinAutomata.getTDistance) — identical for max_edits <= 1
    (both metrics classify a pair the same at distance 0/1), which is the
    envelope the gates use."""
    dist = "damerau_levenshtein" if transpositions else "levenshtein"
    return _constant_score_docs_sql(
        f"length(term) BETWEEN {len(term) - max_edits} AND {len(term) + max_edits} "
        f"AND {dist}(term, '{term}') <= {max_edits}",
        k,
    )


def sort_by_field_sql(term: str, value_col: str, k: int) -> str:
    """TopFieldCollector: hit set sorted by (value_col DESC, doc_id ASC)."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)}
SELECT doc_id, CAST(d.{value_col} AS BIGINT) AS {value_col},
       CAST(row_number() OVER (ORDER BY d.{value_col} DESC, doc_id ASC) - 1 AS INT) AS rank
FROM sc_a JOIN documents d USING (doc_id)
ORDER BY d.{value_col} DESC, doc_id ASC
LIMIT {k}
"""


def function_score_sql(expr: str, k: int) -> str:
    """FunctionQuery analog: score = SQL expression over doc columns."""
    return f"""
SELECT doc_id, CAST({expr} AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY CAST({expr} AS DOUBLE) DESC, doc_id ASC) - 1 AS INT) AS rank
FROM documents
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def sloppy_phrase_topk_sql(term_a: str, term_b: str, slop: int, k: int) -> str:
    """Two-term sloppy phrase with Lucene ``SloppyPhraseMatcher`` semantics.

    For two distinct terms the pq leapfrog reduces to a *leader chain*
    (equivalence fuzz-verified against the matcher): the first leader is the
    larger of the two first shifted positions; each leader L (from list X)
    emits one match ``matchLength = L - max{other ≤ L}`` and hands off to
    the next leader ``min{other > L}``, alternating lists until exhaustion.
    ``sloppyFreq`` is the float32 *sequential* sum of ``1/(1+matchLength)``
    over matches with matchLength <= slop in chain order
    (``PhraseScorer.java:85-95`` accumulates freq in float), and BM25 is
    scored with that fractional float freq."""
    return f"""
WITH RECURSIVE {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
pa AS (SELECT doc_id, pos AS s FROM tp WHERE term = '{term_a}'),
pb AS (SELECT doc_id, pos - 1 AS s FROM tp WHERE term = '{term_b}'),
f0 AS (
    SELECT a.doc_id, a.ma, b.mb
    FROM (SELECT doc_id, min(s) AS ma FROM pa GROUP BY doc_id) a
    JOIN (SELECT doc_id, min(s) AS mb FROM pb GROUP BY doc_id) b USING (doc_id)
),
chain AS (
    SELECT doc_id,
           CASE WHEN ma > mb THEN ma ELSE mb END AS leader,
           CASE WHEN ma > mb THEN 'a' ELSE 'b' END AS side,
           0 AS step
    FROM f0
    UNION ALL
    SELECT c.doc_id,
           CASE WHEN c.side = 'a'
                THEN (SELECT min(s) FROM pb WHERE pb.doc_id = c.doc_id AND pb.s > c.leader)
                ELSE (SELECT min(s) FROM pa WHERE pa.doc_id = c.doc_id AND pa.s > c.leader)
           END,
           CASE WHEN c.side = 'a' THEN 'b' ELSE 'a' END,
           c.step + 1
    FROM chain c
    WHERE (CASE WHEN c.side = 'a'
                THEN (SELECT min(s) FROM pb WHERE pb.doc_id = c.doc_id AND pb.s > c.leader)
                ELSE (SELECT min(s) FROM pa WHERE pa.doc_id = c.doc_id AND pa.s > c.leader)
           END) IS NOT NULL
),
mt AS (
    SELECT c.doc_id, c.step,
           c.leader - (CASE WHEN c.side = 'a'
                THEN (SELECT max(s) FROM pb WHERE pb.doc_id = c.doc_id AND pb.s <= c.leader)
                ELSE (SELECT max(s) FROM pa WHERE pa.doc_id = c.doc_id AND pa.s <= c.leader)
           END) AS ml
    FROM chain c
),
fr AS (
    SELECT doc_id, list(CAST(ml AS INT) ORDER BY step) FILTER (WHERE ml <= {slop}) AS mls
    FROM mt GROUP BY doc_id
),
mm AS (
    SELECT doc_id,
           list_reduce(
               list_transform(mls, m -> CAST({F1} / ({F1} + CAST(m AS FLOAT)) AS FLOAT)),
               (acc, x) -> CAST(acc + x AS FLOAT)
           ) AS freq
    FROM fr WHERE mls IS NOT NULL AND len(mls) > 0
),
w AS (
    SELECT CAST(
        CAST(CAST(ln(1 + (fs.n - (SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_a}') + 0.5)
             / ((SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_a}') + 0.5)) AS FLOAT) AS DOUBLE)
      + CAST(CAST(ln(1 + (fs.n - (SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_b}') + 0.5)
             / ((SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_b}') + 0.5)) AS FLOAT) AS DOUBLE)
      AS FLOAT) AS w,
      CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs
),
sc AS (
    SELECT mm.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(mm.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(nm.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM mm JOIN norm nm USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def sloppy_phrase_repeats_topk_sql(term_x: str, term_y: str, slop: int, k: int) -> str:
    """Repeated-term sloppy phrase ``"X Y X"~slop`` — a faithful SQL
    simulation of ``SloppyPhraseMatcher`` INCLUDING the repeats algebra
    (``SloppyPhraseMatcher.java:392-480``), specialized to the one repeat
    group {stream0, stream2} sharing term X:

    * streams: s0 = X positions (offset 0), s1 = Y - 1, s2 = X - 2; s0 and
      s2 index the SAME position list (ia/ic),
    * init (advanceRepeatGroups): ic starts one ahead of ia (group sorted
      by offset; stream j starts j advanced),
    * the only possible collision is s0 advancing onto s2's slot
      (ia == ic); the lesser by (position, offset) is always s2 (same doc
      position, larger offset ⇒ smaller shifted position), so the
      resolution is ``ic += 1`` — after which no collision remains
      (positions are strictly increasing),
    * the recursive CTE steps the exact nextMatch state machine: advance
      the held stream ``cur``; on exhaustion emit the final match; if the
      held stream overtook ``nxt`` (stale-by-design: recomputed only at
      re-pop, as in the reference) emit and re-pop the (pos, offset)-min;
      otherwise keep minimizing matchLength,
    * sloppyFreq = sequential float32 sum of 1/(1+matchLength) over
      emissions; BM25 weight = float32(Σ double(float32 idf)) with X's idf
      counted TWICE (one termStates entry per phrase slot).

    Fuzz-verified equivalent to :func:`lucene_spark.search.searcher.
    sloppy_phrase_freq` with rpt_groups=((0, 2),) in tests.
    """
    idf = (
        "CAST(CAST(ln(1 + (fs.n - (SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{t}') + 0.5) "
        "/ ((SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{t}') + 0.5)) AS FLOAT) AS DOUBLE)"
    )
    idf_sum = " + ".join(
        [idf.format(t=term_x), idf.format(t=term_y), idf.format(t=term_x)]
    )
    return f"""
WITH RECURSIVE {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
lxs AS (SELECT doc_id, list(pos ORDER BY pos) AS lx FROM tp WHERE term = '{term_x}' GROUP BY doc_id),
lys AS (SELECT doc_id, list(pos ORDER BY pos) AS ly FROM tp WHERE term = '{term_y}' GROUP BY doc_id),
st0 AS (
    SELECT l.doc_id, l.lx, y.ly,
           1 AS ia, 1 AS ib, 2 AS ic,
           l.lx[1] AS p0, y.ly[1] - 1 AS p1, l.lx[2] - 2 AS p2
    FROM lxs l JOIN lys y USING (doc_id)
    WHERE len(l.lx) >= 2
),
chain AS (
    SELECT doc_id, lx, ly, ia, ib, ic, p0, p1, p2,
           greatest(p0, p1, p2) AS e,
           CASE WHEN p0 <= p1 AND p0 <= p2 THEN 0
                WHEN p1 <= p2 THEN 1 ELSE 2 END AS cur,
           greatest(p0, p1, p2) - least(p0, p1, p2) AS ml,
           CASE WHEN p0 <= p1 AND p0 <= p2 THEN least(p1, p2)
                WHEN p1 <= p2 THEN least(p0, p2) ELSE least(p0, p1) END AS nxt,
           CAST([] AS INT[]) AS mls,
           FALSE AS done
    FROM st0
    UNION ALL
    SELECT doc_id, lx, ly, ia1 AS ia, ib1 AS ib, ic2 AS ic,
           p0n AS p0, p1n AS p1, p2n AS p2, e1 AS e,
           CASE WHEN exhausted THEN cur
                WHEN cpos > nxt THEN
                    CASE WHEN p0n <= p1n AND p0n <= p2n THEN 0
                         WHEN p1n <= p2n THEN 1 ELSE 2 END
                ELSE cur END AS cur,
           CASE WHEN exhausted THEN ml
                WHEN cpos > nxt THEN
                    e1 - least(p0n, p1n, p2n)
                ELSE least(ml, e1 - cpos) END AS ml,
           CASE WHEN exhausted THEN nxt
                WHEN cpos > nxt THEN
                    CASE WHEN p0n <= p1n AND p0n <= p2n THEN least(p1n, p2n)
                         WHEN p1n <= p2n THEN least(p0n, p2n)
                         ELSE least(p0n, p1n) END
                ELSE nxt END AS nxt,
           CASE WHEN (exhausted OR cpos > nxt) AND ml <= {slop}
                THEN mls || [CAST(ml AS INT)] ELSE mls END AS mls,
           exhausted AS done
    FROM (
        SELECT *,
               CASE WHEN exhausted THEN NULL
                    WHEN cur = 0 THEN p0n WHEN cur = 1 THEN p1n ELSE p2n
               END AS cpos,
               CASE WHEN exhausted THEN e
                    ELSE greatest(e, coalesce(p0n, e), coalesce(p1n, e), coalesce(p2n, e))
               END AS e1
        FROM (
            SELECT *,
                   (CASE WHEN cur = 0 THEN ia1 > len(lx)
                         WHEN cur = 1 THEN ib1 > len(ly)
                         ELSE FALSE END)
                   OR (cur2_adv AND ic2 > len(lx)) AS exhausted,
                   CASE WHEN cur = 0 AND ia1 <= len(lx) THEN lx[ia1] ELSE p0 END AS p0n,
                   CASE WHEN cur = 1 AND ib1 <= len(ly) THEN ly[ib1] - 1 ELSE p1 END AS p1n,
                   CASE WHEN cur2_adv AND ic2 <= len(lx) THEN lx[ic2] - 2 ELSE p2 END AS p2n
            FROM (
                SELECT *,
                       (cur = 2) OR (cur = 0 AND ia1 <= len(lx) AND ia1 = ic) AS cur2_adv,
                       CASE WHEN cur = 2 THEN ic + 1
                            WHEN cur = 0 AND ia1 <= len(lx) AND ia1 = ic THEN ic + 1
                            ELSE ic END AS ic2
                FROM (
                    SELECT *,
                           ia + CASE WHEN cur = 0 THEN 1 ELSE 0 END AS ia1,
                           ib + CASE WHEN cur = 1 THEN 1 ELSE 0 END AS ib1
                    FROM chain WHERE NOT done
                )
            )
        )
    )
),
fr AS (
    SELECT doc_id, mls FROM chain WHERE done AND len(mls) > 0
),
mm AS (
    SELECT doc_id,
           list_reduce(
               list_transform(mls, m -> CAST({F1} / ({F1} + CAST(m AS FLOAT)) AS FLOAT)),
               (acc, x) -> CAST(acc + x AS FLOAT)
           ) AS freq
    FROM fr
),
w AS (
    SELECT CAST({idf_sum} AS FLOAT) AS w,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs
),
sc AS (
    SELECT mm.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(mm.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(nm.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM mm JOIN norm nm USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def interval_ordered_near_topk_sql(
    term_a: str, term_b: str, max_width: int, k: int
) -> str:
    """``IntervalQuery(field, maxwidth(w, ordered(a, b)))`` top-k.

    Minimal ordered intervals (``OrderedIntervalsSource``): s an A-position,
    e = min{B > s}, keep max s per distinct e; width filter <= max_width;
    freq = sequential float32 accumulation of double ``1.0/max(len-1, 1)``
    (minExtent=2, ``IntervalScorer.java:59-68`` compound assignment);
    score = saturation ``1f - pivot/(pivot + freq)`` with pivot=1
    (``IntervalScoreFunction.java:66-74``)."""
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
pa AS (SELECT doc_id, pos FROM tp WHERE term = '{term_a}'),
pb AS (SELECT doc_id, pos FROM tp WHERE term = '{term_b}'),
cand AS (
    SELECT a.doc_id, a.pos AS s,
           (SELECT min(b.pos) FROM pb b
            WHERE b.doc_id = a.doc_id AND b.pos > a.pos) AS e
    FROM pa a
),
mins AS (
    SELECT doc_id, e, max(s) AS s FROM cand WHERE e IS NOT NULL
    GROUP BY doc_id, e
),
kept AS (SELECT * FROM mins WHERE e - s + 1 <= {max_width}),
fr AS (
    SELECT doc_id, list(e - s ORDER BY s) AS lens FROM kept GROUP BY doc_id
),
mm AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list_transform(lens, L -> 1.0 / greatest(L, 1))),
               (acc, x) -> CAST(acc + x AS FLOAT)
           ) AS freq
    FROM fr
),
sc AS (
    SELECT doc_id,
           CAST({F1} - {F1} / ({F1} + CAST(freq AS FLOAT)) AS FLOAT) AS score
    FROM mm WHERE freq > 0
)
{_topk('sc', k)}
"""


# --- full intervals algebra oracles (round 4) ------------------------------
# Shared recipe: term positions with stopword holes, an interval-set CTE
# named `kept(doc_id, s, e)` per combinator, then the IntervalScorer freq
# (float32 accumulation of double 1/max(len - minExtent + 1, 1) in emission
# order = s ascending) and the saturation score with pivot = 1.


def _interval_tp_ctes(terms: dict) -> str:
    """words/tp plus one positions CTE per (cte_name -> term)."""
    per_term = ",\n".join(
        f"p{name} AS (SELECT doc_id, pos FROM tp WHERE term = '{t}')"
        for name, t in terms.items()
    )
    return f"""
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
{per_term}"""


def _interval_score_sql(min_extent: int, k: int) -> str:
    """freq + saturation score + top-k over a `kept(doc_id, s, e)` CTE."""
    return f""",
fr AS (
    SELECT doc_id, list(e - s + 1 ORDER BY s) AS lens FROM kept GROUP BY doc_id
),
mm AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list_transform(lens,
                                L -> 1.0 / greatest(L - {min_extent} + 1, 1))),
               (acc, x) -> CAST(acc + x AS FLOAT)
           ) AS freq
    FROM fr
),
sc AS (
    SELECT doc_id,
           CAST({F1} - {F1} / ({F1} + CAST(freq AS FLOAT)) AS FLOAT) AS score
    FROM mm WHERE freq > 0
)
{_topk('sc', k)}
"""


def _ordered_pair_ctes(prefix: str, pa: str, pb: str) -> str:
    """Minimal ordered-pair intervals `<prefix>m(doc_id, s, e)` from two
    position CTEs (greedy next-B per A-start, keep max s per distinct e)."""
    return f"""
{prefix}c AS (
    SELECT a.doc_id, a.pos AS s,
           (SELECT min(b.pos) FROM {pb} b
            WHERE b.doc_id = a.doc_id AND b.pos > a.pos) AS e
    FROM {pa} a
),
{prefix}m AS (
    SELECT doc_id, e, max(s) AS s FROM {prefix}c WHERE e IS NOT NULL
    GROUP BY doc_id, e
)"""


def interval_ordered3_topk_sql(
    term_a: str, term_b: str, term_c: str, max_width: int, k: int
) -> str:
    """``IntervalQuery(maxwidth(w, ordered(a, b, c)))`` — n-ary minimal
    ordered intervals (``OrderedIntervalsSource.java:123-181`` greedy chain,
    max start per distinct end), minExtent = 3."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'c': term_c})},
cand AS (
    SELECT a.doc_id, a.pos AS s,
           (SELECT min(c2.pos) FROM pc c2
            WHERE c2.doc_id = a.doc_id
              AND c2.pos > (SELECT min(b2.pos) FROM pb b2
                            WHERE b2.doc_id = a.doc_id AND b2.pos > a.pos)
           ) AS e
    FROM pa a
),
mins AS (
    SELECT doc_id, e, max(s) AS s FROM cand WHERE e IS NOT NULL
    GROUP BY doc_id, e
),
kept AS (SELECT doc_id, s, e FROM mins WHERE e - s + 1 <= {max_width})
{_interval_score_sql(3, k)}
"""


def interval_unordered3_topk_sql(
    term_a: str, term_b: str, term_c: str, max_width: int, k: int
) -> str:
    """``IntervalQuery(maxwidth(w, unordered(a, b, c)))`` — minimal covering
    windows (``UnorderedIntervalsSource.java:142-172``): per merged position
    e, window starts at the least of the per-term latest occurrences <= e;
    minimality keeps the smallest e per distinct start.  minExtent = 3."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'c': term_c})},
merged AS (
    SELECT doc_id, pos FROM pa
    UNION ALL SELECT doc_id, pos FROM pb
    UNION ALL SELECT doc_id, pos FROM pc
),
win AS (
    SELECT m.doc_id, m.pos AS e,
           (SELECT max(pos) FROM pa x
            WHERE x.doc_id = m.doc_id AND x.pos <= m.pos) AS la,
           (SELECT max(pos) FROM pb x
            WHERE x.doc_id = m.doc_id AND x.pos <= m.pos) AS lb,
           (SELECT max(pos) FROM pc x
            WHERE x.doc_id = m.doc_id AND x.pos <= m.pos) AS lc
    FROM merged m
),
valid AS (
    SELECT doc_id, least(la, lb, lc) AS s, e FROM win
    WHERE la IS NOT NULL AND lb IS NOT NULL AND lc IS NOT NULL
),
mins AS (SELECT doc_id, s, min(e) AS e FROM valid GROUP BY doc_id, s),
kept AS (SELECT doc_id, s, e FROM mins WHERE e - s + 1 <= {max_width})
{_interval_score_sql(3, k)}
"""


def interval_or_maxgaps_topk_sql(
    term_a: str, term_b: str, term_c: str, term_d: str, max_gaps: int, k: int
) -> str:
    """``IntervalQuery(maxgaps(g, or(ordered(a, b), ordered(c, d))))`` —
    the maxgaps filter distributes over the disjunction
    (``FilteredIntervalsSource.maxGaps``), then the or-merge keeps the
    containment-minimal deduplicated union
    (``DisjunctionIntervalsSource.java:222-247``).  minExtent = 2."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'c': term_c, 'd': term_d})},
{_ordered_pair_ctes('b1', 'pa', 'pb').lstrip()},
{_ordered_pair_ctes('b2', 'pc', 'pd').lstrip()},
u AS (
    SELECT DISTINCT doc_id, s, e FROM (
        SELECT doc_id, s, e FROM b1m WHERE e - s - 1 <= {max_gaps}
        UNION ALL
        SELECT doc_id, s, e FROM b2m WHERE e - s - 1 <= {max_gaps}
    )
),
kept AS (
    SELECT doc_id, s, e FROM u t
    WHERE NOT EXISTS (
        SELECT 1 FROM u o
        WHERE o.doc_id = t.doc_id AND o.s >= t.s AND o.e <= t.e
          AND (o.s <> t.s OR o.e <> t.e)
    )
)
{_interval_score_sql(2, k)}
"""


def interval_contained_by_topk_sql(
    term_x: str, term_a: str, term_b: str, big_width: int, k: int
) -> str:
    """``IntervalQuery(containedBy(term(x), maxwidth(w, ordered(a, b))))``
    (``ContainedByIntervalsSource.java:42-67``; for minimal families the
    streaming check is EXISTS containment).  minExtent = 1 (the small
    source's)."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'x': term_x, 'a': term_a, 'b': term_b})},
{_ordered_pair_ctes('bg', 'pa', 'pb').lstrip()},
bk AS (SELECT doc_id, s, e FROM bgm WHERE e - s + 1 <= {big_width}),
kept AS (
    SELECT x.doc_id, x.pos AS s, x.pos AS e FROM px x
    WHERE EXISTS (
        SELECT 1 FROM bk b
        WHERE b.doc_id = x.doc_id AND b.s <= x.pos AND b.e >= x.pos
    )
)
{_interval_score_sql(1, k)}
"""


def interval_not_containing_topk_sql(
    term_a: str, term_b: str, term_x: str, max_width: int, k: int
) -> str:
    """``IntervalQuery(notContaining(maxwidth(w, ordered(a, b)), term(x)))``
    (``NotContainingIntervalsSource.java:70-86``; for a point subtrahend the
    streaming semantics reduce to "no x position inside the interval").
    minExtent = 2 (the minuend's)."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'x': term_x})},
{_ordered_pair_ctes('mn', 'pa', 'pb').lstrip()},
mk AS (SELECT doc_id, s, e FROM mnm WHERE e - s + 1 <= {max_width}),
kept AS (
    SELECT m.doc_id, m.s, m.e FROM mk m
    WHERE NOT EXISTS (
        SELECT 1 FROM px x
        WHERE x.doc_id = m.doc_id AND x.pos >= m.s AND x.pos <= m.e
    )
)
{_interval_score_sql(2, k)}
"""


# --- spans oracles (round 4) ------------------------------------------------
# The spans API translates to the intervals algebra (search/spans.py), so
# each oracle is the corresponding interval-set query: ordered-pair minimal
# intervals, gap filters, and point containment tests.


def span_near_ordered_topk_sql(term_a: str, term_b: str, slop: int, k: int) -> str:
    """``SpanNearQuery([a, b], slop, inOrder=true)`` ⇔ maxgaps(slop,
    ordered(a, b)): pair gaps = e - s - 1 ≤ slop.  minExtent = 2."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b})},
{_ordered_pair_ctes('sp', 'pa', 'pb').lstrip()},
kept AS (SELECT doc_id, s, e FROM spm WHERE e - s - 1 <= {slop})
{_interval_score_sql(2, k)}
"""


def span_first_topk_sql(term: str, n: int, k: int) -> str:
    """``SpanFirstQuery(term, n)``: positions with exclusive end ≤ n.
    minExtent = 1."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'x': term})},
kept AS (SELECT doc_id, pos AS s, pos AS e FROM px WHERE pos < {n})
{_interval_score_sql(1, k)}
"""


def span_not_topk_sql(
    term_a: str, term_b: str, slop: int, term_x: str, pre: int, post: int, k: int
) -> str:
    """``SpanNotQuery(near(a, b, slop), x, pre, post)``: include pairs whose
    [s-pre, e+post] window holds no x position (point exclude: overlap ==
    window membership).  minExtent = 2."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'x': term_x})},
{_ordered_pair_ctes('mn', 'pa', 'pb').lstrip()},
mk AS (SELECT doc_id, s, e FROM mnm WHERE e - s - 1 <= {slop}),
kept AS (
    SELECT m.doc_id, m.s, m.e FROM mk m
    WHERE NOT EXISTS (
        SELECT 1 FROM px x
        WHERE x.doc_id = m.doc_id
          AND x.pos >= m.s - {pre} AND x.pos <= m.e + {post}
    )
)
{_interval_score_sql(2, k)}
"""


def span_containing_topk_sql(
    term_a: str, term_b: str, slop: int, term_x: str, k: int
) -> str:
    """``SpanContainingQuery(near(a, b, slop), x)``: big pairs containing an
    x position.  minExtent = 2 (the big source's)."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'x': term_x})},
{_ordered_pair_ctes('bg', 'pa', 'pb').lstrip()},
bk AS (SELECT doc_id, s, e FROM bgm WHERE e - s - 1 <= {slop}),
kept AS (
    SELECT b.doc_id, b.s, b.e FROM bk b
    WHERE EXISTS (
        SELECT 1 FROM px x
        WHERE x.doc_id = b.doc_id AND x.pos >= b.s AND x.pos <= b.e
    )
)
{_interval_score_sql(2, k)}
"""


# --- round-5 intervals oracles ----------------------------------------------
# New combinators: phrase (block), atLeast, before/within composition,
# repeats, overlapping, multi-term (prefix) sources.  Same recipe as the
# round-4 family: an interval-set CTE `kept(doc_id, s, e)` per combinator
# derived from the combinator's SEMANTICS (set algebra over positions, not a
# transcription of the engine), then the shared IntervalScorer float32
# saturation pipeline.


def interval_phrase_topk_sql(term_a: str, term_b: str, k: int) -> str:
    """``IntervalQuery(phrase(a, b))`` (``BlockIntervalsSource``): b exactly
    one position after a; gaps 0; minExtent = 2 ⇒ every block contributes
    1/1 to the scorer freq."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b})},
kept AS (
    SELECT a.doc_id, a.pos AS s, a.pos + 1 AS e
    FROM pa a JOIN pb b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
)
{_interval_score_sql(2, k)}
"""


def interval_at_least_topk_sql(
    term_a: str, term_b: str, term_c: str, m: int, k: int
) -> str:
    """``IntervalQuery(atLeast(m, a, b, c))``
    (``MinimumShouldMatchIntervalsSource``): containment-minimal covers of
    every m-subset of the sub-sources (single terms here, so each 2-subset
    contributes all (least, greatest) position pairs).  minExtent = m.

    The streaming iterator can skip covers in a corner case (a sub-source
    exhausting while leading — see test_intervals_round5) — the gate terms
    were verified cover-exact on the gate corpora before wiring."""
    assert m == 2, "oracle written for the m=2-of-3 gate shape"
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'c': term_c})},
covers AS (
    SELECT x.doc_id, least(x.pos, y.pos) AS s, greatest(x.pos, y.pos) AS e
    FROM pa x JOIN pb y ON y.doc_id = x.doc_id
    UNION ALL
    SELECT x.doc_id, least(x.pos, y.pos), greatest(x.pos, y.pos)
    FROM pa x JOIN pc y ON y.doc_id = x.doc_id
    UNION ALL
    SELECT x.doc_id, least(x.pos, y.pos), greatest(x.pos, y.pos)
    FROM pb x JOIN pc y ON y.doc_id = x.doc_id
),
u AS (SELECT DISTINCT doc_id, s, e FROM covers),
kept AS (
    SELECT doc_id, s, e FROM u t
    WHERE NOT EXISTS (
        SELECT 1 FROM u o
        WHERE o.doc_id = t.doc_id AND o.s >= t.s AND o.e <= t.e
          AND (o.s <> t.s OR o.e <> t.e)
    )
)
{_interval_score_sql(m, k)}
"""


def interval_before_within_topk_sql(
    term_a: str, term_b: str, term_c: str, positions: int, k: int
) -> str:
    """``IntervalQuery(within(before(a, b), p, c))`` — a-positions that (1)
    end before some b interval starts (``Intervals.before`` =
    containedBy(a, extend(PRECEDING(b), MAX, 0))) and (2) lie within p
    positions of some c interval (``Intervals.within`` = containedBy(·,
    extend(c, p, p))).  minExtent = 1 ⇒ each kept position adds 1.0."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'c': term_c})},
kept AS (
    SELECT a.doc_id, a.pos AS s, a.pos AS e FROM pa a
    WHERE EXISTS (SELECT 1 FROM pb b
                  WHERE b.doc_id = a.doc_id AND b.pos > a.pos)
      AND EXISTS (SELECT 1 FROM pc c
                  WHERE c.doc_id = a.doc_id
                    AND a.pos >= c.pos - {positions}
                    AND a.pos <= c.pos + {positions})
)
{_interval_score_sql(1, k)}
"""


def interval_repeat_topk_sql(term: str, max_width: int, k: int) -> str:
    """``IntervalQuery(maxwidth(w, ordered(t, t)))`` —
    ``RepeatingIntervalsSource`` windows over consecutive occurrence pairs.
    minExtent = 1 (the reference's Repeating quirk: the SUB extent, not
    count×) ⇒ each window of length L adds 1/L."""
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
px AS (SELECT doc_id, pos FROM tp WHERE term = '{term}'),
win AS (
    SELECT doc_id, pos AS s,
           lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS e
    FROM px
),
kept AS (
    SELECT doc_id, s, e FROM win
    WHERE e IS NOT NULL AND e - s + 1 <= {max_width}
)
{_interval_score_sql(1, k)}
"""


def interval_overlapping_topk_sql(
    term_a: str, term_b: str, term_c: str, term_d: str, k: int
) -> str:
    """``IntervalQuery(overlapping(ordered(a, b), ordered(c, d)))``
    (``OverlappingIntervalsSource``): source pairs touching some reference
    pair.  minExtent = 2 (the source's)."""
    return f"""
WITH {BASE_CTES},{_interval_tp_ctes({'a': term_a, 'b': term_b, 'c': term_c, 'd': term_d})},
{_ordered_pair_ctes('sr', 'pa', 'pb').lstrip()},
{_ordered_pair_ctes('rf', 'pc', 'pd').lstrip()},
kept AS (
    SELECT m.doc_id, m.s, m.e FROM srm m
    WHERE EXISTS (
        SELECT 1 FROM rfm r
        WHERE r.doc_id = m.doc_id AND r.s <= m.e AND r.e >= m.s
    )
)
{_interval_score_sql(2, k)}
"""


def interval_prefix_near_topk_sql(
    prefix: str, term_b: str, max_gaps: int, k: int
) -> str:
    """``IntervalQuery(maxgaps(g, ordered(prefix(p), b)))`` — the multi-term
    interval source (``Intervals.prefix`` → ``MultiTermIntervalsSource``):
    the prefix expands to the or of every matching vocabulary term, whose
    minimal union over single-word positions is simply every position whose
    token matches the prefix.  Also the oracle for the surround query
    ``(g+1)W(p*, b)``.  minExtent = 2."""
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
pa AS (SELECT doc_id, pos FROM tp WHERE term LIKE '{prefix}%'),
pb AS (SELECT doc_id, pos FROM tp WHERE term = '{term_b}'),
{_ordered_pair_ctes('mx', 'pa', 'pb').lstrip()},
kept AS (SELECT doc_id, s, e FROM mxm WHERE e - s - 1 <= {max_gaps})
{_interval_score_sql(2, k)}
"""


def term_count_sql(term: str) -> str:
    return f"""
WITH {BASE_CTES}
SELECT count(DISTINCT doc_id)::BIGINT AS n_hits FROM toks WHERE term = '{term}'
"""


def doclens_norms_sql() -> str:
    """Full doclens table incl. the norm *byte* code (int_to_byte4 in SQL)."""
    return f"""
WITH {BASE_CTES}
SELECT doc_id,
       CAST(len AS INT) AS len,
       CAST(CASE WHEN len < 32 THEN len
                 ELSE 24 + (((length(bin(len - 24)) - 4 + 1) * 8)
                            + (((len - 24) >> (length(bin(len - 24)) - 4)) & 7))
            END AS SMALLINT) AS norm_byte,
       CAST(CASE WHEN len < 32 THEN len
                 ELSE 24 + (((len - 24) >> (length(bin(len - 24)) - 4))
                            << (length(bin(len - 24)) - 4))
            END AS BIGINT) AS qlen
FROM norm
ORDER BY doc_id
"""


def termstats_topn_sql(n: int) -> str:
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq,
           count(*)::BIGINT AS total_term_freq
    FROM toks GROUP BY term
)
SELECT term, doc_freq, total_term_freq
FROM ts ORDER BY doc_freq DESC, term ASC LIMIT {n}
"""


def term_topk_after_delete_merge_sql(term: str, deleted_term: str, k: int) -> str:
    """Lifecycle oracle: deleteDocuments(Term(deleted_term)) + merge (physical
    compaction, delete-aware stats refresh) + BM25 term top-k.  The corpus is
    exactly the documents NOT containing ``deleted_term``; stats (docFreq,
    avgdl, docCount) shrink accordingly — this is what distinguishes a real
    compaction from a query-time MUST_NOT."""
    corpus = f"""
docs2 AS (
    SELECT d.doc_id, d.text FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM (
            SELECT doc_id, t.term AS term
            FROM documents, unnest(string_split(text, ' ')) AS t(term)
        ) t0 WHERE t0.doc_id = d.doc_id AND t0.term = '{deleted_term}'
    )
)"""
    return f"WITH {corpus}, {base_ctes('docs2')}, {_term_cte('a', term)} {_topk('sc_a', k)}"


def term_topk_after_update_sql(term: str, every: int, suffix_word: str, k: int) -> str:
    """Lifecycle oracle: updateDocument of every ``every``-th doc (text gets
    ``suffix_word`` appended; the new version is appended with a fresh docID
    = N + old_id/every in old-id order).  Buffered-delete semantics: stats
    (docFreq/avgdl/docCount) still include the tombstoned old versions until
    compaction (Lucene's documented behavior); only the final hit set
    excludes them."""
    corpus = f"""
docs_all AS (
    SELECT doc_id, text, (doc_id % {every} = 0) AS victim FROM documents
    UNION ALL
    SELECT (SELECT count(*) FROM documents) + doc_id // {every},
           text || ' {suffix_word}', false
    FROM documents WHERE doc_id % {every} = 0
)"""
    return f"""
WITH {corpus}, {base_ctes('docs_all')}, {_term_cte('a', term)},
live AS (
    SELECT sc_a.* FROM sc_a JOIN docs_all USING (doc_id) WHERE NOT victim
)
{_topk('live', k)}
"""


def bool_mixed_topk_sql(
    must_term: str, should_terms: list[str], not_term: str, k: int
) -> str:
    """ReqOptSum + exclusion (BooleanScorerSupplier WAND + ReqExclScorer):
    docs must contain ``must_term`` and not ``not_term``; score = must score
    + optional should scores if co-matching (double acc, cast float)."""
    names = [f"s{i}" for i in range(len(should_terms))]
    ctes = ", ".join(_term_cte(n, t) for n, t in zip(names, should_terms))
    union = " UNION ALL ".join(f"SELECT doc_id, score FROM sc_{n}" for n in names)
    return f"""
WITH {BASE_CTES}, {_term_cte('a', must_term)}, {_term_cte('x', not_term)}, {ctes},
opt AS (
    SELECT doc_id, sum(CAST(score AS DOUBLE)) AS osum
    FROM ({union}) GROUP BY doc_id
),
combined AS (
    SELECT a.doc_id,
           CAST(CAST(a.score AS DOUBLE) + COALESCE(o.osum, 0.0) AS FLOAT) AS score
    FROM sc_a a
    LEFT JOIN opt o ON a.doc_id = o.doc_id
    ANTI JOIN sc_x x ON a.doc_id = x.doc_id
)
{_topk('combined', k)}
"""


def nested_and_or_topk_sql(must_term: str, or_terms: list[str], k: int) -> str:
    """a AND (b OR c): the nested SHOULD group scores as ONE clause (its
    double sum cast to float32) before the outer conjunction sums clauses in
    double — mirrors the flat plan's per-sub-Boolean float cast."""
    names = [f"g{i}" for i in range(len(or_terms))]
    ctes = ", ".join(_term_cte(n, t) for n, t in zip(names, or_terms))
    union = " UNION ALL ".join(f"SELECT doc_id, score FROM sc_{n}" for n in names)
    return f"""
WITH {BASE_CTES}, {_term_cte('a', must_term)}, {ctes},
grp AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS gscore
    FROM ({union}) GROUP BY doc_id
),
combined AS (
    SELECT a.doc_id,
           CAST(CAST(a.score AS DOUBLE) + CAST(g.gscore AS DOUBLE) AS FLOAT) AS score
    FROM sc_a a JOIN grp g ON a.doc_id = g.doc_id
)
{_topk('combined', k)}
"""


def fuzzy_blended_topk_sql(
    term: str, max_edits: int, max_expansions: int, k: int,
    transpositions: bool = True,
) -> str:
    """TopTermsBlendedFreqScoringRewrite (FuzzyQuery's scoring default):
    candidates within edit distance (Damerau with ``transpositions``, the
    Lucene default — see fuzzy_topk_sql for the max_edits<=1 envelope),
    boost = 1f - ed/minTermLength (FuzzyTermsEnum.java:251-257), top-N by
    (boost DESC, term ASC) (TopTermsRewrite.java:104-120), scored with
    BLENDED stats df=max/ttf=sum (BlendedTermQuery.java:281-291) as a
    SHOULD disjunction of boosted term queries."""
    qlen = len(term)
    dist = "damerau_levenshtein" if transpositions else "levenshtein"
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
    FROM toks GROUP BY term
),
cand AS (
    SELECT term, {dist}(term, '{term}') AS ed FROM ts
    WHERE length(term) BETWEEN {qlen - max_edits} AND {qlen + max_edits}
      AND {dist}(term, '{term}') <= {max_edits}
),
boosted AS (
    SELECT term,
        CASE WHEN ed = 0 THEN CAST(1 AS FLOAT)
             ELSE CAST(CAST(1 AS FLOAT) -
                  CAST(ed AS FLOAT) / CAST(least(length(term), {qlen}) AS FLOAT)
                  AS FLOAT) END AS boost
    FROM cand
    ORDER BY boost DESC, term ASC
    LIMIT {max_expansions}
),
blend AS (
    SELECT max(ts.df)::BIGINT AS df, sum(ts.ttf)::BIGINT AS ttf
    FROM ts JOIN boosted USING (term)
),
w AS (
    SELECT CAST(ln(1 + (fs.n - blend.df + 0.5) / (blend.df + 0.5)) AS FLOAT) AS idf,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs, blend
),
tf AS (
    SELECT doc_id, term, count(*)::INT AS freq FROM toks
    WHERE term IN (SELECT term FROM boosted) GROUP BY doc_id, term
),
sc AS (
    SELECT tf.doc_id,
           CAST(CAST(b.boost * w.idf AS FLOAT) -
                CAST(b.boost * w.idf AS FLOAT) / ({F1} + CAST(tf.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(n.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM tf JOIN boosted b USING (term) JOIN norm n USING (doc_id) CROSS JOIN w
),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM sc GROUP BY doc_id
)
{_topk('combined', k)}
"""


def covering_topk_sql(terms: list[str], min_expr: str, k: int) -> str:
    """CoveringQuery twin (``sandbox/search/CoveringQuery.java:40-90``):
    a doc matches when >= max(1, <min_expr>(doc)) of the term clauses
    match (NULL source -> no match); score = float32 of the double sum of
    the MATCHING clauses' float32 scores (``CoveringScorer.java:208-216``
    — same arithmetic as a SHOULD disjunction, per-doc threshold).
    ``min_expr``: a SQL expression over ``documents`` columns (alias d)."""
    names = [chr(97 + i) for i in range(len(terms))]
    ctes = ", ".join(_term_cte(n, t).lstrip() for n, t in zip(names, terms))
    union = " UNION ALL ".join(
        f"SELECT doc_id, score FROM sc_{n}" for n in names
    )
    return f"""
WITH {BASE_CTES}, {ctes},
unioned AS ({union}),
agg AS (
    SELECT doc_id, count(*)::BIGINT AS cnt,
           CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM unioned GROUP BY doc_id
),
covered AS (
    SELECT agg.doc_id, agg.score
    FROM agg JOIN documents d ON d.doc_id = agg.doc_id
    WHERE CAST({min_expr} AS BIGINT) IS NOT NULL
      AND agg.cnt >= greatest(1, CAST({min_expr} AS BIGINT))
)
{_topk('covered', k)}
"""


def combined_field_topk_sql(
    terms: list[str],
    w_text: float,
    w_title: float,
    title_words: int,
    k: int,
) -> str:
    """CombinedFieldQuery (BM25F) twin over the gate's two-field shape —
    field ``text`` (the corpus text) and field ``title`` (its first
    ``title_words`` space-separated words), weights ``w_text``/``w_title``
    (``sandbox/search/CombinedFieldQuery.java:250-320``,
    ``MultiNormsLeafSimScorer.java:127-156``).

    Pseudo stats: docFreq = max df over (field, term) pairs, docCount =
    per-field max, sumTotalTermFreq / totalTermFreq = Σ weight·(s)ttf
    (Java's per-pair long+=double truncation is a no-op for the integral
    gate weights — mirrored directly as BIGINT sums).  Per doc: combined
    freq = float32 Σ weight·freq; combined norm = the weighted decoded
    lengths rounded (floor(v+0.5)) and re-quantized through the
    intToByte4∘byte4ToInt composition — which IS the norm CTE's CASE; one
    BM25 evaluation with the pseudo idf/avgdl."""
    tl = ", ".join(f"'{t}'" for t in terms)
    wt, wl = f"CAST({w_text} AS FLOAT)", f"CAST({w_title} AS FLOAT)"
    return f"""
WITH {BASE_CTES},
ttl AS (
    SELECT doc_id,
           array_to_string(string_split(text, ' ')[1:{title_words}], ' ') AS ttext
    FROM documents
),
ttoks AS (
    SELECT doc_id, t.term AS term
    FROM ttl, unnest(string_split(ttext, ' ')) AS t(term)
    WHERE t.term <> '' AND t.term NOT IN ({_STOPS})
),
tdl AS (SELECT doc_id, count(*)::BIGINT AS len FROM ttoks GROUP BY doc_id),
tfs AS (SELECT count(*)::BIGINT AS n, sum(len)::BIGINT AS sttf FROM tdl WHERE len > 0),
tnorm AS (
    SELECT doc_id, len,
        CASE WHEN len < 32 THEN len
             ELSE 24 + (((len - 24) >> (length(bin(len - 24)) - 4))
                        << (length(bin(len - 24)) - 4))
        END AS qlen
    FROM tdl
),
pdf AS (
    SELECT greatest(
        (SELECT COALESCE(max(df), 0) FROM (
            SELECT count(DISTINCT doc_id)::BIGINT AS df FROM toks
            WHERE term IN ({tl}) GROUP BY term)),
        (SELECT COALESCE(max(df), 0) FROM (
            SELECT count(DISTINCT doc_id)::BIGINT AS df FROM ttoks
            WHERE term IN ({tl}) GROUP BY term))
    ) AS df
),
pstats AS (
    SELECT pdf.df,
           greatest(fs.n, tfs.n) AS dc,
           CAST({w_text} * fs.sttf + {w_title} * tfs.sttf AS BIGINT) AS sttfp
    FROM pdf, fs, tfs
),
w AS (
    SELECT CAST(ln(1 + (dc - df + 0.5) / (df + 0.5)) AS FLOAT) AS idf,
           CAST(sttfp / CAST(dc AS DOUBLE) AS FLOAT) AS avgdl
    FROM pstats
),
wtf AS (
    SELECT doc_id, {wt} * CAST(freq AS FLOAT) AS wf FROM (
        SELECT doc_id, count(*)::INT AS freq FROM toks
        WHERE term IN ({tl}) GROUP BY doc_id, term)
    UNION ALL
    SELECT doc_id, {wl} * CAST(freq AS FLOAT) AS wf FROM (
        SELECT doc_id, count(*)::INT AS freq FROM ttoks
        WHERE term IN ({tl}) GROUP BY doc_id, term)
),
cf AS (
    SELECT doc_id, CAST(sum(CAST(wf AS DOUBLE)) AS FLOAT) AS cfreq
    FROM wtf GROUP BY doc_id
),
wnorm AS (
    SELECT doc_id, {wt} * CAST(qlen AS FLOAT) AS wn FROM norm
    UNION ALL
    SELECT doc_id, {wl} * CAST(qlen AS FLOAT) AS wn FROM tnorm
),
cn AS (
    SELECT doc_id,
           CAST(floor(CAST(CAST(sum(CAST(wn AS DOUBLE)) AS FLOAT)
                           + CAST(0.5 AS FLOAT) AS FLOAT)) AS BIGINT) AS rnd
    FROM wnorm GROUP BY doc_id
),
cq AS (
    SELECT doc_id,
        CASE WHEN rnd < 32 THEN rnd
             ELSE 24 + (((rnd - 24) >> (length(bin(rnd - 24)) - 4))
                        << (length(bin(rnd - 24)) - 4))
        END AS qlenc
    FROM cn
),
sc AS (
    SELECT cf.doc_id,
           CAST(w.idf - w.idf / ({F1} + cf.cfreq *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(cq.qlenc AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM cf JOIN cq USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def prefix_scoring_topk_sql(prefix: str, k: int) -> str:
    """SCORING_BOOLEAN_REWRITE for a prefix: disjunction of real term
    queries — each expanded term scores with its OWN stats (ScoringRewrite),
    per-doc float32 leaf scores summed in double, cast float."""
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
),
cand AS (SELECT term FROM ts WHERE term LIKE '{prefix}%'),
tf AS (
    SELECT doc_id, term, count(*)::INT AS freq FROM toks
    WHERE term IN (SELECT term FROM cand) GROUP BY doc_id, term
),
w AS (
    SELECT ts.term,
           CAST(ln(1 + (fs.n - ts.df + 0.5) / (ts.df + 0.5)) AS FLOAT) AS w,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM ts, fs WHERE ts.term IN (SELECT term FROM cand)
),
sc AS (
    SELECT tf.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(tf.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(n.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM tf JOIN w USING (term) JOIN norm n USING (doc_id)
),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM sc GROUP BY doc_id
)
{_topk('combined', k)}
"""


def dfr_term_topk_sql(term: str, k: int) -> str:
    """DFR G·B·H2 (DFRSimilarity.java:127-131, BasicModelG.java:36-51,
    AfterEffectB.java:32-36, NormalizationH2.java:57-59): all-double score
    cast to float32 at the end (SimilarityBase.BasicSimScorer)."""
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
st AS (
    SELECT count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS ttf
    FROM toks WHERE term = '{term}'
),
sc AS (
    SELECT tf.doc_id,
        CAST(
            (ln((1 + (st.ttf + 1.0) / (fs.n + st.ttf + 1.0)) / ((st.ttf + 1.0) / (fs.n + st.ttf + 1.0))) / ln(2)
             - (ln((1 + (st.ttf + 1.0) / (fs.n + st.ttf + 1.0)) / ((st.ttf + 1.0) / (fs.n + st.ttf + 1.0))) / ln(2)
                - ln((st.ttf + 1.0) / (fs.n + st.ttf + 1.0) + 1.0) / ln(2))
               / (1 + CAST(tf.freq AS DOUBLE) *
                  (ln(1 + (fs.sttf / CAST(fs.n AS DOUBLE)) / CAST(n.qlen AS DOUBLE)) / ln(2))))
            * ((st.ttf + 2.0) / (st.df + 1.0))
        AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id), st, fs
)
{_topk('sc', k)}
"""


def lmjm_term_topk_sql(term: str, lam: float, k: int) -> str:
    """LMJelinekMercerSimilarity (LMJelinekMercerSimilarity.java:68-74):
    score = (float)(ln(1 + ((1-λ)·freq/dl)/(λ·p))), λ float32-widened,
    p = (ttf+1)/(sumTtf+1)."""
    lam_sql = f"CAST(CAST({lam} AS FLOAT) AS DOUBLE)"
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
st AS (SELECT count(*)::BIGINT AS ttf FROM toks WHERE term = '{term}'),
sc AS (
    SELECT tf.doc_id,
        CAST(ln(1 + ((1 - {lam_sql}) * CAST(tf.freq AS DOUBLE) / CAST(n.qlen AS DOUBLE))
                    / ({lam_sql} * ((st.ttf + 1.0) / (fs.sttf + 1.0)))) AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id), st, fs
)
{_topk('sc', k)}
"""


def ib_term_topk_sql(term: str, k: int) -> str:
    """IB LL·DF·H2 (IBSimilarity.java:114-119, DistributionLL.java:33-35,
    LambdaDF.java:31-38 incl. nextDown(1f), NormalizationH2.java:57-59):
    λ = (float)((df+1)/(N+1)); score = (float)(−ln(λ/(tfn+λ)))."""
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
st AS (SELECT count(DISTINCT doc_id)::BIGINT AS df FROM toks WHERE term = '{term}'),
lamt AS (
    SELECT CAST(CASE WHEN CAST((st.df + 1.0) / (fs.n + 1.0) AS FLOAT) = CAST(1 AS FLOAT)
                     THEN CAST(0.99999994 AS FLOAT)
                     ELSE CAST((st.df + 1.0) / (fs.n + 1.0) AS FLOAT) END AS DOUBLE) AS lam
    FROM st, fs
),
sc AS (
    SELECT tf.doc_id,
        CAST(-ln(lamt.lam /
                 (CAST(tf.freq AS DOUBLE) *
                  (ln(1 + (fs.sttf / CAST(fs.n AS DOUBLE)) / CAST(n.qlen AS DOUBLE)) / ln(2))
                  + lamt.lam)) AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id), lamt, fs
)
{_topk('sc', k)}
"""


def taxonomy_facet_sql(term: str, col1: str, col2: str) -> str:
    """Hierarchical facet counts: every path prefix (dim and dim/sub) of the
    hit set gets a count (FastTaxonomyFacetCounts rollup semantics)."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
paths AS (
    SELECT CAST(d.{col1} AS VARCHAR) AS p1,
           CAST(d.{col1} AS VARCHAR) || '/' || CAST(d.{col2} AS VARCHAR) AS p2
    FROM sc_a JOIN documents d USING (doc_id)
),
u AS (SELECT p1 AS path FROM paths UNION ALL SELECT p2 AS path FROM paths)
SELECT path,
       CAST(len(string_split(path, '/')) AS INT) AS depth,
       count(*)::BIGINT AS n
FROM u GROUP BY path ORDER BY path
"""


def highlight_passages_sql(term: str, window: int = 10) -> str:
    """Unified-highlighter oracle (PassageScorer.java:80-139 component math,
    float32 ops + libm ln; fixed word-window passages, maxPassages=1): best
    passage per hit doc of a single-term query, terms wrapped in <b> tags."""
    F32_1 = "CAST(1 AS FLOAT)"
    PIV = "CAST(87 AS FLOAT)"
    K1 = "CAST(1.2 AS FLOAT)"
    Bp = "CAST(0.75 AS FLOAT)"
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
base AS (
    SELECT d.doc_id, string_split(d.text, ' ') AS ws, length(d.text) AS clen
    FROM sc_a JOIN documents d USING (doc_id)
),
p AS (
    SELECT doc_id, ws, clen, gs.p AS passage_idx,
           ws[gs.p*{window}+1 : least((gs.p+1)*{window}, len(ws))] AS pw
    FROM base,
         unnest(generate_series(0, CAST(ceil(len(ws)/CAST({window} AS DOUBLE)) AS INT) - 1)) AS gs(p)
),
feat AS (
    SELECT doc_id, passage_idx, clen,
           CASE WHEN passage_idx = 0 THEN 0
                ELSE length(array_to_string(ws[1:passage_idx*{window}], ' ')) + 1 END AS pstart,
           length(array_to_string(pw, ' ')) AS plen,
           len(list_filter(pw, w -> w = '{term}')) AS freq,
           len(list_filter(ws, w -> w = '{term}')) AS tfdoc,
           array_to_string(list_transform(pw, w ->
               CASE WHEN w = '{term}' THEN '<b>' || w || '</b>' ELSE w END), ' ') AS snippet
    FROM p
),
scored AS (
    SELECT doc_id, passage_idx, snippet,
        CAST(
            CAST(
                CAST(
                    (CAST(freq AS FLOAT) /
                     (CAST(freq AS FLOAT) + {K1} * (({F32_1} - {Bp}) +
                         {Bp} * (CAST(plen AS FLOAT) / {PIV}))))
                    * (({K1} + {F32_1}) *
                       CAST(ln(1 + (CAST({F32_1} + CAST(clen AS FLOAT) / {PIV} AS DOUBLE) + 0.5)
                               / (tfdoc + 0.5)) AS FLOAT))
                AS FLOAT)
            AS DOUBLE)
            * CAST({F32_1} + {F32_1} /
                   CAST(ln(CAST({PIV} + CAST(pstart AS FLOAT) AS DOUBLE)) AS FLOAT) AS DOUBLE)
        AS FLOAT) AS pscore
    FROM feat WHERE freq > 0
)
SELECT doc_id, passage_idx, CAST(pscore AS DOUBLE) AS pscore, snippet
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY pscore DESC, passage_idx ASC) AS rn
    FROM scored
)
WHERE rn = 1
ORDER BY doc_id
"""


def knn_filtered_topk_sql(term: str, query_vec_id: int, k: int) -> str:
    """Pre-filtered KNN (KnnFloatVectorQuery.java:49): k nearest (cosine,
    rounded 6dp, scaled (1+cos)/2 per VectorSimilarityFunction.COSINE) among
    docs matching the filter term; vec_id == doc_id in the gate corpus."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = {query_vec_id}),
e AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings),
allowed AS (SELECT DISTINCT doc_id FROM sc_a),
scored AS (
    SELECT e.doc_id,
        CAST((1 + round(list_dot_product(e.v, q.v) /
              (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))),
              6)) / 2 AS FLOAT) AS score
    FROM e JOIN allowed USING (doc_id), q
)
{_topk('scored', k)}
"""


def knn_hybrid_topk_sql(term: str, query_vec_id: int, knn_k: int, k: int) -> str:
    """Hybrid retrieval: MUST bm25(term) + SHOULD knn (ReqOptSum) — docs in
    the global knn top-``knn_k`` get the similarity added to their BM25
    score (double acc, cast float), exactly the Boolean composition Lucene
    gets from a SHOULD KnnFloatVectorQuery clause."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = {query_vec_id}),
e AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings),
knn AS (
    SELECT doc_id, kscore FROM (
        SELECT e.doc_id,
            CAST((1 + round(list_dot_product(e.v, q.v) /
                  (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))),
                  6)) / 2 AS FLOAT) AS kscore
        FROM e, q
    ) ORDER BY kscore DESC, doc_id ASC LIMIT {knn_k}
),
combined AS (
    SELECT a.doc_id,
        CAST(CAST(a.score AS DOUBLE) + COALESCE(CAST(kn.kscore AS DOUBLE), 0.0) AS FLOAT) AS score
    FROM sc_a a LEFT JOIN knn kn USING (doc_id)
)
{_topk('combined', k)}
"""


def dfi_term_topk_sql(term: str, k: int) -> str:
    """DFISimilarity + ChiSquared (DFISimilarity.java:70-81,
    IndependenceChiSquared.java:33-36): expected = (ttf+1)·dl/(sumTtf+1);
    0 when freq <= expected, else (float) log2((freq-expected)²/expected+1)."""
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
st AS (SELECT count(*)::BIGINT AS ttf FROM toks WHERE term = '{term}'),
sc AS (
    SELECT tf.doc_id,
        CAST(
            CASE WHEN CAST(tf.freq AS DOUBLE) <=
                      (st.ttf + 1) * CAST(n.qlen AS DOUBLE) / (fs.sttf + 1)
                 THEN 0.0
                 ELSE ln((CAST(tf.freq AS DOUBLE) - (st.ttf + 1) * CAST(n.qlen AS DOUBLE) / (fs.sttf + 1))
                         * (CAST(tf.freq AS DOUBLE) - (st.ttf + 1) * CAST(n.qlen AS DOUBLE) / (fs.sttf + 1))
                         / ((st.ttf + 1) * CAST(n.qlen AS DOUBLE) / (fs.sttf + 1)) + 1.0) / ln(2)
            END
        AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id), st, fs
)
{_topk('sc', k)}
"""


def f2exp_term_topk_sql(term: str, k: int) -> str:
    """AxiomaticF2EXP (AxiomaticF2EXP.java:58-86, Axiomatic.java:106-116):
    score = (float) max(0, freq/(freq + s + s·dl/avgdl) · ((N+1)/df)^k),
    s=0.25f, k=0.35f widened to double."""
    s = "CAST(CAST(0.25 AS FLOAT) AS DOUBLE)"
    kk = "CAST(CAST(0.35 AS FLOAT) AS DOUBLE)"
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
st AS (SELECT count(DISTINCT doc_id)::BIGINT AS df FROM toks WHERE term = '{term}'),
sc AS (
    SELECT tf.doc_id,
        CAST(greatest(0.0,
            (CAST(tf.freq AS DOUBLE) /
             (CAST(tf.freq AS DOUBLE) + {s} + {s} * CAST(n.qlen AS DOUBLE)
              / (fs.sttf / CAST(fs.n AS DOUBLE))))
            * pow((fs.n + 1.0) / st.df, {kk})
        ) AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id), st, fs
)
{_topk('sc', k)}
"""


def multi_sim_term_topk_sql(term: str, k: int) -> str:
    """MultiSimilarity(BM25, Classic) (MultiSimilarity.java:64-70): float32
    sub-scores summed in double, cast float."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
w_c AS (
    SELECT CAST(ln((fs.n + 1) / CAST(st.df + 1 AS DOUBLE)) + 1.0 AS FLOAT) AS w
    FROM fs, (SELECT count(*)::BIGINT AS df FROM tf_a) st
),
sc_c AS (
    SELECT tf.doc_id,
           CAST(CAST(w.w * CAST(sqrt(CAST(tf.freq AS DOUBLE)) AS FLOAT) AS FLOAT)
                * CAST(1.0 / sqrt(CAST(n.qlen AS DOUBLE)) AS FLOAT) AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id) CROSS JOIN w_c w
),
combined AS (
    SELECT a.doc_id,
           CAST(CAST(a.score AS DOUBLE) + CAST(c.score AS DOUBLE) AS FLOAT) AS score
    FROM sc_a a JOIN sc_c c USING (doc_id)
)
{_topk('combined', k)}
"""


def suggest_complete_sql(prefix: str, k: int) -> str:
    """AnalyzingSuggester lookup over the corpus vocabulary: completions of
    ``prefix`` ranked by (docFreq DESC, term ASC)."""
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS weight FROM toks GROUP BY term
)
SELECT term AS surface, weight
FROM ts WHERE term LIKE '{prefix}%'
ORDER BY weight DESC, surface ASC LIMIT {k}
"""


def shingle_top_sql(k: int) -> str:
    """Top-k 2-word shingles over the stop-filtered position stream, holes
    filled with '_' (ShingleFilter behavior spec: shingles start at real
    tokens and fit before the last real token)."""
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
mx AS (SELECT doc_id, max(pos) AS mp FROM tp GROUP BY doc_id),
sh AS (
    SELECT a.doc_id, a.term || ' ' || COALESCE(b.term, '_') AS shingle
    FROM tp a
    JOIN mx USING (doc_id)
    LEFT JOIN tp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.pos + 1 <= mx.mp
)
SELECT shingle, count(*)::BIGINT AS n
FROM sh GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT {k}
"""


def percolator_phrase_matches_sql() -> str:
    """Phrase-percolator gate: query 1 = exact phrase "table value", query 2
    = merge AND "table value" (MUST phrase clause), query 3 = term batch."""
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
ph AS (
    SELECT DISTINCT a.doc_id
    FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.term = 'table' AND b.term = 'value'
),
d AS (SELECT DISTINCT doc_id, term FROM toks)
SELECT doc_id, 1 AS query_id FROM ph
UNION
SELECT ph.doc_id, 2 FROM ph JOIN d ON d.doc_id = ph.doc_id AND d.term = 'merge'
UNION
SELECT doc_id, 3 FROM d WHERE term = 'batch'
ORDER BY doc_id, query_id
"""


def explain_term_doc_sql(term: str) -> str:
    """Explain twin: the BM25 score breakdown (freq, doc length, float32
    idf, float32 score) of the TOP document for a term query."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
top1 AS (SELECT doc_id FROM sc_a ORDER BY score DESC, doc_id ASC LIMIT 1)
SELECT t.doc_id,
       (SELECT count(*) FROM toks WHERE term = '{term}' AND toks.doc_id = t.doc_id)::INT AS freq,
       (SELECT len FROM dl WHERE dl.doc_id = t.doc_id)::INT AS doc_len,
       CAST((SELECT w FROM w_a) AS DOUBLE) AS idf,
       CAST((SELECT score FROM sc_a WHERE sc_a.doc_id = t.doc_id) AS DOUBLE) AS score,
       (SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term}')::BIGINT AS n_hits
FROM top1 t
"""


def term_range_topk_sql(lo: str, hi: str, k: int) -> str:
    """TermRangeQuery [lo TO hi] CONSTANT_SCORE: docs containing any term in
    the lexicographic range, score 1.0, docID order."""
    return _constant_score_docs_sql(f"term >= '{lo}' AND term <= '{hi}'", k)


def rescore_topk_sql(term_first: str, term_second: str, n: int, w1: float, w2: float, k: int) -> str:
    """QueryRescorer: top-n of the first query re-ranked by
    w1·score1 + w2·score2 (second score 0 when absent), double acc, cast
    float (QueryRescorer.combine)."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term_first)}, {_term_cte('b', term_second)},
firstpass AS (
    SELECT doc_id, score FROM sc_a ORDER BY score DESC, doc_id ASC LIMIT {n}
),
combined AS (
    SELECT f.doc_id,
           CAST({w1} * CAST(f.score AS DOUBLE) +
                {w2} * COALESCE(CAST(b.score AS DOUBLE), 0.0) AS FLOAT) AS score
    FROM firstpass f LEFT JOIN sc_b b USING (doc_id)
)
{_topk('combined', k)}
"""


def feature_score_topk_sql(term: str, feature_expr: str, function: str, w: float, pivot: float, k: int) -> str:
    """FeatureField scoring (document/FeatureField.java): a static per-doc
    feature combined with BM25 as a SHOULD clause.  saturation:
    w·S/(S+pivot); log: w·ln(a + S) with a=1; all double, cast float, added
    to the BM25 score in double (the boosted-feature-SHOULD pattern)."""
    if function == "saturation":
        fexpr = f"{w} * ({feature_expr}) / (({feature_expr}) + {pivot})"
    elif function == "log":
        fexpr = f"{w} * ln(1.0 + ({feature_expr}))"
    else:
        raise ValueError(function)
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
combined AS (
    SELECT a.doc_id,
           CAST(CAST(a.score AS DOUBLE) +
                CAST(CAST({fexpr} AS FLOAT) AS DOUBLE) AS FLOAT) AS score
    FROM sc_a a JOIN documents d ON d.doc_id = a.doc_id
)
{_topk('combined', k)}
"""


# --- payload oracles (round 5) ----------------------------------------------
# The gate index stores per-position payloads produced by
# ``filters.token_offset_payload`` (payload = the token's start character
# offset).  The corpus text is space-joined, so the offset of 1-based raw
# token i reconstructs as ``len(join(ws[1:i-1], ' ')) + 1`` (0 for i = 1) —
# the same reconstruction the highlighter oracle uses.  ``pos`` keeps stop
# holes (i indexes the RAW token array; the WHERE only filters emissions).


def _payload_tpo_ctes() -> str:
    """tpo(doc_id, term, pos, pay): kept tokens with positional holes and
    the float32 start-offset payload."""
    return f"""
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tpo AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos,
           CAST(CASE WHEN i = 1 THEN 0
                ELSE length(array_to_string(ws[1:i-1], ' ')) + 1
           END AS FLOAT) AS pay
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
)"""


def payload_score_topk_sql(term: str, function: str, k: int) -> str:
    """``PayloadScoreQuery(SpanTermQuery, fn, includeSpanScore=false)``
    (``queries/payloads/PayloadScoreQuery.java:47-75``): score = payload
    aggregate over the term's positions.  min/max exact; sum a float32
    fold in position order; avg = double division of the float32 sum by
    the count, rounded to float32 (the engine's documented envelope)."""
    if function == "max":
        agg = "CAST(max(pay) AS FLOAT)"
    elif function == "min":
        agg = "CAST(min(pay) AS FLOAT)"
    elif function in ("sum", "avg"):
        agg = (
            "list_reduce(list_prepend(CAST(0 AS FLOAT),"
            " list(pay ORDER BY pos)), (acc, x) -> CAST(acc + x AS FLOAT))"
        )
        if function == "avg":
            agg = f"CAST(CAST({agg} AS DOUBLE) / count(*) AS FLOAT)"
    else:
        raise ValueError(function)
    return f"""
WITH {_payload_tpo_ctes()},
sc AS (
    SELECT doc_id, {agg} AS score
    FROM tpo WHERE term = '{term}' GROUP BY doc_id
)
{_topk('sc', k)}
"""


def payload_filtered_topk_sql(term: str, max_pay: float, k: int) -> str:
    """``IntervalQuery(payloadFilteredTerm(term, pay < max_pay))``
    (``Intervals.java:82-90``): surviving positions are [p, p] intervals,
    minExtent 1, saturation-scored."""
    return f"""
WITH {_payload_tpo_ctes()},
kept AS (
    SELECT doc_id, pos AS s, pos AS e FROM tpo
    WHERE term = '{term}' AND pay < CAST({max_pay} AS FLOAT)
)
{_interval_score_sql(1, k)}
"""


def payload_filtered_ordered_topk_sql(
    term_a: str, max_pay_a: float, term_b: str, max_width: int, k: int
) -> str:
    """``IntervalQuery(maxwidth(w, ordered(payloadFilteredTerm(a, pay <
    lim), b)))`` — the payload filter composed under the ordered minimal-
    interval algebra (minExtent 2)."""
    return f"""
WITH {_payload_tpo_ctes()},
pa AS (SELECT doc_id, pos FROM tpo
       WHERE term = '{term_a}' AND pay < CAST({max_pay_a} AS FLOAT)),
pb AS (SELECT doc_id, pos FROM tpo WHERE term = '{term_b}'),
{_ordered_pair_ctes('o', 'pa', 'pb').lstrip()},
kept AS (SELECT doc_id, s, e FROM om WHERE e - s + 1 <= {max_width})
{_interval_score_sql(2, k)}
"""


def complex_phrase_group_topk_sql(
    terms_a: list, term_b: str, slop: int, k: int
) -> str:
    """``ComplexPhraseQueryParser`` or-group phrase oracle — e.g.
    ``"(scan sort) merge"~slop``: minimal ordered intervals of
    (or(a1, a2, ...), b) with internal gaps ≤ slop (for two point
    sub-sources, gaps = e - s - 1), minExtent 2, saturation-scored.  The
    or() of single terms is just the merged position list, so the
    ordered-pair set algebra applies with pa = positions of ANY group
    member."""
    in_list = ", ".join(f"'{t}'" for t in terms_a)
    return f"""
WITH
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
pa AS (SELECT doc_id, pos FROM tp WHERE term IN ({in_list})),
pb AS (SELECT doc_id, pos FROM tp WHERE term = '{term_b}'),
{_ordered_pair_ctes('o', 'pa', 'pb').lstrip()},
kept AS (SELECT doc_id, s, e FROM om WHERE e - s - 1 <= {slop})
{_interval_score_sql(2, k)}
"""


def span_near_legacy_topk_sql(term_a: str, term_b: str, slop: int, k: int) -> str:
    """Legacy ``SpanScorer`` ranking for ``SpanNearQuery([a, b], slop,
    inOrder)`` (``spans/NearSpansOrdered.java:62-120`` +
    ``SpanScorer.java:112``): EVERY a-position anchors one greedy chain to
    the first b strictly after it (width = b − a − 1); matches with width
    ≤ slop contribute ``f32(1/(1+width))`` to a float32 running freq in
    anchor order — no minimal-interval filtering, unlike the intervals
    path.  BM25 scores the fractional freq with weight = Σ idf of the
    span's distinct terms (``SpanWeight.buildSimWeight``)."""
    return f"""
WITH {BASE_CTES},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
pa AS (SELECT doc_id, pos FROM tp WHERE term = '{term_a}'),
pb AS (SELECT doc_id, pos FROM tp WHERE term = '{term_b}'),
cand AS (
    SELECT a.doc_id, a.pos AS s,
           (SELECT min(b.pos) FROM pb b
            WHERE b.doc_id = a.doc_id AND b.pos > a.pos) AS e
    FROM pa a
),
kept AS (
    SELECT doc_id, s, e - s - 1 AS w FROM cand
    WHERE e IS NOT NULL AND e - s - 1 <= {slop}
),
fr AS (
    SELECT doc_id, list(CAST(w AS INT) ORDER BY s) AS widths
    FROM kept GROUP BY doc_id
),
mm AS (
    SELECT doc_id,
           list_reduce(
               list_transform(widths, m -> CAST({F1} / ({F1} + CAST(m AS FLOAT)) AS FLOAT)),
               (acc, x) -> CAST(acc + x AS FLOAT)
           ) AS freq
    FROM fr WHERE len(widths) > 0
),
w AS (
    SELECT CAST(
        CAST(CAST(ln(1 + (fs.n - (SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_a}') + 0.5)
             / ((SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_a}') + 0.5)) AS FLOAT) AS DOUBLE)
      + CAST(CAST(ln(1 + (fs.n - (SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_b}') + 0.5)
             / ((SELECT count(DISTINCT doc_id) FROM toks WHERE term = '{term_b}') + 0.5)) AS FLOAT) AS DOUBLE)
      AS FLOAT) AS w,
      CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs
),
sc AS (
    SELECT mm.doc_id,
           CAST(w.w - w.w / ({F1} + CAST(mm.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(nm.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS score
    FROM mm JOIN norm nm USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def xml_bool_span_topk_sql(term: str, span_a: str, span_b: str, slop: int, k: int) -> str:
    """XML CoreParser composite oracle — ``<BooleanQuery>`` of MUST
    ``<UserQuery>term</UserQuery>`` + MUST ``<SpanNear slop inOrder=true>``:
    BM25(term) plus the span clause's interval-saturation score
    (the engine's documented span scoring), clause scores summed in double
    and cast float (``ConjunctionScorer.java:57-63`` convention)."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tp AS (
    SELECT doc_id, ws[i] AS term, i - 1 AS pos
    FROM words, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> '' AND ws[i] NOT IN ({_STOPS})
),
pa AS (SELECT doc_id, pos FROM tp WHERE term = '{span_a}'),
pb AS (SELECT doc_id, pos FROM tp WHERE term = '{span_b}'),
{_ordered_pair_ctes('o', 'pa', 'pb').lstrip()},
kept AS (SELECT doc_id, s, e FROM om WHERE e - s - 1 <= {slop}),
fr AS (
    SELECT doc_id, list(e - s ORDER BY s) AS lens FROM kept GROUP BY doc_id
),
mm AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list_transform(lens, L -> 1.0 / greatest(L, 1))),
               (acc, x) -> CAST(acc + x AS FLOAT)
           ) AS freq
    FROM fr
),
sp AS (
    SELECT doc_id,
           CAST({F1} - {F1} / ({F1} + CAST(freq AS FLOAT)) AS FLOAT) AS sscore
    FROM mm WHERE freq > 0
),
combined AS (
    SELECT a.doc_id,
           CAST(CAST(a.score AS DOUBLE) + CAST(sp.sscore AS DOUBLE) AS FLOAT) AS score
    FROM sc_a a JOIN sp USING (doc_id)
)
{_topk('combined', k)}
"""


# --------------------------------------------------------------- classification


def naive_bayes_classify_sql(
    class_col: str = "source", input_max: int = 30, top_n: int = 3
) -> str:
    """SimpleNaiveBayesClassifier twin (``classification/
    SimpleNaiveBayesClassifier.java``) over the gate corpus: classes =
    ``documents.<class_col>``, inputs = docs with doc_id < input_max,
    output = per input the top_n classes by softmax posterior.

    Quantization points mirror ``search/classification.py``: one
    float32-cast ln per (term, class) likelihood and per prior component,
    occurrence sums as cnt x float32 in double (exact), the per-class
    total float32-cast, and the log-sum-exp softmax in double with a
    float32 wash on ln(sumexp) and on the final score.
    """
    return f"""
WITH {BASE_CTES},
cls AS (SELECT doc_id, {class_col} AS class FROM documents),
nclass AS (SELECT count(*)::BIGINT AS n FROM cls),
cstat AS (SELECT class, count(*)::BIGINT AS dfc FROM cls GROUP BY class),
avgu AS (
    SELECT sdf.sumdf / CAST(fs.n AS DOUBLE) AS avg_unique
    FROM (SELECT count(*)::BIGINT AS sumdf
          FROM (SELECT DISTINCT term, doc_id FROM toks)) sdf, fs
),
itoks AS (
    SELECT doc_id AS input_id, term, count(*)::BIGINT AS cnt
    FROM toks WHERE doc_id < {input_max} GROUP BY 1, 2
),
qterms AS (SELECT DISTINCT term FROM itoks),
hits AS (
    SELECT t.term, c.class, count(DISTINCT t.doc_id)::BIGINT AS hits
    FROM toks t JOIN cls c USING (doc_id) JOIN qterms q USING (term)
    GROUP BY 1, 2
),
grid AS (
    SELECT q.term, cs.class,
           CAST(ln((COALESCE(h.hits, 0) + 1)
                   / (a.avg_unique * cs.dfc + nc.n)) AS FLOAT) AS ll_tok
    FROM qterms q
    CROSS JOIN cstat cs CROSS JOIN avgu a CROSS JOIN nclass nc
    LEFT JOIN hits h ON h.term = q.term AND h.class = cs.class
),
ll AS (
    SELECT i.input_id, g.class,
           sum(i.cnt * CAST(g.ll_tok AS DOUBLE)) AS ll
    FROM itoks i JOIN grid g USING (term) GROUP BY 1, 2
),
inputs AS (SELECT doc_id AS input_id FROM documents WHERE doc_id < {input_max}),
rawsc AS (
    SELECT p.input_id, cs.class,
           CAST(CAST(CAST(ln(cs.dfc) AS FLOAT) AS DOUBLE)
                - CAST(CAST(ln(nc.n) AS FLOAT) AS DOUBLE)
                + COALESCE(l.ll, 0.0) AS FLOAT) AS raw
    FROM inputs p CROSS JOIN cstat cs CROSS JOIN nclass nc
    LEFT JOIN ll l ON l.input_id = p.input_id AND l.class = cs.class
),
sm AS (
    SELECT input_id, class, raw,
           CAST(max(raw) OVER (PARTITION BY input_id) AS DOUBLE) AS smax
    FROM rawsc
),
se AS (
    SELECT input_id, class, raw, smax,
           sum(exp(CAST(raw AS DOUBLE) - smax))
               OVER (PARTITION BY input_id) AS sumexp
    FROM sm
),
scored AS (
    SELECT input_id, class,
           CAST(exp(CAST(raw AS DOUBLE)
                    - (smax + CAST(CAST(ln(sumexp) AS FLOAT) AS DOUBLE)))
                AS FLOAT) AS score
    FROM se
)
SELECT CAST(input_id AS BIGINT) AS input_id, class,
       CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (PARTITION BY input_id
                               ORDER BY score DESC, class ASC) - 1 AS INT) AS rank
FROM scored
QUALIFY rank < {top_n}
ORDER BY input_id, rank
"""


def knn_classify_sql(
    class_col: str = "source",
    input_max: int = 30,
    k: int = 10,
    max_query_terms: int = 25,
    min_doc_freq: int = 1,
    min_term_freq: int = 1,
    top_n: int = 3,
) -> str:
    """KNearestNeighborClassifier twin (``classification/
    KNearestNeighborClassifier.java``): per input a boosted MLT query
    (this repo's MLT weight, boost = w/bestW float32-cast), BM25 top-k
    (ties doc_id ASC), then the reference's class vote with the
    sumdoc<k correction, operation-for-operation in double."""
    return f"""
WITH {BASE_CTES},
cls AS (SELECT doc_id, {class_col} AS class FROM documents),
tstats AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
),
itoks AS (
    SELECT doc_id AS input_id, term, count(*)::BIGINT AS cnt
    FROM toks WHERE doc_id < {input_max} GROUP BY 1, 2
),
selw AS (
    SELECT i.input_id, i.term,
           i.cnt * ln(1 + (fs.n - ts.df + 0.5) / (ts.df + 0.5)) AS w,
           CAST(ln(1 + (fs.n - ts.df + 0.5) / (ts.df + 0.5)) AS FLOAT) AS idf
    FROM itoks i JOIN tstats ts USING (term) CROSS JOIN fs
    WHERE ts.df >= {min_doc_freq} AND i.cnt >= {min_term_freq}
),
sel AS (
    SELECT input_id, term, idf,
           CAST(w / max(w) OVER (PARTITION BY input_id) AS FLOAT) AS boost
    FROM (SELECT *, row_number() OVER (PARTITION BY input_id
                                       ORDER BY w DESC, term ASC) AS rn
          FROM selw)
    WHERE rn <= {max_query_terms}
),
av AS (
    SELECT CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl FROM fs
),
tf AS (
    SELECT doc_id, term, count(*)::INT AS freq FROM toks
    WHERE term IN (SELECT DISTINCT term FROM sel) GROUP BY 1, 2
),
contrib AS (
    SELECT s.input_id, tf.doc_id,
           (s.boost * s.idf)
           - (s.boost * s.idf)
             / ({F1} + CAST(tf.freq AS FLOAT)
                       * ({F1} / ({K1_SQL} * (({F1} - {B_SQL})
                          + (CAST(n.qlen AS FLOAT) * {B_SQL}) / av.avgdl))))
           AS sc
    FROM sel s
    JOIN tf ON tf.term = s.term
    JOIN norm n ON n.doc_id = tf.doc_id
    CROSS JOIN av
),
per_doc AS (
    -- MLT group sum + the MUST class-exists wildcard's ConstantScore 1.0
    -- (ReqOptSumScorer: double add of the two clause floats, cast float)
    SELECT input_id, doc_id,
           CAST(CAST(CAST(sum(CAST(sc AS DOUBLE)) AS FLOAT) AS DOUBLE)
                + 1.0 AS FLOAT) AS score
    FROM contrib GROUP BY 1, 2
),
topk AS (
    SELECT input_id, doc_id, score,
           CAST(max(score) OVER (PARTITION BY input_id) AS FLOAT) AS max_score
    FROM (SELECT *, row_number() OVER (PARTITION BY input_id
                                       ORDER BY score DESC, doc_id ASC) AS hr
          FROM per_doc)
    WHERE hr <= {k}
),
votes AS (
    SELECT t.input_id, c.class,
           CAST(count(*) AS DOUBLE) AS cnt,
           sum(CAST(CAST(t.score / t.max_score AS FLOAT) AS DOUBLE)) AS boost
    FROM topk t JOIN cls c USING (doc_id)
    GROUP BY 1, 2
),
vote2 AS (
    SELECT input_id, class, cnt, boost,
           sum(cnt) OVER (PARTITION BY input_id) AS sumdoc,
           (cnt * (boost / cnt)) / CAST({k} AS DOUBLE) AS tmp
    FROM votes
),
scored AS (
    SELECT input_id, class,
           CAST(CASE WHEN sumdoc < CAST({k} AS DOUBLE)
                     THEN tmp * CAST({k} AS DOUBLE) / sumdoc
                     ELSE tmp END AS FLOAT) AS score
    FROM vote2
)
SELECT CAST(input_id AS BIGINT) AS input_id, class,
       CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (PARTITION BY input_id
                               ORDER BY score DESC, class ASC) - 1 AS INT) AS rank
FROM scored
QUALIFY rank < {top_n}
ORDER BY input_id, rank
"""


def knn_fuzzy_classify_sql(
    class_col: str = "source",
    input_max: int = 30,
    k: int = 10,
    top_n: int = 3,
) -> str:
    """KNearestFuzzyClassifier twin (``classification/
    KNearestFuzzyClassifier.java`` + ``utils/NearestFuzzyQuery.java``).

    Per input: every DISTINCT token fuzzified against the terms dict
    (maxEdits 1 / prefixLength 2 — candidates share the first
    min(2, len) chars and sit within suffix edit distance 1; at distance
    <= 1 OSA == Damerau-Levenshtein so ``damerau_levenshtein`` is the
    exact twin), boost = 1f - ed/min(len) over FULL lengths, <= 50
    variants per source term by (boost DESC, term ASC), variant score =
    f32(f32(boost^2) * f32(ln((N+1)/(df+1)) + 1.0)) with df = the source
    term's docFreq (integer-mean variant df when 0), global top 300 per
    input, BM25 with artificial df=1 stats, variants-of-one-source summed
    to float32 then source groups summed to float32, + the class-exists
    wildcard's constant 1.0, top-k (ties doc ASC), then the identical
    class vote."""
    return f"""
WITH {BASE_CTES},
cls AS (SELECT doc_id, {class_col} AS class FROM documents),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
),
itq AS (
    SELECT DISTINCT doc_id AS input_id, term AS src
    FROM toks WHERE doc_id < {input_max}
),
cand AS (
    SELECT * FROM (
        SELECT i.input_id, i.src, ts.term AS vterm, ts.df AS vdf,
               least(2, length(i.src)) AS rp,
               CASE WHEN ts.term = i.src THEN 0
                    ELSE damerau_levenshtein(
                        substr(ts.term, least(2, length(i.src)) + 1),
                        substr(i.src, least(2, length(i.src)) + 1)) END AS ed
        FROM itq i JOIN ts
          ON substr(ts.term, 1, least(2, length(i.src)))
             = substr(i.src, 1, least(2, length(i.src)))
        WHERE length(ts.term) BETWEEN length(i.src) - 1 AND length(i.src) + 1
    ) WHERE ed <= 1
),
boosted AS (
    SELECT input_id, src, vterm, vdf, ed,
           CASE WHEN ed = 0 THEN {F1}
                ELSE CAST({F1} - CAST(ed AS FLOAT)
                     / CAST(least(length(vterm), length(src)) AS FLOAT)
                     AS FLOAT) END AS boost
    FROM cand
),
vstat AS (
    SELECT *, count(*) OVER (PARTITION BY input_id, src) AS nvar,
           sum(vdf) OVER (PARTITION BY input_id, src) AS totvdf,
           row_number() OVER (PARTITION BY input_id, src
                              ORDER BY boost DESC, vterm ASC) AS vrank
    FROM boosted
),
scored_terms AS (
    SELECT v.input_id, v.src, v.vterm,
           CAST(CAST(v.boost * v.boost AS FLOAT)
                * CAST(ln((nd.n + 1) / CAST(COALESCE(s.df, v.totvdf // v.nvar)
                                            + 1 AS DOUBLE)) + 1.0 AS FLOAT)
                AS FLOAT) AS stsc
    FROM vstat v LEFT JOIN ts s ON s.term = v.src CROSS JOIN nd
    WHERE v.vrank <= 50
),
gkeep AS (
    -- src as the final key: (stsc, vterm) alone is not total (two source
    -- terms can share a variant at equal score) — mirrors the engine
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY input_id
                                     ORDER BY stsc DESC, vterm ASC, src ASC) AS grank
        FROM scored_terms
    ) WHERE grank <= 300
),
w AS (
    SELECT CAST(ln(1 + (fs.n - 1 + 0.5) / (1 + 0.5)) AS FLOAT) AS idf1,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM fs
),
tf AS (
    SELECT doc_id, term, count(*)::INT AS freq FROM toks
    WHERE term IN (SELECT DISTINCT vterm FROM gkeep) GROUP BY 1, 2
),
leaf AS (
    SELECT g.input_id, tf.doc_id, g.src,
           CAST(g.stsc * w.idf1 AS FLOAT)
           - CAST(g.stsc * w.idf1 AS FLOAT)
             / ({F1} + CAST(tf.freq AS FLOAT)
                       * ({F1} / ({K1_SQL} * (({F1} - {B_SQL})
                          + (CAST(n.qlen AS FLOAT) * {B_SQL}) / w.avgdl))))
           AS sc
    FROM gkeep g
    JOIN tf ON tf.term = g.vterm
    JOIN norm n ON n.doc_id = tf.doc_id
    CROSS JOIN w
),
gsum AS (
    SELECT input_id, doc_id, src,
           CAST(sum(CAST(sc AS DOUBLE)) AS FLOAT) AS gsc
    FROM leaf GROUP BY 1, 2, 3
),
per_doc AS (
    SELECT input_id, doc_id,
           CAST(CAST(CAST(sum(CAST(gsc AS DOUBLE)) AS FLOAT) AS DOUBLE)
                + 1.0 AS FLOAT) AS score
    FROM gsum GROUP BY 1, 2
),
topk AS (
    SELECT input_id, doc_id, score,
           CAST(max(score) OVER (PARTITION BY input_id) AS FLOAT) AS max_score
    FROM (SELECT *, row_number() OVER (PARTITION BY input_id
                                       ORDER BY score DESC, doc_id ASC) AS hr
          FROM per_doc)
    WHERE hr <= {k}
),
votes AS (
    SELECT t.input_id, c.class,
           CAST(count(*) AS DOUBLE) AS cnt,
           sum(CAST(CAST(t.score / t.max_score AS FLOAT) AS DOUBLE)) AS boost
    FROM topk t JOIN cls c USING (doc_id)
    GROUP BY 1, 2
),
vote2 AS (
    SELECT input_id, class, cnt, boost,
           sum(cnt) OVER (PARTITION BY input_id) AS sumdoc,
           (cnt * (boost / cnt)) / CAST({k} AS DOUBLE) AS tmp
    FROM votes
),
scored AS (
    SELECT input_id, class,
           CAST(CASE WHEN sumdoc < CAST({k} AS DOUBLE)
                     THEN tmp * CAST({k} AS DOUBLE) / sumdoc
                     ELSE tmp END AS FLOAT) AS score
    FROM vote2
)
SELECT CAST(input_id AS BIGINT) AS input_id, class,
       CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (PARTITION BY input_id
                               ORDER BY score DESC, class ASC) - 1 AS INT) AS rank
FROM scored
QUALIFY rank < {top_n}
ORDER BY input_id, rank
"""


def bm25_nb_classify_sql(
    class_col: str = "source", input_max: int = 30, top_n: int = 3
) -> str:
    """BM25NBClassifier twin (``classification/BM25NBClassifier.java``):
    Naive Bayes whose probabilities are BM25 scores — the class field is
    ``documents.<class_col>`` indexed as its own single-token field.

    Per class: log prior = ln(top-1 f32 score of the class term query);
    P(w|c) = top-1 per-doc f32(class leaf + word leaf) over the class's
    docs (docs without w contribute the class leaf alone → greatest with
    the class max); log-likelihood and the softmax denominator are
    DOUBLE left folds in a defined order (terms ASC; classes by raw
    DESC, class ASC — the reference's sort), mirroring the engine's
    sorted-array folds bit-for-bit."""
    return f"""
WITH {BASE_CTES},
ctoks AS (SELECT doc_id, {class_col} AS term FROM documents),
cdl AS (SELECT doc_id, count(*)::BIGINT AS len FROM ctoks GROUP BY doc_id),
cfs AS (SELECT count(*)::BIGINT AS n, sum(len)::BIGINT AS sttf FROM cdl WHERE len > 0),
cnorm AS (
    SELECT doc_id, len,
        CASE WHEN len < 32 THEN len
             ELSE 24 + (((len - 24) >> (length(bin(len - 24)) - 4))
                        << (length(bin(len - 24)) - 4))
        END AS qlen
    FROM cdl
),
cstat AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM ctoks GROUP BY term),
cw AS (
    SELECT cst.term,
           CAST(ln(1 + (cfs.n - cst.df + 0.5) / (cst.df + 0.5)) AS FLOAT) AS idf,
           CAST(cfs.sttf / CAST(cfs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM cstat cst, cfs
),
ctf AS (SELECT doc_id, term, count(*)::INT AS freq FROM ctoks GROUP BY 1, 2),
csc AS (
    SELECT tf.doc_id, tf.term AS class,
           CAST(w.idf - w.idf / ({F1} + CAST(tf.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(n.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS csc
    FROM ctf tf JOIN cnorm n USING (doc_id) JOIN cw w ON w.term = tf.term
),
scmax AS (SELECT class, max(csc) AS sc FROM csc GROUP BY class),
itoks AS (
    SELECT doc_id AS input_id, term, count(*)::BIGINT AS cnt
    FROM toks WHERE doc_id < {input_max} GROUP BY 1, 2
),
qterms AS (SELECT DISTINCT term FROM itoks),
tstats AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
),
ww AS (
    SELECT ts.term,
           CAST(ln(1 + (fs.n - ts.df + 0.5) / (ts.df + 0.5)) AS FLOAT) AS idf,
           CAST(fs.sttf / CAST(fs.n AS DOUBLE) AS FLOAT) AS avgdl
    FROM tstats ts JOIN qterms q USING (term) CROSS JOIN fs
),
ttf AS (
    SELECT doc_id, term, count(*)::INT AS freq FROM toks
    WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2
),
wsc AS (
    SELECT tf.doc_id, tf.term,
           CAST(w.idf - w.idf / ({F1} + CAST(tf.freq AS FLOAT) *
                ({F1} / ({K1_SQL} * (({F1} - {B_SQL}) +
                     {B_SQL} * CAST(n.qlen AS FLOAT) / w.avgdl)))) AS FLOAT) AS wsc
    FROM ttf tf JOIN norm n USING (doc_id) JOIN ww w ON w.term = tf.term
),
joint AS (
    SELECT c.class, t.term,
           max(CAST(CAST(c.csc AS DOUBLE) + CAST(t.wsc AS DOUBLE) AS FLOAT)) AS m
    FROM wsc t JOIN csc c USING (doc_id)
    GROUP BY 1, 2
),
grid AS (
    SELECT s.class, q.term,
           ln(CAST(CASE WHEN j.m IS NULL THEN s.sc
                        ELSE greatest(j.m, s.sc) END AS DOUBLE)) AS lnp
    FROM scmax s CROSS JOIN qterms q
    LEFT JOIN joint j ON j.class = s.class AND j.term = q.term
),
ll AS (
    SELECT i.input_id, g.class,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(i.cnt * g.lnp ORDER BY g.term ASC)),
               (a, b) -> a + b) AS ll
    FROM itoks i JOIN grid g USING (term)
    GROUP BY 1, 2
),
inputs AS (SELECT doc_id AS input_id FROM documents WHERE doc_id < {input_max}),
rawsc AS (
    SELECT p.input_id, s.class,
           ln(CAST(s.sc AS DOUBLE)) + COALESCE(l.ll, 0.0) AS raw
    FROM inputs p CROSS JOIN scmax s
    LEFT JOIN ll l ON l.input_id = p.input_id AND l.class = s.class
),
se AS (
    SELECT input_id, class, raw,
           max(raw) OVER (PARTITION BY input_id) AS smax,
           exp(raw - max(raw) OVER (PARTITION BY input_id)) AS e
    FROM rawsc
),
fold AS (
    SELECT input_id,
           list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(e ORDER BY raw DESC, class ASC)),
               (a, b) -> a + b) AS sumexp
    FROM se GROUP BY input_id
),
scored AS (
    SELECT se.input_id, se.class,
           exp(se.raw - (se.smax + ln(f.sumexp))) AS score
    FROM se JOIN fold f USING (input_id)
)
SELECT CAST(input_id AS BIGINT) AS input_id, class,
       CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (PARTITION BY input_id
                               ORDER BY score DESC, class ASC) - 1 AS INT) AS rank
FROM scored
QUALIFY rank < {top_n}
ORDER BY input_id, rank
"""


def freetext_lookup_sql(c1: str, c2: str, prefix: str, num: int) -> str:
    """FreeTextSuggester twin (``suggest/.../analyzing/FreeTextSuggester
    .java:545-712``) for the TRIGRAM model over the UNSTOPPED token
    stream and the three-token query "<c1> <c2> <prefix>":

    * level 3 completes the prefix given both context words (backoff
      1.0, contextCount = the "<c1> <c2>" bigram's count);
    * level 2 completes it given only "<c2>" (backoff 0.4, contextCount
      = the c2 unigram's count), skipping fragments level 3 emitted;
    * level 1 completes the bare prefix (backoff 0.4², contextCount =
      total tokens), skipping everything already emitted.

    Each level collects top num+|seen| by (count DESC, ngram ASC) and
    emits ≤ num NEW fragments; value = (long)(2⁶³·backoff·count/
    contextCount) — the left-associative double chain with Java's
    truncating cast and Long.MAX_VALUE saturation; final order
    (value DESC, key ASC); keys carry the 0x1e separator."""
    maxd = "9223372036854775808.0"
    # the reference ACCUMULATES backoff (backoff *= ALPHA per level) and
    # then multiplies once — MAX·(0.4·0.4), not (MAX·0.4)·0.4
    a04 = f"{maxd} * 0.4"
    a016 = f"{maxd} * (0.4 * 0.4)"
    return f"""
WITH fwords AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
ftp AS (
    SELECT doc_id, ws[i] AS term, i AS pos
    FROM fwords, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE ws[i] <> ''
),
uni AS (SELECT term, count(*)::BIGINT AS cnt FROM ftp GROUP BY term),
tot AS (SELECT sum(cnt)::BIGINT AS t FROM uni),
bi AS (
    SELECT a.term AS t1, b.term AS t2, count(*)::BIGINT AS cnt
    FROM ftp a JOIN ftp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1, 2
),
tri AS (
    SELECT a.term AS t1, b.term AS t2, c.term AS t3, count(*)::BIGINT AS cnt
    FROM ftp a
    JOIN ftp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    JOIN ftp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    GROUP BY 1, 2, 3
),
lvl3 AS (
    SELECT t3 AS frag, '{c1}' || chr(30) || '{c2}' || chr(30) || t3 AS key,
           {maxd} * 1.0 * CAST(cnt AS DOUBLE)
               / CAST((SELECT cnt FROM bi WHERE t1 = '{c1}' AND t2 = '{c2}')
                      AS DOUBLE) AS v
    FROM (SELECT t3, cnt,
                 row_number() OVER (ORDER BY cnt DESC, t3 ASC) AS rn
          FROM tri WHERE t1 = '{c1}' AND t2 = '{c2}' AND t3 LIKE '{prefix}%')
    WHERE rn <= {num}
),
lvl2 AS (
    SELECT t2 AS frag, '{c2}' || chr(30) || t2 AS key,
           {a04} * CAST(cnt AS DOUBLE)
               / CAST((SELECT cnt FROM uni WHERE term = '{c2}') AS DOUBLE) AS v
    FROM (
        SELECT t2, cnt,
               row_number() OVER (ORDER BY cnt DESC, t2 ASC) AS rn2
        FROM (SELECT t2, cnt,
                     row_number() OVER (ORDER BY cnt DESC, t2 ASC) AS rn
              FROM bi WHERE t1 = '{c2}' AND t2 LIKE '{prefix}%')
        WHERE rn <= {num} + (SELECT count(*) FROM lvl3)
          AND t2 NOT IN (SELECT frag FROM lvl3)
    )
    WHERE rn2 <= {num}
),
lvl1 AS (
    SELECT term AS frag, term AS key,
           {a016} * CAST(cnt AS DOUBLE)
               / CAST((SELECT t FROM tot) AS DOUBLE) AS v
    FROM (
        SELECT term, cnt,
               row_number() OVER (ORDER BY cnt DESC, term ASC) AS rn2
        FROM (SELECT term, cnt,
                     row_number() OVER (ORDER BY cnt DESC, term ASC) AS rn
              FROM uni WHERE term LIKE '{prefix}%')
        WHERE rn <= {num} + (SELECT count(*) FROM lvl3)
                          + (SELECT count(*) FROM lvl2)
          AND term NOT IN (SELECT frag FROM lvl3)
          AND term NOT IN (SELECT frag FROM lvl2)
    )
    WHERE rn2 <= {num}
),
unioned AS (
    SELECT key, v FROM lvl3
    UNION ALL SELECT key, v FROM lvl2
    UNION ALL SELECT key, v FROM lvl1
),
valued AS (
    SELECT key AS term,
           CASE WHEN trunc(v) >= {maxd}
                THEN 9223372036854775807
                ELSE CAST(trunc(v) AS BIGINT) END AS value
    FROM unioned
)
SELECT term, value FROM valued
ORDER BY value DESC, term ASC
LIMIT {num}
"""


def infix_lookup_sql(
    exact: str, prefix: str, num: int, title_words: int = 4
) -> str:
    """AnalyzingInfixSuggester twin (``suggest/.../analyzing/
    AnalyzingInfixSuggester.java:620-720``) over entries = the first
    ``title_words`` words of each doc, weight = n_chars: the two-token
    query "<exact> <prefix>" matches entries containing token ``exact``
    AND a token starting with ``prefix`` ANYWHERE (allTermsRequired),
    ranked (weight DESC, surface ASC)."""
    return f"""
WITH ttl AS (
    SELECT doc_id,
           array_to_string(string_split(text, ' ')[1:{title_words}], ' ')
               AS surface,
           n_chars AS weight
    FROM documents
),
tok AS (
    SELECT DISTINCT ttl.doc_id, t.term
    FROM ttl, unnest(string_split(surface, ' ')) AS t(term)
    WHERE t.term <> ''
),
m AS (
    SELECT surface, weight FROM ttl
    WHERE EXISTS (SELECT 1 FROM tok
                  WHERE tok.doc_id = ttl.doc_id AND term = '{exact}')
      AND EXISTS (SELECT 1 FROM tok
                  WHERE tok.doc_id = ttl.doc_id AND term LIKE '{prefix}%')
)
SELECT surface AS term, CAST(weight AS BIGINT) AS value
FROM m ORDER BY weight DESC, surface ASC LIMIT {num}
"""


def blended_infix_lookup_sql(
    exact: str, prefix: str, key_raw: str, num: int,
    num_factor: int = 10, title_words: int = 4,
) -> str:
    """BlendedInfixSuggester twin (``suggest/.../analyzing/
    BlendedInfixSuggester.java:196-281,309-379``, linear blender) over
    the same first-``title_words``-words entries: top num·num_factor
    infix candidates by raw weight, re-scored by the first matched
    token's position — coefficient 1 when the surface starts with the
    raw key, else 1 − 0.10·minpos; weight 0→1 then |w|<10 scaled ×10;
    score = trunc(w·coef); DISTINCT (surface, score) kept top-num by
    (score DESC, surface DESC) — the reference's descending TreeSet."""
    return f"""
WITH ttl AS (
    SELECT doc_id,
           array_to_string(string_split(text, ' ')[1:{title_words}], ' ')
               AS surface,
           n_chars AS weight
    FROM documents
),
tokp AS (
    SELECT s.doc_id, s.ws2[i] AS term, i - 1 AS pos
    FROM (SELECT doc_id, string_split(surface, ' ') AS ws2 FROM ttl) s,
         unnest(generate_series(1, len(s.ws2))) AS t(i)
    WHERE s.ws2[i] <> ''
),
tokfirst AS (SELECT doc_id, term, min(pos) AS pos FROM tokp GROUP BY 1, 2),
m AS (
    SELECT doc_id, surface, weight FROM ttl
    WHERE EXISTS (SELECT 1 FROM tokfirst tf
                  WHERE tf.doc_id = ttl.doc_id AND tf.term = '{exact}')
      AND EXISTS (SELECT 1 FROM tokfirst tf
                  WHERE tf.doc_id = ttl.doc_id AND tf.term LIKE '{prefix}%')
),
pool AS (
    SELECT * FROM (
        SELECT doc_id, surface, weight,
               row_number() OVER (ORDER BY weight DESC, surface ASC) AS rn
        FROM m
    ) WHERE rn <= {num * num_factor}
),
mp AS (
    SELECT doc_id, min(pos) AS minpos FROM tokfirst
    WHERE term = '{exact}' OR term LIKE '{prefix}%'
    GROUP BY doc_id
),
adj AS (
    SELECT surface, minpos,
           CASE WHEN w1 > -10 AND w1 < 10
                THEN CAST(trunc(w1 * 10.0) AS BIGINT) ELSE w1 END AS w2
    FROM (SELECT p.surface, mp.minpos,
                 CASE WHEN p.weight = 0 THEN 1 ELSE p.weight END AS w1
          FROM pool p JOIN mp USING (doc_id))
),
scored AS (
    SELECT surface,
           CAST(trunc(CAST(w2 AS DOUBLE) *
                (CASE WHEN surface LIKE '{key_raw}%' THEN 1.0
                      ELSE 1.0 - 0.10 * minpos END)) AS BIGINT) AS score
    FROM adj
)
SELECT DISTINCT surface AS term, score AS value
FROM scored ORDER BY value DESC, term DESC LIMIT {num}
"""


def fuzzy_complete_sql(key: str, k: int) -> str:
    """FuzzySuggester twin (``suggest/.../analyzing/FuzzySuggester.java:
    50-91``) over index-term entries (weight = docFreq): completions
    whose key has a prefix within OSA distance 1 of the typed key — the
    first byte exact (NON_FUZZY_PREFIX 1), prefix lengths |key|±1, OSA ≡
    Damerau-Levenshtein at distance ≤ 1 — ranked (weight DESC, term
    ASC).  Requires len(key) ≥ MIN_FUZZY_LENGTH (the caller's contract;
    shorter keys take the exact-prefix path)."""
    assert len(key) >= 3
    qsuf = key[1:]
    qlen = len(key)
    ors = " OR ".join(
        f"damerau_levenshtein(substr(term, 2, {m - 1}), '{qsuf}') <= 1"
        for m in range(qlen - 1, qlen + 2)
    )
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
),
cand AS (
    SELECT term, df FROM ts
    WHERE substr(term, 1, 1) = '{key[0]}'
      AND length(term) >= {qlen - 1}
      AND ({ors})
)
SELECT term, CAST(df AS BIGINT) AS value
FROM cand ORDER BY df DESC, term ASC LIMIT {k}
"""


def simple_parse_topk_sql(k: int) -> str:
    """Oracle for the SimpleQueryParser gate string
    ``data + (merge | join) -batch`` — the tree the lenient grammar
    builds (derived from ``SimpleQueryParser.java:345-390`` semantics,
    independently of the engine's parser):

        SHOULD( MUST(data, SHOULD(merge, join)),
                (MUST_NOT batch, SHOULD MatchAll) )

    i.e. docs matching data∧(merge∨join) score their conjunction sum,
    every batch-free doc adds the MatchAll constant 1.0, and the outer
    disjunction sums in double per doc, each Boolean level float32-cast."""
    return f"""
WITH {BASE_CTES}, {_term_cte('d', 'data')}, {_term_cte('m', 'merge')},
{_term_cte('j', 'join')},
tf_b AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'batch'),
orq AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM (SELECT doc_id, score FROM sc_m
          UNION ALL SELECT doc_id, score FROM sc_j)
    GROUP BY doc_id
),
and1 AS (
    SELECT d.doc_id,
           CAST(CAST(d.score AS DOUBLE) + CAST(o.score AS DOUBLE) AS FLOAT)
               AS score
    FROM sc_d d JOIN orq o USING (doc_id)
),
neg AS (
    SELECT doc_id, CAST(1.0 AS FLOAT) AS score FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM tf_b)
),
combined AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM (SELECT doc_id, score FROM and1
          UNION ALL SELECT doc_id, score FROM neg)
    GROUP BY doc_id
)
{_topk('combined', k)}
"""


def common_terms_topk_sql(
    low_terms: list[str], high_terms: list[str], k: int
) -> str:
    """CommonTermsQuery twin (``queries/CommonTermsQuery.java:95-171``)
    for the SHOULD/SHOULD default shape with the gate's pre-derived
    frequency split: low-freq group (MUST clause) = SHOULD sum of the
    rare terms; high-freq group (SHOULD clause) = SHOULD sum of the
    common terms — per doc the outer conjunction adds the two group
    floats in double, cast float (docs without any high-freq match keep
    the low group alone; docs without a low-freq match don't match)."""
    if not low_terms or not high_terms:
        raise ValueError(
            "common_terms_topk_sql needs both groups non-empty (a "
            "single-sided split degenerates to a plain Boolean oracle)"
        )
    lows = [(f"l{i}", t) for i, t in enumerate(low_terms)]
    highs = [(f"h{i}", t) for i, t in enumerate(high_terms)]
    ctes = ", ".join(_term_cte(n, t).lstrip() for n, t in lows + highs)
    lowu = " UNION ALL ".join(
        f"SELECT doc_id, score FROM sc_{n}" for n, _ in lows
    )
    highu = " UNION ALL ".join(
        f"SELECT doc_id, score FROM sc_{n}" for n, _ in highs
    )
    return f"""
WITH {BASE_CTES}, {ctes},
lowg AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM ({lowu}) GROUP BY doc_id
),
highg AS (
    SELECT doc_id, CAST(sum(CAST(score AS DOUBLE)) AS FLOAT) AS score
    FROM ({highu}) GROUP BY doc_id
),
combined AS (
    SELECT l.doc_id,
           CAST(CAST(l.score AS DOUBLE)
                + COALESCE(CAST(h.score AS DOUBLE), 0.0) AS FLOAT) AS score
    FROM lowg l LEFT JOIN highg h USING (doc_id)
)
{_topk('combined', k)}
"""


# --------------------------------------------------------------- misc module


def sweetspot_term_topk_sql(
    term: str,
    ln_min: int,
    ln_max: int,
    steepness: float,
    tf_base: float,
    tf_min: float,
    k: int,
) -> str:
    """SweetSpotSimilarity (``misc/SweetSpotSimilarity.java``): Classic
    idf with the plateau lengthNorm (:111-120) and baselineTf (:142-147),
    per-op float32 rounding mirroring ``_SweetSpotLeaf``."""
    import numpy as _np

    b2 = float(_np.float32(tf_base) * _np.float32(tf_base))
    return f"""
WITH {BASE_CTES},
tf_a AS (
    SELECT doc_id, count(*)::INT AS freq FROM toks WHERE term = '{term}' GROUP BY doc_id
),
w AS (
    SELECT CAST(ln((fs.n + 1) / CAST(st.df + 1 AS DOUBLE)) + 1.0 AS FLOAT) AS w
    FROM fs, (SELECT count(*)::BIGINT AS df FROM tf_a) st
),
sc AS (
    SELECT tf.doc_id,
           CAST(CAST(w.w *
                CASE WHEN CAST(tf.freq AS FLOAT) <= CAST({tf_min} AS FLOAT)
                     THEN CAST({tf_base} AS FLOAT)
                     ELSE CAST(sqrt(CAST((CAST(tf.freq AS FLOAT)
                                          + CAST({b2} AS FLOAT))
                                         - CAST({tf_min} AS FLOAT) AS DOUBLE))
                          AS FLOAT)
                END AS FLOAT)
                * CAST(1.0 / sqrt(CAST(
                      (CAST({steepness} AS FLOAT)
                       * CAST(abs(n.qlen - {ln_min}) + abs(n.qlen - {ln_max})
                              - ({ln_max} - {ln_min}) AS FLOAT))
                      + CAST(1.0 AS FLOAT) AS DOUBLE)) AS FLOAT)
           AS FLOAT) AS score
    FROM tf_a tf JOIN norm n USING (doc_id) CROSS JOIN w
)
{_topk('sc', k)}
"""


def diversified_topk_sql(term: str, key_col: str, max_per_key: int, k: int) -> str:
    """DiversifiedTopDocsCollector (``misc/search/
    DiversifiedTopDocsCollector.java``): BM25 hits, at most max_per_key
    per ``documents.<key_col>`` value, global top-k; ties doc_id ASC."""
    return f"""
WITH {BASE_CTES}, {_term_cte('a', term)},
keyed AS (
    SELECT s.doc_id, s.score,
           row_number() OVER (PARTITION BY d.{key_col}
                              ORDER BY s.score DESC, s.doc_id ASC) AS key_rank
    FROM sc_a s JOIN documents d USING (doc_id)
)
SELECT doc_id, CAST(score AS DOUBLE) AS score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1 AS INT) AS rank
FROM keyed WHERE key_rank <= {max_per_key}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def high_freq_terms_sql(n: int, by: str = "ttf") -> str:
    """HighFreqTerms (``misc/HighFreqTerms.java``): top-n terms by total
    term frequency (``-t``) or doc frequency; ties term ASC."""
    order = (
        "total_term_freq DESC, term ASC" if by == "ttf" else "doc_freq DESC, term ASC"
    )
    return f"""
WITH {BASE_CTES},
ts AS (
    SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq,
           count(*)::BIGINT AS total_term_freq
    FROM toks GROUP BY term
)
SELECT term, doc_freq, total_term_freq FROM ts
ORDER BY {order} LIMIT {n}
"""
