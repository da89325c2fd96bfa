"""DuckDB oracle-SQL twins for the extras operators (dedup / similarity /
textstats / multimodal).

Every generator reproduces its Spark operator's math exactly over the same
``documents`` / ``embeddings`` views (see each operator's docstring for the
shared determinism contracts: the md5-prefix 32-bit hash, MinHash seeds,
6-decimal rounding before ordering)."""

from __future__ import annotations

from lucene_spark.extras.dedup import MERSENNE_P, minhash_seeds
from lucene_spark.extras.textstats import BPE_ISH_PATTERN, LANG_ORDER, LANG_PROFILES

H32 = "CAST(('0x' || substr(md5({col}),1,8)) AS BIGINT)"

# documents with injected duplicates: every doc_id % 50 == 0 re-appears
# shifted by +100000 — gives the dedup oracles real work, deterministically.
DOCS_WITH_DUPS = """
docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
)
"""

_SHINGLES = """
words AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM docs
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
    FROM words, unnest(generate_series(1, greatest(0, len(ws) - 2))) AS t(i)
    WHERE array_to_string(ws[i:i+2], ' ') <> ''
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_sh FROM sh GROUP BY doc_id)
"""

_JACCARD = """
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS i
    FROM sh x JOIN sh y USING (shingle)
    WHERE x.doc_id < y.doc_id
    GROUP BY 1, 2
),
jac AS (
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
)
"""


def exact_dup_groups_sql() -> str:
    return f"""
WITH {DOCS_WITH_DUPS}
SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_docs,
       min(doc_id) AS min_doc_id
FROM docs GROUP BY 1 HAVING count(*) > 1
ORDER BY content_hash
"""


def ngram_jaccard_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {DOCS_WITH_DUPS}, {_SHINGLES}, {_JACCARD}
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= {threshold}
ORDER BY doc_a, doc_b
"""


def _minhash_cand_ctes(num_hashes: int, bands: int, seed: int) -> str:
    """CTE chain ``shh``→``cand`` (banded MinHash candidates over ``sh``)."""
    a, b = minhash_seeds(num_hashes, seed)
    a_lit = "[" + ",".join(str(int(x)) for x in a) + "]"
    b_lit = "[" + ",".join(str(int(x)) for x in b) + "]"
    r = num_hashes // bands
    return f"""
shh AS (SELECT doc_id, {H32.format(col='shingle')} AS h FROM sh),
mh AS (
    SELECT doc_id, t.i,
           min((({a_lit})[t.i + 1] * h + ({b_lit})[t.i + 1]) % {MERSENNE_P}) AS v
    FROM shh, unnest(generate_series(0, {num_hashes - 1})) AS t(i)
    GROUP BY doc_id, t.i
),
sig AS (SELECT doc_id, list(v ORDER BY i) AS s FROM mh GROUP BY doc_id),
banded AS (
    SELECT doc_id, t.b AS band,
           md5(array_to_string(s[t.b * {r} + 1 : t.b * {r} + {r}], '_')) AS bucket
    FROM sig, unnest(generate_series(0, {bands - 1})) AS t(b)
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM banded x JOIN banded y USING (band, bucket)
    WHERE x.doc_id < y.doc_id
)"""


def minhash_lsh_pairs_sql(
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    touching_min_id: int | None = None,
) -> str:
    """``touching_min_id`` restricts to pairs touching a doc with id ≥ it —
    the incremental-dedup twin (new ids are the shifted dup copies, so any
    pair involving a new doc has doc_b ≥ the shift; banding is deterministic
    hence batch-restricted == incremental)."""
    incr = (
        f"AND j.doc_b >= {touching_min_id}" if touching_min_id is not None else ""
    )
    return f"""
WITH {DOCS_WITH_DUPS}, {_SHINGLES},
{_minhash_cand_ctes(num_hashes, bands, seed).lstrip()},
{_JACCARD.strip().lstrip()}
SELECT j.doc_a, j.doc_b, round(j.jaccard, 6) AS jaccard
FROM jac j SEMI JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= {threshold} {incr}
ORDER BY j.doc_a, j.doc_b
"""


def curation_sql(
    near_threshold: float = 0.5,
    min_words: int = 1,
    max_words: int = 1_000_000,
    allowed_langs: tuple = ("en",),
    min_quality: float = 0.0,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    near_policy: str = "keep_first",
) -> str:
    """The composed curation pipeline (extras/curation.py ``curate``):
    per-doc keep/reason with precedence exact_dup > near_dup > length >
    lang > quality, over the dup-injected corpus.

    ``near_policy="components"``: near-dup drops are every pair-graph
    member except its connected component's smallest doc_id — the
    transitive closure computed INDEPENDENTLY by a recursive CTE (not by
    label propagation), so the oracle checks the engine's iterative
    algorithm against the declarative definition."""
    best_lang, best_hits = _lang_exprs()
    langs = ", ".join(f"'{lg}'" for lg in allowed_langs)
    if near_policy == "components":
        near_cte = f"""
vp AS (
    SELECT j.doc_a, j.doc_b
    FROM jac j SEMI JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
    WHERE j.jaccard >= {near_threshold}
),
eg AS (
    SELECT doc_a AS a, doc_b AS b FROM vp
    UNION SELECT doc_b, doc_a FROM vp
),
reach(a, b) AS (
    SELECT a, b FROM eg
    UNION
    SELECT r.a, e.b FROM reach r JOIN eg e ON r.b = e.a
),
comp AS (
    SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
),
near_drops AS (SELECT doc_id FROM comp WHERE doc_id <> component)"""
    else:
        near_cte = f"""
near_drops AS (
    SELECT DISTINCT j.doc_b AS doc_id
    FROM jac j SEMI JOIN cand c ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
    WHERE j.jaccard >= {near_threshold}
)"""
    return f"""
WITH RECURSIVE {DOCS_WITH_DUPS}, {_SHINGLES},
{_minhash_cand_ctes(num_hashes, bands, seed).lstrip()},
{_JACCARD.strip().lstrip()},
{near_cte.strip()},
keepers AS (
    SELECT md5(text) AS h, min(doc_id) AS keeper FROM docs GROUP BY 1
),
{_quality_ctes('docs').lstrip()},
lbase AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM docs
),
lng AS (
    SELECT doc_id,
           CASE WHEN {best_hits} > 0 THEN {best_lang} ELSE 'und' END AS lang
    FROM lbase
),
flags AS (
    SELECT d.doc_id,
           (d.doc_id <> k.keeper) AS exact_dup,
           (nd.doc_id IS NOT NULL) AS near_dup,
           CAST(q.n_words AS INT) AS n_words,
           round(0.25 * q.len_score + 0.25 * least(q.stop_ratio * 5.0, 1.0)
                 + 0.25 * greatest(0.0, 1.0 - q.punct_ratio * 4.0)
                 + 0.25 * greatest(0.0, 1.0 - q.digit_ratio * 4.0), 6) AS quality,
           l.lang
    FROM docs d
    JOIN keepers k ON md5(d.text) = k.h
    LEFT JOIN near_drops nd ON nd.doc_id = d.doc_id
    JOIN qual q ON q.doc_id = d.doc_id
    JOIN lng l ON l.doc_id = d.doc_id
),
reasons AS (
    SELECT doc_id,
        CASE WHEN exact_dup THEN 'exact_dup'
             WHEN near_dup THEN 'near_dup'
             WHEN n_words < {min_words} OR n_words > {max_words} THEN 'length'
             WHEN lang NOT IN ({langs}) THEN 'lang'
             WHEN quality < {min_quality} THEN 'quality'
             ELSE 'kept' END AS reason
    FROM flags
)
SELECT doc_id, (reason = 'kept') AS keep, reason FROM reasons ORDER BY doc_id
"""


def simhash_pairs_sql(max_distance: int = 3) -> str:
    return f"""
WITH {DOCS_WITH_DUPS},
toks AS (
    SELECT doc_id, t.w FROM (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM docs
    ), unnest(ws) AS t(w)
    WHERE t.w <> ''
),
th AS (SELECT doc_id, {H32.format(col='w')} AS hlo,
              CAST(('0x' || substr(md5(w), 9, 8)) AS BIGINT) AS hhi
       FROM toks),
bits AS (
    SELECT doc_id, t.i,
           sum(CASE WHEN (hlo >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS slo,
           sum(CASE WHEN (hhi >> t.i) & 1 = 1 THEN 1 ELSE -1 END) AS shi
    FROM th, unnest(generate_series(0, 31)) AS t(i)
    GROUP BY doc_id, t.i
),
sig AS (
    SELECT doc_id,
           sum(CASE WHEN slo > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS sim_lo,
           sum(CASE WHEN shi > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS sim_hi
    FROM bits GROUP BY doc_id
)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.sim_lo, y.sim_lo))
            + bit_count(xor(x.sim_hi, y.sim_hi)) AS INT) AS hamming
FROM sig x JOIN sig y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.sim_lo, y.sim_lo))
      + bit_count(xor(x.sim_hi, y.sim_hi)) <= {max_distance}
ORDER BY doc_a, doc_b
"""


_COS = """
round(
    list_dot_product(x.v, y.v) /
    (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)
"""


def embedding_near_dup_sql(threshold: float = 0.9) -> str:
    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT x.id AS id_a, y.id AS id_b, {_COS} AS cos
FROM e x JOIN e y ON x.id < y.id
WHERE {_COS} >= {threshold}
ORDER BY id_a, id_b
"""


def lsh_embedding_near_dup_sql(
    threshold: float = 0.95,
    n_copies: int = 50,
    id_offset: int = 100000,
    scale: float = 0.05,
) -> str:
    """Ground-truth twin of the LSH scale-path gate: ALL pairs >= threshold
    over the embeddings augmented with the deterministic perturbed copies
    (``similarity.with_perturbed_copies`` — integer-math noise, bit-exact
    across engines; DuckDB lists are 1-based so the Spark 0-based transform
    index is ``i - 1``).  The Spark side answers via banded hyperplane LSH
    + exact verification, so a green gate row IS the recall=1 assertion:
    any candidate the bands missed would show up as a missing oracle row."""
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cop AS (
    SELECT vec_id + {id_offset} AS vec_id,
           [v[i] + {scale} * (CAST((((vec_id * 31) + (i - 1) * 7) % 13) - 6 AS DOUBLE) / 100.0)
            FOR i IN generate_series(1, len(v))] AS v
    FROM base WHERE vec_id < {n_copies}
),
e AS (
    SELECT vec_id AS id, v FROM base
    UNION ALL
    SELECT vec_id AS id, v FROM cop
)
SELECT x.id AS id_a, y.id AS id_b, {_COS} AS cos
FROM e x JOIN e y ON x.id < y.id
WHERE list_dot_product(x.v, y.v) /
      (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
      >= {threshold}
ORDER BY id_a, id_b
"""


def knn_cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """Top-k by cosine to the embedding of ``query_vec_id`` (rounded-then-
    ranked, tie-break vec_id ASC — mirrors similarity.knn_brute)."""
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = {query_vec_id}),
scored AS (
    SELECT e.vec_id,
           round(list_dot_product(e.v, q.v) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))),
                 6) AS cos
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e, q
)
SELECT vec_id, cos,
       CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) - 1 AS INT) AS rank
FROM scored ORDER BY cos DESC, vec_id ASC LIMIT {k}
"""


# ------------------------------------------------------------------ textstats


def token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END AS INT)
           AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars
FROM documents ORDER BY doc_id
"""


def _quality_ctes(src: str) -> str:
    """CTE chain ``qbase``/``qual`` — per-doc n_words/ratios/quality over
    ``src`` (shared by the standalone oracle and the curation pipeline)."""
    stops = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
qbase AS (
    SELECT doc_id, text,
        string_split_regex(trim(lower(text)), '\\s+') AS ws,
        CASE WHEN trim(text) = '' THEN 0.0
             ELSE CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE)
        END AS n_words,
        CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS n_chars,
        CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) AS n_punct,
        CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS n_digit
    FROM {src}
),
qual AS (
    SELECT doc_id, n_words,
        n_chars / greatest(n_words, 1.0) AS mean_wl,
        n_punct / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        n_digit / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
        CAST(len(list_filter(ws, x -> list_contains([{stops}], x))) AS DOUBLE)
            / greatest(n_words, 1.0) AS stop_ratio,
        least(n_words / 100.0, 1.0) AS len_score
    FROM qbase
)"""


def quality_scores_sql() -> str:
    return f"""
WITH {_quality_ctes('documents').lstrip()}
SELECT doc_id,
       CAST(n_words AS INT) AS n_words,
       round(mean_wl, 6) AS mean_word_len,
       round(punct_ratio, 6) AS punct_ratio,
       round(digit_ratio, 6) AS digit_ratio,
       round(stop_ratio, 6) AS stop_ratio,
       round(0.25 * len_score + 0.25 * least(stop_ratio * 5.0, 1.0)
             + 0.25 * greatest(0.0, 1.0 - punct_ratio * 4.0)
             + 0.25 * greatest(0.0, 1.0 - digit_ratio * 4.0), 6) AS quality
FROM qual ORDER BY doc_id
"""


def _lang_exprs() -> tuple:
    """(best_lang_expr, best_hits_expr) over a ``ws`` word-list column —
    argmax with LANG_ORDER tie-break = fold of strict > comparisons."""
    hit_exprs = {
        lang: (
            "CAST(len(list_filter(ws, x -> list_contains(["
            + ", ".join(f"'{w}'" for w in prof)
            + "], x))) AS INT)"
        )
        for lang, prof in LANG_PROFILES.items()
    }
    best_lang, best_hits = f"'{LANG_ORDER[0]}'", hit_exprs[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        h = hit_exprs[lang]
        best_lang = f"CASE WHEN {h} > {best_hits} THEN '{lang}' ELSE {best_lang} END"
        best_hits = f"CASE WHEN {h} > {best_hits} THEN {h} ELSE {best_hits} END"
    return best_lang, best_hits


def lang_id_sql() -> str:
    best_lang, best_hits = _lang_exprs()
    return f"""
WITH base AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws FROM documents
)
SELECT doc_id,
       CASE WHEN {best_hits} > 0 THEN {best_lang} ELSE 'und' END AS lang,
       {best_hits} AS lang_hits
FROM base ORDER BY doc_id
"""


def fingerprints_sql() -> str:
    return """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),
                               '\\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""


# ----------------------------------------------------------------- multimodal


def media_summary_sql() -> str:
    # payload bytes == utf-8 of text, so md5(text) == md5(payload)
    return """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       'fake/utf8' AS format
FROM documents ORDER BY doc_id
"""


def duplicated_substring_spans_sql(window: int = 5, min_count: int = 2) -> str:
    """Oracle twin of ``dedup.duplicated_substring_spans`` (exact string
    keys): fixed-window word shingles with corpus-wide occurrence counts,
    duplicated windows merged into maximal per-doc spans via the classic
    gaps-and-islands window recipe (new island when the next start is more
    than ``window`` past the previous)."""
    return f"""
WITH words AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS ws
    FROM documents
),
win AS (
    SELECT doc_id, i - 1 AS s,
           array_to_string(ws[i : i + {window} - 1], ' ') AS key
    FROM words, unnest(generate_series(1, len(ws) - {window} + 1)) AS t(i)
    WHERE len(ws) >= {window}
),
dup AS (SELECT key FROM win GROUP BY key HAVING count(*) >= {min_count}),
d AS (SELECT doc_id, s FROM win JOIN dup USING (key)),
isl AS (
    SELECT doc_id, s,
           CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s)
                     <= {window} THEN 0 ELSE 1 END AS brk
    FROM d
),
g AS (
    SELECT doc_id, s,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY s) AS gid
    FROM isl
)
SELECT doc_id,
       CAST(min(s) AS BIGINT) AS span_start,
       CAST(max(s) + {window} - 1 AS BIGINT) AS span_end
FROM g GROUP BY doc_id, gid
ORDER BY doc_id, span_start
"""
