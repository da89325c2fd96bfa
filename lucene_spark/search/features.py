"""Higher-level search features from the reference's satellite modules.

* :func:`more_like_this` — ``queries/mlt/MoreLikeThis.java``: pick the
  source doc's most interesting terms (tf·idf ranked) and build an OR
  query; returns (query, interesting_terms),
* :func:`suggest_terms` — the suggest/spellcheck module
  (``suggest/``, ``DirectSpellChecker``): candidate terms within edit
  distance of the input, ranked by (distance ASC, docFreq DESC, term ASC),
* :func:`term_vectors` — per-document term/freq vectors
  (``Lucene90TermVectorsFormat``): a projection of the postings (our
  postings are doc-keyed rows, so a "term vector" is just a filter —
  no separate storage needed),
* :func:`fetch_docs` — stored-fields hit retrieval
  (``Lucene90StoredFieldsFormat``): hits joined back to the source table
  by docID (the source parquet IS the stored-fields file),
* :func:`highlight` — minimal unified-highlighter analog: wrap query-term
  word matches in tags via one JVM ``regexp_replace`` (offsets-free; the
  gate corpus is whitespace-tokenized so word-boundary regex is exact),
* :func:`join_query` — ``JoinUtil.createJoinQuery``: query-time join —
  docs on the "to" side whose join field matches any hit of the "from"
  side (a semi-join; Lucene collects from-side terms, we broadcast them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_spark.index.builder import IndexTables
from lucene_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    TermQuery,
)


def interesting_terms(
    idx: IndexTables, doc_id: int, max_terms: int = 5, field: str = "text"
) -> list[str]:
    """MLT term selection: the doc's terms ranked by tf·idf-style weight
    (freq · ln(1 + (N - df + 0.5)/(df + 0.5))), ties by term ASC."""
    doc_count = int(
        idx.fieldstats.filter(F.col("field") == field).collect()[0]["doc_count"]
    )
    rows = (
        idx.postings.filter((F.col("field") == field) & (F.col("doc_id") == doc_id))
        .join(idx.termstats, ["field", "term"])
        .withColumn(
            "mlt_w",
            F.col("freq")
            * F.log(
                1
                + (F.lit(doc_count) - F.col("doc_freq") + 0.5)
                / (F.col("doc_freq") + 0.5)
            ),
        )
        .orderBy(F.desc("mlt_w"), F.asc("term"))
        .limit(max_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def more_like_this(
    idx: IndexTables, doc_id: int, max_terms: int = 5, field: str = "text"
) -> BooleanQuery:
    terms = interesting_terms(idx, doc_id, max_terms, field)
    return BooleanQuery(
        tuple(BooleanClause(Occur.SHOULD, TermQuery(t, field)) for t in terms)
    )


def suggest_terms(
    idx: IndexTables, text: str, k: int = 5, max_edits: int = 2, field: str = "text"
) -> DataFrame:
    """(term, distance, doc_freq) spell suggestions, best first."""
    cand = idx.termstats.filter(
        (F.col("field") == field)
        & F.length("term").between(len(text) - max_edits, len(text) + max_edits)
        & (F.col("term") != text)
    ).withColumn("distance", F.levenshtein(F.col("term"), F.lit(text)))
    return (
        cand.filter(F.col("distance") <= max_edits)
        .select("term", "distance", "doc_freq")
        .orderBy(F.asc("distance"), F.desc("doc_freq"), F.asc("term"))
        .limit(k)
    )


def term_vectors(idx: IndexTables, doc_ids: list[int], field: str = "text") -> DataFrame:
    """(doc_id, term, freq) vectors for the given docs, term ASC."""
    return (
        idx.postings.filter(
            (F.col("field") == field) & F.col("doc_id").isin([int(d) for d in doc_ids])
        )
        .select("doc_id", "term", "freq")
        .orderBy("doc_id", "term")
    )


def fetch_docs(hits: DataFrame, source: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Stored-fields retrieval: hits (doc_id, score, …) joined to source."""
    src = source if cols is None else source.select("doc_id", *cols)
    return hits.join(src, "doc_id").orderBy(F.desc("score"), F.asc("doc_id"))


def highlight(
    hits_with_text: DataFrame,
    terms: list[str],
    text_col: str = "text",
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """Wrap whole-word query-term matches in tags (one JVM regexp pass)."""
    import re as _re

    pattern = r"\b(" + "|".join(_re.escape(t) for t in terms) + r")\b"
    return hits_with_text.withColumn(
        "highlighted",
        F.regexp_replace(F.col(text_col), pattern, pre + r"$1" + post),
    )


def join_query(
    from_hits: DataFrame,
    from_meta: DataFrame,
    from_col: str,
    to_df: DataFrame,
    to_col: str,
) -> DataFrame:
    """JoinUtil: 'to'-side rows whose ``to_col`` ∈ from-side hit values."""
    keys = (
        from_hits.join(from_meta.select("doc_id", from_col), "doc_id")
        .select(F.col(from_col).alias("_jk"))
        .distinct()
    )
    return to_df.join(F.broadcast(keys), to_df[to_col] == F.col("_jk"), "left_semi")
