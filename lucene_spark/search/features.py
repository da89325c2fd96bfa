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

import numpy as np
import pandas as pd
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


class AnalyzingSuggester:
    """Autocomplete suggester (``suggest/.../analyzing/AnalyzingSuggester.
    java:100``): entries are (surface, weight); both the stored key and the
    lookup prefix pass through the analyzer (case folding, stops), and
    completions rank by (weight DESC, surface ASC).

    Lucene packs (analyzed-key → surface, weight) into an FST and walks the
    prefix arc; the Spark-native shape is a small keyed DataFrame with a
    ``startswith`` prefix scan + TakeOrderedAndProject — at 100 TB the
    entries table is dictionary-sized (distinct suggestions), broadcastable,
    and the prefix filter pushes down to its parquet.  An FST would only
    help driver-side latency, not the distributed plan.
    """

    def __init__(self, entries: DataFrame, analyzer=None, surface_col: str = "surface",
                 weight_col: str = "weight"):
        from lucene_spark.analysis.analyzer import StandardAnalyzer
        from lucene_spark.index.builder import make_analyze_udf

        self.analyzer = analyzer or StandardAnalyzer()
        analyze = make_analyze_udf(self.analyzer)
        self.entries = entries.select(
            F.array_join(analyze(F.col(surface_col)), " ").alias("key"),
            F.col(surface_col).alias("surface"),
            F.col(weight_col).cast("long").alias("weight"),
        )

    @classmethod
    def from_index_terms(cls, idx: IndexTables, field: str = "text") -> "AnalyzingSuggester":
        """Build from the index's terms dictionary, weight = docFreq — the
        classic 'suggest from the corpus vocabulary' setup."""
        entries = idx.termstats.filter(F.col("field") == field).select(
            F.col("term").alias("surface"), F.col("doc_freq").alias("weight")
        )
        out = cls.__new__(cls)
        from lucene_spark.analysis.analyzer import StandardAnalyzer

        out.analyzer = StandardAnalyzer()
        # index terms are already analyzed — key == surface
        out.entries = entries.select(
            F.col("surface").alias("key"), "surface",
            F.col("weight").cast("long").alias("weight"),
        )
        return out

    def lookup(self, prefix: str, k: int = 5) -> DataFrame:
        """(surface, weight) completions of ``prefix``, best first."""
        key = " ".join(self.analyzer.analyze(prefix))
        return (
            self.entries.filter(F.col("key").startswith(key))
            .select("surface", "weight")
            .orderBy(F.desc("weight"), F.asc("surface"))
            .limit(k)
        )


def unified_highlight(
    hits: DataFrame,
    source: DataFrame,
    terms: list[str],
    text_col: str = "text",
    window: int = 10,
    pre: str = "<b>",
    post: str = "</b>",
    k1: float = 1.2,
    b: float = 0.75,
    pivot: float = 87.0,
    max_passages: int = 1,
    segmenter: str = "window",
    positions: DataFrame | None = None,
    field: str = "text",
) -> DataFrame:
    """Unified-highlighter analog with passage selection + passage ranking
    (``uhighlight/UnifiedHighlighter.java:97``, ``FieldHighlighter.java``,
    ``PassageScorer.java:80-139``):

    * passages: ``segmenter="window"`` slices the text into consecutive
      ``window``-word pieces; ``segmenter="sentence"`` splits at sentence
      boundaries (``(?<=[.!?])\\s+`` — the reference uses the locale
      ``BreakIterator.getSentenceInstance``, ``UnifiedHighlighter.java:
      75-77``; this regex covers its terminator behavior for plain
      ASCII-punctuated prose, the documented envelope).  Passage *scoring*
      is the faithful part either way,
    * passage score = (float)(norm(start) · Σ_unique-matching-terms
      tf(freqInPassage, passageLenChars) · weight(contentLenChars,
      freqInDoc)) with PassageScorer's float32 component math:
      ``weight = (k1+1)·(float)ln(1 + (1 + clen/pivot + 0.5)/(tfDoc+0.5))``,
      ``tf = freq/(freq + k1·((1−b) + b·plen/pivot))``,
      ``norm = 1 + 1/(float)ln(pivot + start)``,
    * the best passage per document (score DESC, position ASC) is returned
      with query terms wrapped — top-1 is FieldHighlighter's default
      maxPassages=1,
    * when ``positions`` (a positional postings table carrying
      ``start_offsets``/``end_offsets`` —
      ``IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS``) is given,
      match detection, passage frequencies, and snippet wrapping all come
      from the *indexed* offsets instead of re-deriving matches from raw
      whitespace words: an analyzer-normalized token ("Merge", "İstanbul")
      is found and wrapped at its original surface span, exactly the
      offsets-from-postings mode of ``UnifiedHighlighter`` (OffsetSource
      POSTINGS).  Without it the legacy raw-word-equality path is used.

    Returns (doc_id, passage_idx, pscore float, snippet) per hit doc.  All
    passage/snippet construction is JVM column work; only the float32 score
    kernel is an Arrow UDF (libm log parity with the DuckDB oracle).
    """
    import re as _re

    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    for t in terms:
        if not _re.fullmatch(r"[\w][\w.-]*", t):
            raise ValueError(f"unsupported highlight term: {t!r}")

    k1f = np.float32(k1)
    bf = np.float32(b)
    pivf = np.float32(pivot)
    k1p1 = k1f + np.float32(1.0)
    omb = np.float32(1.0) - bf

    @F.pandas_udf(T.FloatType())
    def pscore(
        clen: pd.Series, plen: pd.Series, start: pd.Series,
        freqs: pd.Series, tfdocs: pd.Series,
    ) -> pd.Series:
        import math

        one = np.float32(1.0)
        out = np.zeros(len(clen), dtype=np.float32)
        for i in range(len(clen)):
            fs = np.asarray(freqs[i], dtype=np.int64)
            tds = np.asarray(tfdocs[i], dtype=np.int64)
            num_docs = one + np.float32(clen[i]) / pivf
            norm_len = k1f * (omb + bf * (np.float32(plen[i]) / pivf))
            acc = 0.0
            for f_, td in zip(fs, tds):
                if f_ == 0:
                    continue
                w = k1p1 * np.float32(
                    math.log(1.0 + (float(num_docs) + 0.5) / (td + 0.5))
                )
                tf_ = np.float32(f_) / (np.float32(f_) + norm_len)
                acc += float(tf_ * w)
            nrm = one + one / np.float32(math.log(float(pivf + np.float32(start[i]))))
            out[i] = np.float32(acc * float(nrm))
        return pd.Series(out, dtype="float32")

    df = hits.select("doc_id").join(source.select("doc_id", text_col), "doc_id")
    df = df.withColumn("_ws", F.split(F.col(text_col), " ")).withColumn(
        "_clen", F.length(text_col)
    )
    if segmenter == "sentence":
        # exact char offsets via a progressive find over the raw text —
        # the split regex consumes \s+ of ANY length, so a running
        # "+1 per separator" accumulator would drift on double spaces or
        # newlines and skew the PassageScorer start-position norm
        @F.pandas_udf(T.ArrayType(T.IntegerType()))
        def sent_starts(texts: pd.Series, sents: pd.Series) -> pd.Series:
            out = []
            for text, ss in zip(texts, sents):
                pos, starts = 0, []
                for sn in ss:
                    i = text.find(sn, pos)
                    starts.append(i)
                    pos = i + len(sn)
                out.append(starts)
            return pd.Series(out)

        df = (
            df.withColumn("_sents", F.split(F.col(text_col), r"(?<=[.!?])\s+"))
            .withColumn("_starts", sent_starts(F.col(text_col), F.col("_sents")))
            .select(
                "*",
                F.posexplode("_sents").alias("passage_idx", "_ptext"),
            )
            .withColumn("_pw", F.split(F.col("_ptext"), " "))
            .withColumn("_start", F.expr("_starts[passage_idx]"))
            .withColumn("_plen", F.length("_ptext"))
        )
    elif segmenter == "window":
        df = (
            df.withColumn(
                "_np",
                F.greatest(F.lit(1), F.ceil(F.size("_ws") / window)).cast("int"),
            )
            .withColumn(
                "passage_idx", F.explode(F.sequence(F.lit(0), F.col("_np") - 1))
            )
            .withColumn("_pw", F.expr(f"slice(_ws, passage_idx*{window}+1, {window})"))
            .withColumn(
                "_start",
                F.when(F.col("passage_idx") == 0, F.lit(0)).otherwise(
                    F.length(F.expr(f"array_join(slice(_ws, 1, passage_idx*{window}), ' ')")) + 1
                ),
            )
            .withColumn("_plen", F.length(F.expr("array_join(_pw, ' ')")))
        )
    else:
        raise ValueError(f"unknown segmenter: {segmenter!r}")
    if positions is not None and "start_offsets" in positions.columns:
        # OffsetSource POSTINGS: per-doc per-term indexed offset arrays
        offs = positions.filter(
            (F.col("field") == field) & F.col("term").isin(list(terms))
        ).select("doc_id", "term", "start_offsets", "end_offsets")
        per_doc = offs.groupBy("doc_id").agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "start_offsets"))
            ).alias("_som"),
            F.map_from_entries(
                F.collect_list(F.struct("term", "end_offsets"))
            ).alias("_eom"),
        )
        df = df.join(per_doc, "doc_id", "left")
        freq_arr = F.array(
            *[
                F.expr(
                    f"size(filter(coalesce(_som['{t}'], array()), "
                    "o -> o >= _start AND o < _start + _plen))"
                )
                for t in terms
            ]
        )
        tfdoc_arr = F.array(
            *[F.expr(f"size(coalesce(_som['{t}'], array()))") for t in terms]
        )

        @F.pandas_udf(T.StringType())
        def off_snippet(
            texts: pd.Series, starts: pd.Series, plens: pd.Series,
            soms: pd.Series, eoms: pd.Series,
        ) -> pd.Series:
            out = []
            for i in range(len(texts)):
                s, e = int(starts[i]), int(starts[i]) + int(plens[i])
                text = texts[i]
                pairs = []
                som = soms[i] or {}
                eom = eoms[i] or {}
                for t, sos in som.items():
                    eos = eom.get(t, [])
                    for so, eo in zip(sos, eos):
                        if s <= so < e:
                            pairs.append((int(so), int(eo)))
                pairs.sort()
                parts, cur = [], s
                for so, eo in pairs:
                    parts.append(text[cur:so])
                    parts.append(pre + text[so:eo] + post)
                    cur = eo
                parts.append(text[cur:e])
                out.append("".join(parts))
            return pd.Series(out)

        snippet = off_snippet(
            F.col(text_col), F.col("_start"), F.col("_plen"),
            F.col("_som"), F.col("_eom"),
        )
    else:
        freq_arr = F.array(
            *[F.expr(f"size(filter(_pw, w -> w = '{t}'))") for t in terms]
        )
        tfdoc_arr = F.array(
            *[F.expr(f"size(filter(_ws, w -> w = '{t}'))") for t in terms]
        )
        in_list = ", ".join(f"'{t}'" for t in terms)
        snippet = F.expr(
            f"array_join(transform(_pw, w -> CASE WHEN w IN ({in_list}) "
            f"THEN '{pre}' || w || '{post}' ELSE w END), ' ')"
        )
    scored = (
        df.withColumn("_freqs", freq_arr)
        .withColumn("_tfdocs", tfdoc_arr)
        .filter(F.aggregate("_freqs", F.lit(0), lambda a, x: a + x) > 0)
        .withColumn(
            "pscore",
            pscore(F.col("_clen"), F.col("_plen"), F.col("_start"),
                   F.col("_freqs"), F.col("_tfdocs")),
        )
        .withColumn("snippet", snippet)
    )
    best = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("pscore"), F.asc("passage_idx"))
    )
    return (
        scored.withColumn("_rn", best)
        .filter(F.col("_rn") <= max_passages)
        .select("doc_id", "passage_idx", "pscore", "snippet")
        .orderBy("doc_id", "passage_idx")
    )


def feature_score(
    scored: DataFrame,
    docmeta: DataFrame,
    feature_expr: str,
    function: str = "saturation",
    weight: float = 1.0,
    pivot: float = 1.0,
) -> DataFrame:
    """FeatureField scoring (``document/FeatureField.java`` /
    ``FeatureQuery``): a static per-document feature (pagerank, recency, …)
    contributes ``w·S/(S+pivot)`` (saturation) or ``w·ln(1+S)`` (log) as a
    SHOULD-style additive term on top of the query score — the standard
    boosted-static-feature setup.  Feature math is double, cast float32,
    added to the query score in double (the Boolean sum contract)."""
    feat = F.expr(feature_expr).cast("double")
    wl = F.lit(float(weight))
    if function == "saturation":
        fs = wl * feat / (feat + F.lit(float(pivot)))
    elif function == "log":
        fs = wl * F.log(F.lit(1.0) + feat)
    else:
        raise ValueError(f"unknown feature function {function!r}")
    return scored.join(docmeta, "doc_id").select(
        "doc_id",
        (F.col("score").cast("double") + fs.cast("float").cast("double"))
        .cast("float")
        .alias("score"),
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


def combined_field_topk(
    idx: IndexTables,
    terms,
    field_weights: dict[str, float],
    k: int = 10,
    boost: float = 1.0,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """CombinedFieldQuery — BM25F (``sandbox/search/CombinedFieldQuery
    .java:250-320``, ``MultiNormsLeafSimScorer.java:127-156``): score the
    query terms as if all fields were one combined field.

    The reference builds ONE pseudo term/collection statistic for the
    whole query (``CombinedFieldWeight`` ctor): docFreq = max df over all
    (field, term) pairs, docCount/maxDoc/sumDocFreq = per-field max,
    sumTotalTermFreq = Σ weight·sttf with Java's ``long += double``
    truncation per field (the pseudo totalTermFreq the reference also
    folds is read by no BM25 input, so it is skipped here).  Per doc:

    * combined freq = Σ weight·freq over matching (field, term) postings
      (``CombinedFieldScorer.freq()``, float accumulation in unspecified
      disjunction order — we sum in double and cast, bit-equal whenever
      each weight·freq is float32-exact and the total < 2²⁴, i.e. any
      integral weights; documented envelope for irrational weights);
    * combined norm = intToByte4(round(Σ weight·byte4ToInt(norm_byte)))
      (``MultiFieldNormValues.advanceExact``, float sum — same exactness
      envelope), decoded back through the length table;
    * score = BM25(combined freq, combined norm) with the pseudo stats.

    Fields absent from a doc contribute nothing to either sum; weights
    must be ≥ 1 (``Builder.addField``).  Returns (doc_id, score, rank).
    """
    import math

    if any(w < 1 for w in field_weights.values()):
        raise ValueError("field weight must be >= 1 (CombinedFieldQuery.Builder)")
    fields = sorted(field_weights)  # TreeMap iteration order
    terms_sorted = sorted(set(terms))
    if len(fields) * len(terms_sorted) > 1024:
        raise ValueError("CombinedFieldQuery expands to > 1024 field-terms")

    fs = {
        r["field"]: (int(r["doc_count"]), int(r["sum_total_term_freq"]))
        for r in idx.fieldstats.filter(F.col("field").isin(fields)).collect()
    }
    ts = {
        (r["field"], r["term"]): (int(r["doc_freq"]), int(r["total_term_freq"]))
        for r in idx.termstats.filter(
            F.col("field").isin(fields) & F.col("term").isin(terms_sorted)
        ).collect()
    }
    # pseudo term statistics: docFreq = max over the (field × term) pairs
    # (the reference also folds a weighted totalTermFreq for similarities
    # that read it — BM25 never does, so it is not computed here)
    doc_freq = 0
    for f in fields:
        for t in terms_sorted:
            st = ts.get((f, t))
            if st and st[0] > 0:
                doc_freq = max(doc_freq, st[0])
    spark = idx.postings.sparkSession
    if doc_freq == 0:
        return spark.createDataFrame([], "doc_id long, score float, rank int")
    # pseudo collection statistics: per-field max + weighted sttf sum
    doc_count, sttf_p = 0, 0
    for f in fields:
        if f in fs:
            doc_count = max(doc_count, fs[f][0])
            sttf_p = int(sttf_p + float(field_weights[f]) * fs[f][1])
    avgdl_p = float(np.float32(sttf_p / float(doc_count)))
    idf = float(
        np.float32(
            math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
        )
    )
    wgt = float(np.float32(boost) * np.float32(idf))
    k1f, bf = float(np.float32(k1)), float(np.float32(b))

    wmap = F.create_map(
        *[
            c
            for f in fields
            for c in (F.lit(f), F.lit(float(np.float32(field_weights[f]))))
        ]
    )
    from lucene_spark.analysis.smallfloat import LENGTH_TABLE
    from lucene_spark.index.builder import norm_byte_sql

    ltab = F.array(*[F.lit(int(v)) for v in LENGTH_TABLE])

    # combined freq over the query pairs' postings (partition-pruned scan)
    pf = idx.postings.filter(
        F.col("field").isin(fields) & F.col("term").isin(terms_sorted)
    )
    cfreq = (
        pf.groupBy("doc_id")
        .agg(
            F.sum(
                (wmap[F.col("field")] * F.col("freq").cast("float")).cast("double")
            ).alias("_f")
        )
        .select("doc_id", F.col("_f").cast("float").alias("cfreq"))
    )
    # combined norm: weighted decoded lengths, rounded, re-quantized
    dl = idx.doclens.filter(F.col("field").isin(fields)).join(
        cfreq.select("doc_id"), "doc_id", "left_semi"
    )
    nv = (
        dl.withColumn(
            "_qlen",
            F.element_at(ltab, (F.col("norm_byte").cast("int") + 1)).cast("float"),
        )
        .groupBy("doc_id")
        .agg(F.sum((wmap[F.col("field")] * F.col("_qlen")).cast("double")).alias("_nv"))
        # Math.round(float) = (int) floor(v + 0.5f)
        .withColumn(
            "_rnd",
            F.floor(
                (F.col("_nv").cast("float") + F.lit(0.5).cast("float")).cast("float")
            ).cast("long"),
        )
        .withColumn("_nb", norm_byte_sql("_rnd"))
        .select(
            "doc_id",
            F.element_at(ltab, (F.col("_nb").cast("int") + 1))
            .cast("float")
            .alias("qlenc"),
        )
    )
    one = F.lit(1.0).cast("float")
    inv = (
        one
        / (
            F.lit(k1f).cast("float")
            * (
                (one - F.lit(bf).cast("float"))
                + (
                    (F.col("qlenc") * F.lit(bf).cast("float"))
                    / F.lit(avgdl_p).cast("float")
                ).cast("float")
            )
        )
    ).cast("float")
    scored = (
        cfreq.join(nv, "doc_id")
        .withColumn("inv", inv)
        .select(
            "doc_id",
            (
                F.lit(wgt).cast("float")
                - (
                    F.lit(wgt).cast("float")
                    / (one + F.col("cfreq") * F.col("inv"))
                ).cast("float")
            )
            .cast("float")
            .alias("score"),
        )
    )
    if idx.deletes is not None:
        scored = scored.join(idx.deletes, "doc_id", "left_anti")
    from pyspark.sql import Window

    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id"))) - 1
    return topk.withColumn("rank", w.cast("int"))


def _key_ended(key: str, last_token: str) -> bool:
    """The suggesters' shared "did the last token end?" test — the
    reference compares the stream's final end offset with the last
    token's end offset (``FreeTextSuggester.java:591-593``,
    ``AnalyzingInfixSuggester.java:671-673``): ANY trailing consumed
    characters (whitespace, punctuation, a dropped trailing stopword)
    mean the last token is complete and should be treated exactly /
    shifted to next-word context, not completed as a prefix.  Our
    analyzer API returns tokens without offsets, so the test is whether
    the case-folded key still ends with the last token's text — exact
    for any normalization that keeps token text a suffix of its source
    span (documented envelope for exotic filters)."""
    from lucene_spark.analysis.analyzer import java_lower

    return not java_lower(key).endswith(last_token)


class FreeTextSuggester:
    """N-gram language-model suggester with stupid backoff
    (``suggest/.../analyzing/FreeTextSuggester.java:120-720``): "what word
    comes next" / "complete this word given context".

    **Model** (:274-327): shingles of orders 1..``grams`` over the
    analyzed corpus stream, joined by the 0x1e separator; each ngram's
    weight is its corpus occurrence count, ``tot_tokens`` = Σ unigram
    counts (:319-320).  The build is one distributed shingle-explode +
    groupBy — corpus-sized, the part that must scale; lookups are
    interactive queries over the (dictionary-sized, partition-prunable)
    model table.

    **Lookup** (:545-712): per gram order high→low, the query's trailing
    (order)-gram prefix selects same-order completions (the FST search
    blocks separator arcs, so completions never cross into another token,
    :625-631); each NEW last-token fragment scores
    ``(long)(2⁶³ · backoff · count / contextCount)`` (:691-698) with
    backoff ×0.4 per level (:703) and contextCount = the context ngram's
    count (unigram level: tot_tokens, :578); results sort (value DESC,
    key ASC) and truncate (:706-717).  A trailing-space query shifts
    every context up one order to predict the NEXT word (:591-601).

    Envelope (documented): requires a hole-free analyzer (the reference's
    default StandardAnalyzer has no stop set; position-increment holes
    from stop filtering are not modelled); ``(long)`` saturation at
    Long.MAX_VALUE is mirrored with a ``min``; FST top-N ties resolve by
    ngram bytes ASC, reproduced as (count DESC, ngram ASC).
    """

    SEPARATOR = "\x1e"
    ALPHA = 0.4
    _MAX_LONG_D = float(2**63)  # (double) Long.MAX_VALUE rounds to 2^63

    def __init__(self, docs_df: DataFrame, analyzer=None, grams: int = 2,
                 text_col: str = "text"):
        from lucene_spark.analysis.analyzer import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        self.grams = int(grams)
        if self.grams < 1:
            raise ValueError("grams must be >= 1")
        an, g, sep = self.analyzer, self.grams, self.SEPARATOR

        @F.pandas_udf("array<string>")
        def shingles(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                toks = an.analyze(t) if isinstance(t, str) else []
                if any(sep in tok for tok in toks):
                    raise ValueError("tokens must not contain the separator byte")
                row = []
                for order in range(1, g + 1):
                    for i in range(len(toks) - order + 1):
                        row.append(sep.join(toks[i : i + order]))
                out.append(row)
            return pd.Series(out)

        self.model = (
            docs_df.select(F.explode(shingles(F.col(text_col))).alias("ngram"))
            .groupBy("ngram")
            .agg(F.count("*").cast("long").alias("cnt"))
            .withColumn("order", F.size(F.split(F.col("ngram"), sep)).cast("int"))
        ).persist()
        self.tot_tokens = int(
            self.model.filter(F.col("order") == 1)
            .agg(F.sum("cnt"))
            .collect()[0][0]
            or 0
        )

    def close(self) -> None:
        self.model.unpersist()

    def lookup(self, key: str, num: int = 5) -> list[tuple[str, int]]:
        """Top ``num`` (ngram key, value) suggestions, the reference's
        ``LookupResult`` list (keys contain the 0x1e separator)."""
        sep, g = self.SEPARATOR, self.grams
        qtoks = self.analyzer.analyze(key)
        if not qtoks:
            raise ValueError("no tokens produced by analyzer")
        ended = _key_ended(key, qtoks[-1])
        last: list[str | None] = [None] * g
        for order in range(1, g + 1):
            if len(qtoks) >= order:
                last[order - 1] = sep.join(qtoks[-order:])
        if ended:
            for i in range(g - 1, 0, -1):
                if last[i - 1] is not None:
                    last[i] = last[i - 1] + sep
            last[0] = ""

        seen: set[str] = set()
        results: list[tuple[str, int]] = []
        backoff = 1.0
        for gram in range(g - 1, -1, -1):
            token = last[gram]
            if token is None or (token == "" and len(key) > 0):
                continue
            cand_q = (
                self.model.filter(
                    (F.col("order") == gram + 1)
                    & F.col("ngram").startswith(token)
                )
                .orderBy(F.desc("cnt"), F.asc("ngram"))
                .limit(num + len(seen))
                .select("ngram", "cnt")
            )
            # the context row rides the same job (its order is `gram`,
            # never in the candidate set) — one collect per level
            context = token[: token.rindex(sep)] if sep in token else None
            if context is not None:
                cand_q = cand_q.unionByName(
                    self.model.filter(F.col("ngram") == context).select(
                        "ngram", "cnt"
                    )
                )
            rows = cand_q.collect()
            cand = sorted(
                (r for r in rows if r["ngram"] != context),
                key=lambda r: (-int(r["cnt"]), r["ngram"]),
            )
            if cand:
                if context is not None:
                    context_count = next(
                        (int(r["cnt"]) for r in rows if r["ngram"] == context),
                        0,
                    )
                else:
                    context_count = self.tot_tokens
                emitted = 0
                for r in cand:
                    if emitted >= num:
                        break
                    ngram = r["ngram"]
                    fragment = ngram.rsplit(sep, 1)[-1]
                    if fragment in seen:
                        continue
                    seen.add(fragment)
                    emitted += 1
                    # (long)(MAX · backoff · count / contextCount), left-
                    # associative double chain, truncating long cast with
                    # Java's saturation at Long.MAX_VALUE
                    v = self._MAX_LONG_D * backoff * float(int(r["cnt"])) / float(
                        context_count
                    )
                    results.append((ngram, min(int(v), 2**63 - 1)))
            backoff *= self.ALPHA
        results.sort(key=lambda kv: (-kv[1], kv[0]))
        return results[:num]

    def lookup_df(self, key: str, num: int = 5) -> DataFrame:
        """``lookup`` as a (term, value) DataFrame for gate frames."""
        spark = self.model.sparkSession
        return spark.createDataFrame(
            self.lookup(key, num) or [], "term string, value long"
        )


class AnalyzingInfixSuggester:
    """Infix ("search-box") suggester (``suggest/.../analyzing/
    AnalyzingInfixSuggester.java:620-720``): suggestions match query
    tokens ANYWHERE in the analyzed entry text, not only at the start.

    Lookup builds the reference's Boolean shape: every query token but
    the last is an exact TermQuery, the last is a PrefixQuery unless the
    key ends past the token (trailing whitespace ⇒ exact, :670-683);
    ``all_terms_required`` picks MUST vs SHOULD occur (:639-644).
    Results sort by the index sort (weight DESC, :166); the reference
    breaks weight ties by docID (insertion order) — here surface ASC,
    the deterministic analog (documented envelope).

    The entries table is dictionary-sized; lookups are a token semi-join
    per clause over its exploded (token, surface) projection — at scale
    both sides partition-prune by token.
    """

    def __init__(self, entries: DataFrame, analyzer=None,
                 surface_col: str = "surface", weight_col: str = "weight"):
        from lucene_spark.analysis.analyzer import StandardAnalyzer
        from lucene_spark.index.builder import make_analyze_udf

        self.analyzer = analyzer or StandardAnalyzer()
        analyze = make_analyze_udf(self.analyzer)
        self.entries = entries.select(
            F.col(surface_col).alias("surface"),
            F.col(weight_col).cast("long").alias("weight"),
            analyze(F.col(surface_col)).alias("toks"),
        )
        self.tokens = self.entries.select(
            "surface", F.explode("toks").alias("token")
        ).distinct()

    def lookup(self, key: str, num: int = 5,
               all_terms_required: bool = True) -> DataFrame:
        """(surface, weight) suggestions, best first."""
        qtoks = self.analyzer.analyze(key)
        if not qtoks:
            return self.entries.sparkSession.createDataFrame(
                [], "surface string, weight long"
            )
        # the last token is a prefix iff the key ends AT the token
        # (:671-673: maxEndOffset == end offset); ANY trailing consumed
        # text (whitespace, punctuation, a dropped stopword) -> exact
        last_is_prefix = not _key_ended(key, qtoks[-1])
        exact, last = qtoks[:-1], qtoks[-1]
        if not last_is_prefix:
            exact, last = qtoks, None

        clauses = [self.tokens.filter(F.col("token") == t) for t in set(exact)]
        if last is not None:
            clauses.append(self.tokens.filter(F.col("token").startswith(last)))
        base = self.entries.select("surface", "weight")
        if all_terms_required:
            for c in clauses:
                base = base.join(c.select("surface").distinct(), "surface", "left_semi")
            matched = base
        else:
            from functools import reduce as _reduce

            any_hit = _reduce(
                lambda a, b: a.unionByName(b),
                [c.select("surface") for c in clauses],
            ).distinct()
            matched = base.join(any_hit, "surface", "left_semi")
        return matched.orderBy(F.desc("weight"), F.asc("surface")).limit(num)


class BlendedInfixSuggester(AnalyzingInfixSuggester):
    """Position-blended infix suggester (``suggest/.../analyzing/
    BlendedInfixSuggester.java:196-281,309-379``): infix matching, but
    the weight is discounted by WHERE the first matched token sits.

    Lookup fetches the top ``num × num_factor`` candidates by raw weight
    (:198-199), then re-scores each: coefficient = 1 when the surface
    literally starts with the raw key, else from the minimum first
    position p of any matched token — ``linear`` 1 − 0.10·p (negative
    past p=10, kept), ``reciprocal`` 1/(p+1), ``exponential_reciprocal``
    1/(p+1)^exponent (:356-377); weight 0 becomes 1 and |weight| < 10 is
    scaled ×10 first (:265-270); score = (long)(weight · coefficient)
    (:271).  The bounded result set keeps the top ``num`` by the
    reference's (value, key) tree order — emitted (score DESC, surface
    DESC) (:224-281, descendingSet).  Ties in the candidate pool resolve
    surface ASC (the reference uses insertion order; documented
    envelope).  Re-scoring runs driver-side over the ≤ num×num_factor
    collected pool — bounded by construction; the candidate search and
    the position lookup stay distributed."""

    LINEAR_COEF = 0.10
    DEFAULT_NUM_FACTOR = 10

    def __init__(self, entries: DataFrame, analyzer=None,
                 surface_col: str = "surface", weight_col: str = "weight",
                 blender_type: str = "linear", num_factor: int = 10,
                 exponent: float = 2.0):
        super().__init__(entries, analyzer, surface_col, weight_col)
        if blender_type not in ("linear", "reciprocal", "exponential_reciprocal"):
            raise ValueError(f"unknown blender type {blender_type!r}")
        self.blender_type = blender_type
        self.num_factor = int(num_factor)
        self.exponent = float(exponent)
        # first position of each token within its entry (term vectors'
        # nextPosition: a term's first position is its minimum)
        self.token_pos = (
            self.entries.select(
                "surface", F.posexplode("toks").alias("pos", "token")
            )
            .groupBy("surface", "token")
            .agg(F.min("pos").alias("pos"))
        )

    def _coefficient(self, position: int) -> float:
        if self.blender_type == "linear":
            return 1.0 - self.LINEAR_COEF * position
        if self.blender_type == "reciprocal":
            return 1.0 / (position + 1)
        return 1.0 / float(position + 1.0) ** self.exponent

    def lookup(self, key: str, num: int = 5,
               all_terms_required: bool = True) -> DataFrame:
        spark = self.entries.sparkSession
        qtoks = self.analyzer.analyze(key)
        if not qtoks:
            return spark.createDataFrame([], "surface string, weight long")
        pool = super().lookup(key, num * self.num_factor, all_terms_required)
        last_is_prefix = not _key_ended(key, qtoks[-1])
        exact = set(qtoks[:-1]) if last_is_prefix else set(qtoks)
        prefix = qtoks[-1] if last_is_prefix else None
        cond = F.col("token").isin(list(exact)) if exact else F.lit(False)
        if prefix is not None:
            cond = cond | F.col("token").startswith(prefix)
        pos = (
            self.token_pos.filter(cond)
            .groupBy("surface")
            .agg(F.min("pos").alias("minpos"))
        )
        rows = pool.join(pos, "surface", "left").collect()
        out = []
        for r in rows:
            w = int(r["weight"])
            if r["surface"].startswith(key):
                coef = 1.0
            else:
                p = int(r["minpos"]) if r["minpos"] is not None else 2**31 - 1
                coef = self._coefficient(p)
            if w == 0:
                w = 1
            if -10 < w < 10:
                w = int(w * (1.0 / self.LINEAR_COEF))
            out.append((r["surface"], int(w * coef)))
        # the reference's bounded TreeSet keeps the top num by (value,
        # key), DEDUPING identical (value, key) results (comparator 0 ⇒
        # not added), and emits the descending view -> (score DESC,
        # surface DESC)
        out = list(set(out))
        out.sort(key=lambda kv: (kv[1], kv[0]), reverse=True)
        return spark.createDataFrame(
            out[:num] or [], "surface string, weight long"
        )


class FuzzySuggester(AnalyzingSuggester):
    """Typo-tolerant completion (``suggest/.../analyzing/FuzzySuggester
    .java:50-91,124``): like :class:`AnalyzingSuggester` but the typed
    prefix may sit within OSA edit distance ``MAX_EDITS`` of a stored
    key's prefix — with the reference's guardrails: the first
    ``NON_FUZZY_PREFIX`` byte is never edited (the automaton prepends it
    exactly), and keys shorter than ``MIN_FUZZY_LENGTH`` get no edits at
    all.  Completions rank (weight DESC, surface ASC) exactly as the
    exact suggester (the fuzzy automaton only widens the MATCH set,
    TopNSearcher ranking is unchanged)."""

    MAX_EDITS = 1
    NON_FUZZY_PREFIX = 1
    MIN_FUZZY_LENGTH = 3

    def lookup(self, prefix: str, k: int = 5) -> DataFrame:
        key = " ".join(self.analyzer.analyze(prefix))
        if len(key) < self.MIN_FUZZY_LENGTH:
            return super().lookup(prefix, k)
        from lucene_spark.search.searcher import _osa_distance

        nfp, me = self.NON_FUZZY_PREFIX, self.MAX_EDITS
        qsuf = key[nfp:]
        qlen = len(key)

        @F.pandas_udf("boolean")
        def fuzzy_prefix(keys: pd.Series) -> pd.Series:
            out = []
            for s in keys:
                ok = False
                if s[:nfp] == key[:nfp]:
                    hi = min(len(s), qlen + me)
                    for m in range(max(nfp, qlen - me), hi + 1):
                        if _osa_distance(s[nfp:m], qsuf) <= me:
                            ok = True
                            break
                out.append(ok)
            return pd.Series(out)

        # cheap JVM prune before the Arrow batch: exact first byte +
        # length floor (an entry shorter than qlen - maxEdits cannot
        # contain a qualifying prefix)
        pruned = self.entries.filter(
            F.col("key").startswith(key[:nfp])
            & (F.length("key") >= qlen - me)
        )
        return (
            pruned.filter(fuzzy_prefix(F.col("key")))
            .select("surface", "weight")
            .orderBy(F.desc("weight"), F.asc("surface"))
            .limit(k)
        )


def common_terms_query(
    idx: IndexTables,
    terms,
    field: str = "text",
    high_freq_occur: Occur = Occur.SHOULD,
    low_freq_occur: Occur = Occur.SHOULD,
    max_term_frequency: float = 0.01,
    low_freq_boost: float = 1.0,
    high_freq_boost: float = 1.0,
    low_freq_min_should_match: float = 0.0,
    high_freq_min_should_match: float = 0.0,
):
    """CommonTermsQuery (``queries/CommonTermsQuery.java:95-171``): split
    the query terms into LOW- and HIGH-frequency groups by document
    frequency and compose them so common ("stopword-ish") terms boost
    scores without gating recall — low-freq group as a MUST clause,
    high-freq group as a SHOULD clause (each an inner Boolean with its
    own occur/minimumShouldMatch, boost-wrapped).

    Classification (:100-107): a term is HIGH-frequency when
    ``maxTermFrequency ≥ 1 and df > maxTermFrequency`` (absolute) OR
    ``df > (int) ceil(maxTermFrequency · (float) maxDoc)`` (relative —
    the float32 product mirrored); terms absent from the dictionary are
    low-frequency.  Fractional minimumShouldMatch resolves as
    ``round(f · numOptional)`` (:85-90).  With no low-frequency terms
    the high group upgrades to a conjunction (:142-150).  This performs
    the reference's search-time ``rewrite(IndexSearcher)`` eagerly — it
    needs the terms dictionary, a bounded |terms| lookup."""
    import math as _math

    from lucene_spark.search.query import (
        MatchNoDocsQuery,
        BoostQuery,
    )

    if high_freq_occur == Occur.MUST_NOT or low_freq_occur == Occur.MUST_NOT:
        raise ValueError("occur should be MUST or SHOULD but was MUST_NOT")
    terms = list(terms)
    if not terms:
        return MatchNoDocsQuery()
    if len(terms) == 1:
        return TermQuery(terms[0], field)
    max_doc = idx.docmap.count()
    dfs = {
        r["term"]: int(r["doc_freq"])
        for r in idx.termstats.filter(
            (F.col("field") == field) & F.col("term").isin(terms)
        ).collect()
    }
    rel_cutoff = int(
        _math.ceil(float(np.float32(max_term_frequency) * np.float32(max_doc)))
    )
    low, high = [], []
    for t in terms:
        df = dfs.get(t)
        if df is None:
            low.append(t)
        elif (
            max_term_frequency >= 1.0
            # Java compares docFreq > maxTermFrequency as float32 (the
            # int promotes), so a df beyond float precision must round
            # the same way
            and np.float32(df) > np.float32(max_term_frequency)
        ) or (df > rel_cutoff):
            high.append(t)
        else:
            low.append(t)

    def msm(frac: float, n: int) -> int:
        if frac >= 1.0 or frac == 0.0:
            return int(frac)
        # Math.round(float), modern JDK semantics: the exact closest int
        # of the float32 PRODUCT, ties toward +inf — widen the product to
        # double BEFORE adding 0.5 (a float32 add would round
        # 0.49999997f + 0.5f up to 1.0f, the pre-JDK-7 bug)
        return int(_math.floor(float(np.float32(frac) * np.float32(n)) + 0.5))

    low_msm = msm(low_freq_min_should_match, len(low)) if (
        low_freq_occur == Occur.SHOULD and low
    ) else 0
    high_msm = msm(high_freq_min_should_match, len(high)) if (
        high_freq_occur == Occur.SHOULD and high
    ) else 0
    if not low and high_msm == 0 and high_freq_occur != Occur.MUST:
        high_freq_occur = Occur.MUST
    clauses = []
    if low:
        low_q = BooleanQuery(
            tuple(
                BooleanClause(low_freq_occur, TermQuery(t, field)) for t in low
            ),
            low_msm,
        )
        clauses.append(
            BooleanClause(Occur.MUST, BoostQuery(low_q, float(low_freq_boost)))
        )
    if high:
        high_q = BooleanQuery(
            tuple(
                BooleanClause(high_freq_occur, TermQuery(t, field))
                for t in high
            ),
            high_msm,
        )
        clauses.append(
            BooleanClause(
                Occur.SHOULD, BoostQuery(high_q, float(high_freq_boost))
            )
        )
    return BooleanQuery(tuple(clauses))
