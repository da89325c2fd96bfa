"""Index build: docID assignment, doc lengths/norms, postings, stats tables.

Spark-first re-expression of the reference's indexing chain
(``index/IndexingChain.java:553`` document inversion, ``index/NormValuesWriter.java``
norms, ``index/FreqProxTermsWriter.java:83-135`` postings flush,
``search/similarities/Similarity.java:152-162`` norm quantization):

* one range partition of the ``(conv_id, turn_idx)``-sorted source acts as a
  *segment* (Lucene: one DWPT flush); docIDs are global dense ranks under the
  stable key ordering (``index/DocIDMerger.java`` concatenation order), so
  per-segment docID ranges are contiguous and disjoint,
* analysis is a vectorized Arrow UDF (no per-row Python),
* posting aggregation is a ``groupBy(term, doc)`` count followed by per-term
  stats — both have map-side partial aggregation, so hot terms ("the") do not
  skew: each task emits at most one partial row per key.  (The skew-sensitive
  step — materializing a hot term's full posting *list* — is handled in the
  block codec layer, which builds per-segment lists only.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.analysis.analyzer import StandardAnalyzer


DEFAULT_FIELD = "text"


def delete_by_ids(idx: "IndexTables", doc_ids: DataFrame) -> "IndexTables":
    """Buffered deletes (IndexWriter.deleteDocuments analog): docs stay in
    the postings until the next merge/compaction; queries anti-join the
    delete set at collect time (the live-docs bitset,
    ``index/PendingDeletes.java`` / ``Lucene90LiveDocsFormat``).

    NOTE: like Lucene, deletes do NOT update global stats until compaction
    — docFreq/avgdl still count deleted docs (documented Lucene behavior).
    """
    from dataclasses import replace

    dels = doc_ids.select(F.col(doc_ids.columns[0]).cast("long").alias("doc_id"))
    if idx.deletes is not None:
        dels = idx.deletes.unionByName(dels).distinct()
    return replace(idx, deletes=dels)


def delete_by_term(idx: "IndexTables", term: str, field: str = DEFAULT_FIELD) -> "IndexTables":
    """IndexWriter.deleteDocuments(Term): mark every doc containing term."""
    hits = idx.postings.filter(
        (F.col("field") == field) & (F.col("term") == term)
    ).select("doc_id")
    return delete_by_ids(idx, hits)


@dataclass
class IndexTables:
    """The queryable index: five DataFrames (FIXTURES.md §5 schemas) plus the
    optional compressed block-postings table (``index/blocks.py``)."""

    docmap: DataFrame  # doc_id, segment, conv_id, turn_idx (+ passthrough cols)
    doclens: DataFrame  # doc_id, field, len, norm_byte
    postings: DataFrame  # field, term, doc_id, freq   (flat postings)
    termstats: DataFrame  # field, term, doc_freq, total_term_freq
    fieldstats: DataFrame  # field, doc_count, sum_total_term_freq, sum_doc_freq
    blocks: DataFrame | None = None  # FOR/VByte 128-doc blocks + impacts
    # field, term, doc_id, segment, positions, norm_byte
    # [, start_offsets, end_offsets] [, payloads] — FIXTURES.md §5
    positions: DataFrame | None = None
    inverted: DataFrame | None = None  # internal: cached analysis output
    deletes: DataFrame | None = None  # doc_id — buffered deletes (live-docs filter)
    term_buckets: int | None = None  # on-disk layout: blocks bucketed by hash(term)%B
    disk_backed: bool = False  # True when read via segments.read_index
    vectors: DataFrame | None = None  # doc_id, <vector col> — per-doc KNN vectors

    def _term_pruned(self, df: DataFrame, field: str, terms) -> DataFrame:
        """Shared terms-dictionary pruning: term filter + (on the bucketed
        on-disk layout) the tbucket PARTITION filter, so a query scan reads
        O(query terms) buckets instead of every file.  The bucket hash here
        MUST stay in lockstep with the layout writer's ``term_bucket_col``
        — this is the single place that computes query-side buckets."""
        out = df.filter((F.col("field") == field) & F.col("term").isin(list(terms)))
        if self.term_buckets and "tbucket" in df.columns:
            from lucene_spark.index.blocks import term_bucket_py

            buckets = sorted({term_bucket_py(t, self.term_buckets) for t in terms})
            out = out.filter(F.col("tbucket").isin(buckets))
        return out

    def blocks_for_terms(self, field: str, terms) -> DataFrame | None:
        """The query terms' blocks only (bucket-pruned — the
        terms-dictionary lookup, Catalyst-partition-pruning edition; the
        fix for 'a query reads every segment's every file')."""
        if self.blocks is None:
            return None
        return self._term_pruned(self.blocks, field, terms)

    def positions_for_terms(self, field: str, terms) -> DataFrame:
        """The query terms' positional postings only — the same pruning as
        :meth:`blocks_for_terms` over ``positions/segment=*/tbucket=*``."""
        if self.positions is None:
            raise ValueError("positional queries need a positional index")
        return self._term_pruned(self.positions, field, terms)

    def postings_for_terms(self, field: str, terms) -> DataFrame:
        """Flat postings restricted to ``terms``.  Disk-backed indexes decode
        only the matching (bucket-pruned) blocks instead of the whole
        postings set; in-memory indexes return the cached flat table."""
        if not self.disk_backed or self.blocks is None:
            return self.postings
        from lucene_spark.index.segments import decode_blocks_to_postings

        return decode_blocks_to_postings(self.blocks_for_terms(field, terms))

    def _tables(self):
        out = [self.docmap, self.doclens, self.postings, self.termstats, self.fieldstats]
        for extra in (self.blocks, self.positions, self.inverted):
            if extra is not None:
                out.append(extra)
        return out

    def persist(self) -> "IndexTables":
        for df in self._tables():
            df.persist()
        return self

    def unpersist(self) -> None:
        for df in self._tables():
            df.unpersist()


def assign_doc_ids(
    df: DataFrame, key_cols: Sequence[str], num_segments: int | None = None
) -> DataFrame:
    """Global dense docIDs = rank under stable ``key_cols`` order, plus segment.

    Scalable two-pass scheme (no single-partition window):
      1. range-partition + sort by the keys (each partition = one segment,
         holding a contiguous key range),
      2. count rows per partition (tiny driver-side list),
      3. assign ``doc_id = segment_offset + local_row_number`` in a streaming
         ``mapInPandas`` — no shuffle, no collect of data rows.

    The partitioned frame is persisted so both passes observe identical range
    boundaries (on a real cluster: write the sorted frame to storage first —
    the checkpointed segment build in ``segments.py`` does exactly that).
    DocIDs themselves are boundary-independent: any contiguous range
    partitioning of a unique key yields the same global rank.
    """
    keys = [F.col(c) for c in key_cols]
    parts = num_segments or max(2, df.sparkSession.sparkContext.defaultParallelism)
    sorted_df = (
        df.repartitionByRange(parts, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_segment", F.spark_partition_id())
    )
    sorted_df = sorted_df.persist()
    counts = {r["_segment"]: r["n"] for r in sorted_df.groupBy("_segment").agg(F.count("*").alias("n")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(parts):
        offsets[pid] = acc
        acc += counts.get(pid, 0)

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [f for f in sorted_df.schema.fields if f.name != "_segment"]
        + [T.StructField("segment", T.IntegerType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if pdf.empty:
                continue
            seg = int(pdf["_segment"].iloc[0])
            base = offsets[seg] + local
            n = len(pdf)
            out = pdf.drop(columns=["_segment"])
            out.insert(0, "doc_id", np.arange(base, base + n, dtype=np.int64))
            out["segment"] = np.int32(seg)
            local += n
            yield out

    return sorted_df.mapInPandas(assign, schema=out_schema)


def norm_byte_sql(len_expr: str):
    """``SmallFloat.intToByte4`` as a PURE JVM column expression
    (``SmallFloat.java:130-147``): for i >= 24, code = 24 + long_to_int4
    (i - 24) with the 5-bit-exponent/3-bit-mantissa packing.

    This stays inside whole-stage codegen — the earlier pandas-UDF version
    forced an ArrowEvalPython stage into the postings pipeline AFTER the
    explode (one Python round-trip per posting row, ~12x the doc count),
    which alone cut the sf0.1 build throughput several-fold.  Integer math
    only; bit-parity with ``int_to_byte4_np`` is test-asserted over a wide
    range."""
    x = f"(CAST({len_expr} AS BIGINT) - 24)"
    nb = f"length(bin({x}))"  # bit_length(x) for x >= 1
    return F.expr(
        f"CAST(CASE WHEN ({len_expr}) < 24 THEN ({len_expr}) "
        f"WHEN {x} < 8 THEN 24 + {x} "
        f"ELSE 24 + (shiftright({x}, {nb} - 4) & 7) + shiftleft({nb} - 3, 3) "
        f"END AS SMALLINT)"
    )





def make_analyze_udf(analyzer: StandardAnalyzer):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def analyze(texts: pd.Series) -> pd.Series:
        return analyzer.analyze_series(texts)

    return analyze


INVERT_SCHEMA = T.StructType(
    [
        T.StructField("len", T.IntegerType(), False),
        T.StructField(
            "tf",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType(), False),
                        T.StructField("freq", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def make_invert_udf(analyzer: StandardAnalyzer):
    """Per-document inversion INSIDE the UDF: text → (len, [(term, freq)]).

    This is the reference's in-memory document inversion
    (``index/IndexingChain.java:553`` + ``TermsHashPerField.add``): term
    frequencies are counted per document at analysis time, so the postings
    stage needs NO (term, doc) shuffle — the per-doc Counter is a perfect
    map-side combine.  At 10^12 turns this removes the single largest
    shuffle of the build (raw token explosion ≈ 30× the row count)."""
    from collections import Counter

    @F.pandas_udf(INVERT_SCHEMA)
    def invert(texts: pd.Series) -> pd.DataFrame:
        lens: list[int] = []
        tfs: list[list[dict]] = []
        analyze = analyzer.analyze
        for t in texts:
            toks = analyze(t) if isinstance(t, str) else []
            c = Counter(toks)
            lens.append(len(toks))
            tfs.append([{"term": k, "freq": v} for k, v in c.items()])
        return pd.DataFrame({"len": lens, "tf": tfs})

    return invert


def make_analyze_pos_udf(analyzer: StandardAnalyzer):
    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("pos", T.IntegerType(), False),
            ]
        )
    )

    @F.pandas_udf(schema)
    def analyze_pos(texts: pd.Series) -> pd.Series:
        return analyzer.analyze_with_positions_series(texts)

    return analyze_pos


def make_analyze_off_udf(analyzer: StandardAnalyzer):
    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("pos", T.IntegerType(), False),
                T.StructField("so", T.IntegerType(), False),
                T.StructField("eo", T.IntegerType(), False),
            ]
        )
    )

    @F.pandas_udf(schema)
    def analyze_off(texts: pd.Series) -> pd.Series:
        return analyzer.analyze_with_offsets_series(texts)

    return analyze_off


def make_analyze_pay_udf(analyzer: StandardAnalyzer):
    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("pos", T.IntegerType(), False),
                T.StructField("so", T.IntegerType(), False),
                T.StructField("eo", T.IntegerType(), False),
                T.StructField("pay", T.FloatType(), False),
            ]
        )
    )

    @F.pandas_udf(schema)
    def analyze_pay(texts: pd.Series) -> pd.Series:
        return analyzer.analyze_with_payloads_series(texts)

    return analyze_pay


def build_positions(
    docmap: DataFrame,
    text_col: str,
    field: str,
    analyzer: StandardAnalyzer,
    with_offsets: bool = True,
) -> DataFrame:
    """Positional postings (field, term, doc_id, segment, positions int[],
    norm_byte [, start_offsets int[], end_offsets int[]]).

    Positions carry Lucene increment semantics (stop/overlong holes).  The
    per-(term, doc) position list is bounded by term freq in one document —
    ``collect_list`` here never sees corpus-scale groups.

    ``with_offsets`` adds character-offset arrays aligned with ``positions``
    (``IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS``,
    ``index/PostingsEnum.java:51-58``) so consumers like the unified
    highlighter read indexed offsets instead of re-deriving them from raw
    text.  Whole-stream filters (shingles) have no single-token offsets —
    the offset columns are skipped for such analyzers.

    The doc's norm byte is embedded per row (doc length = number of emitted
    (term, pos) pairs — one per surviving token, identical to the inversion
    UDF's count), so phrase scoring never joins the corpus-sized doclens
    table.

    When the analyzer carries a ``payload_fn``, a ``payloads float[]``
    column aligned with ``positions`` rides along — the .pay section of
    the reference's postings files (``Lucene103PostingsFormat.java:43-120``,
    ``FieldInfo.storePayloads``), float32-decoded per the PayloadDecoder
    convention.  Consumers: :func:`lucene_spark.search.payloads.
    payload_score_topk` and :class:`lucene_spark.search.intervals.
    IPayloadFilteredTerm`.
    """
    if with_offsets and analyzer.stream_filters:
        with_offsets = False
    if analyzer.payload_fn is not None and analyzer.stream_filters:
        # fail fast on the driver — otherwise analyze_with_payloads raises
        # this same error inside an executor UDF mid-build
        raise ValueError("payloads are not supported with whole-stream filters")
    if analyzer.payload_fn is not None:
        analyze_pay = make_analyze_pay_udf(analyzer)
        pairs = docmap.select(
            "doc_id",
            "segment",
            analyze_pay(F.col(text_col)).alias("tps"),
        ).select(
            "doc_id",
            "segment",
            norm_byte_sql("size(tps)").alias("norm_byte"),
            F.explode("tps").alias("tp"),
        )
        cols = [
            F.lit(field).alias("field"),
            "term",
            "doc_id",
            "segment",
            F.expr("transform(_pse, x -> x.pos)").alias("positions"),
            "norm_byte",
        ]
        if with_offsets:
            cols += [
                F.expr("transform(_pse, x -> x.so)").alias("start_offsets"),
                F.expr("transform(_pse, x -> x.eo)").alias("end_offsets"),
            ]
        cols.append(F.expr("transform(_pse, x -> x.pay)").alias("payloads"))
        return (
            pairs.select(
                "doc_id",
                "segment",
                "norm_byte",
                F.col("tp.term").alias("term"),
                F.struct("tp.pos", "tp.so", "tp.eo", "tp.pay").alias("pse"),
            )
            .groupBy("term", "doc_id", "segment")
            .agg(
                F.sort_array(F.collect_list("pse")).alias("_pse"),
                F.min("norm_byte").alias("norm_byte"),
            )
            .select(*cols)
        )
    if not with_offsets:
        analyze_pos = make_analyze_pos_udf(analyzer)
        pairs = docmap.select(
            "doc_id",
            "segment",
            analyze_pos(F.col(text_col)).alias("tps"),
        ).select(
            "doc_id",
            "segment",
            norm_byte_sql("size(tps)").alias("norm_byte"),
            F.explode("tps").alias("tp"),
        )
        return (
            pairs.select(
                "doc_id",
                "segment",
                "norm_byte",
                F.col("tp.term").alias("term"),
                F.col("tp.pos").alias("pos"),
            )
            .groupBy("term", "doc_id", "segment")
            .agg(
                F.sort_array(F.collect_list("pos")).alias("positions"),
                F.min("norm_byte").alias("norm_byte"),
            )
            .select(
                F.lit(field).alias("field"), "term", "doc_id", "segment", "positions",
                "norm_byte",
            )
        )
    analyze_off = make_analyze_off_udf(analyzer)
    pairs = docmap.select(
        "doc_id",
        "segment",
        analyze_off(F.col(text_col)).alias("tps"),
    ).select(
        "doc_id",
        "segment",
        norm_byte_sql("size(tps)").alias("norm_byte"),
        F.explode("tps").alias("tp"),
    )
    # sort_array over struct(pos, so, eo) orders by pos (first field), then
    # transform unzips the aligned arrays — positions stay the sort key
    return (
        pairs.select(
            "doc_id",
            "segment",
            "norm_byte",
            F.col("tp.term").alias("term"),
            F.struct("tp.pos", "tp.so", "tp.eo").alias("pse"),
        )
        .groupBy("term", "doc_id", "segment")
        .agg(
            F.sort_array(F.collect_list("pse")).alias("_pse"),
            F.min("norm_byte").alias("norm_byte"),
        )
        .select(
            F.lit(field).alias("field"),
            "term",
            "doc_id",
            "segment",
            F.expr("transform(_pse, x -> x.pos)").alias("positions"),
            "norm_byte",
            F.expr("transform(_pse, x -> x.so)").alias("start_offsets"),
            F.expr("transform(_pse, x -> x.eo)").alias("end_offsets"),
        )
    )


def build_index(
    df: DataFrame,
    text_col: str = "text",
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    field: str = DEFAULT_FIELD,
    analyzer: StandardAnalyzer | None = None,
    num_segments: int | None = None,
    doc_id_col: str | None = None,
    build_blocks: bool = False,
    with_positions: bool = False,
    with_offsets: bool = True,
) -> IndexTables:
    """Build the five index tables from a document DataFrame.

    ``with_offsets`` (only meaningful with ``with_positions``) embeds
    character-offset arrays in the positional table
    (``..._AND_OFFSETS`` — the highlighter's OffsetSource POSTINGS);
    phrase-only deployments can drop it to halve the positional payload,
    exactly the ``IndexOptions`` trade-off the reference exposes.

    If ``doc_id_col`` is given, that column is used as the (already dense,
    unique) docID and segment assignment is skipped — used when the source
    carries stable ids (e.g. the ``documents`` test table).
    """
    analyzer = analyzer or StandardAnalyzer()
    invert = make_invert_udf(analyzer)

    if doc_id_col is not None:
        docmap = df.withColumn("doc_id", F.col(doc_id_col).cast("long")).withColumn(
            "segment", F.lit(0)
        )
    else:
        docmap = assign_doc_ids(df, key_cols, num_segments)

    # persisted: doclens and postings both read it — without the cache the
    # (expensive) analysis UDF would run once per derived table
    inverted = docmap.select(
        "doc_id", "segment", invert(F.col(text_col)).alias("inv")
    ).persist()

    doclens = inverted.select(
        "doc_id",
        "segment",
        F.lit(field).alias("field"),
        F.col("inv.len").alias("len"),
    ).withColumn("norm_byte", norm_byte_sql("len"))

    # per-doc inversion already counted freqs — explode is shuffle-free.
    # The doc's norm byte rides on every posting row (Lucene interleaves
    # norms into the impacts/skip data for the same reason,
    # Lucene103PostingsWriter impacts): every scoring path reads
    # (freq, norm) off the posting itself — NO corpus-sized doclens join
    # at query time, on any path.
    postings = inverted.select(
        "doc_id",
        "segment",
        norm_byte_sql("inv.len").alias("norm_byte"),
        F.explode("inv.tf").alias("tf"),
    ).select(
        F.lit(field).alias("field"),
        F.col("tf.term").alias("term"),
        "doc_id",
        "segment",
        F.col("tf.freq").alias("freq"),
        "norm_byte",
    )

    termstats = postings.groupBy("field", "term").agg(
        F.count("*").alias("doc_freq"),
        F.sum("freq").alias("total_term_freq"),
    )

    fieldstats = (
        doclens.groupBy("field")
        .agg(
            F.sum(F.when(F.col("len") > 0, 1).otherwise(0)).alias("doc_count"),
            F.sum("len").alias("sum_total_term_freq"),
        )
        .join(
            termstats.groupBy("field").agg(F.sum("doc_freq").alias("sum_doc_freq")),
            "field",
            "left",
        )
    )

    blocks = None
    if build_blocks:
        from lucene_spark.index.blocks import build_block_postings

        blocks = build_block_postings(postings, doclens)

    positions = (
        build_positions(docmap, text_col, field, analyzer, with_offsets=with_offsets)
        if with_positions
        else None
    )

    return IndexTables(
        docmap=docmap,
        doclens=doclens,
        postings=postings,
        termstats=termstats,
        fieldstats=fieldstats,
        blocks=blocks,
        positions=positions,
        inverted=inverted,
    )


def combine_fields(*tables: IndexTables) -> IndexTables:
    """Union per-field index tables over the SAME document set into one
    multi-field reader (Lucene documents carry many indexed fields in one
    index; this engine builds each field with :func:`build_index` and
    unions the field-keyed tables — every table already carries a
    ``field`` column, so the union IS the multi-field index).

    Flat scoring paths (term/Boolean/combined-field/facets) read the
    union transparently.  ``blocks``/``positions`` are dropped: impact
    blocks and positional layouts are per-field artifacts of the single
    field they were built for — callers needing WAND or phrases on a
    specific field query that field's own tables.  ``deletes`` are
    doc-level and shared (first non-None wins), as are per-doc
    ``vectors``."""
    first = tables[0]
    deletes = next((t.deletes for t in tables if t.deletes is not None), None)
    vectors = next((t.vectors for t in tables if t.vectors is not None), None)
    from functools import reduce as _reduce

    def u(sel):
        return _reduce(lambda a, b: a.unionByName(b), [sel(t) for t in tables])

    return IndexTables(
        docmap=first.docmap,
        doclens=u(lambda t: t.doclens),
        postings=u(lambda t: t.postings),
        termstats=u(lambda t: t.termstats),
        fieldstats=u(lambda t: t.fieldstats),
        blocks=None,
        positions=None,
        deletes=deletes,
        vectors=vectors,
    )
