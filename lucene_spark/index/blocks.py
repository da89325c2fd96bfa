"""Block-postings table: compressed 128-doc FOR/VByte blocks + impacts.

Builds the FIXTURES.md §5 ``postings`` block schema from the flat postings:

    (field, term, segment, block_id, first_doc, last_doc, num_docs,
     doc_blob binary, freq_blob binary, impacts array<struct<freq,norm>>)

Scale shape (the reference's flush path, ``FreqProxTermsWriter.java:83-135``,
re-expressed):

* posting lists are **per segment** — a segment is a contiguous docID range
  (one DWPT flush in Lucene; one range partition of the sorted source here),
  so a hot term's in-memory list is bounded by segment size, never corpus
  size.  This *is* the two-stage salted aggregation of the north rule: stage
  1 groups (term, doc) within segments (map-side combine), stage 2
  concatenates per-segment lists at query/merge time — the salt is the
  segment id, which also preserves global docID order (segment ranges are
  disjoint and ordered), so merging is concatenation, not re-sorting
  (``index/DocIDMerger.java:32``).
* the build streams: hash-repartition on the group key, sort within
  partitions by (key, doc_id), then one pass of ``mapInPandas`` with a
  carry buffer across Arrow batches — no per-group Python overhead, no
  driver collect, no full-list shuffle skew.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.index.codec import BLOCK_SIZE, encode_posting_list

# On-disk term pruning: block files are partitioned by (segment, tbucket)
# where tbucket = hash(term) % NUM_TERM_BUCKETS — the lake-layout analog of
# the block-tree terms dictionary's job (a query resolves its terms to
# buckets and scans only those files, O(query terms), never the whole
# postings directory — Lucene103BlockTreeTermsWriter.java:211-272).  At
# 100 TB raise the bucket count (it is recorded in the index manifest).
DEFAULT_TERM_BUCKETS = 16


def term_bucket_py(term: str, num_buckets: int) -> int:
    """Driver-side term→bucket (MUST match :func:`term_bucket_col`)."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % num_buckets


def term_bucket_col(col, num_buckets: int):
    """JVM-side term→bucket: md5-prefix hash mod num_buckets."""
    h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    return (h % num_buckets).cast("int")


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("segment", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("num_docs", T.IntegerType(), False),
        T.StructField("sum_freq", T.LongType(), False),
        T.StructField("doc_blob", T.BinaryType(), False),
        T.StructField("freq_blob", T.BinaryType(), False),
        T.StructField("norm_blob", T.BinaryType(), False),
        T.StructField(
            "impacts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("freq", T.IntegerType(), False),
                        T.StructField("norm", T.ShortType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


def _encode_group(
    field: str, term: str, segment: int, rows: list[pd.DataFrame],
    codec: str = "lucene_for",
) -> pd.DataFrame:
    g = pd.concat(rows) if len(rows) > 1 else rows[0]
    docs = g["doc_id"].to_numpy(dtype=np.int64)
    freqs = g["freq"].to_numpy(dtype=np.int64)
    norms = g["norm_byte"].to_numpy(dtype=np.int64)
    blocks = encode_posting_list(docs, freqs, norms, codec=codec)
    return pd.DataFrame(
        {
            "field": field,
            "term": term,
            "segment": np.int32(segment),
            "block_id": np.array([b.block_id for b in blocks], dtype=np.int32),
            "first_doc": np.array([b.first_doc for b in blocks], dtype=np.int64),
            "last_doc": np.array([b.last_doc for b in blocks], dtype=np.int64),
            "num_docs": np.array([b.num_docs for b in blocks], dtype=np.int32),
            "sum_freq": np.array(
                [
                    int(freqs[i * BLOCK_SIZE : i * BLOCK_SIZE + b.num_docs].sum())
                    for i, b in enumerate(blocks)
                ],
                dtype=np.int64,
            ),
            "doc_blob": [b.doc_blob for b in blocks],
            "freq_blob": [b.freq_blob for b in blocks],
            "norm_blob": [b.norm_blob for b in blocks],
            "impacts": [
                [{"freq": f_, "norm": n_} for f_, n_ in b.impacts] for b in blocks
            ],
        }
    )


def build_block_postings(
    postings: DataFrame,
    doclens: DataFrame | None = None,
    num_partitions: int | None = None,
    codec: str = "lucene_for",
) -> DataFrame:
    """Flat postings (field, term, doc_id, segment, freq) → encoded blocks.

    Norm bytes for the impact frontiers come from the postings rows
    themselves when the build embedded them (``builder.build_index`` does —
    one fewer corpus-sized shuffle here); ``doclens`` is the fallback join
    source for postings produced without the embedded column.  ``codec``
    names a registered postings format (codec.POSTINGS_FORMATS — the
    ``codecs/PostingsFormat.java`` SPI shape).
    """
    parts = num_partitions or postings.sparkSession.sparkContext.defaultParallelism
    if "norm_byte" in postings.columns:
        joined = postings.select("field", "term", "segment", "doc_id", "freq", "norm_byte")
    else:
        if doclens is None:
            raise ValueError("postings lack norm_byte and no doclens was given")
        joined = postings.join(
            doclens.select("doc_id", "field", "norm_byte"), ["doc_id", "field"]
        ).select("field", "term", "segment", "doc_id", "freq", "norm_byte")

    arranged = joined.repartition(parts, "field", "term", "segment").sortWithinPartitions(
        "field", "term", "segment", "doc_id"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_key: tuple | None = None
        carry: list[pd.DataFrame] = []
        for pdf in batches:
            if pdf.empty:
                continue
            fa = pdf["field"].to_numpy()
            ta = pdf["term"].to_numpy()
            sa = pdf["segment"].to_numpy()
            change = (fa[1:] != fa[:-1]) | (ta[1:] != ta[:-1]) | (sa[1:] != sa[:-1])
            starts = np.flatnonzero(np.concatenate(([True], change)))
            for i, s in enumerate(starts):
                e = starts[i + 1] if i + 1 < len(starts) else len(pdf)
                chunk = pdf.iloc[s:e]
                key = tuple(chunk.iloc[0][["field", "term", "segment"]])
                if carry_key is not None and key != carry_key:
                    yield _encode_group(*carry_key, carry, codec=codec)
                    carry = []
                carry_key = key
                carry.append(chunk)
        if carry_key is not None and carry:
            yield _encode_group(*carry_key, carry, codec=codec)

    return arranged.mapInPandas(encode, schema=BLOCKS_SCHEMA)
