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


class _BlockRows:
    """Columnar accumulator for encoded blocks — one pandas DataFrame per
    ARROW BATCH, never per posting-list group (per-group frame construction
    was the encode kernel's dominant overhead at ~10^5 groups/partition)."""

    __slots__ = ("cols",)

    _NAMES = (
        "field", "term", "segment", "block_id", "first_doc", "last_doc",
        "num_docs", "sum_freq", "doc_blob", "freq_blob", "norm_blob", "impacts",
    )

    def __init__(self):
        self.cols = {n: [] for n in self._NAMES}

    def add_group(
        self,
        field: str,
        term: str,
        segment: int,
        docs: np.ndarray,
        freqs: np.ndarray,
        norms: np.ndarray,
        codec: str,
    ) -> None:
        blocks = encode_posting_list(docs, freqs, norms, codec=codec)
        c = self.cols
        for i, b in enumerate(blocks):
            c["field"].append(field)
            c["term"].append(term)
            c["segment"].append(np.int32(segment))
            c["block_id"].append(np.int32(b.block_id))
            c["first_doc"].append(b.first_doc)
            c["last_doc"].append(b.last_doc)
            c["num_docs"].append(np.int32(b.num_docs))
            c["sum_freq"].append(
                int(freqs[i * BLOCK_SIZE : i * BLOCK_SIZE + b.num_docs].sum())
            )
            c["doc_blob"].append(b.doc_blob)
            c["freq_blob"].append(b.freq_blob)
            c["norm_blob"].append(b.norm_blob)
            c["impacts"].append(
                [{"freq": f_, "norm": n_} for f_, n_ in b.impacts]
            )

    def frame(self) -> pd.DataFrame | None:
        if not self.cols["term"]:
            return None
        return pd.DataFrame(self.cols)


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
        # carry = the (possibly batch-spanning) trailing group's raw arrays
        carry_key: tuple | None = None
        carry_d: list[np.ndarray] = []
        carry_f: list[np.ndarray] = []
        carry_n: list[np.ndarray] = []
        out = _BlockRows()

        def flush_carry():
            if carry_key is not None and carry_d:
                out.add_group(
                    carry_key[0],
                    carry_key[1],
                    int(carry_key[2]),
                    np.concatenate(carry_d),
                    np.concatenate(carry_f),
                    np.concatenate(carry_n),
                    codec,
                )

        for pdf in batches:
            if pdf.empty:
                continue
            fa = pdf["field"].to_numpy()
            ta = pdf["term"].to_numpy()
            sa = pdf["segment"].to_numpy()
            da = pdf["doc_id"].to_numpy(dtype=np.int64)
            fr = pdf["freq"].to_numpy(dtype=np.int64)
            nm = pdf["norm_byte"].to_numpy(dtype=np.int64)
            change = (fa[1:] != fa[:-1]) | (ta[1:] != ta[:-1]) | (sa[1:] != sa[:-1])
            starts = np.flatnonzero(np.concatenate(([True], change)))
            bounds = np.append(starts, len(pdf))
            for i in range(len(starts)):
                s, e = int(bounds[i]), int(bounds[i + 1])
                key = (fa[s], ta[s], int(sa[s]))
                if carry_key is not None and key != carry_key:
                    flush_carry()
                    carry_d, carry_f, carry_n = [], [], []
                carry_key = key
                carry_d.append(da[s:e])
                carry_f.append(fr[s:e])
                carry_n.append(nm[s:e])
                if e < len(pdf):
                    # group is complete (a later group follows in-batch)
                    flush_carry()
                    carry_key, carry_d, carry_f, carry_n = None, [], [], []
            if len(out.cols["term"]) >= 65536:  # bound the output buffer
                f = out.frame()
                if f is not None:
                    yield f
                out = _BlockRows()
        flush_carry()
        f = out.frame()
        if f is not None:
            yield f

    return arranged.mapInPandas(encode, schema=BLOCKS_SCHEMA)
