"""NRT streaming index ingest: per-micro-batch segment appends.

The reference's near-real-time path (``ControlledRealTimeReopenThread``,
``index/ReaderManager.java``) re-expressed: each Structured Streaming
micro-batch becomes ONE new segment appended to the on-disk index
(``index/segments.py`` layout); readers opening the index after a batch
commit see the new docs — the snapshot-per-trigger visibility model (on a
real lake this is an Iceberg snapshot per commit).  Late data needs no
special handling: it simply lands in a later segment, exactly as a late
``addDocument`` lands in a later Lucene segment.

DocID continuity: the manifest tracks ``next_doc_id`` / ``next_segment``;
each batch claims a contiguous docID range, so global (score DESC, docID
ASC) ordering semantics keep working across streamed appends.  Global
term/field stats are refreshed after every batch (the stats-freshness rule
— queries must see docFreq/avgdl over the WHOLE index).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.index.blocks import (
    DEFAULT_TERM_BUCKETS,
    build_block_postings,
    term_bucket_col,
)
from lucene_spark.index.builder import make_invert_udf, norm_byte_sql
from lucene_spark.index.segments import (
    DEFAULT_FIELD,
    _manifest_dir,
    _refresh_global_stats,
    _write_json_atomic,
    load_plan,
)


def _stream_state_path(index_dir: str) -> str:
    return os.path.join(_manifest_dir(index_dir), "stream_state.json")


def _load_stream_state(index_dir: str) -> dict:
    p = _stream_state_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    # first append onto a BATCH-built index (the NRT-on-top-of-a-build flow):
    # claim segment ids / docIDs AFTER the plan's ranges — starting at 0
    # would overwrite the build's segment partitions and duplicate docIDs
    plan = load_plan(index_dir)
    if plan is not None:
        return {
            "next_doc_id": int(plan["total_rows"]),
            "next_segment": int(plan["num_segments"]),
            "epochs": [],
        }
    return {"next_doc_id": 0, "next_segment": 0, "epochs": []}


def append_batch(
    batch: DataFrame,
    index_dir: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    field: str = DEFAULT_FIELD,
    analyzer: StandardAnalyzer | None = None,
    epoch_id: int | None = None,
    refresh_stats: bool = True,
) -> dict:
    """Index one micro-batch as a fresh segment; returns the commit record.

    Idempotent per epoch: if ``epoch_id`` was already committed (streaming
    replay after failure) the batch is skipped — exactly-once appends on
    top of Structured Streaming's at-least-once ``foreachBatch``.
    """
    spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    analyzer = analyzer or StandardAnalyzer()
    os.makedirs(_manifest_dir(index_dir), exist_ok=True)
    state = _load_stream_state(index_dir)
    if epoch_id is not None and any(e["epoch"] == epoch_id for e in state["epochs"]):
        return {"skipped": True, "epoch": epoch_id}

    seg = int(state["next_segment"])
    base = int(state["next_doc_id"])

    # bucket layout must MATCH the index it appends to (a block written with
    # a different hash%B would be invisible to the pruned query scan): the
    # batch-build plan wins, then the layout recorded by earlier appends;
    # a brand-new streaming index records the default once.
    plan = load_plan(index_dir)
    if plan is not None and "term_buckets" in plan:
        nb = plan["term_buckets"]
    elif "term_buckets" in state:
        nb = state["term_buckets"]
    elif os.path.isdir(os.path.join(index_dir, "blocks")):
        nb = None  # pre-bucketing index with no record: keep legacy layout
    else:
        nb = DEFAULT_TERM_BUCKETS
    state["term_buckets"] = nb

    # positional layout follows the same must-match rule: an index built
    # with_positions must get positions for every appended segment too, or
    # disk-resident proximity queries would silently miss streamed docs
    if plan is not None and "positions" in plan:
        pos_layout = plan["positions"]
    elif "positions" in state:
        pos_layout = state["positions"]
    elif os.path.isdir(os.path.join(index_dir, "positions")):
        # pre-record index: assume the full offsets layout, no payloads
        pos_layout = {"with_offsets": True, "store_payloads": False}
    else:
        pos_layout = None
    state["positions"] = pos_layout
    if pos_layout is not None and bool(pos_layout.get("store_payloads", False)) != (
        analyzer.payload_fn is not None
    ):
        raise ValueError(
            "this index's positional layout was stamped with store_payloads="
            f"{bool(pos_layout.get('store_payloads', False))};"
            " append with a matching analyzer"
        )

    arranged = batch.repartition(1).sortWithinPartitions(*key_cols)
    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + list(arranged.schema.fields)
        + [T.StructField("segment", T.IntegerType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if pdf.empty:
                continue
            out = pdf.copy()
            out.insert(0, "doc_id", np.arange(base + local, base + local + len(pdf), dtype=np.int64))
            out["segment"] = np.int32(seg)
            local += len(pdf)
            yield out

    docmap = arranged.mapInPandas(assign, schema=out_schema)
    invert = make_invert_udf(analyzer)
    inverted = docmap.select(
        "doc_id", "segment", invert(F.col(text_col)).alias("inv")
    ).persist()
    doclens = inverted.select(
        "doc_id", "segment", F.lit(field).alias("field"), F.col("inv.len").alias("len")
    ).withColumn("norm_byte", norm_byte_sql("len"))
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
    blocks = build_block_postings(postings)

    n_rows = 0
    for df, name in ((docmap, "docmap"), (doclens, "doclens")):
        df.write.mode("overwrite").partitionBy("segment").parquet(
            os.path.join(index_dir, name)
        )
    if nb:
        blocks.withColumn("tbucket", term_bucket_col(F.col("term"), nb)).write.mode(
            "overwrite"
        ).partitionBy("segment", "tbucket").parquet(os.path.join(index_dir, "blocks"))
    else:
        blocks.write.mode("overwrite").partitionBy("segment").parquet(
            os.path.join(index_dir, "blocks")
        )
    if pos_layout:
        from lucene_spark.index.builder import build_positions

        pos = build_positions(
            docmap,
            text_col,
            field,
            analyzer,
            with_offsets=bool(pos_layout.get("with_offsets", True)),
        )
        if nb:
            pos = pos.withColumn("tbucket", term_bucket_col(F.col("term"), nb))
            pos.write.mode("overwrite").partitionBy("segment", "tbucket").parquet(
                os.path.join(index_dir, "positions")
            )
        else:
            pos.write.mode("overwrite").partitionBy("segment").parquet(
                os.path.join(index_dir, "positions")
            )
    n_rows = spark.read.parquet(os.path.join(index_dir, "docmap")).filter(
        F.col("segment") == seg
    ).count()
    inverted.unpersist()

    state["next_segment"] = seg + 1
    state["next_doc_id"] = base + n_rows
    state["epochs"].append({"epoch": epoch_id, "segment": seg, "rows": n_rows, "ts": time.time()})
    _write_json_atomic(_stream_state_path(index_dir), state)
    if refresh_stats:
        _refresh_global_stats(spark, index_dir, field)
    return {"segment": seg, "rows": n_rows, "doc_base": base, "epoch": epoch_id}


def update_documents(
    batch: DataFrame,
    index_dir: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    **kwargs,
) -> dict:
    """IndexWriter.updateDocument (``index/IndexWriter.java:1844``): atomic
    delete-by-key + add — existing docs whose ``key_cols`` match a batch row
    are soft-deleted (applied at the next merge), and the batch is appended
    as a new segment.  The new docs win every query from this commit on.
    """
    spark = batch.sparkSession
    # exactly-once guard BEFORE writing delete victims: on an at-least-once
    # foreachBatch replay of an already-committed epoch, the victims join
    # would match the replacement docs appended by the first attempt and
    # soft-delete them while the re-append is skipped — the updated docs
    # would vanish.  Check the committed-epoch state first.
    epoch_id = kwargs.get("epoch_id")
    if epoch_id is not None:
        state = _load_stream_state(index_dir)
        if any(e["epoch"] == epoch_id for e in state["epochs"]):
            return {"skipped": True, "epoch": epoch_id, "deleted": 0}
    docmap_path = os.path.join(index_dir, "docmap")
    if os.path.isdir(docmap_path):
        docmap = spark.read.parquet(docmap_path)
        victims = (
            docmap.join(
                F.broadcast(batch.select(*key_cols).distinct()), list(key_cols)
            )
            .select("doc_id")
            .distinct()
        )
        n_victims = victims.count()
        if n_victims:
            victims.write.mode("append").parquet(os.path.join(index_dir, "deletes"))
    else:
        n_victims = 0
    rec = append_batch(batch, index_dir, key_cols=key_cols, **kwargs)
    rec["deleted"] = n_victims
    return rec


def stream_to_index(
    stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """writeStream.foreachBatch wiring for :func:`append_batch`."""

    def step(batch: DataFrame, epoch_id: int) -> None:
        append_batch(batch, index_dir, epoch_id=epoch_id, **kwargs)

    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
