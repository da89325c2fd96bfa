"""Segmented on-disk index: checkpointed build, lineage + metrics, merges.

The persistent form of the engine — the re-expression of Lucene's segment
lifecycle (``index/SegmentInfos.java`` manifest, ``index/IndexWriter.java:
1312-1346`` two-phase commit, ``index/SegmentMerger.java:113`` compaction,
``index/CheckIndex.java:127`` verification) on a data-lake layout:

    index_dir/
      manifest/plan.json            build plan: boundaries, counts, offsets
                                    (the lineage root)
      manifest/seg-{i:05d}.json     per-segment checkpoint: status, lineage,
                                    metrics (turns/sec, rows, wall)
      docmap/segment={i}/  doclens/…  blocks/…   parquet, partitioned by segment
      stats/termstats/  stats/fieldstats/        global stats (recomputed after
                                                 every append/merge — the
                                                 "stats freshness" rule)

Design for 10^12 turns:

* a *segment* is a contiguous ``conv_id`` range (conversations never split),
  sized for one executor task — the DWPT analogy
  (``index/DocumentsWriterPerThread.java``); docIDs are
  ``plan.offset[seg] + local rank`` under (conv_id, turn_idx), so the global
  docID order is identical no matter how many executors build it, at N or
  4N parallelism (the north-rule invariant),
* the build is **resumable per batch of segments**: each batch is one Spark
  job writing only its segments' parquet partitions (dynamic partition
  overwrite ⇒ re-running a crashed batch is idempotent); the manifest
  checkpoint is written after the batch commits (temp file + atomic rename —
  on a real lake this is an Iceberg snapshot commit).  Restart skips
  completed batches,
* the plan phase computes boundaries ONCE (range-partitioner sampling over
  distinct conv_ids — no global sort, no driver materialization) and
  persists them; restarts reuse the persisted boundaries, so segmentation —
  and therefore docIDs — is deterministic across attempts,
* merges concatenate per-segment posting lists in segment order — docIDs
  are globally ordered by construction, so a merge is decode → concat →
  re-encode (``index/DocIDMerger.java:32`` concatenation remap, trivial
  here), never a re-sort.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator, Sequence

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
from lucene_spark.index.builder import (
    IndexTables,
    norm_byte_sql,
    make_invert_udf,
)

DEFAULT_FIELD = "text"


# ------------------------------------------------------------------- manifest


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # atomic on POSIX; Iceberg snapshot commit on a lake


def _manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def load_plan(index_dir: str) -> dict | None:
    p = os.path.join(_manifest_dir(index_dir), "plan.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def segment_states(index_dir: str, n_segments: int) -> list[dict | None]:
    out: list[dict | None] = []
    for i in range(n_segments):
        p = os.path.join(_manifest_dir(index_dir), f"seg-{i:05d}.json")
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
        else:
            out.append(None)
    return out


def metrics_table(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-segment build metrics/lineage as a DataFrame (the north-rule
    "metrics tables"); rows come from the manifest checkpoints."""
    plan = load_plan(index_dir)
    rows = [s for s in segment_states(index_dir, plan["num_segments"]) if s]
    return spark.createDataFrame(
        [
            (
                s["segment"],
                s["status"],
                s["rows"],
                s["doc_offset"],
                float(s["batch_wall_sec"]),
                float(s["batch_turns_per_sec"]),
                json.dumps(s["lineage"]),
                float(s["ts"]),
            )
            for s in rows
        ],
        "segment int, status string, rows long, doc_offset long, "
        "batch_wall_sec double, batch_turns_per_sec double, lineage string, ts double",
    )


# ----------------------------------------------------------------- plan phase


def _segment_of_udf(boundaries: list[str]):
    bnd = np.array(boundaries, dtype=str)

    @F.pandas_udf(T.IntegerType())
    def seg_of(conv: pd.Series) -> pd.Series:
        if len(bnd) == 0:
            return pd.Series(np.zeros(len(conv), dtype=np.int32))
        idx = np.searchsorted(bnd, conv.to_numpy(dtype=str), side="right")
        return pd.Series(idx.astype(np.int32))

    return seg_of


def plan_build(
    source: DataFrame,
    index_dir: str,
    num_segments: int,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
) -> dict:
    """Phase 0: boundaries + per-segment counts + docID offsets → plan.json.

    Runs exactly once per index; restarts load the persisted plan so that
    segmentation (⇒ docIDs) is stable across attempts and cluster sizes.
    """
    existing = load_plan(index_dir)
    if existing is not None:
        return existing
    os.makedirs(_manifest_dir(index_dir), exist_ok=True)

    conv_col = key_cols[0]
    if num_segments > 1:
        # range-partitioner sampling: scalable boundary estimation, no global
        # sort — each range partition's min is a split candidate
        distinct = source.select(conv_col).distinct()
        bounds_rows = (
            distinct.repartitionByRange(num_segments, F.col(conv_col))
            .withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .agg(F.min(conv_col).alias("lo"))
            .orderBy("_p")
            .collect()
        )
        boundaries = sorted({r["lo"] for r in bounds_rows[1:]})
    else:
        boundaries = []
    num_segments = len(boundaries) + 1  # empty ranges collapse

    seg_of = _segment_of_udf(boundaries)
    counts = {
        int(r["_seg"]): int(r["n"])
        for r in source.groupBy(seg_of(F.col(conv_col)).alias("_seg"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    offsets, acc = [], 0
    for i in range(num_segments):
        offsets.append(acc)
        acc += counts.get(i, 0)

    plan = {
        "num_segments": num_segments,
        "boundaries": boundaries,
        "counts": [counts.get(i, 0) for i in range(num_segments)],
        "offsets": offsets,
        "total_rows": acc,
        "key_cols": list(key_cols),
        "created_ts": time.time(),
    }
    _write_json_atomic(os.path.join(_manifest_dir(index_dir), "plan.json"), plan)
    return plan


# ---------------------------------------------------------------- build phase


def build_segments(
    source: DataFrame,
    index_dir: str,
    num_segments: int | None = None,
    batch_size: int = 8,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    text_col: str = "text",
    field: str = DEFAULT_FIELD,
    analyzer: StandardAnalyzer | None = None,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
    with_offsets: bool = True,
) -> dict:
    """Checkpointed segment build; safe to kill and re-run (idempotent).

    ``source`` must be the same deterministic DataFrame on every attempt
    (same parquet path / same generator args) — recorded in the lineage.

    ``with_positions`` persists the positional table alongside the blocks
    (``positions/segment=*/tbucket=*`` — the .pos/.pay sections of
    ``codecs/lucene103/Lucene103PostingsFormat.java:43-120`` as a
    bucket-partitioned parquet table), so a disk-resident index answers
    phrase/sloppy/interval/span/highlight queries with the positions scan
    pruned to the query terms' buckets.  ``with_offsets`` additionally
    embeds character-offset arrays (``..._AND_OFFSETS``) for the
    highlighter.  The decision is stamped in the plan once — resumed
    builds keep the recorded layout.
    """
    spark = source.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    num_segments = num_segments or max(2, spark.sparkContext.defaultParallelism)
    plan = plan_build(source, index_dir, num_segments, key_cols)
    num_segments = plan["num_segments"]
    if "term_buckets" not in plan:
        # Stamp the layout decision ONCE.  A resumed pre-bucketing build
        # (plan without the key but block files already on disk) must keep
        # the legacy unbucketed layout — mixing segment=*/ and
        # segment=*/tbucket=*/ files in one directory breaks partition
        # discovery.  term_buckets=None is that recorded decision.
        legacy = os.path.isdir(os.path.join(index_dir, "blocks"))
        plan["term_buckets"] = None if legacy else int(term_buckets)
        _write_json_atomic(os.path.join(_manifest_dir(index_dir), "plan.json"), plan)
    analyzer = analyzer or StandardAnalyzer()
    if "positions" not in plan:
        # Same stamp-once rule for the positional layout (IndexOptions is
        # an index-time decision in the reference too): a resumed build
        # keeps writing — or keeps not writing — the positions table.
        # ``store_payloads`` (FieldInfo.storePayloads) is part of the stamp:
        # a resume with a mismatched analyzer would silently write a
        # different positions schema into the same parquet table.
        plan["positions"] = (
            {
                "with_offsets": bool(with_offsets),
                "store_payloads": analyzer.payload_fn is not None,
            }
            if with_positions
            else None
        )
        _write_json_atomic(os.path.join(_manifest_dir(index_dir), "plan.json"), plan)
    if plan.get("positions") is not None:
        recorded = bool(plan["positions"].get("store_payloads", False))
        if recorded != (analyzer.payload_fn is not None):
            raise ValueError(
                "this index's positional layout was stamped with"
                f" store_payloads={recorded}; resume with a matching analyzer"
            )
    states = segment_states(index_dir, num_segments)

    for lo in range(0, num_segments, batch_size):
        hi = min(lo + batch_size, num_segments)
        if all(states[i] and states[i]["status"] == "done" for i in range(lo, hi)):
            continue
        t0 = time.perf_counter()
        rows_written = _build_batch(
            source, index_dir, plan, lo, hi, key_cols, text_col, field, analyzer
        )
        wall = time.perf_counter() - t0
        for i in range(lo, hi):
            _write_json_atomic(
                os.path.join(_manifest_dir(index_dir), f"seg-{i:05d}.json"),
                {
                    "segment": i,
                    "status": "done",
                    "rows": plan["counts"][i],
                    "doc_offset": plan["offsets"][i],
                    "batch": [lo, hi],
                    "batch_rows_written": rows_written,
                    "batch_wall_sec": round(wall, 3),
                    "batch_turns_per_sec": round(rows_written / max(wall, 1e-9), 1),
                    "lineage": {
                        "key_cols": plan["key_cols"],
                        "boundary_lo": (plan["boundaries"][i - 1] if i > 0 else None),
                        "boundary_hi": (
                            plan["boundaries"][i] if i < num_segments - 1 else None
                        ),
                    },
                    "ts": time.time(),
                },
            )

    _refresh_global_stats(spark, index_dir, field)
    return plan


def _build_batch(
    source: DataFrame,
    index_dir: str,
    plan: dict,
    seg_lo: int,
    seg_hi: int,
    key_cols: Sequence[str],
    text_col: str,
    field: str,
    analyzer: StandardAnalyzer,
) -> int:
    conv_col = key_cols[0]
    seg_of = _segment_of_udf(plan["boundaries"])
    off_arr = list(plan["offsets"])

    batch = source.withColumn("_seg", seg_of(F.col(conv_col))).filter(
        (F.col("_seg") >= seg_lo) & (F.col("_seg") < seg_hi)
    )
    arranged = batch.repartition(seg_hi - seg_lo, "_seg").sortWithinPartitions(
        "_seg", *key_cols
    )

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)]
        + [f for f in arranged.schema.fields if f.name != "_seg"]
        + [T.StructField("segment", T.IntegerType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            segs = pdf["_seg"].to_numpy()
            out = pdf.drop(columns=["_seg"])
            ids = np.empty(len(pdf), dtype=np.int64)
            # per-segment running counters (a partition may carry >1 segment)
            for s in np.unique(segs):
                m = segs == s
                start = off_arr[int(s)] + local.get(int(s), 0)
                ids[m] = start + np.arange(int(m.sum()), dtype=np.int64)
                local[int(s)] = local.get(int(s), 0) + int(m.sum())
            out.insert(0, "doc_id", ids)
            out["segment"] = segs.astype(np.int32)
            yield out

    docmap = arranged.mapInPandas(assign, schema=out_schema)

    invert = make_invert_udf(analyzer)
    # cached across the three table writes of this batch (docmap/doclens/
    # blocks all sit downstream of the analysis UDF), freed after the batch
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
    nb = plan.get("term_buckets")
    blocks = build_block_postings(postings)

    # dynamic partition overwrite: each write touches only segment={lo..hi};
    # blocks additionally partition by tbucket (term-pruned reads) on the
    # bucketed layout — legacy (term_buckets=None) indexes keep their layout
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
    if plan.get("positions"):
        _write_positions(
            docmap, index_dir, plan, text_col, field, analyzer
        )
    inverted.unpersist()
    return sum(plan["counts"][seg_lo:seg_hi])


def _write_positions(
    docmap: DataFrame,
    index_dir: str,
    plan: dict,
    text_col: str,
    field: str,
    analyzer: StandardAnalyzer,
) -> None:
    """Persist the positional table for one batch's segments — partitioned
    like the blocks ((segment, tbucket)), so proximity queries prune the
    positions file scan to the query terms' buckets (the same
    terms-dictionary pruning the block scan gets).  Dynamic partition
    overwrite keeps the write idempotent per batch."""
    from lucene_spark.index.builder import build_positions

    pos = build_positions(
        docmap,
        text_col,
        field,
        analyzer,
        with_offsets=bool(plan["positions"].get("with_offsets", True)),
    )
    nb = plan.get("term_buckets")
    if nb:
        pos.withColumn("tbucket", term_bucket_col(F.col("term"), nb)).write.mode(
            "overwrite"
        ).partitionBy("segment", "tbucket").parquet(
            os.path.join(index_dir, "positions")
        )
    else:
        pos.write.mode("overwrite").partitionBy("segment").parquet(
            os.path.join(index_dir, "positions")
        )


def resolve_term_buckets(index_dir: str, blocks: DataFrame | None = None) -> int | None:
    """The index's recorded bucket layout: plan.json first, then the
    streaming state, then (last resort, old indexes) the blocks schema."""
    plan = load_plan(index_dir)
    if plan is not None and "term_buckets" in plan:
        return plan["term_buckets"]
    sp = os.path.join(_manifest_dir(index_dir), "stream_state.json")
    if os.path.exists(sp):
        with open(sp) as f:
            st = json.load(f)
        if "term_buckets" in st:
            return st["term_buckets"]
    if blocks is not None and "tbucket" in blocks.columns:
        # manifest lost: derive the layout from the data itself — assuming
        # DEFAULT_TERM_BUCKETS here would silently prune a wider layout's
        # scan to the wrong buckets and drop hits.  max(tbucket)+1 is EXACT
        # when every bucket 0..max is populated (true for any vocabulary
        # much larger than the bucket count, regardless of whether the
        # layout is a power of two); if the observed ids are sparse the
        # modulus is ambiguous, so fail loudly rather than mis-prune.
        agg = blocks.agg(
            F.max("tbucket").alias("m"), F.count_distinct("tbucket").alias("d")
        ).collect()[0]
        if agg["m"] is None:
            return None
        if int(agg["d"]) == int(agg["m"]) + 1:
            return int(agg["m"]) + 1
        raise RuntimeError(
            "term-bucket layout unrecoverable: manifest lost and the "
            f"observed tbucket ids are sparse ({agg['d']} distinct, max "
            f"{agg['m']}) — cannot infer the hash modulus safely"
        )
    return None


def _refresh_global_stats(spark: SparkSession, index_dir: str, field: str) -> None:
    """Recompute termstats/fieldstats over ALL segments (post-append/merge
    freshness — ``IndexSearcher.java:1140-1155`` resolves stats globally).
    Aggregates block *metadata* only (num_docs, sum_freq) — never decodes."""
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    termstats = blocks.groupBy("field", "term").agg(
        F.sum("num_docs").cast("long").alias("doc_freq"),
        F.sum("sum_freq").cast("long").alias("total_term_freq"),
    )
    # terms dictionary bucketed like the blocks: a per-query stats lookup
    # prunes to the query terms' buckets instead of scanning the whole
    # vocabulary (at 10^12 turns the vocab table alone is GBs).  The write
    # forces STATIC partition overwrite: under the session's dynamic mode a
    # bucket whose vocabulary vanished (delete + compaction) would keep its
    # stale partition and resurrect dead terms' stats.
    nb = resolve_term_buckets(index_dir, blocks)
    if nb:
        termstats.withColumn("tbucket", term_bucket_col(F.col("term"), nb)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "static").partitionBy("tbucket").parquet(
            os.path.join(index_dir, "stats", "termstats")
        )
    else:
        termstats.write.mode("overwrite").parquet(
            os.path.join(index_dir, "stats", "termstats")
        )
    fieldstats = doclens.groupBy("field").agg(
        F.sum(F.when(F.col("len") > 0, 1).otherwise(0)).alias("doc_count"),
        F.sum("len").alias("sum_total_term_freq"),
    )
    fieldstats.write.mode("overwrite").parquet(
        os.path.join(index_dir, "stats", "fieldstats")
    )


# ------------------------------------------------------------------- deletes


def delete_documents(
    spark: SparkSession,
    index_dir: str,
    term: str | None = None,
    doc_ids: list[int] | None = None,
    field: str = DEFAULT_FIELD,
) -> int:
    """Persistent buffered deletes (IndexWriter.deleteDocuments): append doc
    ids to the ``deletes`` table; queries anti-join it (soft delete), the
    next :func:`merge_segments` applies it physically (compaction)."""
    if term is not None:
        blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
        hits = (
            decode_blocks_to_postings(
                blocks.filter((F.col("field") == field) & (F.col("term") == term))
            )
            .select("doc_id")
            .distinct()
        )
    elif doc_ids is not None:
        hits = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    else:
        raise ValueError("one of term / doc_ids required")
    n = hits.count()
    hits.write.mode("append").parquet(os.path.join(index_dir, "deletes"))
    return n


def _load_deletes(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = os.path.join(index_dir, "deletes")
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).select("doc_id").distinct()


# ------------------------------------------------------------------ read path


def read_index(spark: SparkSession, index_dir: str) -> IndexTables:
    """Open the on-disk index as queryable DataFrames.  The positional
    table (when the index was built ``with_positions``) loads alongside, so
    phrase/interval/span/highlight queries run against the disk layout —
    their scans pruned to the query terms' (segment, tbucket) partitions
    via :meth:`IndexTables.positions_for_terms`."""
    docmap = spark.read.parquet(os.path.join(index_dir, "docmap"))
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens"))
    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    termstats = spark.read.parquet(os.path.join(index_dir, "stats", "termstats"))
    fieldstats = spark.read.parquet(
        os.path.join(index_dir, "stats", "fieldstats")
    ).join(
        termstats.groupBy("field").agg(F.sum("doc_freq").alias("sum_doc_freq")),
        "field",
        "left",
    )
    postings = decode_blocks_to_postings(blocks)
    term_buckets = resolve_term_buckets(index_dir, blocks)
    pos_path = os.path.join(index_dir, "positions")
    positions = spark.read.parquet(pos_path) if os.path.isdir(pos_path) else None
    return IndexTables(
        docmap=docmap,
        doclens=doclens,
        postings=postings,
        termstats=termstats,
        fieldstats=fieldstats,
        blocks=blocks,
        positions=positions,
        deletes=_load_deletes(spark, index_dir),
        term_buckets=term_buckets,
        disk_backed=True,
    )


def decode_blocks_to_postings(blocks: DataFrame) -> DataFrame:
    """Lazy flat-postings view over the compressed blocks (vectorized decode;
    the loop is per *block* = per 128 docs, not per row).  Norm bytes decode
    alongside (``norm_blob`` rides in the block), so the flat view scores
    without a doclens join — same contract as builder-embedded postings."""
    from lucene_spark.index.codec import decode_block, decode_norms

    schema = (
        "field string, term string, doc_id long, segment int, freq int,"
        " norm_byte short"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                d, f = decode_block(
                    int(r.first_doc), int(r.num_docs), bytes(r.doc_blob), bytes(r.freq_blob)
                )
                nm = decode_norms(bytes(r.norm_blob))
                outs.append(
                    pd.DataFrame(
                        {
                            "field": r.field,
                            "term": r.term,
                            "doc_id": d,
                            "segment": np.int32(r.segment),
                            "freq": f.astype(np.int32),
                            "norm_byte": nm.astype(np.int16),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    return blocks.mapInPandas(decode, schema=schema)


# --------------------------------------------------------------------- merges


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    group_size: int = 2,
    field: str = DEFAULT_FIELD,
) -> None:
    """Compaction: concatenate groups of ``group_size`` adjacent segments.

    Because segments hold disjoint, *ordered* docID ranges, merging posting
    lists is pure concatenation + re-encode (tail blocks of the left list
    and head blocks of the right are re-packed into full 128-doc blocks) —
    the ``SegmentMerger.java:113`` pipeline without the docID remap.  Global
    stats are unchanged by a merge but are refreshed anyway (cheap, metadata
    only).  The merged layout overwrites the segment partitions atomically
    via dynamic partition overwrite; the manifest records the merge lineage.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    plan = load_plan(index_dir)
    num_segments = plan["num_segments"]
    mapping = {i: (i // group_size) * group_size for i in range(num_segments)}

    blocks = spark.read.parquet(os.path.join(index_dir, "blocks"))
    postings = decode_blocks_to_postings(blocks)
    # segment remap is integer floor-division — pure column math, no UDF
    map_col = (F.col("segment").cast("int") / group_size).cast("int") * group_size
    remapped = postings.withColumn("segment", map_col)
    doclens = spark.read.parquet(os.path.join(index_dir, "doclens")).withColumn(
        "segment", map_col
    )
    # compaction applies buffered deletes physically (SegmentMerger drops
    # non-live docs; stats recomputed below become delete-aware)
    deletes = _load_deletes(spark, index_dir)
    if deletes is not None:
        deletes = deletes.persist()
        deletes.count()
        remapped = remapped.join(deletes, "doc_id", "left_anti")
        doclens = doclens.join(deletes, "doc_id", "left_anti")
    nb = resolve_term_buckets(index_dir, blocks)
    merged_blocks = build_block_postings(remapped, doclens)
    if nb:
        merged_blocks = merged_blocks.withColumn(
            "tbucket", term_bucket_col(F.col("term"), nb)
        )
        merged_blocks.write.mode("overwrite").partitionBy("segment", "tbucket").parquet(
            os.path.join(index_dir, "blocks_merged")
        )
    else:
        merged_blocks.write.mode("overwrite").partitionBy("segment").parquet(
            os.path.join(index_dir, "blocks_merged")
        )
    # merge-in-progress marker: the three table swaps below are not jointly
    # atomic; a crash in between leaves merged blocks with pre-merge doclens/
    # docmap.  The marker lets readers/check_index detect the torn state and
    # a re-run of merge_segments recover (the remap is idempotent).  On a
    # real lake this whole section is ONE Iceberg snapshot commit.
    marker = os.path.join(_manifest_dir(index_dir), "merge.inprogress")
    _write_json_atomic(marker, {"group_size": group_size, "ts": time.time()})
    # atomic-ish swap (directory rename; snapshot commit on a real lake)
    old, new = os.path.join(index_dir, "blocks"), os.path.join(index_dir, "blocks_merged")
    bak = os.path.join(index_dir, "blocks_premerge")
    os.replace(old, bak)
    os.replace(new, old)
    import shutil

    shutil.rmtree(bak)

    for df, name in ((doclens, "doclens"),):
        df.write.mode("overwrite").partitionBy("segment").parquet(
            os.path.join(index_dir, name + "_merged")
        )
        os.replace(os.path.join(index_dir, name), os.path.join(index_dir, name + "_pre"))
        os.replace(os.path.join(index_dir, name + "_merged"), os.path.join(index_dir, name))
        shutil.rmtree(os.path.join(index_dir, name + "_pre"))

    # positional table rides the merge unchanged except for the segment
    # remap + physical delete drop (positions are per-(term, doc) rows, not
    # block-packed — concatenation needs no re-encode; tbucket = hash(term)
    # is segment-independent and survives as-is)
    pos_path = os.path.join(index_dir, "positions")
    if os.path.isdir(pos_path):
        positions = spark.read.parquet(pos_path).withColumn("segment", map_col)
        if deletes is not None:
            positions = positions.join(deletes, "doc_id", "left_anti")
        part_cols = ["segment", "tbucket"] if nb else ["segment"]
        positions.write.mode("overwrite").partitionBy(*part_cols).parquet(
            pos_path + "_merged"
        )
        os.replace(pos_path, pos_path + "_pre")
        os.replace(pos_path + "_merged", pos_path)
        shutil.rmtree(pos_path + "_pre")

    docmap = spark.read.parquet(os.path.join(index_dir, "docmap")).withColumn(
        "segment", map_col
    )
    if deletes is not None:
        docmap = docmap.join(deletes, "doc_id", "left_anti")
    docmap.write.mode("overwrite").partitionBy("segment").parquet(
        os.path.join(index_dir, "docmap_merged")
    )
    os.replace(os.path.join(index_dir, "docmap"), os.path.join(index_dir, "docmap_pre"))
    os.replace(os.path.join(index_dir, "docmap_merged"), os.path.join(index_dir, "docmap"))
    shutil.rmtree(os.path.join(index_dir, "docmap_pre"))

    if deletes is not None:
        import shutil as _sh

        _sh.rmtree(os.path.join(index_dir, "deletes"))
        deletes.unpersist()

    plan["merge_history"] = plan.get("merge_history", []) + [
        {"group_size": group_size, "ts": time.time()}
    ]
    plan["term_buckets"] = nb
    plan["num_segments_live"] = len(set(mapping.values()))
    _write_json_atomic(os.path.join(_manifest_dir(index_dir), "plan.json"), plan)
    _refresh_global_stats(spark, index_dir, field)
    os.remove(marker)  # merge fully committed (incl. fresh stats)


def merge_in_progress(index_dir: str) -> dict | None:
    """Torn-merge detector: non-None means a merge started but did not reach
    its stats refresh — re-run :func:`merge_segments` to recover."""
    p = os.path.join(_manifest_dir(index_dir), "merge.inprogress")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


# ------------------------------------------------------------------ integrity


def check_index(idx: IndexTables) -> dict:
    """CheckIndex analog: structural invariants as DataFrame assertions.

    Returns a report dict; raises AssertionError on the first violation.
    """
    report = {}

    # 1. postings sorted & unique per (field, term): max(doc) count == doc_freq
    dup = (
        idx.postings.groupBy("field", "term", "doc_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0, f"{dup} duplicate (term, doc) postings"
    report["postings_unique"] = True

    # 2. freqs >= 1
    bad_freq = idx.postings.filter(F.col("freq") < 1).count()
    assert bad_freq == 0, f"{bad_freq} postings with freq < 1"
    report["freqs_positive"] = True

    # 3. docFreq == posting count per term.  Null-safe inequality: a full
    # outer join makes orphan rows (term on one side only) carry NULLs, and
    # a plain != would evaluate to NULL and silently drop exactly the
    # inconsistency this invariant exists to catch.
    mism = (
        idx.postings.groupBy("field", "term")
        .agg(F.count("*").alias("n"), F.sum("freq").alias("ttf"))
        .join(idx.termstats, ["field", "term"], "full")
        .filter(
            ~F.col("n").eqNullSafe(F.col("doc_freq"))
            | ~F.col("ttf").eqNullSafe(F.col("total_term_freq"))
        )
        .count()
    )
    assert mism == 0, f"{mism} terms with inconsistent stats"
    report["termstats_consistent"] = True

    # 4. doclens cover docmap exactly once per field
    n_docs = idx.docmap.count()
    n_lens = idx.doclens.select("doc_id").distinct().count()
    assert n_docs == n_lens, f"doclens {n_lens} != docmap {n_docs}"
    report["doclens_cover"] = True

    # 5. docmap ids dense & unique
    stats = idx.docmap.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    assert stats["n"] == stats["nd"], "duplicate doc_ids"
    # density is soft: applied deletes legitimately leave holes (docIDs stay
    # stable across merges — we never remap, unlike DocIDMerger)
    report["docids_dense"] = bool(
        stats["lo"] == 0 and stats["hi"] == stats["n"] - 1
    )

    if idx.blocks is not None:
        # 6. block invariants: ordered ranges, num_docs sum == doc_freq
        bad_rng = idx.blocks.filter(F.col("first_doc") > F.col("last_doc")).count()
        assert bad_rng == 0, "block with first_doc > last_doc"
        bsum = (
            idx.blocks.groupBy("field", "term")
            .agg(F.sum("num_docs").alias("n"))
            .join(idx.termstats, ["field", "term"])
            .filter(F.col("n") != F.col("doc_freq"))
            .count()
        )
        assert bsum == 0, "block num_docs sum != doc_freq"
        report["blocks_consistent"] = True

        # 7. bucketed layout: every block sits in hash(term) % B — a block in
        # the wrong bucket would be invisible to the pruned query scan
        # (silently missing hits, the worst failure mode of the layout)
        if idx.term_buckets and "tbucket" in idx.blocks.columns:
            misplaced = idx.blocks.filter(
                F.col("tbucket") != term_bucket_col(F.col("term"), idx.term_buckets)
            ).count()
            assert misplaced == 0, f"{misplaced} blocks outside their term bucket"
            report["term_buckets_consistent"] = True

    if idx.positions is not None:
        # 8. positional consistency (CheckIndex's term-vector/postings
        # cross-check analog): per (field, term, doc) the positions array
        # is strictly increasing and its length equals the posting freq —
        # null-safe full join so an orphan row on either side counts
        unsorted = idx.positions.filter(
            (F.expr("positions != array_sort(positions)"))
            | (F.expr("size(array_distinct(positions)) != size(positions)"))
        ).count()
        assert unsorted == 0, f"{unsorted} unsorted/duplicated position lists"
        pmism = (
            idx.positions.select(
                "field", "term", "doc_id", F.size("positions").alias("np")
            )
            .join(
                idx.postings.select("field", "term", "doc_id", "freq"),
                ["field", "term", "doc_id"],
                "full",
            )
            .filter(~F.col("np").eqNullSafe(F.col("freq")))
            .count()
        )
        assert pmism == 0, f"{pmism} (term, doc) rows with positions != freq"
        report["positions_consistent"] = True

        # 9. payload alignment (CheckIndex.checkPayloads analog): when the
        # index stores payloads, every row's payload array is exactly
        # position-aligned — a misalignment would silently shift which
        # occurrence a payload filter/score reads
        if "payloads" in idx.positions.columns:
            paymism = idx.positions.filter(
                F.col("payloads").isNull()
                | (F.size("payloads") != F.size("positions"))
            ).count()
            assert paymism == 0, f"{paymism} rows with payloads misaligned"
            report["payloads_aligned"] = True

        # 10. offset sanity (CheckIndex's checkPostings offset checks:
        # startOffset ≤ endOffset, non-decreasing in position order,
        # arrays position-aligned) — a violation would corrupt highlight
        # spans silently
        if "start_offsets" in idx.positions.columns:
            # element-level NULLs would make the comparisons below evaluate
            # to SQL NULL (and the filter silently DROP the corrupt row),
            # so null elements are a violation in their own right
            offbad = idx.positions.filter(
                F.col("start_offsets").isNull()
                | F.col("end_offsets").isNull()
                | (F.size("start_offsets") != F.size("positions"))
                | (F.size("end_offsets") != F.size("positions"))
                | F.expr("exists(start_offsets, x -> x IS NULL)")
                | F.expr("exists(end_offsets, x -> x IS NULL)")
                | F.expr(
                    "exists(zip_with(start_offsets, end_offsets,"
                    " (s, e) -> e < s), x -> x)"
                )
                | F.expr(
                    "start_offsets != array_sort(start_offsets)"
                )
            ).count()
            assert offbad == 0, f"{offbad} rows with inconsistent offsets"
            report["offsets_consistent"] = True

    report["n_docs"] = n_docs
    return report
