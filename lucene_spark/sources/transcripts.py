"""Deterministic synthetic multi-turn transcripts (the engine's input table).

Shape pinned by the FIXTURES.md §1 contract:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``.

Two generators:

* :func:`synth_transcripts` — fully synthetic, Zipf vocabulary so hot terms
  exist (skew path), deterministic per (seed, conv index); generated
  *distributedly* via ``mapInPandas`` over ``spark.range`` so it scales with
  partitions (no driver-side materialization).
* :func:`transcripts_from_documents` — derives a transcripts table from the
  driver-provided ``documents.parquet`` (deterministic split of each document
  into turns), used by the benchmark so it scales with the sf directory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "python", "browser", "calculator", "none"]

# ~120-word base vocabulary; Zipf sampling makes the head extremely hot
# ("the"-like skew) while the tail stays rare.  Deterministic.
_VOCAB = (
    "the of and to a in is it you that he was for on are with as i his they be "
    "at one have this from or had by hot word but what some we can out other were "
    "all there when up use your how said an each she which do their time if will "
    "way about many then them write would like so these her long make thing see "
    "him two has look more day could go come did number sound no most people my "
    "over know water than call first who may down side been now find spark index "
    "query token search score merge segment posting shard vector rank batch "
    "stream filter join sort hash scan table column row partition shuffle"
).split()


def _conv_rows(conv_index: int, seed: int, avg_turns: int) -> list[tuple]:
    rng = np.random.default_rng(np.random.PCG64(seed * 1_000_003 + conv_index))
    n_turns = int(rng.integers(2, avg_turns * 2))
    vocab_idx = rng.zipf(1.3, size=n_turns * 24) % len(_VOCAB)
    conv_id = f"conv-{conv_index:08d}"
    base_ts = np.datetime64("2026-01-01T00:00:00") + np.timedelta64(
        int(conv_index) % 86_400, "s"
    )
    rows = []
    pos = 0
    for t in range(n_turns):
        n_words = int(rng.integers(3, 40))
        words = [_VOCAB[i] for i in vocab_idx[pos : pos + n_words]]
        pos += n_words
        # sprinkle analyzer edge cases deterministically
        r = (conv_index * 31 + t) % 97
        if r == 0:
            words.append("O'Reilly")
        elif r == 1:
            words.append("3.5")
        elif r == 2:
            words.append("MixedCase")
        elif r == 3:
            words.append("x" * 256)  # maxTokenLength skip rule
        role = _ROLES[t % 3]
        tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
        ts = base_ts + np.timedelta64(t * 37, "s")
        rows.append((conv_id, t, role, " ".join(words), tool, pd.Timestamp(ts)))
    return rows


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    avg_turns: int = 8,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts table (~n_convs * avg_turns rows)."""
    parts = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_convs, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_index in pdf["id"].to_numpy():
                out.extend(_conv_rows(int(conv_index), seed, avg_turns))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, words_per_turn: int = 12
) -> DataFrame:
    """Deterministically reshape documents.parquet into transcript turns.

    Each document becomes one conversation; its text is split into
    ``words_per_turn``-word turns.  Pure DataFrame ops (split + slice +
    posexplode) — no Python UDF — so it is as scalable as the scan itself.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    n_turns = F.greatest(
        F.lit(1), F.ceil(F.size(words) / F.lit(words_per_turn)).cast("int")
    )
    turns = (
        docs.select(
            F.format_string("conv-%08d", F.col("doc_id")).alias("conv_id"),
            F.col("doc_id"),
            words.alias("words"),
            F.posexplode(F.sequence(F.lit(0), n_turns - 1)).alias("pos", "turn_idx"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.element_at(F.array(*[F.lit(r) for r in _ROLES]), (F.col("turn_idx") % 3) + 1).alias("role"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("words"),
                    F.col("turn_idx") * words_per_turn + 1,
                    words_per_turn,
                ),
            ).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (
                F.lit("2026-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.col("doc_id") * 100 + F.col("turn_idx"))
            ).alias("ts"),
        )
    )
    return turns
