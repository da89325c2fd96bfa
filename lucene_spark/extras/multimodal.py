"""Multimodal columns: opaque binary payloads + typed metadata + feature UDFs.

The Spark-side plumbing for image/audio/video processing in a training-data
pipeline: payloads are ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the real libraries (PIL / torchaudio / ffmpeg) can
be dropped in without touching the distribution shape.

This container has no media libraries, so:

* :func:`decode_image` / :func:`resize_image` / :func:`sample_frames` are
  STUBS — they raise ``NotImplementedError`` with the integration contract,
* :func:`extract_features` computes a **deterministic fake** feature vector
  (normalized 16-bin byte histogram) so the schema, batching, partitioning
  and downstream joins are real and tested end-to-end.

At 100 TB the payload column dominates I/O: keep payloads in their own
parquet column (Spark reads it only when selected — column pruning), size
``spark.sql.files.maxPartitionBytes`` for payload rows, and never collect
payloads to the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BINS = 16

MEDIA_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<format:string, n_bytes:long, source:string>"
)


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic media-shaped rows: payload = utf-8 bytes of the text.

    Stands in for reading real image/audio bytes; byte-identical across
    runs/engines so oracles can check the pipeline.
    """
    t = F.col(text_col)
    return df.select(
        "doc_id",
        F.encode(t, "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.octet_length(F.encode(t, "utf-8")).cast("long").alias("n_bytes"),
            F.lit("documents.text").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """STUB — real impl: ``PIL.Image.open(io.BytesIO(payload))``.

    Raises until an image library is available; ``extract_features`` uses
    the deterministic fake path instead.
    """
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in this container); "
        "wire the real decoder here — the mapInPandas plumbing in "
        "extract_features already batches payloads correctly"
    )


def resize_image(payload: bytes, width: int, height: int):
    """STUB — real impl: decode → ``img.resize((width, height))`` → re-encode."""
    raise NotImplementedError("resize requires an image library; see decode_image")


def sample_frames(payload: bytes, every_n: int = 30):
    """STUB — real impl: ffmpeg/pyav frame iterator, yielding every_n-th frame."""
    raise NotImplementedError("frame sampling requires ffmpeg/pyav; see decode_image")


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'embedding': L1-normalized 16-bin byte histogram."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(FEATURE_BINS, dtype=np.float64)
    hist = np.bincount(arr >> 4, minlength=FEATURE_BINS).astype(np.float64)
    return hist / hist.sum()


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """(doc_id, features array<double>[16], feat_norm) via mapInPandas.

    The real integration point: replace ``_fake_features`` with a model
    forward pass — the Arrow batch boundary, output schema and partitioning
    stay identical.
    """
    schema = "doc_id long, features array<double>, feat_norm double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "features": feats,
                    "feat_norm": [float(np.linalg.norm(f_)) for f_ in feats],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=schema)


def media_summary(media: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, payload_md5, format) — pure column ops, oracle-checkable."""
    return media.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("meta.format").alias("format"),
    )
