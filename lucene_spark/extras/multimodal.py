"""Multimodal columns: opaque binary payloads + typed metadata + feature UDFs.

The Spark-side plumbing for image/audio/video processing in a training-data
pipeline: payloads are ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the real libraries (PIL / torchaudio / ffmpeg) can
be dropped in without touching the distribution shape.

Decode / resize / frame-sample are REAL, two-tier:

* fast path — soft imports: PIL for images, PyAV for video containers
  (used automatically when installed; neither ships in this container),
* built-in fallback — a pure stdlib+numpy codec: PNG (8-bit gray / RGB /
  RGBA, non-interlaced, all five scanline filters; zlib is stdlib),
  binary PPM/PGM, and a trivial ``RAWV`` raw-frame video container — so
  the full decode → transform → re-encode path runs and is tested even
  with no media library present.  The fallback is row-loop Python, fine
  for tests and small batches; install PIL/PyAV for production corpora.

:func:`extract_features` keeps a **deterministic** feature vector
(normalized 16-bin byte histogram) so the schema, batching, partitioning
and downstream joins are oracle-checkable end-to-end.

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


try:  # soft import: the production image path
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # pragma: no cover - absent in this container
    _PILImage = None

try:  # soft import: the production video path
    import av as _av  # type: ignore
except ImportError:  # pragma: no cover - absent in this container
    _av = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # 8-bit gray / RGB / RGBA


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_encode(arr: np.ndarray) -> bytes:
    """8-bit gray/RGB/RGBA (H,W[,C]) → PNG bytes (filter 0, stdlib zlib)."""
    import struct
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_decode(data: bytes) -> np.ndarray:
    """PNG → uint8 (H,W,C).  8-bit gray/RGB/RGBA, non-interlaced; all five
    scanline filters (None/Sub/Up/Average/Paeth) unfiltered per spec."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise ValueError(
            f"built-in PNG decoder supports 8-bit gray/RGB/RGBA "
            f"non-interlaced only (depth={depth}, color={ctype}, "
            f"interlace={interlace}); install PIL for full coverage"
        )
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        else:  # Sub / Average / Paeth need the left neighbor: per-pixel scan
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter {f}")
                cur[i] = (row[i] + pred) & 0xFF
        out[y] = cur
        prev = cur.astype(np.int32)
    return out.reshape(h, w, ch)


def _ppm_decode(data: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 RGB, maxval ≤ 255) → uint8 (H,W,C)."""
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos] not in b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(x) for x in fields)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported; install PIL")
    ch = 3 if data[:2] == b"P6" else 1
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape(h, w, ch)


def decode_image(payload: bytes) -> np.ndarray:
    """Image payload → uint8 pixel array (H, W, C).

    PIL when installed (any format it knows); otherwise the built-in codec
    by magic bytes: PNG (8-bit, non-interlaced) and binary PPM/PGM.
    """
    payload = bytes(payload)
    if _PILImage is not None:  # pragma: no cover - PIL absent here
        import io

        arr = np.asarray(_PILImage.open(io.BytesIO(payload)))
        return arr[:, :, None] if arr.ndim == 2 else arr
    if payload[:8] == _PNG_SIG:
        return _png_decode(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _ppm_decode(payload)
    raise ValueError(
        f"unrecognized image payload (magic {payload[:4]!r}); the built-in "
        "decoder handles PNG and binary PPM/PGM — install PIL for others"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Decode → resize to (width, height) → re-encode as PNG.

    PIL uses its resampler; the fallback is deterministic nearest-neighbor
    (pixel-center mapping), the standard choice for training-data thumbnails
    where byte-stable output across runs matters more than smoothing.
    """
    if _PILImage is not None:  # pragma: no cover - PIL absent here
        import io

        img = _PILImage.open(io.BytesIO(bytes(payload)))
        buf = io.BytesIO()
        img.resize((width, height)).save(buf, format="PNG")
        return buf.getvalue()
    arr = decode_image(payload)
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(height) + 0.5) * h / height, h - 1).astype(int)
    cols = np.minimum((np.arange(width) + 0.5) * w / width, w - 1).astype(int)
    return _png_encode(arr[rows][:, cols])


RAWV_MAGIC = b"RAWV"


def pack_rawv(frames: np.ndarray) -> bytes:
    """(n, H, W, C) uint8 → the RAWV container: 16-byte header (magic,
    n:u32, h:u16, w:u16, c:u16, pad) + contiguous raw frames.  The test/
    bench vehicle for video plumbing when no container library exists."""
    import struct

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    return (
        RAWV_MAGIC
        + struct.pack(">IHHHxx", n, h, w, c)
        + frames.tobytes()
    )


def sample_frames(payload: bytes, every_n: int = 30) -> list[np.ndarray]:
    """Every ``every_n``-th frame of a video payload as uint8 arrays.

    PyAV when installed (real containers: mp4/mkv/...); otherwise the RAWV
    raw-frame container decodes with numpy alone.
    """
    payload = bytes(payload)
    if payload[:4] == RAWV_MAGIC:
        import struct

        n, h, w, c = struct.unpack(">IHHHxx", payload[4:16])
        frames = np.frombuffer(
            payload, dtype=np.uint8, count=n * h * w * c, offset=16
        ).reshape(n, h, w, c)
        return [frames[i] for i in range(0, n, every_n)]
    if _av is not None:  # pragma: no cover - PyAV absent here
        import io

        out = []
        with _av.open(io.BytesIO(payload)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                if i % every_n == 0:
                    out.append(frame.to_ndarray(format="rgb24"))
        return out
    raise ValueError(
        "unrecognized video payload; the built-in path handles the RAWV "
        "raw-frame container — install PyAV for real containers"
    )


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


def decode_summary(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, channels, mean_px) per decodable image payload
    via ``mapInPandas`` — the distributed decode stage (PIL or the built-in
    codec per executor batch).  Undecodable payloads are dropped with their
    doc_id reported under width = -1 so the pipeline is total.
    """
    schema = (
        "doc_id long, width int, height int, channels int, mean_px double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    arr = decode_image(bytes(payload))
                    rows.append(
                        (
                            int(did),
                            arr.shape[1],
                            arr.shape[0],
                            arr.shape[2],
                            float(arr.mean()),
                        )
                    )
                except Exception:  # noqa: BLE001 — totality over 100-TB
                    # corrupt payloads raise whatever the codec raises
                    # (zlib.error on a bad IDAT, IndexError on truncation,
                    # ValueError on unknown magic) — ONE bad blob must
                    # yield its report row, never kill the stage
                    rows.append((int(did), -1, -1, -1, 0.0))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "channels", "mean_px"],
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
