"""SmallFloat: lossy byte encodings for positive integers, Lucene-parity.

Semantics match the reference implementation at
``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167``
(``longToInt4`` / ``int4ToLong`` / ``intToByte4`` / ``byte4ToInt``):
a float-like 5-bit-exponent / 3-bit-mantissa code with an identity range
for small values, used to quantize per-document field lengths into the
one-byte "norm" consumed by BM25 length normalization.

Everything here is pure numpy / Python — no Spark imports — so it can run
inside Arrow UDFs and in the driver alike.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "int_to_byte4_np",
    "byte4_to_int_np",
    "LENGTH_TABLE",
]


def long_to_int4(i: int) -> int:
    """Float-like encoding for positive ints preserving order + 4 sig bits."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading 1 bit
    encoded |= (shift + 1) << 3  # shift 0 is reserved for subnormals
    return encoded


def int4_to_long(i: int) -> int:
    """Inverse of :func:`long_to_int4` (lossy: keeps top 4 bits)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24: values 0..23 encode exactly


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte value (0..255)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte value (0..255) encoded by int_to_byte4."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# 256-entry decode table: LENGTH_TABLE[norm_byte] = quantized doc length.
# Mirrors BM25Similarity's static LENGTH_TABLE (BM25Similarity.java:106-113)
# but kept as int64 here; BM25 casts to float32 at cache-build time.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)

# Vectorized encode: precompute the 2^31-safe encode via a searchsorted on
# the decode table boundaries.  int_to_byte4 is monotonic and byte4_to_int
# gives, for each code c, the smallest value mapping to a code >= c's bucket;
# encode(v) = number of table entries <= v minus 1 ... simpler and exact:
# encode(v) = searchsorted(LENGTH_TABLE, v, side="right") - 1 holds because
# int_to_byte4(byte4_to_int(c)) == c and the mapping is a step function that
# jumps exactly at each LENGTH_TABLE value.
_ENCODE_BOUNDARIES = LENGTH_TABLE


def int_to_byte4_np(values: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array -> uint8-valued int array."""
    v = np.asarray(values, dtype=np.int64)
    if v.size and v.min() < 0:
        raise ValueError("Only supports positive values")
    return (np.searchsorted(_ENCODE_BOUNDARIES, v, side="right") - 1).astype(np.int16)


def byte4_to_int_np(codes: np.ndarray) -> np.ndarray:
    """Vectorized byte4_to_int over an array of byte codes (0..255)."""
    return LENGTH_TABLE[np.asarray(codes, dtype=np.int64)]
