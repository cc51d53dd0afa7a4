"""Bit-exact reimplementation of Lucene's SmallFloat byte315 codec.

Reference semantics: /root/reference/lucene/core/src/java/org/apache/lucene/
util/SmallFloat.java:78-97 (floatToByte315 / byte315ToFloat).  Lucene stores
one quantized byte per document encoding ``boost / sqrt(doclen)``; BM25 then
decodes it through a 256-entry table (BM25Similarity.java:127-134).  Rank
identity with the reference REQUIRES this lossy quantization to be
reproduced exactly, so we operate on the raw float32 bit patterns with numpy.
"""

from __future__ import annotations

import numpy as np

_EXP_OFFSET = (63 - 15) << 3  # 384


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Vectorized floatToByte315: float32 -> uint8 (3 mantissa bits, zeroExp 15)."""
    f32 = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)  # arithmetic shift, like Java
    out = (smallfloat - _EXP_OFFSET).astype(np.int64)
    # underflow: values too small -> 0 if f <= 0 else 1
    under = smallfloat <= _EXP_OFFSET
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow -> 0xFF (-1 byte)
    out = np.where(smallfloat >= _EXP_OFFSET + 0x100, 0xFF, out)
    return (out & 0xFF).astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Vectorized byte315ToFloat: uint8 -> float32."""
    bu = np.atleast_1d(np.asarray(b, dtype=np.uint8)).astype(np.int32)
    bits = (bu << (24 - 3)) + ((63 - 15) << 24)
    out = bits.view(np.float32).copy()
    out[np.asarray(bu == 0)] = 0.0
    return out


# 256-entry decode table: NORM_TABLE[i] = 1 / byte315ToFloat(i)^2
# (BM25Similarity.java:127-134).  Index 0 decodes to inf in Lucene too
# (1/0^2); docs always have doclen >= 1 in practice so byte >= 1.
with np.errstate(divide="ignore"):
    _f = byte315_to_float(np.arange(256, dtype=np.uint8))
    NORM_TABLE = (np.float32(1.0) / (_f * _f)).astype(np.float32)


def encode_norm(doclen: np.ndarray | int, boost: float = 1.0) -> np.ndarray:
    """norm byte = floatToByte315(boost / sqrt(doclen)) (BM25Similarity.java:95-97)."""
    dl = np.asarray(doclen, dtype=np.float32)
    return float_to_byte315(np.float32(boost) / np.sqrt(dl, dtype=np.float32))


def decode_norm(norm_byte: np.ndarray | int) -> np.ndarray:
    """Decoded length-normalization factor 1/f^2 via the 256-entry table."""
    return NORM_TABLE[np.asarray(norm_byte, dtype=np.uint8)]
