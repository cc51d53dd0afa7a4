"""Postings-format registry: named, pluggable int-stream codecs.

The reference's codec SPI (lucene/core/src/java/org/apache/lucene/codecs/
Codec.java:32 `Codec.forName`, PostingsFormat.java:42) lets an index declare
its postings format by NAME in the segment metadata and readers resolve the
implementation at open.  Here the segment manifest carries `"codec"` and
`get_codec(name)` is the forName analog; `build_segments(codec=...)` is the
writer-side selection.

A codec owns exactly the int-array <-> bytes primitives; every higher-level
stream transform (delta-gapping of doc ids and positions, segmented cumsum,
block-max metadata, skip offsets) is codec-agnostic and shared:

  encode(values: uint64[]) -> bytes
  encode_batch(values, group_offsets) -> list[bytes]   (one buf per group)
  decode(buf: bytes) -> uint64[]
  nbytes(values) -> int64[]     per-value encoded widths — the skip-data
                                input (block_byte_starts builds on it), so
                                ANY registered codec gets the WAND
                                block-skip path for free
  decode must accept any slice produced by cutting the buffer at
  nbytes-derived boundaries (both codecs here are self-delimiting per value)

Registered codecs:
  varbyte   variable-byte, the default (Lucene41-style VInt tail — see
            varbyte.py module docstring)
  plain32   fixed-width little-endian uint32 — trades space for pure-slice
            decode speed; values must fit 32 bits (delta-gapped doc ids,
            tfs, and position deltas do at any realistic segment size)
  for128    frame-of-reference bit-packed 128-value blocks (ForUtil.java:36,
            157-243) — 2-4x smaller streams than varbyte for dense postings;
            slices must be 128-value-block aligned (the only slicing the
            engine performs).  See forpack.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from . import varbyte as _vb


@dataclass(frozen=True)
class IntStreamCodec:
    name: str
    encode: Callable[[np.ndarray], bytes]
    encode_batch: Callable[[np.ndarray, np.ndarray], list]
    decode: Callable[[bytes], np.ndarray]
    nbytes: Callable[[np.ndarray], np.ndarray]
    # Per-value widths for a concatenation of streams (group_offsets are the
    # stream boundaries).  None means widths are position-independent and
    # nbytes(values) is already correct for any grouping (varbyte, plain32);
    # block codecs whose layout restarts per stream must supply it.
    nbytes_batch: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None
    # Batched decode of MANY whole streams: (values, per_stream_counts).
    # None -> decode_grouped falls back to one decode() call per stream.
    decode_concat: Callable[[list], tuple] | None = None


def nbytes_grouped(
    codec: IntStreamCodec, values: np.ndarray, group_offsets: np.ndarray
) -> np.ndarray:
    """Per-value encoded widths for values = concat of per-stream arrays."""
    if codec.nbytes_batch is not None:
        return codec.nbytes_batch(values, group_offsets)
    return codec.nbytes(values)


def decode_grouped(codec: IntStreamCodec, bufs: list) -> tuple[np.ndarray, np.ndarray]:
    """(values, per_stream_counts) for a LIST of whole streams — one
    vectorized pass when the codec supplies decode_concat, else a per-stream
    loop.  The per-call fixed decode cost is what the batched form removes
    (verify's postings check measured ~1 ms/row on per-row decode)."""
    if codec.decode_concat is not None:
        return codec.decode_concat(bufs)
    parts = [codec.decode(bytes(b)) for b in bufs]
    counts = np.fromiter((p.size for p in parts), dtype=np.int64, count=len(parts))
    vals = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )
    return vals, counts


# ------------------------------------------------------------------ plain32


def _p32_encode(values: np.ndarray) -> bytes:
    a = np.asarray(values, dtype=np.uint64)
    if a.size and int(a.max()) > 0xFFFFFFFF:
        raise ValueError("plain32 codec: value exceeds 32 bits")
    return a.astype("<u4").tobytes()


def _p32_encode_batch(values: np.ndarray, group_offsets: np.ndarray) -> list:
    raw = _p32_encode(values)
    offs = np.asarray(group_offsets, dtype=np.int64)
    return [raw[4 * offs[i] : 4 * offs[i + 1]] for i in range(offs.size - 1)]


def _p32_decode(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<u4").astype(np.uint64)


def _p32_nbytes(values: np.ndarray) -> np.ndarray:
    return np.full(np.asarray(values).size, 4, dtype=np.int64)


def _p32_decode_concat(bufs: list) -> tuple[np.ndarray, np.ndarray]:
    lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=len(bufs))
    vals = np.frombuffer(b"".join(bytes(x) for x in bufs), dtype="<u4").astype(
        np.uint64
    )
    return vals, lens // 4


VARBYTE = IntStreamCodec(
    name="varbyte",
    encode=_vb.vb_encode,
    encode_batch=_vb.vb_encode_batch,
    decode=_vb.vb_decode,
    nbytes=_vb.vb_nbytes,
    decode_concat=_vb.vb_decode_concat,
)

PLAIN32 = IntStreamCodec(
    name="plain32",
    encode=_p32_encode,
    encode_batch=_p32_encode_batch,
    decode=_p32_decode,
    nbytes=_p32_nbytes,
    decode_concat=_p32_decode_concat,
)

from . import forpack as _for  # noqa: E402

FOR128 = IntStreamCodec(
    name="for128",
    encode=_for.for_encode,
    encode_batch=_for.for_encode_batch,
    decode=_for.for_decode,
    nbytes=_for.for_nbytes,
    nbytes_batch=_for.for_nbytes_batch,
    decode_concat=_for.for_decode_concat,
)

CODECS: dict[str, IntStreamCodec] = {c.name: c for c in (VARBYTE, PLAIN32, FOR128)}


def register_codec(codec: IntStreamCodec) -> None:
    """SPI registration point (PostingsFormat.java:42 NamedSPILoader role)."""
    CODECS[codec.name] = codec


def get_codec(name: str) -> IntStreamCodec:
    """Codec.forName (Codec.java:94): resolve by the name stored in the
    segment manifest; unknown names fail loudly at open, not at decode."""
    try:
        return CODECS[name]
    except KeyError:
        raise ValueError(
            f"unknown postings codec {name!r}; registered: {sorted(CODECS)}"
        ) from None
