"""Vectorized posting-list codec: delta-gap + variable-byte, block-max metadata.

Plays the role of the reference's Lucene41 postings format
(/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene41/
Lucene41PostingsWriter.java: delta-gapped docIDs :281-287, FOR blocks :301,
position deltas :324, VInt tail :415-425) re-expressed for a columnar world:
postings are packed into Parquet BinaryType columns with numpy, and decoded
with cumsum inside Arrow-batched kernels.  Per-128-doc block metadata
(last docid + max tf) replaces the skip list (Lucene41SkipWriter.java:69) and
doubles as the block-max structure WAND needs (SURVEY.md §4.2).

All functions are vectorized: no per-value Python in the hot path.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # matches Lucene41PostingsFormat.BLOCK_SIZE (:388)


def vb_encode(values: np.ndarray) -> bytes:
    """Variable-byte encode a non-negative int array (vectorized)."""
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    nbytes = np.ones(a.size, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nbytes += v > 0
        v >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    work = a.copy()
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        idx = starts[sel] + k
        more = (nbytes[sel] > k + 1).astype(np.uint8)
        out[idx] = (work[sel] & np.uint64(0x7F)).astype(np.uint8) | (more << 7)
        work = work >> np.uint64(7)
    return out.tobytes()


def vb_encode_batch(values: np.ndarray, group_offsets: np.ndarray) -> list[bytes]:
    """Encode many groups in ONE vectorized pass: values is the concatenation
    of all groups; group_offsets (len n_groups+1) are value boundaries.
    Returns one bytes object per group.  Equivalent to
    [vb_encode(values[o[i]:o[i+1]]) for i] but with no per-group numpy work.
    """
    a = np.asarray(values, dtype=np.uint64)
    offs = np.asarray(group_offsets, dtype=np.int64)
    if a.size == 0:
        return [b""] * (offs.size - 1)
    nbytes = np.ones(a.size, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nbytes += v > 0
        v >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    work = a.copy()
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        idx = starts[sel] + k
        more = (nbytes[sel] > k + 1).astype(np.uint8)
        out[idx] = (work[sel] & np.uint64(0x7F)).astype(np.uint8) | (more << 7)
        work = work >> np.uint64(7)
    byte_off = np.zeros(a.size + 1, dtype=np.int64)
    byte_off[1:] = ends
    raw = out.tobytes()
    return [raw[byte_off[offs[i]] : byte_off[offs[i + 1]]] for i in range(offs.size - 1)]


def vb_decode(buf: bytes) -> np.ndarray:
    """Decode a variable-byte buffer back to uint64 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    n = int(is_last.sum())
    val_id = np.zeros(b.size, dtype=np.int64)
    val_id[1:] = np.cumsum(is_last[:-1])
    last_idx = np.nonzero(is_last)[0]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = last_idx[:-1] + 1
    offs = (np.arange(b.size, dtype=np.int64) - starts[val_id]).astype(np.uint64)
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, val_id, (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * offs))
    return vals


def vb_decode_concat(bufs: list) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY whole varbyte streams in ONE pass: (values, counts)
    where counts[i] is stream i's value count (= its terminator bytes) —
    the batched twin of vb_decode for per-row stream columns (verify)."""
    lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=len(bufs))
    if int(lens.sum()) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(lens.size, dtype=np.int64)
    buf = b"".join(bytes(x) for x in bufs)
    b = np.frombuffer(buf, dtype=np.uint8)
    vals = vb_decode(buf)
    is_last = ((b & 0x80) == 0).astype(np.int64)
    cum = np.zeros(b.size + 1, dtype=np.int64)
    np.cumsum(is_last, out=cum[1:])
    ends = np.cumsum(lens)
    counts = cum[ends] - cum[ends - lens]
    return vals, counts


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Strictly/weakly increasing ints -> first value + gaps (docDelta :281-287)."""
    a = np.asarray(sorted_values, dtype=np.int64)
    out = np.empty_like(a)
    if a.size:
        out[0] = a[0]
        out[1:] = np.diff(a)
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def pack_doc_ids(doc_ids: np.ndarray, codec=None) -> bytes:
    enc = codec.encode if codec is not None else vb_encode
    return enc(delta_encode(doc_ids).astype(np.uint64))


def unpack_doc_ids(buf: bytes, codec=None) -> np.ndarray:
    dec = codec.decode if codec is not None else vb_decode
    return delta_decode(dec(buf).astype(np.int64))


def pack_tfs(tfs: np.ndarray, codec=None) -> bytes:
    enc = codec.encode if codec is not None else vb_encode
    return enc(np.asarray(tfs, dtype=np.uint64))


def unpack_tfs(buf: bytes, codec=None) -> np.ndarray:
    dec = codec.decode if codec is not None else vb_decode
    return dec(buf).astype(np.int64)


def pack_positions(positions_per_doc: list[np.ndarray], codec=None) -> bytes:
    """Concatenated per-doc position deltas (posDelta :324); boundaries come
    from the tf stream (doc i contributes tf_i positions)."""
    if not positions_per_doc:
        return b""
    enc = codec.encode if codec is not None else vb_encode
    deltas = [delta_encode(np.asarray(p, dtype=np.int64)) for p in positions_per_doc]
    return enc(np.concatenate(deltas).astype(np.uint64))


def unpack_positions(buf: bytes, tfs: np.ndarray, codec=None) -> list[np.ndarray]:
    """Inverse of pack_positions given the tf stream."""
    dec = codec.decode if codec is not None else vb_decode
    flat = dec(buf).astype(np.int64)
    out: list[np.ndarray] = []
    off = 0
    for tf in np.asarray(tfs, dtype=np.int64):
        seg = flat[off : off + tf]
        out.append(np.cumsum(seg))
        off += int(tf)
    return out


def _segmented_cumsum(flat: np.ndarray, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc cumulative sums over a concatenated delta stream: returns
    (absolute values, doc_offsets)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    offsets = np.zeros(tfs.size + 1, dtype=np.int64)
    np.cumsum(tfs, out=offsets[1:])
    if flat.size:
        # segmented cumsum: global cumsum minus the running total at each start
        csum = np.cumsum(flat)
        seg_base = np.zeros(flat.size, dtype=np.int64)
        starts = offsets[:-1][tfs > 0]
        seg_base[starts[1:]] = csum[starts[1:] - 1]
        np.maximum.accumulate(seg_base, out=seg_base)
        flat = csum - seg_base
    return flat, offsets


def unpack_positions_flat(
    buf: bytes, tfs: np.ndarray, codec=None
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode to (flat_positions, doc_offsets) without a Python loop.

    flat_positions[doc_offsets[i]:doc_offsets[i+1]] are doc i's positions.
    """
    dec = codec.decode if codec is not None else vb_decode
    flat = dec(buf).astype(np.int64)
    return _segmented_cumsum(flat, tfs)


def pack_offsets(
    starts_per_doc: list[np.ndarray], ends_per_doc: list[np.ndarray], codec=None
) -> bytes:
    """OFFSETS posting stream (Lucene41PostingsWriter startOffset deltas +
    lengths, :324-339): per doc, interleaved (start_delta, length) pairs."""
    if not starts_per_doc:
        return b""
    enc = codec.encode if codec is not None else vb_encode
    parts = []
    for s, e in zip(starts_per_doc, ends_per_doc):
        s = np.asarray(s, dtype=np.int64)
        e = np.asarray(e, dtype=np.int64)
        inter = np.empty(2 * s.size, dtype=np.int64)
        inter[0::2] = delta_encode(s)
        inter[1::2] = e - s
        parts.append(inter)
    return enc(np.concatenate(parts).astype(np.uint64))


def unpack_offsets_flat(
    buf: bytes, tfs: np.ndarray, codec=None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (flat_starts, flat_ends, doc_offsets), aligned 1:1 with
    unpack_positions_flat's layout."""
    dec = codec.decode if codec is not None else vb_decode
    vals = dec(buf).astype(np.int64)
    sdel = vals[0::2]
    lens = vals[1::2]
    starts, offsets = _segmented_cumsum(sdel, tfs)
    return starts, starts + lens, offsets


def vb_nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value (vectorized) — the skip-data input."""
    a = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(a.size, dtype=np.int64)
    v = a >> np.uint64(7)
    while v.any():
        nbytes += v > 0
        v >>= np.uint64(7)
    return nbytes


def block_byte_starts(nbytes: np.ndarray, block: int = BLOCK_SIZE) -> np.ndarray:
    """Byte offset of each BLOCK_SIZE-value block start within the encoded
    buffer — the Lucene41SkipWriter skip-pointer analog: lets a reader seek
    straight to a block without decoding everything before it."""
    nb = np.asarray(nbytes, dtype=np.int64)
    if nb.size == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(nb)
    starts_idx = np.arange(0, nb.size, block)
    out = np.zeros(starts_idx.size, dtype=np.int64)
    out[1:] = ends[starts_idx[1:] - 1]
    return out


def decode_selected_blocks(
    buf: bytes, block_starts: np.ndarray, n_values: int, sel: np.ndarray,
    block: int = BLOCK_SIZE, codec=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ONLY the blocks where sel[i] is True.

    Returns (values, block_value_counts) where values is the concatenation
    of the selected blocks' decoded values (still deltas/raw — the
    caller reconstructs absolutes using the block-last skip metadata) and
    block_value_counts gives each selected block's value count.  Skipped
    blocks' bytes are never touched — the WAND skip path.  Works for any
    registry codec: block_starts were computed from that codec's nbytes at
    write time, and both codecs decode arbitrary block-aligned slices.
    """
    dec = codec.decode if codec is not None else vb_decode
    bs = np.asarray(block_starts, dtype=np.int64)
    sel = np.asarray(sel, dtype=bool)
    n_blocks = bs.size
    counts = np.full(n_blocks, block, dtype=np.int64)
    if n_blocks:
        counts[-1] = n_values - block * (n_blocks - 1)
    idx = np.nonzero(sel)[0]
    if idx.size == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    if idx.size == n_blocks:
        return dec(buf), counts
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = np.append(bs[1:], b.size)
    parts = [b[bs[i] : ends[i]] for i in idx]
    vals = dec(np.concatenate(parts).tobytes())
    return vals, counts[idx]


def block_meta(doc_ids: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """Per-BLOCK_SIZE-docs (last_doc_id, max_tf): the skip-list + block-max
    WAND structure.  Returned as two int32 binary columns."""
    d = np.asarray(doc_ids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    n_blocks = (d.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    last = np.empty(n_blocks, dtype=np.int64)
    mx = np.empty(n_blocks, dtype=np.int64)
    for i in range(n_blocks):
        sl = slice(i * BLOCK_SIZE, (i + 1) * BLOCK_SIZE)
        last[i] = d[sl][-1]
        mx[i] = t[sl].max()
    return last.astype(np.int64).tobytes(), mx.astype(np.int32).tobytes()


def decode_block_meta(last_buf: bytes, max_buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    return (
        np.frombuffer(last_buf, dtype=np.int64).copy(),
        np.frombuffer(max_buf, dtype=np.int32).copy(),
    )
