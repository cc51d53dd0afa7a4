"""for128: frame-of-reference bit-packed 128-value block codec.

The reference's answer to postings decode bandwidth is FOR packing:
Lucene41 encodes each 128-int block at the block's max bit width
(/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene41/
ForUtil.java:36 BLOCK_SIZE alignment, :157-243 writeBlock/readBlock — one
numBits header byte then packed ints; Lucene41PostingsWriter.java:281-301
delta-gapped doc ids in FOR blocks, :415-425 VInt tail).  A stop-word
posting list whose gaps fit 3 bits reads ~3/8 byte per posting instead of
varbyte's 1-byte floor — 2-4x less stream traffic, which is exactly the
memory-bandwidth pin the round-5 batch-retrieval scaling diagnosis found.

Stream layout (self-delimiting per block, so concatenations of whole
streams decode in one pass — the batched WAND kernel requirement):

    block := width:byte count:byte packed[ceil(count*width/8)]
    width in 0..64; count stores n & 0x7F with 0 meaning 128 (full block);
    the only block allowed a count < 128 is a stream's last (the VInt-tail
    analog, here packed like any block — simpler and still byte-aligned).

Bit order is little-endian within the block's packed bytes (value j
occupies bits [j*w, (j+1)*w)), matching numpy's bitorder="little" so
pack/unpack are single np.packbits/np.unpackbits calls — no per-value
Python anywhere.  Vectorization strategy: blocks are grouped BY WIDTH
across the whole call (including across groups in encode_batch), each
width class packed/unpacked as one (n_blocks, 128, w) tensor op.

Registry contract (codecs/registry.py): per-value nbytes carries each
block's total byte cost on the block's first value (0 elsewhere), so
block_byte_starts — which only reads the cumsum at 128-value boundaries —
yields exact block seek offsets for the WAND selective-decode path.
for128 buffers may only be sliced at those block boundaries; that is the
only way the engine slices postings (decode_selected_blocks).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128


def _bit_widths(values: np.ndarray) -> np.ndarray:
    """Exact bit_length per value, vectorized (uint64-safe).

    ceil(log2(v+1)) == bit_length(v); float64 log2 is exact-safe only
    below 2^32 (relative spacing >= 3.4e-10 vs ulp 3.6e-15 at 32), so
    values >= 2^32 recurse on their high word."""
    a = np.asarray(values, dtype=np.uint64)
    out = np.zeros(a.size, dtype=np.int64)
    lo = a < np.uint64(1 << 32)
    if lo.any():
        v = a[lo].astype(np.float64)
        out[lo] = np.ceil(np.log2(v + 1.0)).astype(np.int64)
    hi = ~lo
    if hi.any():
        h = (a[hi] >> np.uint64(32)).astype(np.float64)
        out[hi] = 32 + np.ceil(np.log2(h + 1.0)).astype(np.int64)
    return out


def _pack_width(vals2d: np.ndarray, w: int) -> np.ndarray:
    """(k, c) uint64 -> (k, ceil(c*w/8)) uint8, little-endian bit order.

    No per-bit Python loop: explode the value bytes to a bit tensor with
    ONE np.unpackbits, slice each value's low w bits, re-pack with ONE
    np.packbits (both SIMD C kernels)."""
    k, c = vals2d.shape
    if w == 0:
        return np.empty((k, 0), dtype=np.uint8)
    byts = np.ascontiguousarray(vals2d.astype("<u8")).view(np.uint8)
    bits = np.unpackbits(byts.reshape(k, c * 8), axis=1, bitorder="little")
    bits = bits.reshape(k, c, 64)[:, :, :w]
    return np.packbits(
        np.ascontiguousarray(bits).reshape(k, c * w), axis=1, bitorder="little"
    )


def _unpack_width_bits(packed2d: np.ndarray, w: int, c: int) -> np.ndarray:
    """Bit-tensor fallback for w > 56: unpack to bits, zero-pad each value
    to a whole power-of-two lane, pack back and view as that width."""
    k = packed2d.shape[0]
    lane = 8 if w <= 8 else 16 if w <= 16 else 32 if w <= 32 else 64
    dt = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}[lane]
    bits = np.unpackbits(packed2d, axis=1, bitorder="little", count=c * w)
    padded = np.zeros((k, c, lane), dtype=np.uint8)
    padded[:, :, :w] = bits.reshape(k, c, w)
    out = np.packbits(padded.reshape(k, c * lane), axis=1, bitorder="little")
    return out.view(dt).reshape(k, c).astype(np.uint64)


def _unpack_width_small(packed2d: np.ndarray, w: int, c: int) -> np.ndarray:
    """Shift-based unpack for w <= 8 — the high-volume widths (dense doc-id
    gaps, tfs, position deltas).  Every 8 consecutive values occupy exactly
    w bytes; one group zero-pads to a u64, then 8 vectorized shift+mask ops
    yield all values — ~1 u64 op per value, no 8-byte-per-value gather
    window (8-21x less intermediate traffic at small widths)."""
    k = packed2d.shape[0]
    g = (c + 7) >> 3  # value groups of 8
    need = g * w
    if packed2d.shape[1] < need:  # short last block: bit-count < group pad
        tmp = np.zeros((k, need), dtype=np.uint8)
        tmp[:, : packed2d.shape[1]] = packed2d
        packed2d = tmp
    padded = np.zeros((k, g, 8), dtype=np.uint8)
    padded[:, :, :w] = packed2d[:, :need].reshape(k, g, w)
    words = padded.reshape(k, g * 8).view("<u8").reshape(k, g)
    out = np.empty((k, g, 8), dtype=np.uint64)
    mask = np.uint64((1 << w) - 1)
    for j in range(8):
        out[:, :, j] = (words >> np.uint64(j * w)) & mask
    return np.ascontiguousarray(out.reshape(k, g * 8)[:, :c])


def _unpack_width(packed2d: np.ndarray, w: int, c: int) -> np.ndarray:
    """(k, ceil(c*w/8)) uint8 -> (k, c) uint64 — inverse of _pack_width.

    w <= 8: shift-based group unpack (see _unpack_width_small).
    8 < w <= 56 (every realistic postings stream): gather an 8-byte
    little-endian window at each value's byte offset, view as u64, shift by
    the in-byte bit offset, mask to w bits — three SIMD-friendly ops, no
    bit-tensor blow-up (the decode side is the memory-bandwidth pin the
    round-5 batch-scaling diagnosis found, so intermediates matter).
    Value j starts at bit j*w; since bit_off <= 7, bit_off + w <= 63 < 64
    keeps the whole value inside one window.  w > 56 (never produced by
    delta-gapped ids/tfs/positions, but legal uint64 input) falls back to
    the exact bit-tensor path."""
    k = packed2d.shape[0]
    if w == 0:
        return np.zeros((k, c), dtype=np.uint64)
    if w <= 8:
        return _unpack_width_small(packed2d, w, c)
    if w > 56:
        return _unpack_width_bits(packed2d, w, c)
    byte_off = (np.arange(c, dtype=np.int64) * w) >> 3
    bit_off = ((np.arange(c, dtype=np.int64) * w) & 7).astype(np.uint64)
    pb = packed2d.shape[1]
    padded = np.zeros((k, pb + 8), dtype=np.uint8)
    padded[:, :pb] = packed2d
    win = padded[:, byte_off[:, None] + np.arange(8, dtype=np.int64)[None, :]]
    vals = np.ascontiguousarray(win).reshape(k, c * 8).view("<u8").reshape(k, c)
    mask = np.uint64((1 << w) - 1)
    return (vals >> bit_off[None, :]) & mask


def _block_layout(group_offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-group block segmentation -> (block_starts, block_counts) into the
    flat value array, blocks of BLOCK values with a short last block per
    group.  Fully vectorized."""
    offs = np.asarray(group_offsets, dtype=np.int64)
    sizes = np.diff(offs)
    nblk = (sizes + BLOCK - 1) // BLOCK  # 0 for empty groups
    total = int(nblk.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # group id of each block
    gid = np.repeat(np.arange(sizes.size, dtype=np.int64), nblk)
    cs = np.cumsum(nblk)
    # local block ordinal: arange minus start-of-group block ordinal
    blk_ord = np.arange(total, dtype=np.int64)
    grp_blk0 = np.concatenate(([0], cs[:-1]))
    local = blk_ord - grp_blk0[gid]
    starts = offs[gid] + local * BLOCK
    ends = np.minimum(starts + BLOCK, offs[gid + 1])
    return starts, ends - starts


def _encode_blocks(
    a: np.ndarray, starts: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Encode blocks (defined by starts/counts into flat array `a`) ->
    (flat_bytes, per_block_nbytes).  Blocks are grouped by (width, count
    class) and packed in one tensor op per class."""
    n_blocks = starts.size
    if n_blocks == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # per-block max width: segmented max via reduceat on the width array
    widths_per_val = _bit_widths(a)
    # reduceat needs contiguous segments: blocks ARE contiguous runs but
    # group boundaries can leave gaps only when offsets skip values — they
    # never do (group_offsets tile the array).  starts is sorted.
    bw = np.maximum.reduceat(widths_per_val, starts) if a.size else np.zeros(
        n_blocks, dtype=np.int64
    )
    # reduceat quirk: a start index equal to a.size is invalid; cannot
    # happen here because every block has count >= 1.
    block_bytes = 2 + ((counts * bw + 7) >> 3)
    out_ends = np.cumsum(block_bytes)
    out = np.zeros(int(out_ends[-1]), dtype=np.uint8)
    out_starts = out_ends - block_bytes
    out[out_starts] = bw.astype(np.uint8)
    out[out_starts + 1] = (counts & 0x7F).astype(np.uint8)
    full = counts == BLOCK
    for w in np.unique(bw):
        w = int(w)
        pb = (BLOCK * w + 7) >> 3
        # full blocks of this width: one (k, BLOCK) gather + one pack
        sel = full & (bw == w)
        if sel.any() and w > 0:
            s = starts[sel]
            vals = a[(s[:, None] + np.arange(BLOCK)[None, :]).reshape(-1)]
            packed = _pack_width(vals.reshape(-1, BLOCK).astype(np.uint64), w)
            dst = (out_starts[sel][:, None] + 2 + np.arange(pb)[None, :]).reshape(-1)
            out[dst] = packed.reshape(-1)
        # short blocks (group tails): group by count so each (w, c) class
        # is still a single tensor op; per call there are at most
        # n_groups short blocks total
        sh = (~full) & (bw == w)
        if sh.any() and w > 0:
            for c in np.unique(counts[sh]):
                c = int(c)
                csel = sh & (counts == c)
                s = starts[csel]
                vals = a[(s[:, None] + np.arange(c)[None, :]).reshape(-1)]
                packed = _pack_width(vals.reshape(-1, c).astype(np.uint64), w)
                cb = (c * w + 7) >> 3
                dst = (out_starts[csel][:, None] + 2 + np.arange(cb)[None, :]).reshape(-1)
                out[dst] = packed.reshape(-1)
    return out, block_bytes


def for_encode(values: np.ndarray) -> bytes:
    a = np.asarray(values, dtype=np.uint64)
    if a.size == 0:
        return b""
    starts, counts = _block_layout(np.array([0, a.size], dtype=np.int64))
    out, _ = _encode_blocks(a, starts, counts)
    return out.tobytes()


def for_encode_batch(values: np.ndarray, group_offsets: np.ndarray) -> list[bytes]:
    """One buffer per group; all groups' blocks packed in shared per-width
    tensor ops (no per-group numpy work beyond the final byte slicing)."""
    a = np.asarray(values, dtype=np.uint64)
    offs = np.asarray(group_offsets, dtype=np.int64)
    n_groups = offs.size - 1
    if a.size == 0:
        return [b""] * n_groups
    starts, counts = _block_layout(offs)
    out, block_bytes = _encode_blocks(a, starts, counts)
    raw = out.tobytes()
    # per-group byte extents: blocks are emitted in group order
    sizes = np.diff(offs)
    nblk = (sizes + BLOCK - 1) // BLOCK
    blk_ends = np.cumsum(block_bytes) if block_bytes.size else np.zeros(0, np.int64)
    grp_last_blk = np.cumsum(nblk) - 1  # -1 for empty groups handled below
    grp_end = np.where(nblk > 0, blk_ends[np.maximum(grp_last_blk, 0)], 0)
    np.maximum.accumulate(grp_end, out=grp_end)  # empty groups inherit prev end
    grp_start = np.concatenate(([0], grp_end[:-1]))
    return [raw[grp_start[i] : grp_end[i]] for i in range(n_groups)]


def _walk_headers(buf: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Sequential header walk over a concatenation of whole for128 streams:
    (bytes_view, header_offsets, widths, counts) — the only per-block Python
    in the decode path (data-dependent offsets; Python-bytes indexing is
    ~3x numpy scalar indexing here)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    bb = buf if isinstance(buf, bytes) else bytes(buf)
    hdr_off: list[int] = []
    widths: list[int] = []
    counts: list[int] = []
    pos = 0
    n = b.size
    while pos < n:
        if pos + 2 > n:
            raise ValueError("for128: truncated or misaligned stream")
        w = bb[pos]
        c = bb[pos + 1] or BLOCK
        hdr_off.append(pos)
        widths.append(w)
        counts.append(c)
        pos += 2 + ((c * w + 7) >> 3)
    if pos != n:
        raise ValueError("for128: truncated or misaligned stream")
    return (
        b,
        np.asarray(hdr_off, dtype=np.int64),
        np.asarray(widths, dtype=np.int64),
        np.asarray(counts, dtype=np.int64),
    )


def for_decode(buf: bytes) -> np.ndarray:
    """Decode a concatenation of whole for128 streams (each block
    self-delimiting).  Header walk is a thin Python loop over BLOCKS
    (n/128 iterations); all value work is per-width tensor ops."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    b, off, bw, cnt = _walk_headers(buf)
    return _unpack_blocks(b, off, bw, cnt)


def _unpack_blocks(
    b: np.ndarray, off: np.ndarray, bw: np.ndarray, cnt: np.ndarray
) -> np.ndarray:
    out_ends = np.cumsum(cnt)
    out = np.zeros(int(out_ends[-1]), dtype=np.uint64)
    out_starts = out_ends - cnt
    full = cnt == BLOCK
    for w in np.unique(bw):
        w = int(w)
        if w == 0:
            continue  # zeros already in place
        pb = (BLOCK * w + 7) >> 3
        sel = full & (bw == w)
        if sel.any():
            src = (off[sel][:, None] + 2 + np.arange(pb)[None, :]).reshape(-1)
            vals = _unpack_width(b[src].reshape(-1, pb), w, BLOCK)
            dst = (out_starts[sel][:, None] + np.arange(BLOCK)[None, :]).reshape(-1)
            out[dst] = vals.reshape(-1)
        sh = (~full) & (bw == w)
        if sh.any():
            for c in np.unique(cnt[sh]):
                c = int(c)
                cb = (c * w + 7) >> 3
                csel = sh & (cnt == c)
                src = (off[csel][:, None] + 2 + np.arange(cb)[None, :]).reshape(-1)
                vals = _unpack_width(b[src].reshape(-1, cb), w, c)
                dst = (out_starts[csel][:, None] + np.arange(c)[None, :]).reshape(-1)
                out[dst] = vals.reshape(-1)
    return out


def for_decode_concat(bufs: list) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY whole for128 streams in ONE pass: (values, counts) where
    counts[i] is stream i's decoded value count (empty streams count 0).

    One header walk + one width-class unpack over the concatenation instead
    of a per-stream for_decode call — the per-call fixed cost (~0.1-0.3 ms:
    walk setup, np.unique over widths, per-class dispatch) dominates when
    streams are short, which is exactly the verify/check shape (one stream
    per posting row).  Blocks never span streams, so each block's header
    offset maps it to its owning stream."""
    lens = np.fromiter((len(x) for x in bufs), dtype=np.int64, count=len(bufs))
    if int(lens.sum()) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(lens.size, dtype=np.int64)
    buf = b"".join(bytes(x) for x in bufs)
    b, off, bw, cnt = _walk_headers(buf)
    vals = _unpack_blocks(b, off, bw, cnt)
    ends = np.cumsum(lens)
    # block at header offset o belongs to the first stream whose end > o
    blk_stream = np.searchsorted(ends, off, side="right")
    counts = np.zeros(lens.size, dtype=np.int64)
    np.add.at(counts, blk_stream, cnt)
    return vals, counts


def for_nbytes(values: np.ndarray) -> np.ndarray:
    """Per-value byte widths whose 128-boundary cumsum equals the block
    byte offsets: each block's full cost (2 + packed) lands on its first
    value, 0 on the rest — block_byte_starts only ever reads the cumsum at
    block boundaries (codecs/varbyte.py block_byte_starts)."""
    a = np.asarray(values, dtype=np.uint64)
    return for_nbytes_batch(a, np.array([0, a.size], dtype=np.int64))


def for_nbytes_batch(values: np.ndarray, group_offsets: np.ndarray) -> np.ndarray:
    """Per-value widths for a CONCATENATION of streams: block layout (and
    therefore where each block's cost lands) restarts at every group
    boundary, exactly as encode_batch lays the bytes out.  Required
    whenever nbytes feeds per-stream skip offsets over a multi-term
    concatenation (index/segment.py _invert_occurrences) — the position-
    independent codecs (varbyte, plain32) don't need the distinction, a
    block codec does."""
    a = np.asarray(values, dtype=np.uint64)
    out = np.zeros(a.size, dtype=np.int64)
    if a.size == 0:
        return out
    starts, counts = _block_layout(np.asarray(group_offsets, dtype=np.int64))
    if starts.size == 0:
        return out
    bw = np.maximum.reduceat(_bit_widths(a), starts)
    out[starts] = 2 + ((counts * bw + 7) >> 3)
    return out
