"""Bloom-filtered term dictionary sidecar (BloomFilteringPostingsFormat role).

Reference: lucene/codecs/src/java/org/apache/lucene/codecs/bloom/
FuzzySet.java:50 (single-hash bitset sized for ~10% saturation, folded
down to the smallest power-of-two that keeps saturation acceptable,
MurmurHash2 64-bit) and BloomFilteringPostingsFormat.java:63 (per-segment
per-field filter consulted before the real terms dictionary; a negative
is definitive, a positive falls through).

Spark mapping: one bloom row per SEGMENT (seg, nbits, bits) in a
`blooms/` parquet sidecar.  The searcher loads them once (kilobytes per
segment — bounded driver memory even at 10^4 segments) and prunes the
postings scan to the segments whose filter MAY contain a query term:
a miss term schedules ZERO tasks, and a rare term reads only its
segments.  False positives only cost a pruned-scan fallthrough.
"""

from __future__ import annotations

import numpy as np

# target ~10 bits per distinct term (DefaultBloomFilterFactory's 10%
# saturation with one hash), clamped to [2^10, 2^26] bits
MIN_BITS = 1 << 10
MAX_BITS = 1 << 26

# batched-hash rectangle width in bytes; longer terms (rare in a term
# dictionary) hash via the scalar loop
_RECT_WIDTH = 64


def murmurhash64(data: bytes, seed: int = 0xE17A1465) -> int:
    """MurmurHash64A (public domain algorithm, the FuzzySet hash role)."""
    m = 0xC6A4A7935BD1E995
    mask = (1 << 64) - 1
    h = (seed ^ (len(data) * m)) & mask
    n8 = len(data) & ~7
    for i in range(0, n8, 8):
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * m) & mask
        k ^= k >> 47
        k = (k * m) & mask
        h ^= k
        h = (h * m) & mask
    tail = data[n8:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & mask
    h ^= h >> 47
    h = (h * m) & mask
    h ^= h >> 47
    return h


def murmurhash64_batch(terms, seed: int = 0xE17A1465) -> np.ndarray:
    """MurmurHash64A over MANY strings at once -> uint64[n].

    The per-term Python loop made a million-term segment build pay ~10^7
    interpreted iterations; here the hash state advances for ALL terms in
    lockstep over 8-byte block levels (term dictionaries are short — the
    level loop runs ceil(maxlen/8) times), with per-level masks for terms
    that have already ended.  Bit-exact vs `murmurhash64` (pinned by
    tests/test_bloom.py::test_batch_hash_equals_scalar)."""
    enc = [t.encode("utf-8") for t in terms]
    n = len(enc)
    m = np.uint64(0xC6A4A7935BD1E995)
    s47 = np.uint64(47)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    h = np.uint64(seed) ^ (lens.astype(np.uint64) * m)
    if n == 0:
        return h
    # terms longer than the rectangle width (rare in a term dictionary)
    # fall back to the scalar hash (assigned AFTER finalization below —
    # murmurhash64 returns a finalized value); the rest mix in lockstep
    long_i = np.flatnonzero(lens > _RECT_WIDTH)
    short = np.flatnonzero(lens <= _RECT_WIDTH)
    if short.size == 0:
        for i in long_i:
            h[i] = murmurhash64(enc[int(i)], seed)
        return h
    slens = lens[short]
    width = max(8, (int(slens.max()) + 7) & ~7)
    # zero-padded rectangle: one scatter of all term bytes, then uint64
    # little-endian column views give each 8-byte mix block directly
    buf = np.frombuffer(
        b"".join(enc[int(i)] for i in short) if long_i.size else b"".join(enc),
        dtype=np.uint8,
    )
    total = int(slens.sum())
    cum = np.cumsum(slens) - slens
    within = np.arange(total, dtype=np.int64) - np.repeat(cum, slens)
    rect = np.zeros(short.size * width, dtype=np.uint8)
    rect[np.repeat(np.arange(short.size, dtype=np.int64) * width, slens) + within] = buf
    blocks = rect.view("<u8").reshape(short.size, width >> 3)
    hs = h[short]
    nblocks = slens >> 3
    tails = slens & 7
    for j in range(width >> 3):
        act = nblocks > j
        if not act.any():
            break
        k = blocks[:, j].copy()
        k *= m
        k ^= k >> s47
        k *= m
        hs = np.where(act, (hs ^ k) * m, hs)
    has_tail = tails > 0
    if has_tail.any():
        t = blocks[
            np.arange(short.size), np.minimum(nblocks, (width >> 3) - 1)
        ]
        t &= (np.uint64(1) << (np.uint64(8) * tails.astype(np.uint64))) - np.uint64(1)
        hs = np.where(has_tail, (hs ^ t) * m, hs)
    h[short] = hs
    h ^= h >> s47
    h *= m
    h ^= h >> s47
    for i in long_i:
        h[i] = murmurhash64(enc[int(i)], seed)
    return h


def _size_for(n_terms: int) -> int:
    bits = MIN_BITS
    while bits < MAX_BITS and bits < 10 * max(n_terms, 1):
        bits <<= 1
    return bits


def build_bloom(terms, n_terms_hint: int | None = None) -> tuple[int, bytes]:
    """-> (nbits, packed bitset).  One hash per term (FuzzySet hashCount=1);
    nbits is a power of two so membership is hash & (nbits-1).  Hashing is
    numpy-batched; duplicate bit positions OR via bitwise_or.at."""
    terms = list(terms)
    nbits = _size_for(n_terms_hint if n_terms_hint is not None else len(terms))
    bits = np.zeros(nbits >> 3, dtype=np.uint8)
    if terms:
        h = (murmurhash64_batch(terms) & np.uint64(nbits - 1)).astype(np.int64)
        np.bitwise_or.at(
            bits, h >> 3, (np.uint8(1) << (h & 7).astype(np.uint8))
        )
    return nbits, bits.tobytes()


def fold_bloom(nbits: int, bits: bytes, max_saturation: float = 0.5) -> tuple[int, bytes]:
    """FuzzySet.downsize role: OR the two halves while saturation stays
    under `max_saturation` — merged segments keep small filters."""
    arr = np.frombuffer(bits, dtype=np.uint8).copy()
    while nbits > MIN_BITS:
        half = arr[: arr.size >> 1] | arr[arr.size >> 1 :]
        sat = np.unpackbits(half).mean()
        if sat > max_saturation:
            break
        arr = half
        nbits >>= 1
    return nbits, arr.tobytes()


def might_contain(nbits: int, bits: bytes | np.ndarray, term: str) -> bool:
    arr = (
        bits
        if isinstance(bits, np.ndarray)
        else np.frombuffer(bits, dtype=np.uint8)
    )
    h = murmurhash64(term.encode("utf-8")) & (nbits - 1)
    return bool(arr[h >> 3] & (1 << (h & 7)))
