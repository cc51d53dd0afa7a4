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


def _size_for(n_terms: int) -> int:
    bits = MIN_BITS
    while bits < MAX_BITS and bits < 10 * max(n_terms, 1):
        bits <<= 1
    return bits


def build_bloom(terms, n_terms_hint: int | None = None) -> tuple[int, bytes]:
    """-> (nbits, packed bitset).  One hash per term (FuzzySet hashCount=1);
    nbits is a power of two so membership is hash & (nbits-1)."""
    terms = list(terms)
    nbits = _size_for(n_terms_hint if n_terms_hint is not None else len(terms))
    bits = np.zeros(nbits >> 3, dtype=np.uint8)
    mask = nbits - 1
    for t in terms:
        h = murmurhash64(t.encode("utf-8")) & mask
        bits[h >> 3] |= np.uint8(1 << (h & 7))
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
