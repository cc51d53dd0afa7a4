"""BM25 scoring, rank-identical to the reference's BM25Similarity.

Reference semantics (/root/reference/lucene/core/src/java/org/apache/lucene/
search/similarities/BM25Similarity.java):

  idf(df, N)   = ln(1 + (N - df + 0.5)/(df + 0.5))            (:64-67)
  avgdl        = sumTotalTermFreq / maxDoc                     (:82-89)
  norm byte    = floatToByte315(boost / sqrt(doclen))          (:95-97, :138-141)
  cache[b]     = k1 * ((1 - b_param) + b_param * NORM_TABLE[b] / avgdl)  (:206-211)
  score        = idf * (k1 + 1) * tf / (tf + cache[norm_byte]) (:234-238)
  sloppyFreq   = 1 / (distance + 1)                            (:70-72)
  defaults     k1 = 1.2, b = 0.75                              (:59-62)

All arithmetic is float32 (Lucene uses Java float throughout); idf uses a
float64 intermediate exactly as Java does ``(float) Math.log(... double ...)``.

Two modes are provided:

* ``lucene`` — the above, with byte315 norm quantization.  This is the
  parity target against the reference and is oracle-tested in pytest with a
  pure-Python reference implementation + golden fixtures.
* ``sql``    — identical formula but float64 with the *exact* doclen
  (no quantization).  This variant is expressible in ANSI SQL so the
  driver's DuckDB harness can replay it; used by `__spark_entry__` queries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .smallfloat import NORM_TABLE, encode_norm

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf(df: np.ndarray | int, num_docs: int) -> np.ndarray:
    """float32 idf with float64 intermediate, like (float) Math.log(double)."""
    dfa = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (num_docs - dfa + 0.5) / (dfa + 0.5)).astype(np.float32)


def norm_cache(avgdl: float, k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> np.ndarray:
    """256-entry freq-independent part, float32 (BM25Similarity.java:206-211)."""
    k1f = np.float32(k1)
    bf = np.float32(b)
    avg = np.float32(avgdl)
    return (k1f * ((np.float32(1.0) - bf) + bf * NORM_TABLE / avg)).astype(np.float32)


@dataclass(frozen=True)
class BM25Stats:
    """Broadcast-able collection + term statistics bound at plan time."""

    max_doc: int
    sum_total_term_freq: int
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT

    @property
    def avgdl(self) -> np.float32:
        # (float)(sumTotalTermFreq / (double) maxDoc), BM25Similarity.java:82-89
        if self.sum_total_term_freq <= 0:
            return np.float32(1.0)
        return np.float32(self.sum_total_term_freq / float(self.max_doc))

    def cache(self) -> np.ndarray:
        return norm_cache(float(self.avgdl), self.k1, self.b)


def score_lucene(
    tf: np.ndarray,
    norm_byte: np.ndarray,
    term_idf: float | np.ndarray,
    cache: np.ndarray,
    k1: float = K1_DEFAULT,
) -> np.ndarray:
    """score = idf*(k1+1)*tf / (tf + cache[norm_byte]) — all float32."""
    tf32 = np.asarray(tf, dtype=np.float32)
    weight = (np.float32(term_idf) * np.float32(k1 + 1.0)).astype(np.float32)
    norm = cache[np.asarray(norm_byte, dtype=np.uint8)]
    return (weight * tf32 / (tf32 + norm)).astype(np.float32)


def score_lucene_from_doclen(
    tf: np.ndarray,
    doclen: np.ndarray,
    term_idf: float | np.ndarray,
    stats: BM25Stats,
) -> np.ndarray:
    """Convenience: quantize doclen -> norm byte -> score (full Lucene path)."""
    nb = encode_norm(doclen)
    return score_lucene(tf, nb, term_idf, stats.cache(), stats.k1)


def score_sql_mode(
    tf: np.ndarray,
    doclen: np.ndarray,
    df: np.ndarray | int,
    num_docs: int,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> np.ndarray:
    """float64 BM25 without norm quantization (the DuckDB-expressible mode)."""
    tf64 = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doclen, dtype=np.float64)
    dfa = np.asarray(df, dtype=np.float64)
    i = np.log(1.0 + (num_docs - dfa + 0.5) / (dfa + 0.5))
    return i * (k1 + 1.0) * tf64 / (tf64 + k1 * ((1.0 - b) + b * dl / avgdl))


def sloppy_freq(distance: np.ndarray | int) -> np.ndarray:
    """1/(distance+1) per match (BM25Similarity.sloppyFreq:70-72), float32."""
    return (np.float32(1.0) / (np.asarray(distance, dtype=np.float32) + np.float32(1.0))).astype(
        np.float32
    )
