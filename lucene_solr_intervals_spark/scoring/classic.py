"""DefaultSimilarity (classic TF-IDF), the reference's *default* similarity.

Reference semantics (/root/reference/lucene/core/src/java/org/apache/lucene/
search/similarities/DefaultSimilarity.java and TFIDFSimilarity.java):

  tf(freq)          = sqrt(freq)                       (DefaultSimilarity.java:109)
  idf(df, N)        = 1 + ln(N / (df + 1))             (DefaultSimilarity.java:120)
  lengthNorm        = boost / sqrt(numTerms), stored as byte315
                                                        (DefaultSimilarity.java:95-97)
  decodeNormValue   = byte315ToFloat(b)                 (DefaultSimilarity.java:45)
  queryNorm(ssw)    = 1 / sqrt(sumOfSquaredWeights)     (DefaultSimilarity.java:56-59)
  coord(o, m)       = o / m                             (DefaultSimilarity.java:51-53)

Per-term weight normalization (TFIDFSimilarity$IDFStats.normalize):
  queryWeight = idf * boost;  value = queryWeight * queryNorm * idf
so the scored sum is  coord * queryNorm * Σ_t  tf(t,d) * idf(t)^2 * boost(t)
* norm(d)  — the classic VSM formula from TFIDFSimilarity's class javadoc.

Two modes mirror the BM25 pair (scoring/bm25.py):

* ``classic_lucene`` — float32 with byte315-quantized norms: the
  rank-parity target, tested against a pure-Python float32 oracle.
* ``classic``        — float64 with exact doclen (norm = 1/sqrt(doclen)),
  ANSI-SQL-expressible so the driver's DuckDB harness can replay it.
"""

from __future__ import annotations

import numpy as np

from .smallfloat import byte315_to_float

# 256-entry decode table: DefaultSimilarity.NORM_TABLE[i] = byte315ToFloat(i)
DECODE_TABLE = byte315_to_float(np.arange(256, dtype=np.uint8)).astype(np.float32)


def idf_classic(df: np.ndarray | int, num_docs: int) -> np.ndarray:
    """float32 idf with float64 intermediate: (float)(1 + log(N / (df + 1)))."""
    dfa = np.asarray(df, dtype=np.float64)
    return (1.0 + np.log(num_docs / (dfa + 1.0))).astype(np.float32)


def query_norm(sum_sq_weights: float) -> np.float32:
    """(float)(1.0 / Math.sqrt(sumOfSquaredWeights)) — DefaultSimilarity.java:56-59."""
    if sum_sq_weights <= 0:
        return np.float32(1.0)
    return np.float32(1.0 / np.sqrt(np.float64(sum_sq_weights)))


def score_classic_lucene(
    freq: np.ndarray,
    norm_byte: np.ndarray,
    term_idf: float | np.ndarray,
    value: float | np.ndarray,
) -> np.ndarray:
    """score = sqrt(freq) * value * decodeNorm(b), float32 — the TermScorer
    path where value = idf * boost * queryNorm * idf (IDFStats.normalize)."""
    tf32 = np.sqrt(np.asarray(freq, dtype=np.float32), dtype=np.float32)
    norm = DECODE_TABLE[np.asarray(norm_byte, dtype=np.uint8)]
    return (np.float32(value) * tf32 * norm).astype(np.float32)


def score_classic_sql(
    freq: np.ndarray,
    doclen: np.ndarray,
    df: np.ndarray | int,
    num_docs: int,
    boost: float = 1.0,
) -> np.ndarray:
    """float64 un-normalized per-term score (no queryNorm/coord):
    sqrt(freq) * idf^2 * boost / sqrt(doclen) — the DuckDB-expressible mode."""
    f = np.asarray(freq, dtype=np.float64)
    dl = np.asarray(doclen, dtype=np.float64)
    i = 1.0 + np.log(num_docs / (np.asarray(df, dtype=np.float64) + 1.0))
    return np.sqrt(f) * i * i * boost / np.sqrt(dl)
