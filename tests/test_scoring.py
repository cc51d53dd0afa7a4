"""SmallFloat byte315 + BM25 float32 parity tests.

Cross-checks the vectorized numpy implementation against an independent
pure-Python (struct-based) transcription of the reference semantics
(SmallFloat.java:78-97, BM25Similarity.java:64-67,127-134,206-238), plus
the documented constants from the reference javadoc (smallest non-zero =
5.820766E-10, largest = 7.5161928E9).
"""

from __future__ import annotations

import math
import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.scoring import (
    BM25Stats,
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
    idf,
    norm_cache,
    score_lucene,
    score_lucene_from_doclen,
)


def py_float_to_byte315(f: float) -> int:
    """Independent scalar oracle using struct, mirroring the Java bit ops."""
    f32 = struct.unpack("<f", struct.pack("<f", f))[0]
    bits = struct.unpack("<i", struct.pack("<f", f32))[0]
    smallfloat = bits >> (24 - 3)
    if smallfloat <= ((63 - 15) << 3):
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 0xFF
    return (smallfloat - ((63 - 15) << 3)) & 0xFF


def py_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = (b & 0xFF) << (24 - 3)
    bits += (63 - 15) << 24
    return struct.unpack("<f", struct.pack("<i", bits))[0]


def test_byte315_documented_constants():
    # javadoc: smallest non-zero value = 5.820766E-10, largest = 7.5161928E9
    assert math.isclose(py_byte315_to_float(1), 5.820766e-10, rel_tol=1e-6)
    assert math.isclose(py_byte315_to_float(255), 7.5161928e9, rel_tol=1e-6)
    assert py_byte315_to_float(0) == 0.0


def test_roundtrip_all_bytes():
    for b in range(256):
        f = py_byte315_to_float(b)
        assert float(byte315_to_float(np.uint8(b))[0]) == f
        if b != 0:
            assert int(float_to_byte315(np.float32(f))[0]) == b


@given(st.floats(min_value=1e-12, max_value=1e12, allow_nan=False))
@settings(max_examples=500)
def test_numpy_matches_scalar_oracle(f):
    assert int(float_to_byte315(np.float32(f))[0]) == py_float_to_byte315(f)


def test_negative_and_zero():
    assert int(float_to_byte315(np.float32(0.0))[0]) == 0
    assert int(float_to_byte315(np.float32(-1.0))[0]) == 0
    assert int(float_to_byte315(np.float32(1e30))[0]) == 255


def test_encode_norm_buckets():
    # doclens in the same byte315 bucket must get the same norm byte
    # (quantization is the rank-identity-critical lossy step)
    b_100 = int(encode_norm(100)[0])
    b_101 = int(encode_norm(101)[0])
    assert b_100 == py_float_to_byte315(1.0 / math.sqrt(100))
    assert b_101 == py_float_to_byte315(1.0 / math.sqrt(101))


def test_norm_table_is_inverse_square():
    for i in range(1, 256):
        f = py_byte315_to_float(i)
        expected = np.float32(1.0) / (np.float32(f) * np.float32(f))
        assert NORM_TABLE[i] == expected


def py_bm25_score(tf, doclen, df, n_docs, avgdl, k1=1.2, b=0.75):
    """Scalar float32-disciplined oracle of BM25Similarity.score (:234-238)."""
    f32 = lambda x: struct.unpack("<f", struct.pack("<f", x))[0]
    idf_v = f32(math.log(1 + (n_docs - df + 0.5) / (df + 0.5)))
    nb = py_float_to_byte315(f32(1.0 / math.sqrt(doclen)))
    decoded = f32(1.0 / (py_byte315_to_float(nb) ** 2))
    cache = f32(k1 * ((1 - b) + b * f32(decoded / f32(avgdl))))
    weight = f32(idf_v * f32(k1 + 1))
    return f32(f32(weight * tf) / f32(tf + cache))


@given(
    tf=st.integers(min_value=1, max_value=100),
    doclen=st.integers(min_value=1, max_value=100000),
    df=st.integers(min_value=1, max_value=1000),
    n_docs=st.integers(min_value=1000, max_value=100000),
)
@settings(max_examples=300)
def test_bm25_matches_scalar_oracle(tf, doclen, df, n_docs):
    sum_ttf = n_docs * 50  # avgdl = 50
    stats = BM25Stats(max_doc=n_docs, sum_total_term_freq=sum_ttf)
    got = score_lucene_from_doclen(
        np.array([tf]), np.array([doclen]), idf(df, n_docs), stats
    )[0]
    want = py_bm25_score(tf, doclen, df, n_docs, avgdl=50.0)
    # float32 all the way; tolerate 1-2 ulp from operation-order differences
    assert got == np.float32(want) or abs(got - want) <= 4 * np.spacing(np.float32(want))


def test_bm25_rank_properties():
    stats = BM25Stats(max_doc=1000, sum_total_term_freq=50000)
    cache = stats.cache()
    i = idf(10, 1000)
    # higher tf -> higher score, same doclen
    nb = encode_norm(np.array([50, 50, 50]))
    s = score_lucene(np.array([1, 2, 3]), nb, i, cache)
    assert s[0] < s[1] < s[2]
    # longer doc -> lower score, same tf (when buckets differ)
    nb2 = encode_norm(np.array([10, 1000]))
    s2 = score_lucene(np.array([2, 2]), nb2, i, cache)
    assert s2[0] > s2[1]
    # rarer term -> higher idf
    assert idf(1, 1000) > idf(100, 1000)


def test_norm_cache_float32():
    c = norm_cache(50.0)
    assert c.dtype == np.float32
    assert c.shape == (256,)
