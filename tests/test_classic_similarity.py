"""DefaultSimilarity (classic TF-IDF) golden tests.

Pure-Python oracle transcribing DefaultSimilarity.java:45,51-59,95-97,109,120
and TFIDFSimilarity$IDFStats.normalize: score(q,d) = coord * queryNorm *
Σ_t sqrt(tf) * idf(t)^2 * boost(t) * decodeNorm(d).  The engine's
mode="classic_lucene" must reproduce values (float32 + byte315 norms) and
ordering; mode="classic" (float64, exact doclen — the SQL-expressible
variant) must agree on ordering.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.scoring.classic import (
    DECODE_TABLE,
    idf_classic,
    query_norm,
)
from lucene_solr_intervals_spark.scoring.smallfloat import encode_norm
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown dog sleeps",
    "a fast brown fox leaps over fences and walls all day long every day",
    "quick quick quick fox",
    "lazy dogs and lazy cats sleep through the quick afternoon",
    "fox",
    "quick brown quick brown quick brown fences",
]

TOKS = [t.split() for t in CORPUS]
N = len(CORPUS)


def _df(term):
    return sum(1 for ws in TOKS if term in ws)


def _tf(term, d):
    return TOKS[d].count(term)


def _norm32(d):
    return np.float32(DECODE_TABLE[int(encode_norm(len(TOKS[d]))[0])])


def oracle_term(term, d):
    tf = _tf(term, d)
    if tf == 0:
        return None
    i = idf_classic(_df(term), N)
    qn = query_norm(float(np.float32(i * i)))  # ssw = (idf*1.0)^2
    return float(np.float32(np.float32(i * i) * np.sqrt(np.float32(tf)) * _norm32(d) * qn))


def oracle_bool_should(terms, d):
    matched = [t for t in terms if _tf(t, d) > 0]
    if not matched:
        return None
    ssw = np.float32(0.0)
    for t in terms:
        w = idf_classic(_df(t), N)
        ssw = np.float32(ssw + np.float32(w * w))
    qn = query_norm(float(ssw))
    s = np.float32(0.0)
    for t in matched:
        i = idf_classic(_df(t), N)
        s = np.float32(s + np.float32(i * i) * np.sqrt(np.float32(_tf(t, d))) * _norm32(d))
    coord = len(matched) / len(terms)
    return float(s * np.float32(coord) * qn)


def phrase_freq(terms, d):
    ws = TOKS[d]
    n = 0
    for i in range(len(ws) - len(terms) + 1):
        if all(ws[i + j] == terms[j] for j in range(len(terms))):
            n += 1
    return n


def oracle_phrase(terms, d):
    freq = phrase_freq(terms, d)
    if freq == 0:
        return None
    s = np.float32(0.0)
    for t in terms:
        s = np.float32(s + idf_classic(_df(t), N))
    qn = query_norm(float(np.float32(s * s)))
    return float(np.float32(np.float32(s * s) * np.sqrt(np.float32(freq)) * _norm32(d) * qn))


@pytest.fixture(scope="module")
def index(spark):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="code")
    yield idx
    idx.unpersist()


def _got(searcher, q):
    return {
        r["doc_id"]: float(r["score"])
        for r in searcher.scored(q).collect()
    }


def test_classic_lucene_term_values(spark, index):
    s = Searcher(index, mode="classic_lucene")
    for term in ["fox", "quick", "brown", "lazy"]:
        got = _got(s, Q.Term(term))
        want = {d: oracle_term(term, d) for d in range(N) if oracle_term(term, d)}
        assert set(got) == set(want), term
        for d in want:
            assert got[d] == pytest.approx(want[d], rel=1e-5), (term, d)


def test_classic_lucene_bool_coord_querynorm(spark, index):
    s = Searcher(index, mode="classic_lucene")
    terms = ["fox", "lazy", "brown"]
    got = _got(s, Q.Boolean(should=tuple(Q.Term(t) for t in terms)))
    want = {d: oracle_bool_should(terms, d) for d in range(N)}
    want = {d: v for d, v in want.items() if v is not None}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-5), d
    # coord matters: doc matching 3/3 terms outranks same-sum 1/3 docs
    ranks = sorted(got, key=lambda d: (-got[d], d))
    assert ranks[0] == 0  # the only doc with all three terms


def test_classic_lucene_phrase(spark, index):
    s = Searcher(index, mode="classic_lucene")
    got = _got(s, Q.Phrase(("quick", "brown")))
    want = {d: oracle_phrase(["quick", "brown"], d) for d in range(N)}
    want = {d: v for d, v in want.items() if v is not None}
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-5), d
    # doc 6 has freq=3 -> sqrt(3) advantage, shortest-norm competition aside
    assert got[6] > got[1]


def test_classic_sql_mode_same_ordering(spark, index):
    """The float64 exact-doclen variant (driver-oracle mode) must produce the
    same ranking as the quantized float32 mode on this corpus."""
    sl = Searcher(index, mode="classic_lucene")
    sc = Searcher(index, mode="classic")
    for q in [
        Q.Term("quick"),
        Q.Boolean(should=(Q.Term("fox"), Q.Term("lazy"), Q.Term("brown"))),
        Q.Boolean(must=(Q.Term("quick"), Q.Term("brown"))),
        Q.Phrase(("quick", "brown")),
    ]:
        a = [r["doc_id"] for r in sl.search(q, k=10).collect()]
        b = [r["doc_id"] for r in sc.search(q, k=10).collect()]
        assert a == b, q


def test_classic_explain_matches_scored(spark, index):
    for mode in ["classic", "classic_lucene"]:
        s = Searcher(index, mode=mode)
        q = Q.Term("quick")
        scores = _got(s, q)
        for d, v in scores.items():
            e = s.explain(q, d)
            assert e["match"]
            assert e["value"] == pytest.approx(v, rel=1e-5), (mode, d)


def test_classic_vs_bm25_differ(spark, index):
    """Sanity: the two similarity families are actually different formulas."""
    bm = _got(Searcher(index, mode="lucene"), Q.Term("quick"))
    cl = _got(Searcher(index, mode="classic_lucene"), Q.Term("quick"))
    assert set(bm) == set(cl)
    assert any(abs(bm[d] - cl[d]) > 1e-4 for d in bm)
