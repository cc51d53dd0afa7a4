"""Round-9 pipeline ops: exact-substring dedup (Lee et al. 2021 role),
scalar-quantized vector top-k (Lucene ScalarQuantizer role), BPE-ish token
counting.  Constructed corpora with hand-computed expectations."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.ops.dedup import (
    duplicate_span_marks,
    duplicate_span_stats,
    remove_duplicate_spans,
)
from lucene_solr_intervals_spark.ops.similarity import (
    quantized_cosine_topk,
    scalar_quantize_params,
)
from lucene_solr_intervals_spark.ops.text import BPE_TOKEN_PATTERN, bpe_token_stats

W = "w%d"  # unique filler words


def _words(rng: range) -> str:
    return " ".join(W % i for i in rng)


@pytest.fixture(scope="module")
def span_docs(spark):
    # doc 0 and doc 1 share tokens 100..111 (a 12-token run); doc 2 is all
    # unique; doc 3 repeats ITS OWN 8-gram twice but shares nothing.
    shared = _words(range(100, 112))
    rows = [
        (0, _words(range(0, 10)) + " " + shared + " " + _words(range(20, 30))),
        (1, _words(range(40, 50)) + " " + shared),
        (2, _words(range(60, 90))),
        (3, _words(range(200, 208)) + " " + _words(range(300, 310)) + " " + _words(range(200, 208))),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_span_marks_cross_doc_only(spark, span_docs):
    """min_doc_freq=2 counts DISTINCT docs: the within-doc repeat in doc 3
    must NOT be marked; the doc0/doc1 shared run must be."""
    marks = {(r["doc_id"], r["pos"]) for r in duplicate_span_marks(span_docs, L=8).collect()}
    assert all(d != 3 for d, _ in marks)
    assert all(d != 2 for d, _ in marks)
    # doc 0: shared run occupies positions 10..21 -> 8-gram starts 10..14
    assert {(0, p) for p in range(10, 15)} <= marks
    # doc 1: shared run at positions 10..21 as well
    assert {(1, p) for p in range(10, 15)} <= marks
    assert len(marks) == 10


def test_span_stats_island_merge(spark, span_docs):
    rows = {r["doc_id"]: r for r in duplicate_span_stats(span_docs, L=8).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # doc 0: starts 10..14 overlap into ONE island covering [10, 14+8) = 12
    assert rows[0]["dup_spans"] == 1 and rows[0]["dup_tokens"] == 12
    assert rows[0]["n_tokens"] == 32
    assert rows[0]["dup_ratio"] == round(12 / 32, 4)
    assert rows[1]["dup_tokens"] == 12
    assert rows[2]["dup_spans"] == 0 and rows[2]["dup_tokens"] == 0
    assert rows[3]["dup_tokens"] == 0  # self-repeat not cross-doc


def test_span_stats_within_doc_freq_one(spark, span_docs):
    """min_doc_freq=1 marks ANY repeated window (the paper's default also
    removes within-doc repeats): doc 3's self-repeat becomes visible."""
    rows = {r["doc_id"]: r for r in duplicate_span_stats(span_docs, L=8, min_doc_freq=1).collect()}
    # every window occurs at least once; df>=1 marks EVERYTHING
    assert rows[2]["dup_tokens"] == rows[2]["n_tokens"]


def test_remove_duplicate_spans_reconstruction(spark, span_docs):
    rows = {r["doc_id"]: r for r in remove_duplicate_spans(span_docs, L=8).collect()}
    # doc 1: positions 10..21 dropped -> kept = its first 10 words
    kept1 = " ".join(W % i for i in range(40, 50))
    assert rows[1]["kept_tokens"] == 10
    assert rows[1]["clean_md5"] == hashlib.md5(kept1.encode()).hexdigest()
    # doc 0: kept = tokens 0..9 and 22..31
    kept0 = " ".join([W % i for i in range(0, 10)] + [W % i for i in range(20, 30)])
    assert rows[0]["kept_tokens"] == 20
    assert rows[0]["clean_md5"] == hashlib.md5(kept0.encode()).hexdigest()
    # untouched docs reconstruct identically
    assert rows[2]["kept_tokens"] == rows[2]["n_tokens"]


def test_remove_all_tokens_yields_empty_md5(spark):
    df = spark.createDataFrame(
        [(0, _words(range(8))), (1, _words(range(8)))], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in remove_duplicate_spans(df, L=8).collect()}
    empty = hashlib.md5(b"").hexdigest()
    assert rows[0]["kept_tokens"] == 0 and rows[0]["clean_md5"] == empty
    assert rows[1]["kept_tokens"] == 0 and rows[1]["clean_md5"] == empty


def test_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c")], ["doc_id", "text"]
    )  # 3 tokens < L: no windows, no dups — but stats rows still exist
    rows = {r["doc_id"]: r for r in duplicate_span_stats(df, L=8).collect()}
    assert rows[0]["n_tokens"] == 3 and rows[0]["dup_tokens"] == 0


# ------------------------------------------------------- quantized vectors


def test_quantized_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 16).astype("float32")
    rows = [(int(i), [float(v) for v in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    mn, scale = scalar_quantize_params(df)
    assert mn == pytest.approx(float(vecs.min()))
    q = np.floor((vecs.astype("float64") - mn) * scale + 0.5).astype("int64")
    qq = q[0]
    dots = q @ qq
    order = sorted(range(40), key=lambda i: (-dots[i], i))[:10]
    got = quantized_cosine_topk(df, rows[0][1], k=10).collect()
    assert [r["vec_id"] for r in got] == order
    assert [r["qdot"] for r in got] == [int(dots[i]) for i in order]


def test_quantized_codes_in_range(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [0.25, 0.75]), (2, [0.5, 1.0])], ["vec_id", "embedding"]
    )
    mn, scale = scalar_quantize_params(df, levels=127)
    lo = math.floor((0.0 - mn) * scale + 0.5)
    hi = math.floor((1.0 - mn) * scale + 0.5)
    assert (lo, hi) == (0, 127)


# ------------------------------------------------------------- BPE tokens


def test_bpe_token_stats_vs_python_re(spark):
    texts = [
        (0, "hello world"),
        (1, "foo_bar 123 baz!  qux?x9"),
        (2, "a,b,,c   42x"),
        (3, "CamelCase under_scored 3.14"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bpe_token_stats(df).collect()}
    pat = re.compile(BPE_TOKEN_PATTERN)
    for doc_id, text in texts:
        toks = pat.findall(text)
        ws = [t for t in re.split(r"[ \t\n\r\f]+", text) if t]
        assert got[doc_id]["bpe_tokens"] == len(toks), (doc_id, toks)
        assert got[doc_id]["ws_tokens"] == len(ws)
        assert got[doc_id]["chars_per_bpe_token"] == pytest.approx(
            round(len(text) / max(len(toks), 1), 4)
        )


# ------------------------------------------------ brute-force shadow fuzz


def _brute_span_stats(texts: list[str], L: int, min_df: int):
    """Pure-Python shadow of duplicate_span_stats: enumerate every L-token
    window, count distinct docs per gram, mark covered positions as a SET
    (the union semantics the gaps-and-islands plan must reproduce)."""
    import re as _re
    from collections import defaultdict

    toks = [
        [t for t in _re.split(r"[^a-z0-9_]+", s.lower()) if t] for s in texts
    ]
    docs_of = defaultdict(set)
    for d, ts in enumerate(toks):
        for i in range(len(ts) - L + 1):
            docs_of[tuple(ts[i : i + L])].add(d)
    dup = {g for g, ds in docs_of.items() if len(ds) >= min_df}
    out = {}
    for d, ts in enumerate(toks):
        covered = set()
        spans = 0
        prev_end = -1
        for i in range(len(ts) - L + 1):
            if tuple(ts[i : i + L]) in dup:
                if i >= prev_end:
                    spans += 1
                covered.update(range(i, i + L))
                prev_end = max(prev_end, i + L)
        out[d] = (len(ts), spans, len(covered))
    return out


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=0, max_size=14
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    L=st.sampled_from([2, 3]),
)
@settings(max_examples=60, deadline=None)
def test_span_stats_brute_shadow(spark, texts, L):
    """Tiny vocab + short L force dense cross-doc collisions — the regime
    where island merging and distinct-doc df counting can go wrong."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"])
        for r in duplicate_span_stats(df, L=L, min_doc_freq=2).collect()
    }
    assert got == _brute_span_stats(texts, L, 2)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["w1", "w2", "w3"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
)
@settings(max_examples=40, deadline=None)
def test_remove_spans_brute_shadow(spark, texts):
    import re as _re

    L = 2
    brute = _brute_span_stats(texts, L, 2)
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["kept_tokens"])
        for r in remove_duplicate_spans(df, L=L, min_doc_freq=2).collect()
    }
    want = {d: (n, n - cov) for d, (n, _sp, cov) in brute.items()}
    assert got == want


def test_span_marks_hash_family_invariant(spark, span_docs):
    """The xxhash64 production fingerprint makes the same dup decisions as
    the oracle-mode md5 chain (collisions aside, the families must agree)."""
    md5_marks = {(r["doc_id"], r["pos"])
                 for r in duplicate_span_marks(span_docs, L=8).collect()}
    xx_marks = {(r["doc_id"], r["pos"])
                for r in duplicate_span_marks(span_docs, L=8, hash_family="xxhash64").collect()}
    assert md5_marks == xx_marks


def test_span_marks_tokenhash_equals_gram(spark, span_docs):
    """The string-free rolling-polynomial fingerprint marks the same spans
    as the gram-string family (collision probability ~n^2/2^57)."""
    gram = {(r["doc_id"], r["pos"])
            for r in duplicate_span_marks(span_docs, L=8).collect()}
    tokh = {(r["doc_id"], r["pos"])
            for r in duplicate_span_marks(span_docs, L=8, fingerprint="tokenhash").collect()}
    assert gram == tokh


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=0, max_size=14
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
)
@settings(max_examples=25, deadline=None)
def test_span_stats_tokenhash_fuzz(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    a = {r["doc_id"]: (r["dup_spans"], r["dup_tokens"])
         for r in duplicate_span_stats(df, L=3).collect()}
    b = {r["doc_id"]: (r["dup_spans"], r["dup_tokens"])
         for r in duplicate_span_stats(df, L=3, fingerprint="tokenhash").collect()}
    assert a == b


def test_wfst_exact_first(spark):
    """WFSTCompletionLookup exactFirst: exact key beats heavier completions."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.suggest import suggest_prefix

    corpus = spark.createDataFrame(
        [(0, "a agg agg"), (1, "agg agg a"), (2, "agg")], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="code")
    plain = [r["suggestion"] for r in suggest_prefix(idx, "a", k=2).collect()]
    exact = [r["suggestion"] for r in suggest_prefix(idx, "a", k=2, exact_first=True).collect()]
    assert plain == ["agg", "a"]  # df 3 vs 2
    assert exact == ["a", "agg"]
    idx.unpersist()
