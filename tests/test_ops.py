"""Training-data ops tests: dedup recall on planted near-dups, ANN recall
vs brute force, simhash invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_intervals_spark.ops.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from lucene_solr_intervals_spark.ops.similarity import ann_lsh_topk, cosine_topk

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_exact_dedup_on_constructed(spark):
    df = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "other"), (3, "same text")],
        ["doc_id", "text"],
    )
    rows = exact_dedup(df).collect()
    assert len(rows) == 1
    assert rows[0]["canonical_doc_id"] == 0 and rows[0]["n_docs"] == 3


def test_minhash_finds_planted_near_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    mutated = base.replace("gamma", "gamma2", 1)  # tiny edit -> high jaccard
    rows = [(0, base), (1, mutated), (2, "completely different words here now " * 8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, num_hashes=16, bands=8, n=3, threshold=0.5).collect()
    assert any(p["doc_a"] == 0 and p["doc_b"] == 1 for p in pairs)
    assert not any(p["doc_b"] == 2 or p["doc_a"] == 2 for p in pairs)


def test_ngram_jaccard_symmetric_bounds(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h"), (1, "a b c d e f g h"), (2, "x y z w q r s t")],
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(df, n=3, threshold=0.9, max_shingle_df=50).collect()
    assert [(p["doc_a"], p["doc_b"], p["jaccard"]) for p in pairs] == [(0, 1, 1.0)]


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [(0, "foo bar baz"), (1, "foo bar baz"), (2, "unrelated totally different")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]


def test_simhash_pairs_planted(spark):
    """Pigeonhole blocking finds identical + near-identical docs; unrelated
    docs stay unpaired."""
    from lucene_solr_intervals_spark.ops.dedup import simhash_pairs

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # identical
            (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near
            (3, "completely unrelated words nothing shared here at all xyz"),
        ],
        ["doc_id", "text"],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(df, max_hamming=6, bands=8).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0
    assert not any(3 in p for p in pairs)


def test_ann_lsh_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    import random

    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(len(qvec))] for _ in range(3)]
    exact = {r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in ann_lsh_topk(emb, qvec, planes, k=10, multi_probe=3).collect()
    }
    # 3-bit LSH with full multi-probe covers half the space; require
    # meaningful recall incl the self-match
    assert 0 in approx
    assert len(exact & approx) >= 5
