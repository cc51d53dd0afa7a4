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


def test_multimodal_header_decoders():
    """Round-5: real header parsers in the decoder registry."""
    from lucene_solr_intervals_spark.ops.multimodal import decode_header

    assert decode_header(b"P6\n640 480\n255\n\x00\x01") == ("ppm", 640, 480)
    assert decode_header(b"P2\n# comment\n 12\t34\n255\n0") == ("ppm", 12, 34)
    bmp = b"BM" + b"\x00" * 16 + (320).to_bytes(4, "little") + (
        -200 & 0xFFFFFFFF
    ).to_bytes(4, "little")
    assert decode_header(bmp) == ("bmp", 320, 200)  # top-down rows -> abs
    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
        + (800).to_bytes(4, "big") + (600).to_bytes(4, "big")
    )
    assert decode_header(png) == ("png", 800, 600)
    gif = b"GIF89a" + (64).to_bytes(2, "little") + (32).to_bytes(2, "little")
    assert decode_header(gif) == ("gif", 64, 32)
    assert decode_header(b"garbage bytes") == (None, None, None)
    assert decode_header(b"") == (None, None, None)


def test_multimodal_decode_meta_spark(spark):
    from lucene_solr_intervals_spark.ops.multimodal import decode_meta

    rows = [
        (1, "image", bytearray(b"P6\n10 20\n255\nxxx")),
        (2, "image", bytearray(b"GIF87a" + (7).to_bytes(2, "little") + (9).to_bytes(2, "little"))),
        (3, "image", bytearray(b"not an image")),
    ]
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    media = spark.createDataFrame(rows, schema)
    got = {
        int(r["media_id"]): (r["format"], r["meta_width"], r["meta_height"])
        for r in decode_meta(media).collect()
    }
    assert got == {
        1: ("ppm", 10, 20),
        2: ("gif", 7, 9),
        3: (None, None, None),
    }


def test_multimodal_register_decoder():
    from lucene_solr_intervals_spark.ops.multimodal import (
        IMAGE_DECODERS,
        decode_header,
        register_decoder,
    )

    def _parse_fake(b):
        return (1, 2) if b[:4] == b"FAKE" else None

    register_decoder("fake", _parse_fake)
    try:
        assert decode_header(b"FAKE....") == ("fake", 1, 2)
    finally:
        IMAGE_DECODERS.pop("fake", None)


def test_duplicate_components_hand_graph(spark):
    """Label propagation must find the transitive closure: chain + island."""
    from lucene_solr_intervals_spark.ops.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5)],
        ["doc_a", "doc_b"],
    )
    got = {
        int(r["doc_id"]): int(r["component"])
        for r in duplicate_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,      # 5-node chain -> min id 1
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_doc_lm_score_prefers_fluent_text(spark):
    from lucene_solr_intervals_spark.ops.text import doc_lm_score

    docs = spark.createDataFrame(
        [
            (0, "the quick fox jumps over the lazy dog"),
            (1, "the quick fox jumps over the lazy dog"),
            (2, "dog the over quick lazy jumps fox the"),  # scrambled
            (3, "zebra xylophone quartz"),                  # rare singletons
        ],
        ["doc_id", "text"],
    )
    got = {int(r["doc_id"]): r["lm_score"] for r in doc_lm_score(docs).collect()}
    # the two fluent twins share every bigram -> highest (equal) score;
    # the scrambled doc backs off on most bigrams -> lowest.  (The
    # singleton-vocab doc sits between: its bigrams are globally unique so
    # the self-trained model memorizes them at p=1 — the known self-scoring
    # artifact; hand-derived values -0.7161 / -1.3226 / -1.0986.)
    assert got[0] == got[1] == -0.7161
    assert got[2] == -1.3226 and got[3] == -1.0986
    assert got[0] > got[3] > got[2]


def test_decontaminate(spark):
    """GPT-3-style n-gram decontamination: training docs sharing any
    n-gram with the eval set are dropped; unrelated docs survive."""
    from lucene_solr_intervals_spark.ops.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "a completely different document about spark engines"),
            (2, "quick brown fox jumps over the lazy dog yesterday"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    kept = sorted(
        int(r["doc_id"]) for r in decontaminate(train, eval_df, n=8).collect()
    )
    # docs 0 and 2 share the 8-gram "quick brown fox jumps over the lazy dog"
    assert kept == [1]
    # with a longer n than any shared run, everything survives
    kept = sorted(
        int(r["doc_id"]) for r in decontaminate(train, eval_df, n=11).collect()
    )
    assert kept == [0, 1, 2]
