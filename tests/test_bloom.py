"""Bloom-filtered term dictionary sidecar (BloomFilteringPostingsFormat
role — reference lucene/codecs/src/java/.../bloom/FuzzySet.java:50,
BloomFilteringPostingsFormat.java:63) against codecs/bloom.py and the
segment-store wiring."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_intervals_spark.codecs.bloom import (
    build_bloom,
    fold_bloom,
    might_contain,
    murmurhash64,
)


def test_murmur_deterministic_and_spread():
    h1 = murmurhash64(b"get_index")
    assert h1 == murmurhash64(b"get_index")  # stable across calls
    hashes = {murmurhash64(f"term{i}".encode()) for i in range(2000)}
    assert len(hashes) == 2000  # no collisions on a tiny set


def test_no_false_negatives():
    terms = [f"word{i}" for i in range(5000)]
    nbits, bits = build_bloom(terms)
    assert all(might_contain(nbits, bits, t) for t in terms)


def test_false_positive_rate_sane():
    terms = [f"word{i}" for i in range(5000)]
    nbits, bits = build_bloom(terms)
    misses = [f"absent{i}" for i in range(5000)]
    fp = sum(might_contain(nbits, bits, t) for t in misses) / len(misses)
    # ~10% saturation with one hash -> fp ~= saturation
    assert fp < 0.2, fp


def test_fold_keeps_membership():
    terms = [f"t{i}" for i in range(50)]
    nbits, bits = build_bloom(terms, n_terms_hint=100_000)  # oversized
    fn, fb = fold_bloom(nbits, bits)
    assert fn < nbits
    assert all(might_contain(fn, fb, t) for t in terms)


@pytest.fixture(scope="module")
def bloom_index(spark, tmp_path_factory):
    from lucene_solr_intervals_spark.index.segment import build_segments

    rows = [(i, f"alpha{i % 7} beta{i % 5} gamma{i % 3} common") for i in range(400)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    d = str(tmp_path_factory.mktemp("bloom") / "idx")
    build_segments(corpus, d, n_segments=4, id_col="doc_id",
                   text_col="text", analyzer="ws", n_docs_hint=400,
                   bloom=True)
    return d, corpus


def test_searcher_prunes_and_matches(spark, bloom_index):
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    d, _ = bloom_index
    ss = SegmentSearcher(spark, d)
    assert ss.manifest.get("bloom") is True
    blooms = ss._load_blooms()
    assert set(blooms) == set(ss.live)
    # present term: every segment holds 'common'
    assert ss.candidate_segs(["common"]) == ss.live
    # miss term: pruned to nothing (fp-safe: try several)
    pruned = min(len(ss.candidate_segs([f"zzz_missing_{i}"]) or [])
                 for i in range(5))
    assert pruned == 0
    # results identical with pruning active and a guaranteed miss mixed in
    hits = {(r["doc_id"], round(float(r["score"]), 5))
            for r in ss.search(["alpha1", "zzz_missing_0"], k=10).collect()}
    ss._blooms = {}  # disable pruning
    ss2 = SegmentSearcher(spark, d)
    ss2._blooms = {}
    base = {(r["doc_id"], round(float(r["score"]), 5))
            for r in ss2.search(["alpha1", "zzz_missing_0"], k=10).collect()}
    assert hits == base and hits
    # miss-only search returns empty, not an error
    ss3 = SegmentSearcher(spark, d)
    assert ss3.search(["zzz_missing_1"], k=10).count() == 0
    assert ss3.search_many(["alpha1", "zzz_missing_2"], k=5).count() > 0


def test_merge_writes_bloom(spark, bloom_index):
    from lucene_solr_intervals_spark.index.segment import (
        merge_segments,
        read_manifest,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    d, corpus = bloom_index
    import shutil
    import tempfile

    d2 = tempfile.mkdtemp(prefix="bloom_merge_")
    shutil.copytree(d, d2, dirs_exist_ok=True)
    man = read_manifest(d2)
    live = sorted(s["seg"] for s in man["segments"] if s["status"] == "done")
    merge_segments(spark, d2, live[:2], new_seg=max(live) + 1)
    ss = SegmentSearcher(spark, d2)
    blooms = ss._load_blooms()
    assert max(live) + 1 in blooms  # the merged segment got a bloom row
    assert set(blooms) == set(ss.live)
    # merged index still prunes misses and answers hits
    assert ss.candidate_segs([f"zzz_gone_{i}" for i in range(1)]) in ([], None) or \
        len(ss.candidate_segs(["zzz_gone_0"])) <= len(ss.live)
    assert ss.search(["common"], k=10).count() == 10


# ------------------------------------------------- round-8 batched hashing
def test_batch_hash_equals_scalar():
    import random

    from lucene_solr_intervals_spark.codecs.bloom import (
        murmurhash64,
        murmurhash64_batch,
    )

    rng = random.Random(8)
    terms = [""]
    for _ in range(500):
        n = rng.randint(0, 40)
        terms.append(
            "".join(rng.choice("abcdefghijklmnop0123456789_é中ß") for _ in range(n))
        )
    got = murmurhash64_batch(terms)
    want = [murmurhash64(t.encode("utf-8")) for t in terms]
    assert got.tolist() == want


def test_batch_build_bloom_equals_scalar_membership():
    from lucene_solr_intervals_spark.codecs.bloom import (
        build_bloom,
        might_contain,
        murmurhash64,
    )
    import numpy as np

    terms = [f"term_{i}" for i in range(5000)]
    nbits, bits = build_bloom(terms)
    # every inserted term must test positive
    assert all(might_contain(nbits, bits, t) for t in terms)
    # the bitset is exactly the scalar construction
    ref = np.zeros(nbits >> 3, dtype=np.uint8)
    for t in terms:
        h = murmurhash64(t.encode("utf-8")) & (nbits - 1)
        ref[h >> 3] |= np.uint8(1 << (h & 7))
    assert bits == ref.tobytes()
