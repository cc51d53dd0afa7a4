"""Deterministic split / stratified-sampling ops (ops/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lucene_solr_intervals_spark.ops.sampling import (
    HASH_SPACE,
    hash_split,
    stratified_sample,
)


def _bucket(doc_id, salt):
    h = hashlib.md5(f"{doc_id}@{salt}#0".encode()).hexdigest()[:12]
    return int(h, 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"text {i}", f"src{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_hash_split_matches_reference_hash(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    assert len(got) == 400
    for d, s in got.items():
        b = _bucket(d, "split")
        want = (
            "train"
            if b < int(0.8 * HASH_SPACE)
            else ("val" if b < int(0.9 * HASH_SPACE) else "test")
        )
        assert s == want, (d, s, want)


def test_hash_split_partition_and_proportion(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = hash_split(docs, w).collect()
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert sum(counts.values()) == 400  # total coverage, no row lost
    assert 0.7 < counts["train"] / 400 < 0.9  # law-of-large-numbers sanity
    # determinism: a second run assigns identically
    again = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    assert again == {r["doc_id"]: r["split"] for r in rows}


def test_hash_split_stable_under_append(spark, docs):
    """The defining property vs RNG splits: adding rows never moves an
    existing row's assignment."""
    w = {"train": 0.5, "test": 0.5}
    before = {r["doc_id"]: r["split"] for r in hash_split(docs, w).collect()}
    more = docs.union(
        spark.createDataFrame([(1000 + i, "new", "srcX") for i in range(50)],
                              ["doc_id", "text", "source"])
    )
    after = {r["doc_id"]: r["split"] for r in hash_split(more, w).collect()}
    assert all(after[d] == s for d, s in before.items())


def test_stratified_sample_rates_and_determinism(spark, docs):
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    kept = stratified_sample(docs, rates).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src.get("src0", [])) == 100  # rate 1.0 keeps everything
    assert "src2" not in by_src  # rate 0.0 drops everything
    assert "src3" not in by_src  # unlisted stratum -> default_rate 0.0
    assert 25 <= len(by_src.get("src1", [])) <= 75
    # per-row check against the reference hash
    for d in by_src.get("src1", []):
        assert _bucket(d, "sample") < int(0.5 * HASH_SPACE)


def test_stratified_sample_default_rate(spark, docs):
    kept = stratified_sample(docs, {}, default_rate=1.0).count()
    assert kept == 400


def test_stratified_sample_subset_consistency(spark, docs):
    """Lowering a rate yields a SUBSET of the higher-rate sample (nested
    samples — what lets a pipeline dial mixing weights without churn)."""
    a = {r["doc_id"] for r in stratified_sample(docs, {"src1": 0.6}).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, {"src1": 0.3}).collect()}
    assert b <= a
