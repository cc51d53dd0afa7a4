"""IndexSplitter analog + FuzzySuggester analog tests."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index


def test_split_index_shards_equal_original(spark, tmp_path):
    """split_index (IndexSplitter.java:47): segment-boundary split via
    hardlinks; MultiIndexSearcher over the shards == original searcher."""
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        read_manifest,
        split_index,
        verify_index,
    )
    from lucene_solr_intervals_spark.search.multi import MultiIndexSearcher
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = generate_corpus(spark, 600)
    d = str(tmp_path / "orig")
    build_segments(corpus, d, n_segments=6, id_col="doc_id", text_col="content", analyzer="code")
    outs = [str(tmp_path / "shard_a"), str(tmp_path / "shard_b")]
    manifests = split_index(d, outs)
    assert len(manifests) == 2
    orig = read_manifest(d)
    assert sum(m["n_docs"] for m in manifests) == orig["n_docs"]
    assert sum(m["sum_ttf"] for m in manifests) == orig.get(
        "sum_ttf", orig["sum_doclen"]
    )
    for o in outs:
        assert verify_index(spark, o)["ok"]
    ss = SegmentSearcher(spark, d)
    ms = MultiIndexSearcher(spark, outs)
    a = [
        (int(r["doc_id"]), float(r["score"]))
        for r in ss.search(["get_index", "merge_posting"], k=20).collect()
    ]
    b = [
        (int(r["doc_id"]), float(r["score"]))
        for r in ms.search(["get_index", "merge_posting"], k=20).collect()
    ]
    assert a == b and a


def test_edit1_prefix_enumeration():
    from lucene_solr_intervals_spark.search.suggest import _edit1_prefixes

    vs = set(_edit1_prefixes("ab"))
    assert "ab" in vs          # 0 edits
    assert "b" in vs and "a" in vs        # deletions
    assert "xb" in vs and "ax" in vs      # substitutions
    assert "xab" in vs and "abx" in vs    # insertions
    assert "ba" in vs                     # transposition
    assert all(abs(len(v) - 2) <= 1 for v in vs)


@pytest.fixture(scope="module")
def sugg_index(spark):
    corpus = spark.createDataFrame(
        [
            (0, "vector vector vector merge"),
            (1, "vector victor scan"),
            (2, "velvet merge scan"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    yield idx
    idx.unpersist()


def test_suggest_fuzzy(sugg_index):
    from lucene_solr_intervals_spark.search.suggest import suggest_fuzzy

    # typo'd prefix "vektor": one substitution from "vector" (df 2) but
    # two edits from "victor" — only vector completes
    got = [
        (r["suggestion"], r["weight"])
        for r in suggest_fuzzy(sugg_index, "vektor", k=10).collect()
    ]
    assert got == [("vector", 2)]
    # exact prefix matches through the 0-edit variant; "vect" is itself
    # one substitution from "vict", so vector (higher df) ranks first
    got = [r["suggestion"] for r in suggest_fuzzy(sugg_index, "vict", k=10).collect()]
    assert got == ["vector", "victor"]
    # transposition: "evctor" fails prefix_length=1 (first char must match)
    got = suggest_fuzzy(sugg_index, "evctor", k=10).collect()
    assert got == []
    # ...but is found with prefix_length=0
    got = [
        r["suggestion"]
        for r in suggest_fuzzy(sugg_index, "evctor", k=10, prefix_length=0).collect()
    ]
    assert got == ["vector"]
    # max_edits=0 degrades to plain prefix completion
    got = suggest_fuzzy(sugg_index, "vektor", k=10, max_edits=0).collect()
    assert got == []


def test_split_index_validation(spark, tmp_path):
    """Review r5b: more shards than segments / malformed dirs fail loudly
    instead of producing unopenable empty shards."""
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        split_index,
    )

    corpus = generate_corpus(spark, 120)
    d = str(tmp_path / "tiny")
    build_segments(corpus, d, n_segments=2, id_col="doc_id",
                   text_col="content", analyzer="code")
    with pytest.raises(ValueError, match="every shard needs"):
        split_index(d, [str(tmp_path / x) for x in "abc"])
    with pytest.raises(ValueError, match="invalid out_dirs"):
        split_index(d, [str(tmp_path / "a"), ""])
    with pytest.raises(ValueError, match="invalid out_dirs"):
        split_index(d, [])
