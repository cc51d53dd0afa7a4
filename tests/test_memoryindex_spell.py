"""MemoryIndex percolation + DirectSpellChecker analogs."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.memoryindex import MemoryIndex, percolate
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher
from lucene_solr_intervals_spark.search.spell import suggest_terms

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown dog sleeps",
    "a fast brown fox leaps over fences",
    "quick quick quick fox",
    "lazy dogs and lazy cats sleep",
    "foxes and boxes and quik fixes",
]

QUERIES = {
    "t": Q.Term("fox"),
    "b": Q.Boolean(must=(Q.Term("brown"),), must_not=(Q.Term("lazy"),)),
    "msm": Q.Boolean(should=(Q.Term("fox"), Q.Term("dog"), Q.Term("lazy")),
                     min_should_match=2),
    "ph": Q.Phrase(("quick", "brown")),
    "near": Q.OrderedNear(3, (Q.Term("quick"), Q.Term("fox"))),
    "pre": Q.Prefix("fo"),
    "fz": Q.Fuzzy("quik", max_edits=1),
}


def test_memoryindex_matches_searcher(spark):
    """Per-doc MemoryIndex.match == distributed Searcher.matching for every
    query shape (the percolation contract)."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    idx = build_index(df, analyzer="code")
    try:
        s = Searcher(idx, mode="sql")
        for name, q in QUERIES.items():
            dist = sorted(r["doc_id"] for r in s.matching(q).collect())
            local = sorted(
                i for i, t in enumerate(CORPUS) if MemoryIndex(t).match(q)
            )
            assert dist == local, name
    finally:
        idx.unpersist()


def test_percolate_spark(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    got = {
        (r["doc_id"], r["query_name"])
        for r in percolate(df, {"t": QUERIES["t"], "ph": QUERIES["ph"]}).collect()
    }
    expect = set()
    for i, t in enumerate(CORPUS):
        mi = MemoryIndex(t)
        for n in ("t", "ph"):
            if mi.match(QUERIES[n]):
                expect.add((i, n))
    assert got == expect and got


def test_spell_suggest(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    idx = build_index(df, analyzer="code")
    try:
        rows = suggest_terms(idx, "quik", k=3).collect()
        assert rows[0]["suggestion"] == "quick"
        assert rows[0]["similarity"] == pytest.approx(1 - 1 / 5, abs=1e-4)
        # the query term itself is never suggested even though it occurs
        rows = suggest_terms(idx, "quick", k=3).collect()
        assert all(r["suggestion"] != "quick" for r in rows)
        # prefix gate: suggestions must share the first character
        assert all(
            r["suggestion"].startswith("f") for r in suggest_terms(idx, "foxs").collect()
        )
    finally:
        idx.unpersist()
