"""Sloppy MultiPhraseQuery — transcription of the reference's
TestMultiPhraseQuery sloppy scenarios (TestMultiPhraseQuery.java:50
testPhrasePrefix slop, :161 testMultiSloppyWithRepeats) over the
SloppyPhraseScorer slot-union kernel.
"""

import pytest

from lucene_solr_intervals_spark.search import queries as Q


def test_multi_sloppy_with_repeats_function():
    # TestMultiPhraseQuery.java:161: doc "a b c d e f g h i k",
    # q = [{a,b}, {a}] slop 6 -> matches
    from lucene_solr_intervals_spark.search.sloppy import sloppy_slots_freq

    text = "a b c d e f g h i k".split()
    pos = {}
    for i, t in enumerate(text):
        pos.setdefault(t, []).append(i)
    n, f = sloppy_slots_freq([frozenset(("a", "b")), frozenset(("a",))], pos, 6)
    assert n >= 1 and f > 0.0
    # without slop the b->a pair (positions 1, 0) is out of order: no match
    n0, _ = sloppy_slots_freq([frozenset(("a", "b")), frozenset(("a",))], pos, 0)
    assert n0 == 0


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [
            (0, "blueberry pie"),
            (1, "blueberry strudel"),
            (2, "blueberry pizza"),
            (3, "blueberry chewing gum"),
            (4, "piccadilly circus"),
            (5, "strawberry pie"),
            (6, "a b c d e f g h i k"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def test_phrase_prefix_with_slop(spark, searcher):
    # TestMultiPhraseQuery.java:111-121: {blueberry} {pizza} with slop —
    # exact adjacency matches doc 2; MultiPhrase exact still works
    q0 = Q.MultiPhrase((("blueberry", "strawberry"), ("pie", "strudel")))
    got0 = sorted(r["doc_id"] for r in searcher.scored(q0).collect())
    assert got0 == [0, 1, 5]
    q1 = Q.MultiPhrase((("blueberry",), ("pizza",)), slop=1)
    got1 = sorted(r["doc_id"] for r in searcher.scored(q1).collect())
    assert got1 == [2]


def test_multi_sloppy_with_repeats_engine(spark, searcher):
    q = Q.MultiPhrase((("a", "b"), ("a",)), slop=6)
    got = sorted(r["doc_id"] for r in searcher.scored(q).collect())
    assert got == [6]
    # matching() follows the scored path
    assert sorted(r["doc_id"] for r in searcher.matching(q).collect()) == [6]


def test_slop_widens_matches(spark, searcher):
    # "blueberry ... gum" needs slop >= 1 (one word between)
    q0 = Q.MultiPhrase((("blueberry",), ("gum",)))
    assert searcher.scored(q0).count() == 0
    q1 = Q.MultiPhrase((("blueberry",), ("gum",)), slop=1)
    got = sorted(r["doc_id"] for r in searcher.scored(q1).collect())
    assert got == [3]


def test_packed_path_sloppy_multiphrase(spark, tmp_path):
    from lucene_solr_intervals_spark.index.segment import build_segments
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = spark.createDataFrame(
        [(0, "blueberry pie"), (1, "blueberry chewing gum"),
         (2, "a b c d e f g h i k")],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "idx")
    build_segments(corpus, d, n_segments=1, id_col="doc_id",
                   text_col="text", n_docs_hint=3)
    ss = SegmentSearcher(spark, d)
    got = sorted(
        r["doc_id"]
        for r in ss.search_intervals(
            Q.MultiPhrase((("a", "b"), ("a",)), slop=6), k=10
        ).collect()
    )
    assert got == [2]
    got2 = sorted(
        r["doc_id"]
        for r in ss.search_intervals(
            Q.MultiPhrase((("blueberry",), ("gum", "pie")), slop=1), k=10
        ).collect()
    )
    assert got2 == [0, 1]
