"""TestPositionIncrement transcription (lucene/core/src/test/org/apache/
lucene/search/TestPositionIncrement.java:60-199).

The reference indexes ONE doc through a canned tokenizer emitting tokens
1..5 with position increments [1, 2, 1, 0, 1] — i.e. positions
0, 2, 3, 3, 4: a HOLE between "1" and "2" (a removed stopword) and an
OVERLAP of "3"/"4" at position 3 (a synonym).  The suite pins that
phrase matching runs on REAL positions, not token order.

The explicit-position PhraseQuery.add(Term, position) variants of the
Java test are an API this fork's Query surface does not expose (gapped
phrases exist only via NGramPhraseQuery's rewrite); every
position-sensitive assertion below is the add(Term)-form twin, which
exercises the identical postings.
"""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.tokenizer import register_analyzer
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

def _make_canned():
    """The test's canned tokenizer (:64-88), ignoring the input text.
    Built as a CLOSURE so cloudpickle ships it by value to executors
    (module-level functions of a test module aren't importable there)."""
    tokens = ["1", "2", "3", "4", "5"]
    increments = [1, 2, 1, 0, 1]  # -> positions 0, 2, 3, 3, 4

    def _canned(text: str):
        pos = -1
        terms, positions = [], []
        for t, inc in zip(tokens, increments):
            pos += inc
            terms.append(t)
            positions.append(pos)
        return terms, positions, len(terms)

    return _canned


@pytest.fixture(scope="module")
def searcher(spark):
    register_analyzer("canned_posinc", _make_canned())
    try:
        corpus = spark.createDataFrame([(0, "bogus")], ["doc_id", "text"])
        idx = build_index(corpus, analyzer="canned_posinc")
        s = Searcher(idx, corpus=corpus, mode="sql")
        yield s
        idx.unpersist()
    finally:
        from lucene_solr_intervals_spark.analysis.tokenizer import ANALYZERS

        ANALYZERS.pop("canned_posinc", None)


def test_postings_positions_hole_and_overlap(searcher):
    """:105-117 — '1' at position 0, '2' at position 2 (the hole is real),
    and the increment-0 token '4' SHARES position 3 with '3'."""
    rows = {
        r["term"]: sorted(r["positions"])
        for r in searcher.index.postings.collect()
    }
    assert rows["1"] == [0]
    assert rows["2"] == [2]
    assert rows["3"] == [3]
    assert rows["4"] == [3]
    assert rows["5"] == [4]


def _n_hits(searcher, q):
    return searcher.matching(q).count()


def test_phrase_across_hole_and_overlap(searcher):
    # "1 2": consecutive positions required, but there's a hole (:121-126)
    assert _n_hits(searcher, Q.Phrase(("1", "2"))) == 0
    # "2 3": 2@2, 3@3 -> adjacent (:142-146)
    assert _n_hits(searcher, Q.Phrase(("2", "3"))) == 1
    # "3 4": same position, NOT adjacent (:148-152)
    assert _n_hits(searcher, Q.Phrase(("3", "4"))) == 0
    # "2 4": 2@2, 4@3 -> the overlap token continues the phrase (:176-181)
    assert _n_hits(searcher, Q.Phrase(("2", "4"))) == 1
    # "3 5": 3@3, 5@4 (:183-187)
    assert _n_hits(searcher, Q.Phrase(("3", "5"))) == 1
    # "4 5": 4@3, 5@4 (:189-193)
    assert _n_hits(searcher, Q.Phrase(("4", "5"))) == 1
    # "2 5": 2@2, 5@4 — a hole in between (:195-199)
    assert _n_hits(searcher, Q.Phrase(("2", "5"))) == 0


def test_phrase_nonexistent_term_vs_multiphrase(searcher):
    """:162-174 — a phrase containing a term absent from the index fails
    even if another slot term exists at that position; a MULTI-phrase slot
    {3, 9} succeeds because 3 exists."""
    assert _n_hits(searcher, Q.Phrase(("3", "9"))) == 0
    assert _n_hits(searcher, Q.MultiPhrase((frozenset(("3", "9")),))) == 1


def test_sloppy_phrase_bridges_the_hole(searcher):
    """Slop >= 1 lets "1 2" match across the stop hole — the reason holes
    must be preserved rather than positions renumbered."""
    assert _n_hits(searcher, Q.Phrase(("1", "2"), slop=0)) == 0
    assert _n_hits(searcher, Q.Phrase(("1", "2"), slop=1)) == 1
