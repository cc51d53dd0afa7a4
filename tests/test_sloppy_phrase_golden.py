"""Transcription of the reference's TestSloppyPhraseQuery
(lucene/core/src/test/org/apache/lucene/search/TestSloppyPhraseQuery.java:34)
— the repeated-term sloppy-phrase semantics (LUCENE-3412) as match-count
goldens against this engine's sloppy kernel.
"""

import pytest

from lucene_solr_intervals_spark.search import queries as Q

S_1 = "A A A"
S_2 = "A 1 2 3 A 4 5 6 A"
DOCS = {
    "DOC_1": f"X {S_1} Y",
    "DOC_2": f"X {S_2} Y",
    "DOC_3": f"X {S_1} A Y",
    "DOC_1_B": f"X {S_1} Y N N N N {S_1} Z",
    "DOC_2_B": f"X {S_2} Y N N N N {S_2} Z",
    "DOC_3_B": f"X {S_1} A Y N N N N {S_1} A Y",
    "DOC_4": "A A X A X B A X B B A A X B A A",
    "DOC_5_3": "H H H X X X H H H X X X H H H",
    "DOC_5_4": "H H H H",
}
IDS = {name: i for i, name in enumerate(DOCS)}

QUERY_1 = tuple(S_1.split())
QUERY_2 = tuple(S_2.split())
QUERY_4 = ("X", "A", "A")
QUERY_5_4 = ("H", "H", "H", "H")


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [(IDS[n], t) for n, t in DOCS.items()], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="ws")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def _matches(searcher, doc, terms, slop):
    rows = searcher.scored(Q.Phrase(terms, slop=slop)).collect()
    return sum(1 for r in rows if r["doc_id"] == IDS[doc])


def test_doc4_query4_all_slops_match(searcher):
    # TestSloppyPhraseQuery.java:59 — only the 3rd A-run matches "X A A";
    # every slop in 1..7 finds exactly that one occurrence
    for slop in range(1, 8):
        assert _matches(searcher, "DOC_4", QUERY_4, slop) == 1, slop


def test_doc1_query1_all_slops_match(searcher):
    # :71 — exact match, every slop succeeds (both doc variants)
    for slop in range(0, 4):
        assert _matches(searcher, "DOC_1", QUERY_1, slop) == 1, slop
        assert _matches(searcher, "DOC_1_B", QUERY_1, slop) == 1, slop


def test_doc2_query1_slop6_boundary(searcher):
    # :84 — 6 is the minimum slop for "A A A" to match "A 1 2 3 A 4 5 6 A"
    for slop in range(0, 6):
        assert _matches(searcher, "DOC_2", QUERY_1, slop) == 0, slop
    for slop in range(6, 9):
        assert _matches(searcher, "DOC_2", QUERY_1, slop) == 1, slop
        assert _matches(searcher, "DOC_2_B", QUERY_1, slop) == 1, slop


def test_doc2_query2_all_slops_match(searcher):
    # :100 — exact match of the interleaved phrase at every slop
    for slop in range(0, 4):
        assert _matches(searcher, "DOC_2", QUERY_2, slop) == 1, slop
        assert _matches(searcher, "DOC_2_B", QUERY_2, slop) == 1, slop


def test_doc3_query1_all_slops_match(searcher):
    # :112 — "X A A A A Y" contains "A A A" exactly
    for slop in range(0, 4):
        assert _matches(searcher, "DOC_3", QUERY_1, slop) == 1, slop
        assert _matches(searcher, "DOC_3_B", QUERY_1, slop) == 1, slop


def test_doc5_lucene3412_consistency(searcher):
    # :121 (LUCENE-3412) — "H H H H" must steadily match "H H H H" and
    # steadily NOT match "H H H X X X H H H X X X H H H" for slop 0..2
    # (three H-runs of length 3 can never supply 4 H's within the slop)
    for slop in range(0, 3):
        assert _matches(searcher, "DOC_5_4", QUERY_5_4, slop) == 1, slop
        assert _matches(searcher, "DOC_5_3", QUERY_5_4, slop) == 0, slop


def test_packed_path_matches_exploded(spark, tmp_path):
    """The packed SegmentSearcher scores classic sloppy phrases with the
    same SloppyPhraseScorer walk — cross-path doc-set equality on the
    repeat-heavy golden corpus."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.index.segment import build_segments
    from lucene_solr_intervals_spark.search.executor import Searcher
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = spark.createDataFrame(
        [(IDS[n], t) for n, t in DOCS.items()], ["doc_id", "text"]
    )
    index_dir = str(tmp_path / "idx")
    build_segments(corpus, index_dir, n_segments=2, id_col="doc_id",
                   text_col="text", analyzer="ws", n_docs_hint=len(DOCS))
    ss = SegmentSearcher(spark, index_dir)
    idx = build_index(corpus, analyzer="ws")
    s = Searcher(idx, corpus=corpus, mode="lucene")
    for terms, slop in [(QUERY_1, 1), (QUERY_1, 6), (QUERY_4, 2), (QUERY_5_4, 1)]:
        q = Q.Phrase(terms, slop=slop)
        a = {(r["doc_id"], round(float(r["score"]), 5))
             for r in s.scored(q).collect()}
        b = {(r["doc_id"], round(float(r["score"]), 5))
             for r in ss.search_intervals(q, k=20).collect()}
        assert a == b, (terms, slop)
    idx.unpersist()


def _freq(doc, terms, slop):
    from lucene_solr_intervals_spark.search.sloppy import sloppy_phrase_freq

    pos = {}
    for i, t in enumerate(DOCS[doc].split()):
        pos.setdefault(t, []).append(i)
    _, f = sloppy_phrase_freq(terms, pos, slop)
    return f


def test_freq_comparisons():
    # the reference's checkPhraseQuery freq assertions: the _B docs carry a
    # SECOND occurrence, so their sloppy freq strictly exceeds the single
    # occurrence's (TestSloppyPhraseQuery.java:73-75, :87-91, :102-104,
    # :114-116)
    for slop in range(0, 4):
        assert _freq("DOC_1_B", QUERY_1, slop) > _freq("DOC_1", QUERY_1, slop)
        assert _freq("DOC_2_B", QUERY_2, slop) > _freq("DOC_2", QUERY_2, slop)
        assert _freq("DOC_3_B", QUERY_1, slop) > _freq("DOC_3", QUERY_1, slop)
    for slop in range(6, 9):
        assert _freq("DOC_2_B", QUERY_1, slop) > _freq("DOC_2", QUERY_1, slop)
