"""Transcription of the reference's TestFuzzyQuery
(lucene/core/src/test/org/apache/lucene/search/TestFuzzyQuery.java:57
testFuzziness + :42 testBasicPrefix) — match sets across prefix lengths,
rank order by edit distance (FuzzyTermsEnum boost 1 - edits/len), and the
TopTerms expansion cap.
"""

import pytest

from lucene_solr_intervals_spark.search import queries as Q

WORDS = ["aaaaa", "aaaab", "aaabb", "aabbb", "abbbb", "bbbbb", "ddddd"]


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(list(enumerate(WORDS)), ["doc_id", "text"])
    idx = build_index(corpus, analyzer="ws")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def _hits(searcher, term, prefix_length=0, max_edits=2, max_expansions=50):
    q = Q.Fuzzy(term, max_edits=max_edits, prefix_length=prefix_length,
                max_expansions=max_expansions)
    rows = searcher.search(q, k=10).collect()
    return [WORDS[r["doc_id"]] for r in rows]


def test_fuzziness_prefix_sweep(searcher):
    # TestFuzzyQuery.java:72-94 — 'aaaaa'~2 with prefixLength 0..6
    for plen, expected_n in [(0, 3), (1, 3), (2, 3), (3, 3), (4, 2), (5, 1), (6, 1)]:
        got = _hits(searcher, "aaaaa", prefix_length=plen)
        assert len(got) == expected_n, (plen, got)
    # :97-99 — 'bbbbb'~2: bbbbb, abbbb, aabbb
    assert set(_hits(searcher, "bbbbb")) == {"bbbbb", "abbbb", "aabbb"}


def test_rank_order_by_edit_distance(searcher):
    # :128-142 — closer terms first (boost 1 - edits/len)
    assert _hits(searcher, "aaaaa") == ["aaaaa", "aaaab", "aaabb"]
    # 'aaaac' matches nothing exactly; 1-edit aaaaa/aaaab, 2-edit aaabb
    got = _hits(searcher, "aaaac")
    assert got[:2] == ["aaaaa", "aaaab"] and got[2] == "aaabb"


def test_top_terms_expansion_cap(searcher):
    # :109-116 — maxExpansions=2 keeps the two closest terms only
    got = _hits(searcher, "bbbbb", max_expansions=2)
    assert set(got) == {"bbbbb", "abbbb"}
    assert got[0] == "bbbbb"  # exact match outranks the 1-edit expansion


def test_no_match_cases(searcher):
    # :120-125 — nothing within 2 edits
    assert _hits(searcher, "xxxxx") == []
    assert _hits(searcher, "aaccc") == []  # distance 3 to aaaaa


def test_basic_prefix(searcher):
    # :42-52 — FuzzyQuery("abc", 2, prefixLength=1) against doc "abc"... the
    # analog on this corpus: prefix must anchor and still fuzz the suffix
    assert _hits(searcher, "aaaab", prefix_length=1)[0] == "aaaab"
