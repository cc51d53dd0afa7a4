"""PostingsHighlighter analog: sentence passages + PassageScorer shape."""

import pytest

from lucene_solr_intervals_spark.search import queries as Q


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [
            (
                0,
                "alpha beta here. nothing to see. alpha alpha beta. "
                "just filler words.",
            ),
            (1, "no match at all. still nothing."),
            (2, "alpha only sentence."),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def test_sentence_passages_ranked(searcher):
    rows = searcher.highlight_passages(
        Q.Boolean(should=(Q.Term("alpha"), Q.Term("beta"))), k=3, n_passages=2
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: best passage is the double-alpha sentence — same token count as
    # the single-alpha one (equal length norm), higher alpha tf wins
    p0 = sorted(by_doc[0], key=lambda r: r["passage_rank"])
    assert "alpha alpha beta" in p0[0]["snippet"]
    assert p0[0]["passage_score"] > p0[1]["passage_score"]
    # snippets are real sentence substrings
    assert p0[0]["snippet"].strip().endswith(".")
    # unmatched sentences are never emitted as passages
    for r in rows:
        assert "nothing" not in r["snippet"] and "filler" not in r["snippet"]
    # doc 1 has no query match -> no passages
    assert 1 not in by_doc
    assert len(by_doc[2]) == 1


def test_passage_offsets_align(searcher):
    rows = searcher.highlight_passages(Q.Term("alpha"), k=3, n_passages=1).collect()
    text0 = "alpha beta here. nothing to see. alpha alpha beta. just filler words."
    for r in rows:
        if r["doc_id"] == 0:
            assert text0[r["offset_begin"] : r["offset_end"]] == r["snippet"]


def test_queryscorer_rare_term_fragment_outranks_frequent(spark):
    """QueryScorer-grade fragment ranking (QueryScorer.java:147-171): the
    fragment score is the summed idf of UNIQUE matched terms, so a fragment
    holding one RARE term must outrank an earlier fragment holding many
    occurrences of a COMMON term."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    # "common" in every doc (low idf); "rareword" only in doc 0 (high idf)
    target = (
        "common stuff common again common yet more common here "  # frag 1
        + "plain filler text goes on and on for a while longer "  # gap
        + "rareword appears once in this later fragment only "    # frag 2+
    )
    rows = [(0, target)] + [(i, f"common filler number {i}") for i in range(1, 8)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    frags = [
        r
        for r in s.highlight_fragments(
            Q.Boolean(should=(Q.Term("common"), Q.Term("rareword"))),
            k=3,
            n_fragments=3,
            fragment_size=55,
        ).collect()
        if r["doc_id"] == 0
    ]
    by_rank = sorted(frags, key=lambda r: r["frag_rank"])
    assert "rareword" in by_rank[0]["snippet"]
    # the common-term fragment has MORE matches yet ranks below
    common_frag = next(r for r in by_rank if "rareword" not in r["snippet"])
    assert common_frag["n_matches"] > by_rank[0]["n_matches"]
    assert common_frag["frag_score"] < by_rank[0]["frag_score"]
    idx.unpersist()


def test_multicolor_tagged_snippets(spark):
    """FVH-style colored tags (vectorhighlight/BaseFragmentsBuilder
    COLORED_PRE_TAGS role): each query leaf term gets its own tag class and
    every interval-matched occurrence is wrapped."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [(0, "alpha beta alpha gamma"), (1, "gamma delta")], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    rows = s.highlight_fragments(
        Q.Boolean(should=(Q.Term("alpha"), Q.Term("beta"))), k=2,
        n_fragments=1, fragment_size=200,
    ).collect()
    r0 = next(r for r in rows if r["doc_id"] == 0)
    tagged = r0["snippet_tagged"]
    # both occurrences of alpha wrapped, beta wrapped with a DIFFERENT class
    assert tagged.count(">alpha</b>") == 2
    assert tagged.count(">beta</b>") == 1
    import re
    classes = set(re.findall(r'<b class="(hl\d+)">', tagged))
    assert len(classes) == 2
    # untagged text preserved verbatim
    assert re.sub(r"</?b[^>]*>", "", tagged) == r0["snippet"]
    idx.unpersist()
