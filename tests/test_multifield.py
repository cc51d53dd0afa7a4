"""Multi-field engine end-to-end: per-field stats/norms/scoring, cross-field
Boolean queries, and the fielded-intervals collector through Spark."""

from __future__ import annotations

import math

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.intervals.kernel import fielded_collect
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

ROWS = [
    # (doc_id, title, body)
    (0, "fox jumps", "the quick brown fox jumps over the lazy dog"),
    (1, "lazy dog sleeps", "the quick brown dog sleeps all day"),
    (2, "fox", "a fast brown fox leaps over fences and walls"),
    (3, "quick quick fox", "quick quick quick fox"),
    (4, "afternoon nap", "lazy dogs and lazy cats sleep through the afternoon"),
]


@pytest.fixture(scope="module")
def index(spark):
    corpus = spark.createDataFrame(ROWS, ["doc_id", "title", "body"])
    idx = build_index(
        corpus, id_col="doc_id", analyzer="code",
        fields={"title": "title", "body": "body"}, text_col="body",
    )
    yield idx
    idx.unpersist()


def _toks(s):
    return s.lower().split()


def test_per_field_stats(index):
    assert index.max_doc == 5
    assert index.default_field == "body"
    titles = [_toks(t) for _, t, _ in ROWS]
    bodies = [_toks(b) for _, _, b in ROWS]
    assert index.avgdl_by_field["title"] == pytest.approx(
        sum(len(t) for t in titles) / 5
    )
    assert index.avgdl_by_field["body"] == pytest.approx(
        sum(len(b) for b in bodies) / 5
    )
    # df is per field: 'fox' in 3 titles, 3 bodies; 'lazy' in 1 title, 2 bodies
    stats = {
        (r["field"], r["term"]): int(r["df"])
        for r in index.term_stats.collect()
    }
    assert stats[("title", "fox")] == 3
    assert stats[("body", "fox")] == 3
    assert stats[("title", "lazy")] == 1
    assert stats[("body", "lazy")] == 2


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * (k1 + 1) * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def test_fielded_term_scoring(index):
    s = Searcher(index, mode="sql")
    got = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("lazy", field="title")).collect()}
    titles = [_toks(t) for _, t, _ in ROWS]
    avgdl = sum(len(t) for t in titles) / 5
    want = {
        i: _bm25(t.count("lazy"), 1, 5, len(t), avgdl)
        for i, t in enumerate(titles)
        if "lazy" in t
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_default_field_unchanged(index):
    """Queries without a field hit the default field with its own stats."""
    s = Searcher(index, mode="sql")
    got = sorted(r["doc_id"] for r in s.matching(Q.Term("lazy")).collect())
    assert got == [0, 4]  # body occurrences only (doc 1 has it only in title)


def test_cross_field_boolean(index):
    s = Searcher(index, mode="sql")
    q = Q.Boolean(must=(Q.Term("fox", field="title"), Q.Term("quick")))
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    assert got == [0, 3]
    # scored = sum of the per-field leaf scores
    scores = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    t = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("fox", field="title")).collect()}
    b = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("quick")).collect()}
    for d in got:
        assert scores[d] == pytest.approx(t[d] + b[d], rel=1e-9)


def test_fielded_phrase_binding(index):
    s = Searcher(index, mode="sql")
    got = sorted(
        r["doc_id"] for r in s.matching(Q.Phrase(("lazy", "dog"), field="title")).collect()
    )
    assert got == [1]
    got_body = sorted(
        r["doc_id"] for r in s.matching(Q.Phrase(("lazy", "dog"))).collect()
    )
    assert got_body == [0]


def test_cross_field_positional_rejected(index):
    s = Searcher(index, mode="sql")
    q = Q.OrderedNear(3, (Q.Term("fox", field="title"), Q.Term("dog", field="body")))
    with pytest.raises(ValueError):
        s.scored(q)


def test_fielded_intervals_spark_matches_kernel(index):
    s = Searcher(index, mode="sql")
    q = Q.Boolean(must=(Q.Term("fox", field="title"),), should=(Q.Term("lazy"),))
    rows = s.fielded_intervals(q).collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["field"], r["begin"], r["end"]))
    for d in got:
        got[d] = sorted(got[d], key=lambda m: (m[0], m[1], -m[2]))
    expect = {}
    for doc_id, title, body in ROWS:
        pos: dict[tuple[str, str], list[int]] = {}
        for f, text in (("title", title), ("body", body)):
            for i, tok in enumerate(_toks(text)):
                pos.setdefault((f, tok), []).append(i)
        m = fielded_collect(q, pos, "body")
        if m is not None:
            expect[doc_id] = m
    assert got == expect
