"""End-to-end Spark search tests: index build + query execution vs a pure-
Python oracle (float32 BM25 path) and the golden interval corpus."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_intervals_spark.analysis.tokenizer import ws_tokenize
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.scoring import BM25Stats, encode_norm, idf, score_lucene
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown dog sleeps",
    "a fast brown fox leaps over fences and walls all day long every day",
    "quick quick quick fox",
    "lazy dogs and lazy cats sleep through the quick afternoon",
    "fox",
    "brown brown brown brown fox fox fox quick",
    "nothing relevant here at all just filler words and more filler",
]


def _py_index(corpus):
    docs = []
    for text in corpus:
        terms, positions, doclen = ws_tokenize(text, lowercase=True)
        tfs: dict[str, int] = {}
        for t in terms:
            tfs[t] = tfs.get(t, 0) + 1
        docs.append((tfs, doclen))
    return docs


def _py_topk_term(corpus, term, k=10):
    """Pure-Python float32 BM25 oracle, tie-break (score desc, doc asc)."""
    docs = _py_index(corpus)
    n = len(docs)
    sum_ttf = sum(dl for _, dl in docs)
    stats = BM25Stats(max_doc=n, sum_total_term_freq=sum_ttf)
    cache = stats.cache()
    df = sum(1 for tfs, _ in docs if term in tfs)
    i = idf(df, n)
    out = []
    for doc_id, (tfs, dl) in enumerate(docs):
        if term in tfs:
            nb = encode_norm(np.array([dl]))
            s = score_lucene(np.array([tfs[term]]), nb, i, cache)[0]
            out.append((doc_id, float(s)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


@pytest.fixture(scope="module")
def index(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    idx = build_index(df, analyzer="ws_lower")
    yield idx
    idx.unpersist()


@pytest.fixture(scope="module")
def _register_ws_lower():
    from lucene_solr_intervals_spark.analysis import tokenizer as tk

    tk.ANALYZERS.setdefault("ws_lower", lambda s: tk.ws_tokenize(s, lowercase=True))


@pytest.fixture(scope="module", autouse=True)
def _setup(_register_ws_lower):
    pass


def test_collection_stats(index):
    assert index.max_doc == len(CORPUS)
    assert index.sum_ttf == sum(len(t.split()) for t in CORPUS)


def test_term_topk_matches_python_oracle(index, spark):
    s = Searcher(index, mode="lucene")
    for term in ["fox", "quick", "brown", "lazy"]:
        got = [(r["doc_id"], r["score"]) for r in s.search(Q.Term(term), k=10).collect()]
        want = _py_topk_term(CORPUS, term)
        assert [g[0] for g in got] == [w[0] for w in want], term
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-6), (term, gd)


def test_sql_mode_close_to_lucene_rank(index):
    s = Searcher(index, mode="sql")
    got = [r["doc_id"] for r in s.search(Q.Term("fox"), k=10).collect()]
    want = [d for d, _ in _py_topk_term(CORPUS, "fox")]
    assert set(got) == set(want)


def test_boolean_and(index):
    s = Searcher(index, mode="sql")
    q = Q.Boolean(must=(Q.Term("quick"), Q.Term("fox")))
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    want = sorted(
        i for i, t in enumerate(CORPUS) if "quick" in t.split() and "fox" in t.split()
    )
    assert got == want


def test_boolean_or_scores_sum(index):
    s = Searcher(index, mode="lucene")
    q = Q.Boolean(should=(Q.Term("quick"), Q.Term("fox")))
    rows = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    t_quick = {d: sc for d, sc in _py_topk_term(CORPUS, "quick", k=100)}
    t_fox = {d: sc for d, sc in _py_topk_term(CORPUS, "fox", k=100)}
    for d in rows:
        want = t_quick.get(d, 0.0) + t_fox.get(d, 0.0)
        assert rows[d] == pytest.approx(want, rel=1e-5)


def test_boolean_must_not(index):
    s = Searcher(index, mode="sql")
    q = Q.Boolean(must=(Q.Term("brown"),), must_not=(Q.Term("fox"),))
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    want = sorted(
        i for i, t in enumerate(CORPUS) if "brown" in t.split() and "fox" not in t.split()
    )
    assert got == want


def test_min_should_match(index):
    s = Searcher(index, mode="sql")
    q = Q.Boolean(
        should=(Q.Term("quick"), Q.Term("fox"), Q.Term("lazy")), min_should_match=2
    )
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    want = sorted(
        i
        for i, t in enumerate(CORPUS)
        if sum(w in t.split() for w in ("quick", "fox", "lazy")) >= 2
    )
    assert got == want


def test_min_should_match_with_must_filter_context(index):
    """msm applies even when MUST clauses are present (BooleanQuery.java /
    MinShouldMatchSumScorer.java:38) — both in scored and filter context."""
    s = Searcher(index, mode="sql")
    q = Q.Boolean(
        must=(Q.Term("brown"),),
        should=(Q.Term("quick"), Q.Term("fox"), Q.Term("lazy")),
        min_should_match=2,
    )
    want = sorted(
        i
        for i, t in enumerate(CORPUS)
        if "brown" in t.split()
        and sum(w in t.split() for w in ("quick", "fox", "lazy")) >= 2
    )
    got_filter = sorted(r["doc_id"] for r in s.matching(q).collect())
    got_scored = sorted(r["doc_id"] for r in s.scored(q).collect())
    assert got_filter == want
    assert got_scored == want


def test_phrase(index):
    s = Searcher(index, mode="sql")
    q = Q.Phrase(("quick", "brown"))
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    assert got == [0, 1]
    q2 = Q.Phrase(("brown", "fox"))
    got2 = sorted(r["doc_id"] for r in s.matching(q2).collect())
    assert got2 == [0, 2, 6]


def test_ordered_near(index):
    s = Searcher(index, mode="sql")
    q = Q.OrderedNear(2, (Q.Term("quick"), Q.Term("fox")))
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    # quick ... fox within 2 gaps, ordered: docs 0 (quick brown fox),
    # 3 (quick quick quick fox), 6 (brown... fox fox fox quick? ordered: no
    # quick before fox in 6? "brown brown brown brown fox fox fox quick" - no)
    assert got == [0, 3]


def test_unordered_near(index):
    s = Searcher(index, mode="sql")
    q = Q.UnorderedNear(2, (Q.Term("quick"), Q.Term("fox")))
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    # unordered: doc 6 "... fox fox fox quick" distance fox@6..quick@7 = 0
    assert got == [0, 3, 6]


def test_prefix_and_wildcard(index):
    s = Searcher(index, mode="sql")
    got = sorted(r["doc_id"] for r in s.matching(Q.Prefix("do")).collect())
    want = sorted(
        i for i, t in enumerate(CORPUS) if any(w.startswith("do") for w in t.split())
    )
    assert got == want
    got2 = sorted(r["doc_id"] for r in s.matching(Q.Wildcard("f*x")).collect())
    want2 = sorted(
        i
        for i, t in enumerate(CORPUS)
        if any(w.startswith("f") and w.endswith("x") for w in t.split())
    )
    assert got2 == want2


def test_fuzzy(index):
    s = Searcher(index, mode="sql")
    got = sorted(r["doc_id"] for r in s.matching(Q.Fuzzy("quik", max_edits=1)).collect())
    want = sorted(i for i, t in enumerate(CORPUS) if "quick" in t.split())
    assert got == want


def test_scoring_boolean_rewrite(index):
    """SCORING_BOOLEAN rewrite: score = sum of per-term BM25 scores
    (MultiTermQuery.java:114), computed without collecting terms."""
    s = Searcher(index, mode="sql")
    q = Q.Prefix("qu", rewrite="scoring_boolean")
    got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    # only 'quick' starts with qu in the corpus -> equals the term scores
    want = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("quick")).collect()}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_top_terms_expansion_cap(index):
    """TopTerms cap (MultiTermQuery.java:234): max_expansions keeps only the
    highest-df terms; the doc set shrinks accordingly."""
    s = Searcher(index, mode="sql")
    uncapped = sorted(r["doc_id"] for r in s.matching(Q.Prefix("f")).collect())
    # 'f' expands to fox/fences/fast/filler/foxes... cap to top-1 by df = fox
    capped = sorted(
        r["doc_id"] for r in s.matching(Q.Prefix("f", max_expansions=1)).collect()
    )
    fox_docs = sorted(r["doc_id"] for r in s.matching(Q.Term("fox")).collect())
    assert capped == fox_docs
    assert set(capped) <= set(uncapped)
    # positional context: the capped expansion bounds the driver collect too
    expanded = s._expand_tree(Q.Prefix("f", max_expansions=1))
    assert expanded == Q.Term("fox")


def test_dismax(index):
    s = Searcher(index, mode="lucene")
    q = Q.DisjunctionMax((Q.Term("quick"), Q.Term("fox")), tie_breaker=0.5)
    rows = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    t_quick = dict(_py_topk_term(CORPUS, "quick", k=100))
    t_fox = dict(_py_topk_term(CORPUS, "fox", k=100))
    for d, sc in rows.items():
        a, b = t_quick.get(d, 0.0), t_fox.get(d, 0.0)
        want = max(a, b) + 0.5 * (a + b - max(a, b))
        assert sc == pytest.approx(want, rel=1e-5)


def test_search_after(index):
    s = Searcher(index, mode="lucene")
    q = Q.Term("quick")
    all_hits = [(r["doc_id"], r["score"]) for r in s.search(q, k=100).collect()]
    if len(all_hits) > 2:
        top2 = all_hits[:2]
        rest = s.search_after(q, k=10, after_score=top2[-1][1], after_doc=top2[-1][0])
        got = [r["doc_id"] for r in rest.collect()]
        assert got == [d for d, _ in all_hits[2:]]


def test_interval_filtered_range(index):
    # "fox in the first 2 positions"
    s = Searcher(index, mode="sql")
    q = Q.IntervalFiltered(Q.Term("fox"), Q.RangeFilter(0, 1))
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    want = sorted(i for i, t in enumerate(CORPUS) if "fox" in t.split()[:2])
    assert got == want


def test_intervals_output(index):
    s = Searcher(index, mode="sql")
    q = Q.OrderedNear(2, (Q.Term("quick"), Q.Term("fox")))
    rows = [(r["doc_id"], r["begin"], r["end"]) for r in s.intervals(q).collect()]
    assert (0, 1, 3) in rows  # doc 0: quick@1 .. fox@3


def test_highlight(index, spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    s = Searcher(index, corpus=df, mode="lucene")
    q = Q.OrderedNear(2, (Q.Term("quick"), Q.Term("fox")))
    rows = {r["doc_id"]: r for r in s.highlight(q, k=10, pad=5).collect()}
    assert 0 in rows
    r0 = rows[0]
    # doc 0: "the quick brown fox ..." -> interval tokens quick..fox
    assert r0["begin"] == 1 and r0["end"] == 3
    assert CORPUS[0][r0["offset_begin"]:r0["offset_end"]] == "quick brown fox"
    assert "quick brown fox" in r0["snippet"]


def test_search_with_timeout(index, spark):
    """TimeLimitingCollector analog: within budget returns the same hits;
    an exhausted budget cancels and raises TimeExceeded."""
    import time

    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.search.executor import TimeExceeded

    s = Searcher(index, mode="sql")
    q = Q.Term("fox")
    want = [(r["doc_id"], round(r["score"], 6)) for r in s.search(q, 5).collect()]
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in s.search_with_timeout(q, 5, timeout_sec=120.0).collect()
    ]
    assert got == want

    # an artificially slow plan must be cancelled, not awaited
    slow = Searcher(index, mode="sql")

    @F.udf("double")
    def _sleepy(x):
        time.sleep(30)
        return float(x)

    class SlowIndex:
        def __init__(self, idx):
            self.postings = idx.postings.withColumn("tf", _sleepy("tf"))
            self.docs = idx.docs
            self.term_stats = idx.term_stats
            self.max_doc = idx.max_doc
            self.sum_ttf = idx.sum_ttf
            self.default_field = idx.default_field
            self.avgdl_by_field = idx.avgdl_by_field
            self.avgdl = idx.avgdl

        def avgdl_of(self, f):
            return self.avgdl

    slow.index = SlowIndex(index)
    t0 = time.time()
    import pytest as _pytest

    with _pytest.raises(TimeExceeded):
        slow.search_with_timeout(q, 5, timeout_sec=3.0)
    assert time.time() - t0 < 20  # cancelled well before the 30s sleep chain


def test_fuzzy_pruned_scan(index):
    """FuzzyTermsEnum-style pruning: the term-dict scan carries a sound
    length band and (with prefix_length) a startswith predicate ahead of the
    levenshtein evaluation — visible in the optimized plan — and the matched
    set is unchanged by the pruning."""
    s = Searcher(index, mode="sql")
    base = sorted(r["doc_id"] for r in s.matching(Q.Fuzzy("quik", max_edits=1)).collect())
    pfx = sorted(
        r["doc_id"]
        for r in s.matching(Q.Fuzzy("quik", max_edits=1, prefix_length=1)).collect()
    )
    # all edits of 'quik' within the corpus keep the leading 'q'
    assert pfx == base

    plan = (
        s.matching(Q.Fuzzy("quik", max_edits=1, prefix_length=1))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "StartsWith(term" in plan.replace(" ", "").replace("'", "") or "StartsWith" in plan
    assert "length(term" in plan
    # thresholded levenshtein (early-exit form)
    assert "levenshtein" in plan
