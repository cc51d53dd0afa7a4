"""Randomized whole-executor fuzz: random query trees over a random corpus,
Spark matching()/scored() doc sets vs a per-document brute-force evaluator
built on the golden-pinned interval kernel.  Catches plumbing bugs (join
shapes, required-term prefilters, minimumNumberShouldMatch, multi-term
expansion, boost propagation) across shapes no hand-written case covers."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.intervals import kernel as IK
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

rng = np.random.RandomState(20260816)

VOCAB = ["red", "blue", "green", "fox", "dog", "cat", "run", "jump", "big", "old"]


def _random_corpus(n_docs: int = 60, max_len: int = 25) -> list[str]:
    docs = []
    for _ in range(n_docs):
        n = rng.randint(1, max_len)
        docs.append(" ".join(VOCAB[i] for i in rng.randint(0, len(VOCAB), n)))
    return docs


def _rand_term() -> Q.Query:
    return Q.Term(VOCAB[rng.randint(len(VOCAB))])


def _rand_query(depth: int = 0) -> Q.Query:
    r = rng.rand()
    if depth >= 2 or r < 0.35:
        return _rand_term()
    if r < 0.55:
        k = rng.randint(2, 4)
        terms = tuple(VOCAB[i] for i in rng.randint(0, len(VOCAB), k))
        slop = int(rng.randint(0, 4)) if rng.rand() < 0.5 else 0
        if slop and len(set(terms)) < len(terms):
            slop = 0  # sloppy repeated-term phrases: iterator-only subtlety
        # the fuzz oracle enumerates intervals -> pin intervals semantics
        return Q.Phrase(terms, slop=slop, scorer="intervals")
    if r < 0.68:
        k = rng.randint(2, 4)
        return Q.OrderedNear(
            int(rng.randint(0, 6)), tuple(_rand_term() for _ in range(k))
        )
    if r < 0.78:
        return Q.UnorderedNear(int(rng.randint(0, 6)), (_rand_term(), _rand_term()))
    must = tuple(_rand_query(depth + 1) for _ in range(rng.randint(0, 3)))
    should = tuple(_rand_query(depth + 1) for _ in range(rng.randint(0, 3)))
    must_not = tuple(_rand_term() for _ in range(rng.randint(0, 2)))
    if not must and not should:
        must = (_rand_term(),)
    msm = int(rng.randint(0, len(should) + 1)) if should else 0
    return Q.Boolean(must, should, must_not, min_should_match=msm)


def _matches_brute(q: Q.Query, pos: dict[str, list[int]]) -> bool:
    """Doc-level predicate via the golden-pinned kernel / set logic."""
    if isinstance(q, Q.Term):
        return bool(pos.get(q.term))
    if isinstance(q, Q.Boolean):
        if any(_matches_brute(c, pos) for c in q.must_not):
            return False
        if not all(_matches_brute(c, pos) for c in q.must):
            return False
        if q.should:
            n = sum(1 for c in q.should if _matches_brute(c, pos))
            msm = q.min_should_match if q.must else max(q.min_should_match, 1)
            if n < msm:
                return False
        return True
    return IK.build_iter(q, pos) is not None


@pytest.fixture(scope="module")
def fuzz_env(spark):
    corpus = _random_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    idx = build_index(df, analyzer="code")
    positions = []
    for text in corpus:
        p: dict[str, list[int]] = {}
        for i, tok in enumerate(text.split()):
            p.setdefault(tok, []).append(i)
        positions.append(p)
    yield Searcher(idx, corpus=df, mode="sql"), positions
    idx.unpersist()


@pytest.mark.parametrize("trial", range(25))
def test_fuzz_matching_equals_brute_force(fuzz_env, trial):
    searcher, positions = fuzz_env
    q = _rand_query()
    expect = sorted(d for d, p in enumerate(positions) if _matches_brute(q, p))
    got = sorted(r["doc_id"] for r in searcher.matching(q).collect())
    assert got == expect, q
    # scored() must return exactly the matching docs (values covered by the
    # oracle suite; here we pin the doc SET under arbitrary composition)
    got_scored = sorted(r["doc_id"] for r in searcher.scored(q).collect())
    assert got_scored == expect, q
