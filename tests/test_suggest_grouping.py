"""Suggest (prefix/infix/stored), collapse+expand, and the xxhash64 minhash
fast path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher
from lucene_solr_intervals_spark.search.grouping import collapse_expand, group_topk
from lucene_solr_intervals_spark.search.suggest import (
    suggest_infix,
    suggest_prefix,
    suggest_stored,
)

CORPUS = [
    (0, "merge sort and merge join", "a"),
    (1, "merge the sorted runs", "a"),
    (2, "sort sort sort quickly", "a"),
    (3, "mermaid merchant merge", "b"),
    (4, "quick sort beats bubble sort", "b"),
    (5, "sorting networks merge", "b"),
    (6, "merge merge merge merge", "c"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text", "source"])


@pytest.fixture(scope="module")
def index(corpus):
    idx = build_index(corpus, analyzer="code")
    yield idx
    idx.unpersist()


def test_suggest_prefix_weight_order(index):
    got = [(r["suggestion"], r["weight"]) for r in suggest_prefix(index, "mer", k=10).collect()]
    # merge df=5 docs, mermaid df=1, merchant df=1 -> weight desc, term asc
    assert got == [("merge", 5), ("merchant", 1), ("mermaid", 1)]
    # k caps
    assert len(suggest_prefix(index, "mer", k=2).collect()) == 2


def test_suggest_infix(index):
    got = [r["suggestion"] for r in suggest_infix(index, "ort", k=10).collect()]
    # sort (df 3), sorted (1), sorting (1) — all contain 'ort'
    assert got[0] == "sort"
    assert set(got) == {"sort", "sorted", "sorting"}


def test_suggest_stored(corpus):
    titled = corpus.withColumn("views", F.col("doc_id") * 10 + 1)
    got = [
        (r["suggestion"], r["weight"])
        for r in suggest_stored(titled, "text", "views", "MERGE", k=3).collect()
    ]
    # case-insensitive infix over stored text, weight desc
    assert got[0][0] == "merge merge merge merge"
    assert [w for _, w in got] == sorted([w for _, w in got], reverse=True)


def test_collapse_expand(spark, corpus, index):
    s = Searcher(index, mode="sql")
    hits = s.scored(Q.Term("merge")).join(
        corpus.select(F.col("doc_id").cast("long").alias("doc_id"), "source"), "doc_id"
    )
    collapsed, expanded = collapse_expand(hits, "source", n_expand=1)
    col_rows = {r["source"]: r["doc_id"] for r in collapsed.collect()}
    exp_rows = {(r["source"], r["doc_id"]) for r in expanded.collect()}
    # one head per group that has merge-matching docs
    assert set(col_rows) == {"a", "b", "c"}
    # expanded never contains a head, and <= 1 per group
    for src, d in exp_rows:
        assert col_rows[src] != d
    per_group = {}
    for src, _ in exp_rows:
        per_group[src] = per_group.get(src, 0) + 1
    assert all(v <= 1 for v in per_group.values())
    # group c has a single matching doc -> no expand rows
    assert "c" not in per_group
    # group_topk(k=2) == collapsed + expanded(n=1)
    both = {(r["source"], r["doc_id"]) for r in group_topk(hits, "source", 2).collect()}
    assert both == exp_rows | {(s_, d) for s_, d in col_rows.items()}


def test_minhash_xxhash64_fast_path(spark):
    """Both hash families find the planted near-duplicate pair; md5 mode
    stays the oracle default."""
    from lucene_solr_intervals_spark.ops.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [(i, base + f"unique tail {i} " + "filler words " * i) for i in range(8)]
    rows.append((100, base + "unique tail 0 tiny edit"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(num_hashes=16, bands=8, threshold=0.5)
    md5_pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, **kw).collect()}
    xx_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, hash_family="xxhash64", **kw).collect()
    }
    assert (0, 100) in md5_pairs
    assert (0, 100) in xx_pairs


def test_multi_fragment_highlighting(spark):
    """Highlighter.getBestFragments analog: N fragments per doc with
    non-overlapping offset windows on a doc with multiple match clusters."""
    text = (
        "alpha beta gamma " * 6          # no matches: chars 0..101
        + "target here and target again "  # cluster 1 (2 matches)
        + "filler words only " * 6         # gap
        + "target once more "              # cluster 2 (1 match)
        + "padding tail " * 5
    )
    corpus = spark.createDataFrame([(0, text), (1, "no match at all")], ["doc_id", "text"])
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    rows = s.highlight_fragments(
        Q.Term("target"), k=5, n_fragments=3, fragment_size=80
    ).collect()
    assert rows and all(r["doc_id"] == 0 for r in rows)
    # non-overlapping windows
    spans = sorted((r["offset_begin"], r["offset_end"]) for r in rows)
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0
    # rank 1 is the densest fragment and every fragment contains a match
    by_rank = sorted(rows, key=lambda r: r["frag_rank"])
    assert by_rank[0]["n_matches"] == max(r["n_matches"] for r in rows)
    assert all("target" in r["snippet"] for r in rows)
    assert sum(r["n_matches"] for r in rows) == 3
    idx.unpersist()


def test_ngram_phrase_rewrite_equivalence(spark):
    """NGramPhraseQuery.rewrite correctness: on a REAL n-gram field (bigrams
    of contiguous text) the gapped query must match exactly the docs and
    freqs of the full phrase, via both the kernel and the packed path."""
    import random

    rng = random.Random(5)
    alpha = "abcdef"
    rows = []
    for i in range(80):
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(4, 12)))
        if i % 7 == 0:  # plant the target so the check is non-vacuous
            word = word[: rng.randint(0, 3)] + "abcde" + word[rng.randint(0, 3):]
        grams = " ".join(word[j : j + 2] for j in range(len(word) - 1))
        rows.append((i, grams))
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = build_index(corpus, analyzer="ws")
    s = Searcher(idx, mode="sql")
    target = ("ab", "bc", "cd", "de")  # grams of 'abcde'
    full = {r["doc_id"]: r["score"] for r in s.scored(Q.Phrase(target)).collect()}
    ng = Q.NGramPhrase(target, n=2)
    assert ng.kept_slots() == (("ab", 0), ("cd", 2), ("de", 3))
    got = {r["doc_id"]: r["score"] for r in s.scored(ng).collect()}
    # same doc set; same match freq (scores differ: idf over kept terms only)
    assert set(got) == set(full)
    assert got, "vacuous: no doc contains abcde-grams"
    # kernel fallback == vectorized shape
    from lucene_solr_intervals_spark.intervals import kernel as IK
    pos = {"ab": [0, 9], "bc": [1], "cd": [2, 11], "de": [3, 12]}
    m = IK.match_intervals(ng, pos)
    # (9,12) matches WITHOUT bc@10 — the rewrite never checks skipped slots
    assert m == [(0, 3), (9, 12)]
    assert IK.match_intervals(Q.Phrase(target), pos) == [(0, 3)]
    idx.unpersist()


def test_suggest_stored_aux_parity(corpus):
    """Round-5: the aux suffix relation path must return the same
    suggestions as the contains scan (after max-weight dedup)."""
    from lucene_solr_intervals_spark.search.suggest import (
        build_stored_infix_index,
    )

    titled = corpus.withColumn("views", F.col("doc_id") * 10 + 1)
    aux = build_stored_infix_index(titled, "text", "views")
    got_aux = [
        (r["suggestion"], r["weight"])
        for r in suggest_stored(titled, "text", "views", "MERGE", k=50, aux=aux).collect()
    ]
    # contains path, deduped the same way
    scan = suggest_stored(titled, "text", "views", "MERGE", k=50)
    got_scan = {}
    for r in scan.collect():
        got_scan[r["suggestion"]] = max(
            got_scan.get(r["suggestion"], float("-inf")), r["weight"]
        )
    expect = sorted(got_scan.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got_aux == expect
    assert len(got_aux) > 0


def test_suggest_infix_aux_wrong_field_guard(index):
    """ADVICE round-4: an aux index built for field A must not silently
    serve suggestions when field B is requested."""
    from lucene_solr_intervals_spark.search.suggest import build_infix_index

    aux = build_infix_index(index)  # built for the default field
    ok = suggest_infix(index, "ort", k=10, aux=aux).collect()
    assert len(ok) > 0
    wrong = suggest_infix(index, "ort", k=10, field="bogus", aux=aux).collect()
    assert wrong == []


def test_block_join_grouped_hits(spark):
    """ToParentBlockJoinCollector analog: parent order = aggregated child
    score, children ranked within, score modes Max/Total/Avg
    (ToParentBlockJoinCollector.java:78, ToParentBlockJoinQuery ScoreMode)."""
    from lucene_solr_intervals_spark.search.grouping import block_join_grouped_hits

    rows = [  # (doc_id, parent, score)
        (1, "p1", 5.0), (2, "p1", 3.0), (3, "p1", 1.0), (4, "p1", 0.5),
        (5, "p2", 4.0), (6, "p2", 4.0),
        (7, "p3", 6.0),
        (8, "p4", 0.1), (9, "p4", 0.2),
    ]
    hits = spark.createDataFrame(rows, ["doc_id", "parent", "score"])
    out = block_join_grouped_hits(
        hits, "parent", k_parents=3, k_children=2, score_mode="max"
    ).collect()
    got = [
        (r["parent"], r["parent_rank"], r["doc_id"], r["child_rank"], r["score"])
        for r in sorted(out, key=lambda r: (r["parent_rank"], r["child_rank"]))
    ]
    # max scores: p3=6, p1=5, p2=4 (p4=0.2 cut); ties in p2 break by doc_id
    assert got == [
        ("p3", 1, 7, 1, 6.0),
        ("p1", 2, 1, 1, 5.0), ("p1", 2, 2, 2, 3.0),
        ("p2", 3, 5, 1, 4.0), ("p2", 3, 6, 2, 4.0),
    ]

    # total mode reorders: p1=9.5 > p2=8 > p3=6
    tot = block_join_grouped_hits(
        hits, "parent", k_parents=2, k_children=1, score_mode="total"
    ).collect()
    order = sorted({(r["parent_rank"], r["parent"]) for r in tot})
    assert order == [(1, "p1"), (2, "p2")]

    # avg mode: p3=6 > p2=4 > p1=2.375
    avg = block_join_grouped_hits(
        hits, "parent", k_parents=2, k_children=1, score_mode="avg"
    ).collect()
    order = sorted({(r["parent_rank"], r["parent"]) for r in avg})
    assert order == [(1, "p3"), (2, "p2")]


def test_analyzing_suggester(spark):
    """AnalyzingSuggester (AnalyzingSuggester.java:86): analyzed-key prefix
    match, weight-descending, EXACT_FIRST, surface-form merging under the
    stop+lowercase chain, empty analyzed query -> no results."""
    from lucene_solr_intervals_spark.search.suggest import (
        build_analyzing_index,
        suggest_analyzing,
    )

    rows = [
        ("The Ghost", 5.0),
        ("ghost", 3.0),
        ("Ghost Story", 9.0),
        ("guitar", 2.0),
        ("a the of", 1.0),  # analyzes to nothing: dropped at build
    ]
    df = spark.createDataFrame(rows, ["title", "views"])
    aux = build_analyzing_index(df, "title", "views", analyzer="stop").persist()

    # "The Ghost" and "ghost" merge on key "ghost"; "gho" completes all 3
    got = [(r["suggestion"], r["weight"]) for r in
           suggest_analyzing(aux, "gho", k=10, analyzer="stop").collect()]
    assert got == [("Ghost Story", 9.0), ("The Ghost", 5.0), ("ghost", 3.0)]

    # EXACT_FIRST: exact analyzed matches outrank the heavier completion
    got = [(r["suggestion"], r["weight"]) for r in
           suggest_analyzing(aux, "the GHOST", k=10, analyzer="stop").collect()]
    assert got == [("The Ghost", 5.0), ("ghost", 3.0), ("Ghost Story", 9.0)]
    # ... and without it, pure weight order
    got = [(r["suggestion"], r["weight"]) for r in
           suggest_analyzing(aux, "the GHOST", k=10, analyzer="stop",
                             exact_first=False).collect()]
    assert got == [("Ghost Story", 9.0), ("The Ghost", 5.0), ("ghost", 3.0)]

    # multi-token prefix with PRESERVE_SEP: "ghost s" -> key "ghost\x1fs"
    got = [r["suggestion"] for r in
           suggest_analyzing(aux, "ghost s", k=10, analyzer="stop").collect()]
    assert got == ["Ghost Story"]

    # stop-analyzed empty query returns no results (reference limitation)
    assert suggest_analyzing(aux, "the", k=10, analyzer="stop").collect() == []

    # inline (no prebuilt aux) path agrees
    inline = [(r["suggestion"], r["weight"]) for r in
              suggest_analyzing(df, "gho", k=10, text_col="title",
                                weight_col="views", analyzer="stop").collect()]
    assert inline == [("Ghost Story", 9.0), ("The Ghost", 5.0), ("ghost", 3.0)]
    aux.unpersist()
