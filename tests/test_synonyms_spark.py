"""End-to-end SynonymFilter chain through build_index + Searcher.

Covers what TestSynonymMapFilter can't pin scalar-side:
* overlap postings reach the index (posInc=0 synonym at the same position),
* phrase queries match ACROSS a synonym (`"vettore window"` where vettore
  was injected over vector),
* same-position interval matching (vector and vettore co-located),
* discountOverlaps norm accounting (BM25Similarity.java:55-57): doclen =
  distinct positions; avgdl = sumTotalTermFreq / maxDoc INCLUDING the
  injected tokens (BM25Similarity.java:82-89).
"""

from __future__ import annotations

import math

import pytest

from lucene_solr_intervals_spark.analysis.synonyms import SynonymMap
from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    register_synonym_analyzer,
)
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

DOCS = [
    (0, "vector window merge"),   # bigram -> viewport; no lone vector
    (1, "vector merge window"),   # lone vector -> vettore
    (2, "merge vector"),          # lone vector at end -> vettore
    (3, "window table row"),      # no synonyms
]


@pytest.fixture(scope="module")
def syn_index(spark):
    if "syn_e2e" not in ANALYZERS:
        syn = SynonymMap()
        syn.add("vector", "vettore", True)
        syn.add("vector window", "viewport", True)
        register_synonym_analyzer("syn_e2e", syn, base="code")
    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_index(corpus, analyzer="syn_e2e")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield idx, s
    idx.unpersist()


def _postings(idx, term):
    return {
        int(r["doc_id"]): list(r["positions"])
        for r in idx.postings.where(idx.postings.term == term).collect()
    }


def test_injected_postings(syn_index):
    idx, _ = syn_index
    # greedy: doc 0's vector window becomes viewport (no vettore)
    assert _postings(idx, "viewport") == {0: [0]}
    assert _postings(idx, "vettore") == {1: [0], 2: [1]}
    # originals kept (keepOrig=true)
    assert _postings(idx, "vector") == {0: [0], 1: [0], 2: [1]}


def test_discounted_norms_and_avgdl(syn_index):
    idx, _ = syn_index
    dl = {int(r["doc_id"]): int(r["doclen"]) for r in idx.docs.collect()}
    # doclen = distinct positions (overlaps discounted): all docs read 3/3/2/3
    assert dl == {0: 3, 1: 3, 2: 2, 3: 3}
    # sum_ttf counts EVERY emitted token: 11 originals + 3 injected
    assert idx.sum_ttf == 14
    assert math.isclose(idx.avgdl, 14 / 4)


def test_phrase_across_synonym(syn_index):
    _, s = syn_index
    # "vettore merge" matches doc 1 (vettore stacked over vector at pos 0)
    hits = sorted(
        int(r["doc_id"]) for r in s.matching(Q.Phrase(("vettore", "merge"))).collect()
    )
    assert hits == [1]
    # phrase through the ORIGINAL still matches everywhere it did before
    hits = sorted(
        int(r["doc_id"]) for r in s.matching(Q.Phrase(("vector", "merge"))).collect()
    )
    assert hits == [1]


def test_phrase_original_unaffected(syn_index):
    _, s = syn_index
    hits = sorted(
        int(r["doc_id"]) for r in s.matching(Q.Phrase(("vector", "window"))).collect()
    )
    assert hits == [0]


def test_same_position_unordered_near_zero_width(syn_index):
    _, s = syn_index
    # vector and vettore occupy the SAME position in docs 1/2 — an
    # unordered-near with slop 0 must see the co-located pair
    q = Q.UnorderedNear(0, (Q.Term("vector"), Q.Term("vettore")))
    hits = sorted(int(r["doc_id"]) for r in s.matching(q).collect())
    assert hits == [1, 2]


def test_scalar_flat_equivalence():
    """Registered scalar analyzer == flat batched path."""
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        flat_tokenizer,
        tokenize_flat,
    )

    if "syn_e2e" not in ANALYZERS:
        syn = SynonymMap()
        syn.add("vector", "vettore", True)
        syn.add("vector window", "viewport", True)
        register_synonym_analyzer("syn_e2e", syn, base="code")
    texts = [t for _, t in DOCS] + ["", "Vector WINDOW vector"]
    flat = tokenize_flat(texts, "syn_e2e")
    ftok = flat_tokenizer("syn_e2e")
    flat2 = ftok(texts)
    for k in ("doc_idx", "terms", "positions", "doclens"):
        assert flat[k].tolist() == flat2[k].tolist()
    # scalar path agrees per doc
    off = 0
    for i, t in enumerate(texts):
        terms, positions, doclen = ANALYZERS["syn_e2e"](t)
        n = len(terms)
        assert flat["terms"][off : off + n].tolist() == terms
        assert flat["positions"][off : off + n].tolist() == positions
        assert int(flat["doclens"][i]) == doclen
        off += n
    assert off == flat["terms"].size


def test_packed_segments_with_synonym_chain(spark, tmp_path):
    """The fused packed build (build_segments -> SegmentSearcher) must see
    the same synonym-expanded postings as the exploded index: overlap
    tokens reach the packed posting lists, norms carry the discounted
    length, and a packed term query on the injected term matches."""
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        verify_index,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    if "syn_e2e" not in ANALYZERS:
        syn = SynonymMap()
        syn.add("vector", "vettore", True)
        syn.add("vector window", "viewport", True)
        register_synonym_analyzer("syn_e2e", syn, base="code")
    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    d = str(tmp_path / "syn_idx")
    build_segments(corpus, d, n_segments=2, id_col="doc_id", analyzer="syn_e2e")
    assert verify_index(spark, d)["ok"]
    ss = SegmentSearcher(spark, d)
    hits = {int(r["doc_id"]) for r in ss.search(["vettore"], k=10).collect()}
    assert hits == {1, 2}
    hits = {int(r["doc_id"]) for r in ss.search(["viewport"], k=10).collect()}
    assert hits == {0}


def test_packed_avgdl_matches_exploded_for_overlaps(spark, tmp_path):
    """Review r5: BM25 avgdl must agree between the exploded and packed
    paths for overlap-injecting analyzers — both use sumTotalTermFreq
    (overlaps included), not the discounted doclen sum."""
    from lucene_solr_intervals_spark.index.segment import build_segments
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    if "syn_e2e" not in ANALYZERS:
        syn = SynonymMap()
        syn.add("vector", "vettore", True)
        syn.add("vector window", "viewport", True)
        register_synonym_analyzer("syn_e2e", syn, base="code")
    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_index(corpus, analyzer="syn_e2e")
    d = str(tmp_path / "avgdl_idx")
    build_segments(corpus, d, n_segments=2, id_col="doc_id", analyzer="syn_e2e")
    ss = SegmentSearcher(spark, d)
    assert ss.manifest["sum_ttf"] == idx.sum_ttf == 14
    assert ss.manifest["sum_doclen"] == 11  # discounted
    assert abs(ss.avgdl - idx.avgdl) < 1e-12
    idx.unpersist()
