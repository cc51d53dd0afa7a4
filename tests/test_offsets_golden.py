"""Golden transcription of TestPositionsAndOffsets.java: interval queries
carry character offsets populated from the OFFSETS posting streams
(Interval.java:22-37), never by re-tokenizing."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.tokenizer import ws_tokenize_offsets
from lucene_solr_intervals_spark.intervals import kernel as IK
from lucene_solr_intervals_spark.search import queries as Q

DOC = (
    "Pease porridge hot! Pease porridge cold! Pease porridge in the pot nine "
    "days old! Some like it hot, some like it cold, Some like it in the pot "
    "nine days old! Pease porridge hot! Pease porridge cold!"
)


def _index(text):
    terms, positions, starts, ends, _ = ws_tokenize_offsets(text, lowercase=True)
    pos: dict[str, list[int]] = {}
    omap: dict[int, tuple[int, int]] = {}
    for t, p, s, e in zip(terms, positions, starts, ends):
        pos.setdefault(t, []).append(p)
        omap[p] = (s, e)
    return pos, omap


def _offsets(q):
    pos, omap = _index(DOC)
    m = IK.match_intervals(q, pos)
    assert m is not None
    flat = []
    for b, e in m:
        flat.extend([omap[b][0], omap[e][1]])
    return flat


def test_term_query_offsets():
    # TestPositionsAndOffsets.testTermQueryOffsets
    got = _offsets(Q.Term("porridge"))
    assert got == [6, 14, 26, 34, 47, 55, 164, 172, 184, 192]


def test_boolean_query_offsets():
    # TestPositionsAndOffsets.testBooleanQueryOffsets — the Boolean MUST
    # iterator merges its children's leaf streams (CombinedIntervalIterator)
    q = Q.Boolean(must=(Q.Term("porridge"), Q.Term("nine")))
    got = _offsets(q)
    assert got == [6, 14, 26, 34, 47, 55, 67, 71, 143, 147, 164, 172, 184, 192]


@pytest.mark.usefixtures("spark")
def test_spark_intervals_with_offsets(spark):
    """intervals_with_offsets reads offsets from the posting streams: parity
    with the golden expectations through the full Spark path."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame([(0, DOC)], ["doc_id", "text"])
    idx = build_index(corpus, analyzer="ws", keep_offsets=True)
    try:
        s = Searcher(idx, mode="sql", text_col="text")
        rows = sorted(
            (
                (r["begin"], r["end"], r["offset_begin"], r["offset_end"])
                for r in s.intervals_with_offsets(Q.Term("porridge")).collect()
            )
        )
        assert [(ob, oe) for _, _, ob, oe in rows] == [
            (6, 14), (26, 34), (47, 55), (164, 172), (184, 192),
        ]
        q = Q.Boolean(must=(Q.Term("porridge"), Q.Term("nine")))
        rows = sorted(
            (
                (r["offset_begin"], r["offset_end"])
                for r in s.intervals_with_offsets(q).collect()
            )
        )
        assert rows == [
            (6, 14), (26, 34), (47, 55), (67, 71), (143, 147),
            (164, 172), (184, 192),
        ]
        # a composite (phrase) interval spans first leaf start -> last leaf end
        rows = s.intervals_with_offsets(Q.Phrase(("pease", "porridge"))).collect()
        assert sorted((r["offset_begin"], r["offset_end"]) for r in rows) == [
            (0, 14), (20, 34), (41, 55), (158, 172), (178, 192),
        ]
    finally:
        idx.unpersist()


@pytest.mark.usefixtures("spark")
def test_packed_offsets_posting_stream(spark, tmp_path):
    """Packed-path offsets: stored at build, preserved through merge, decoded
    straight from the OFFSETS stream — same golden expectations."""
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        merge_segments,
        read_manifest,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    d = str(tmp_path / "offidx")
    corpus = spark.createDataFrame(
        [(0, "r", "p0", DOC), (1, "r", "p1", "nine pease nine")],
        ["doc_id", "repo", "path", "text"],
    )
    build_segments(
        corpus, d, n_segments=2, id_col="doc_id", text_col="text",
        analyzer="ws", keep_offsets=True,
    )
    ss = SegmentSearcher(spark, d)

    def offs(q):
        return sorted(
            (r["doc_id"], r["offset_begin"], r["offset_end"])
            for r in ss.intervals_with_offsets(q).collect()
        )

    assert offs(Q.Term("porridge")) == [
        (0, 6, 14), (0, 26, 34), (0, 47, 55), (0, 164, 172), (0, 184, 192),
    ]
    q = Q.Boolean(must=(Q.Term("porridge"), Q.Term("nine")))
    assert [(ob, oe) for d_, ob, oe in offs(q) if d_ == 0] == [
        (6, 14), (26, 34), (47, 55), (67, 71), (143, 147), (164, 172), (184, 192),
    ]
    # composite phrase spans decode from the stream too
    assert [(ob, oe) for _, ob, oe in offs(Q.Phrase(("pease", "porridge")))] == [
        (0, 14), (20, 34), (41, 55), (158, 172), (178, 192),
    ]

    # merge preserves the offsets stream byte-exactly at the value level
    m = read_manifest(d)
    live = [s["seg"] for s in m["segments"] if s["status"] == "done"]
    merge_segments(spark, d, live, new_seg=max(live) + 1)
    ss2 = SegmentSearcher(spark, d)
    got = sorted(
        (r["doc_id"], r["offset_begin"], r["offset_end"])
        for r in ss2.intervals_with_offsets(Q.Term("nine")).collect()
    )
    want = sorted(
        (r["doc_id"], r["offset_begin"], r["offset_end"])
        for r in ss.intervals_with_offsets(Q.Term("nine")).collect()
    )
    assert got == want and len(got) > 0


def test_packed_offsets_vectorized_equals_fallback(spark, tmp_path):
    """The vectorized endpoint extraction (run_shape_intervals) must produce
    byte-identical rows to the per-doc iterator fallback for every fast
    shape, on a randomized corpus."""
    import random

    from lucene_solr_intervals_spark.index.segment import build_segments
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher
    from lucene_solr_intervals_spark.intervals import vectorized as VK

    rng = random.Random(13)
    vocab = ["pea", "pod", "hot", "cold", "nine", "days", "old"]
    rows = []
    for i in range(60):
        n = rng.randint(3, 30)
        rows.append((i, "r", f"p{i}", " ".join(rng.choice(vocab) for _ in range(n))))
    corpus = spark.createDataFrame(rows, ["doc_id", "repo", "path", "text"])
    d = str(tmp_path / "vecoff")
    build_segments(
        corpus, d, n_segments=3, id_col="doc_id", text_col="text",
        analyzer="ws", keep_offsets=True,
    )
    ss = SegmentSearcher(spark, d)

    queries = [
        Q.Term("pea"),
        Q.Phrase(("hot", "cold")),
        Q.Phrase(("nine", "days", "old")),
        Q.Phrase(("pea", "pod"), slop=2),
        Q.OrderedNear(3, (Q.Term("hot"), Q.Term("cold"))),
        Q.OrderedNear(4, (Q.Term("nine"), Q.Term("days"), Q.Term("old"))),
        Q.UnorderedNear(2, (Q.Term("pea"), Q.Term("old"))),
    ]
    orig = VK.interval_shape
    for q in queries:
        assert orig(q) is not None, q
        fast = sorted(tuple(r) for r in ss.intervals_with_offsets(q).collect())
        try:
            VK.interval_shape = lambda _q: None  # force the iterator fallback
            slow = sorted(tuple(r) for r in ss.intervals_with_offsets(q).collect())
        finally:
            VK.interval_shape = orig
        assert fast == slow, q
        assert fast, q  # non-vacuous on this corpus

    # classic-walk scoring shapes (csloppy2/csloppyk/csloppyr) have no
    # endpoint extractor: interval_shape must route them to the iterator
    # path (None), not crash run_shape_intervals — notably the
    # repeated-term sloppy phrase, which fast_shape now classifies csloppyr
    for q in [
        Q.Phrase(("pea", "pod", "pea"), slop=2),       # csloppyr
        Q.Phrase(("nine", "days", "old"), slop=2),     # csloppyk
        Q.MultiPhrase((("hot",), ("cold",)), slop=1),
    ]:
        s = VK.fast_shape(q)
        assert s is not None and s[0] in ("csloppy2", "csloppyk", "csloppyr"), q
        assert VK.interval_shape(q) is None, q
        rows = ss.intervals_with_offsets(q).collect()  # iterator path, no crash
        assert isinstance(rows, list)
