"""Postings-format registry: Codec.forName analog + plain32 second codec.

Reference roles: Codec.java:94 (forName), PostingsFormat.java:42 (named
SPI), segment metadata declaring the format.  The manifest's "codec" field
plays segment-metadata; build_segments(codec=...) the writer selection;
SegmentSearcher resolves at open.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.codecs.registry import (
    CODECS,
    FOR128,
    PLAIN32,
    VARBYTE,
    IntStreamCodec,
    get_codec,
    register_codec,
)


def test_forname_resolves_and_rejects():
    assert get_codec("varbyte") is VARBYTE
    assert get_codec("plain32") is PLAIN32
    with pytest.raises(ValueError, match="unknown postings codec"):
        get_codec("lucene41")


@pytest.mark.parametrize("codec", [VARBYTE, PLAIN32, FOR128], ids=lambda c: c.name)
@given(vals=st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_roundtrip(codec, vals):
    a = np.asarray(vals, dtype=np.uint64)
    assert np.array_equal(codec.decode(codec.encode(a)), a)


@pytest.mark.parametrize("codec", [VARBYTE, PLAIN32, FOR128], ids=lambda c: c.name)
def test_encode_batch_matches_per_group(codec):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 20, size=500).astype(np.uint64)
    offs = np.array([0, 10, 10, 137, 500], dtype=np.int64)
    bufs = codec.encode_batch(vals, offs)
    for i in range(offs.size - 1):
        assert bufs[i] == codec.encode(vals[offs[i] : offs[i + 1]])


@pytest.mark.parametrize("codec", [VARBYTE, PLAIN32, FOR128], ids=lambda c: c.name)
def test_nbytes_consistent_with_encode(codec):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1 << 28, size=300).astype(np.uint64)
    assert int(codec.nbytes(vals).sum()) == len(codec.encode(vals))


def test_plain32_rejects_wide_values():
    with pytest.raises(ValueError, match="32 bits"):
        PLAIN32.encode(np.array([1 << 33], dtype=np.uint64))


def test_decode_selected_blocks_any_codec():
    from lucene_solr_intervals_spark.codecs.varbyte import (
        block_byte_starts,
        decode_selected_blocks,
    )

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 16, size=400).astype(np.uint64)
    for codec in (VARBYTE, PLAIN32, FOR128):
        buf = codec.encode(vals)
        bs = block_byte_starts(codec.nbytes(vals))
        sel = np.array([True, False, True, False], dtype=bool)[: bs.size]
        got, counts = decode_selected_blocks(buf, bs, vals.size, sel, codec=codec)
        want = np.concatenate(
            [vals[i * 128 : (i + 1) * 128] for i in np.nonzero(sel)[0]]
        )
        assert np.array_equal(got, want)


def test_register_custom_codec():
    marker = IntStreamCodec(
        name="test_only",
        encode=PLAIN32.encode,
        encode_batch=PLAIN32.encode_batch,
        decode=PLAIN32.decode,
        nbytes=PLAIN32.nbytes,
    )
    register_codec(marker)
    try:
        assert get_codec("test_only") is marker
    finally:
        CODECS.pop("test_only", None)


def test_build_query_verify_plain32(spark, tmp_path):
    """End-to-end: build with plain32, manifest declares it, searcher
    resolves it, results equal a varbyte build of the same corpus."""
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        read_manifest,
        verify_index,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = generate_corpus(spark, 300)
    d_vb = str(tmp_path / "idx_vb")
    d_p32 = str(tmp_path / "idx_p32")
    build_segments(corpus, d_vb, n_segments=4, id_col="doc_id",
                   text_col="content", n_docs_hint=300)
    build_segments(corpus, d_p32, n_segments=4, id_col="doc_id",
                   text_col="content", n_docs_hint=300, codec="plain32")
    assert read_manifest(d_p32)["codec"] == "plain32"
    assert read_manifest(d_vb)["codec"] == "varbyte"

    v = verify_index(spark, d_p32, corpus=corpus, text_col="content")
    assert v["ok"] and v["sha_ok"], v["problems"]

    s_vb = SegmentSearcher(spark, d_vb)
    s_p32 = SegmentSearcher(spark, d_p32)
    assert s_p32.codec.name == "plain32"
    terms = ["get_index", "merge_posting", "flush_segment"]
    a = [(r["doc_id"], round(r["score"], 5)) for r in s_vb.search(terms, k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 5)) for r in s_p32.search(terms, k=10).collect()]
    assert a == b
    # batch path too (single-pass concatenated decode)
    am = {(r["query_term"], r["doc_id"], r["rank"])
          for r in s_vb.search_many(terms, k=5).collect()}
    bm = {(r["query_term"], r["doc_id"], r["rank"])
          for r in s_p32.search_many(terms, k=5).collect()}
    assert am == bm


def test_verify_checks_offsets_stream(spark, tmp_path):
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import build_segments, verify_index

    corpus = generate_corpus(spark, 120)
    d = str(tmp_path / "idx_off")
    build_segments(corpus, d, n_segments=2, id_col="doc_id",
                   text_col="content", n_docs_hint=120, keep_offsets=True)
    v = verify_index(spark, d, corpus=corpus, text_col="content")
    assert v["ok"], v["problems"]
