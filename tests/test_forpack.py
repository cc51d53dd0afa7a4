"""for128 frame-of-reference bit-packed codec (ForUtil.java:36,157-243 role).

Covers: pure round trips over the full uint64 domain (incl. the >56-bit
fallback path), batch==per-group byte identity, whole-stream concatenation
decode (the batched WAND requirement), nbytes/block-offset contract,
selective block decode, the compression claim vs varbyte, and end-to-end
build/search/merge equality against a varbyte index of the same corpus.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.codecs.forpack import (
    BLOCK,
    for_decode,
    for_encode,
    for_encode_batch,
    for_nbytes,
    for_nbytes_batch,
)
from lucene_solr_intervals_spark.codecs.registry import FOR128, VARBYTE, get_codec
from lucene_solr_intervals_spark.codecs.varbyte import (
    block_byte_starts,
    decode_selected_blocks,
)


def test_forname_resolves_for128():
    assert get_codec("for128") is FOR128
    assert FOR128.nbytes_batch is not None


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=400
    )
)
@settings(max_examples=120, deadline=None)
def test_roundtrip_full_uint64_domain(vals):
    a = np.asarray(vals, dtype=np.uint64)
    assert np.array_equal(for_decode(for_encode(a)), a)


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 255, 256, 1000])
def test_roundtrip_block_boundary_sizes(n):
    rng = np.random.default_rng(n + 1)
    a = rng.integers(0, 1 << 20, size=n).astype(np.uint64)
    assert np.array_equal(for_decode(for_encode(a)), a)
    # all-zero stream: width-0 blocks carry headers only
    z = np.zeros(n, dtype=np.uint64)
    buf = for_encode(z)
    assert len(buf) == 2 * ((n + BLOCK - 1) // BLOCK)
    assert np.array_equal(for_decode(buf), z)


def test_roundtrip_every_bit_width():
    """One block per width 1..64 so each pack/unpack class is exercised,
    including the >56 gather-window fallback boundary."""
    for w in range(1, 65):
        hi = (1 << w) - 1
        rng = np.random.default_rng(w)
        a = rng.integers(0, hi, size=130, dtype=np.uint64, endpoint=True)
        a[0] = hi  # pin the block width exactly
        assert np.array_equal(for_decode(for_encode(a)), a), f"width {w}"


def test_encode_batch_matches_per_group_and_empty_groups():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 22, size=700).astype(np.uint64)
    offs = np.array([0, 0, 10, 10, 137, 500, 700, 700], dtype=np.int64)
    bufs = for_encode_batch(vals, offs)
    assert len(bufs) == offs.size - 1
    for i in range(offs.size - 1):
        assert bufs[i] == for_encode(vals[offs[i] : offs[i + 1]]), i


def test_concatenated_streams_decode_in_one_pass():
    """decode(b''.join(streams)) == concat(decode(s)) — the batched WAND
    kernel decodes many terms' buffers as one buffer (wand.py:813)."""
    rng = np.random.default_rng(13)
    streams = [
        rng.integers(0, 1 << k, size=n).astype(np.uint64)
        for k, n in [(3, 5), (9, 128), (17, 300), (1, 129), (30, 64)]
    ]
    bufs = [for_encode(s) for s in streams]
    got = for_decode(b"".join(bufs))
    assert np.array_equal(got, np.concatenate(streams))


def test_nbytes_contract_and_block_offsets():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 16, size=500).astype(np.uint64)
    nb = for_nbytes(vals)
    buf = for_encode(vals)
    assert int(nb.sum()) == len(buf)
    # costs land on block-first values only
    assert (nb[np.arange(500) % BLOCK != 0] == 0).all()
    # cumsum at 128-boundaries == actual byte offset of each block header
    bs = block_byte_starts(nb)
    b = np.frombuffer(buf, dtype=np.uint8)
    pos, starts = 0, []
    while pos < b.size:
        starts.append(pos)
        w, c = int(b[pos]), int(b[pos + 1])
        pos += 2 + (((c or BLOCK) * w + 7) >> 3)
    assert bs.tolist() == starts


def test_nbytes_batch_restarts_blocks_per_group():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 12, size=600).astype(np.uint64)
    offs = np.array([0, 200, 200, 459, 600], dtype=np.int64)
    nb = for_nbytes_batch(vals, offs)
    bufs = for_encode_batch(vals, offs)
    for i in range(offs.size - 1):
        seg = nb[offs[i] : offs[i + 1]]
        assert int(seg.sum()) == len(bufs[i])
        want = for_nbytes(vals[offs[i] : offs[i + 1]])
        assert np.array_equal(seg, want), i


def test_decode_selected_blocks_for128():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1 << 16, size=400).astype(np.uint64)  # 4 blocks
    buf = for_encode(vals)
    bs = block_byte_starts(for_nbytes(vals))
    sel = np.array([True, False, True, True], dtype=bool)
    got, counts = decode_selected_blocks(buf, bs, vals.size, sel, codec=FOR128)
    want = np.concatenate([vals[i * 128 : (i + 1) * 128] for i in (0, 2, 3)])
    assert np.array_equal(got, want)
    assert counts.tolist() == [128, 128, 16]


def test_for128_smaller_than_varbyte_on_dense_gaps():
    """The point of the codec: small gaps pack at bit width, not the 1-byte
    varbyte floor — >=2x smaller for a dense posting list."""
    rng = np.random.default_rng(17)
    gaps = rng.integers(1, 8, size=10_000).astype(np.uint64)  # 3-bit widths
    assert len(for_encode(gaps)) * 2 <= len(VARBYTE.encode(gaps))


def test_build_query_verify_for128(spark, tmp_path):
    """End-to-end: build with for128, manifest declares it, searcher
    resolves it, top-k equals a varbyte build of the same corpus."""
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        read_manifest,
        verify_index,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = generate_corpus(spark, 300)
    d_vb = str(tmp_path / "idx_vb")
    d_for = str(tmp_path / "idx_for")
    build_segments(corpus, d_vb, n_segments=4, id_col="doc_id",
                   text_col="content", n_docs_hint=300)
    build_segments(corpus, d_for, n_segments=4, id_col="doc_id",
                   text_col="content", n_docs_hint=300, codec="for128")
    assert read_manifest(d_for)["codec"] == "for128"

    v = verify_index(spark, d_for, corpus=corpus, text_col="content")
    assert v["ok"] and v["sha_ok"], v["problems"]

    s_vb = SegmentSearcher(spark, d_vb)
    s_for = SegmentSearcher(spark, d_for)
    assert s_for.codec.name == "for128"
    terms = ["get_index", "merge_posting", "flush_segment"]
    a = [(r["doc_id"], round(r["score"], 5)) for r in s_vb.search(terms, k=10).collect()]
    b = [(r["doc_id"], round(r["score"], 5)) for r in s_for.search(terms, k=10).collect()]
    assert a == b
    am = {(r["query_term"], r["doc_id"], r["rank"])
          for r in s_vb.search_many(terms, k=5).collect()}
    bm = {(r["query_term"], r["doc_id"], r["rank"])
          for r in s_for.search_many(terms, k=5).collect()}
    assert am == bm


def test_for128_multiblock_skip_path(spark, tmp_path):
    """Single-segment 600-doc build: common terms span >4 blocks so the WAND
    selective-decode path slices for128 buffers at block boundaries; ranks
    must equal varbyte's exactly."""
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import build_segments
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = generate_corpus(spark, 600)
    d_vb = str(tmp_path / "vb1")
    d_for = str(tmp_path / "for1")
    for d, c in [(d_vb, "varbyte"), (d_for, "for128")]:
        build_segments(corpus, d, n_segments=1, id_col="doc_id",
                       text_col="content", n_docs_hint=600, codec=c)
    s_vb = SegmentSearcher(spark, d_vb)
    s_for = SegmentSearcher(spark, d_for)
    for terms in (["get_index"], ["set_index", "build_index"],
                  ["merge_posting", "scan_segment", "read_term"]):
        a = [(r["doc_id"], round(r["score"], 5))
             for r in s_vb.search(terms, k=12).collect()]
        b = [(r["doc_id"], round(r["score"], 5))
             for r in s_for.search(terms, k=12).collect()]
        assert a == b, terms


def test_merge_under_for128(spark, tmp_path):
    """merge_segments must re-pack with the manifest codec and keep results
    identical pre/post merge."""
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        merge_segments,
        read_manifest,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = generate_corpus(spark, 240)
    d = str(tmp_path / "m_for")
    build_segments(corpus, d, n_segments=4, id_col="doc_id",
                   text_col="content", n_docs_hint=240, codec="for128")
    s0 = SegmentSearcher(spark, d)
    before = [(r["doc_id"], round(r["score"], 5))
              for r in s0.search(["get_index", "set_posting"], k=10).collect()]
    segs = sorted({m["seg"] for m in read_manifest(d)["segments"]
                   if m.get("status") == "done"})
    merge_segments(spark, d, segs[:2], new_seg=max(segs) + 1)
    s1 = SegmentSearcher(spark, d)
    after = [(r["doc_id"], round(r["score"], 5))
             for r in s1.search(["get_index", "set_posting"], k=10).collect()]
    assert before == after
