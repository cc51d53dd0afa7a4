"""Property tests for the posting codec (pack/unpack round-trips)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.codecs.varbyte import (
    BLOCK_SIZE,
    block_meta,
    decode_block_meta,
    pack_doc_ids,
    pack_positions,
    pack_tfs,
    unpack_doc_ids,
    unpack_positions,
    unpack_positions_flat,
    unpack_tfs,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=200)
def test_vb_roundtrip(values):
    a = np.array(values, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(a)), a)


@given(st.sets(st.integers(min_value=0, max_value=10**9), max_size=300))
@settings(max_examples=200)
def test_doc_ids_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(unpack_doc_ids(pack_doc_ids(a)), a)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=100000), min_size=1, max_size=50),
        max_size=60,
    )
)
@settings(max_examples=200)
def test_positions_roundtrip(pos_lists):
    per_doc = [np.array(sorted(set(p)) or [0], dtype=np.int64) for p in pos_lists]
    tfs = np.array([len(p) for p in per_doc], dtype=np.int64)
    buf = pack_positions(per_doc)
    out = unpack_positions(buf, tfs)
    assert len(out) == len(per_doc)
    for got, want in zip(out, per_doc):
        assert np.array_equal(got, want)
    flat, offsets = unpack_positions_flat(buf, tfs)
    for i, want in enumerate(per_doc):
        assert np.array_equal(flat[offsets[i] : offsets[i + 1]], want)


def test_tfs_roundtrip():
    tfs = np.array([1, 2, 3, 127, 128, 129, 300], dtype=np.int64)
    assert np.array_equal(unpack_tfs(pack_tfs(tfs)), tfs)


def test_block_meta():
    n = BLOCK_SIZE * 2 + 37
    ids = np.arange(0, n * 3, 3, dtype=np.int64)
    tfs = (np.arange(n) % 7 + 1).astype(np.int64)
    last_b, max_b = block_meta(ids, tfs)
    last, mx = decode_block_meta(last_b, max_b)
    assert last.size == 3
    assert last[0] == ids[BLOCK_SIZE - 1]
    assert last[-1] == ids[-1]
    assert mx[0] == tfs[:BLOCK_SIZE].max()
    assert mx[-1] == tfs[BLOCK_SIZE * 2 :].max()


def test_empty():
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0
    assert pack_positions([]) == b""


def test_block_byte_starts_and_selected_decode():
    """Skip-data round-trip: decoding any subset of blocks via byte offsets
    equals slicing the full decode."""
    import numpy as np

    from lucene_solr_intervals_spark.codecs.varbyte import (
        BLOCK_SIZE,
        block_byte_starts,
        decode_selected_blocks,
        vb_decode,
        vb_encode,
        vb_nbytes,
    )

    rng = np.random.RandomState(7)
    for n in (1, 127, 128, 129, 1000, 5000):
        vals = rng.randint(0, 1 << 40, size=n).astype(np.uint64)
        buf = vb_encode(vals)
        nb = vb_nbytes(vals)
        assert int(nb.sum()) == len(buf)
        starts = block_byte_starts(nb)
        n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        assert starts.size == n_blocks
        full = vb_decode(buf)
        for trial in range(5):
            sel = rng.rand(n_blocks) < 0.5
            got, counts = decode_selected_blocks(buf, starts, n, sel)
            expect = np.concatenate(
                [full[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE] for i in np.nonzero(sel)[0]]
            ) if sel.any() else np.empty(0, dtype=np.uint64)
            assert np.array_equal(got, expect), (n, trial)
            assert int(counts.sum()) == expect.size
