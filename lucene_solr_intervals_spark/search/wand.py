"""Top-k BM25 over packed segments with vectorized block-max pruning (WAND).

The reference fork evaluates exhaustively (no MaxScore/BMW in Lucene 4.x —
SURVEY.md §4.2); the north star asks us to ADD block-max WAND.  Design:

* partition == Lucene leaf: each segment's top-k is computed independently
  (IndexSearcher leaf slices, IndexSearcher.java:596-614), then merged with
  the (score desc, doc_id asc) heap order (HitQueue.java:76-80) — the exact
  shape of Solr's shard scatter-gather (HttpShardHandler).
* per-segment kernel: a vectorized block-max strategy rather than a
  document-at-a-time Python loop (pointer-chasing per doc would throw away
  numpy; block granularity keeps all hot loops in C):
    1. seed threshold θ = exact k-th best score of the highest-impact term
       (every final OR score >= its single-term score, so θ is a valid
       lower bound on the true k-th best);
    2. per term x block upper bound ub = w * max_tf / (max_tf +
       cache[block_max_nb])  (score is increasing in tf and decreasing in
       the norm cache; cache is decreasing in norm byte, so block_max_nb
       minimizes it — a tight, provably valid bound);
    3. scatter-add block bounds to docs -> candidate docs with
       sum-of-bounds >= θ; skip decode+score of everything else;
    4. exact-score candidates only; top-k with doc-id tie-break.
  Rank-safety: every pruned doc has upper bound < θ <= true k-th score.
  `mode="exhaustive"` keeps the oracle path; tests assert identical output.

Scoring is the Lucene-exact float32 path (quantized norms), so segment
top-k here is rank-identical to the reference.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs.varbyte import unpack_doc_ids, unpack_tfs
from ..scoring.bm25 import idf as idf32
from ..scoring.bm25 import norm_cache
from ..index.segment import load_norms, load_postings, read_manifest

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.FloatType()),
    ]
)

# Columns the SCORING kernels actually read.  An applyInPandas cogroup is
# opaque to Catalyst, so without an explicit projection every query ships
# (and reads from parquet) the positions/offsets binaries — the largest
# posting columns — that only the interval/offsets paths consume
# (guide §2.3: project before the exchange).
SCORING_COLS = [
    "seg", "term", "df", "doc_ids", "tfs", "block_last",
    "block_max_tf", "block_max_nb", "block_id_offs", "block_tf_offs",
]


def _scoring_cols(postings: DataFrame, *extra: str) -> list:
    """SCORING_COLS restricted to what the relation actually has — the
    kernels degrade gracefully on indexes without block-max sidecars
    (pre-skip-data segments), so the projection must too."""
    have = set(postings.columns)
    return [c for c in SCORING_COLS if c in have] + list(extra)


def _exact_scores(rows, norms_by_doc, weights, cache):
    """Concatenate per-term (doc, partial score) and sum per doc."""
    ids_all, sc_all = [], []
    for term, ids, tfs in rows:
        nb = norms_by_doc[ids]
        tf32 = tfs.astype(np.float32)
        sc = (weights[term] * tf32 / (tf32 + cache[nb])).astype(np.float32)
        ids_all.append(ids)
        sc_all.append(sc)
    ids_cat = np.concatenate(ids_all)
    sc_cat = np.concatenate(sc_all)
    uniq, inv = np.unique(ids_cat, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.float32)
    np.add.at(summed, inv, sc_cat)
    return uniq, summed


def _topk(ids: np.ndarray, scores: np.ndarray, k: int):
    if ids.size == 0:
        return ids[:0], scores[:0]
    if ids.size > k:
        # exact order among a safe superset: all docs with score >= kth
        kth = scores[np.argpartition(-scores, k - 1)[k - 1]]
        cand = np.nonzero(scores >= kth)[0]
    else:
        cand = np.arange(ids.size)
    order = np.lexsort((ids[cand], -scores[cand].astype(np.float64)))
    sel = cand[order][:k]
    return ids[sel], scores[sel]


def _pruned_term_topk(
    r, w: np.float32, cache: np.ndarray, norms: np.ndarray, base: int,
    k: int, codec, tomb_arr,
):
    """Exact single-term top-k with BLOCK-MAX pruning (the batch-retrieval
    analog of _wand_skip_kernel, specialized to one term): blocks are
    decoded in upper-bound order and decoding stops as soon as the next
    block's bound falls strictly below the exact k-th score — for a
    dense term only O(k/128 + 1) of its blocks are ever read, which is
    what breaks the per-posting memory-traffic pin the r5/r6 batch-scaling
    diagnosis found (the decode+score intermediates, ~10x the stream
    bytes, used to be materialized for EVERY posting).

    Rank-safe: a block's bound uses (block_max_tf, block_max_nb), the same
    monotone-in-float32 bound _wand_skip_kernel relies on; ties with the
    k-th score keep decoding (doc-id tie-break could still change the set).
    Returns (ids, scores) sorted by (-score, id), <= k rows."""
    from ..codecs.varbyte import decode_selected_blocks

    mt = np.frombuffer(r["block_max_tf"], dtype=np.int32).astype(np.float32)
    nbm = np.frombuffer(r["block_max_nb"], dtype=np.int32)
    ub = (w * mt / (mt + cache[nbm])).astype(np.float32)
    order = np.argsort(-ub, kind="stable")
    id_offs = np.frombuffer(r["block_id_offs"], dtype=np.int64)
    tf_offs = np.frombuffer(r["block_tf_offs"], dtype=np.int64)
    block_last = np.frombuffer(r["block_last"], dtype=np.int64)
    prev_last = np.concatenate([[np.int64(0)], block_last[:-1]])
    n_vals = int(r["df"])
    n_blocks = ub.size
    best_ids = np.empty(0, dtype=np.int64)
    best_sc = np.empty(0, dtype=np.float32)
    sel = np.zeros(n_blocks, dtype=bool)
    pos = 0
    chunk = max(2, (k + 127) // 128)
    while pos < n_blocks:
        if best_sc.size >= k and ub[order[pos]] < best_sc[k - 1]:
            break
        take = order[pos : pos + chunk]
        pos += chunk
        # geometric growth: when many block bounds tie (saturated BM25
        # head terms), a fixed chunk would cost O(n_blocks/chunk) Python
        # iterations; doubling caps the walk at O(log n_blocks) while the
        # early-exit still fires after the first small chunks on corpora
        # whose bounds separate
        chunk = min(chunk * 2, 64)
        sel[:] = False
        sel[take] = True
        gaps, counts = decode_selected_blocks(
            r["doc_ids"], id_offs, n_vals, sel, codec=codec
        )
        if gaps.size == 0:
            continue
        tf_sel, _ = decode_selected_blocks(r["tfs"], tf_offs, n_vals, sel, codec=codec)
        sel_idx = np.nonzero(sel)[0]
        csum = np.cumsum(gaps.astype(np.int64))
        starts = np.cumsum(counts) - counts
        cs_before = np.where(starts > 0, csum[np.maximum(starts - 1, 0)], 0)
        blk_base = prev_last[sel_idx] - cs_before
        ids_i = csum + np.repeat(blk_base, counts)
        tf32 = tf_sel.astype(np.float32)
        sc_i = (w * tf32 / (tf32 + cache[norms[ids_i - base]])).astype(np.float32)
        if tomb_arr is not None:
            dead = np.isin(ids_i, tomb_arr)
            sc_i[dead] = np.float32(-1.0)
        best_ids, best_sc = _topk(
            np.concatenate([best_ids, ids_i]),
            np.concatenate([best_sc, sc_i]),
            k,
        )
    return best_ids, best_sc


def _pruned_topk_rows(
    rows: list, w_rows: np.ndarray, cache: np.ndarray, norms: np.ndarray,
    base: int, k: int, codec, tomb_arr,
) -> list:
    """Batched block-max pruned top-k over MANY dense terms of one segment.

    _pruned_term_topk amortizes nothing: each term pays ~6 decode calls of
    ~170us fixed cost, which loses to the one-pass batched decode until df
    is enormous.  This version prunes ALL rows together in exactly TWO
    decode rounds (4 codec calls total, regardless of row count):

      round 1: per row, the ceil(k/128)+2 highest-upper-bound blocks —
               sliced from every row, decoded in ONE concatenated codec
               call, scored, per-row exact k-th derived;
      round 2: per row, every remaining block whose bound >= that row's
               k-th (ties kept — doc-id tie-break could still change the
               set), again ONE concatenated decode for all rows.

    Rank-safe for the same reason as _pruned_term_topk: a skipped block's
    bound (block_max_tf with the block's min norm) is monotone-above every
    score inside it, so nothing outside the decoded set can reach the
    top k.  Returns [(ids, scores)] per row, each sorted by (-score, id).

    Reference role: Lucene41SkipWriter.java:69 skip data + BlockMax WAND
    (MaxScoreCache) specialized to single-term scorers, restructured for
    columnar batch execution instead of a per-term iterator walk."""
    nrows = len(rows)
    ubs, prevs, cnts, id_ends, tf_ends = [], [], [], [], []
    for i in range(nrows):
        r = rows[i]
        mt = np.frombuffer(r["block_max_tf"], dtype=np.int32).astype(np.float32)
        nbm = np.frombuffer(r["block_max_nb"], dtype=np.int32)
        ubs.append((w_rows[i] * mt / (mt + cache[nbm])).astype(np.float32))
        bl = np.frombuffer(r["block_last"], dtype=np.int64)
        pl = np.empty_like(bl)
        if bl.size:
            pl[0] = 0
            pl[1:] = bl[:-1]
        prevs.append(pl)
        nb = bl.size
        cnt = np.full(nb, 128, dtype=np.int64)
        if nb:
            cnt[-1] = int(r["df"]) - 128 * (nb - 1)
        cnts.append(cnt)
        io = np.frombuffer(r["block_id_offs"], dtype=np.int64)
        to = np.frombuffer(r["block_tf_offs"], dtype=np.int64)
        id_ends.append(np.append(io[1:], len(r["doc_ids"])))
        tf_ends.append(np.append(to[1:], len(r["tfs"])))

    def _decode_round(sel_per_row: list) -> tuple:
        """One concatenated decode of the selected blocks of every row.
        Returns (ids_abs, scores, row_val_counts) with each row's values
        contiguous (rows emitted in order)."""
        id_parts, tf_parts = [], []
        blk_cnt, blk_prev, blk_row = [], [], []
        for i, sel in enumerate(sel_per_row):
            if sel is None or sel.size == 0:
                continue
            r = rows[i]
            io = np.frombuffer(r["block_id_offs"], dtype=np.int64)
            to = np.frombuffer(r["block_tf_offs"], dtype=np.int64)
            ie, te = id_ends[i], tf_ends[i]
            bi, bt = r["doc_ids"], r["tfs"]
            for j in sel:
                j = int(j)
                id_parts.append(bi[io[j]:ie[j]])
                tf_parts.append(bt[to[j]:te[j]])
            blk_cnt.append(cnts[i][sel])
            blk_prev.append(prevs[i][sel])
            blk_row.append(np.full(sel.size, i, dtype=np.int64))
        if not id_parts:
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float32), np.zeros(nrows, np.int64)
        gaps = codec.decode(b"".join(id_parts)).astype(np.int64)
        tfv = codec.decode(b"".join(tf_parts)).astype(np.float32)
        cnt = np.concatenate(blk_cnt)
        prev = np.concatenate(blk_prev)
        brow = np.concatenate(blk_row)
        starts = np.cumsum(cnt) - cnt
        np.cumsum(gaps, out=gaps)
        cs_before = np.where(starts > 0, gaps[np.maximum(starts - 1, 0)], 0)
        ids = gaps
        ids += np.repeat(prev - cs_before, cnt)
        wv = np.repeat(w_rows[brow].astype(np.float32), cnt)
        denom = cache[norms[ids - base]]
        denom += tfv
        np.multiply(wv, tfv, out=tfv)
        tfv /= denom
        if tomb_arr is not None:
            tfv[np.isin(ids, tomb_arr)] = np.float32(-1.0)
        row_val = np.zeros(nrows, dtype=np.int64)
        np.add.at(row_val, brow, cnt)
        return ids, tfv, row_val

    m = max(1, (k + 127) // 128) + 2
    sel1 = []
    for i in range(nrows):
        ub = ubs[i]
        if ub.size <= m:
            sel1.append(np.arange(ub.size, dtype=np.int64))
        else:
            sel1.append(np.argpartition(-ub, m - 1)[:m].astype(np.int64))
    ids1, sc1, rv1 = _decode_round(sel1)
    off1 = np.concatenate([[0], np.cumsum(rv1)])

    sel2 = []
    for i in range(nrows):
        # k-th over ALL round-1 scores, tombstoned (-1) entries included:
        # dead entries only LOWER the threshold (more blocks decoded =
        # still rank-safe), and keeping them mirrors the batched path's
        # output semantics exactly (dead docs carry -1 and sort last)
        s = sc1[off1[i]:off1[i + 1]]
        if s.size >= k:
            kth = np.partition(s, s.size - k)[s.size - k]
        else:
            kth = np.float32(-np.inf)
        rest = ubs[i] >= kth
        rest[sel1[i]] = False
        sel2.append(np.nonzero(rest)[0].astype(np.int64))
    ids2, sc2, rv2 = _decode_round(sel2)
    off2 = np.concatenate([[0], np.cumsum(rv2)])

    out = []
    for i in range(nrows):
        ids_i = np.concatenate([ids1[off1[i]:off1[i + 1]], ids2[off2[i]:off2[i + 1]]])
        sc_i = np.concatenate([sc1[off1[i]:off1[i + 1]], sc2[off2[i]:off2[i + 1]]])
        out.append(_topk(ids_i, sc_i, k))
    return out


def _wand_skip_kernel(
    rows: list,
    weights: dict[str, np.float32],
    cache: np.ndarray,
    k: int,
    norms: np.ndarray,
    base: int,
    tomb_arr,
    codec=None,
) -> pd.DataFrame:
    """Block-max WAND with SKIP-DATA block decode (Lucene41SkipWriter role):

    1. per term x block upper bound from (block_max_tf, block_max_nb);
    2. θ = exact k-th score of the highest-impact term (fully decoded);
    3. a block B of term t is DECODED only if ub_B + Σ_{t'≠t} max_ub_{t'}
       >= θ — otherwise no doc inside B can reach the top-k even with every
       other term at its global maximum, so its bytes are never touched
       (rank-safe: any true top-k doc's own blocks always pass the test,
       and docs living only in skipped blocks provably score < θ);
    4. per-doc sum of block bounds prunes the decoded candidates, exact
       scoring on survivors.
    """
    from ..codecs.varbyte import decode_selected_blocks

    nrm = _Rel(norms, base)
    # per-term block upper bounds (weight * tf_max / (tf_max + norm_min))
    ubs = []
    for term, r in rows:
        mt = np.frombuffer(r["block_max_tf"], dtype=np.int32).astype(np.float32)
        nbm = np.frombuffer(r["block_max_nb"], dtype=np.int32)
        ubs.append((weights[term] * mt / (mt + cache[nbm])).astype(np.float32))
    max_ub = np.array([float(u.max()) if u.size else 0.0 for u in ubs])
    seed_i = int(np.argmax(max_ub))

    # θ from the seed term, exactly scored (every OR score >= its single-term
    # score, so the seed's k-th best is a valid lower bound)
    seed_term, seed_r = rows[seed_i]
    seed_ids = unpack_doc_ids(seed_r["doc_ids"], codec)
    seed_tfs = unpack_tfs(seed_r["tfs"], codec)
    if tomb_arr is not None:
        keep = ~np.isin(seed_ids, tomb_arr)
        seed_ids, seed_tfs = seed_ids[keep], seed_tfs[keep]
    theta = np.float32(0.0)
    if seed_ids.size:
        tf32 = seed_tfs.astype(np.float32)
        sc = (weights[seed_term] * tf32 / (tf32 + cache[nrm[seed_ids]])).astype(
            np.float32
        )
        if sc.size >= k:
            theta = np.partition(-sc, k - 1)[k - 1] * np.float32(-1.0)

    total_rest = max_ub.sum()
    ids_all, ub_el_all, rows_dec = [], [], []
    for i, (term, r) in enumerate(rows):
        ub = ubs[i]
        if i == seed_i:
            ids_i, tfs_i = seed_ids, seed_tfs
            # element->block alignment after tombstone filtering is lost for
            # the seed; its per-element bound is its exact-enough max_ub
            ub_el = np.full(ids_i.size, max_ub[i], dtype=np.float32)
        else:
            rest = np.float32(total_rest - max_ub[i])
            sel = (ub + rest) >= theta
            id_offs = np.frombuffer(r["block_id_offs"], dtype=np.int64)
            tf_offs = np.frombuffer(r["block_tf_offs"], dtype=np.int64)
            n_vals = int(r["df"])
            gaps, counts = decode_selected_blocks(
                r["doc_ids"], id_offs, n_vals, sel, codec=codec
            )
            if gaps.size == 0:
                rows_dec.append((term, np.empty(0, np.int64), np.empty(0, np.int64)))
                continue
            tf_sel, _ = decode_selected_blocks(r["tfs"], tf_offs, n_vals, sel, codec=codec)
            # absolute ids: per selected block, base = previous block's last
            block_last = np.frombuffer(r["block_last"], dtype=np.int64)
            prev_last = np.concatenate([[np.int64(0)], block_last[:-1]])
            sel_idx = np.nonzero(sel)[0]
            csum = np.cumsum(gaps.astype(np.int64))
            starts = np.cumsum(counts) - counts
            cs_before = np.where(starts > 0, csum[np.maximum(starts - 1, 0)], 0)
            blk_base = prev_last[sel_idx] - cs_before
            off = np.repeat(blk_base, counts)
            ids_i = csum + off
            tfs_i = tf_sel.astype(np.int64)
            ub_el_i = np.repeat(ub[sel_idx], counts)
            if tomb_arr is not None:
                keep = ~np.isin(ids_i, tomb_arr)
                ids_i, tfs_i, ub_el_i = ids_i[keep], tfs_i[keep], ub_el_i[keep]
            ub_el = ub_el_i
        rows_dec.append((term, ids_i, tfs_i))
        ids_all.append(ids_i)
        ub_el_all.append(ub_el)

    if not ids_all:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float32"}
        )
    ids_cat = np.concatenate(ids_all)
    ub_cat = np.concatenate(ub_el_all)
    uniq, inv = np.unique(ids_cat, return_inverse=True)
    ub_sum = np.zeros(uniq.size, dtype=np.float32)
    np.add.at(ub_sum, inv, ub_cat)
    alive = uniq[ub_sum >= theta] if theta > 0 else uniq

    srows = []
    for term, ids_i, tfs_i in rows_dec:
        if ids_i.size == 0:
            continue
        mask = np.isin(ids_i, alive, assume_unique=True)
        srows.append((term, ids_i[mask], tfs_i[mask]))
    if not srows:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float32"}
        )
    uniq_f, summed = _exact_scores(srows, nrm, weights, cache)
    ids_k, sc_k = _topk(uniq_f, summed, k)
    return pd.DataFrame({"doc_id": ids_k.astype(np.int64), "score": sc_k})


def segment_topk_kernel(
    term_rows: pd.DataFrame,
    norms_row: pd.DataFrame,
    weights: dict[str, np.float32],
    cache: np.ndarray,
    k: int,
    mode: str = "wand",
    conjunctive: bool = False,
    tombstones: frozenset = frozenset(),
    codec=None,
) -> pd.DataFrame:
    """Per-segment top-k. term_rows: packed posting rows for the query terms;
    norms_row: this segment's single norms row (doc_base, norm_bytes) —
    read task-side from the seg-partitioned sidecar (_seg_norms_pdf), never
    broadcast (the full norms relation is corpus-doc-count bytes; only this
    segment's blob may reach the task)."""
    if term_rows.empty:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": "int64", "score": "float32"}
        )
    if norms_row.empty:
        raise ValueError(
            f"segment {int(term_rows['seg'].iloc[0])} has postings but no norms row"
        )
    base = int(norms_row["doc_base"].iloc[0])
    norms = np.frombuffer(norms_row["norm_bytes"].iloc[0], dtype=np.uint8)

    # spilled tombstones ride the norms row as a per-SEGMENT slice (the
    # manifest/closure path stays for small delete sets) — per-task memory
    # is this segment's deletes, not the corpus's
    if "tomb" in norms_row.columns:
        tv = norms_row["tomb"].iloc[0]
        if tv is not None and len(tv):
            tombstones = frozenset(tombstones) | {int(x) for x in tv}

    tomb_arr = (
        np.fromiter(tombstones, dtype=np.int64) if tombstones else None
    )

    has_skip = (
        "block_id_offs" in term_rows.columns
        and not term_rows["block_id_offs"].isna().any()
    )
    if mode == "wand" and not conjunctive and has_skip:
        rows = [(r["term"], r) for _, r in term_rows.iterrows()]
        return _wand_skip_kernel(rows, weights, cache, k, norms, base, tomb_arr, codec)

    decoded = []
    orig_pos: dict[int, np.ndarray] = {}
    for i, (_, r) in enumerate(term_rows.iterrows()):
        ids = unpack_doc_ids(r["doc_ids"], codec)
        tfs = unpack_tfs(r["tfs"], codec)
        pos = np.arange(ids.size, dtype=np.int64)
        if tomb_arr is not None:
            keep = ~np.isin(ids, tomb_arr)
            ids, tfs, pos = ids[keep], tfs[keep], pos[keep]
        orig_pos[i] = pos  # original stream index (block metadata alignment)
        decoded.append((r["term"], ids, tfs, r, i))

    if conjunctive:
        # leapfrog at array level: intersect doc sets, rarest first
        decoded.sort(key=lambda t: t[1].size)
        common = decoded[0][1]
        for _, ids, _, _, _ in decoded[1:]:
            common = common[np.isin(common, ids, assume_unique=True)]
        if common.size == 0:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float32"}
            )
        rows = []
        for term, ids, tfs, _, _ in decoded:
            mask = np.isin(ids, common, assume_unique=True)
            rows.append((term, ids[mask], tfs[mask]))
        uniq, summed = _exact_scores(rows, _Rel(norms, base), weights, cache)
        ids_k, sc_k = _topk(uniq, summed, k)
        return pd.DataFrame({"doc_id": ids_k.astype(np.int64), "score": sc_k})

    if mode == "exhaustive":
        rows = [(t, ids, tfs) for t, ids, tfs, _, _ in decoded]
        uniq, summed = _exact_scores(rows, _Rel(norms, base), weights, cache)
        ids_k, sc_k = _topk(uniq, summed, k)
        return pd.DataFrame({"doc_id": ids_k.astype(np.int64), "score": sc_k})

    # ---------------- block-max WAND (vectorized, rank-safe) ----------------
    # 1. seed θ from the highest-max-impact term, scored exactly
    def term_impact(item):
        term, ids, tfs, r, _ = item
        mt = np.frombuffer(r["block_max_tf"], dtype=np.int32).astype(np.float32)
        nbm = np.frombuffer(r["block_max_nb"], dtype=np.int32)
        ub = weights[term] * mt / (mt + cache[nbm])
        return float(ub.max()) if ub.size else 0.0

    seed = max(decoded, key=term_impact)
    rows_seed = [(seed[0], seed[1], seed[2])]
    uniq_s, sc_s = _exact_scores(rows_seed, _Rel(norms, base), weights, cache)
    if uniq_s.size >= k:
        theta = np.partition(-sc_s, k - 1)[k - 1] * -1.0
    else:
        theta = np.float32(0.0)

    # 2-3. per-doc sum of block upper bounds; prune docs below θ
    ids_all, ub_all = [], []
    for term, ids, tfs, r, ti in decoded:
        mt = np.frombuffer(r["block_max_tf"], dtype=np.int32).astype(np.float32)
        nbm = np.frombuffer(r["block_max_nb"], dtype=np.int32)
        ub_block = (weights[term] * mt / (mt + cache[nbm])).astype(np.float32)
        block_of = orig_pos[ti] // 128  # original stream index -> block
        ids_all.append(ids)
        ub_all.append(ub_block[block_of])
    ids_cat = np.concatenate(ids_all)
    ub_cat = np.concatenate(ub_all)
    uniq, inv = np.unique(ids_cat, return_inverse=True)
    ub_sum = np.zeros(uniq.size, dtype=np.float32)
    np.add.at(ub_sum, inv, ub_cat)
    alive = uniq[ub_sum >= theta] if theta > 0 else uniq

    # 4. exact-score survivors only
    rows = []
    for term, ids, tfs, _, _ in decoded:
        mask = np.isin(ids, alive, assume_unique=True)
        rows.append((term, ids[mask], tfs[mask]))
    uniq_f, summed = _exact_scores(rows, _Rel(norms, base), weights, cache)
    ids_k, sc_k = _topk(uniq_f, summed, k)
    return pd.DataFrame({"doc_id": ids_k.astype(np.int64), "score": sc_k})


class _Rel:
    """Relative-indexed norm lookup: norms[doc_id] with segment base offset."""

    def __init__(self, norms: np.ndarray, base: int):
        self.norms = norms
        self.base = base

    def __getitem__(self, ids):
        return self.norms[np.asarray(ids, dtype=np.int64) - self.base]


def search_segments(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    mode: str = "wand",
    conjunctive: bool = False,
) -> DataFrame:
    """Distributed top-k over the packed index: per-segment kernels over
    the grouped postings + a driver-side ordered merge (LIMIT k).

    The postings scan is pruned two ways: partition pruning on seg (live
    set from the manifest) and Parquet predicate pushdown on `term`.
    """
    manifest = read_manifest(index_dir)
    live = _live_segments(manifest)
    from ..codecs.registry import get_codec

    codec = get_codec(manifest.get("codec", "varbyte"))
    postings = (
        load_postings(spark, index_dir)
        .where(F.col("seg").isin(live))
        .where(F.col("term").isin(terms))
    )

    # global stats -> float32 weights (idf * (k1+1)), broadcast via closure
    stats = postings.groupBy("term").agg(F.sum("df").alias("df")).collect()
    n_docs = manifest["n_docs"]
    # avgdl = sumTotalTermFreq / maxDoc (BM25Similarity.java:82-89) — the
    # overlap-inclusive token total; old manifests fall back to sum_doclen
    avgdl = (
        manifest.get("sum_ttf", manifest["sum_doclen"]) / n_docs
        if n_docs
        else 1.0
    )
    weights = {
        r["term"]: (idf32(int(r["df"]), n_docs) * np.float32(2.2)).astype(np.float32)
        for r in stats
    }
    for t in terms:
        weights.setdefault(t, np.float32(0.0))
    cache = norm_cache(avgdl)

    # coordinator-local fast path (bytes-gated, one in-flight slot) — the
    # cold path keeps its historical no-tombstones contract either way
    if _DRIVER_EXEC_SLOTS.acquire(blocking=False):
        try:
            rows = _driver_topk(
                index_dir, live, terms, weights, cache, k, mode,
                conjunctive, frozenset(), codec, False,
            )
        finally:
            _DRIVER_EXEC_SLOTS.release()
        if rows is not None:
            # pandas + Arrow -> LocalTableScan: collect() without a job
            # (~25 ms vs ~220 ms for the ExistingRDD tuple path, measured)
            return spark.createDataFrame(rows, schema=TOPK_SCHEMA)

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        npdf = _seg_norms_pdf(index_dir, int(pdf["seg"].iloc[0]), False)
        return segment_topk_kernel(
            pdf, npdf, weights, cache, k, mode, conjunctive, codec=codec
        )

    # norms are read task-side from the seg-partitioned sidecar
    # (_seg_norms_pdf): NEVER broadcast norms — the relation is total-corpus
    # doc-count bytes (~1 TB at 10^12 docs); the per-segment read keeps
    # per-task memory bounded by one segment regardless of corpus size,
    # without shuffling the relation at all.
    per_seg = (
        postings.select(*_scoring_cols(postings))
        .groupBy("seg")
        .applyInPandas(_run, TOPK_SCHEMA)
    )
    return per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _live_segments(manifest: dict) -> list[int]:
    return [s["seg"] for s in manifest["segments"] if s.get("status") == "done"]


def _seg_norms_pdf(
    index_dir: str, seg: int, spilled: bool, with_norms: bool = True
) -> pd.DataFrame:
    """Task-side read of ONE segment's norms row (and, when the index has
    spilled tombstones, that segment's delete slice) straight from the
    index directory — the co-locate alternative (guide §8) to shipping the
    norms relation through a per-query Exchange.  Norms are written
    partitionBy("seg"), so the task reads exactly its own segment's bytes:
    per-task memory stays one segment's blob at any corpus size, and the
    per-query plan loses the norms-side scan + Exchange + cogroup barrier
    (at 10^12 docs the norms RELATION is ~1 TB; the cogroup re-shuffled
    all of it on every query, this reads only candidate segments' blobs).
    Uses ParquetFile, not the dataset API (~0.2 ms vs ~270 ms first-call
    machinery per worker, measured)."""
    import pyarrow.parquet as pq

    data: dict = {"seg": [seg]}
    if with_norms:
        seg_dir = os.path.join(index_dir, "norms", f"seg={seg}")
        tabs = [
            pq.ParquetFile(os.path.join(seg_dir, f)).read(
                columns=["doc_base", "span", "norm_bytes"]
            )
            for f in sorted(os.listdir(seg_dir))
            if f.endswith(".parquet")
        ]
        rows = [t for t in tabs if t.num_rows]
        if not rows:
            # same contract the cogroup had: postings without a norms row
            # is a corrupt segment (segment_topk_kernel raises on it)
            data.update({"doc_base": [], "span": [], "norm_bytes": [], "seg": []})
            return pd.DataFrame(data)
        t = rows[0]
        data["doc_base"] = [t["doc_base"][0].as_py()]
        data["span"] = [t["span"][0].as_py()]
        data["norm_bytes"] = [t["norm_bytes"][0].as_py()]
    if spilled:
        path = os.path.join(index_dir, "tombstones", "tombstones.parquet")
        pf = pq.ParquetFile(path)
        names = pf.schema_arrow.names
        seg_col = names.index("seg")
        groups = []
        for i in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(i).column(seg_col).statistics
            if st is None or not st.has_min_max or (st.min <= seg <= st.max):
                groups.append(i)
        tomb: list[int] = []
        if groups:
            tt = pf.read_row_groups(groups, columns=["seg", "doc_id"])
            import pyarrow.compute as pc

            tomb = tt.filter(pc.equal(tt["seg"], seg))["doc_id"].to_pylist()
        data["tomb"] = [tomb]
    return pd.DataFrame(data)


# ---- coordinator-local small-query execution (IndexSearcher analog) ----
# A single-term/few-term top-k over a small candidate set is one task's
# worth of work; launching a Spark job for it pays scheduler + exchange +
# Python-worker round trips (~0.5 s) to move ~10 MB.  When the candidate
# row groups' SCORING-column bytes fit under the gate, the query runs in
# the coordinator process instead — the exact same segment_topk_kernel
# per segment, same norms/tombstone reads, same ordered merge, so results
# are bit-identical (pinned by test_driver_path_matches_spark_path).
# Scale-adaptive by construction: the gate is on BYTES, so the same query
# routes to the cluster on a bigger corpus (at 100 TB any common term
# blows the gate); under concurrent load the bounded in-flight slots send
# overflow queries to the cluster too (coordinator CPU is one box).
_DRIVER_QUERY_MAX_BYTES = int(
    os.environ.get("LSI_DRIVER_QUERY_MAX_BYTES", str(32 << 20))
)
# cap on snapshot-cached norms blobs (1 byte/doc/segment) held by a warm
# SegmentSearcher's coordinator-local path — see _driver_topk's `snap`
_NORMS_CACHE_MAX_BYTES = int(
    os.environ.get("LSI_NORMS_CACHE_MAX_BYTES", str(64 << 20))
)
# cap on snapshot-cached DECODED scoring row-groups (the hot-postings RAM
# cache — Lucene leans on the OS page cache for exactly this); first query
# touching a row group pays the parquet decode, later queries filter the
# in-memory Arrow table
_POSTINGS_CACHE_MAX_BYTES = int(
    os.environ.get("LSI_POSTINGS_CACHE_MAX_BYTES", str(128 << 20))
)
import threading as _threading

# ONE slot: a second concurrent coordinator-local query would only fight
# the first for the GIL (measured: 2+ interleaved driver executions run
# slower than the same queries as Spark jobs); overflow goes distributed
_DRIVER_EXEC_SLOTS = _threading.BoundedSemaphore(
    max(1, int(os.environ.get("LSI_DRIVER_EXEC_SLOTS", "1")))
)


def _scoring_file_meta(fpath: str):
    """Per-row-group (term_range, scoring_bytes) for one postings file:
    range from the term column statistics (None = no usable stats, never
    prunable), bytes = compressed size of the SCORING column chunks."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(fpath)
    md = pf.metadata
    names = pf.schema_arrow.names
    ti = names.index("term")
    want = {c for c in SCORING_COLS if c != "seg"}
    out = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        st = rg.column(ti).statistics
        rng = (
            (st.min, st.max)
            if st is not None and st.has_min_max and isinstance(st.min, str)
            else None
        )
        nbytes = 0
        for j in range(rg.num_columns):
            col = rg.column(j)
            if col.path_in_schema in want:
                nbytes += col.total_compressed_size
        out.append((rng, nbytes))
    return out


def _driver_topk(
    index_dir: str,
    segs: list[int],
    terms: list[str],
    weights: dict,
    cache,
    k: int,
    mode: str,
    conjunctive: bool,
    tombstones: frozenset,
    codec,
    spilled: bool,
    meta: dict | None = None,
    snap: dict | None = None,
) -> pd.DataFrame | None:
    """Run the per-segment kernels in the coordinator process and merge with
    the (score desc, doc_id asc) order, returning the ordered top-k as a
    pandas DataFrame (doc_id int64, score float32) — or None when the
    candidate row groups exceed the byte gate (caller launches the Spark
    job).  `meta` optionally caches _scoring_file_meta per file path.
    `snap` optionally caches snapshot-immutable index data across queries
    (a DirectoryReader holds exactly this in memory): per-segment norms
    pdfs under snap["norms"] (byte-capped by LSI_NORMS_CACHE_MAX_BYTES so
    a huge-corpus rare-term workload cannot accrete corpus-sized norms on
    the driver) and parquet footer handles under snap["files"].  Index
    DATA only — never query results."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if not terms or not segs:
        return _EMPTY_TOPK
    if meta is None:
        meta = {}
    lo, hi = min(terms), max(terms)
    # per SEGMENT: the files and row groups that may hold the query terms.
    # A segment's rows must reach ONE kernel call even when they span
    # several files (post-merge layouts): per-file kernels would split a
    # doc's per-term partials across calls and break OR score sums.
    plan: dict[int, list[tuple[str, list[int]]]] = {}
    total = 0
    listing = None if snap is None else snap.setdefault("listing", {})
    try:
        for seg in segs:
            sd = os.path.join(index_dir, "postings", f"seg={seg}")
            names = None if listing is None else listing.get(seg)
            if names is None:
                names = sorted(
                    f for f in os.listdir(sd) if f.endswith(".parquet")
                )
                if listing is not None:
                    listing[seg] = names
            for fname in names:
                fpath = os.path.join(sd, fname)
                fm = meta.get(fpath)
                if fm is None:
                    fm = meta[fpath] = _scoring_file_meta(fpath)
                groups = [
                    i
                    for i, (rng, _b) in enumerate(fm)
                    if rng is None or (rng[0] <= hi and lo <= rng[1])
                ]
                if groups:
                    total += sum(fm[i][1] for i in groups)
                    if total > _DRIVER_QUERY_MAX_BYTES:
                        return None
                    plan.setdefault(seg, []).append((fpath, groups))
    except OSError:
        return None

    vset = pa.array(terms)
    cols = [c for c in SCORING_COLS if c != "seg"]
    norms_cache = files_cache = tables_cache = None
    if snap is not None:
        norms_cache = snap.setdefault("norms", {})
        files_cache = snap.setdefault("files", {})
        tables_cache = snap.setdefault("tables", {})
    outs = []
    for seg, files in plan.items():
        tabs = []
        for fpath, groups in files:
            tkey = (fpath, tuple(groups))
            tab = None if tables_cache is None else tables_cache.get(tkey)
            if tab is None:
                pf = None if files_cache is None else files_cache.get(fpath)
                if pf is None:
                    pf = pq.ParquetFile(fpath)
                    # footer handles are tiny but hold an fd each: cap count
                    if files_cache is not None and len(files_cache) < 4096:
                        files_cache[fpath] = pf
                tab = pf.read_row_groups(groups, columns=cols)
                if tables_cache is not None:
                    tb = tables_cache.get("_bytes", 0) + tab.nbytes
                    if tb <= _POSTINGS_CACHE_MAX_BYTES:
                        tables_cache[tkey] = tab
                        tables_cache["_bytes"] = tb
            tab = tab.filter(pc.is_in(tab["term"], value_set=vset))
            if tab.num_rows:
                tabs.append(tab)
        if not tabs:
            continue
        pdf = (
            pa.concat_tables(tabs).to_pandas() if len(tabs) > 1
            else tabs[0].to_pandas()
        )
        pdf["seg"] = seg
        npdf = None if norms_cache is None else norms_cache.get(seg)
        if npdf is None:
            npdf = _seg_norms_pdf(index_dir, seg, spilled)
            if norms_cache is not None:
                nb = norms_cache.get("_bytes", 0) + (
                    len(npdf["norm_bytes"].iloc[0]) if len(npdf) else 0
                )
                if nb <= _NORMS_CACHE_MAX_BYTES:
                    norms_cache[seg] = npdf
                    norms_cache["_bytes"] = nb
        outs.append(
            segment_topk_kernel(
                pdf, npdf, weights, cache, k, mode, conjunctive,
                tombstones, codec,
            )
        )
    outs = [o for o in outs if len(o)]
    if not outs:
        return _EMPTY_TOPK
    allr = pd.concat(outs, ignore_index=True)
    scores = allr["score"].to_numpy()
    ids = allr["doc_id"].to_numpy()
    order = np.lexsort((ids, -scores))[:k]
    return pd.DataFrame(
        {
            "doc_id": ids[order].astype(np.int64),
            "score": scores[order].astype(np.float32),
        }
    )


_EMPTY_TOPK = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float32"),
    }
)


class SegmentSearcher:
    """Point-in-time searcher over a packed index (DirectoryReader analog).

    Loads the manifest once, caches the postings/norms DataFrames and the
    global term-stats dictionary; per-query work is then a single Spark job
    (scan pruned by seg + term, per-segment kernel, ordered merge).
    """

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        self.live = _live_segments(self.manifest)
        self.postings = load_postings(spark, index_dir).where(F.col("seg").isin(self.live))
        # norms no longer ride a per-query cogroup: every kernel task reads
        # its own segment's norms blob (and spilled-tombstone slice) straight
        # from the partitioned sidecar via _seg_norms_pdf — see the helper's
        # docstring.  The norms DataFrame survives only as the lazy `norms`
        # property for callers that still want the relation.
        self._spilled = bool(self.manifest.get("tombstones_spilled"))
        self._norms_df = None
        self.tombstones = frozenset(self.manifest.get("tombstones", []))
        self.n_docs = self.manifest["n_docs"]
        self.avgdl = (
            self.manifest.get("sum_ttf", self.manifest["sum_doclen"])
            / self.n_docs
            if self.n_docs
            else 1.0
        )
        self.cache = norm_cache(self.avgdl)
        # Codec.forName at reader open (Codec.java:94): the manifest declares
        # the postings format; kernels decode with the resolved codec
        from ..codecs.registry import get_codec

        self.codec = get_codec(self.manifest.get("codec", "varbyte"))
        self._blooms: dict | None = None  # lazy per-segment term blooms

    @property
    def norms(self) -> DataFrame:
        """The per-segment norms relation (with spilled tombstones joined
        on), built and persisted on first access.  Query paths read norms
        task-side via _seg_norms_pdf instead; this stays for callers that
        want the relation itself (plan probes, ad-hoc joins).

        NOTE (r10, measured): do NOT persist this pre-partitioned on seg.
        A repartition(shuffle_partitions, "seg").persist() removes the
        norms-side Exchange from cogroup plans (InMemoryRelation preserves
        outputPartitioning) and looked ~8% faster sequentially, but without
        the Exchange there is no AQE coalescing either, so every query's
        kernel stage ran at the full partition count — 24 concurrent
        queries went 4.6 s -> 8-12 s (BENCH/ab_r10 notes)."""
        if self._norms_df is None:
            from ..index.segment import load_tombstones_per_seg

            norms = load_norms(self.spark, self.index_dir).where(
                F.col("seg").isin(self.live)
            )
            tomb_df = load_tombstones_per_seg(
                self.spark, self.index_dir, self.manifest
            )
            if tomb_df is not None:
                norms = norms.join(tomb_df, "seg", "left")
            self._norms_df = norms.persist()
            self._norms_df.count()
        return self._norms_df

    def _load_blooms(self) -> dict:
        """Per-segment term-dictionary blooms (BloomFilteringPostingsFormat
        role, codecs/bloom.py) — kilobytes per segment, loaded once per
        snapshot; {} when the index carries no bloom sidecar."""
        if self._blooms is None:
            blooms: dict = {}
            if self.manifest.get("bloom"):
                from ..index.segment import load_blooms

                df = load_blooms(self.spark, self.index_dir)
                if df is not None:
                    live = set(self.live)
                    blooms = {
                        int(r["seg"]): (
                            int(r["nbits"]),
                            np.frombuffer(bytes(r["bits"]), dtype=np.uint8),
                        )
                        for r in df.collect()
                        if int(r["seg"]) in live
                    }
            self._blooms = blooms
        return self._blooms

    def candidate_segs(self, terms: list[str]) -> list[int] | None:
        """Segments that MAY contain any query term; None = no blooms, no
        pruning.  A bloom negative is definitive (miss terms schedule zero
        tasks); segments lacking a bloom row always stay candidates."""
        blooms = self._load_blooms()
        if not blooms:
            return None
        from ..codecs.bloom import murmurhash64

        # hash each term ONCE (64-bit); per segment only mask + bit test
        hashes = np.fromiter(
            (murmurhash64(t.encode("utf-8")) for t in terms),
            dtype=np.uint64, count=len(terms),
        )
        cands = []
        for s in self.live:
            entry = blooms.get(s)
            if entry is None:
                cands.append(s)
                continue
            nbits, bits = entry
            h = (hashes & np.uint64(nbits - 1)).astype(np.int64)
            if bool(((bits[h >> 3] >> (h & 7)) & 1).any()):
                cands.append(s)
        return cands

    # queried-term stats memo: bounded by the observed query workload (a
    # search service's working set), NOT the vocabulary — the full term
    # dictionary at 10^12-file scale has billions of entries and must never
    # be collected to the driver
    _DF_MEMO_MAX = 262_144

    # bounded term-dictionary block cache (Lucene terms-index block role):
    # touched row groups only, so it is bounded by the query workload —
    # never the vocabulary — and cleared wholesale past the TERM-count cap
    # (a block is one row group's term->df slice; capping blocks alone
    # would not bound memory at 100 TB row-group sizes)
    _TD_CACHE_MAX_TERMS = 1 << 21

    def _df_seek(self, terms: list[str]) -> dict[str, int] | None:
        """Driver-side term-dictionary seek (BlockTree lookup analog): the
        postings segments are term-sorted parquet, so a term's global df is
        the sum over live segments of the matching rows in the row groups
        whose [min,max] term statistics cover it — read with ParquetFile
        (term+df columns only, ~tens of KB per row group regardless of the
        posting payload sizes), bloom-pruned per segment first.  ~7 ms warm
        per term at 64 segments vs ~150 ms for the equivalent one-job scan
        (and no Spark job to contend with under concurrent queries).  Each
        touched row group's term->df map is cached once per snapshot (the
        index is immutable point-in-time), so 24 concurrent first-seen
        queries decode each block once instead of 24 times.  Returns None
        when the layout can't be listed (caller falls back to the scan)."""
        import pyarrow.parquet as pq

        from ..codecs.bloom import murmurhash64

        blooms = self._load_blooms()
        hashes = {t: np.uint64(murmurhash64(t.encode("utf-8"))) for t in terms}
        meta = getattr(self, "_td_meta", None)
        if meta is None:
            # fpath -> list of per-row-group (min, max) term ranges (None =
            # no usable stats); blocks: (fpath, rg) -> {term: df}
            meta = self._td_meta = {}
            self._td_blocks = {}
        blocks = self._td_blocks
        out = {t: 0 for t in terms}
        pdir = os.path.join(self.index_dir, "postings")
        try:
            for seg in self.live:
                entry = blooms.get(seg)
                if entry is None:
                    seg_terms = terms
                else:
                    nbits, bits = entry
                    seg_terms = [
                        t
                        for t in terms
                        if (
                            bits[int(hashes[t] & np.uint64(nbits - 1)) >> 3]
                            >> (int(hashes[t] & np.uint64(nbits - 1)) & 7)
                        )
                        & 1
                    ]
                if not seg_terms:
                    continue  # bloom negatives are definitive: df stays 0
                lo, hi = min(seg_terms), max(seg_terms)
                sd = os.path.join(pdir, f"seg={seg}")
                for fname in sorted(os.listdir(sd)):
                    if not fname.endswith(".parquet"):
                        continue
                    fpath = os.path.join(sd, fname)
                    ranges = meta.get(fpath)
                    pf = None
                    if ranges is None:
                        pf = pq.ParquetFile(fpath)
                        md = pf.metadata
                        ti = pf.schema_arrow.names.index("term")
                        ranges = []
                        for i in range(md.num_row_groups):
                            st = md.row_group(i).column(ti).statistics
                            ranges.append(
                                (st.min, st.max)
                                if st is not None
                                and st.has_min_max
                                and isinstance(st.min, str)
                                else None
                            )
                        meta[fpath] = ranges
                    for i, rng in enumerate(ranges):
                        if rng is not None and (hi < rng[0] or lo > rng[1]):
                            continue
                        tmap = blocks.get((fpath, i))
                        if tmap is None:
                            if pf is None:
                                pf = pq.ParquetFile(fpath)
                            tab = pf.read_row_group(i, columns=["term", "df"])
                            tmap = dict(
                                zip(
                                    tab["term"].to_pylist(),
                                    tab["df"].to_pylist(),
                                )
                            )
                            if (
                                getattr(self, "_td_nterms", 0) + len(tmap)
                                > self._TD_CACHE_MAX_TERMS
                            ):
                                blocks.clear()
                                self._td_nterms = 0
                            blocks[(fpath, i)] = tmap
                            self._td_nterms = (
                                getattr(self, "_td_nterms", 0) + len(tmap)
                            )
                        for t in seg_terms:
                            dfv = tmap.get(t)
                            if dfv is not None:
                                out[t] += int(dfv)
        except OSError:
            return None
        return out

    def _dfs(self, terms: list[str]) -> dict[str, int]:
        """Per-query term stats: a driver-side term-dictionary seek over
        the term-sorted segment files (_df_seek) for interactive-sized
        term sets, or a broadcast semi-join scan for large batches;
        results are memoized per searcher snapshot (the index is immutable
        point-in-time, so entries never go stale)."""
        memo = getattr(self, "_df_memo", None)
        if memo is None:
            memo = self._df_memo = {}
        missing = [t for t in terms if t not in memo]
        if missing:
            found = self._df_seek(missing) if len(missing) <= 32 else None
            if found is None:
                stats = self.postings.select("term", "df")
                if len(missing) > 32:
                    terms_df = self.spark.createDataFrame(
                        [(t,) for t in missing], ["term"]
                    )
                    stats = stats.join(F.broadcast(terms_df), "term", "left_semi")
                else:
                    stats = stats.where(F.col("term").isin(missing))
                rows = stats.groupBy("term").agg(F.sum("df").alias("df")).collect()
                found = {r["term"]: int(r["df"]) for r in rows}
            if len(memo) + len(missing) > self._DF_MEMO_MAX:
                memo.clear()  # crude bound; point lookups repopulate cheaply
            for t in missing:
                memo[t] = int(found.get(t, 0))
        return {t: memo[t] for t in terms}

    def _weights(self, terms: list[str]) -> dict[str, np.float32]:
        return {
            t: (idf32(df, self.n_docs) * np.float32(2.2)).astype(np.float32)
            for t, df in self._dfs(terms).items()
        }

    def search_intervals(self, query, k: int = 10) -> DataFrame:
        """Positional/interval query over the PACKED index: per segment,
        decode positions only for docs containing every required term
        (PostingFeatures.POSITIONS analog — the positions column is read
        only on this path), run the minimal-interval kernel per doc, score
        with IntervalFilterQuery semantics (freq()==1, summed idf)."""
        from ..codecs.varbyte import unpack_positions_flat
        from ..intervals import kernel as IK
        from ..intervals import vectorized as VK
        from ..search import queries as Q

        leaf_terms = sorted(set(Q.terms_of(query)))
        dfs = self._dfs(leaf_terms)
        sum_idf = np.float32(0.0)
        for t in Q.terms_of(query):  # float32 accumulation, idfExplain-style
            sum_idf = np.float32(sum_idf + idf32(dfs.get(t, 0), self.n_docs))
        weight = np.float32(sum_idf * np.float32(2.2))
        cache = self.cache
        tombstones = self.tombstones
        q = query
        freq_mode = (
            "count"
            if isinstance(q, (Q.Phrase, Q.MultiPhrase, Q.NGramPhrase))
            and getattr(q, "slop", 0) == 0
            else ("sloppy" if isinstance(q, Q.Phrase) else "one")
        )
        # classic-scorer sloppy phrase / sloppy multi-phrase:
        # SloppyPhraseScorer walk, never the interval iterators
        # (PhraseQuery.java:296, MultiPhraseQuery.java:269)
        classic_slots = None
        if (
            isinstance(q, Q.Phrase)
            and q.slop > 0
            and getattr(q, "scorer", "classic") == "classic"
        ):
            classic_slots = [frozenset((t,)) for t in q.terms]
        elif isinstance(q, Q.MultiPhrase) and q.slop > 0:
            classic_slots = [frozenset(s) for s in q.slots]
        classic_phrase = classic_slots is not None
        shape = VK.fast_shape(q)
        if classic_phrase and (
            shape is None or shape[0] not in ("csloppy2", "csloppyk", "csloppyr")
        ):
            shape = None  # multi-term slots: Python walk
        if classic_phrase and shape is not None:
            freq_mode = "sloppy"  # kernel returns the walk's sloppyFreq
        codec = self.codec

        index_dir, spilled = self.index_dir, self._spilled

        def _run(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float32"}
                )
            npdf = _seg_norms_pdf(index_dir, int(pdf["seg"].iloc[0]), spilled)
            if npdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float32"}
                )
            base = int(npdf["doc_base"].iloc[0])
            norms = np.frombuffer(npdf["norm_bytes"].iloc[0], dtype=np.uint8)
            tombs = tombstones
            if "tomb" in npdf.columns:
                tv = npdf["tomb"].iloc[0]
                if tv is not None and len(tv):
                    tombs = frozenset(tombs) | {int(x) for x in tv}
            per_term = {}
            for _, r in pdf.iterrows():
                ids = unpack_doc_ids(r["doc_ids"], codec)
                tfs = unpack_tfs(r["tfs"], codec)
                flat, offs = unpack_positions_flat(r["positions"], tfs, codec)
                per_term[r["term"]] = (ids, flat, offs)

            if shape is not None:
                # vectorized: the segment's flat position streams become
                # (doc*stride + pos) key arrays; one numpy program per segment
                maxpos = max(
                    (int(flat.max()) if flat.size else 0)
                    for _, flat, _ in per_term.values()
                )
                stride = maxpos + len(per_term) + 2
                term_keys = {
                    t: np.repeat(ids, np.diff(offs)).astype(np.int64) * stride
                    + flat.astype(np.int64)
                    for t, (ids, flat, offs) in per_term.items()
                }
                docs, cnt, sfreq = VK.run_shape(shape, term_keys, stride)
                if tombs and docs.size:
                    keep = ~np.isin(docs, np.fromiter(tombs, dtype=np.int64))
                    docs, cnt, sfreq = docs[keep], cnt[keep], sfreq[keep]
                if freq_mode == "count":
                    freq = cnt.astype(np.float32)
                elif freq_mode == "sloppy":
                    freq = sfreq.astype(np.float32)
                else:
                    freq = np.ones(docs.size, dtype=np.float32)
                nb = norms[docs - base]
                sc = (weight * freq / (freq + cache[nb])).astype(np.float32)
                return pd.DataFrame({"doc_id": docs.astype(np.int64), "score": sc})

            # fallback: per-doc lazy iterators (arbitrary nested trees)
            all_ids = np.unique(np.concatenate([v[0] for v in per_term.values()]))
            out_ids, out_scores = [], []
            idx_of = {
                t: dict(zip(v[0].tolist(), range(v[0].size))) for t, v in per_term.items()
            }
            for d in all_ids.tolist():
                if d in tombs:
                    continue
                pos = {}
                for t, (ids, flat, offs) in per_term.items():
                    j = idx_of[t].get(d)
                    if j is not None:
                        pos[t] = flat[offs[j] : offs[j + 1]].tolist()
                if classic_phrase:
                    from ..search.sloppy import sloppy_slots_freq

                    nm, fr = sloppy_slots_freq(classic_slots, pos, q.slop)
                    if nm == 0:
                        continue
                    freq = np.float32(fr)
                    nb = norms[d - base]
                    sc = np.float32(weight * freq / (freq + cache[nb]))
                    out_ids.append(d)
                    out_scores.append(sc)
                    continue
                it = IK.build_iter(q, pos)
                if it is None:
                    continue
                items = it.items if isinstance(it, IK.ReplayIter) else IK._materialize(it)
                if not items:
                    continue
                if freq_mode == "count":
                    freq = np.float32(len(items))
                elif freq_mode == "sloppy":
                    freq = np.float32(
                        sum(1.0 / (dist + 1) if dist >= 0 else 1.0 for _, dist in items)
                    )
                else:
                    freq = np.float32(1.0)
                nb = norms[d - base]
                sc = np.float32(weight * freq / (freq + cache[nb]))
                out_ids.append(d)
                out_scores.append(sc)
            return pd.DataFrame(
                {"doc_id": np.array(out_ids, dtype=np.int64),
                 "score": np.array(out_scores, dtype=np.float32)}
            )

        postings = self.postings.where(F.col("term").isin(leaf_terms))
        per_seg = postings.groupBy("seg").applyInPandas(_run, TOPK_SCHEMA)
        return per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def intervals_with_offsets(self, query) -> DataFrame:
        """(doc_id, begin, end, offset_begin, offset_end) for every surviving
        interval of `query`, with character offsets decoded straight from the
        packed OFFSETS posting stream (index built with keep_offsets=True) —
        the packed-path twin of Searcher.intervals_with_offsets; no
        re-tokenization anywhere."""
        from ..codecs.varbyte import unpack_offsets_flat, unpack_positions_flat
        from ..intervals import kernel as IK
        from ..search import queries as Q

        if not self.manifest.get("offsets"):
            raise ValueError("index was built without keep_offsets=True")
        from ..intervals import vectorized as VK

        leaf_terms = sorted(set(Q.terms_of(query)))
        tombstones = self.tombstones
        q = query
        shape = VK.interval_shape(q)  # endpoint-extractable? decided driver-side
        codec = self.codec

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("begin", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
                T.StructField("offset_begin", T.IntegerType()),
                T.StructField("offset_end", T.IntegerType()),
            ]
        )

        index_dir, spilled = self.index_dir, self._spilled

        def _run(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {c: [] for c in ["doc_id", "begin", "end", "offset_begin", "offset_end"]}
            ).astype("int64")
            if pdf.empty:
                return empty
            tombs = tombstones
            if spilled:
                npdf = _seg_norms_pdf(
                    index_dir, int(pdf["seg"].iloc[0]), True, with_norms=False
                )
                tv = npdf["tomb"].iloc[0]
                if tv is not None and len(tv):
                    tombs = frozenset(tombs) | {int(x) for x in tv}
            per_term = {}
            for _, r in pdf.iterrows():
                ids = unpack_doc_ids(r["doc_ids"], codec)
                tfs = unpack_tfs(r["tfs"], codec)
                flat, offs = unpack_positions_flat(r["positions"], tfs, codec)
                fs, fe, _ = unpack_offsets_flat(r["offsets"], tfs, codec)
                per_term[r["term"]] = (ids, flat, offs, fs, fe)

            if shape is not None:
                # vectorized: surviving interval ENDPOINT keys from the flat
                # streams, then ONE merged searchsorted maps each endpoint to
                # its character offsets — no per-doc Python loop
                maxpos = max(
                    (int(flat.max()) if flat.size else 0)
                    for _, flat, _, _, _ in per_term.values()
                )
                stride = maxpos + len(per_term) + 2
                term_keys, key_parts, fs_parts, fe_parts = {}, [], [], []
                for t, (ids, flat, offs, fs, fe) in per_term.items():
                    keys = (
                        np.repeat(ids, np.diff(offs)).astype(np.int64) * stride
                        + flat.astype(np.int64)
                    )
                    term_keys[t] = keys
                    key_parts.append(keys)
                    fs_parts.append(fs)
                    fe_parts.append(fe)
                bkeys, ekeys = VK.run_shape_intervals(shape, term_keys, stride)
                if bkeys.size == 0:
                    return empty
                if tombs:
                    keep = ~np.isin(
                        bkeys // stride, np.fromiter(tombs, dtype=np.int64)
                    )
                    bkeys, ekeys = bkeys[keep], ekeys[keep]
                    if bkeys.size == 0:
                        return empty
                keys_all = np.concatenate(key_parts)
                fs_all = np.concatenate(fs_parts)
                fe_all = np.concatenate(fe_parts)
                order = np.argsort(keys_all, kind="stable")
                keys_sorted = keys_all[order]
                ob = np.asarray(fs_all)[order][
                    np.searchsorted(keys_sorted, bkeys)
                ]
                oe = np.asarray(fe_all)[order][
                    np.searchsorted(keys_sorted, ekeys)
                ]
                return pd.DataFrame(
                    {
                        "doc_id": (bkeys // stride).astype(np.int64),
                        "begin": (bkeys % stride).astype(np.int64),
                        "end": (ekeys % stride).astype(np.int64),
                        "offset_begin": ob.astype(np.int64),
                        "offset_end": oe.astype(np.int64),
                    }
                )

            all_ids = np.unique(np.concatenate([v[0] for v in per_term.values()]))
            idx_of = {
                t: dict(zip(v[0].tolist(), range(v[0].size)))
                for t, v in per_term.items()
            }
            rows = []
            for d in all_ids.tolist():
                if d in tombs:
                    continue
                pos, omap = {}, {}
                for t, (ids, flat, offs, fs, fe) in per_term.items():
                    j = idx_of[t].get(d)
                    if j is not None:
                        sl = slice(offs[j], offs[j + 1])
                        ps = flat[sl]
                        pos[t] = ps.tolist()
                        for p, s0, e0 in zip(ps, fs[sl], fe[sl]):
                            omap[int(p)] = (int(s0), int(e0))
                m = IK.match_intervals(q, pos)
                if not m:
                    continue
                for b, e in m:
                    ob = omap.get(b, (0, 0))[0]
                    oe = omap.get(e, (0, 0))[1]
                    rows.append((d, b, e, ob, oe))
            if not rows:
                return empty
            return pd.DataFrame(
                rows, columns=["doc_id", "begin", "end", "offset_begin", "offset_end"]
            )

        postings = self.postings.where(F.col("term").isin(leaf_terms))
        return postings.groupBy("seg").applyInPandas(_run, schema)

    def search_many(
        self,
        term_queries: list[str],
        k: int = 10,
        mode: str = "wand",
        prune_df: int | None = None,
    ) -> DataFrame:
        """Batch top-k: score MANY single-term queries in ONE Spark job.

        The throughput shape for analytical/offline retrieval (and the
        honest scaling measurement: work per task grows with the query
        batch, so task-scheduling overhead amortizes).  Returns
        (query_term, doc_id, score, rank<=k) via per-segment kernels + one
        window.

        Term stats stay IN-PLAN: global df per term is aggregated from the
        same pruned scan and broadcast-joined back onto the postings, so no
        driver round-trip ever happens — one job end to end, weights
        computed vectorized inside the kernel from the df_total column.
        """
        from pyspark.sql import Window

        terms = sorted(set(term_queries))
        n_docs = self.n_docs
        cache = self.cache
        tombstones = self.tombstones
        if len(terms) > 32:
            # broadcast hash semi-join beats a giant per-row IN list (and is
            # the shape that survives 10^5-term batches at cluster scale)
            terms_df = self.spark.createDataFrame([(t,) for t in terms], ["term"])
            postings = self.postings.join(F.broadcast(terms_df), "term", "left_semi")
        else:
            postings = self.postings.where(F.col("term").isin(terms))
        cands = self.candidate_segs(terms)
        if cands is not None and len(cands) < len(self.live):
            postings = postings.where(F.col("seg").isin(cands))
        stats = postings.groupBy("term").agg(F.sum("df").alias("df_total"))
        postings = postings.join(F.broadcast(stats), "term")

        schema = T.StructType(
            [
                T.StructField("query_term", T.StringType()),
                T.StructField("doc_id", T.LongType()),
                T.StructField("score", T.FloatType()),
            ]
        )

        codec = self.codec

        # prune_df opt-in: rows above it take the per-row block-max pruned
        # decode (_pruned_term_topk — reads O(k/128+1) blocks when block
        # bounds separate).  Default OFF: on flat tf/norm distributions
        # (this engine's bench corpus) every block's bound ties the k-th
        # score, nothing can be skipped rank-safely, and the per-row
        # Python (~0.1-1.7 ms/row) only subtracts from the one-pass
        # batched kernel (measured 921 -> 255 q/s on the 1M-doc battery).
        # On zipf-like real corpora with skewed tf the pruned path wins;
        # callers choose with search_many(..., prune_df=2048).
        SMALL_DF = prune_df if prune_df is not None else (1 << 62)

        index_dir, spilled = self.index_dir, self._spilled

        def _run(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"query_term": [], "doc_id": [], "score": []}).astype(
                {"query_term": "object", "doc_id": "int64", "score": "float32"}
            )
            if pdf.empty:
                return empty
            npdf = _seg_norms_pdf(index_dir, int(pdf["seg"].iloc[0]), spilled)
            if npdf.empty:
                return empty
            base = int(npdf["doc_base"].iloc[0])
            norms = np.frombuffer(npdf["norm_bytes"].iloc[0], dtype=np.uint8)
            tombs = tombstones
            if "tomb" in npdf.columns:
                tv = npdf["tomb"].iloc[0]
                if tv is not None and len(tv):
                    tombs = frozenset(tombs) | {int(x) for x in tv}
            tomb_arr = (
                np.fromiter(tombs, dtype=np.int64) if tombs else None
            )
            w_all = (
                idf32(pdf["df_total"].to_numpy(dtype=np.int64), n_docs)
                * np.float32(2.2)
            ).astype(np.float32)
            out_t, out_d, out_s = [], [], []
            terms_col = pdf["term"].tolist()

            big = pdf["df"].to_numpy(dtype=np.int64) > SMALL_DF
            # the pruned per-term decode needs the block-max sidecar; on an
            # index built without block metadata route everything through
            # the batched small path instead of KeyError-ing in the task
            # (mirrors the interactive wand guard at ~line 306)
            _meta_cols = ("block_max_tf", "block_max_nb", "block_id_offs",
                          "block_tf_offs", "block_last")
            if big.any():
                if any(c not in pdf.columns for c in _meta_cols):
                    big[:] = False
                else:
                    big &= pdf["block_max_tf"].notna().to_numpy()
            big_idx = np.flatnonzero(big)
            if big_idx.size:
                # column-array row access: pdf.iloc is ~0.5 ms/row on wide
                # binary frames and would dominate the pruning win
                cols = {
                    c: pdf[c].to_numpy()
                    for c in ("df", "doc_ids", "tfs", "block_max_tf",
                              "block_max_nb", "block_id_offs",
                              "block_tf_offs", "block_last")
                }
                rows_big = [{c: v[i] for c, v in cols.items()} for i in big_idx]
                results = _pruned_topk_rows(
                    rows_big, w_all[big_idx], cache, norms, base, k,
                    codec, tomb_arr,
                )
                for i, (ids_k, sc_k) in zip(big_idx, results):
                    out_t.extend([terms_col[int(i)]] * ids_k.size)
                    out_d.append(ids_k)
                    out_s.append(sc_k)

            small = pdf[~big] if big_idx.size else pdf
            if not small.empty:
                # batched decode: one codec pass per CHUNK of rows (the
                # registry codecs decode concatenations), then a segmented
                # gap-cumsum; arithmetic is in-place.  Per-posting
                # intermediate traffic is the measured memory-bandwidth pin
                # of this phase, so (a) every avoided copy shows up in the
                # scaling ratio — ids are .view()ed not .astype()d, the
                # idf weight is a per-row scalar slice multiply instead of
                # an np.repeat array, the norm->denom gather goes through a
                # doc-sized precomputed table — and (b) rows are processed
                # in bounded chunks so the 4 passes after decode run over
                # cache-resident arrays instead of streaming DRAM five
                # times (the fused-accumulation answer to the r6 scaling
                # diagnosis).  The id chain must stay int64: the cumsum
                # runs over the chunk concatenation (reset per row by
                # seg_base afterwards), so its running value is
                # sum-of-max-doc-ids across rows, far past 2^31.
                counts = small["df"].to_numpy(dtype=np.int64)
                offsets = np.zeros(counts.size + 1, dtype=np.int64)
                np.cumsum(counts, out=offsets[1:])
                w_small = w_all[~big] if big_idx.size else w_all
                small_terms = small["term"].tolist()
                id_bufs = small["doc_ids"].tolist()
                tf_bufs = small["tfs"].tolist()
                dbd = cache[norms]  # per-doc denom base, one gather per task
                # chunk-level vector passes (NOT per-row: with a zipf
                # vocabulary most rows are tiny, and per-row numpy dispatch
                # measured 5-10% slower than chunked passes end to end);
                # the chunk bound keeps live intermediates L3-sized
                CHUNK = int(os.environ.get("LSI_BATCH_CHUNK", str(1 << 20)))
                n_rows = counts.size
                row = 0
                while row < n_rows:
                    row_end = row + 1
                    total = int(counts[row])
                    while row_end < n_rows and total + counts[row_end] <= CHUNK:
                        total += int(counts[row_end])
                        row_end += 1
                    rel = offsets[row : row_end + 1] - offsets[row]
                    ids_cat = codec.decode(
                        b"".join(id_bufs[row:row_end])
                    ).view(np.int64)
                    np.cumsum(ids_cat, out=ids_cat)
                    seg_base = np.zeros(ids_cat.size, dtype=np.int64)
                    starts = rel[:-1][counts[row:row_end] > 0]
                    seg_base[starts[1:]] = ids_cat[starts[1:] - 1]
                    np.maximum.accumulate(seg_base, out=seg_base)
                    ids_cat -= seg_base
                    tfs_cat = codec.decode(
                        b"".join(tf_bufs[row:row_end])
                    ).astype(np.float32)
                    np.subtract(ids_cat, base, out=seg_base)  # reuse as index
                    denom = dbd[seg_base]
                    denom += tfs_cat
                    for i in range(row, row_end):
                        # scalar multiply keeps the canonical f32 op order
                        # (w*tf first) bit-identical to _exact_scores
                        tfs_cat[rel[i - row] : rel[i - row + 1]] *= w_small[i]
                    tfs_cat /= denom
                    sc_cat = tfs_cat
                    if tombs:
                        dead = np.isin(ids_cat, tomb_arr)
                        sc_cat[dead] = np.float32(-1.0)  # never reaches top-k
                    for i in range(row, row_end):
                        a, b2 = rel[i - row], rel[i - row + 1]
                        ids_k, sc_k = _topk(ids_cat[a:b2], sc_cat[a:b2], k)
                        out_t.extend([small_terms[i]] * ids_k.size)
                        out_d.append(ids_k)
                        out_s.append(sc_k)
                    row = row_end
            if not out_t:
                return empty
            return pd.DataFrame(
                {
                    "query_term": out_t,
                    "doc_id": np.concatenate(out_d).astype(np.int64),
                    "score": np.concatenate(out_s),
                }
            )

        per_seg = (
            postings.select(*_scoring_cols(postings, "df_total"))
            .groupBy("seg")
            .applyInPandas(_run, schema)
        )
        w = Window.partitionBy("query_term").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            per_seg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

    def search(
        self, terms: list[str], k: int = 10, mode: str = "wand", conjunctive: bool = False
    ) -> DataFrame:
        """Top-k for one query: weights come from the per-snapshot _dfs
        memo (one tiny pruned-scan collect per UNSEEN term — bounded by the
        query workload, never the vocabulary), then the kernel job runs
        with them in its closure.

        Shape note (r10, measured): the r9 in-plan variant (stats
        aggregated in the same job and broadcast-joined back) re-priced
        every query at ~0.85 s vs 0.15 s stats + 0.62 s kernel separate at
        sf0.1 — the broadcast exchange + AQE replan inside the query job
        cost more than a driver round-trip, and the memo makes repeated
        terms (an interactive workload's common case) skip the stats job
        entirely.  Weight VALUES are identical either way (missing terms
        have no postings rows, so their weight never multiplies anything)."""
        weights = self._weights(terms)
        cache = self.cache
        tombstones = self.tombstones
        codec = self.codec
        cands = self.candidate_segs(terms)
        seg_list = cands if cands is not None else list(self.live)

        # coordinator-local fast path: bytes-gated + one in-flight slot
        # (see the _driver_topk block comment); falls through to the Spark
        # job on a big candidate set, concurrent load, or unreadable layout
        if _DRIVER_EXEC_SLOTS.acquire(blocking=False):
            try:
                fmeta = getattr(self, "_scoring_meta", None)
                if fmeta is None:
                    fmeta = self._scoring_meta = {}
                snap = getattr(self, "_snap_cache", None)
                if snap is None:
                    snap = self._snap_cache = {}
                rows = _driver_topk(
                    self.index_dir, seg_list, terms, weights, cache, k,
                    mode, conjunctive, tombstones, codec, self._spilled,
                    fmeta, snap,
                )
            finally:
                _DRIVER_EXEC_SLOTS.release()
            if rows is not None:
                # pandas + Arrow -> LocalTableScan: collect() without
                # a job (~25 ms vs ~220 ms tuple path, measured)
                return self.spark.createDataFrame(rows, schema=TOPK_SCHEMA)

        postings = self.postings.where(F.col("term").isin(terms))
        if cands is not None and len(cands) < len(self.live):
            postings = postings.where(F.col("seg").isin(cands))

        index_dir, spilled = self.index_dir, self._spilled

        def _run(pdf: pd.DataFrame) -> pd.DataFrame:
            npdf = _seg_norms_pdf(index_dir, int(pdf["seg"].iloc[0]), spilled)
            return segment_topk_kernel(
                pdf, npdf, weights, cache, k, mode, conjunctive, tombstones, codec
            )

        per_seg = (
            postings.select(*_scoring_cols(postings))
            .groupBy("seg")
            .applyInPandas(_run, TOPK_SCHEMA)
        )
        return per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def count(self, terms: list[str], conjunctive: bool = False) -> int:
        """TotalHitCountCollector over the packed index: per-segment numpy
        counting inside the same norms cogroup the scoring kernels use.
        Doc ids are globally disjoint across segments (contiguous ranges by
        construction), so the total is the SUM of per-segment counts — no
        explode, no corpus-wide distinct shuffle.  The only Python loop is
        one decode call per (term, segment) row."""
        from pyspark.sql import types as T

        tombstones = self.tombstones
        codec = self.codec
        n_required = len(set(terms))
        postings = self.postings.where(F.col("term").isin(terms))
        schema = T.StructType([T.StructField("n", T.LongType())])

        index_dir, spilled = self.index_dir, self._spilled

        def _run(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf.empty:
                return pd.DataFrame({"n": pd.Series([], dtype="int64")})
            tombs = tombstones
            if spilled:
                npdf = _seg_norms_pdf(
                    index_dir, int(pdf["seg"].iloc[0]), True, with_norms=False
                )
                tv = npdf["tomb"].iloc[0]
                if tv is not None and len(tv):
                    tombs = frozenset(tombs) | {int(x) for x in tv}
            ids = np.concatenate(
                [unpack_doc_ids(b, codec) for b in pdf["doc_ids"]]
            )
            if conjunctive:
                u, c = np.unique(ids, return_counts=True)
                u = u[c >= n_required]
            else:
                u = np.unique(ids)
            if tombs:
                u = u[~np.isin(u, np.fromiter(tombs, dtype=np.int64))]
            return pd.DataFrame({"n": [int(u.size)]})

        per_seg = (
            postings.select("seg", "term", "doc_ids")
            .groupBy("seg")
            .applyInPandas(_run, schema)
        )
        total = per_seg.agg(F.sum("n").alias("n")).collect()[0]["n"]
        return int(total or 0)

    def scan_with_weights(
        self,
        terms: list[str],
        weights: dict,
        cache,
        k: int,
        mode: str = "wand",
        conjunctive: bool = False,
    ) -> DataFrame:
        """Per-segment top-k with CALLER-SUPPLIED weights and norm cache —
        the shard-side half of distributed search: a coordinator computes
        globally consistent stats (summed df, global avgdl) and each shard
        scores with them (Solr distributed IDF / ExactStatsCache role).
        Returns the un-merged per-segment candidates (coordinator merges)."""
        tombstones = self.tombstones
        codec = self.codec
        postings = self.postings.where(F.col("term").isin(terms))
        index_dir, spilled = self.index_dir, self._spilled

        def _run(pdf: pd.DataFrame) -> pd.DataFrame:
            npdf = _seg_norms_pdf(index_dir, int(pdf["seg"].iloc[0]), spilled)
            return segment_topk_kernel(
                pdf, npdf, weights, cache, k, mode, conjunctive, tombstones, codec
            )

        return (
            postings.select(*_scoring_cols(postings))
            .groupBy("seg")
            .applyInPandas(_run, TOPK_SCHEMA)
        )
