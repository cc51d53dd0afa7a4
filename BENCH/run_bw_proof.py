#!/usr/bin/env python
"""STREAM-bandwidth proof for the batch-retrieval kernel.

The raw N-vs-4N efficiency target keeps landing at 0.70-0.77 on this
box while the pure-CPU probe itself only reaches 0.83-0.89.  This
harness settles WHY: it measures

  1. the box's aggregate memory bandwidth (STREAM-triad proxy: one
     float64 a = b*s + c pass over arrays far larger than L3) at 1 and
     8 workers, and
  2. the batch kernel's aggregate intermediate traffic (bytes actually
     read+written by decode -> cumsum -> norm-gather -> score over a
     real segment of the 1M-doc index) at 1 and 8 workers.

If the kernel's achieved GB/s at 8 workers is at or near the triad
ceiling, core scaling past that point is physically impossible on this
hardware for ANY implementation of the same data flow — the scaling
gap is the memory wall, not the engine.  Workers are separate
processes (no GIL interaction).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRIAD_N = 32 * 1024 * 1024  # 256 MB per array x3 — far past L3
TRIAD_REPS = 4


def _triad(_):
    a = np.empty(TRIAD_N, dtype=np.float64)
    b = np.random.default_rng(1).random(TRIAD_N)
    c = np.random.default_rng(2).random(TRIAD_N)
    t0 = time.time()
    for _i in range(TRIAD_REPS):
        np.multiply(b, 1.000001, out=a)
        a += c
    dt = time.time() - t0
    # traffic per rep: read b + write a + read a + read c + write a
    gb = TRIAD_REPS * TRIAD_N * 8 * 5 / 1e9
    return gb / dt


def _kernel(args):
    """The search_many small path over one segment's real postings."""
    seg_dir, reps = args
    import pandas as pd

    from lucene_solr_intervals_spark.codecs.registry import get_codec

    pdf = pd.read_parquet(seg_dir)
    pdf = pdf[~pdf["term"].str.startswith("\x00")]  # drop the docs sidecar
    codec = get_codec("for128")
    counts = pdf["df"].to_numpy(dtype=np.int64)
    offsets = np.zeros(counts.size + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    n_post = int(offsets[-1])
    norms = np.random.default_rng(3).integers(100, 140, 1_000_000).astype(np.uint8)
    cache = np.random.default_rng(4).random(256).astype(np.float32)
    w = np.random.default_rng(5).random(counts.size).astype(np.float32)
    id_bufs = pdf["doc_ids"].tolist()
    tf_bufs = pdf["tfs"].tolist()
    t0 = time.time()
    for _ in range(reps):
        dbd = cache[norms]
        ids_cat = codec.decode(b"".join(id_bufs)).view(np.int64)
        np.cumsum(ids_cat, out=ids_cat)
        seg_base = np.zeros(ids_cat.size, dtype=np.int64)
        starts = offsets[:-1][counts > 0]
        seg_base[starts[1:]] = ids_cat[starts[1:] - 1]
        np.maximum.accumulate(seg_base, out=seg_base)
        ids_cat -= seg_base
        tfs_cat = codec.decode(b"".join(tf_bufs)).astype(np.float32)
        np.subtract(ids_cat, ids_cat.min(), out=seg_base)
        denom = dbd[seg_base]
        denom += tfs_cat
        for i in range(counts.size):
            tfs_cat[offsets[i] : offsets[i + 1]] *= w[i]
        tfs_cat /= denom
    dt = time.time() - t0
    # counted traffic per rep (read+write, bytes/posting):
    #   decode ids write 8 + cumsum rw 16 + seg_base zero/write/accum/read
    #   ~32 + ids -= 16 + decode tf write 8 + astype rw 12 + subtract rw 24
    #   + gather write 4 + denom rw 12 + mul rw 8 + div rw 12  ~= 152 B
    byts = reps * n_post * 152 / 1e9
    return (n_post * reps / dt, byts / dt)


def run_pool(fn, n_workers, args):
    """Aggregate = sum of the workers' SELF-TIMED rates: the setup
    (process spawn, numpy import, input generation/load) stays outside
    every worker's timed window, and the identical work lengths keep the
    timed windows overlapping."""
    with mp.Pool(n_workers) as pool:
        res = pool.map(fn, [args] * n_workers)
    return res


def main():
    idx = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lsi_batch_scale_idx"
    seg = os.path.join(idx, "postings", "seg=0")
    out = {"triad_gbps": {}, "kernel": {}}
    for p in (1, 8):
        res = run_pool(_triad, p, 0)
        out["triad_gbps"][p] = round(sum(res), 2)
    reps = 3
    for p in (1, 8):
        res = run_pool(_kernel, p, (seg, reps))
        out["kernel"][p] = {
            "posts_per_sec": round(sum(r[0] for r in res) / 1e6, 2),
            "gbps": round(sum(r[1] for r in res), 2),
        }
    out["kernel_vs_triad_at_8"] = round(
        out["kernel"][8]["gbps"] / out["triad_gbps"][8], 3
    )
    out["triad_scaling_1_to_8"] = round(
        out["triad_gbps"][8] / out["triad_gbps"][1], 2
    )
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bw_proof_r7.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
