#!/usr/bin/env python
"""Headline benchmark: index-build throughput + BM25 top-10 query latency.

Phases (the north-rule pipeline end to end):
  build_documents   exploded inverted index over $SF_DIR/documents.parquet
  build_segments    packed-segment build (tokenize -> invert -> varbyte pack
                    -> manifest) over the deterministic F1 source-code corpus
  verify            CheckIndex invariants + per-row content sha256 parity
  query battery     WAND top-10 (single/OR/AND), exploded-path BM25,
                    positional (phrase / ordered near), dedup + ANN ops

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32) -> master local[N], shuffle=2N
  BENCH_CORPUS_DOCS    (default 20000) F1 corpus size
  BENCH_CODEC          (default for128) postings codec for the packed build
  BENCH_NO_CONTROL=1   skip the pinned-clone control run
  BENCH_OUT            optional path to also write the JSON

Same-window control: this shared box sees ~10x background load waves, so a
round-over-round comparison of two absolute battery numbers taken hours
apart is meaningless (round 5's official artifact inflated 38% while a
same-day controlled A/B was flat).  Unless BENCH_NO_CONTROL=1, the battery
first runs a PINNED round-5 clone (git archive of CONTROL_COMMIT) as a
subprocess in the same window, brackets both runs with a fixed numpy
cpu-probe, and reports control totals + the current/control ratio — the
ratio, not the absolute seconds, is the load-invariant headline.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import pandas as pd

# the tree the round-8 driver bench measured (r8 final commit) — re-pinned
# each round so the in-window ratio always answers "did THIS round regress"
CONTROL_COMMIT = "fa66e1a"


def _cpu_probe() -> float:
    """Fixed-size numpy workload (seconds) — a load-level gauge for the slot
    it runs in; identical work every call."""
    import numpy as np

    a = np.random.default_rng(0).random((1024, 1024))
    t0 = time.time()
    for _ in range(6):
        a = a @ a
        a /= np.abs(a).max()
    return round(time.time() - t0, 3)


def _run_battery_subprocess(cwd: str) -> dict | None:
    """Run a bench.py battery as a subprocess (its own Spark JVM) and
    return its JSON dict, or an {'err': ...} dict — never raises."""
    try:
        env = dict(os.environ)
        env["BENCH_NO_CONTROL"] = "1"
        env["BENCH_NO_ZIPF"] = "1"  # the zipf pair runs once, in the main pass
        env.pop("BENCH_OUT", None)
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=cwd, env=env,
            capture_output=True, text=True, timeout=900,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        return {"err": (out.stderr or "no JSON line")[-500:]}
    except Exception as e:  # auxiliary runs must never fail the bench
        return {"err": repr(e)[:500]}


def _run_control(repo: str) -> dict | None:
    """Materialize the pinned control tree and run its full battery as a
    subprocess (before this process starts its own Spark JVM, so the two
    runs never contend).  Returns the control's JSON dict or None."""
    ctl_dir = f"/tmp/lsi_control_{CONTROL_COMMIT}"
    try:
        if not os.path.exists(os.path.join(ctl_dir, "bench.py")):
            os.makedirs(ctl_dir, exist_ok=True)
            ar = subprocess.run(
                ["git", "-C", repo, "archive", CONTROL_COMMIT],
                capture_output=True, check=True,
            )
            subprocess.run(
                ["tar", "-x", "-C", ctl_dir], input=ar.stdout, check=True
            )
    except Exception as e:
        return {"err": repr(e)[:500]}
    return _run_battery_subprocess(ctl_dir)


def _zipf_pruning_pair(spark) -> dict:
    """Pruned-vs-exhaustive search_many on the 1M-doc zipf corpus with a
    rank-identity assert — the skew where block-max skip data earns its
    keep.  Measured under the SAME protocol as BENCH/pruning_ab_r7.json:
    interleaved local[8] SUBPROCESSES per mode (an in-session local[32]
    measurement oversubscribes the ~8 effective cores and inverts the
    comparison — r8 measured 0.88 in-session vs 1.17 under the dedicated
    protocol on the same index).  The index is deterministic and cached
    per box; runs AFTER the battery total is taken, so neither the
    one-off build nor the pair pollutes the round-over-round total."""
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import build_segments

    docs = int(os.environ.get("BENCH_ZIPF_DOCS", "1000000"))
    segs, codec = 64, "for128"
    idx = f"/tmp/lsi_bench_zipf_{docs}_{segs}_{codec}"
    out: dict = {"docs": docs, "segments": segs, "codec": codec}
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        corpus = generate_corpus(spark, docs, distribution="zipf")
        t0 = time.time()
        build_segments(
            corpus, idx, n_segments=segs, id_col="doc_id",
            text_col="content", analyzer="code", n_docs_hint=docs,
            codec=codec,
        )
        out["build_sec"] = round(time.time() - t0, 3)
    repo = os.path.dirname(os.path.abspath(__file__))
    run = subprocess.run(
        [sys.executable, os.path.join(repo, "BENCH", "run_pruning_ab.py"),
         "--skip-build", "--index-dir", idx, "--docs", str(docs),
         "--segments", str(segs), "--batch", "2000", "--repeats", "2",
         "--inner", "2", "--tag", "bench_last"],
        capture_output=True, text=True, timeout=900, cwd=repo,
    )
    for line in reversed(run.stdout.strip().splitlines()):
        if line.startswith("{"):
            r = json.loads(line)
            out.update({
                "protocol": "interleaved local[8] subprocesses, best-of-2x2",
                "rank_identity": r["rank_identity"],
                "qps_exhaustive": r["qps_exhaustive_best"],
                "qps_pruned": r["qps_pruned_best"],
                "pruned_speedup": r["pruned_speedup"],
            })
            return out
    out["err"] = (run.stderr or "no JSON line")[-300:]
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_corpus = int(os.environ.get("BENCH_CORPUS_DOCS", "20000"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.index.segment import build_segments, verify_index
    from lucene_solr_intervals_spark.ops.dedup import minhash_lsh_pairs
    from lucene_solr_intervals_spark.ops.similarity import cosine_topk
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher, search_segments
    from lucene_solr_intervals_spark.session import get_spark

    codec = os.environ.get("BENCH_CODEC", "for128")
    control = None
    current_alt = None
    probe_control = probe_current = None
    if (
        os.environ.get("BENCH_NO_CONTROL", "") != "1"
        and os.environ.get("BENCH_FAST", "") != "1"
    ):
        repo = os.path.dirname(os.path.abspath(__file__))
        probe_control = _cpu_probe()
        # both trees run best-of-two in interleaved slots (C,X,C,X) so the
        # headline ratio compares like with like — a single-sample control
        # vs best-of-two current would bias the ratio in current's favor,
        # and interleaving decorrelates the load waves from the tree
        control = _run_control(repo)
        current_alt = _run_battery_subprocess(repo)
        control2 = _run_control(repo)
        probe_current = _cpu_probe()
        def _ok(c):
            return isinstance(c, dict) and isinstance(
                c.get("value"), (int, float)
            )

        if _ok(control) and _ok(control2):
            if control2["value"] < control["value"]:
                control, control2 = control2, control
            control["slower_control_pass"] = {
                "value": control2["value"],
                "queries": control2.get("queries", {}),
            }
        elif _ok(control2):
            control = control2

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(
        app_name="lsi-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the Python worker pool (one worker per core imports numpy/pandas
    # once; spark.python.worker.reuse keeps them alive) — untimed, exactly
    # like long-lived executors on a real cluster
    from pyspark.sql import functions as _F

    @_F.pandas_udf("double")
    def _warm(x: pd.Series) -> pd.Series:
        import numpy  # noqa: F401

        return x.astype("float64")

    spark.range(0, cpus * 4, numPartitions=cpus * 4).select(_warm(_F.col("id"))).count()

    queries: dict[str, float] = {}
    extras: dict = {
        "cpus": cpus, "sf_dir": sf_dir, "corpus_docs": n_corpus, "codec": codec,
    }
    if control is not None:
        extras["control_commit"] = CONTROL_COMMIT
        extras["control"] = control
        extras["cpu_probe_control_slot_sec"] = probe_control
        extras["cpu_probe_current_slot_sec"] = probe_current

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        queries[name] = round(dt, 4)
        return out

    total0 = time.time()
    fast = os.environ.get("BENCH_FAST", "") == "1"  # scaling runs: core phases only

    # ---- phase 1: exploded index over the driver's documents table
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    extras["documents_rows"] = n_docs
    if not fast:
        idx = timed("build_documents_index", lambda: build_index(docs, analyzer="code"))
        extras["documents_build_docs_per_sec"] = round(
            n_docs / queries["build_documents_index"], 1
        )

    # ---- phase 2: packed segments over the F1 source-code corpus
    index_dir = tempfile.mkdtemp(prefix="lsi_bench_idx_")
    corpus = generate_corpus(spark, n_corpus).persist()
    corpus.count()  # materialize generation outside the build timing
    # fixed segment count so N-core and 4N-core runs execute the SAME job
    n_segments = int(os.environ.get("BENCH_SEGMENTS", "64"))
    manifest = timed(
        "build_segments",
        lambda: build_segments(
            corpus, index_dir, n_segments=n_segments, id_col="doc_id",
            text_col="content", analyzer="code", n_docs_hint=n_corpus,
            codec=codec,
        ),
    )
    extras["segments_build_files_per_sec"] = round(
        n_corpus / queries["build_segments"], 1
    )
    extras["n_segments"] = len(manifest["segments"])

    if not fast:
        ver = timed("verify_sha256", lambda: verify_index(
            spark, index_dir, corpus=corpus, text_col="content", id_col="doc_id"
        ))
        extras["verify_ok"] = bool(ver["ok"]) and ver["sha_ok"] is True

    # ---- phase 3: query battery
    s = None if fast else Searcher(idx, mode="lucene")

    head_terms = ["get_index", "set_posting", "build_segment", "merge_term", "scan_doc"]
    probe = "interval_probe_alpha"

    # warm searcher = DirectoryReader snapshot: manifest + stats loaded once
    seg_searcher = timed("open_segment_searcher", lambda: SegmentSearcher(spark, index_dir))

    def wand_many():
        for t in head_terms:
            seg_searcher.search([t], k=10, mode="wand").collect()

    timed("wand_term_top10_x5", wand_many)
    extras["wand_qps"] = round(5.0 / queries["wand_term_top10_x5"], 2)

    timed(
        "wand_or2_top10",
        lambda: seg_searcher.search(["get_index", "merge_posting"], k=10, mode="wand").collect(),
    )
    timed(
        "wand_and2_top10",
        lambda: seg_searcher.search([probe, "get_index"], k=10, conjunctive=True).collect(),
    )
    timed(
        "exhaustive_or2_top10",
        lambda: seg_searcher.search(
            ["get_index", "merge_posting"], k=10, mode="exhaustive"
        ).collect(),
    )
    # cold path (fresh manifest + stats per query) for comparison
    timed(
        "wand_cold_top10",
        lambda: search_segments(spark, index_dir, ["get_index"], k=10, mode="wand").collect(),
    )

    # concurrent throughput: many queries in flight (the search-service q/s
    # measure — amortizes per-job scheduling, scales with cores)
    from concurrent.futures import ThreadPoolExecutor

    from lucene_solr_intervals_spark.corpus import VOCAB

    conc_terms = [VOCAB[i] for i in range(0, 240, 10)]  # 24 distinct queries

    def concurrent_queries():
        with ThreadPoolExecutor(max_workers=min(cpus, 12)) as ex:
            list(
                ex.map(
                    lambda t: seg_searcher.search([t], k=10, mode="wand").collect(),
                    conc_terms,
                )
            )

    timed("wand_concurrent_x24", concurrent_queries)
    extras["wand_concurrent_qps"] = round(
        len(conc_terms) / queries["wand_concurrent_x24"], 2
    )

    # batch retrieval: 4000 queries in ONE job (the offline-retrieval /
    # scaling-honest throughput shape: per-task work grows with the batch).
    # One untimed warm-up run first: JVM codegen/JIT compilation of the
    # 5-stage plan costs a flat ~2-3s that a long-lived cluster pays once
    # per code version, not per batch — steady-state throughput is the
    # number that scales with data and cores.
    batch_terms = [VOCAB[i] for i in range(0, 4000)]
    seg_searcher.search_many(batch_terms, k=10).count()  # warm-up (untimed)
    timed(
        "wand_batch_x4000",
        lambda: seg_searcher.search_many(batch_terms, k=10).count(),
    )
    extras["wand_batch_qps"] = round(len(batch_terms) / queries["wand_batch_x4000"], 2)

    # merge phase: compact a tier of segments (sort-merge on term)
    from lucene_solr_intervals_spark.index.segment import merge_segments, read_manifest

    live = [s["seg"] for s in read_manifest(index_dir)["segments"] if s["status"] == "done"]
    tier = live[: max(2, len(live) // 4)]
    timed("merge_tier", lambda: merge_segments(spark, index_dir, tier, new_seg=max(live) + 1))
    extras["merge_docs_per_sec"] = round(
        n_corpus * (len(tier) / len(live)) / queries["merge_tier"], 1
    )

    if fast:
        total = time.time() - total0
        out = {
            "metric": "index-build files/sec + BM25 top-10 battery (fast)",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            **extras,
        }
        line = json.dumps(out)
        print(line)
        path = os.environ.get("BENCH_OUT")
        if path:
            with open(path, "w") as f:
                f.write(line + "\n")
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()
        return

    timed("df_term_top10", lambda: s.search(Q.Term("merge"), k=10).collect())
    timed(
        "df_bool_or_top10",
        lambda: s.search(Q.Boolean(should=(Q.Term("vector"), Q.Term("window"))), k=10).collect(),
    )
    timed("df_phrase_top10", lambda: s.search(Q.Phrase(("table", "hash")), k=10).collect())
    # classic SloppyPhraseScorer, vectorized no-repeats kernel (csloppy2)
    timed(
        "df_sloppy_phrase_top10",
        lambda: s.search(Q.Phrase(("table", "hash"), slop=4), k=10).collect(),
    )
    timed(
        "df_ordered_near_top10",
        lambda: s.search(Q.OrderedNear(3, (Q.Term("vector"), Q.Term("window"))), k=10).collect(),
    )
    timed(
        "df_unordered_near_top10",
        lambda: s.search(Q.UnorderedNear(2, (Q.Term("table"), Q.Term("hash"))), k=10).collect(),
    )

    # ---- phase 4: training-data ops
    # production hash family (xxhash64 intrinsic); the md5-hash48 oracle mode
    # is what the driver correctness-checks — same plan, ~3x cheaper hashing
    timed(
        "minhash_lsh",
        lambda: minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, threshold=0.4, hash_family="xxhash64"
        ).collect(),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from pyspark.sql import functions as F

    qvec = [float(v) for v in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    timed("cosine_top10", lambda: cosine_topk(emb, qvec, k=10).collect())

    total = time.time() - total0
    # best-of-two current passes: a load wave on one slot cannot be the
    # headline; the slower pass is preserved in extras for transparency
    if current_alt is not None and isinstance(
        current_alt.get("value"), (int, float)
    ):
        if current_alt["value"] < total:
            extras["slower_current_pass"] = {
                "value": round(total, 3), "queries": dict(queries),
            }
            total = current_alt["value"]
            queries = current_alt.get("queries", queries)
            for kk, vv in current_alt.items():  # derived throughputs too
                if kk.endswith("_qps") or kk.endswith("_per_sec") or kk in (
                    "verify_ok",
                ):
                    extras[kk] = vv
        else:
            extras["slower_current_pass"] = {
                "value": current_alt["value"],
                "queries": current_alt.get("queries", {}),
            }
    # zipf pruning regression guard — outside the timed total (see
    # _zipf_pruning_pair docstring); auxiliary subprocess runs skip it
    if os.environ.get("BENCH_NO_ZIPF", "") != "1":
        try:
            extras["zipf_pruning"] = _zipf_pruning_pair(spark)
        except Exception as e:  # the guard must never fail the battery
            extras["zipf_pruning"] = {"err": repr(e)[:300]}

    if control is not None and isinstance(control.get("value"), (int, float)):
        extras["vs_control_ratio"] = round(total / control["value"], 3)
        cq = control.get("queries", {})
        shared = [n for n in queries if n in cq and cq[n] > 0]
        if shared:  # per-phase geomean is robust to one outlier phase
            import math

            extras["vs_control_phase_geomean"] = round(
                math.exp(
                    sum(math.log(max(queries[n], 1e-4) / cq[n]) for n in shared)
                    / len(shared)
                ),
                3,
            )
    out = {
        "metric": "index-build files/sec + BM25 top-10 battery",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
    }
    line = json.dumps(out)
    print(line)
    path = os.environ.get("BENCH_OUT")
    if path:
        with open(path, "w") as f:
            f.write(line + "\n")
    shutil.rmtree(index_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
