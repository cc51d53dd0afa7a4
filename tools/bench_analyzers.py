"""Analyzer-chain throughput microbench -> BENCH/analyzer_bench_{tag}.json.

Measures tokens/sec of the batched flat path for every built-in and
round-5 chain over a synthetic 20k-doc / 120-token batch (the Arrow-batch
shape of the build hot path), plus the per-doc fallback for comparison.
Pure Python/numpy — no Spark session — so the numbers isolate the
tokenizer kernels themselves.

Usage: python tools/bench_analyzers.py [tag]
"""

from __future__ import annotations

import json
import random
import string
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lucene_solr_intervals_spark.analysis.synonyms import SynonymMap  # noqa: E402
from lucene_solr_intervals_spark.analysis.tokenizer import (  # noqa: E402
    ANALYZERS,
    _flat_fallback,
    register_common_grams_analyzer,
    register_edge_ngram_analyzer,
    register_ngram_analyzer,
    register_shingle_analyzer,
    register_synonym_analyzer,
    tokenize_flat,
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r5"
    rng = random.Random(3)
    words = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(2, 9)))
        for _ in range(500)
    ] + ["the", "of", "and", "running"]
    texts = [
        " ".join(rng.choice(words) for _ in range(120)) for _ in range(20000)
    ]
    n_tok = 20000 * 120

    syn = SynonymMap()
    syn.add(words[0], "synonymzero", True)
    syn.add(f"{words[1]} {words[2]}", "synpair", True)
    for name, reg in (
        ("bench_syn", lambda: register_synonym_analyzer("bench_syn", syn, base="code")),
        ("bench_shingle", lambda: register_shingle_analyzer("bench_shingle", base="code")),
        ("bench_cgrams", lambda: register_common_grams_analyzer(
            "bench_cgrams", {"the", "of", "and"}, base="code")),
        ("bench_edge", lambda: register_edge_ngram_analyzer(
            "bench_edge", base="code", min_gram=1, max_gram=3)),
        ("bench_ngram2", lambda: register_ngram_analyzer("bench_ngram2", 2, 2)),
    ):
        if name not in ANALYZERS:
            reg()

    # round-8 term-map chains (analysis/termmap.py): bench on a
    # delimiter/morphology-rich corpus so the filters do real work
    import lucene_solr_intervals_spark.analysis.worddelimiter  # noqa: F401
    from lucene_solr_intervals_spark.analysis.compound import (
        register_compound_analyzer,
    )
    from lucene_solr_intervals_spark.analysis.hunspell import (
        HunspellDictionary,
        register_hunspell_analyzer,
    )
    from lucene_solr_intervals_spark.analysis.phonetic import (
        register_phonetic_analyzer,
    )

    if "bench_phonetic" not in ANALYZERS:
        register_phonetic_analyzer("bench_phonetic", "double_metaphone", inject=True)
        register_compound_analyzer(
            "bench_compound", words[:200] + ["soft", "ball", "team"], min_sub=3
        )
        register_hunspell_analyzer(
            "bench_hunspell",
            HunspellDictionary(
                "SET UTF-8\nSFX A Y 2\nSFX A 0 s . \nSFX A y ies y\n"
                "PFX B Y 1\nPFX B 0 re . \n",
                "4\n" + "\n".join(f"{w}/AB" for w in words[:300]) + "\n",
            ),
        )
    wdf_words = words + [
        f"{a}-{b}" for a, b in zip(words[:150], words[150:300])
    ] + [w.capitalize() + "Case42" for w in words[:100]] + ["O'Neil's", "j2se"]
    texts_rich = [
        " ".join(rng.choice(wdf_words) for _ in range(120)) for _ in range(20000)
    ]
    import lucene_solr_intervals_spark.analysis.cjk  # noqa: F401 (registers "cjk")

    term_map_chains = [
        "word_delimiter", "word_delimiter_cat", "bench_phonetic",
        "bench_compound", "bench_hunspell", "cjk",
    ]

    chains = [
        "code", "code_stop", "simple", "stop", "fr", "de", "ws", "en_stem",
        "en_stem_keep", "keyword", "fr_fold",
        "bench_syn", "bench_shingle", "bench_cgrams", "bench_edge",
        "bench_ngram2",
    ] + term_map_chains
    out = {"batch_docs": 20000, "tokens_per_doc": 120, "chains": {}}
    tokenize_flat(texts[:200], "code")  # warm imports
    for name in chains:
        corpus = texts_rich if name in term_map_chains else texts
        best = cold = None
        for i in range(3):
            t0 = time.time()
            flat = tokenize_flat(corpus, name)
            dt = time.time() - t0
            if i == 0:
                cold = dt
            best = dt if best is None or dt < best else best
        emitted = int(flat["terms"].size)
        rec = {
            "wall_sec_best": round(best, 3),
            "input_tokens_per_sec": int(n_tok / best),
            "emitted_tokens": emitted,
        }
        if name in term_map_chains:
            rec["corpus"] = "delimiter-rich"
            # first pass probes every unique term; later passes hit the
            # cross-batch emission cache (reused-worker steady state)
            rec["wall_sec_cold"] = round(cold, 3)
            rec["warm_tokens_per_sec"] = int(n_tok / best)
        # fallback comparison where a scalar twin exists
        if name in ANALYZERS:
            t0 = time.time()
            _flat_fallback(corpus[:2000], ANALYZERS[name], False)
            fb = (time.time() - t0) * 10  # scaled to the full batch
            rec["per_doc_fallback_sec_est"] = round(fb, 3)
            rec["speedup_vs_fallback"] = round(fb / best, 1)
        out["chains"][name] = rec
        print(name, rec)
    dest = Path(__file__).resolve().parent.parent / "BENCH" / f"analyzer_bench_{tag}.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    print("wrote", dest)


if __name__ == "__main__":
    main()
