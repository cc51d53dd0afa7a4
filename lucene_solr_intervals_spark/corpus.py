"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Shape per BASELINE.json input_hint: (repo, path, commit, lang, content) —
the Iceberg-table stand-in.  Generation is seeded per doc_id (seed 42 ^ id)
so any partitioning/parallelism yields byte-identical rows; content sha256
is the per-row invariant checked by verify_index.

Zipf-distributed identifier vocabulary (~5k terms) creates stop-word-grade
skew on purpose (exercises the salted/capped paths); probe n-grams are
planted at known positions in id % PROBE_EVERY == 0 docs for query parity
tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 5000
PROBE_EVERY = 97
PROBE_PHRASE = ["interval_probe_alpha", "interval_probe_beta", "interval_probe_gamma"]
EXTS = {"py": "python", "java": "java", "scala": "scala", "md": "markdown"}
_EXT_LIST = list(EXTS)

_PREFIXES = ["get", "set", "build", "merge", "scan", "read", "write", "parse", "emit", "fold"]
_STEMS = ["index", "posting", "segment", "term", "doc", "score", "norm", "block", "field", "query"]
_SUFFIXES = ["", "_impl", "_v2", "_buf", "_iter", "_ctx", "_fn", "_tmp", "_ptr", "_arr"]


def _vocab() -> list[str]:
    out = []
    i = 0
    while len(out) < VOCAB_SIZE:
        p = _PREFIXES[i % len(_PREFIXES)]
        s = _STEMS[(i // len(_PREFIXES)) % len(_STEMS)]
        x = _SUFFIXES[(i // (len(_PREFIXES) * len(_STEMS))) % len(_SUFFIXES)]
        n = i // (len(_PREFIXES) * len(_STEMS) * len(_SUFFIXES))
        out.append(f"{p}_{s}{x}{n if n else ''}")
        i += 1
    return out


VOCAB = _vocab()
_PUNCT = ["(", ")", "{", "}", ";", "=", "->", ".", ",", ":"]


N_ORGS = 20


def make_row(doc_id: int, distribution: str = "uniform") -> tuple[str, str, str, str, str]:
    """One deterministic corpus row (pure function of doc_id).

    distribution="zipf" switches to the skewed mode (see _make_row_zipf):
    zipfian df AND per-doc tf with org-correlated burstiness — the shape of
    every real corpus, and the one the block-max pruning path exists for."""
    if distribution == "zipf":
        return _make_row_zipf(doc_id)
    rng = np.random.default_rng(42 ^ (doc_id * 2654435761 % (1 << 63)))
    repo = f"org{doc_id % 20:02d}/repo{(doc_id // 20) % 50:03d}"
    ext = _EXT_LIST[doc_id % 4]
    path = f"src/pkg{doc_id % 7}/mod{doc_id % 13}/file{doc_id}.{ext}"
    commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
    n_tokens = int(rng.integers(50, 500))
    # Zipf over the vocabulary: heavy head terms appear in ~every doc
    zipf_idx = np.minimum(rng.zipf(1.3, size=n_tokens) - 1, VOCAB_SIZE - 1)
    words = [VOCAB[i] for i in zipf_idx]
    parts = []
    for j, w in enumerate(words):
        parts.append(w)
        if j % 7 == 3:
            parts.append(_PUNCT[int(rng.integers(0, len(_PUNCT)))])
    if doc_id % PROBE_EVERY == 0:
        # plant the probe phrase at token offset 10 (known position)
        parts[10:10] = PROBE_PHRASE
    content = " ".join(parts)
    return repo, path, commit, EXTS[ext], content


N_TOPICS = 20
TOPIC_RUN = 1024  # docs per contiguous topic run (= 8 postings blocks)


def _make_row_zipf(doc_id: int) -> tuple[str, str, str, str, str]:
    """Skewed corpus row: zipfian document frequencies AND zipfian
    within-doc tf, with *topical locality* — each term "belongs" to one
    topic (term_idx % N_TOPICS) and bursts only inside that topic's runs.

    Why this shape: the index keeps the caller's doc ids (id_col), so
    postings blocks are 128-doc ranges of RAW doc-id order.  Topics rotate
    in contiguous TOPIC_RUN-doc stripes of that order — the crawl-order
    clustering every real corpus has — so a term's high-tf postings
    concentrate into 1/N_TOPICS of the blocks while every other block holds
    only tf<=6 background occurrences.  That is exactly the skew the
    reference's skip lists (Lucene41SkipWriter.java:69) and this engine's
    block-max sidecars exist to exploit: on the uniform corpus every
    block's bound ties the k-th score and pruning cannot win by
    construction; on this one it must.

    Deterministic per doc_id like the uniform mode (same seed discipline),
    so any partitioning yields byte-identical rows."""
    rng = np.random.default_rng(42 ^ (doc_id * 2654435761 % (1 << 63)))
    repo = f"org{doc_id % N_ORGS:02d}/repo{(doc_id // N_ORGS) % 50:03d}"
    ext = _EXT_LIST[doc_id % 4]
    path = f"src/pkg{doc_id % 7}/mod{doc_id % 13}/file{doc_id}.{ext}"
    commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
    topic = (doc_id // TOPIC_RUN) % N_TOPICS
    # heavy-tailed distinct-term count (doc length / norm skew)
    n_distinct = 30 + min(int(rng.pareto(1.5) * 40.0), 400)
    # zipfian df: which terms appear follows a zipf over the vocabulary
    idx = np.minimum(rng.zipf(1.2, size=n_distinct) - 1, VOCAB_SIZE - 1)
    idx = np.unique(idx)
    # background tf: mostly 1, occasionally 2-6
    tf = np.minimum(rng.zipf(2.5, size=idx.size), 6)
    # burst: terms whose home topic is this doc's topic go heavy-tailed
    home = (idx % N_TOPICS) == topic
    if home.any():
        tf[home] = np.minimum(rng.zipf(1.3, size=int(home.sum())), 120)
    tokens = np.repeat(idx, tf)
    rng.shuffle(tokens)
    parts = [VOCAB[i] for i in tokens]
    if doc_id % PROBE_EVERY == 0:
        parts[10:10] = PROBE_PHRASE
    return repo, path, commit, EXTS[ext], " ".join(parts)


CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def generate_corpus(
    spark: SparkSession,
    n_docs: int,
    partitions: int | None = None,
    distribution: str = "uniform",
) -> DataFrame:
    """Distributed deterministic corpus: spark.range + Arrow-batched generator.

    Rows depend only on doc_id, so the result is identical at any
    parallelism level — the N vs 4N scaling runs see the same input.
    distribution="zipf" -> skewed df/tf with topical locality (see
    _make_row_zipf); "uniform" -> the flat F1 fixture shape.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism * 2

    def _gen(batches):
        for pdf in batches:
            rows = [make_row(int(i), distribution) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"].astype("int64"),
                    "repo": [r[0] for r in rows],
                    "path": [r[1] for r in rows],
                    "commit": [r[2] for r in rows],
                    "lang": [r[3] for r in rows],
                    "content": [r[4] for r in rows],
                }
            )

    return spark.range(0, n_docs, numPartitions=partitions).mapInPandas(_gen, CORPUS_SCHEMA)
