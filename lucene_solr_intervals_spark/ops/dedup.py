"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the whole point of these ops):
  * exact        — one groupBy on a 128-bit content hash; never materializes
                   pairs.  At 10^12 rows this is THE first pass.
  * ngram-jaccard— candidate pairs only via shared low-df shingles (df cap
                   kills the stop-shingle quadratic blowup — same skew
                   mitigation as CommonTermsQuery, CommonTermsQuery.java:64),
                   then exact Jaccard computed BY JOINING SHINGLES TO THE
                   CANDIDATES (never a second all-pairs shingle self-join).
  * minhash-lsh  — k hash functions via the low 48 bits of md5(shingle#seed)
                   (JVM-side md5+conv, no UDF — and bit-for-bit replicable in
                   ANSI SQL, so the DuckDB oracle checks the FULL pipeline),
                   banded into b bands x r rows; candidate pairs = docs
                   sharing a band signature; verified by exact Jaccard.
                   Linear shuffle volume in corpus size, no cross join.
  * simhash      — 48-bit hyperplane sketch from md5 token hashes; near-dup =
                   small Hamming distance within blocking buckets.

Hash-family note: md5-derived integers are ~3x slower than xxhash64 per call
but stay JVM-side and whole-stage-codegen'd; the win is end-to-end
verifiability (CORRECTNESS hash-match instead of rows-only).  Swap
`hash48 = F.xxhash64(col, seed)` back in if raw throughput ever dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


def hash48(col: Column, seed: int) -> Column:
    """48-bit integer hash: first 12 hex chars of md5(value || '#' || seed).

    Chosen over xxhash64 because DuckDB computes the identical value
    (CAST('0x'||substr(md5(s||'#'||i),1,12) AS BIGINT)), making every
    MinHash/SimHash pipeline oracle-checkable end to end.  48 bits fit a
    signed 64-bit lane with no sign/overflow edge cases in either engine.
    """
    return F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{seed}"))), 1, 12), 16, 10
    ).cast("long")


def hash48_sql(expr: str, seed: int) -> str:
    """The DuckDB-side twin of :func:`hash48` (same bits)."""
    return f"CAST(('0x' || substr(md5({expr} || '#{seed}'), 1, 12)) AS BIGINT)"


FP_MOD = 1 << 56  # rolling-fingerprint modulus: acc*31 stays < 2^63


def span_fp_sql(L: int, seed: int = 0) -> str:
    """DuckDB twin of the fingerprint="tokenhash" rolling polynomial over a
    `tok(doc_id, term, pos)` CTE: same hash48 token hashes, same fold order,
    same 2^56 modulus (all values nonnegative, so `%` == pmod).  Expects a
    WINDOW named w AS (PARTITION BY doc_id ORDER BY pos)."""
    acc = hash48_sql("term", seed)
    for j in range(1, L):
        acc = f"((({acc}) * 31) % {FP_MOD} + lead({hash48_sql('term', seed)}, {j}) OVER w) % {FP_MOD}"
    return acc


def hash_fn(col: Column, seed: int, family: str = "md5") -> Column:
    """Seeded integer hash for sketching.  family="md5" is the oracle mode
    (hash48 — DuckDB-replicable, CORRECTNESS hash-match); family="xxhash64"
    is the throughput mode (~3x faster per call, single JVM intrinsic, no
    md5+hex+conv chain) for production-scale runs where a rows-only check
    suffices."""
    if family == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    return hash48(col, seed)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: (canonical_doc_id, n_dups)."""
    h = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.md5(text_col).alias("h"))
    return (
        h.groupBy("h")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .select("canonical_doc_id", "n_docs")
    )


def shingles_df(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingle): distinct n-gram token shingles per doc (lead-window
    construction so the DuckDB oracle can replicate it verbatim).

    Shape note (r10, measured): an array-slice rewrite (transform+slice+
    concat_ws, no doc_id window) produces identical values without the
    window shuffle, but higher-order functions evaluate interpreted (no
    whole-stage codegen) and benched SLOWER end to end (noop-isolated
    0.76-1.27 s window vs 1.20-1.42 s slice at sf0.1, BENCH/ab_r10.py),
    so the window form stays."""
    toks = tokens_col(F.col(text_col))
    exploded = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, n)]
    sh = exploded.select("doc_id", F.concat_ws(" ", *cols).alias("shingle"), *[
        F.lead("term", n - 1).over(w).alias("_last")
    ])
    return sh.where(F.col("_last").isNotNull()).select("doc_id", "shingle").distinct()


def _exact_jaccard(
    sh: DataFrame, cands: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle Jaccard for candidate pairs: join the (small) candidate
    set TO the shingle table — one row per (pair, common shingle) — never an
    unconstrained shingle-shingle self-join.  A stop-grade shingle with df=d
    costs d rows here, not d^2.

    Shape note (r10, measured): a one-join formulation (union pair
    membership, count per (pair, shingle), inter = #(count==2), union =
    #distinct) is value-identical with 3 fewer joins but benched 2.3x
    SLOWER noop-isolated (1.6 s vs 0.65 s at sf0.1, BENCH/ab_r10 notes) —
    the string-keyed two-level aggregate costs more than these joins,
    which AQE runs as broadcasts.  The join form stays."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("sa")
        .join(cands, F.col("sa.doc_id") == F.col("doc_a"), "inner")
        .join(
            sh.alias("sb"),
            (F.col("sb.doc_id") == F.col("doc_b")) & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"), 4
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs (a < b) with shingle-set Jaccard >= threshold.

    Pairs are generated ONLY through shingles with df <= max_shingle_df;
    ubiquitous shingles cannot create candidates (skew guard).  A pair whose
    every common shingle is frequent is unreachable — acceptable recall
    trade documented here; raise max_shingle_df to widen.  The exact-Jaccard
    verification joins candidates->shingles (linear in df), so the df cap is
    never bypassed anywhere in the plan.
    """
    sh = shingles_df(docs, n, id_col, text_col).persist()
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    filtered = sh.join(rare, "shingle", "left_semi")
    a = filtered.alias("a")
    b = filtered.alias("b")
    cands = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _exact_jaccard(sh, cands, threshold)


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures over n-gram shingles.

    Default hash family: hash48(shingle, seed=i) — JVM-side md5+conv, no
    UDF, and bit-identical in DuckDB so the oracle replays the whole
    pipeline.  hash_family="xxhash64" is the fast path (same plan shape).
    Pass `shingles` to reuse an already-persisted shingle scan.
    """
    sh = shingles if shingles is not None else shingles_df(docs, n, id_col, text_col)
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(hash_fn(F.col("shingle"), i, hash_family)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_family: str = "md5",
) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    bands x rows = num_hashes; docs sharing any band signature become
    candidates (one shuffle on the band key — no cross join), then exact
    shingle Jaccard filters to >= threshold.  The shingle scan is computed
    ONCE and persisted — signatures and verification share it.
    hash_family="xxhash64" swaps the LSH hash for the fast JVM intrinsic
    (verification is exact Jaccard either way, so output differs only if a
    banding near-miss differs)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sh = shingles_df(docs, n, id_col, text_col).persist()
    sig = minhash_signatures(
        docs, num_hashes, n, id_col, text_col, shingles=sh, hash_family=hash_family
    )
    # band key: the r signature values concatenated — no second hash needed
    # (and trivially replicable in SQL)
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",", *[F.col("sig")[bi * rows + r].cast("string") for r in range(rows)]
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _exact_jaccard(sh, cands, threshold)


SIMHASH_BITS = 48


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """48-bit SimHash from hash48(token): sign-sum of bit columns.

    Implemented with JVM bit ops over the exploded token stream (weight =
    term frequency); no Python UDF.  48 bits (vs the classic 64) so every
    intermediate fits a signed BIGINT in both Spark and the DuckDB oracle.
    """
    toks = tokens_col(F.col(text_col))
    t = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.explode(toks).alias("term"))
    h = t.select("doc_id", hash48(F.col("term"), 0).alias("h"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sig = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * F.lit(2 ** i).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for i in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs (a < b) with SimHash Hamming distance <= max_hamming.

    Pigeonhole blocking: split the 48-bit signature into `bands` contiguous
    chunks — any pair within Hamming distance < bands shares at least one
    identical chunk, so candidates = docs sharing a chunk value (one shuffle
    on (band, chunk), no cross join), then exact popcount(xor) verifies.
    Requires max_hamming < bands for exact recall (the classic Manku et al.
    near-duplicate blocking).  All JVM bit ops; DuckDB replays it verbatim.
    """
    assert max_hamming < bands, "pigeonhole blocking needs max_hamming < bands"
    assert SIMHASH_BITS % bands == 0
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    sig = simhash(docs, id_col, text_col)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.band", "c.chunk")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )


def duplicate_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the dedup
    CLUSTERING step (group transitive duplicates, keep one representative
    per component).

    Label propagation: comp(v) <- min(comp(v), min comp over neighbors),
    iterated to fixpoint.  Each round is ONE shuffle (groupBy v); rounds
    needed = graph diameter, which for near-dup graphs is tiny (dup
    clusters are near-cliques).  This is deliberately an ITERATIVE driver
    loop with a 1-row convergence probe per round — the GraphX/Pregel
    shape — not a per-row driver loop; at 100 TB the per-round shuffle is
    |V|+|E| sized and the loop count stays O(diameter).

    Returns (doc_id, component) for every vertex that appears in a pair,
    component = min doc_id reachable."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("comp", F.col("v"))
        .persist()
    )
    converged = False
    for _ in range(max_iter):
        msgs = edges.join(
            labels.withColumnRenamed("v", "dst"), "dst"
        ).select(F.col("src").alias("v"), "comp")
        new = (
            labels.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("comp").alias("comp"))
            .persist()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # no silent caps: partial labels would split one transitive
        # duplicate group into several with no warning
        labels.unpersist()
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter) — raise max_iter"
        )
    # NB: the returned frame stays persisted (its lineage is max_iter joins
    # deep — recomputing on every downstream action would redo the whole
    # fixpoint); call .unpersist() when done.
    return labels.select(
        F.col("v").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("component"),
    ).orderBy("doc_id")


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
) -> DataFrame:
    """Training-set decontamination: drop every training document sharing
    ANY word n-gram with the evaluation set (the GPT-3-style 13-gram rule;
    n is configurable — benchmark suites commonly use 8-13).

    Plan shape at 100 TB: eval shingles are a SMALL relation (benchmarks
    are thousands of docs) — broadcast them and LEFT ANTI join the training
    shingles: one scan of train, no train-side self-shuffle.  Returns the
    SURVIVING training rows (all columns)."""
    ev = shingles_df(
        eval_df,
        id_col=eval_id_col or id_col,
        text_col=eval_text_col or text_col,
        n=n,
    ).select("shingle").distinct()
    tr_sh = shingles_df(train, id_col=id_col, text_col=text_col, n=n)
    # shingles_df always aliases the id column to "doc_id" — rename it back
    # so the anti-join key matches the caller's id_col whatever it is named.
    contaminated = (
        tr_sh.join(F.broadcast(ev), "shingle")
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


# ------------------------------------------------------ exact-substring dedup


def duplicate_span_marks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    L: int = 8,
    min_doc_freq: int = 2,
    seed: int = 0,
    reuse: str = "persist",
    hash_family: str = "md5",
    fingerprint: str = "gram",
) -> DataFrame:
    """(doc_id, pos): start positions of every L-token window whose
    fingerprint occurs in >= `min_doc_freq` DISTINCT documents — the
    duplicate-span candidates of exact-substring deduplication
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499 §4.1).

    reuse="persist" (default) caches the narrow (doc_id, pos, h) gram
    relation: it feeds BOTH the fingerprint aggregate and the semi-join
    left side, and without the cache Spark recomputes the whole
    tokenize+explode+md5 chain twice (measured 1.5x end-to-end at 50k
    docs).  ~24 bytes/gram cached vs re-running the string-churn phase;
    at 100 TB prefer reuse="persist" with StorageLevel DISK spill (the
    default MEMORY_AND_DISK does) or "recompute" when executor memory is
    the scarcer resource.

    The paper builds one monolithic suffix array; that is a single-machine
    design.  Re-expressed for Spark: every L-token window is fingerprinted
    JVM-side (transform+slice over the token array — NO per-doc window
    shuffle to build the grams) and duplicated windows fall out of ONE
    groupBy on the fingerprint followed by a semi-join back — two linear
    shuffles total, no all-pairs, no driver materialization.  A span
    duplicated across k docs costs k rows, not k^2.

    At 100 TB the fingerprint groupBy is the skew point (boilerplate spans
    are hot keys); AQE skew-join handles the semi-join side, and the
    aggregate is a partial-agg count-distinct on a 48-bit key.  hash48 is
    used (not xxhash64) so the DuckDB oracle computes the IDENTICAL
    fingerprints — any hash collision affects both sides equally and the
    value check stays exact; swap hash_fn(..., family="xxhash64") for
    production throughput.
    """
    if fingerprint == "tokenhash":
        # string-free rolling fingerprint: hash each TOKEN once, then the
        # window fingerprint is an L-term polynomial over the token hashes
        # (Rabin-Karp family) mod 2^56 — never materializes the 8x-token
        # gram strings whose construction is the measured allocation wall
        # (28.1 -> 19.5 s fingerprint phase at 50k docs).  The polynomial
        # folds L-1 lead() terms inside ONE doc_id window (the islands
        # window downstream shares that partitioning).  2^56 keeps
        # acc*31 < 2^63 overflow-free in BOTH engines while false-dup
        # collisions stay ~n_grams^2/2^57 (verified mark-identical to the
        # gram-string family on the 50k zipf corpus and pinned by test);
        # DuckDB replicates it exactly (span_fp_sql), so this fast
        # path is oracle-checkable too.
        tok = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
        ).select("doc_id", "pos", hash_fn(F.col("term"), seed, hash_family).alias("th"))
        w = Window.partitionBy("doc_id").orderBy("pos")
        acc = F.col("th")
        for j in range(1, L):
            acc = F.pmod(
                F.pmod(acc * 31, F.lit(FP_MOD)) + F.lead("th", j).over(w),
                F.lit(FP_MOD),
            )
        g = tok.select("doc_id", "pos", acc.alias("h")).where(F.col("h").isNotNull())
    else:
        toks = tokens_col(F.col(text_col))
        t = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            toks.alias("toks"),
            F.size(toks).alias("n_tokens"),
        )
        grams = F.transform(
            F.sequence(F.lit(0), F.col("n_tokens") - L),
            lambda i: F.concat_ws(" ", F.slice("toks", i + 1, L)),
        )
        g = (
            t.where(F.col("n_tokens") >= L)
            .select("doc_id", F.posexplode(grams).alias("pos", "gram"))
            .select(
                "doc_id", "pos", hash_fn(F.col("gram"), seed, hash_family).alias("h")
            )
        )
    if reuse == "persist":
        g = g.persist()
    dup = (
        g.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= min_doc_freq)
        .select("h")
    )
    return g.join(dup, "h", "left_semi").select("doc_id", "pos")


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    L: int = 8,
    min_doc_freq: int = 2,
    hash_family: str = "md5",
    fingerprint: str = "gram",
) -> DataFrame:
    """Per-document duplicate-span coverage: (doc_id, n_tokens, dup_spans,
    dup_tokens, dup_ratio).  dup_tokens = token positions covered by the
    UNION of duplicated L-windows (overlapping windows merged via
    gaps-and-islands — lag + running sum inside one doc_id window, one
    shuffle)."""
    marks = duplicate_span_marks(docs, id_col, text_col, L, min_doc_freq,
                                 hash_family=hash_family, fingerprint=fingerprint)
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    isl = marks.withColumn(
        "brk", F.when(prev.isNull() | (F.col("pos") - prev >= L), 1).otherwise(0)
    ).withColumn("island", F.sum("brk").over(w))
    cov = (
        isl.groupBy("doc_id", "island")
        .agg((F.max("pos") + L - F.min("pos")).alias("span_len"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_spans"),
            F.sum("span_len").cast("long").alias("dup_tokens"),
        )
    )
    toks = tokens_col(F.col(text_col))
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.size(toks).cast("long").alias("n_tokens")
    )
    return (
        base.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                4,
            ).alias("dup_ratio"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    L: int = 8,
    min_doc_freq: int = 2,
    hash_family: str = "md5",
    fingerprint: str = "gram",
) -> DataFrame:
    """The removal half of exact-substring dedup: drop every token position
    covered by a duplicated L-window and re-assemble the surviving text.
    Returns (doc_id, n_tokens, kept_tokens, clean_md5) — clean_md5 is the
    md5 of the space-joined kept tokens so the full reconstruction is
    value-checked, not just the counts.

    Positions covered = marks exploded to [pos, pos+L) then distinct — one
    linear explode (x L), never a range join; removal is a left-anti join
    on (doc_id, pos).

    fingerprint="tokenhash" routes the marks pass through the string-free
    rolling-polynomial family (duplicate_span_marks docstring) — the
    production-throughput mode for the REMOVAL half too; "gram" (default)
    stays the gram-string family the substring_dedup_clean oracle replays."""
    marks = duplicate_span_marks(docs, id_col, text_col, L, min_doc_freq,
                                 hash_family=hash_family,
                                 fingerprint=fingerprint)
    covered = marks.select(
        "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (L - 1))).alias("pos")
    ).distinct()
    toks = tokens_col(F.col(text_col))
    exploded = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.posexplode(toks).alias("pos", "term")
    )
    kept = exploded.join(covered, ["doc_id", "pos"], "left_anti")
    res = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("kept_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "term"))),
                    lambda s: s["term"],
                ),
            )
        ).alias("clean_md5"),
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    return base.join(res, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
    )
