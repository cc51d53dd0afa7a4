"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the whole point of these ops):
  * exact        — one groupBy on a 128-bit content hash; never materializes
                   pairs.  At 10^12 rows this is THE first pass.
  * ngram-jaccard— candidate pairs only via shared low-df shingles (df cap
                   kills the stop-shingle quadratic blowup — same skew
                   mitigation as CommonTermsQuery, CommonTermsQuery.java:64),
                   then exact Jaccard on the candidates.
  * minhash-lsh  — k hash functions via xxhash64(shingle, seed), banded into
                   b bands x r rows; candidate pairs = docs sharing a band
                   signature; verified by exact Jaccard.  Linear shuffle
                   volume in corpus size, no full cross join anywhere.
  * simhash      — 64-bit hyperplane sketch from token hashes; near-dup =
                   small Hamming distance within blocking buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


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
    construction so the DuckDB oracle can replicate it verbatim)."""
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
    trade documented here; raise max_shingle_df to widen.
    """
    sh = shingles_df(docs, n, id_col, text_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    filtered = sh.join(rare, "shingle", "left_semi")
    a = filtered.alias("a")
    b = filtered.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common_rare"))
    )
    # exact intersection over ALL shingles for the candidate pairs
    all_a = sh.alias("sa")
    all_b = sh.alias("sb")
    exact_inter = (
        all_a.join(
            all_b,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(inter.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi")
    )
    out = (
        exact_inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sz_a"), "doc_a")
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
    return out


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures over n-gram shingles.

    Hash family: xxhash64(shingle, seed=i) — JVM-side, vectorized, no UDF.
    """
    sh = shingles_df(docs, n, id_col, text_col)
    mins = sh.groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
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
) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    bands x rows = num_hashes; docs sharing any band signature become
    candidates (one shuffle on the band hash — no cross join), then exact
    shingle Jaccard filters to >= threshold.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(*[F.col("sig")[bi * rows + r] for r in range(rows)]).alias("bh"),
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
    sh = shingles_df(docs, n, id_col, text_col).persist()
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


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash from xxhash64(token): sign-sum of bit columns.

    Implemented with JVM bit ops over the exploded token stream (weight =
    term frequency); no Python UDF.
    """
    toks = tokens_col(F.col(text_col))
    t = docs.select(F.col(id_col).cast("long").alias("doc_id"), F.explode(toks).alias("term"))
    h = t.select("doc_id", F.xxhash64("term").alias("h"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * F.lit(2 ** i).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                for i in range(63)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sig
