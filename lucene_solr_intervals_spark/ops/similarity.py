"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Brute force is the correctness baseline (and is exactly what a 100 TB scan
does per query if you let it).  The scale path is random-hyperplane LSH:
bucket vectors by sign pattern, search only matching buckets — candidate
set shrinks ~2^bits while recall stays high for near-duplicates.
All vector math is JVM-side (zip_with/aggregate) — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5
    sim = _dot(F.col(vec_col), qlit) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        embeddings.select(F.col(id_col).cast("long").alias("vec_id"), F.round(sim, 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_buckets(
    embeddings: DataFrame,
    hyperplanes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign pattern across random hyperplanes."""
    bits = []
    for i, hp in enumerate(hyperplanes):
        hlit = F.array(*[F.lit(float(v)) for v in hp])
        bits.append(
            F.when(_dot(F.col(vec_col), hlit) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        bucket.cast("int").alias("bucket"),
    )


def embedding_near_pairs(
    embeddings: DataFrame,
    hyperplanes: list[list[float]],
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (a < b, cosine >= threshold).

    LSH blocking: candidates share a sign-pattern bucket (one shuffle on the
    bucket id — no cross join; pairs split across buckets are the documented
    recall trade, shrink it with fewer planes or multiprobe); exact cosine
    verifies every candidate.  The dedup counterpart of ann_lsh_topk — the
    fifth dedup mode of the training-data suite (exact / ngram-Jaccard /
    MinHash / SimHash / embedding-cosine)."""
    bucketed = lsh_buckets(embeddings, hyperplanes, id_col, vec_col)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.embedding").alias("ea"),
        F.col("b.embedding").alias("eb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        cand.withColumn("cosine", F.round(cos, 4))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def _surrogate_long_id(id_col: str):
    """ANSI-safe long key for an arbitrary id column: numeric-looking ids
    try_cast to their own value (a plain cast THROWS under Spark 4 ANSI
    mode on 'doc-0042'); everything else gets a deterministic nonnegative
    xxhash64 spread key.  Used for k-means seeding and IVF argmax
    grouping, where the key only needs to be stable and well-spread."""
    return F.coalesce(
        F.col(id_col).try_cast("long"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(2**62)),
    )


def ivf_assignments(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its argmax-dot
    centroid (ties -> lowest centroid id).

    Shape: explode the centroid list as a broadcast relation, dot per
    (vector, centroid) pair JVM-side, then ONE map-side-combinable groupBy
    with max_by — the standard IVF assignment job; at 100 TB this is a
    linear scan + one shuffle keyed on vec_id, and the centroid table
    (n_centroids x dim floats) broadcasts even at 2^16 centroids."""
    spark = embeddings.sparkSession
    cdf = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids], ["cid", "cvec"]
    )
    pair = embeddings.select(
        _surrogate_long_id(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
    ).crossJoin(F.broadcast(cdf))
    dot = _dot(F.col("embedding"), F.col("cvec"))
    return (
        pair.withColumn("dot", dot)
        .groupBy("vec_id")
        .agg(
            F.max_by("cid", F.struct(F.col("dot"), (-F.col("cid")).alias("nc"))).alias("cid"),
            F.first("embedding").alias("embedding"),
        )
    )


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int | None = None,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Spherical k-means training for the IVF coarse quantizer (the
    assignment-iteration + mean-aggregate loop; faiss-style IVF training,
    here over the same ivf_assignments job the index uses).

    Deterministic: init = `n_centroids` id-evenly-spaced data vectors
    (spread beats first-k when ids correlate with content); each iteration
    is ONE assignment pass (broadcast centroids, map-side-combinable
    argmax) + ONE elementwise mean aggregate; only the k x dim centroid
    matrix ever reaches the driver.  Centroid means are L2-normalized
    (spherical) so argmax-dot assignment == cosine assignment regardless of
    data norms; a cluster that empties keeps its previous centroid.
    Default n_centroids ~ sqrt(n) (the standard IVF sizing)."""
    n = embeddings.count()
    if n_centroids is None:
        n_centroids = max(2, int(round(n ** 0.5)))
    n_centroids = min(n_centroids, n)
    step = max(1, n // n_centroids)
    # Seed selection with NO global window (a row_number over the whole
    # embeddings set funnels every vector through one task — the exact
    # single-partition pattern this codebase avoids).  Ids are modded
    # directly: a plain filter runs map-side, and the orderBy().limit()
    # is a TakeOrdered (per-partition top-k + driver merge of <=k rows).
    # Non-numeric ids (strings, uuids) try_cast to NULL long (ANSI-safe —
    # a plain cast THROWS under Spark 4 ANSI mode); xxhash64 gives
    # them a deterministic spread key instead so the `% step` stratified
    # pick still works (round-7 ADVICE: the bare cast dropped every row
    # for string ids and the fallback then ordered nulls first).
    base = embeddings.select(
        _surrogate_long_id(id_col).alias("vec_id"), F.col(vec_col)
    )
    init_rows = (
        base.where(F.col("vec_id") % step == 0)
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    if len(init_rows) < n_centroids:
        # sparse / non-dense id space: deterministic fallback, still
        # window-free — smallest n_centroids ids (TakeOrdered again)
        init_rows = base.orderBy("vec_id").limit(n_centroids).collect()

    def _norm(v: list[float]) -> list[float]:
        s = sum(x * x for x in v) ** 0.5
        return [x / s for x in v] if s > 0 else list(v)

    cents = [(i, _norm([float(x) for x in r[1]])) for i, r in enumerate(init_rows)]
    for _ in range(iters):
        assigned = ivf_assignments(embeddings, cents, id_col, vec_col)
        rows = (
            assigned.select("cid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = float(r["m"])
        cents = [
            (c, _norm([by_cid[c][p] for p in sorted(by_cid[c])]) if c in by_cid else v)
            for c, v in cents
        ]
    return cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    centroid_ids: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8),
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-flat ANN (the second scale path beside LSH): coarse-quantize,
    probe the query's top-`nprobe` inverted lists, exact cosine rerank
    inside them.

    Pass `centroids` from kmeans_centroids for the trained quantizer (the
    production path — planted-cluster recall beats sampling at equal
    nprobe, tests/test_ivf_ann.py); the default SAMPLED data vectors (ids
    in `centroid_ids`) stay as the deterministic oracle-replayable mode.
    Training changes nothing about the query-time plan.  Recall trade:
    neighbors quantized into unprobed lists are missed; raise nprobe (cost
    grows ~nprobe/n_centroids of the scan)."""
    if centroids is None:
        rows = (
            embeddings.where(F.col(id_col).isin(list(centroid_ids)))
            .select(F.col(id_col).cast("long"), F.col(vec_col))
            .collect()
        )
        centroids = sorted((int(r[0]), list(r[1])) for r in rows)
    assigned = ivf_assignments(embeddings, centroids, id_col, vec_col)
    # query-side probe order: dot desc, centroid id asc (same tie-break)
    qdots = sorted(
        (
            (-sum(float(a) * float(b) for a, b in zip(v, query_vec)), c)
            for c, v in centroids
        ),
    )
    probes = [c for _, c in qdots[:nprobe]]
    cand = assigned.where(F.col("cid").isin(probes))
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding")


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    hyperplanes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: int = 0,
) -> DataFrame:
    """LSH-bucketed ANN: hash query, exact-rerank only its bucket (plus
    optional 1-bit multi-probe neighbors for recall)."""
    bucketed = lsh_buckets(embeddings, hyperplanes, id_col, vec_col)
    qb = 0
    for i, hp in enumerate(hyperplanes):
        if sum(a * b for a, b in zip(query_vec, hp)) >= 0:
            qb |= 1 << i
    probes = [qb] + [qb ^ (1 << i) for i in range(min(multi_probe, len(hyperplanes)))]
    cand = bucketed.where(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding")


# ------------------------------------------------- scalar-quantized vectors


def scalar_quantize_params(
    embeddings: DataFrame, vec_col: str = "embedding", levels: int = 127
) -> tuple[float, float]:
    """(mn, scale) of a global min/max int8-range scalar quantizer — the
    role of Lucene's ScalarQuantizer (lucene 9.x int8 KNN vectors; the
    reference fork predates vectors, this is a training-pipeline op).
    q(x) = floor((x - mn) * scale + 0.5) with scale = levels/(mx - mn):
    floor(+0.5) instead of round() because BOTH engines (and numpy) give
    the identical IEEE result, making the quantizer oracle-exact.

    One aggregate scan (min of array_min, max of array_max) — two scalars
    to the driver, never the vectors."""
    row = embeddings.select(
        F.min(F.array_min(vec_col)).alias("mn"), F.max(F.array_max(vec_col)).alias("mx")
    ).head()
    mn, mx = float(row["mn"]), float(row["mx"])
    if mx == mn:  # degenerate constant space: every code becomes 0
        return mn, 0.0
    return mn, float(levels) / (mx - mn)


def quantize_col(vec_col, mn: float, scale: float):
    """array<long> of quantized codes, JVM-side."""
    return F.transform(
        vec_col, lambda x: F.floor((x.cast("double") - F.lit(mn)) * F.lit(scale) + F.lit(0.5))
    )


def quantized_cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    params: tuple[float, float] | None = None,
) -> DataFrame:
    """Top-k by INTEGER dot product over scalar-quantized vectors:
    (vec_id, qdot).  The 100 TB story: int8 codes are 4x fewer bytes than
    float32 (the dominant cost of a brute scan is bandwidth), the integer
    dot is exact and engine-independent (no float summation order issues),
    and the same codes feed IVF/LSH rerank stages.  Ties break on vec_id
    like every other top-k in the engine.

    `params=(mn, scale)` supplies a PRE-TRAINED quantizer (Lucene persists
    ScalarQuantizer params with the segment) and skips the stats scan —
    the query then reads the embeddings relation exactly once.  Derive
    them once per immutable embedding set with scalar_quantize_params."""
    mn, scale = (
        params if params is not None
        else scalar_quantize_params(embeddings, vec_col, levels)
    )
    import math

    qq = [int(math.floor((float(v) - mn) * scale + 0.5)) for v in query_vec]
    qlit = F.array(*[F.lit(v).cast("long") for v in qq])
    qdot = F.aggregate(
        F.zip_with(quantize_col(F.col(vec_col), mn, scale), qlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        embeddings.select(
            F.col(id_col).cast("long").alias("vec_id"), qdot.cast("long").alias("qdot")
        )
        .orderBy(F.desc("qdot"), F.asc("vec_id"))
        .limit(k)
    )
