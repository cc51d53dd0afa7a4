"""IVF-flat ANN: assignment correctness, probe behavior, recall vs brute
force on planted clusters."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    # three well-separated clusters around orthogonal axes + noise, dim 8
    rng = np.random.default_rng(42)
    rows = []
    centers = np.eye(3, 8) * 10.0
    vid = 0
    for ci in range(3):
        for _ in range(20):
            v = centers[ci] + rng.normal(0, 0.5, 8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
    df.count()
    yield df
    df.unpersist()


def test_assignment_argmax_and_tiebreak(spark, emb):
    from lucene_solr_intervals_spark.ops.similarity import ivf_assignments

    # one centroid per planted cluster: vectors 0, 20, 40
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.where("vec_id in (0, 20, 40)").collect()
    ]
    assigned = {r["vec_id"]: r["cid"] for r in ivf_assignments(emb, cents).collect()}
    for v, c in assigned.items():
        assert c == (v // 20) * 20, (v, c)


def test_tie_goes_to_lowest_cid(spark):
    from lucene_solr_intervals_spark.ops.similarity import ivf_assignments

    df = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    # two identical centroids -> tie -> lowest cid wins (matches the
    # oracle's row_number ORDER BY dot DESC, cid ASC)
    got = ivf_assignments(df, [(7, [1.0, 0.0]), (3, [1.0, 0.0])]).collect()
    assert got[0]["cid"] == 3


def test_probed_lists_only(spark, emb):
    from lucene_solr_intervals_spark.ops.similarity import ivf_topk

    q = [10.0, 0, 0, 0, 0, 0, 0, 0]  # cluster-0 axis
    got = [r["vec_id"] for r in
           ivf_topk(emb, q, k=10, centroid_ids=(0, 20, 40), nprobe=1).collect()]
    assert got and all(v < 20 for v in got)  # only cluster 0's list probed


def test_recall_matches_brute_force_when_probed(spark, emb):
    from lucene_solr_intervals_spark.ops.similarity import cosine_topk, ivf_topk

    q = [10.0, 1.0, 0, 0, 0, 0, 0, 0]
    brute = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    ivf = [r["vec_id"] for r in
           ivf_topk(emb, q, k=5, centroid_ids=(0, 20, 40), nprobe=2).collect()]
    # the true neighbors live in cluster 0 (probed first) -> full recall
    assert ivf == brute


def test_kmeans_beats_sampled_centroids_at_equal_nprobe(spark, emb):
    """k-means-trained quantizer recall@10 > sampled-centroid recall at the
    same nprobe on planted clusters (the faiss-style training loop:
    assignment + spherical mean, ops/similarity.py kmeans_centroids)."""
    from lucene_solr_intervals_spark.ops.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    # query inside cluster 1 (vec_ids 20..39)
    qvec = [float(x) for x in emb.where("vec_id = 25").head()["embedding"]]
    truth = {r["vec_id"] for r in cosine_topk(emb, qvec, k=10).collect()}

    # adversarial sampling: first 3 ids all come from cluster 0
    sampled = ivf_topk(emb, qvec, k=10, centroid_ids=(0, 1, 2), nprobe=1)
    got_sampled = {r["vec_id"] for r in sampled.collect()}

    cents = kmeans_centroids(emb, n_centroids=3, iters=4)
    trained = ivf_topk(emb, qvec, k=10, nprobe=1, centroids=cents)
    got_trained = {r["vec_id"] for r in trained.collect()}

    r_sampled = len(got_sampled & truth) / 10.0
    r_trained = len(got_trained & truth) / 10.0
    assert r_trained > r_sampled
    assert r_trained == 1.0  # separated clusters: trained nprobe=1 is exact


def test_kmeans_centroids_deterministic_and_spherical(spark, emb):
    from lucene_solr_intervals_spark.ops.similarity import kmeans_centroids

    a = kmeans_centroids(emb, n_centroids=3, iters=2)
    b = kmeans_centroids(emb, n_centroids=3, iters=2)
    assert a == b  # no RNG anywhere
    for _, v in a:
        assert sum(x * x for x in v) == pytest.approx(1.0, rel=1e-9)
    # default sizing ~ sqrt(n)
    d = kmeans_centroids(emb, iters=1)
    assert len(d) == round(60 ** 0.5)
