"""Replicator analog (lucene/replicator/): index snapshot shipping.

The reference's replicator publishes a Revision (the files of a commit
point) that replicas copy and then open — correctness rests on commits
being immutable, self-contained file sets (IndexRevision.java,
ReplicationClient.java).  Here the same guarantee comes from the layout:
a committed index directory = term-sorted parquet segment files + a
manifest.json written via temp-file + atomic rename.  ANY file-level copy
of a committed directory is therefore a valid replica; this test IS the
replication procedure:

    1. commit an index (build_segments / writer commit)
    2. snapshot = recursive copy of the index dir (rsync/distcp role)
    3. open both with SegmentSearcher, assert identical results

Updates after the snapshot (deletes, new segments, merges) touch only the
primary — the replica is a frozen point-in-time view, exactly the
reference's sessions-over-revisions semantics.
"""

from __future__ import annotations

import random
import shutil

import pytest

from lucene_solr_intervals_spark.index.segment import (
    build_segments,
    read_manifest,
    verify_index,
)
from lucene_solr_intervals_spark.streaming.nrt import update_documents
from lucene_solr_intervals_spark.search.wand import SegmentSearcher


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)] + ["needle"]
    rows = []
    for i in range(300):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(5, 40))]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _results(spark, index_dir, terms, k=10):
    ss = SegmentSearcher(spark, index_dir)
    return [
        (r["doc_id"], float(r["score"]))
        for r in ss.search(terms, k=k).collect()
    ]


def test_snapshot_copy_is_a_valid_replica(spark, corpus, tmp_path_factory):
    primary = str(tmp_path_factory.mktemp("replica_src"))
    build_segments(corpus, primary, n_segments=6, id_col="doc_id", analyzer="code")

    replica = str(tmp_path_factory.mktemp("replica_dst")) + "/idx"
    shutil.copytree(primary, replica)

    # the replica verifies and answers identically
    assert verify_index(spark, replica, corpus=corpus)["ok"]
    for terms in (["needle"], ["w1", "w2"]):
        assert _results(spark, primary, terms) == _results(spark, replica, terms)
    assert read_manifest(primary) == read_manifest(replica)


def test_replica_is_point_in_time_after_primary_update(spark, corpus, tmp_path_factory):
    primary = str(tmp_path_factory.mktemp("replica_src2"))
    build_segments(corpus, primary, n_segments=6, id_col="doc_id", analyzer="code")
    replica = str(tmp_path_factory.mktemp("replica_dst2")) + "/idx"
    shutil.copytree(primary, replica)

    before = _results(spark, primary, ["needle"], k=300)
    doomed = [doc_id for doc_id, _ in before[:2]]
    # primary moves on: delete two matching docs (updateDocument commit)
    new_ids = [1000 + i for i in range(len(doomed))]
    upd = spark.createDataFrame(
        [(n, "nothing here") for n in new_ids], ["doc_id", "text"]
    )
    update_documents(upd, primary, old_doc_ids=doomed, analyzer="code")

    after_primary = {d for d, _ in _results(spark, primary, ["needle"], k=300)}
    after_replica = [
        (d, s) for d, s in _results(spark, replica, ["needle"], k=300)
    ]
    for d in doomed:
        assert d not in after_primary
    # the replica still serves the OLD commit point, scores included
    assert after_replica == before


def test_repair_drops_corrupt_segment(spark, corpus, tmp_path_factory):
    """CheckIndex -fix analog: corrupt one segment's parquet on disk;
    repair_index drops exactly that segment (losing its docs), the
    manifest commits atomically, and the survivor index searches fine."""
    import glob
    import os

    from lucene_solr_intervals_spark.index.segment import repair_index

    d = str(tmp_path_factory.mktemp("repair")) + "/idx"
    build_segments(corpus, d, n_segments=5, id_col="doc_id", analyzer="code")
    before = read_manifest(d)
    # clobber every parquet file of segment 2
    victims = glob.glob(os.path.join(d, "postings", "seg=2", "*.parquet"))
    assert victims
    for v in victims:
        with open(v, "wb") as f:
            f.write(b"not a parquet file")

    # dry run first: reports the damage, mutates nothing
    dry = repair_index(spark, d, dry_run=True)
    assert dry["dropped"] == [2] and dry["dry_run"] is True
    assert dry["unreadable"] == [2]  # repeatable read failure, not decode
    assert read_manifest(d)["n_docs"] == before["n_docs"]

    res = repair_index(spark, d)
    assert res["dropped"] == [2]
    after = read_manifest(d)
    seg2 = next(s for s in after["segments"] if s["seg"] == 2)
    assert seg2["status"] == "dropped"
    lost = next(s["n_docs"] for s in before["segments"] if s["seg"] == 2)
    assert after["n_docs"] == before["n_docs"] - lost
    assert res["lost_docs"] == lost

    # the repaired index opens and answers
    ss = SegmentSearcher(spark, d)
    hits = ss.search(["needle"], k=50).collect()
    assert hits
    assert verify_index(spark, d)["ok"]
    # a clean index repairs to a no-op
    d2 = str(tmp_path_factory.mktemp("repair2")) + "/idx"
    build_segments(corpus, d2, n_segments=3, id_col="doc_id", analyzer="code")
    assert repair_index(spark, d2) == {
        "dropped": [], "corrupt": [], "unreadable": [],
        "remaining": 3, "lost_docs": 0, "dry_run": False,
    }
