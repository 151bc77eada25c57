"""Snapshot layer (index/snapshots.py): atomic publish, time travel,
rollback, optimistic-concurrency conflicts, and reference-counted
expiry over real segment builds."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.index.segments import (
    assign_docnums,
    build_segments,
)
from distributed_search_engine_spark.index.snapshots import (
    SnapshotConflict,
    commit_snapshot,
    current_snapshot_id,
    expire_snapshots,
    list_snapshots,
    read_segments_at,
    read_snapshot,
    rollback,
)
from distributed_search_engine_spark.operators.postings import build_index


def _build_store(spark, root, sub, docs, n_partitions=4):
    idx = build_index(
        docs, doc_id_col="doc_id", content_col="text", with_stems=False
    )
    ds = assign_docnums(idx["doc_stats"], n_partitions)
    avgdl = ds.agg(F.avg("doc_len")).collect()[0][0] or 1.0
    build_segments(
        idx["postings"],
        idx["term_stats"],
        ds,
        os.path.join(root, sub),
        float(avgdl),
        n_partitions=n_partitions,
        batch_partitions=n_partitions,
    )
    return idx


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snapstore"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _build_store(spark, root, "v1/data", docs.where("doc_id < 60"))
    _build_store(spark, root, "v2/data", docs.where("doc_id < 120"))
    return root


def test_commit_and_head(store):
    s1 = commit_snapshot(store, "v1/data", "build", parent_id=None)
    assert s1 == 1 and current_snapshot_id(store) == 1
    s2 = commit_snapshot(store, "v2/data", "rebuild", parent_id=1)
    assert s2 == 2 and current_snapshot_id(store) == 2
    assert [s["snapshot_id"] for s in list_snapshots(store)] == [1, 2]
    assert read_snapshot(store)["operation"] == "rebuild"


def test_time_travel_reads_each_snapshots_file_set(spark, store):
    seg1 = read_segments_at(spark, store, 1)
    seg2 = read_segments_at(spark, store, 2)  # HEAD
    terms1 = {r["term"] for r in seg1.select("term").distinct().collect()}
    terms2 = {r["term"] for r in seg2.select("term").distinct().collect()}
    assert terms1 <= terms2  # v2 indexed a superset corpus
    # docnum space grew with the corpus
    m1 = seg1.agg(F.max(F.expr("blocks[size(blocks)-1].last_docnum"))).collect()[0][0]
    m2 = seg2.agg(F.max(F.expr("blocks[size(blocks)-1].last_docnum"))).collect()[0][0]
    assert m2 > m1


def test_stale_parent_conflicts(store):
    with pytest.raises(SnapshotConflict):
        commit_snapshot(store, "v1/data", "build", parent_id=1)


def test_rollback_moves_head_only(spark, store):
    rollback(store, 1)
    assert current_snapshot_id(store) == 1
    assert read_segments_at(spark, store).count() == read_segments_at(
        spark, store, 1
    ).count()
    # data of the newer snapshot is untouched
    assert read_segments_at(spark, store, 2).count() > 0
    rollback(store, 2)


def test_expiry_deletes_only_unreferenced_files(spark, store):
    # snapshot 3 re-commits v2's files -> v1's files become orphans of
    # snapshot 1 once only the last 2 snapshots are retained
    commit_snapshot(store, "v2/data", "noop-recommit", parent_id=2)
    stats = expire_snapshots(store, keep_last=2)
    assert stats["snapshots_dropped"] == 1
    assert stats["files_deleted"] > 0
    assert [s["snapshot_id"] for s in list_snapshots(store)] == [2, 3]
    # retained snapshots still read cleanly
    assert read_segments_at(spark, store, 2).count() > 0
    assert read_segments_at(spark, store, 3).count() > 0
    # the expired snapshot is gone
    with pytest.raises(FileNotFoundError):
        read_snapshot(store, 1)
    with pytest.raises(FileNotFoundError):
        rollback(store, 1)
