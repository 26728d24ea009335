"""Changelog extraction from the snapshot table
(operators/snapshot_table.snapshot_changes): net row-level CDC between
two retained snapshots, reading only the files the range churned —
the CDC OUT surface completing the loop with operators/cdc.py (apply)
and stream_snapshot_replica (CDC in)."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.operators.snapshot_table import (
    snapshot_changed_files,
    snapshot_changes,
    snapshot_commit,
    snapshot_compact,
    snapshot_delete,
    snapshot_manifest,
    snapshot_upsert,
)


def _batch(spark, lo, hi, mult=10):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * mult).alias("v")
    )


def _changes(spark, path, a, b=None):
    return {
        (r.id, r.v, r._change_type)
        for r in snapshot_changes(
            spark, path, pk_columns=["id"], from_snapshot=a, to_snapshot=b
        ).collect()
    }


def test_append_yields_inserts_only(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = snapshot_commit(_batch(spark, 0, 5), path, stat_columns=["id"])
    s2 = snapshot_commit(_batch(spark, 5, 8), path, stat_columns=["id"])
    got = _changes(spark, path, s1, s2)
    assert got == {(i, i * 10, "insert") for i in range(5, 8)}


def test_upsert_classifies_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = snapshot_commit(_batch(spark, 0, 10), path, stat_columns=["id"])
    staging = _batch(spark, 8, 12, mult=100)  # 8,9 update; 10,11 insert
    s2 = snapshot_upsert(
        spark, path, staging, pk_columns=["id"], prune_column="id"
    )
    got = _changes(spark, path, s1, s2)
    assert got == {
        (8, 800, "update"),
        (9, 900, "update"),
        (10, 1000, "insert"),
        (11, 1100, "insert"),
    }


def test_delete_yields_preimage_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = snapshot_commit(_batch(spark, 0, 10), path, stat_columns=["id"])
    s2 = snapshot_delete(
        spark, path, F.col("id") >= 7, prune=("id", 7, 9)
    )
    got = _changes(spark, path, s1, s2)
    assert got == {(i, i * 10, "delete") for i in (7, 8, 9)}


def test_compaction_is_an_empty_changelog(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = snapshot_commit(
        _batch(spark, 0, 50).repartition(6), path, stat_columns=["id"]
    )
    s2 = snapshot_compact(spark, path, small_mb=64, target_files=1)
    assert s2 == s1 + 1
    df = snapshot_changes(
        spark, path, pk_columns=["id"], from_snapshot=s1, to_snapshot=s2
    )
    assert df.count() == 0
    # ...even though the commit physically churned every file
    added, removed = snapshot_changed_files(spark, path, s1, s2)
    assert added and removed


def test_net_range_collapses_and_skips_unchanged_files(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = snapshot_commit(_batch(spark, 0, 100), path, stat_columns=["id"])
    # wide second commit so the first commit's files stay untouched
    s2 = snapshot_commit(_batch(spark, 100, 200), path, stat_columns=["id"])
    s3 = snapshot_delete(spark, path, F.col("id").between(100, 199),
                         prune=("id", 100, 199))
    # net s1 -> s3: insert-then-delete of 100..199 vanishes entirely
    assert _changes(spark, path, s1, s3) == set()
    # and the untouched base files are not part of the diff's input
    added, removed = snapshot_changed_files(spark, path, s1, s3)
    m1 = {
        r.file
        for r in snapshot_manifest(spark, path, s1).select("file").collect()
    }
    assert not (set(added) & m1) and not (set(removed) & m1)


def test_same_snapshot_is_noop_and_null_transitions_update(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10), (2, None)], "id long, v long")
    s1 = snapshot_commit(df, path, stat_columns=["id"])
    empty = snapshot_changes(
        spark, path, pk_columns=["id"], from_snapshot=s1, to_snapshot=s1
    )
    assert empty.count() == 0
    assert empty.columns == ["id", "v", "_change_type"]
    # value -> NULL and NULL -> value must both classify as updates
    up = spark.createDataFrame([(1, None), (2, 20)], "id long, v long")
    s2 = snapshot_upsert(spark, path, up, pk_columns=["id"])
    got = {(r.id, r.v, r._change_type)
           for r in snapshot_changes(
               spark, path, pk_columns=["id"],
               from_snapshot=s1, to_snapshot=s2).collect()}
    assert got == {(1, None, "update"), (2, 20, "update")}


def test_duplicate_pk_refused(spark, tmp_path):
    """The guard is folded into the diff's own aggregation and fails
    LAZILY (raise_error at materialization) — the legal path pays no
    verification jobs; crafted dup-PK input still dies by name."""
    path = str(tmp_path / "t")
    dup = spark.createDataFrame([(1, 10), (1, 11)], "id long, v long")
    s1 = snapshot_commit(_batch(spark, 0, 3), path, stat_columns=["id"])
    s2 = snapshot_commit(dup, path, stat_columns=["id"])
    with pytest.raises(Exception, match="duplicate PK"):
        snapshot_changes(
            spark, path, pk_columns=["id"], from_snapshot=s1, to_snapshot=s2
        ).collect()
