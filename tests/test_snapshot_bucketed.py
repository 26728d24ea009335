"""Bucketed snapshot table (operators/snapshot_bucketed): time travel
AND zero-Exchange joins in one commit path."""

import pytest
from pyspark.sql import functions as F

from replicadb_spark.operators.snapshot_bucketed import (
    snapshot_commit_bucketed,
    snapshot_read_bucketed,
    snapshot_upsert_bucketed,
)
from replicadb_spark.operators.snapshot_table import (
    snapshot_commit,
    snapshot_compact,
    snapshot_read,
    snapshot_record,
    snapshot_upsert,
)

N_BUCKETS = 4


def _base(spark):
    return spark.range(200).selectExpr("id as k", "id * 2 as v")


def _mk(spark, tmp_path, name="bt"):
    path = str(tmp_path / name)
    s1 = snapshot_commit_bucketed(
        _base(spark), path, bucket_cols=["k"], n_buckets=N_BUCKETS,
        stat_columns=["k"],
    )
    return path, s1


def _zero_exchange_join_plan(spark, df):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        l = df.select("k", F.col("v").alias("lv"))
        r = df.select("k", F.col("v").alias("rv"))
        j = l.join(r, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        return j.count(), plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_commit_upsert_time_travel_rows(spark, tmp_path):
    path, s1 = _mk(spark, tmp_path)
    batch = spark.createDataFrame(
        [(0, 999), (1, 888), (500, 500)], "k long, v long"
    )
    s2 = snapshot_upsert_bucketed(spark, path, batch, pk_columns=["k"])
    assert (s1, s2) == (1, 2)
    # current state: last-wins merge
    cur = {r["k"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert cur[0] == 999 and cur[1] == 888 and cur[500] == 500
    assert len(cur) == 201 and cur[7] == 14
    # time travel: the parent snapshot is untouched
    old = {r["k"]: r["v"]
           for r in snapshot_read(spark, path, snapshot_id=s1).collect()}
    assert old[0] == 0 and 500 not in old and len(old) == 200
    rec = snapshot_record(path, s2)
    assert rec["n_buckets"] == N_BUCKETS and rec["bucket_cols"] == ["k"]
    assert 0 < len(rec["touched_buckets"]) <= N_BUCKETS


def test_partial_rewrite_only_touched_buckets(spark, tmp_path):
    path, s1 = _mk(spark, tmp_path)
    # one key -> one touched bucket: victims must be 1 of 4 files
    s2 = snapshot_upsert_bucketed(
        spark, path,
        spark.createDataFrame([(3, 777)], "k long, v long"),
        pk_columns=["k"],
    )
    rec = snapshot_record(path, s2)
    assert len(rec["touched_buckets"]) == 1
    assert rec["victim_files"] == 1


def test_bucketed_read_zero_exchange_on_time_traveled_snapshot(spark, tmp_path):
    path, s1 = _mk(spark, tmp_path)
    snapshot_upsert_bucketed(
        spark, path,
        spark.createDataFrame([(0, 999), (500, 500)], "k long, v long"),
        pk_columns=["k"],
    )
    # register the PARENT snapshot (mixed ownership would appear at the
    # current one; the parent is fully owned by commit 1 — check both)
    for sid, expect_n in ((1, 200), (None, 201)):
        df = snapshot_read_bucketed(spark, path, snapshot_id=sid)
        n, plan = _zero_exchange_join_plan(spark, df)
        assert n == expect_n
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "Bucketed: true" in plan


def test_current_snapshot_mixes_commit_dirs_per_bucket(spark, tmp_path):
    """After an upsert, the current snapshot's buckets live in TWO
    commit dirs (touched in snap-2, untouched in snap-1) — and the
    registered bucketed read stitches them with zero Exchange."""
    path, s1 = _mk(spark, tmp_path)
    snapshot_upsert_bucketed(
        spark, path,
        spark.createDataFrame([(3, 777)], "k long, v long"),
        pk_columns=["k"],
    )
    df = snapshot_read_bucketed(spark, path)
    n, plan = _zero_exchange_join_plan(spark, df)
    assert n == 200
    assert "Exchange hashpartitioning" not in plan
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got[3] == 777 and got[7] == 14


def test_layout_guards(spark, tmp_path):
    path, s1 = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="BUCKETED"):
        snapshot_commit(_base(spark), path)
    with pytest.raises(ValueError, match="BUCKETED"):
        snapshot_upsert(
            spark, path,
            spark.createDataFrame([(1, 1)], "k long, v long"),
            pk_columns=["k"],
        )
    with pytest.raises(ValueError, match="BUCKETED"):
        snapshot_compact(spark, path)
    # bucket key must be inside the PK
    with pytest.raises(ValueError, match="subset of pk_columns"):
        snapshot_upsert_bucketed(
            spark, path,
            spark.createDataFrame([(1, 1)], "k long, v long"),
            pk_columns=["v"],
        )
    # a plain snapshot table refuses the bucketed upsert path
    plain = str(tmp_path / "plain")
    snapshot_commit(_base(spark), plain)
    with pytest.raises(ValueError, match="no bucket spec"):
        snapshot_upsert_bucketed(
            spark, plain,
            spark.createDataFrame([(1, 1)], "k long, v long"),
            pk_columns=["k"],
        )


def test_expire_keeps_live_buckets(spark, tmp_path):
    """GC on a bucketed table: superseded bucket files are swept, but
    commit dirs still OWNING live buckets (parquet under bkt=K/
    subdirs, nothing at the top level) must survive the empty-dir
    sweep, and the kept snapshot stays byte-identical."""
    from replicadb_spark.operators.snapshot_table import snapshot_expire

    path, s1 = _mk(spark, tmp_path)
    snapshot_upsert_bucketed(
        spark, path,
        spark.createDataFrame([(3, 777)], "k long, v long"),
        pk_columns=["k"],
    )
    res = snapshot_expire(spark, path, keep_last=1)
    # exactly the rewritten bucket's old file is unreferenced
    assert res["expired"] == [1] and res["data_files_removed"] == 1
    cur = {r["k"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert len(cur) == 200 and cur[3] == 777 and cur[7] == 14
    # the bucketed read still stitches (snap-1 survived the sweep —
    # it owns the 3 untouched buckets)
    df = snapshot_read_bucketed(spark, path)
    n, plan = _zero_exchange_join_plan(spark, df)
    assert n == 200 and "Exchange hashpartitioning" not in plan


def test_file_uri_root(spark, tmp_path):
    """The bridge inherits the FS-API portability: full cycle on an
    explicit file:// root."""
    path = "file://" + str(tmp_path / "bt_uri")
    snapshot_commit_bucketed(
        _base(spark), path, bucket_cols=["k"], n_buckets=N_BUCKETS,
    )
    snapshot_upsert_bucketed(
        spark, path,
        spark.createDataFrame([(0, 111)], "k long, v long"),
        pk_columns=["k"],
    )
    df = snapshot_read_bucketed(spark, path)
    n, plan = _zero_exchange_join_plan(spark, df)
    assert n == 200
    assert "Exchange hashpartitioning" not in plan
    assert {r["v"] for r in df.where("k = 0").collect()} == {111}
