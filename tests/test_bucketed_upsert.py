"""Incremental PK merge into a bucketed table
(sinks/files.upsert_bucketed_table, VERDICT r6 item 3): MERGE semantics,
bucket-touch granularity (untouched bucket files are physically
unchanged), post-merge bucket-join eligibility, and changelog
convergence with at-least-once replay."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.sinks.files import (
    _bucket_of,
    upsert_bucketed_table,
    write_bucketed_table,
)

N_BUCKETS = 8


def _mk_table(spark, tmp_path, name, n=400):
    path = str(tmp_path / name)
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_table(
        df.repartition(N_BUCKETS, "k"),
        name,
        bucket_cols=["k"],
        n_buckets=N_BUCKETS,
        sort_cols=["k"],
        path=path,
    )
    return path


def _files(path):
    import os
    from pathlib import Path

    return {
        f.name: os.stat(f).st_mtime_ns
        for f in Path(path).iterdir()
        if f.is_file() and not f.name.startswith(("_", "."))
    }


def test_bucket_filename_parse():
    assert _bucket_of("part-00000-abc_00003.c000.snappy.parquet") == 3
    assert _bucket_of("part-00000-abc.c000.snappy.parquet") is None


def test_upsert_touches_only_staged_buckets(spark, tmp_path):
    path = _mk_table(spark, tmp_path, "t_up_b")
    before = _files(path)
    try:
        staging = spark.createDataFrame(
            [(5, 555), (1000, 2000)], "k long, v long"
        )
        touched = upsert_bucketed_table(
            spark, staging, "t_up_b",
            pk_columns=["k"], bucket_cols=["k"], n_buckets=N_BUCKETS,
            sort_cols=["k"], path=path,
        )
        assert 1 <= len(touched) <= 2
        after = _files(path)
        # untouched buckets: the SAME files, not rewritten (name + mtime)
        untouched_before = {
            n: t for n, t in before.items() if _bucket_of(n) not in touched
        }
        untouched_after = {
            n: t for n, t in after.items() if _bucket_of(n) not in touched
        }
        assert untouched_before == untouched_after and untouched_before
        # touched buckets: replaced files
        assert not set(
            n for n in before if _bucket_of(n) in touched
        ) & set(after)
        # MERGE semantics: update replaced, insert landed, rest survive
        got = {r["k"]: r["v"] for r in spark.table("t_up_b").collect()}
        want = {i: i * 2 for i in range(400)} | {5: 555, 1000: 2000}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS t_up_b")


def test_upsert_empty_staging_is_noop(spark, tmp_path):
    path = _mk_table(spark, tmp_path, "t_up_noop")
    before = _files(path)
    try:
        staging = spark.createDataFrame([], "k long, v long")
        assert upsert_bucketed_table(
            spark, staging, "t_up_noop",
            pk_columns=["k"], bucket_cols=["k"], n_buckets=N_BUCKETS,
            path=path,
        ) == []
        assert _files(path) == before
    finally:
        spark.sql("DROP TABLE IF EXISTS t_up_noop")


def test_merged_table_keeps_bucket_join_eligibility(spark, tmp_path):
    """The reason the layout exists: after the incremental MERGE the
    table still joins a same-spec bucketed table with ZERO Exchange and
    zero Sort (the tests/test_bucketed_join.py contract)."""
    path = _mk_table(spark, tmp_path, "t_up_join")
    _mk_table(spark, tmp_path, "t_up_dim", n=300)
    try:
        staging = spark.createDataFrame(
            [(7, 700), (13, 1300), (999, 9)], "k long, v long"
        )
        upsert_bucketed_table(
            spark, staging, "t_up_join",
            pk_columns=["k"], bucket_cols=["k"], n_buckets=N_BUCKETS,
            sort_cols=["k"], path=path,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        try:
            df = (
                spark.table("t_up_join")
                .join(
                    spark.table("t_up_dim").select(
                        F.col("k"), F.col("v").alias("dim_v")
                    ),
                    "k",
                )
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            assert plan.count("Sort ") == 0, plan
            # values correct through the co-located path (a row in the
            # wrong bucket file would silently vanish from this join)
            got = {r["k"]: (r["v"], r["dim_v"]) for r in df.collect()}
            want = {i: (i * 2, i * 2) for i in range(300)}
            want[7] = (700, 14)
            want[13] = (1300, 26)
            assert got == want
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled"
            )
            spark.conf.unset(
                "spark.sql.legacy.bucketedTableScan.outputOrdering"
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_up_join")
        spark.sql("DROP TABLE IF EXISTS t_up_dim")


def test_changelog_convergence_and_replay(spark, tmp_path):
    """The stream_jdbc_replica pattern against the bucketed sink:
    sequential changelog batches converge to the final state, and
    replaying the last batch (at-least-once delivery) is idempotent."""
    path = str(tmp_path / "t_up_cdc")
    spark.sql("DROP TABLE IF EXISTS t_up_cdc")

    def apply(rows):
        upsert_bucketed_table(
            spark,
            spark.createDataFrame(rows, "k long, v long"),
            "t_up_cdc",
            pk_columns=["k"], bucket_cols=["k"], n_buckets=4,
            path=path,
        )

    try:
        apply([(1, 10), (2, 20), (3, 30)])   # initial load (creates)
        apply([(2, 22), (4, 40)])            # update + insert
        apply([(1, 11), (5, 50)])            # update + insert
        want = {1: 11, 2: 22, 3: 30, 4: 40, 5: 50}
        got = {r["k"]: r["v"] for r in spark.table("t_up_cdc").collect()}
        assert got == want
        apply([(1, 11), (5, 50)])            # replayed batch → no change
        got = {r["k"]: r["v"] for r in spark.table("t_up_cdc").collect()}
        assert got == want
        assert spark.table("t_up_cdc").count() == 5  # no duplicate keys
    finally:
        spark.sql("DROP TABLE IF EXISTS t_up_cdc")
