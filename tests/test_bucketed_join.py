"""Bucketed co-located joins (sinks/files.write_bucketed_table): the
persisted-layout scale contract — two tables bucketed on the join key
with the same bucket count must join with ZERO Exchange operators, and
sorted buckets must also skip the per-side Sort. Results are
cross-checked against the plain (shuffling) join."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.sinks.files import write_bucketed_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    for name, df, key in (
        ("t_orders_b", orders, "o_custkey"),
        ("t_customer_b", customer, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # repartition on the SAME hash as the bucket spec → each task
        # holds exactly one bucket → ONE file per bucket, which is what
        # lets the scan advertise the per-bucket sort order (multi-file
        # buckets are concatenated and lose it)
        write_bucketed_table(
            df.repartition(8, key),
            name,
            bucket_cols=[key],
            n_buckets=8,
            sort_cols=[key],
            path=str(base / name),
        )
    yield "t_orders_b", "t_customer_b"
    for name in ("t_orders_b", "t_customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _join(spark, l, r):
    return (
        spark.table(l)
        .join(spark.table(r), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"),
        )
    )


def test_bucketed_join_has_zero_exchange(spark, bucketed_pair):
    l, r = bucketed_pair
    # force the sort-merge path: a broadcast would hide the layout win
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # the planner's auto heuristic may disable bucketed scans it thinks
    # won't help; pin it on — we're asserting the layout's guarantee
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    # since Spark 3.0 the scan only advertises the persisted per-bucket
    # sort order behind this flag (SPARK-28616: multi-file buckets would
    # force single-threaded concatenation; ours are one file per bucket)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        df = _join(spark, l, r)
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the agg
        assert "SortMergeJoin" in plan
        # the co-located layout: NO shuffle anywhere under the join
        assert "Exchange hashpartitioning" not in join_section
        # sortBy persisted the per-bucket order: neither side re-sorts
        # (the only Sort allowed is none — buckets advertise ordering)
        assert join_section.count("Sort ") == 0, join_section
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    l, r = bucketed_pair
    got = {
        r_["c_mktsegment"]: (r_["n"], float(r_["rev"]))
        for r_ in _join(spark, l, r).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    want = {
        r_["c_mktsegment"]: (r_["n"], float(r_["rev"]))
        for r_ in orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev"),
        )
        .collect()
    }
    assert got == want and len(got) >= 3


def test_bucket_pruning_on_point_lookup(spark, bucketed_pair):
    l, _ = bucketed_pair
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table(l).where(F.col("o_custkey") == 371)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # bucket pruning: the scan reads 1 of 8 buckets, not the table
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
