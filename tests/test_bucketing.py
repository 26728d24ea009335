"""Bucketed co-located joins — the 100 TB layout strategy for repeated
large⋈large joins on a stable key (orders⋈lineitem on orderkey).

Writing both fact tables bucketed by the join key lets every subsequent
join run with ZERO exchanges: each bucket pair joins locally. This is
the layout a production deployment would maintain for the hot join keys
instead of re-shuffling 100 TB per query. (Reference parity: ReplicaDB
has no layout management at all — sinks are plain tables; this is a
Spark-native capability on top.)
"""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static per-JVM; point each managed table at
    # an explicit tmp location instead so the shared session stays untouched.
    wh = tmp_path_factory.mktemp("bucketed_wh")
    from replicadb_spark.session import tables

    t = tables(spark, SF, ("orders", "lineitem"))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(wh / "b_orders"))
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(wh / "b_lineitem"))
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(bucketed_tables):
    spark = bucketed_tables
    # At sf0.001 AQE may elect a broadcast join (which is trivially
    # exchange-free); pin the shuffle-join strategy so the test actually
    # exercises the bucketing layout the way a 100 TB large⋈large would.
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        joined.collect()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plan = (
        joined._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    # the join itself is exchange-free: both sides' bucketing satisfies
    # the distribution requirement; only the 5-row final agg may shuffle
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange" not in join_part


def test_bucketed_join_matches_plain_join(bucketed_tables):
    spark = bucketed_tables
    from replicadb_spark.session import tables

    t = tables(spark, SF, ("orders", "lineitem"))
    want = {
        r["o_orderpriority"]: float(r["qty"])
        for r in t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
        .collect()
    }
    got = {
        r["o_orderpriority"]: float(r["qty"])
        for r in spark.table("b_orders")
        .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
        .collect()
    }
    assert got == want
