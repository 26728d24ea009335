"""Unit tests for incremental aggregate maintenance and table profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from replicadb_spark.operators.rollup import (
    agg_partials,
    finalize_partials,
    merge_partials,
    profile_table,
)


def test_merge_order_independent(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 3.0), ("a", 4.0), ("b", 5.0)],
        "k string, v double",
    )
    b1 = agg_partials(df.where(F.col("v") <= 2), ["k"], "v")
    b2 = agg_partials(df.where((F.col("v") > 2) & (F.col("v") <= 4)), ["k"], "v")
    b3 = agg_partials(df.where(F.col("v") > 4), ["k"], "v")

    fwd = finalize_partials(merge_partials(merge_partials(b1, b2, ["k"]), b3, ["k"]), ["k"])
    rev = finalize_partials(merge_partials(merge_partials(b3, b1, ["k"]), b2, ["k"]), ["k"])
    full = finalize_partials(agg_partials(df, ["k"], "v"), ["k"])

    def snap(d):
        return sorted((r.k, r.cnt, r.total, r.avg, r.vmin, r.vmax) for r in d.collect())

    assert snap(fwd) == snap(rev) == snap(full)
    a = dict((r.k, (r.cnt, r.total)) for r in full.collect())
    assert a == {"a": (3, 7.0), "b": (2, 8.0)}


def test_merge_handles_new_and_missing_keys(spark):
    base = agg_partials(
        spark.createDataFrame([("a", 1.0)], "k string, v double"), ["k"], "v"
    )
    delta = agg_partials(
        spark.createDataFrame([("b", 9.0)], "k string, v double"), ["k"], "v"
    )
    out = {r.k: r.cnt for r in
           finalize_partials(merge_partials(base, delta, ["k"]), ["k"]).collect()}
    assert out == {"a": 1, "b": 1}


def test_profile_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")], "id long, s string"
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["id"].n_rows == 4
    assert prof["id"].n_nulls == 1
    assert prof["id"].n_distinct == 3
    assert (prof["id"].min_s, prof["id"].max_s) == ("1", "3")
    assert prof["s"].n_nulls == 1
    assert prof["s"].n_distinct == 2
    assert (prof["s"].min_s, prof["s"].max_s) == ("x", "y")


def test_profile_single_aggregate_node(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    prof = profile_table(df)
    plan = prof._jdf.queryExecution().optimizedPlan().toString()
    # one pass: a single Aggregate over the scan (multi-distinct goes
    # through Expand, not per-column self-joins)
    assert plan.count("Join") == 0
