"""Misra-Gries heavy hitters: guarantee + merge properties."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.operators.heavy_hitters import (
    _mg_reduce,
    heavy_hitter_candidates,
    mg_summaries,
)


def _zipf_df(spark, n_keys=2000, rows=60_000):
    """Deterministic zipf-ish stream: key j gets ~rows/(j+1) occurrences,
    shuffled across partitions by hash."""
    return (
        spark.range(rows)
        .select(
            (F.floor(
                F.lit(float(n_keys)) ** (F.pmod(F.xxhash64("id"), 10_000) / 10_000.0)
            ) - 1).cast("long").alias("key")
        )
        .repartition(16)
    )


def test_mg_reduce_bounds_and_preserves_big_counts():
    counts = {f"k{i}": 1000 - i for i in range(100)}
    red = _mg_reduce(dict(counts), 10)
    assert len(red) <= 100  # prune drops the tail
    # the largest keys survive with decremented counts
    assert "k0" in red and red["k0"] == counts["k0"] - sorted(
        counts.values(), reverse=True
    )[10]


def test_candidates_superset_of_true_heavy_hitters(spark):
    df = _zipf_df(spark)
    n = df.count()
    k = 64
    exact = {
        r["key"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * 16 > n).collect()
    }
    assert exact  # the zipf head produces real heavy hitters
    cands = {r["key"] for r in heavy_hitter_candidates(df, "key", k=k).collect()}
    assert exact <= cands  # the mergeable-summaries guarantee
    assert len(cands) <= k + 16  # bounded output (ties kept)


def test_estimates_underestimate_within_bound(spark):
    df = _zipf_df(spark)
    n = df.count()
    k = 64
    true = {
        r["key"]: r["c"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n_parts = df.rdd.getNumPartitions()
    for r in heavy_hitter_candidates(df, "key", k=k).collect():
        assert r["est"] <= true[r["key"]]
        # per-partition error ≤ n_p/(k+1); summed ≤ N/(k+1)·(merge depth 1)
        assert true[r["key"]] - r["est"] <= n / (k + 1) * (1 + n_parts / n * k)


def test_summaries_bounded_per_partition(spark):
    df = _zipf_df(spark).repartition(8)
    per_part = (
        mg_summaries(df, "key", k=32)
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    assert all(r["rows"] <= 32 for r in per_part)
