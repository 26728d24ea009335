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


def test_int8_quant_roundtrip_error_bound(spark):
    import numpy as np

    from replicadb_spark.functions import quantization as Q

    rng = np.random.RandomState(3)
    V = rng.randn(200, 6) * np.array([1, 10, 0.1, 5, 2, 1])
    V[:, 5] = 7.25  # constant dimension
    rows = [(i, [float(x) for x in V[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = Q.quant_params(df, "embedding")
    assert len(params) == 6
    assert params[5] == (7.25, 7.25)
    recon = Q.dequantize_int8(
        Q.quantize_int8(df, "vec_id", "embedding", params), params
    )
    got = {r["id"]: r["recon"] for r in recon.collect()}
    step = np.array([max(hi - lo, 0.0) / 254.0 for lo, hi in params])
    for i in range(200):
        err = np.abs(np.array(got[i]) - V[i])
        assert (err <= step / 2 + 1e-9).all()
    assert all(abs(got[i][5] - 7.25) < 1e-12 for i in range(200))


def test_int8_quant_keep_columns_ride_through(spark):
    """keep= pass-through (r17): kept columns ride the encode/decode
    kernels untouched and codes/recon are identical with or without
    them — the emb_int8_quant_gate uses this to compare original and
    reconstruction in the same row instead of an id join."""
    import numpy as np

    from replicadb_spark.functions import quantization as Q

    rng = np.random.RandomState(7)
    V = rng.randn(50, 4)
    rows = [(i, [float(x) for x in V[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = Q.quant_params(df, "embedding")

    plain = Q.quantize_int8(df, "vec_id", "embedding", params)
    kept = Q.quantize_int8(df, "vec_id", "embedding", params, keep=["embedding"])
    assert kept.columns == ["id", "codes", "embedding"]
    pc = {r["id"]: r["codes"] for r in plain.collect()}
    for r in kept.collect():
        assert r["codes"] == pc[r["id"]]
        assert np.allclose(r["embedding"], V[r["id"]])

    recon = Q.dequantize_int8(kept, params, keep=["embedding"]).collect()
    plain_recon = {r["id"]: r["recon"] for r in Q.dequantize_int8(plain, params).collect()}
    step = np.array([max(hi - lo, 0.0) / 254.0 for lo, hi in params])
    for r in recon:
        assert r["recon"] == plain_recon[r["id"]]
        assert np.allclose(r["embedding"], V[r["id"]])  # source col intact
        assert (np.abs(np.array(r["recon"]) - V[r["id"]]) <= step / 2 + 1e-9).all()


def test_kmv_exact_when_unsaturated(spark):
    from replicadb_spark.operators.quantiles import (
        _kmv_estimate,
        kmv_distinct_sketch,
    )

    df = spark.createDataFrame([(i % 37,) for i in range(500)], "k long")
    ranks = [r["__rk"] for r in kmv_distinct_sketch(df, "k", k=256).collect()]
    assert len(ranks) == 37
    assert _kmv_estimate(sorted(ranks), 256) == 37.0


def test_kmv_estimate_and_merge_accuracy(spark):
    from replicadb_spark.operators.quantiles import (
        kmv_distinct_sketch,
        kmv_set_estimates,
    )

    # A = 0..5999, B = 4000..9999 → |A|=6000 |B|=6000 |A∪B|=10000 |A∩B|=2000
    a = spark.createDataFrame([(i,) for i in range(6000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(4000, 10000)], "k long")
    ra = [r["__rk"] for r in kmv_distinct_sketch(a, "k", k=512).collect()]
    rb = [r["__rk"] for r in kmv_distinct_sketch(b, "k", k=512).collect()]
    est = kmv_set_estimates(ra, rb, 512)
    assert abs(est["est_a"] - 6000) <= 0.15 * 6000
    assert abs(est["est_b"] - 6000) <= 0.15 * 6000
    assert abs(est["est_union"] - 10000) <= 0.15 * 10000
    assert abs(est["est_intersect"] - 2000) <= 0.30 * 2000


def test_int8_quant_out_of_range_saturates(spark):
    """Params fitted on one corpus, applied to another: values outside
    (lo, hi) must SATURATE at the range ends, not wrap through int8
    overflow (code 128 → -128 would reconstruct near lo instead of hi)."""
    import numpy as np

    from replicadb_spark.functions import quantization as Q

    fit = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [10.0, 1.0])], "vec_id long, embedding array<double>"
    )
    params = Q.quant_params(fit, "embedding")
    probe = spark.createDataFrame(
        [(3, [12.0, -0.5])], "vec_id long, embedding array<double>"
    )
    recon = Q.dequantize_int8(
        Q.quantize_int8(probe, "vec_id", "embedding", params), params
    ).collect()[0]["recon"]
    assert abs(recon[0] - 10.0) < 1e-9   # clamped to hi, NOT wrapped to ~lo
    assert abs(recon[1] - 0.0) < 1e-9    # clamped to lo


def test_kmv_grouped_sketch_matches_per_group_sketch(spark):
    """The grouped build (Arrow pre-prune + keyed rank) produces
    exactly the bottom-k distinct ranks a per-group kmv_distinct_sketch
    would — same sketch, one pass over all groups."""
    from replicadb_spark.operators.quantiles import (
        kmv_distinct_sketch,
        kmv_grouped_sketch,
    )

    rows = [(("a" if i % 3 else "b"), i % 450) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, k long")
    grouped = {
        r["g"]: list(r["ranks"])
        for r in kmv_grouped_sketch(df, ["g"], "k", k=64).collect()
    }
    for g in ("a", "b"):
        solo = sorted(
            r["__rk"]
            for r in kmv_distinct_sketch(
                df.where(F.col("g") == g), "k", k=64
            ).collect()
        )
        assert grouped[g] == solo and len(solo) == 64


def test_kmv_grouped_sketch_equals_bruteforce_bottom_k(spark):
    """r16 (the one-aggregate sketch shape): on seeded random data with
    skewed group sizes, each group's ranks must equal the bottom-k of
    the exact distinct xxhash64 set — computed independently via a
    plain Spark projection collected and reduced in Python."""
    import random

    from pyspark.sql import functions as F

    from replicadb_spark.operators.quantiles import kmv_grouped_sketch

    rng = random.Random(42)
    rows = [
        (f"g{rng.randint(0, 3)}", rng.randint(0, 500))
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, k long").repartition(16)
    k = 32
    got = {
        r["g"]: list(r["ranks"])
        for r in kmv_grouped_sketch(df, ["g"], "k", k=k).collect()
    }
    hashed = df.select("g", F.xxhash64("k").alias("h")).collect()
    want: dict = {}
    for r in hashed:
        want.setdefault(r["g"], set()).add(r["h"])
    want = {g: sorted(s)[:k] for g, s in want.items()}
    assert got == want
