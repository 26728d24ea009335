"""Weighted reservoir sampling (operators/sampling): A-Res statistical
behavior, exact-k contract, determinism, and the non-positive-weight
refusal."""

import pytest
from pyspark.sql import functions as F

from replicadb_spark.operators.sampling import weighted_reservoir_sample


def _frame(spark, rows):
    return spark.createDataFrame(rows, "grp string, id long, w long")


def test_exact_k_per_group_and_determinism(spark):
    rows = [("a", i, 1 + i % 5) for i in range(40)] + [
        ("b", 100 + i, 10) for i in range(3)  # group smaller than k
    ]
    df = _frame(spark, rows)
    out = weighted_reservoir_sample(df, ["grp"], "id", "w", k=5, seed="t1")
    got = out.groupBy("grp").count().collect()
    assert {r["grp"]: r["count"] for r in got} == {"a": 5, "b": 3}
    # without replacement: ids unique; deterministic across invocations
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(
        r["id"]
        for r in weighted_reservoir_sample(
            df, ["grp"], "id", "w", k=5, seed="t1"
        ).collect()
    )
    assert ids1 == ids2 and len(ids1) == len(set(ids1))
    # a different seed draws a different sample (overwhelmingly)
    ids3 = sorted(
        r["id"]
        for r in weighted_reservoir_sample(
            df, ["grp"], "id", "w", k=5, seed="t2"
        ).collect()
    )
    assert ids1 != ids3


def test_inclusion_tracks_weight(spark):
    """A-Res first-pick distribution: across 60 independent seeds (run
    as 60 disjoint groups in ONE job — each group's ids are offset so
    every (seed-equivalent) group draws independent u's), an item
    holding half the total weight must win rank 1 roughly half the
    time. Band (0.3, 0.7) ≈ ±3σ at n=60 — fails for uniform sampling
    (expected 0.05) or a weight-blind rank-on-u implementation."""
    # per trial: 19 items of weight 1 + one of weight 19 (half the mass)
    rows = []
    heavy = set()
    for trial in range(60):
        base = trial * 1000
        rows += [(f"t{trial}", base + i, 1) for i in range(19)]
        rows.append((f"t{trial}", base + 999, 19))
        heavy.add(base + 999)
    df = _frame(spark, rows)
    top = weighted_reservoir_sample(df, ["grp"], "id", "w", k=1, seed="mc")
    wins = sum(r["id"] in heavy for r in top.collect())
    assert 0.3 <= wins / 60 <= 0.7, wins


def test_refuses_non_positive_weight(spark):
    df = _frame(spark, [("g", 1, 5), ("g", 2, 0)])
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_reservoir_sample(df, ["grp"], "id", "w", k=1).collect()
    with pytest.raises(ValueError, match="k >= 1"):
        weighted_reservoir_sample(df, ["grp"], "id", "w", k=0)


def test_plan_is_partitioned_window_no_global_sort(spark):
    df = _frame(spark, [("g%d" % (i % 4), i, 1 + i) for i in range(100)])
    out = weighted_reservoir_sample(df, ["grp"], "id", "w", k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(grp" in plan  # partitioned, not global
    assert "CartesianProduct" not in plan
