"""Replication-mode semantics (SURVEY §2.3 M1-M3) — DataFrame-level."""

from pyspark.sql import functions as F

from replicadb_spark.modes import upsert_dataframe


def test_upsert_replaces_on_pk(spark):
    sink = spark.createDataFrame([(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "v", "n"])
    staging = spark.createDataFrame([(2, "B", 99), (4, "D", 40)], ["id", "v", "n"])
    out = upsert_dataframe(sink, staging, ["id"])
    got = {(r["id"], r["v"], r["n"]) for r in out.collect()}
    assert got == {(1, "a", 10), (2, "B", 99), (3, "c", 30), (4, "D", 40)}


def test_upsert_composite_pk(spark):
    sink = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], ["a", "b", "v"])
    staging = spark.createDataFrame([(1, 2, "Y"), (2, 1, "z")], ["a", "b", "v"])
    out = upsert_dataframe(sink, staging, ["a", "b"])
    got = {(r["a"], r["b"], r["v"]) for r in out.collect()}
    assert got == {(1, 1, "x"), (1, 2, "Y"), (2, 1, "z")}


def test_upsert_staging_dups_last_wins_deterministic(spark):
    # two staging rows with same PK: one survivor (staging priority over sink)
    sink = spark.createDataFrame([(1, "old")], ["id", "v"])
    staging = spark.createDataFrame([(1, "n1"), (1, "n2")], ["id", "v"])
    out = upsert_dataframe(sink, staging, ["id"]).collect()
    assert len(out) == 1
    assert out[0]["v"] in ("n1", "n2")  # deterministic tiebreak is PK-level


def test_upsert_single_shuffle_plan(spark):
    """The merge must shuffle once on the PK (union + window), not twice
    (join + union) — check the physical plan has exactly one Exchange."""
    sink = spark.range(100).withColumn("v", F.lit("a"))
    staging = spark.range(50).withColumn("v", F.lit("b"))
    plan = upsert_dataframe(sink, staging, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
