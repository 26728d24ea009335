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


def test_incremental_file_mode_temp_swap(spark, tmp_path):
    """Incremental file merge must never overwrite the path its own plan
    reads (the recompute-from-half-overwritten-input hazard): the merge
    lands at a temp sibling first, then swaps. Verify merged contents and
    that the temp dir is gone."""
    import os

    from replicadb_spark.modes import run_file_mode

    class _Job:
        mode = "incremental"

    path = str(tmp_path / "sink")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).write.parquet(path)
    delta = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    run_file_mode(spark, _Job(), delta, path=path, fmt="parquet", pk_columns=["id"])

    got = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    assert not os.path.exists(path + ".__replicadb_tmp__")

    # second merge over the swapped output still correct (path fully valid)
    delta2 = spark.createDataFrame([(3, "C"), (4, "d")], ["id", "v"])
    run_file_mode(spark, _Job(), delta2, path=path, fmt="parquet", pk_columns=["id"])
    got2 = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got2 == {(1, "a"), (2, "B"), (3, "C"), (4, "d")}


def test_file_incremental_fails_on_corrupt_sink(spark, tmp_path):
    """An unreadable sink must fail the job, not silently append past
    the PK merge (duplicate keys)."""
    import pytest

    from replicadb_spark.modes import run_file_mode
    from replicadb_spark.options import ReplicaJob

    sink = tmp_path / "corrupt_sink"
    sink.mkdir()
    (sink / "part-00000.parquet").write_bytes(b"not parquet at all")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    job = ReplicaJob(
        source_connect="file:///dev/null", sink_connect=f"file://{sink}",
        mode="incremental",
    )
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        run_file_mode(spark, job, df, path=str(sink), fmt="parquet",
                      pk_columns=["id"])
    # the corrupt evidence was not clobbered
    assert (sink / "part-00000.parquet").read_bytes() == b"not parquet at all"
