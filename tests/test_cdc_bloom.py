"""Unit tests for the CDC operators (snapshot diff, SCD2 intervals) and
the distributed Bloom-filter prejoin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from replicadb_spark.operators import (
    bloom_build,
    bloom_prejoin,
    bloom_probe,
    scd2_intervals,
    snapshot_diff,
)


# ---------------------------------------------------------------- snapshot_diff

def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (5, None, 5.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 9.0), (4, "d", 4.0), (5, None, 5.0)],
        "id long, s string, v double",
    )
    rows = snapshot_diff(old, new, ["id"], ["s", "v"]).collect()
    got = {r.id: r.change_type for r in rows}
    # id=2 and id=5 are unchanged (5 has a null attr on both sides —
    # null-safe equality keeps it out of the diff)
    assert got == {1: "delete", 3: "update", 4: "insert"}
    upd = next(r for r in rows if r.id == 3)
    assert (upd.old_v, upd.new_v) == (3.0, 9.0)
    assert (upd.old_s, upd.new_s) == ("c", "c")


def test_snapshot_diff_null_transitions(spark):
    # value → null and null → value must both classify as updates
    old = spark.createDataFrame([(1, "x"), (2, None)], "id long, s string")
    new = spark.createDataFrame([(1, None), (2, "y")], "id long, s string")
    got = {r.id: r.change_type for r in snapshot_diff(old, new, ["id"], ["s"]).collect()}
    assert got == {1: "update", 2: "update"}


def test_snapshot_diff_composite_key(spark):
    old = spark.createDataFrame([(1, 1, 10.0), (1, 2, 20.0)], "a long, b long, v double")
    new = spark.createDataFrame([(1, 1, 10.0), (2, 1, 30.0)], "a long, b long, v double")
    got = {(r.a, r.b): r.change_type
           for r in snapshot_diff(old, new, ["a", "b"], ["v"]).collect()}
    assert got == {(1, 2): "delete", (2, 1): "insert"}


# ---------------------------------------------------------------- scd2

def test_scd2_intervals_runs_and_current(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, "x"), (1, 2, "x"), (1, 3, "y"), (1, 4, "y"), (1, 5, "x"),
            (2, 1, None), (2, 2, None), (2, 3, "z"),
        ],
        "uid long, t long, state string",
    )
    rows = (
        scd2_intervals(ev, "uid", "t", ["state"])
        .orderBy("uid", "valid_from")
        .collect()
    )
    got = [(r.uid, r.state, r.valid_from, r.valid_to, r.is_current) for r in rows]
    assert got == [
        (1, "x", 1, 3, False),
        (1, "y", 3, 5, False),
        (1, "x", 5, None, True),
        (2, None, 1, 3, False),  # first sighting opens even with null attr
        (2, "z", 3, None, True),
    ]


def test_scd2_single_exchange(spark):
    ev = spark.createDataFrame([(1, 1, "x"), (1, 2, "y")], "uid long, t long, s string")
    out = scd2_intervals(ev, "uid", "t", ["s"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lag-detect, filter, and lead-close all reuse the uid partitioning
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------- bloom

def test_bloom_no_false_negatives(spark):
    dim = spark.range(0, 997, 7).toDF("k")
    fact = spark.range(0, 5000).toDF("fk")
    bf = bloom_build(dim, "k", num_bits=1 << 12, num_hashes=5)
    kept = {r.fk for r in bloom_probe(
        fact, bf, "fk", num_bits=1 << 12, num_hashes=5).collect()}
    assert set(range(0, 997, 7)) <= kept


def test_bloom_prejoin_equals_plain_join(spark):
    dim = spark.range(0, 300, 3).toDF("k").withColumn("tag", F.col("k") * 2)
    fact = spark.range(0, 2000).toDF("fk")
    pj = bloom_prejoin(fact, dim, "fk", "k", num_bits=1 << 12, num_hashes=5)
    plain = fact.join(dim, F.col("fk") == F.col("k"))
    assert sorted((r.fk, r.tag) for r in pj.collect()) == sorted(
        (r.fk, r.tag) for r in plain.collect()
    )


def test_bloom_probe_is_jvm_only(spark):
    dim = spark.range(10).toDF("k")
    fact = spark.range(100).toDF("fk")
    bf = bloom_build(dim, "k", num_bits=1 << 10, num_hashes=3)
    probed = bloom_probe(fact, bf, "fk", num_bits=1 << 10, num_hashes=3)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bloom_empty_dim_prunes_everything_safely(spark):
    dim = spark.range(0).toDF("k")
    fact = spark.range(50).toDF("fk")
    bf = bloom_build(dim, "k", num_bits=1 << 10, num_hashes=3)
    assert bloom_probe(fact, bf, "fk", num_bits=1 << 10, num_hashes=3).count() == 0


def test_apply_diff_roundtrip_on_testdata(spark):
    """apply_diff(old, snapshot_diff(old, new)) == new for the catalog's
    carved orders snapshots — the full CDC produce/consume cycle."""
    from replicadb_spark.operators import apply_diff
    from replicadb_spark.session import tables

    o = tables(spark, "/root/testdata/sf0.001", ("orders",))["orders"]
    old = o.where(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") - 5.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    new = o.where(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    keys, cmp_cols = ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    diff = snapshot_diff(old, new, keys, cmp_cols)
    rebuilt = apply_diff(old, diff, keys, cmp_cols)
    a = sorted(map(tuple, rebuilt.collect()))
    b = sorted(map(tuple, new.select(*keys, *cmp_cols).collect()))
    assert a == b


def test_apply_diff_roundtrip_with_nulls(spark):
    from replicadb_spark.operators import apply_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d")], "id long, s string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, "D"), (5, "e")], "id long, s string"
    )
    diff = snapshot_diff(old, new, ["id"], ["s"])
    rebuilt = apply_diff(old, diff, ["id"], ["s"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


# ---------------------------------------------------------------- drift union

def test_union_with_drift_widens_and_pads(spark):
    from replicadb_spark.operators.cdc import union_with_drift

    a = spark.createDataFrame([(1, 1.5)], "id int, v float")
    b = spark.createDataFrame([(2**40, 2.5, "x")], "id long, v double, s string")
    out = union_with_drift([a, b])
    assert dict(out.dtypes) == {"id": "bigint", "v": "double", "s": "string"}
    rows = {r.id: (r.v, r.s) for r in out.collect()}
    assert rows[1] == (1.5, None)
    assert rows[2**40] == (2.5, "x")


def test_union_with_drift_rejects_type_conflict(spark):
    import pytest
    from replicadb_spark.operators.cdc import union_with_drift

    a = spark.createDataFrame([(1,)], "c int")
    b = spark.createDataFrame([("x",)], "c string")
    with pytest.raises(TypeError, match="irreconcilable"):
        union_with_drift([a, b])


def test_union_with_drift_int_x_fractional_promotes_double(spark):
    # Spark's own precedence would pick float for int⋈float, corrupting
    # integers above 2^24; the lossless target is double (int32 ⊂ f64).
    from replicadb_spark.operators.cdc import union_with_drift

    a = spark.createDataFrame([(2**30 + 1,)], "v int")
    b = spark.createDataFrame([(0.5,)], "v float")
    out = union_with_drift([a, b])
    assert dict(out.dtypes) == {"v": "double"}
    assert sorted(r.v for r in out.collect()) == [0.5, float(2**30 + 1)]


def test_union_with_drift_bigint_x_fractional_refused_without_opt_in(spark):
    import pytest
    from replicadb_spark.operators.cdc import union_with_drift

    a = spark.createDataFrame([(2**60,)], "v long")
    b = spark.createDataFrame([(0.5,)], "v double")
    with pytest.raises(TypeError, match="2\\^53"):
        union_with_drift([a, b])
    out = union_with_drift([a, b], allow_lossy=True)
    assert dict(out.dtypes) == {"v": "double"}


def test_union_with_drift_no_shuffle(spark):
    from replicadb_spark.operators.cdc import union_with_drift

    a = spark.createDataFrame([(1, 1.0)], "id int, v double")
    b = spark.createDataFrame([(2,)], "id long")
    plan = union_with_drift([a, b])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_apply_changelog_last_wins_delete_and_resurrection(spark):
    from replicadb_spark.operators.cdc import apply_changelog

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
    )
    log = spark.createDataFrame(
        [
            # key 1: update then delete → gone
            (1, "a2", "update", 1),
            (1, None, "delete", 2),
            # key 2: delete then later update → resurrected with new value
            (2, None, "delete", 1),
            (2, "b3", "update", 3),
            # key 4: update on a key absent from the snapshot → upserts
            (4, "d", "update", 1),
            # key 5: plain insert
            (5, "e", "insert", 1),
        ],
        "id int, v string, op string, seq int",
    )
    got = {(r.id, r.v) for r in apply_changelog(snap, log, ["id"]).collect()}
    assert got == {(2, "b3"), (3, "c"), (4, "d"), (5, "e")}


def test_apply_changelog_empty_log_is_identity(spark):
    from replicadb_spark.operators.cdc import apply_changelog

    snap = spark.createDataFrame([(1, "a")], "id int, v string")
    log = spark.createDataFrame([], "id int, v string, op string, seq int")
    assert [(r.id, r.v) for r in apply_changelog(snap, log, ["id"]).collect()] == [
        (1, "a")
    ]
