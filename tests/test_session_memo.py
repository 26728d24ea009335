"""Pins for the per-session tables() memo (r17 optimization round).

tables() memoizes the lazy base-table DataFrames per (session, sf_dir)
— a plan-object reuse that caches zero rows — and tracks which sf_dir
each base-table temp view currently points at so alternating sf_dirs
re-register correctly. These pins hold the two contracts the memo must
keep: identity reuse (the ~100 ms/table footer read is paid once) and
view correctness across sf_dir switches (the bug a naive memo would
introduce)."""

from __future__ import annotations

from replicadb_spark.session import tables

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_tables_memoizes_dataframes_per_session_and_sfdir(spark):
    a = tables(spark, SF001, ("orders", "nation"))
    b = tables(spark, SF001, ("orders",))
    assert a["orders"] is b["orders"], "same (session, sf_dir, name) must reuse the plan object"
    c = tables(spark, SF01, ("orders",))
    assert c["orders"] is not a["orders"], "different sf_dir must load its own frame"


def test_tables_reregisters_views_when_sfdir_changes(spark):
    tables(spark, SF001, ("orders",))
    n_small = spark.sql("SELECT count(*) FROM orders").collect()[0][0]
    tables(spark, SF01, ("orders",))
    n_mid = spark.sql("SELECT count(*) FROM orders").collect()[0][0]
    # sf0.01 has 10x the orders of sf0.001 — the view must follow the
    # last-requested sf_dir, not the memoized first one
    assert n_mid > n_small
    tables(spark, SF001, ("orders",))
    assert spark.sql("SELECT count(*) FROM orders").collect()[0][0] == n_small


def test_tables_timestamp_conversion_survives_memo(spark):
    # the nanos→TimestampNTZ conversion is applied at first load and
    # must still be present on the memoized frame
    o = tables(spark, SF001, ("orders",))["orders"]
    assert dict(o.dtypes)["o_orderdate"] == "timestamp_ntz"
    o2 = tables(spark, SF001, ("orders",))["orders"]
    assert dict(o2.dtypes)["o_orderdate"] == "timestamp_ntz"


def test_read_parquet_memo_reuses_plan_per_session_and_path(spark, tmp_path):
    # r18: layout consumers read immutable per-process parquet dirs
    # through read_parquet_memo — repeat opens must return the SAME
    # lazy plan object (zero rows cached, footer read paid once),
    # while distinct paths load their own frames.
    from replicadb_spark.session import read_parquet_memo

    p1 = str(tmp_path / "a")
    p2 = str(tmp_path / "b")
    spark.range(5).write.parquet(p1)
    spark.range(7).write.parquet(p2)
    a = read_parquet_memo(spark, p1)
    b = read_parquet_memo(spark, p1)
    c = read_parquet_memo(spark, p2)
    assert a is b, "same (session, path) must reuse the plan object"
    assert a is not c, "different path must load its own frame"
    assert a.count() == 5 and c.count() == 7


def test_edge_layout_memoized_per_session_and_path(spark, tmp_path):
    # r18: read_edge_layout memoizes opened layouts — the marker read
    # and per-frame footer reads are paid once per (session, path).
    from replicadb_spark.operators.graph import (
        read_edge_layout,
        write_edge_layout,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    path = str(tmp_path / "lay")
    write_edge_layout(edges, path)
    lay1 = read_edge_layout(spark, path)
    lay2 = read_edge_layout(spark, path)
    assert lay1 is lay2, "repeat opens must return the memoized layout"
    assert lay1["oriented"] is lay2["oriented"]
    assert lay1["n_vertices"] == 3 and lay1["m"] == 3
