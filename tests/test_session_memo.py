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
