"""Unit tests for the custom relational operators (as-of join, range
self-join) and IVF ANN — semantics pinned against tiny hand-built frames
plus recall checks the catalog's rows-only queries rely on."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.operators import asof_join, range_join_pairs


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = _df(
        spark,
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"), (2, "2024-01-01 10:00:00")],
        "k int, lt string",
    ).withColumn("lt", F.col("lt").cast("timestamp_ntz"))
    right = _df(
        spark,
        [
            (1, "2024-01-01 09:00:00", 100.0),
            (1, "2024-01-01 11:30:00", 200.0),
            (1, "2024-01-01 12:00:00", 300.0),  # exactly at left ts → visible
            (2, "2024-01-02 00:00:00", 999.0),  # after every left row → never
        ],
        "k int, rt string, price double",
    ).withColumn("rt", F.col("rt").cast("timestamp_ntz"))

    out = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt", payload=["price"]
    )
    got = {(r["k"], str(r["lt"])): r["price"] for r in out.collect()}
    assert got[(1, "2024-01-01 10:00:00")] == 100.0
    assert got[(1, "2024-01-01 12:00:00")] == 300.0
    assert got[(2, "2024-01-01 10:00:00")] is None  # no match → null payload


def test_asof_join_single_shuffle(spark):
    left = _df(spark, [(1, "2024-01-01 10:00:00")], "k int, lt string").withColumn(
        "lt", F.col("lt").cast("timestamp_ntz")
    )
    right = _df(spark, [(1, "2024-01-01 09:00:00", 1.0)], "k int, rt string, p double").withColumn(
        "rt", F.col("rt").cast("timestamp_ntz")
    )
    plan = (
        asof_join(left, right, on="k", left_ts="lt", right_ts="rt", payload=["p"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union + window, not a join: exactly one exchange, zero join nodes
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_range_join_pairs_matches_naive(spark):
    # events per key at t=0,100,250,600,650s — pairs within 300s:
    # (0,100),(0,250),(100,250),(600,650); crucially (250,600) spans a
    # bucket boundary gap of 350 → excluded, (100,250) crosses buckets.
    rows = [(7, i, f"2024-01-01 00:{m:02d}:{s:02d}") for i, (m, s) in enumerate(
        [(0, 0), (1, 40), (4, 10), (10, 0), (10, 50)]
    )]
    df = _df(spark, rows, "user_id int, event_id int, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    out = range_join_pairs(
        df, key="user_id", id_col="event_id", ts_col="ts", max_gap_seconds=300
    )
    got = {(r["id_a"], r["id_b"]): r["gap_s"] for r in out.collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 2), (3, 4)}
    assert got[(0, 1)] == 100.0 and got[(3, 4)] == 50.0


def test_range_join_equal_timestamps_once(spark):
    df = _df(
        spark,
        [(1, 10, "2024-01-01 00:00:00"), (1, 11, "2024-01-01 00:00:00")],
        "user_id int, event_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = range_join_pairs(
        df, key="user_id", id_col="event_id", ts_col="ts", max_gap_seconds=300
    ).collect()
    assert len(out) == 1 and (out[0]["id_a"], out[0]["id_b"]) == (10, 11)


def test_ann_ivf_recall_vs_exact(spark):
    from replicadb_spark.functions.similarity import ann_ivf, knn_bruteforce
    from replicadb_spark.session import tables

    e = tables(spark, "/root/testdata/sf0.001", ("embeddings",))["embeddings"]
    q = e.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(e, q, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_ivf(e, q, n_cells=16, n_probe=6, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"


def test_salted_join_matches_plain_join(spark):
    from replicadb_spark.operators import salted_join

    large = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(10)] + [(3, 0)],
        "k int, v int",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "warm")], "k int, name string")
    plain = large.join(small, "k").select("k", "v", "name")
    salted = salted_join(large, small, "k", salt=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # key 3 has no match and must vanish in inner join
    assert salted.where(F.col("k") == 3).count() == 0


def test_salted_join_left_outer(spark):
    from replicadb_spark.operators import salted_join

    large = spark.createDataFrame([(1, 1), (3, 3)], "k int, v int")
    small = spark.createDataFrame([(1, "x")], "k int, name string")
    out = salted_join(large, small, "k", salt=3, how="left").collect()
    got = {(r["k"], r["name"]) for r in out}
    assert got == {(1, "x"), (3, None)}


def test_connected_components_collapses_chains(spark):
    from replicadb_spark.operators import connected_components

    # two clusters: a 4-chain (1-2, 2-3, 3-4) that pairwise lists would
    # miss as one group, and an isolated pair (10-11)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    got = {r["vertex"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    from replicadb_spark.operators import connected_components

    # a 12-vertex path — needs multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["src", "dst"]
    )
    got = {r["vertex"]: r["component"]
           for r in connected_components(edges).collect()}
    assert set(got.values()) == {0} and len(got) == 12


# ---------------------------------------------------------------- ordering


def test_global_running_sum_matches_naive_window(spark):
    from pyspark.sql import Window
    from replicadb_spark.operators.ordering import global_running_sum

    rows = [(i * 7 % 997, (i * 13) % 50 + 1) for i in range(997)]  # unique keys
    df = _df(spark, rows, "k long, v long")

    got = {
        r["k"]: r["rt"]
        for r in global_running_sum(df, "k", "v", "rt", bucket_width=64).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r["k"]: r["rt"] for r in df.select("k", F.sum("v").over(w).alias("rt")).collect()}
    assert got == want


def test_pack_shards_budget_and_monotonicity(spark):
    from replicadb_spark.operators.ordering import pack_shards

    df = _df(spark, [(i, 10) for i in range(100)], "k long, cost long")
    out = pack_shards(df, "k", "cost", budget=25, bucket_width=16).orderBy("k").collect()
    # start-offset assignment: shards are contiguous, nondecreasing in key order
    shards = [r["shard"] for r in out]
    assert shards == sorted(shards)
    assert shards[0] == 0
    # each shard's total cost overshoots the budget by at most one row's cost
    from collections import Counter

    per = Counter()
    for r in out:
        per[r["shard"]] += r["cost"]
    assert all(tot <= 25 + 10 for tot in per.values())
    # every row accounted for exactly once
    assert sum(per.values()) == 100 * 10


def test_global_running_sum_wide_window_is_partitioned(spark):
    """The scale contract: the window over the FULL input must be
    partitioned by bucket; only the tiny bucket-totals window may run
    single-partition."""
    from replicadb_spark.operators.ordering import global_running_sum

    df = _df(spark, [(i, 1) for i in range(500)], "k long, v long")
    plan = (
        global_running_sum(df, "k", "v", bucket_width=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    wide_windows = [
        ln for ln in plan.splitlines() if re.search(r"\bWindow\b", ln) and "__btot" not in ln
    ]
    assert wide_windows, "expected a partition-local window over the input"
    assert all("__bucket" in ln for ln in wide_windows)


def test_chunk_overlap_reconstructs_documents(spark):
    """Stitching chunks (drop the 20-char overlap from every chunk after
    the first) must reproduce every document exactly — the invariant
    that makes overlap chunking lossless for training/RAG."""
    from replicadb_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    chunks = QUERIES["docs_chunk_overlap"](spark, sf).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    assert set(by_doc) == set(docs)
    for doc_id, parts in by_doc.items():
        parts.sort()
        rebuilt = parts[0][1] + "".join(p[20:] for _, p in parts[1:])
        assert rebuilt == docs[doc_id], doc_id


def test_global_rank_matches_window_and_avoids_global_sort(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from replicadb_spark.operators.ordering import global_rank
    from replicadb_spark.session import tables

    c = tables(spark, "/root/testdata/sf0.001", ("customer",))["customer"].select(
        "c_custkey", "c_acctbal"
    )
    got = global_rank(c, "c_acctbal", "c_custkey", bucket_width=500.0)
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    want = c.withColumn("rn", F.row_number().over(w))
    a = {r.c_custkey: r.global_rank for r in got.collect()}
    b = {r.c_custkey: r.rn for r in want.collect()}
    assert a == b
    # the big side never passes through a single-partition sort: the only
    # non-partitioned window runs over the tiny per-bucket totals frame
    plan = got._jdf.queryExecution().executedPlan().toString()
    # intra ranks are partitioned by bucket
    assert "Window [row_number()" in plan and "partitionBy" not in plan  # sanity
    assert "Exchange SinglePartition" in plan  # the tiny offsets frame only
    # negative balances land in negative buckets and still rank correctly
    assert min(b.values()) == 1 and max(b.values()) == c.count()


def test_interval_overlap_join_matches_naive(spark):
    from pyspark.sql import functions as F

    from replicadb_spark.operators.relational import interval_overlap_join

    rows = [
        # key, id, start, end
        (1, 1, 0.0, 10.0),
        (1, 2, 5.0, 15.0),    # overlaps 1
        (1, 3, 10.0, 20.0),   # touches 1 (boundary) and overlaps 2
        (1, 4, 100.0, 110.0), # far away
        (2, 5, 0.0, 10.0),    # other key: never pairs with key 1
        (2, 6, 9.5, 9.9),     # nested inside 5
    ]
    df = spark.createDataFrame(rows, "key long, id long, s double, e double")
    got = {
        (r.key, r.id_a, r.id_b)
        for r in interval_overlap_join(
            df, "key", "id", "s", "e", bucket_width=7.0
        ).collect()
    }
    naive = {
        (a[0], a[1], b[1])
        for a in rows
        for b in rows
        if a[0] == b[0] and a[1] < b[1] and a[2] <= b[3] and b[2] <= a[3]
    }
    assert got == naive
    assert (1, 1, 3) in got  # boundary touch counts as overlap
    assert (1, 1, 4) not in got


def test_key_skew_profile_orders_and_shares(spark):
    from replicadb_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    rows = key_skew_profile(df, "k", top=2).collect()
    assert [(r.key, r.cnt, r.share) for r in rows] == [("a", 6, 0.6), ("b", 3, 0.3)]


def test_dq_rules_engine_pass_fail_and_nulls(spark):
    """Null predicate rows fail their rule; unique() detects dup keys;
    thresholds separate pass from fail."""
    from replicadb_spark.operators import dq

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, None), (2, 20.0, "b"), (4, None, "c")],
        "id long, v double, s string",
    )
    report = dq.run_checks(
        df,
        [
            dq.not_null("s"),                       # 3/4
            dq.in_range("v", 0, 100),               # 2/4 (null + negative fail)
            dq.unique("id"),                        # 3 distinct / 4
            dq.satisfies("v_mostly_pos", F.col("v") > 0, min_ratio=0.5),  # 2/4 ≥ .5
        ],
    )
    got = {r["rule"]: (r["metric"], r["passed"]) for r in report.collect()}
    assert got["not_null(s)"] == (0.75, False)
    assert got["range(v)"] == (0.5, False)
    assert got["unique(id)"] == (0.75, False)
    assert got["v_mostly_pos"] == (0.5, True)


def test_dq_rules_single_aggregate_plan(spark):
    """All row rules compile into ONE aggregate over one scan (the
    Deequ property): no joins, no per-rule scans."""
    from replicadb_spark.operators import dq
    from replicadb_spark.session import tables

    o = tables(spark, "/root/testdata/sf0.001", ("orders",))["orders"]
    rules = [dq.not_null("o_custkey"), dq.in_set("o_orderstatus", ["O", "F", "P"])]
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(r.predicate, 1).otherwise(0)).alias(f"__c{i}")
        for i, r in enumerate(rules)
    ]
    plan = o.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") + plan.count("FileScan") >= 1
    assert "Join" not in plan


def test_dq_run_checks_is_one_driver_action(spark):
    """r17: uniqueness counts fold into the row-rule aggregate via a
    crossJoin of 1-row subtrees — the whole report is ONE collect()
    with no per-rule count() jobs. Pinned by forbidding count() for
    the duration of the call."""
    import unittest.mock as mock

    # the CLASSIC class — instances override count() there; a patch
    # on the pyspark.sql dispatch parent never fires (Spark 4)
    from pyspark.sql.classic.dataframe import DataFrame

    from replicadb_spark.operators import dq

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c")], "id long, s string"
    )

    def _boom(self):
        raise AssertionError("run_checks ran a per-rule count() job")

    with mock.patch.object(DataFrame, "count", _boom):
        report = dq.run_checks(
            df, [dq.not_null("s"), dq.unique("id"), dq.at_least(1)]
        )
    got = {r["rule"]: (r["metric"], r["passed"]) for r in report.collect()}
    assert got["unique(id)"] == (round(2 / 3, 6), False)
    assert got["not_null(s)"] == (1.0, True)
    assert got["at_least(1)"] == (1.0, True)


def test_dq_at_least_fails_empty_table(spark):
    """Per-row rules are vacuously green on an empty table; the count
    floor is the rule that catches a failed extraction."""
    from replicadb_spark.operators import dq

    empty = spark.createDataFrame([], "id long, v double")
    report = {
        r["rule"]: r["passed"]
        for r in dq.run_checks(
            empty, [dq.not_null("v"), dq.unique("id"), dq.at_least(1)]
        ).collect()
    }
    assert report["not_null(v)"] is True     # vacuous, documented
    assert report["unique(id)"] is True      # vacuous, documented
    assert report["at_least(1)"] is False    # the gate with teeth
