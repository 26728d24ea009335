"""Driver-contract smoke tests for __spark_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_entry_runs(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 45
    # every oracle key has a query
    assert set(oracles) <= set(qs)
    # every query is oracle-gated (the approximate sketches via recall-gate rows)
    assert set(qs) - set(oracles) == set()


def test_each_query_is_callable(spark, sf_dir):
    qs = entry.queries()
    # spot-check three cheap ones end-to-end at sf0.001
    for name in ("repl_scan_project_filter", "q1_pricing_summary", "text_stats"):
        df = qs[name](spark, sf_dir)
        assert df.count() > 0
