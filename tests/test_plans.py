"""Physical-plan assertions — the scale contract.

These tests pin the plan shapes that make the engine viable at 100 TB:
pushdown reaching the scan, dimensions broadcasting, partial aggregation,
and top-k avoiding global sorts. A regression here is a performance bug
even when results stay correct.
"""

import pytest

from replicadb_spark.plans.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def _final_plan(spark, name: str) -> str:
    """Plan string AFTER execution — AQE has re-planned and codegen has
    wrapped stages (the pre-execution adaptive plan shows neither)."""
    df = QUERIES[name](spark, SF)
    df.collect()  # count() would build a NEW plan; collect finalizes THIS one
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark):
    plan = _plan(spark, "repl_scan_project_filter")
    assert "PushedFilters: [" in plan and "IsNotNull(l_quantity)" in plan
    # pruned ReadSchema: only the 2 filter + 2 output columns are read
    assert "l_comment" not in plan
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"):
        assert col in schema_line
    assert "l_returnflag" not in schema_line


def test_q1_partial_aggregation(spark):
    plan = _final_plan(spark, "q1_pricing_summary")
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    # whole-stage codegen spans show as WholeStageCodegen / *(n) markers
    assert "WholeStageCodegen" in plan or "*(" in plan


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 4  # customer/supplier/nation/region
    # the only shuffle join is orders⋈lineitem (or AQE broadcasts it at tiny SF)
    assert plan.count("SortMergeJoin") <= 1


def test_global_topk_no_full_sort(spark):
    plan = _plan(spark, "global_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_window_topk_pushes_group_limit(spark):
    plan = _plan(spark, "window_top_customers")
    # Spark 3.5+/4.x WindowGroupLimit keeps per-partition heaps at k
    assert "WindowGroupLimit" in plan or "Window" in plan


def test_knn_corpus_never_shuffles_before_scoring(spark):
    # r17: scoring is ONE Arrow matmul kernel over corpus batches (the
    # query matrix rides the closure) — no join of any kind, and the
    # only exchanges are the degenerate-scan fanout and the final
    # ≤ k·partitions·|queries|-row ranking window
    plan = _plan(spark, "knn_bruteforce")
    assert "MapInPandas" in plan
    for join in ("BroadcastNestedLoopJoin", "SortMergeJoin",
                 "ShuffledHashJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert join not in plan


def test_q7_broadcasts_all_dimensions(spark):
    plan = _plan(spark, "q7_nation_volume")
    # customer/supplier/nation×2 broadcast; only orders⋈lineitem may shuffle
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") <= 1


def test_q18_single_lineitem_scan(spark):
    # r17: the HAVING aggregate IS the output sum — one lineitem scan,
    # one orderkey shuffle, no semi join, no second sum
    plan = _final_plan(spark, "q18_large_orders")
    assert "LeftSemi" not in plan
    assert "TakeOrderedAndProject" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("lineitem.parquet") == 1
    assert final.count("Exchange hashpartitioning") <= 1


def test_q10_topk_no_global_sort(spark):
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    # returnflag filter reaches the parquet scan
    assert "PushedFilters" in plan and "l_returnflag" in plan


def test_range_join_no_cartesian(spark):
    plan = _plan(spark, "range_join_event_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_build_side_replicates_not_shuffles(spark):
    plan = _plan(spark, "skew_salted_join")
    # the salted join keys on (key, salt); small side replicates via
    # explode and broadcasts — no shuffle join on the raw hot key
    assert "__salt" in plan
    assert "explode" in plan
    assert "BroadcastHashJoin" in plan
    # priority filter reaches the orders scan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


def test_clean_corpus_filters_reach_scan(spark):
    plan = _plan(spark, "clean_corpus_pipeline")
    # language filter pushes into parquet; ReadSchema prunes to 3 columns
    assert "EqualTo(lang,en)" in plan
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in schema_line and "text" in schema_line and "lang" in schema_line
    assert "n_chars" not in schema_line and "source" not in schema_line


def test_q6_zero_shuffle_full_pushdown(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    # all three predicates reach the parquet scan (toString truncates the
    # PushedFilters list, so pin the visible prefix + DataFilters); no
    # join, no hash shuffle
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)" in plan
    assert "DataFilters" in plan and "l_quantity" in plan
    assert "Exchange hashpartitioning" not in plan


def test_q19_disjunction_splits_to_both_scans(spark):
    plan = _plan(spark, "q19_disjunctive_revenue")
    # Catalyst derives per-side prefixes of the OR-of-ANDs: quantity
    # bounds push to lineitem, brand/size to part — BEFORE the join
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l for l in pushed)
    assert any("In(p_brand" in l for l in pushed)
    assert "BroadcastHashJoin" in plan  # 3-brand part side broadcasts


def test_q21_single_lineitem_shuffle_decorrelated(spark):
    plan = _final_plan(spark, "q21_waiting_suppliers")
    # exists/not-exists decorrelates into ONE order-grained
    # collect_set aggregate (r17); orderstatus filter reaches the
    # orders scan; the only hash exchanges are that aggregate and the
    # tiny final per-name count — no semi-join reshuffle, no
    # order-stats regroup
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "collect_set" in plan
    assert "TakeOrderedAndProject" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 2
    assert "LeftSemi" not in plan and "Window" not in plan


def test_chunk_and_redact_and_sample_no_shuffle(spark):
    """The three per-row pipeline ops (chunking, PII scrub, hash
    sampling) must stay narrow: zero exchanges at any scale."""
    for name in ("docs_chunk_overlap", "pii_redact_props", "sample_stratified_hash"):
        plan = _final_plan(spark, name)
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_ngram_topk_partial_agg_and_no_global_sort(spark):
    # AQE dumps Final + Initial plans; count shuffles in the Final only
    plan = _final_plan(spark, "ngram_topk_corpus").split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in plan  # top-20 never globally sorts
    # map-side partial aggregation before the single exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


def test_sliding_agg_single_shuffle_with_expand(spark):
    plan = _final_plan(spark, "events_sliding_agg").split("== Initial Plan ==")[0]
    assert "Expand" in plan  # ×2 hop-window expansion happens map-side
    assert plan.count("Exchange hashpartitioning") == 1


def test_q9_part_filter_pushed_and_single_fact_shuffle(spark):
    plan = _final_plan(spark, "q9_profit_by_nation").split("== Initial Plan ==")[0]
    # the %widget% predicate reaches the part parquet scan
    assert "StringContains(p_name,widget)" in plan
    # one orders⋈lineitem shuffle pair at most; dims broadcast at this SF
    assert plan.count("Exchange hashpartitioning") <= 2


def test_snapshot_diff_projects_before_join(spark):
    plan = _final_plan(spark, "snapshot_diff_orders").split("== Initial Plan ==")[0]
    # full-outer on the PK: one exchange per side, none after
    assert "FullOuter" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    # the scan reads only the 3 needed columns (projection pushdown)
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(len(s.split(",")) <= 3 for s in schemas), schemas


def test_bloom_prejoin_probe_stays_jvm(spark):
    plan = _final_plan(spark, "bloom_prejoin_revenue")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_single_corpus_shuffle_then_reduced_frames(spark):
    plan = _final_plan(spark, "tfidf_top_terms").split("== Initial Plan ==")[0]
    # r15: the reduced (doc, term, tf) frame is the persisted
    # term-frequency layout — the plan starts at its scan; the corpus
    # text is never re-tokenized (zero explode; documents is touched
    # only by the 1-row n_docs count, which reads doc_id alone)
    assert "tf_layout_" in plan
    assert "Generate explode" not in plan
    import re

    doc_schemas = re.findall(
        r"FileScan parquet[^\n]*documents[^\n]*ReadSchema: struct<([^>]*)>",
        plan,
    )
    assert all(s == "doc_id:bigint" for s in doc_schemas), doc_schemas
    # per-doc top-3 never global-sorts: rank window partitions by doc_id
    assert "Sort [doc_id" in plan or "doc_id" in plan  # window partition key present


def test_unigram_score_explode_runs_once(spark):
    plan = _final_plan(spark, "unigram_prob_score").split("== Initial Plan ==")[0]
    # r15: the layout scan replaces the explode+agg entirely
    assert "tf_layout_" in plan
    assert "Generate explode" not in plan
    assert "documents" not in plan


def test_novelty_no_self_join(spark):
    plan = _final_plan(spark, "docs_novelty_ratio").split("== Initial Plan ==")[0]
    # min-agg + join back: exactly one shingle-keyed exchange pair and
    # one doc-keyed exchange — never a shingle×shingle self-join
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_integrity_checks_read_keys_only(spark):
    plan = _final_plan(spark, "integrity_check_orders").split("== Initial Plan ==")[0]
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    # every scan reads exactly one key column — payload never moves
    assert schemas and all(len(s.split(",")) == 1 for s in schemas), schemas
    assert "CartesianProduct" not in plan


def test_range_split_points_no_data_global_sort(spark):
    plan = _final_plan(spark, "range_split_points").split("== Initial Plan ==")[0]
    # global_rank's only single-partition exchange carries the tiny
    # bucket-totals frame; the orders rows themselves never converge.
    # A rangepartitioning exchange on the VALUE column would betray a
    # full global sort of the data (the final 7-row orderBy(octile) is
    # the only rangepartitioning allowed):
    import re
    for m in re.findall(r"Exchange rangepartitioning\(([^)]*)\)", plan):
        assert "o_totalprice" not in m and "octile" in m, m


def test_shard_pack_tokens_codegen_count_no_data_convergence(spark):
    plan = _plan(spark, "shard_pack_tokens")
    # the BPE-ish token count must stay a JVM codegen projection
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "regexp_extract_all" in plan
    # the running total is the range-bucketed prefix sum: document rows
    # must never converge to one partition — every SinglePartition
    # exchange must sit under the bucket-totals window (its nearby plan
    # text references the __btot/__bucket machinery, never raw text)
    idx = 0
    found = 0
    while True:
        idx = plan.find("Exchange SinglePartition", idx + 1)
        if idx < 0:
            break
        found += 1
        ctx = plan[max(0, idx - 600): idx + 600]
        assert "__btot" in ctx or "__bucket" in ctx, ctx
        assert "text" not in ctx.split("ReadSchema")[0] or "__b" in ctx
    assert found >= 1  # the prefix-sum stage exists
    assert "CartesianProduct" not in plan


def test_heavy_hitters_sketch_shuffle_is_summary_sized(spark):
    # pre-execution plan: after execution AQE's empty-relation
    # propagation prunes the whole sketch subtree here (missed = 0 rows)
    plan = _plan(spark, "heavy_hitters_gate")
    # the mapInPandas summaries are the only Python stage, and the
    # exchange after it moves (key, est) summary rows, never raw events
    assert "ArrowEvalPython" not in plan  # mapInPandas shows as MapInPandas
    assert "MapInPandas" in plan


def test_basket_jaccard_equijoin_not_cartesian(spark):
    plan = _plan(spark, "basket_jaccard_customers")
    # pair generation must be the inverted-index equi-join on item —
    # never an all-pairs product — and the intersection count must
    # partial-aggregate before its exchange
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
    # r15: the capped basket derivation (orders⋈lineitem → distinct →
    # df-cap anti-join) lives in the per-(process, sf_dir) layout — the
    # QUERY plan starts at a parquet scan of the finished set frame and
    # never re-joins the base tables (the edge-layout precedent)
    assert "basket_sets_" in plan
    assert "orders" not in plan and "lineitem" not in plan


def test_shingle_similarity_reads_intersection_index(spark):
    """r15: dedup_containment and dedup_ngram_jaccard are arithmetic
    tails over the persisted (inter, sizes) intersection index — the
    query plans must start at the layout's parquet scans and never
    re-tokenize/re-shingle/re-aggregate the documents corpus."""
    for name in ("dedup_containment", "dedup_ngram_jaccard"):
        plan = _plan(spark, name)
        assert "shingle_inter_" in plan, name
        assert "documents" not in plan, name
        assert "Generate explode" not in plan, name
        assert "collect_list" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_triangle_wedge_join_is_equijoin(spark):
    plan = _plan(spark, "copurchase_triangles")
    # the only nested-loop joins are the bounded 1-row aggregate
    # crossJoins; wedge building and closure must both be equi-joins
    assert "CartesianProduct" not in plan
    # r13: the oriented edge list comes from the shared persisted
    # layout's parquet scan — the lineitem self-join never re-runs here
    assert "lineitem" not in plan
    assert "FileScan parquet" in plan


def test_fuzzy_match_blocks_on_hashed_signature(spark):
    plan = _plan(spark, "fuzzy_name_match")
    assert "CartesianProduct" not in plan
    # r14: the signature derivation (explode + xxhash64) lives in the
    # per-(process, sf_dir) layout — the QUERY plan starts at a scan
    # of pre-hashed 64-bit signatures, so no explode/hash/regex runs
    # per match invocation (the edge-layout precedent)
    assert "edit1_sigs_" in plan
    assert "xxhash64" not in plan
    assert "Generate explode" not in plan
    # r16: the layout is bucketed-and-sorted on sig with the df cap
    # applied at build — the self-join runs off co-located sorted
    # buckets with NO exchange and NO sort on sig, and the per-run
    # hot-signature groupBy/anti-join is gone
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning(sig" not in plan
    assert "Sort [sig" not in plan
    assert "LeftAnti" not in plan
    # exact verify stays JVM-side (codegen banded levenshtein, O(len)
    # threshold form), no Python eval
    assert "levenshtein" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the FastSS run-interval filter rides the join (r12): candidate
    # rows carry the deletion-run interval and incompatible positions
    # die on an integer compare before the levenshtein verify
    assert "lo#" in plan and "hi#" in plan


def test_interval_coalesce_single_key_shuffle_no_self_join(spark):
    plan = _plan(spark, "interval_coalesce_user")
    # gaps-and-islands form: windows + aggregate only — no join at all
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # one exchange feeds both windows (same key partitioning); the only
    # other exchange moves the already-aggregated island rows
    assert plan.count("Exchange hashpartitioning") <= 2


def test_gapfill_spine_is_generated_not_joined_from_calendar(spark):
    plan = _plan(spark, "timeseries_gapfill")
    # per-key date spine comes from explode(sequence(...)) — Generate —
    # not from a cartesian with a materialized calendar table
    assert "Generate" in plan
    assert "CartesianProduct" not in plan


def test_entropy_and_ols_fully_codegen_partial_agg(spark):
    for name in ("user_entropy_profile", "daily_trend_regression"):
        plan = _final_plan(spark, name)
        assert "HashAggregate" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "WholeStageCodegen" in plan or "*(" in plan


def test_bm25_filters_query_terms_before_tf_shuffle(spark):
    plan = _plan(spark, "bm25_keyword_search")
    # r15: both retrieval inputs are projections of the term-frequency
    # layout — the query-term IN filter reaches the layout's parquet
    # scan as a pushed filter (a 3-term query reads ~3 rows per
    # matching doc, never the corpus token stream), the corpus is
    # never re-tokenized, and no Python eval anywhere
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row stats
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "tf_layout_" in plan
    assert "Generate explode" not in plan
    assert "In(term, [hash,join,scan])" in plan, "IN filter must be pushed"


def test_edge_layout_ships_prejoined_linked_frame(spark, tmp_path):
    """r15: the edge layout persists the power-iteration input
    (linked/ = (u, v, deg) both directions) so pagerank/PPR never
    re-derive the out-union + degree join per run — pin that the
    frame exists, is exactly the union-both-ways join of edges and
    degrees, and is what read_edge_layout hands back. (The query-level
    plan can't be pinned here: pagerank_layout returns an eagerly
    checkpointed frame whose plan is an RDD scan.)"""
    from replicadb_spark.operators.graph import (
        read_edge_layout,
        write_edge_layout,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    path = str(tmp_path / "lay")
    write_edge_layout(edges, path)
    lay = read_edge_layout(spark, path)
    got = {(r["u"], r["v"], r["deg"]) for r in lay["linked"].collect()}
    deg = {r["v"]: r["deg"] for r in lay["deg"].collect()}
    und = [(r["a"], r["b"]) for r in lay["edges"].collect()]
    want = {(a, b, deg[a]) for a, b in und} | {(b, a, deg[b]) for a, b in und}
    assert got == want


def test_pagerank_short_loop_is_lazy_equijoins(spark):
    # a 3-iteration run stays one lazy DAG below the checkpoint cadence
    # (pagerank() itself adds ONE eager checkpoint at the boundary so
    # its internals can unpersist — pin the lazy builder underneath);
    # every rank propagation is an equi-join + hash aggregate
    from replicadb_spark.operators.graph import build_pagerank_plan

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .where(li.alias("a")["l_partkey"].isNotNull())
        .selectExpr("a.l_partkey as src", "b.l_partkey as dst")
        .where("src < dst")
    )
    cached = []
    try:
        ranks = build_pagerank_plan(edges, cached, iterations=3)
        plan = ranks._jdf.queryExecution().executedPlan().toString()
    finally:
        for f in cached:
            f.unpersist()
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" not in plan  # no checkpoint below the cadence
    assert plan.count("HashAggregate") >= 6  # partial+final per iteration


def test_quantile_sketch_sample_is_takeordered_no_full_sort(spark):
    plan = _plan(spark, "quantile_sketch_gate")
    # bottom-k on hash rank must be partial top-k, never a global Sort
    # of the data followed by Limit
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_hard_negative_label_filter_precedes_scoring(spark):
    plan = _plan(spark, "hard_negative_mining")
    # same-label candidates are dropped by a JVM filter before the
    # pandas partial-top-k reducer sees anything
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan


def test_bigram_is_window_free_map_side(spark):
    plan = _plan(spark, "bigram_logprob_score")
    # r17: bigrams form map-side from the token array (transform +
    # explode) — no per-doc window shuffle, no positional self-join
    assert "Window" not in plan
    assert "lead(" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "explode" in plan


def test_mad_medians_are_grouped_aggregates(spark):
    plan = _plan(spark, "mad_outliers_by_type")
    # both spread statistics must be real grouped median aggregates —
    # not a window/collect rewrite (Spark prints median as
    # percentile(x, 0.5, ...) in the physical plan)
    assert plan.count("percentile(") >= 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_growth_two_level_partial_agg(spark):
    """The (source, tok) count and the per-source rollup are both
    partial-aggregated (map-side combine collapses the token soup
    before the shuffle); no window operator anywhere."""
    plan = _final_plan(spark, "vocab_growth_by_source")
    assert plan.count("HashAggregate") >= 4  # partial+final at both levels
    assert "Window" not in plan


def test_twap_window_is_keyed_not_global(spark):
    """The lead() window must be partitioned by user_id — a global
    single-partition window here would serialize the corpus."""
    plan = _plan(spark, "twap_by_user")
    assert "Window" in plan
    assert "partitionBy=[user_id" in plan.replace(" ", "") or \
        "[user_id" in plan.split("Window", 1)[1].splitlines()[0]


def test_winsorized_cutoffs_broadcast_back(spark):
    """The per-type p05/p95 cutoff table joins back via broadcast —
    events never shuffle for the join (only for the two aggregates)."""
    plan = _plan(spark, "winsorized_stats_by_type")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_source_overlap_joins_digests_not_text(spark):
    """The self-join key is the md5 digest — the text column must not
    survive into the join (the scan may read it to hash it, but the
    join itself moves 32-byte digests)."""
    plan = _plan(spark, "source_overlap_matrix")
    joined = plan.split("Join", 1)[1].splitlines()[0]
    assert "h" in joined and "text" not in joined


def test_multigrain_rollup_expands_once(spark):
    """GROUPING SETS compiles to an Expand feeding one aggregate — not
    a Union of three per-grain scans of the fact table."""
    plan = _final_plan(spark, "time_multigrain_rollup")
    assert "Expand" in plan
    assert "Union" not in plan


def test_rolling_wau_contribution_explode_no_range_join(spark):
    """Sliding-distinct via contribution explode: a Generate (explode)
    feeds the per-day distinct — no inequality join anywhere. The ONE
    BroadcastNestedLoopJoin allowed is the 1-row max-day scalar attach
    (r17 opt pass 2: the corpus max day rides a broadcast 1-row
    aggregate instead of a construction-time collect) — a Cross of a
    1-row aggregate, not a data×data inequality join."""
    plan = _plan(spark, "rolling_wau")
    assert "Generate" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # the lone BNLJ is the scalar attach: Cross type, and its build
    # side is the 1-row max(d) aggregate
    assert "BuildRight, Cross" in plan
    assert "max(d" in plan


def test_attribution_windows_are_keyed(spark):
    """Two windows — the (user, ts) click tie-collapse and the as-of
    carry — both keyed by user_id (never global); no shuffle join of
    clicks against purchases."""
    plan = _plan(spark, "purchase_attribution")
    assert "SortMergeJoin" not in plan
    # "Window [" is the window operator node; "WindowGroupLimit" is the
    # rank-pushdown helper Spark inserts for the rn==1 tie-collapse
    assert plan.count("Window [") == 2
    for seg in plan.split("Window [")[1:]:
        assert "user_id" in seg.splitlines()[0]


def test_linear_attribution_is_equijoin_with_band_filter(spark):
    """The 7-day interval join keys on user_id (hash/merge equijoin);
    the time band is a join-condition filter, never a nested-loop
    cartesian."""
    plan = _plan(spark, "attribution_linear_credit")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pareto_windows_are_keyed_by_nation(spark):
    """Cumulative share windows partition by n_name — no global-order
    window over the part grain."""
    plan = _plan(spark, "revenue_pareto_cut")
    seg = plan.split("Window", 1)[1]
    assert "n_name" in seg.splitlines()[0]


def test_scd2_pit_windows_all_keyed_by_user(spark):
    """Version derivation + as-of carry: every window partitions by
    user_id; no shuffle join of probe against versions."""
    plan = _plan(spark, "scd2_point_in_time_join")
    assert "SortMergeJoin" not in plan
    assert plan.count("Window [") >= 2
    for seg in plan.split("Window [")[1:]:
        assert "user_id" in seg.splitlines()[0]


def test_knn_label_mrr_rides_broadcast_knn_plan(spark):
    """The eval layer must not change knn's scale shape: the r17 Arrow
    matmul kernel scores the corpus join-free (query matrix in the
    closure), label tables broadcast, corpus never sort-merge-joins."""
    plan = _plan(spark, "knn_label_mrr")
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunk_dedup_no_cartesian_and_partial_aggs(spark):
    """First-occurrence table and doc rebuild are partial-aggregated;
    the keep-join is an equijoin on the chunk, never a cartesian."""
    plan = _final_plan(spark, "chunk_dedup_rebuild")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 4


def test_feature_hash_single_aggregate_no_join(spark):
    """Feature hashing's whole point: no vocabulary table — one explode
    feeding one map-side-combined aggregate, zero joins."""
    plan = _final_plan(spark, "user_feature_hash")
    assert "Generate" in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_degree_profile_is_aggregate_cascade(spark):
    """The degree profile reads the shared persisted edge layout's
    degree table (r13): ONE aggregate level over a small parquet scan —
    the distinct/degree levels ran once in the layout build, amortized
    across the three co-purchase queries. No windows, no source-table
    re-scan."""
    plan = _final_plan(spark, "copurchase_degree_profile")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final on the deg scan
    assert "lineitem" not in plan  # the edge build never re-runs here
    assert "FileScan parquet" in plan  # input is the layout's deg table


def test_rfm_approx_gate_sketch_path_is_mergeable(spark):
    """The PROVEN scale path inside the gate: quintile cuts come from a
    partial+final percentile_approx aggregate (fixed-size mergeable
    state) broadcast to the scorer — not from any extra global sort.
    The only single-partition windows are the exact ntiles being gated
    against (3 of them, on the exact side)."""
    plan = _plan(spark, "rfm_approx_gate")
    assert "partial_percentile_approx" in plan
    assert "percentile_approx" in plan
    assert "BroadcastExchange" in plan  # 12 cut values ride a broadcast
    # exactly the 3 exact-side ntile windows, no global window creep
    assert plan.count("ntile(5)") == 3


def test_equidepth_split_gate_rank_path_is_partitioned(spark):
    """The PROVEN scale path: global_rank's row_number runs PARTITIONED
    by the range bucket (__b) — the full-data sort never collapses to
    one partition; the 7 split values broadcast as one collected array;
    bucket assignment is codegen comparisons (no HOF)."""
    plan = _plan(spark, "equidepth_split_gate")
    assert "windowspecdefinition(__b" in plan          # partitioned rank
    assert "collect_list" in plan                      # 7-value broadcast
    assert "BroadcastExchange IdentityBroadcastMode" in plan
    # the exact side's gated ntile is the ONLY full-data global window
    assert plan.count("ntile(8)") == 1


def test_basket_jaccard_shape_is_pinned(spark):
    """basket_jaccard_customers (the r10 driver bench flagged a
    2.76→4.0 s move here with no code change on the path — diagnosed
    round 11: steady-state quiet-host runs reproduce the r9 value, see
    ROUND11.md): pin the properties that make the inverted-index plan
    sound so a REAL plan flip can never hide behind host noise again.
    r15 shape: the capped basket is the BUCKETED-on-item layout table,
    so the pair self-join must be exchange-free AND sort-free (the
    persisted sortBy is reported per SPARK-28616's single-file check)
    — a SortMergeJoin straight off two co-partitioned bucket scans."""
    df = QUERIES["basket_jaccard_customers"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # inverted-index pair generation: an equi-join keyed on item,
    # reading the bucketed layout — never re-deriving the base tables
    assert "item" in plan
    assert "basket_sets_" in plan
    assert "orders" not in plan and "lineitem" not in plan
    # co-located buckets: NO shuffle exchange on item ever feeds the
    # self-join, and the persisted per-bucket sort means no Sort node
    # either (at sf0.001 AQE broadcast-converts the tiny join — the
    # invariant "never shuffled or sorted on item" holds in both the
    # broadcast and the at-scale zero-exchange SortMergeJoin shapes)
    assert "Exchange hashpartitioning(item" not in plan
    assert "Sort [item" not in plan
    assert "Bucketed: true" in plan
    # per-pair intersection is a partial-aggregated count, not a window
    assert plan.count("HashAggregate") >= 2
    # r17: set sizes ride the layout's n column through the pair
    # aggregate as grouping keys — the per-run size groupBy and both
    # post-aggregate size-join exchanges are GONE (no exchange keyed
    # on a bare id / id_a / id_b anywhere in the plan)
    assert "Exchange hashpartitioning(id," not in plan
    assert "Exchange hashpartitioning(id_a" not in plan
    assert "Exchange hashpartitioning(id_b" not in plan


def test_hybrid_rrf_legs_are_broadcast_equijoins(spark):
    plan = _plan(spark, "hybrid_rrf_search")
    # both retrieval legs equi-join (term / id); the only nested-loop
    # joins are the sanctioned 1-row stats/query-vector crossJoins
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # everything stays JVM-side — no Python eval anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_vocab_hash_broadcasts_not_per_occurrence(spark):
    plan = _plan(spark, "dsir_importance_weights")
    assert "CartesianProduct" not in plan
    # the interpreted poly hash runs on the DISTINCT vocabulary and is
    # broadcast back onto the token stream; the log-ratio table
    # broadcasts into the per-doc sum
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q2_part_predicate_below_the_offer_aggregate(spark):
    """q2_min_cost_supplier (VERDICT r15 item 3): per-part best price
    is independent across parts, so the PROMO/size part predicate must
    prune lineitem BEFORE the heavy (l_partkey, l_suppkey) offer
    aggregate — a broadcast semi-join against the filtered part keys
    as the aggregate's child. At 100 TB this is the difference between
    shuffling all of lineitem and the ~10x-pruned slice."""
    plan = _plan(spark, "q2_min_cost_supplier")
    # the part filter reaches the part parquet scan
    assert "EqualTo(p_type,PROMO)" in plan
    assert "LessThanOrEqual(p_size,10)" in plan
    # the semi-join sits BELOW the partial aggregate (top-down plan
    # text: the parent partial_min prints before its LeftSemi child)
    assert "LeftSemi" in plan
    assert plan.index("partial_min") < plan.index("LeftSemi")
    # one heavy exchange on the reduced offer rows; dimensions broadcast
    assert "SortMergeJoin" not in plan


def test_layout_builds_are_recorded_in_the_ledger(spark):
    """VERDICT r15 item 4: the bench headline amortizes layout builds
    out of the warm minimums, so every memoized layout build must
    leave an auditable (seconds, bytes) record for the sidecar."""
    from replicadb_spark.plans.catalog import LAYOUT_LEDGER

    QUERIES["fuzzy_name_match"](spark, SF).count()
    entry = LAYOUT_LEDGER.get(f"edit1_sigs:{SF}")
    assert entry is not None
    assert entry["build_seconds"] > 0
    assert entry["bytes"] > 0


def test_interleave_and_wau_construction_is_action_free(spark):
    """r17 (opt pass 2): curriculum_interleave's |sources| scalar and
    rolling_wau's corpus-max-day scalar both moved from construction-
    time driver actions into the plan (a windowed count on the tiny
    source-index frame; a broadcast 1-row max crossJoined into the
    explode) — building either query schedules NO Spark job."""
    import unittest.mock as mock

    from pyspark.sql.classic.dataframe import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError("query construction ran a driver action")

    with mock.patch.object(DataFrame, "count", _boom), \
         mock.patch.object(DataFrame, "collect", _boom), \
         mock.patch.object(DataFrame, "first", _boom):
        ci = QUERIES["curriculum_interleave"](spark, SF)
        wau = QUERIES["rolling_wau"](spark, SF)
    # the frames still compute correctly once an action DOES run
    rows = {r["doc_id"]: r["global_pos"] for r in ci.collect()}
    assert len(rows) == ci.count()
    assert wau.count() > 0


def test_advisor_and_setops_gate_are_one_driver_action(spark):
    """r17 (opt pass 2): join_strategy_advisor's build-side count and
    kmv_setops_gate's exact-side aggregate each fold into the query's
    single collect (crossJoin fold / tagged union), so construction
    runs exactly ONE driver action instead of two sequential jobs."""
    import unittest.mock as mock

    # patch the CLASSIC class — pyspark.sql.DataFrame is the dispatch
    # parent in Spark 4 and instances override collect/count on the
    # classic subclass, so a parent patch never fires
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"n": 0}
    real_collect = DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return real_collect(self)

    def _boom(self, *a, **k):
        raise AssertionError("construction ran a count()/first() job")

    for name in ("join_strategy_advisor", "kmv_setops_gate"):
        calls["n"] = 0
        with mock.patch.object(DataFrame, "collect", counting_collect), \
             mock.patch.object(DataFrame, "count", _boom), \
             mock.patch.object(DataFrame, "first", _boom):
            df = QUERIES[name](spark, SF)
        assert calls["n"] == 1, (name, calls["n"])
        assert df.count() == 1
