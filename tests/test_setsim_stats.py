"""Unit tests for the round-4 similarity/stats/graph/interval operators:
set_jaccard_pairs, edit1_pairs, entropy_by_key, groupwise_ols,
calendar_gapfill, interval_coalesce, triangle_count.

Hand-computable fixtures pin exact semantics; the sf0.01 oracle gate
(plans/catalog.py) covers the at-scale shapes.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from replicadb_spark.operators.graph import triangle_count
from replicadb_spark.operators.relational import interval_coalesce
from replicadb_spark.operators.setsim import edit1_pairs, set_jaccard_pairs
from replicadb_spark.operators.stats import (
    calendar_gapfill,
    entropy_by_key,
    groupwise_ols,
)


def test_set_jaccard_exact_values(spark):
    rows = [(1, i) for i in (10, 11, 12)] + [(2, i) for i in (10, 11, 13)] + [
        (3, 99)
    ]
    df = spark.createDataFrame(rows, "id int, item int")
    got = {
        (r.id_a, r.id_b): (r.inter, r.jaccard)
        for r in set_jaccard_pairs(df, "id", "item", threshold=0.0).collect()
    }
    # |{10,11,12} ∩ {10,11,13}| = 2, union = 4 → 0.5; id 3 shares nothing
    assert got == {(1, 2): (2, 0.5)}


def test_set_jaccard_duplicates_do_not_inflate(spark):
    rows = [(1, 10), (1, 10), (1, 10), (2, 10)]
    df = spark.createDataFrame(rows, "id int, item int")
    [r] = set_jaccard_pairs(df, "id", "item", threshold=0.0).collect()
    assert (r.inter, r.jaccard) == (1, 1.0)


def test_set_jaccard_hot_item_cap_drops_viral_item(spark):
    # item 7 is held by everyone (viral); with the cap it leaves the
    # universe, making ids 1/2 identical singletons {5} and id 3 empty
    rows = [(1, 7), (2, 7), (3, 7), (4, 7), (1, 5), (2, 5)]
    df = spark.createDataFrame(rows, "id int, item int")
    capped = set_jaccard_pairs(df, "id", "item", threshold=0.9, max_item_df=3)
    assert {(r.id_a, r.id_b) for r in capped.collect()} == {(1, 2)}


def test_edit1_substitution_insertion_deletion(spark):
    rows = [(1, "karin"), (2, "karen"), (3, "karen!"), (4, "aren"), (5, "zzzz")]
    df = spark.createDataFrame(rows, "id int, s string")
    got = {(r.id_a, r.id_b) for r in edit1_pairs(df, "id", "s").collect()}
    # karin~karen (sub), karen~karen! (insert), karen~aren (delete),
    # karin~aren is distance 2, zzzz matches nothing
    assert got == {(1, 2), (2, 3), (2, 4)}


def test_edit1_excludes_identical_strings(spark):
    df = spark.createDataFrame([(1, "same"), (2, "same")], "id int, s string")
    assert edit1_pairs(df, "id", "s").count() == 0


def test_edit1_sig_cap_neutralizes_viral_signature(spark):
    # 20 ids share the literal string "hub" (every signature of "hub"
    # is viral: df = 20 per deletion variant) plus one genuine near-miss
    # pair far from the hub. Uncapped, the hub's identity signature
    # alone yields 190 candidate pairs, all rejected by the verify
    # (s != s filter) — the cost is the quadratic bucket, not wrong
    # output. Capped at df <= 8 the hub signatures are dropped from the
    # index entirely and the true pair still survives on its own
    # non-viral signatures.
    rows = [(i, "hub") for i in range(1, 21)]
    rows += [(100, "karin"), (101, "karen")]
    df = spark.createDataFrame(rows, "id int, s string")
    capped = {
        (r.id_a, r.id_b)
        for r in edit1_pairs(df, "id", "s", max_sig_df=8).collect()
    }
    assert capped == {(100, 101)}
    # and the cap changes candidate GENERATION, not correctness of the
    # surviving pairs: uncapped finds the same true pair
    uncapped = {(r.id_a, r.id_b) for r in edit1_pairs(df, "id", "s").collect()}
    assert (100, 101) in uncapped


def test_entropy_uniform_and_degenerate(spark):
    rows = [("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"), ("v", "x"), ("v", "x")]
    df = spark.createDataFrame(rows, "k string, c string")
    got = {r.key: r for r in entropy_by_key(df, "k", "c").collect()}
    assert got["u"].entropy == 2.0  # uniform over 4 → log2(4)
    assert got["v"].entropy == 0.0  # single category
    assert got["u"].n_events == 4 and got["u"].n_categories == 4


def test_groupwise_ols_exact_line_and_degenerate(spark):
    # y = 3x + 1 exactly → slope 3, intercept 1, r² 1
    pts = [("g", float(x), 3.0 * x + 1) for x in range(5)] + [("one", 9.0, 9.0)]
    df = spark.createDataFrame(pts, "k string, x double, y double")
    got = {r.key: r for r in groupwise_ols(df, "k", "x", "y").collect()}
    assert (got["g"].slope, got["g"].intercept, got["g"].r2) == (3.0, 1.0, 1.0)
    assert got["one"].slope is None and got["one"].r2 is None


def test_calendar_gapfill_zero_fills_and_carries(spark):
    rows = [
        ("u", "2024-01-01", 10.0),
        ("u", "2024-01-01", 20.0),
        ("u", "2024-01-04", 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, d string, v double")
    out = {
        str(r.day): (r.n, r.filled)
        for r in calendar_gapfill(df, "k", "d", "v").collect()
    }
    assert out == {
        "2024-01-01": (2, 15.0),
        "2024-01-02": (0, 15.0),  # gap day: zero count, LOCF value
        "2024-01-03": (0, 15.0),
        "2024-01-04": (1, 7.0),
    }


def test_interval_coalesce_merges_touching_and_splits_gaps(spark):
    rows = [
        ("u", 1, 0.0, 10.0),
        ("u", 2, 5.0, 12.0),   # overlaps island 1
        ("u", 3, 12.0, 15.0),  # touches end exactly → same island
        ("u", 4, 20.0, 25.0),  # gap → new island
        ("w", 5, 0.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, id int, s double, e double")
    got = {
        (r.key, r.island): (r.island_start, r.island_end, r.n_intervals)
        for r in interval_coalesce(df, "k", "id", "s", "e").collect()
    }
    assert got == {
        ("u", 1): (0.0, 15.0, 3),
        ("u", 2): (20.0, 25.0, 1),
        ("w", 1): (0.0, 1.0, 1),
    }


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; plus a pendant edge and a duplicate/reversed
    # edge that must not change anything
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(3, 9), (1, 0), (2, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    [r] = triangle_count(df).collect()
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (5, 7, 4)


def test_triangle_count_hub_star_has_none(spark):
    star = [(0, i) for i in range(1, 30)]
    df = spark.createDataFrame(star, "src int, dst int")
    [r] = triangle_count(df).collect()
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (30, 29, 0)


def test_entropy_matches_math_log(spark):
    rows = [("k", "a")] * 3 + [("k", "b")] * 1
    df = spark.createDataFrame(rows, "k string, c string")
    [r] = entropy_by_key(df, "k", "c").collect()
    expect = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(r.entropy - round(expect, 6)) < 1e-9


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    from replicadb_spark.operators.graph import pagerank

    # path graph 0-1-2-3 plus a triangle 3-4-5-3 (undirected)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.vertex: r.rank for r in pagerank(df, iterations=3).collect()}

    n = 6
    adj = np.zeros((n, n))
    for a, b in edges:
        adj[a, b] = adj[b, a] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        r = 0.15 / n + 0.85 * (adj.T @ (r / deg))
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-12, (v, got[v], r[v])
    # normalization is preserved: total mass stays 1 (no dangling loss)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_triangle_strategies_agree(spark):
    from replicadb_spark.operators.graph import triangle_count

    import random

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    df = spark.createDataFrame(edges, "src int, dst int")
    a = triangle_count(df, strategy="broadcast_adj").first()
    b = triangle_count(df, strategy="wedge_shuffle").first()
    assert (a.n_vertices, a.n_edges, a.n_triangles) == (
        b.n_vertices, b.n_edges, b.n_triangles,
    )
    assert a.n_triangles > 0


def test_bottomk_sample_deterministic_and_sized(spark):
    from replicadb_spark.operators.quantiles import bottomk_sample

    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("value")
    )
    a = bottomk_sample(df, "id", k=256, keep=["value"]).collect()
    b = bottomk_sample(df, "id", k=256, keep=["value"]).collect()
    assert len(a) == 256
    assert sorted(r["__rk"] for r in a) == sorted(r["__rk"] for r in b)


def test_bottomk_quantile_estimates_within_rank_bound(spark):
    from replicadb_spark.operators.quantiles import (
        bottomk_sample,
        quantile_estimates,
    )

    # values 0..9999 uniformly: true quantile q is ~10000q; the k=1024
    # sketch must land within 5% rank error (theory: ~1.5/sqrt(k)≈4.7%)
    df = spark.range(10000).select("id", F.col("id").cast("double").alias("value"))
    s = bottomk_sample(df, "id", k=1024, keep=["value"])
    ests = {r.q: r.est for r in
            quantile_estimates(s, "value", quantiles=[0.25, 0.5, 0.9]).collect()}
    for q, est in ests.items():
        assert abs(est / 10000.0 - q) <= 0.05, (q, est)


def test_hard_negatives_exclude_same_label(spark):
    from replicadb_spark.functions.similarity import knn_bruteforce

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.99, 0.1], "a"),   # same label: nearest but must be excluded
        (2, [0.9, 0.2], "b"),
        (3, [0.0, 1.0], "b"),
    ]
    e = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label string")
    out = knn_bruteforce(
        e, e.where(F.col("vec_id") == 0), k=2,
        label_col="label", exclude_same_label=True,
    ).collect()
    assert [r.neighbor_id for r in out] == [2, 3]


def test_pagerank_checkpoint_cadence_preserves_values(spark):
    import numpy as np

    from replicadb_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r.vertex: r.rank
        for r in pagerank(df, iterations=6, checkpoint_every=2).collect()
    }
    n = 6
    adj = np.zeros((n, n))
    for a, b in edges:
        adj[a, b] = adj[b, a] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(6):
        r = 0.15 / n + 0.85 * (adj.T @ (r / deg))
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-12


def test_groupwise_ols_constant_y_matches_regr_r2(spark):
    from replicadb_spark.operators.stats import groupwise_ols

    pts = [("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0)]
    df = spark.createDataFrame(pts, "k string, x double, y double")
    [r] = groupwise_ols(df, "k", "x", "y").collect()
    # DuckDB/Postgres regr_* contract: horizontal line is a perfect fit
    assert (r.slope, r.intercept, r.r2) == (0.0, 5.0, 1.0)


def _persistent_rdd_ids(spark):
    return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()}


def test_graph_ops_leave_no_lingering_cache(spark):
    # composing graph operators in a long-lived session must not
    # accumulate cached edge frames (r4 verdict): triangle_count leaves
    # NOTHING cached (its one-row result is re-created locally);
    # pagerank's only surviving blocks are the returned ranks
    # checkpoint, released with the frame
    from replicadb_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    before = _persistent_rdd_ids(spark)

    tri = triangle_count(edges)
    assert tri.collect()[0].n_triangles == 1
    after_tri = _persistent_rdd_ids(spark) - before
    assert after_tri == set(), f"triangle_count leaked cached RDDs: {after_tri}"

    ranks = pagerank(edges, iterations=2)
    assert ranks.count() == 4
    leaked = _persistent_rdd_ids(spark) - before
    # at most the returned frame's own localCheckpoint blocks survive
    assert len(leaked) <= 1, f"pagerank leaked internal caches: {leaked}"


def test_triangle_strategies_agree_on_triangle_free_graph(spark):
    from replicadb_spark.operators.graph import triangle_count

    df = spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int")
    a = triangle_count(df, strategy="broadcast_adj").first()
    b = triangle_count(df, strategy="wedge_shuffle").first()
    assert a.n_triangles == b.n_triangles == 0


def test_quantile_estimates_ignore_nulls(spark):
    from replicadb_spark.operators.quantiles import (
        bottomk_sample,
        quantile_estimates,
    )

    df = spark.range(1000).select(
        "id",
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("value"),
    )
    s = bottomk_sample(df, "id", k=512, keep=["value"])
    ests = {r.q: r.est for r in
            quantile_estimates(s, "value", quantiles=[0.5]).collect()}
    assert ests[0.5] is not None
    assert abs(ests[0.5] / 1000.0 - 0.5) <= 0.1


def test_quantile_estimates_construction_is_action_free(spark):
    """r17: the sample size is folded into the plan (count window +
    rank target in the join condition), so building the estimates
    frame schedules NO Spark job — the caller's single action computes
    the whole thing. Pinned by constructing against a source whose
    evaluation would blow up if any action ran at build time."""
    # the CLASSIC class — instances override count/collect/first there;
    # a patch on the pyspark.sql dispatch parent never fires (Spark 4)
    from pyspark.sql.classic.dataframe import DataFrame

    from replicadb_spark.operators.quantiles import (
        bottomk_sample,
        quantile_estimates,
    )

    df = spark.range(5000).select("id", F.col("id").cast("double").alias("value"))
    s = bottomk_sample(df, "id", k=256, keep=["value"])

    import unittest.mock as mock

    def _boom(self):
        raise AssertionError("quantile_estimates ran a driver action at construction")

    with mock.patch.object(DataFrame, "count", _boom), \
         mock.patch.object(DataFrame, "collect", _boom), \
         mock.patch.object(DataFrame, "first", _boom):
        ests = quantile_estimates(s, "value", quantiles=[0.25, 0.5, 0.9])
    got = {r.q: r.est for r in ests.collect()}
    for q, est in got.items():
        assert abs(est / 5000.0 - q) <= 0.1, (q, est)


def test_pca_recovers_planted_low_rank_structure(spark):
    import numpy as np

    from replicadb_spark.functions.decomposition import (
        covariance_stats,
        pca_components,
        pca_project,
    )

    # 300 points exactly in a 2-D plane of 6-D space: eigenvalues 3..k
    # must vanish and the 2-D projection must preserve all variance
    rng = np.random.RandomState(11)
    basis = np.linalg.qr(rng.randn(6, 2))[0]
    coords = rng.randn(300, 2) * np.array([3.0, 1.0])
    pts = coords @ basis.T + 5.0
    rows = [(i, [float(x) for x in pts[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    n, mean, cov = covariance_stats(df, "embedding")
    assert n == 300
    assert np.abs(mean - pts.mean(axis=0)).max() < 1e-9
    comps, vals = pca_components(cov, 2)
    assert vals[0] > vals[1] > 1e-6
    assert abs(vals[2:].sum()) < 1e-9          # rank-2 exactly
    assert abs(vals.sum() - np.trace(cov)) < 1e-9

    proj = {r.id: np.asarray(r.proj) for r in
            pca_project(df, "embedding", id_col="vec_id", m=2).collect()}
    p = np.stack([proj[i] for i in range(300)])
    # projection is an isometry of the centered data restricted to the
    # plane: pairwise distances survive
    c = pts - pts.mean(axis=0)
    for a, b in ((0, 1), (5, 17), (100, 250)):
        d_orig = np.linalg.norm(c[a] - c[b])
        d_proj = np.linalg.norm(p[a] - p[b])
        assert abs(d_orig - d_proj) < 1e-9


def test_chi2_zero_for_exactly_independent_table(spark):
    from replicadb_spark.operators.stats import chi2_independence

    # counts exactly proportional across rows → chi2 must be 0
    rows = (
        [("a", 0)] * 20 + [("a", 1)] * 10
        + [("b", 0)] * 40 + [("b", 1)] * 20
    )
    df = spark.createDataFrame(rows, "t string, h int")
    [r] = chi2_independence(df, "t", "h").collect()
    assert (r.n_cells, r.dof, r.chi2) == (4, 1, 0.0)


def test_chi2_known_value_dependent_table(spark):
    from replicadb_spark.operators.stats import chi2_independence

    # classic 2x2: perfectly dependent 10/0 // 0/10 → chi2 = N = 20
    rows = [("a", 0)] * 10 + [("b", 1)] * 10
    df = spark.createDataFrame(rows, "t string, h int")
    [r] = chi2_independence(df, "t", "h").collect()
    assert (r.n_cells, r.dof, r.chi2) == (4, 1, 20.0)  # dense grid incl. empty cells


def test_mad_outliers_hand_computed(spark):
    from replicadb_spark.operators.stats import mad_outlier_profile

    # values 1..9 plus a wild 1000: med=5.5, MAD=median(|x-5.5|)=
    # median(4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,994.5)=2.5,
    # cutoff 3.5*1.4826*2.5≈12.97 → only 1000 is an outlier
    rows = [("k", float(v)) for v in list(range(1, 10)) + [1000]]
    df = spark.createDataFrame(rows, "t string, v double")
    [r] = mad_outlier_profile(df, "t", "v").collect()
    assert (r.med, r.mad, r.n_outliers) == (5.5, 2.5, 1)


def test_mad_approx_estimator_matches_exact_rule(spark):
    from replicadb_spark.operators.stats import mad_outlier_profile

    # the sketch path (percentile_approx) returns an OBSERVED value, so
    # on an odd-count key the exact interpolated median is that same
    # observed value and the whole profile agrees exactly; the outlier
    # decision rule is estimator-agnostic either way
    rows = [("k", float(v)) for v in list(range(1, 10)) + [1000, 2000]]
    df = spark.createDataFrame(rows, "t string, v double")
    [ex] = mad_outlier_profile(df, "t", "v").collect()
    [ap] = mad_outlier_profile(df, "t", "v", approx=True).collect()
    assert (ex.med, ex.mad, ex.n_outliers) == (6.0, 3.0, 2)
    assert (ap.med, ap.mad, ap.n_outliers) == (ex.med, ex.mad, ex.n_outliers)


def test_bigram_logprob_prefers_repeated_bigrams(spark):
    from replicadb_spark.functions.text import bigram_logprob

    rows = [
        (1, "a b a b a b a b"),   # one dominant bigram pattern
        (2, "a q b z a p b r"),   # same unigrams, unseen-once bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.id: r for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert got[1].n_bigrams == 7 and got[2].n_bigrams == 7
    # the fluent (repetitive) doc must score strictly higher
    assert got[1].avg_logprob > got[2].avg_logprob


def test_tfidf_cosine_hand_computed_and_capped(spark):
    from replicadb_spark.operators.setsim import tfidf_cosine_pairs

    rows = [
        (1, "apple banana"),
        (2, "apple banana"),   # exact dup of 1
        (3, "apple cherry"),   # shares only 'apple' with 1/2
        (4, "zebra yak"),      # shares nothing
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # uncapped, low threshold: dup pair at 1.0; the apple-only pairs at
    # ln(4/3)^2 / (|w1|·|w3|) ≈ 0.0779
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.05).collect()
    }
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 3)] - 0.0779) < 1e-4 and abs(got[(2, 3)] - 0.0779) < 1e-4
    assert len(got) == 3
    # df cap at 2 drops 'apple' (df=3) from the space entirely: the
    # apple-only pairs vanish, the dup pair survives on 'banana'
    capped = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=0.05, max_term_df=2
        ).collect()
    }
    assert capped == {(1, 2): 1.0}
    # fractional form of the same cap (0.5·N = 2)
    frac = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=0.05, max_term_df_frac=0.5
        ).collect()
    }
    assert frac == capped


def test_cusum_profile_alerts_on_planted_shift(spark):
    """A mean shift of +3 after index 30 must alert on the shifted key
    and stay silent on the stable one; the fold matches a sequential
    python reference exactly."""
    from replicadb_spark.operators.stats import cusum_profile

    rows = []
    for i in range(90):
        rows.append((i, "drift", 10.0 + (3.0 if i >= 30 else 0.0)))
        rows.append((i, "stable", 10.0))
    df = spark.createDataFrame(rows, "seq long, k string, v double")
    got = {
        r["key"]: r
        for r in cusum_profile(
            df, "k", "v", order_cols=["seq"], target=10.0,
            slack=0.5, threshold=20.0,
        ).collect()
    }

    def ref(vals):
        s = mx = 0.0
        alerts = 0
        for x in vals:
            s = max(0.0, s + (x - 10.0 - 0.5))
            mx = max(mx, s)
            if s > 20.0:
                alerts += 1
                s = 0.0
        return alerts, mx, s

    a, mx, fs = ref([13.0 if i >= 30 else 10.0 for i in range(90)])
    assert got["drift"]["n_alerts"] == a > 0
    assert abs(got["drift"]["max_s"] - mx) < 1e-12
    assert abs(got["drift"]["final_s"] - fs) < 1e-12
    assert got["stable"]["n_alerts"] == 0 and got["stable"]["max_s"] == 0.0


def test_edit2_pairs_brute_force_equivalence(spark):
    """edit2_pairs == brute-force levenshtein ≤ 2 on a corpus mixing
    substitutions, transpositions (= delete+insert), double typos, and
    clear non-matches — including the d=2 pairs edit1 must NOT see."""
    from replicadb_spark.operators.setsim import edit2_pairs

    rows = [
        (1, "karin"), (2, "karen"), (3, "karen!"), (4, "aren"),
        (5, "zzzz"), (6, "krane"), (7, "kaern"), (8, "marens"),
        (9, "ab"), (10, "ba"), (11, ""),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    strs = dict(rows)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b, lev(strs[a], strs[b]))
        for a in strs
        for b in strs
        if a < b and strs[a] != strs[b] and 1 <= lev(strs[a], strs[b]) <= 2
    }
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit2_pairs(df, "id", "s").collect()
    }
    assert got == want
    # sanity: the transposition pair (ab, ba) is d=2 and present
    assert (9, 10, 2) in got


def test_edit2_sig_cap_and_identical_exclusion(spark):
    from replicadb_spark.operators.setsim import edit2_pairs

    df = spark.createDataFrame(
        [(1, "same"), (2, "same")], "id int, s string"
    )
    assert edit2_pairs(df, "id", "s").count() == 0
    # a viral signature shared by every row is dropped by the cap;
    # here EVERY variant is shared, so the cap kills all candidates
    many = spark.createDataFrame(
        [(i, "aaaa") for i in range(30)] + [(99, "aaab")],
        "id int, s string",
    )
    assert edit2_pairs(many, "id", "s", max_sig_df=5).count() == 0


def test_edit2_refuses_unblocked_large_input(spark):
    """r13 (VERDICT r12 item 7): depth-2 FastSS on an unblocked frame
    above the row limit refuses loudly instead of silently launching a
    len²/2-signature join; the capped shape, an explicit higher limit,
    and the disabled guard all still run."""
    import pytest

    from replicadb_spark.operators.setsim import edit2_pairs

    big = spark.range(600).selectExpr(
        "id", "concat('name', cast(id as string)) AS s"
    )
    with pytest.raises(ValueError, match="refused.*max_sig_df"):
        edit2_pairs(big, "id", "s", unblocked_row_limit=500).collect()
    # capped shape: allowed at any size
    assert edit2_pairs(
        big, "id", "s", max_sig_df=64, unblocked_row_limit=500
    ).count() >= 0
    # explicit intent: raise or disable the guard
    assert edit2_pairs(big, "id", "s", unblocked_row_limit=1000).count() >= 0
    assert edit2_pairs(big, "id", "s", unblocked_row_limit=None).count() >= 0
