"""Distributed statistical profiles: per-group Shannon entropy,
closed-form per-group OLS trend lines, and calendar gap-filling with
last-observation-carried-forward.

All three are pure DataFrame compositions — no UDFs, fully inside
whole-stage codegen — because each reduces to sums/windows:

- ``entropy_by_key``: H = log(T) - Σ n·log(n) / T over the category
  counts. Two hash aggregates (key×category, then key), both map-side
  partial; no windows, no collect.
- ``groupwise_ols``: slope/intercept/r² from the five classic sums
  (Σx, Σy, Σxy, Σx², Σy²) — ONE aggregate per group, map-side partial,
  the textbook closed form; never materializes per-point residuals.
- ``calendar_gapfill``: per-key date spine via ``sequence(min_day,
  max_day)`` + explode, left-join of observed days, zero-fill counts
  and carry values forward with a ``last(ignorenulls)`` window. The
  spine explode is bounded by each key's day span (not the corpus
  size), and the window rides the same key partitioning the join used.

The reference engine computes no statistics (it is a replicator —
SURVEY.md §1); these belong to the training-data/quality surface, next
to table_profile/value_histogram in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replicadb_spark.cache import tracked_persist


def entropy_by_key(
    df: DataFrame,
    key_col: str,
    category_col: str,
    *,
    base2: bool = True,
) -> DataFrame:
    """Shannon entropy of the category distribution within each key:
    (key, n_events, n_categories, entropy). Entropy is in bits when
    ``base2`` (default), nats otherwise, rounded to 6 decimals for
    stable cross-engine hashing.
    """
    counts = df.groupBy(
        F.col(key_col).alias("key"), F.col(category_col).alias("cat")
    ).agg(F.count(F.lit(1)).alias("n"))
    log_base = F.log(2.0, F.col("t").cast("double")) if base2 else F.log("t")
    per_key = counts.groupBy("key").agg(
        F.sum("n").alias("t"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(
            F.col("n").cast("double")
            * (F.log2("n") if base2 else F.log(F.col("n").cast("double")))
        ).alias("sum_nlogn"),
    )
    return per_key.select(
        F.col("key"),
        F.col("t").alias("n_events"),
        "n_categories",
        F.round(log_base - F.col("sum_nlogn") / F.col("t"), 6).alias("entropy"),
    )


def groupwise_ols(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key simple linear regression y = slope·x + intercept via the
    closed-form sums: (key, n_points, slope, intercept, r2), floats
    rounded to 6 decimals. Degenerate keys (single point or zero x
    variance) return null slope/intercept/r2 — the same contract as
    SQL's regr_slope.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    s = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n_points").cast("double")
    cov_n = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx_n = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary_n = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = F.when(varx_n > 0, cov_n / varx_n)
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    # regr_r2 contract (verified on DuckDB): constant y with varying x
    # is a perfect horizontal fit → 1.0; constant x → null like slope
    r2 = F.when(
        (varx_n > 0) & (vary_n > 0), (cov_n * cov_n) / (varx_n * vary_n)
    ).when((varx_n > 0) & (vary_n <= 0), F.lit(1.0))
    return s.select(
        "key",
        "n_points",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def chi2_independence(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Pearson chi-square independence statistic for the two
    categorical columns: ONE row (n_cells, dof, chi2) with chi2 rounded
    to 6 decimals.

    The statistic runs over the DENSE |a|×|b| grid — an observed-cells-
    only sum silently drops the (0-e)²/e contribution of every empty
    cell and understates dependence (a perfectly dependent 2×2 would
    score 10 instead of N=20). The grid is the cross join of the two
    marginal tables: bounded by category cardinalities, never by rows.

    Observed and marginal counts are exact integers; expected counts
    are computed as ``row_tot * 1.0 * col_tot / total`` — the widening
    multiply runs in DOUBLE, never long×long, so popular margins cannot
    overflow int64 at corpus scale. One (a, b) hash aggregate (map-side
    partial) feeds everything; marginals broadcast; the float sum runs
    over |a|·|b| cells.
    """
    obs = tracked_persist(df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("o")))
    rt = obs.groupBy("a").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("b").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("total"))
    grid = rt.crossJoin(ct)
    cells = (
        grid.join(obs, ["a", "b"], "left")
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "e", F.col("row_tot") * 1.0 * F.col("col_tot") / F.col("total")
        )
    )
    dof = (
        rt.agg(F.count(F.lit(1)).alias("nr"))
        .crossJoin(ct.agg(F.count(F.lit(1)).alias("nc")))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"))
    )
    stat = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")),
            6,
        ).alias("chi2"),
    )
    return stat.crossJoin(F.broadcast(dof)).select("n_cells", "dof", "chi2")


def calendar_gapfill(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify a per-key daily series: one row per (key, day) for every
    day in the key's [min_day, max_day] span, with ``n`` = observed row
    count that day (0 on gap days) and ``filled`` = the day's mean
    value carried forward from the last observed day (null before the
    first observation — which cannot happen here since the spine starts
    at an observed day). Rounded to 6 decimals.

    Scale: the spine is generated per key (``sequence`` over the key's
    own span), so a 10-year key costs 3 653 rows regardless of corpus
    size; the LOCF window and the observed-day join share one hash
    partitioning on key.
    """
    day = F.col(day_col).cast("date")
    observed = df.groupBy(F.col(key_col).alias("key"), day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col(value_col).cast("double")).alias("day_avg"),
    )
    spine = (
        observed.groupBy("key")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select("key", F.explode(F.sequence("mn", "mx")).alias("day"))
    )
    dense = spine.join(observed, ["key", "day"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        "key",
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(F.last("day_avg", ignorenulls=True).over(w), 6).alias("filled"),
    )


def mad_outlier_profile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    z: float = 3.5,
    approx: bool = False,
    accuracy: int = 10000,
    base: "DataFrame | None" = None,
) -> DataFrame:
    """Robust per-key outlier profile via median/MAD: (key, med, mad,
    n_outliers) where an outlier is |x - med| > z · 1.4826 · mad (the
    modified z-score rule; 1.4826 scales MAD to σ under normality).
    Unlike mean/stddev z-scores (events_anomaly_zscore), the median/MAD
    pair is unmoved by the outliers it hunts.

    Degenerate-spread fallback (Iglewicz-Hoaglin): when more than half
    of a key's values equal its median, MAD is 0 and the naive cutoff
    flags EVERY non-median value; the rule then falls back to the mean
    absolute deviation with its normal-consistency constant
    (|x - med| > z · 1.253314 · meanAD). All-constant keys have
    meanAD 0 too and flag nothing.

    Estimator choice: ``approx=False`` (default) uses EXACT grouped
    medians (Spark's sort-based ``median``) so the result hash-matches
    an exact oracle. ``approx=True`` swaps BOTH medians for the
    ``percentile_approx`` KLL-family sketch (rank error ≤ 1/accuracy,
    fixed memory, map-side mergeable) — the 10^12-row path, since the
    exact median buffers every value per group. The outlier rule is
    identical under either estimator; mad_approx_gate in the catalog
    holds the two within tolerance at the gated scale factors. The
    projected (key, value) frame and the per-key median table persist
    once each (each feeds two consumers); the per-key joins carry no
    broadcast hint — key cardinality is the caller's business and AQE
    promotes small sides itself.

    ``base``: an already-projected, already-persisted ``(key, x)``
    frame. A caller computing SEVERAL profiles of the same input
    (mad_approx_gate runs exact + approx) passes one shared base so
    the input is scanned and cached once instead of once per profile;
    ``df``/``key_col``/``value_col`` are ignored when it is given.
    """
    def _median(col):
        if approx:
            return F.percentile_approx(col, F.lit(0.5), F.lit(accuracy))
        return F.median(col)

    if base is None:
        base = tracked_persist(df.select(
            F.col(key_col).alias("key"), F.col(value_col).alias("x")
        ))
    med = tracked_persist(
        base.groupBy("key").agg(_median(F.col("x")).alias("med"))
    )
    spread = (
        base.join(med, "key")
        .groupBy("key")
        .agg(
            _median(F.abs(F.col("x") - F.col("med"))).alias("mad"),
            F.avg(F.abs(F.col("x") - F.col("med"))).alias("meanad"),
        )
    )
    stats = med.join(spread, "key")
    cutoff = F.when(
        F.col("mad") > 0, z * 1.4826 * F.col("mad")
    ).otherwise(z * 1.253314 * F.col("meanad"))
    return (
        base.join(stats, "key")
        .groupBy("key")
        .agg(
            F.round(F.first("med"), 6).alias("med"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.abs(F.col("x") - F.col("med")) > cutoff, 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


def cusum_profile(
    df,
    key_col: str,
    value_col: str,
    *,
    order_cols: "list[str]",
    target: float,
    slack: float = 0.0,
    threshold: float = 5.0,
):
    """One-sided (upper) CUSUM changepoint profile per key: fold the
    key's ordered value sequence through the Page recursion
    S_i = max(0, S_{i-1} + (x_i − target − slack)) and report, per key,
    the alert count (crossings of ``threshold`` — S resets to 0 after
    each alert, the standard restart rule), the running maximum, and
    the final S — the statistical-process-control primitive for "did
    this metric drift upward, and when did it start".

    NOT window-expressible: the max(0, ·) clamp makes the recursion
    non-associative (no prefix-sum trick, unlike interval_coalesce's
    running max), so the fold runs as a per-key Arrow kernel over the
    key's ordered rows. Scale: one shuffle on the key; per-key sequences
    stream through pandas in order; output is one row per key. The
    streaming twin (stream_cusum_alerts) carries (S, counters) across
    micro-batches and is equivalence-tested against this fold.
    """
    import numpy as np
    import pandas as pd

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_cols)
        s = 0.0
        mx = 0.0
        alerts = 0
        for x in pdf[value_col].to_numpy(dtype=np.float64):
            s = max(0.0, s + (x - target - slack))
            mx = max(mx, s)
            if s > threshold:
                alerts += 1
                s = 0.0
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0]],
                "n": [len(pdf)],
                "n_alerts": [alerts],
                "max_s": [mx],
                "final_s": [s],
            }
        )

    key_t = dict(df.dtypes)[key_col]
    cols = [key_col, value_col, *order_cols]
    return (
        df.select(*dict.fromkeys(cols))
        .groupBy(key_col)
        .applyInPandas(
            fold,
            schema=f"key {key_t}, n long, n_alerts long, max_s double,"
            " final_s double",
        )
    )
