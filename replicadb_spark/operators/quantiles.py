"""Mergeable bottom-k quantile sketch: a deterministic uniform sample
built from the k smallest 64-bit hash ranks, and quantile estimates
read off the sorted sample.

Companion to operators/heavy_hitters.py (Misra-Gries): together they
cover the two classic mergeable summaries — frequent items and ranks —
that a 10^9-key corpus needs when the exact groupBy/sort is
unaffordable.

Why bottom-k (a.k.a. KMV): the k rows with the smallest values of a
fixed uniform hash are a uniform sample WITHOUT coordination — and the
summary is trivially mergeable (bottom-k of a union = bottom-k of the
two bottom-k's), which is exactly the property Spark's partial
TakeOrdered aggregation exploits: each partition keeps its own k
smallest ranks and the driver merges ≤ k·partitions candidate rows,
so the full data is never shuffled, sorted, or collected. Estimator
error for quantile q is O(sqrt(q(1-q)/k)) in rank space — k=4096
gives ~±0.8% rank error, gated at 3% in the catalog query.

Determinism: the rank is xxhash64 of the row id — no RNG, so the
sample, the estimates, and the gate are bit-stable across runs and
cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    *,
    k: int,
    keep: list[str] | None = None,
) -> DataFrame:
    """The k rows with the smallest xxhash64(id) — a deterministic
    uniform sample. Plan: TakeOrderedAndProject (per-partition partial
    top-k, driver-side merge of ≤ k·partitions rows); no full sort, no
    shuffle of the input.
    """
    cols = keep if keep is not None else [c for c in df.columns if c != id_col]
    return (
        df.select(*cols, F.xxhash64(F.col(id_col)).alias("__rk"))
        .orderBy("__rk")
        .limit(k)
    )


def quantile_estimates(
    sample: DataFrame,
    value_col: str,
    *,
    quantiles: list[float],
) -> DataFrame:
    """(q, est) per requested quantile from a bottom-k ``sample``:
    est = the ceil(q·k)-th smallest value. The window here is global
    but runs over the k-row sample only — bounded by construction, the
    same justification as the ≤ks-row PQ codebook collect.

    Null values are excluded from the ranking (they carry no rank
    information; Spark's asc ordering would otherwise place them at the
    lowest ranks and corrupt every estimate).

    Fully LAZY (r17): the sample size used to be a driver-side
    ``count()`` on a persisted copy of the sample — a whole extra
    full-input TakeOrdered job paid at CONSTRUCTION time. The size is
    now a second window aggregate over the same bounded single-
    partition frame (count over the whole frame costs nothing new —
    the row_number sort already moved it to one partition), and the
    rank targets move into the join condition, so a caller's single
    action computes the sample exactly once, with no persist and no
    construction-time job. ceil(q·n) is IEEE-754 double arithmetic on
    both paths, so the targets are bit-identical to the old
    ``math.ceil`` ones."""
    cleaned = (
        sample.select(F.col(value_col).alias("v"), "__rk")
        .where(F.col("v").isNotNull())
    )
    w = Window.orderBy(F.col("v").asc(), F.col("__rk").asc())
    ranked = cleaned.select(
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    qs = sample.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    target = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("n")))
    return (
        F.broadcast(qs)
        .join(ranked, F.col("rn") == target)
        .select("q", F.col("v").alias("est"))
    )


def kmv_distinct_sketch(df: DataFrame, key_col, *, k: int) -> DataFrame:
    """Bottom-k DISTINCT hash ranks of ``key_col`` — the KMV distinct-
    count sketch (Bar-Yossef et al.), the set-cardinality companion to
    bottomk_sample's rank sketch.

    Plan: per-partition Arrow pre-prune keeps at most k candidate ranks
    per batch (dedup + nsmallest), so the global distinct+TakeOrdered
    that follows runs over ≤ k·batches rows — the full key column is
    hashed in place but never shuffled. Deterministic: ranks are
    xxhash64, no RNG.
    """
    import pandas as pd

    hashed = df.select(F.xxhash64(F.col(key_col)).alias("__rk"))

    def prune(batches):
        for pdf in batches:
            if len(pdf):
                yield pdf.drop_duplicates("__rk").nsmallest(k, "__rk")

    pruned = hashed.mapInPandas(prune, schema="__rk long")
    return pruned.distinct().orderBy("__rk").limit(k)


_U64 = float(2**64)


def _kmv_estimate(ranks: "list[int]", k: int) -> float:
    """Cardinality from a bottom-k rank list: exact when the sketch is
    unsaturated (|ranks| < k — it IS the distinct set), else the
    classic (k-1)/U_(k) with ranks mapped from int64 to (0,1)."""
    if len(ranks) < k:
        return float(len(ranks))
    u_k = (max(ranks) + 2.0**63) / _U64
    if u_k <= 0.0:
        return float(len(ranks))
    return (k - 1) / u_k


def kmv_set_estimates(
    ranks_a: "list[int]", ranks_b: "list[int]", k: int
) -> "dict[str, float]":
    """Distinct-count, union, and intersection estimates from two KMV
    sketches (driver-side — sketches are ≤ k rows by construction, the
    codebook-collect precedent). Union = bottom-k of the merged rank
    set (the defining mergeability of KMV); intersection = ρ·|union|
    with ρ the fraction of the merged bottom-k present in BOTH input
    sketches (the standard KMV Jaccard estimator)."""
    sa, sb = set(ranks_a), set(ranks_b)
    merged = sorted(sa | sb)[:k]
    est_union = _kmv_estimate(merged, k)
    in_both = sum(1 for h in merged if h in sa and h in sb)
    rho = in_both / len(merged) if merged else 0.0
    return {
        "est_a": _kmv_estimate(sorted(ranks_a), k),
        "est_b": _kmv_estimate(sorted(ranks_b), k),
        "est_union": est_union,
        "est_intersect": rho * est_union,
        "jaccard": rho,
    }


def kmv_grouped_sketch(
    df: DataFrame, group_cols: "list[str]", key_col, *, k: int
) -> DataFrame:
    """One KMV distinct sketch PER GROUP: (group_cols..., ranks
    array<long>) with the k smallest distinct xxhash64 ranks of
    ``key_col`` within each group — the build side of sketch
    re-aggregation (weekly sketches → any coarser grain by merge).

    Plan: the same two-stage shape as kmv_distinct_sketch, grouped —
    an Arrow pre-prune keeps ≤ k distinct candidate ranks per group
    per batch, so the ONE keyed exchange that follows moves ≤ k·batches
    rows per group instead of every distinct key; the sketch then folds
    in a single grouped aggregate (collect_set dedups, array_sort +
    slice keep the bottom k — r16: the former distinct → window-rank →
    collect_list chain cost two extra exchanges and a per-group sort
    for the identical result). Without the pre-prune a
    10^9-distinct-key group would flood the exchange wholesale."""
    import pandas as pd

    hashed = df.select(
        *group_cols, F.xxhash64(F.col(key_col)).alias("__rk")
    )

    def prune(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.drop_duplicates(subset=[*group_cols, "__rk"])
                    .sort_values("__rk")
                    # dropna=False: Spark groupBy keeps null-keyed
                    # groups; the pandas default would silently drop
                    # them from the sketch here
                    .groupby(list(group_cols), sort=False, dropna=False)
                    .head(k)
                )

    schema = ", ".join(
        f"{c} {t}" for c, t in df.select(*group_cols).dtypes
    ) + ", __rk long"
    pruned = hashed.mapInPandas(prune, schema=schema)
    return pruned.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("__rk")), 1, k).alias("ranks")
    )
