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
    lowest ranks and corrupt every estimate), and the persist keeps the
    full-input TakeOrdered job from running once for the count and
    again for the join."""
    import math

    cleaned = (
        sample.select(F.col(value_col).alias("v"), "__rk")
        .where(F.col("v").isNotNull())
        .persist()
    )
    n = cleaned.count()
    w = Window.orderBy(F.col("v").asc(), F.col("__rk").asc())
    ranked = cleaned.withColumn("rn", F.row_number().over(w))
    qs = sample.sparkSession.createDataFrame(
        [(float(q), max(1, math.ceil(q * n))) for q in quantiles],
        "q double, target int",
    )
    return (
        F.broadcast(qs)
        .join(ranked, F.col("rn") == F.col("target"))
        .select("q", F.col("v").alias("est"))
    )
