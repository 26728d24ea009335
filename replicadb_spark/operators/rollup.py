"""Incremental aggregate maintenance: update a materialized aggregate
from a delta batch without rescanning the base.

This is the aggregation-side twin of the reference's incremental
replication mode (staging + MERGE, `manager/SqlManager.java:503-512`):
where ReplicaDB incrementally maintains a TABLE copy, this maintains a
GROUP BY over it. The trick is standard algebraic-aggregate theory —
keep (count, sum) partials, merge partials by key, derive avg & friends
at read time — the same decomposition Spark itself uses for map-side
partial aggregation, applied across batches instead of across tasks.

At 100 TB this is the difference between an O(delta) nightly refresh
and an O(history) full recompute. The merge is ONE shuffle of
|base_partials ∪ delta_partials| keyed rows; the base side is a stored
table in production (here a DataFrame).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_partials(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    decimal_scale: int = 6,
) -> DataFrame:
    """Mergeable partial state per key: (n, sum, min, max).

    sum is carried as DECIMAL so cross-batch merges stay
    order-independent (the same rule the catalog's money aggregates
    follow)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(f"decimal(28,{decimal_scale})")).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def merge_partials(base: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two partial-state frames: union → one re-aggregation on
    the key. count/sum add; min/max fold; avg derives downstream.
    Associative + commutative, so any batch arrival order yields the
    same state."""
    keys = list(keys)
    return (
        base.select(*keys, "n", "s", "mn", "mx")
        .unionByName(delta.select(*keys, "n", "s", "mn", "mx"))
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


def finalize_partials(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Read-time view over the maintained state: count/sum/avg/min/max."""
    return state.select(
        *keys,
        F.col("n").alias("cnt"),
        F.col("s").cast("double").alias("total"),
        # double/long IEEE division (NOT decimal division — engines
        # disagree on result scale rounding)
        (F.col("s").cast("double") / F.col("n")).alias("avg"),
        F.col("mn").alias("vmin"),
        F.col("mx").alias("vmax"),
    )


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Per-column data profile: (column, n_rows, n_nulls, n_distinct,
    min_s, max_s) — the engine-side ANALYZE the reference leaves to the
    databases it copies between (its `sink-analyze` option is parsed
    but never acted on, cli/ToolOptions.java:196-216).

    Scale: ONE pass — every per-column aggregate is computed in a
    single Aggregate node (no shuffle per column, no self-joins);
    the unpivot to rows happens on the single result row. min/max are
    emitted as strings so heterogeneous column types stack into one
    output schema. n_distinct is exact here; swap count_distinct for
    approx_count_distinct at trillion-row scale."""
    cols = list(columns) if columns is not None else [c for c, _ in df.dtypes]
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            (F.col("__rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_s"),
            F.col(f"__mx_{c}").alias("max_s"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
