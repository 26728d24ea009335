"""Distributed Misra-Gries heavy hitters — a mergeable frequency sketch.

The 100 TB problem: find every key whose frequency exceeds N/t (hot
users, viral shingles, skewed join keys) without a full groupBy when key
cardinality is huge. Misra-Gries keeps k counters per partition and is
MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS 2012): summing
per-partition summaries and re-pruning to k counters keeps the estimate
error ≤ N/(k+1), so every key with true count > N/(k+1) provably
survives into the merged summary. With t < k+1 the candidate set is a
guaranteed superset of the true heavy hitters — the gate the catalog
query pins.

This complements ``skew.key_skew_profile`` (exact top-N via groupBy —
one full shuffle of distinct keys) with the sketch path whose shuffle
is ≤ partitions × k rows regardless of cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counts: dict, k: int) -> dict:
    """Prune a counter dict to ≤ k entries the Misra-Gries way: subtract
    the (k+1)-th largest count from everything, drop non-positive."""
    if len(counts) <= k:
        return counts
    pivot = sorted(counts.values(), reverse=True)[k]
    return {key: c - pivot for key, c in counts.items() if c > pivot}


def mg_summaries(df: DataFrame, key_col: str, *, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k (key, est) rows each.

    Streaming form inside each partition (dict + decrement batches), so
    executor memory is O(k) per task no matter how many distinct keys
    the partition holds — the property that makes this viable where an
    exact per-partition count dict would not be.
    """
    import pandas as pd

    def summarize(batches):
        counts: dict = {}
        for pdf in batches:
            # exact value_counts per Arrow batch, folded into the
            # bounded counter set, then MG-pruned back to k
            for key, c in pdf[key_col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            counts = _mg_reduce(counts, k)
        yield pd.DataFrame(
            {"key": list(counts.keys()), "est": list(counts.values())}
        )

    key_type = dict(df.dtypes)[key_col]
    return df.select(key_col).mapInPandas(
        summarize, schema=f"key {key_type}, est long"
    )


def heavy_hitter_candidates(
    df: DataFrame, key_col: str, *, k: int = 64
) -> DataFrame:
    """(key, est) candidate heavy hitters: merged MG summaries.

    Guarantee: contains EVERY key with true frequency > N/(k+1); ests
    are under-estimates within N/(k+1) of truth. One ≤ partitions×k-row
    shuffle — never a full-cardinality groupBy.
    """
    merged = mg_summaries(df, key_col, k=k).groupBy("key").agg(
        F.sum("est").alias("est")
    )
    # the merged dict is ≤ partitions×k rows; the final k-prune is only
    # needed to bound the OUTPUT size, and the subtraction must apply
    # uniformly — do it with a window-free tail bound: keep the top k by
    # est (ties kept), which preserves the superset guarantee since
    # pruning can only drop keys with est ≤ the (k+1)-th value ≤ N/(k+1).
    kth = (
        merged.select(F.col("est").alias("e"))
        .orderBy(F.col("e").desc())
        .limit(k + 1)
        .agg(F.min("e").alias("pivot"), F.count(F.lit(1)).alias("n"))
    )
    return (
        merged.crossJoin(F.broadcast(kth))
        .where((F.col("n") <= k) | (F.col("est") > F.col("pivot")))
        .select("key", "est")
    )
