"""Skew-handling join: explicit key salting.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most skew at runtime by splitting
oversized partitions. Explicit salting remains the tool when (a) AQE is
unavailable (non-adaptive plans, some streaming joins), or (b) a single
hot key exceeds what one task can hold even after splitting — the
classic "null key / default tenant" shape in training-data joins.

Mechanics: the skewed (large) side gets a random-ish salt in [0, S);
the build (small) side is replicated S times with every salt value; the
join key becomes (key, salt). Each hot key's rows spread over S tasks at
the cost of an S× replication of the build side — which is why the build
side must be the small one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with ``salt``-way key
    salting on the large side.

    The salt is derived deterministically from the large side's whole row
    (xxhash64 of all columns, mod S) rather than rand() — same spread,
    but re-runs and task retries produce identical partitioning, which
    keeps speculative execution and retry semantics clean.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    l_salted = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt)).cast("int"),
    )
    s_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(s_replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def key_skew_profile(df, key_col: str, top: int = 10):
    """Top-N heaviest join/grouping keys with their share of all rows —
    the diagnosis that decides between a plain shuffle join, AQE skew
    splitting, and salted_join. Run it on the intended join key BEFORE
    committing a 100 TB job to a plan.

    Scale: one map-side-combined count aggregate + a TakeOrdered top-N;
    the total count rides in as a broadcast 1-row aggregate (no second
    scan: Spark computes both from the same shuffle output)."""
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("__n"), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(top)
    )
