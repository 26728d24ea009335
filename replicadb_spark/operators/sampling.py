"""Weighted reservoir sampling — exact-k, weight-proportional,
deterministic.

The sampling surface elsewhere in the catalog covers hash-membership
Bernoulli samples (rate per group, ``sample_weighted_mix``), budgeted
greedy prefixes (``source_token_budget_sample``) and per-key caps
(``sample_cap_per_user``). What a training-data pipeline also needs is
"exactly k items per group, chosen WITHOUT replacement with probability
proportional to an item weight" — e.g. k representative documents per
source weighted by length, k examples per task weighted by quality
score. That is the Efraimidis–Spirakis A-Res scheme (Inf. Process.
Lett. 97(5), 2006): give item i the key u_i^(1/w_i) with u_i uniform in
(0,1) and keep the k largest keys; the result is distributed exactly as
sequential weighted sampling without replacement.

Determinism contract (the repo's sampling rule — no rand()): u_i
derives from the item's id through md5 then the portable 31-fold poly
hash (both replayable in DuckDB), so every engine, run, and re-ingest
draws the same sample. Keys are compared as ln(u)/w — the monotone
log form of u^(1/w), one correctly-rounded ln and one division —
ROUNDED before ranking with the id as tiebreak, the catalog's standard
guard against cross-engine 1-ulp flips.

Scale: one codegen projection computes the key, then ONE window
(row_number partitioned by the group) — the partitioned-rank shape
that never collapses to a single partition; with k ≪ group size the
group-limit pushdown turns it into a partial top-k per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from replicadb_spark.functions.dedup import poly_hash

# poly_hash modulus (1e9+7) — u = (h + 0.5) / MOD lands in (0, 1)
_MOD = 1_000_000_007


def reservoir_key(id_col, weight_col, *, seed: str) -> "tuple":
    """``(key, u)`` columns for A-Res: key = ln(u)/w with u the
    deterministic uniform draw for this id under ``seed``. Exposed so
    oracles and incremental maintainers can recompute the exact key."""
    h = poly_hash(F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    key = F.log(u) / weight_col.cast("double")
    return key, u


def weighted_reservoir_sample(
    df: DataFrame,
    group_cols: "list[str]",
    id_col: str,
    weight_col: str,
    *,
    k: int,
    seed: str = "wrs-1",
    key_round: int = 9,
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, drawn without
    replacement with probability proportional to ``weight_col``
    (A-Res). Adds ``rsv_key`` (the rounded ranking key) and ``rsv_rank``
    (1..k). Weights must be strictly positive — enforced by a loud
    filter-refusal (a zero/negative weight has no defined inclusion
    probability; silently dropping it would bias the sample).

    ``key_round`` rounds ln(u)/w before the rank (id tiebreak breaks
    exact ties) so a DuckDB oracle replaying the same arithmetic ranks
    identically despite engine-level 1-ulp noise.
    """
    if k <= 0:
        raise ValueError("weighted reservoir needs k >= 1")
    key, _ = reservoir_key(F.col(id_col), F.col(weight_col), seed=seed)
    guarded = F.when(
        F.col(weight_col).cast("double") > 0, F.round(key, key_round)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "weighted_reservoir_sample: non-positive weight for id "
                ),
                F.col(id_col).cast("string"),
            )
        )
    )
    keyed = df.withColumn("rsv_key", guarded)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("rsv_key").desc(), F.col(id_col)
    )
    out = keyed.withColumn("rsv_rank", F.row_number().over(w)).where(
        F.col("rsv_rank") <= k
    )
    return out
