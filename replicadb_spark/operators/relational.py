"""Custom relational operators Spark lacks as built-ins: as-of join and
(bucketed) range self-join.

Both are compositions of existing DataFrame ops — no UDFs — chosen for
their 100 TB shuffle profile:

- ``asof_join``: union + single window pass (ONE shuffle on the join key,
  zero pair explosion). The naive alternative — equi-join then per-left-row
  argmax — shuffles left×right_matches rows; on a 100 TB fact table that
  is quadratic in the per-key row count. The union trick carries each row
  exactly once.
- ``range_join_pairs``: time-bucket blocking turns an all-pairs-per-key
  join into a join on (key, bucket) with 2 candidate buckets per row —
  O(n · avg_bucket_occupancy) pairs instead of O(n²) per key, the same
  banding idea LSH dedup uses.

(The reference engine has no joins at all — SURVEY.md §2.7; these belong
to the "beyond the reference" training-data surface.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` (direction="backward"), matching on ``on``.

    Returns all left columns plus ``payload`` columns (null when no match).

    Plan: tag both sides, union on a common schema, one window
    (partitionBy key, orderBy event time with right rows sorting first on
    ties) carrying ``last(payload, ignoreNulls)`` forward, then filter back
    to left rows. One shuffle on ``on``; both the sort and the carry ride
    the same exchange.
    """
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_ts).cast("timestamp_ntz")).withColumn(
        "__side", F.lit(1)
    )
    for p in payload:
        l = l.withColumn(p, F.lit(None).cast(dict(right.dtypes)[p]))
    r = right.withColumn("__t", F.col(right_ts).cast("timestamp_ntz")).withColumn(
        "__side", F.lit(0)
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [on, "__t", "__side", *[c for c in lcols if c != on], *payload]
    u = l.select(*cols).unionByName(r.select(*cols))
    # right rows (__side=0) sort before left rows at the same timestamp, so
    # a right row exactly at left_ts is visible to that left row.
    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        on,
        "__t",
        "__side",
        *[c for c in lcols if c != on],
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return carried.where(F.col("__side") == 1).select(*lcols, *payload)


def range_join_pairs(
    df: DataFrame,
    *,
    key: str,
    id_col: str,
    ts_col: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Self range-join: pairs of rows sharing ``key`` whose timestamps are
    within ``max_gap_seconds`` (output ids ordered id_a < id_b).

    Blocking: rows land in epoch buckets of width max_gap. Take each pair
    with ``l`` the time-earlier row (ties broken by id); then the later row
    ``r`` lives in bucket b_l or b_l+1, so probing r into {b_r, b_r-1} and
    equi-joining on (key, bucket) covers every qualifying pair exactly
    once — no O(n²)-per-key cross join and no dedup pass.
    """
    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1_000_000.0)
    base = df.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        sec.alias("s"),
        F.floor(sec / max_gap_seconds).cast("long").alias("b"),
    )
    probe = base.select(
        "k", "id", "s", F.explode(F.array(F.col("b"), F.col("b") - 1)).alias("b")
    )
    later = (F.col("r.s") > F.col("l.s")) | (
        (F.col("r.s") == F.col("l.s")) & (F.col("r.id") > F.col("l.id"))
    )
    return (
        base.alias("l")
        .join(probe.alias("r"), ["k", "b"])
        .where(later & ((F.col("r.s") - F.col("l.s")) <= max_gap_seconds))
        .select(
            F.col("k").alias(key),
            F.least(F.col("l.id"), F.col("r.id")).alias("id_a"),
            F.greatest(F.col("l.id"), F.col("r.id")).alias("id_b"),
            F.round(F.col("r.s") - F.col("l.s"), 6).alias("gap_s"),
        )
    )


def interval_overlap_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_width: float,
) -> DataFrame:
    """All pairs of intervals (same key) that OVERLAP:
    a.start <= b.end AND b.start <= a.end — the interval self-join
    behind conflict detection, co-occurrence windows, and meeting/ad
    collision analysis.

    The naive SQL form is a per-key cross join (quadratic in the key's
    rows). Here every interval explodes to the fixed-width buckets it
    touches (``sequence(floor(start/w), floor(end/w))`` — pure codegen),
    the equi-join runs on (key, bucket), and duplicate hits from
    intervals sharing several buckets collapse with one distinct. Cost
    is O(rows · avg_buckets_per_interval) join input instead of
    O(rows²_per_key); pick ``bucket_width`` near the typical interval
    length so avg_buckets stays ~2.

    Returns (key, id_a, id_b) with id_a < id_b, exact-filtered on the
    true overlap predicate, so the bucketing is invisible in the result
    (the oracle is the plain inequality join).
    """
    b = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor(F.col(end_col) / F.lit(bucket_width)),
            )
        ).alias("bucket"),
    )
    pairs = (
        b.alias("l")
        .join(b.alias("r"), on=["key", "bucket"])
        .where(F.col("l.id") < F.col("r.id"))
        .where((F.col("l.s") <= F.col("r.e")) & (F.col("r.s") <= F.col("l.e")))
        .select("key", F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return pairs


def interval_coalesce(
    df: DataFrame,
    key_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    islands (the union of the key's intervals): one row per island with
    (key, island, island_start, island_end, n_intervals). ``island``
    numbers islands 1..k per key in time order — the gaps-and-islands
    pattern behind uptime stitching, session merging, and contiguous-
    coverage audits.

    Plan: ONE shuffle on key serves both windows — a running
    ``max(end)`` over preceding rows marks island breaks (a row starts
    a new island iff its start exceeds every earlier end), a running
    sum of break flags numbers the islands, and a hash aggregate on
    (key, island) collapses them. No self-join: the naive
    overlap-join-then-cluster formulation is quadratic per key AND
    needs connected components; the two-window form is linear and
    exact for interval union because overlap is transitive along the
    time-sorted order. Ties sort by id so the hash is deterministic.
    """
    w_order = Window.partitionBy("key").orderBy("s", "id")
    prev_max = (
        F.max("e").over(w_order.rowsBetween(Window.unboundedPreceding, -1))
    )
    flagged = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    ).withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "island",
        F.sum("new_island").over(w_order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("key", "island").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
