"""Globally-ordered running totals without a single-partition sort.

A cumulative sum over ``Window.orderBy(key)`` with no partitionBy pulls
every row through ONE partition (Spark even warns). These helpers keep
the exact global-order semantics but do the heavy work partition-local:

1. range-bucket rows by ``floor(key / bucket_width)`` (narrow, no action);
2. intra-bucket running sum — a window PARTITIONED by bucket (parallel);
3. per-bucket totals (one tiny hash-agg: n_rows / bucket_width rows),
   exclusive-prefix-summed with a window over that tiny frame only;
4. broadcast the prefixes back and add.

The only single-partition window runs over the bucket totals —
``n / bucket_width`` rows — so at 100 TB with width 1M the "global"
step touches ~100k rows, not 10^11.

Requires a unique, numeric, roughly-uniform ``order_col`` (ids from a
sequence/snowflake). Ties would make the running value nondeterministic,
same as any SQL cumulative window without a total order.

Used by the ``shard_pack_chars`` catalog query: greedy packing of
documents into fixed-cost training shards (token/char budget per shard),
the standard sharding step before writing webdataset/tfrecord-style
training archives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_total",
    bucket_width: int = 4096,
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` in ``order_col`` order.

    Equivalent to ``SUM(value) OVER (ORDER BY key ROWS UNBOUNDED
    PRECEDING)`` but scalable (see module docstring).
    """
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width))
    b = df.withColumn("__bucket", bucket)

    intra_w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = b.withColumn("__intra", F.sum(value_col).over(intra_w))

    # tiny side: one row per bucket
    totals = b.groupBy("__bucket").agg(F.sum(value_col).alias("__btot"))
    prefix_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = totals.select(
        "__bucket",
        F.coalesce(F.sum("__btot").over(prefix_w), F.lit(0)).alias("__prefix"),
    )

    out = intra.join(F.broadcast(prefix), "__bucket")
    return (
        out.withColumn(out_col, F.col("__intra") + F.col("__prefix"))
        .drop("__bucket", "__intra", "__prefix")
    )


def pack_shards(
    df: DataFrame,
    order_col: str,
    cost_col: str,
    budget: int,
    shard_col: str = "shard",
    running_col: str = "running_total",
    bucket_width: int = 4096,
) -> DataFrame:
    """Assign rows to consecutive shards of ~``budget`` total cost.

    A row lands in the shard its cumulative START offset falls into:
    ``shard = (running - cost) div budget``. Deterministic, single pass,
    no driver-side state; shard boundaries may overshoot by at most one
    row's cost (greedy packing, same contract as tar-shard writers).
    """
    out = global_running_sum(
        df, order_col, cost_col, out_col=running_col, bucket_width=bucket_width
    )
    return out.withColumn(
        shard_col, F.expr(f"({running_col} - {cost_col}) div {budget}")
    )


def _morton_spread16(col):
    """Spread the low 16 bits of ``col`` so bit i lands at position 2i —
    the classic 4-step magic-mask Morton spread, expressed as Catalyst
    bit ops (whole-stage codegen, no UDF)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in (
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ):
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_value(x, y, *, bits: int = 16):
    """Interleaved-bit (Morton) z-value of two non-negative integer
    columns: x's bit i → position 2i, y's bit i → 2i+1. Inputs must fit
    in ``bits`` bits (pre-scale/rank wider domains)."""
    mask = (1 << bits) - 1
    sx = _morton_spread16(x.bitwiseAND(F.lit(mask)))
    sy = _morton_spread16(y.bitwiseAND(F.lit(mask)))
    return sx.bitwiseOR(F.shiftleft(sy, 1))


def zorder_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    num_files: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Cluster rows along the z-order (Morton) curve of two columns so a
    file-format sink's per-file min/max statistics prune on BOTH
    columns — the multi-dimensional complement to bucketing (which
    co-locates joins on ONE key) for range-predicate scans.

    repartitionByRange samples the z-values (one pass) to build balanced
    range bounds; each output file then covers a compact square-ish
    region of (x, y) space instead of a full-width stripe. At 100 TB
    this turns "every query scans every file" into "a box predicate
    touches O(box) files" with zero new runtime machinery — parquet
    row-group stats do the pruning.
    """
    z = zorder_value(F.col(col_x), F.col(col_y), bits=bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    bucket_width: float,
) -> DataFrame:
    """Exact global row_number by (value, id) WITHOUT the
    single-partition sort a bare ``Window.orderBy`` forces.

    Same decomposition as global_running_sum: range-bucket by
    ``floor(value / bucket_width)``; rank inside each bucket in
    parallel; exclusive-prefix-sum the per-bucket counts (a window over
    the tiny bucket-totals frame only); add the offset back via a
    broadcast join. The only ordered single-partition step touches
    n_buckets rows, so at 100 TB with a sane width the "global" stage
    handles thousands of rows, not 10^11.

    The (value, id) pair is a total order, so ranks are deterministic
    and match ``row_number() OVER (ORDER BY value, id)`` exactly —
    which is what the oracle checks. Equal-frequency binning, exact
    percentile assignment, and deciles all derive from the rank with
    plain arithmetic.

    Pick ``bucket_width`` so no single bucket dominates (value range /
    ~10·parallelism); heavy clustering in one bucket degrades that
    bucket's window to the skewed case — the same caveat as any range
    partitioning.
    """
    b = F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long").alias("__b")
    bucketed = df.withColumn("__b", b)
    w_in = Window.partitionBy("__b").orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    intra = bucketed.withColumn("__ir", F.row_number().over(w_in))
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    w_pfx = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(w_pfx), F.lit(0)).alias("__off")
    )
    return (
        intra.join(F.broadcast(offsets), "__b")
        .withColumn("global_rank", F.col("__off") + F.col("__ir"))
        .drop("__b", "__ir", "__off")
    )
