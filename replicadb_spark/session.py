"""SparkSession factory tuned for the replication + analytics workload.

The reference engine's parallelism knob is ``jobs`` (N identical JDBC
sessions, cli/ToolOptions.java:14). Here parallelism is Spark's scheduler;
the knobs that matter at 100 TB are shuffle partitioning, AQE, and Arrow
batch transfer for the (rare) Pandas-UDF paths.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Defaults chosen for the local[32]/128GiB test harness; on a real cluster
# every one of these is expected to be overridden by spark-submit conf.
_LOCAL_DEFAULTS = {
    # AQE owns runtime re-planning: shuffle-partition coalescing, skew-join
    # splitting, and dynamic broadcast conversion. Non-negotiable at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Static shuffle width for local[32]; AQE coalesces down when small.
    "spark.sql.shuffle.partitions": "32",
    # Arrow for any pandas_udf / applyInPandas path (similarity, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Keep scans splittable and right-sized (parquet row-group ≈ 128MB).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dims like region/nation/supplier always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # TESTDATA parquet stores INT64 TIMESTAMP(NANOS) which Spark has no
    # native type for; read as long and convert in tables().
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Report the persisted sortBy order of bucketed tables so a
    # bucketed⋈bucketed SortMergeJoin is zero-exchange AND zero-sort
    # (the basket-sets layout relies on it). Safe: Spark only reports
    # the order when every bucket is a single file (SPARK-28616), and
    # write_bucketed_table's repartition discipline guarantees that.
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
    # Quieter driver logs in tests.
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "replicadb_spark", **extra_conf: str) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    Any ``extra_conf`` key wins over the defaults.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_LOCAL_DEFAULTS)
    conf.update({k: str(v) for k, v in extra_conf.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# Per-session memo for tables(): {"dfs": {(sf_dir, name): DataFrame},
# "views": {name: sf_dir}}. A DataFrame here is a lazy immutable PLAN —
# memoizing it caches zero rows and zero results; it only avoids
# re-paying the spark.read.parquet footer/schema round trip (~100 ms
# per table) and the view re-registration py4j call on every query
# construction. The memo dies with its session (WeakKeyDictionary), and
# the view registry tracks which sf_dir each base-table view currently
# points at so alternating sf_dirs within one session re-register
# correctly. session.tables is the only temp-view registrar in the
# repo (verified by grep, r17), so the registry cannot go stale.
_TABLES_MEMO: WeakKeyDictionary = WeakKeyDictionary()

# Same contract for arbitrary immutable parquet paths (the persisted
# per-(process, sf_dir) layouts: tf/, minhash buckets/ssets/cands,
# shingle inter/sizes, edge layouts): ``spark.read.parquet`` pays a
# directory listing + footer read (~50-150 ms) per call for schema
# discovery, and every layout consumer used to re-pay it on every
# query construction. The memoized DataFrame is a lazy immutable plan
# — zero rows and zero results cached. ONLY for paths whose contents
# never change within a process (layout dirs are written once into a
# fresh tempdir, sf_dir is immutable per TESTDATA.md); snapshot-table
# paths evolve per commit and must NOT go through this.
_PARQUET_MEMO: WeakKeyDictionary = WeakKeyDictionary()


def read_parquet_memo(spark: SparkSession, path: str):
    """Memoized lazy ``spark.read.parquet(path)`` per (session, path),
    for immutable-within-process paths (persisted layouts, sf_dir
    inputs). The memo dies with its session (WeakKeyDictionary)."""
    memo = _PARQUET_MEMO.setdefault(spark, {})
    df = memo.get(path)
    if df is None:
        df = memo[path] = spark.read.parquet(path)
    return df


def tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Load the TESTDATA star-schema parquet tables as a dict of DataFrames.

    Also registers each as a temp view so ``spark.sql`` works over them —
    the Spark-side equivalent of the reference registering a source table
    per ConnManager (manager/ConnManager.java:41-42).
    """
    all_names = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    # TESTDATA timestamp columns arrive as INT64 nanos (see
    # nanosAsLong conf); convert to TimestampNTZ at load so every plan
    # downstream sees real timestamps. NTZ matches DuckDB's naive
    # TIMESTAMP semantics for oracle comparisons.
    ts_cols = {
        "orders": ("o_orderdate",),
        "lineitem": ("l_shipdate",),
        "events": ("ts",),
    }
    state = _TABLES_MEMO.setdefault(spark, {"dfs": {}, "views": {}})
    dfs, views = state["dfs"], state["views"]
    out = {}
    for name in names or all_names:
        key = (sf_dir, name)
        df = dfs.get(key)
        if df is None:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            for c in ts_cols.get(name, ()):
                if dict(df.dtypes).get(c) == "bigint":
                    # integer `div`, NOT float `/`: epoch nanos (~1.7e18)
                    # exceed double's 2^53 exact-integer range, and DuckDB
                    # truncates nanos→micros exactly — µs drift breaks oracle
                    # hashes on ts outputs and can flip near-tie orderings.
                    df = df.withColumn(
                        c,
                        F.timestamp_micros(
                            F.expr(f"`{c}` div 1000")
                        ).cast("timestamp_ntz"),
                    )
            dfs[key] = df
        if views.get(name) != sf_dir:
            df.createOrReplaceTempView(name)
            views[name] = sf_dir
        out[name] = df
    return out
