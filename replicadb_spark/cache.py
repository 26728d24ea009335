"""Session-scoped accounting for persisted intermediates.

Several operators persist an intermediate that the RETURNED lazy
DataFrame reads more than once (a capped shingle index both sides of a
self-join scan, a tf frame feeding df counts and scores, a basket
frame feeding norms and both join sides). The persist is load-bearing
for performance, but Spark's CacheManager holds a reference until
``unpersist()`` — so in a long-lived session (a pipeline service, the
100-query bench) every such call would leak its cache until session
death. ``operators/graph.py`` can unpersist in a ``finally`` because it
collects its one-row result while the caches are warm; operators that
return a LAZY frame cannot (unpersisting before the caller's action
would silently recompute every reuse).

The contract here is the explicit middle ground:

- library code persists through :func:`tracked_persist`, which
  registers the frame on a per-SparkSession ledger;
- the caller (service loop, bench harness, oracle replica) calls
  :func:`release_caches` at each query boundary — after materializing
  the result, before the next query — returning storage to zero;
- :func:`persisted_rdd_count` reads the JVM CacheManager's truth (not
  this ledger), so harness tests can assert nothing slipped past the
  registry.

At 100 TB this is the difference between a pipeline service with flat
executor storage and one that OOMs after N queries.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

# One ledger per SparkSession, stored AS AN ATTRIBUTE on the session
# object itself (ADVICE r11): a global map keyed by id(spark) would let
# a new session inherit a dead session's entries after CPython id reuse,
# and strong map entries would pin a session dropped without a final
# release for the process lifetime. Attribute storage makes both
# impossible structurally — the ledger's lifetime IS the session's.
# Entries live until the matching release_caches(spark) pops them — the
# documented query-boundary contract; a session stopped WITHOUT a final
# release retains only its own driver-side wrapper objects until GC
# (the JVM cache died with the session).
_LEDGER_ATTR = "_replicadb_spark_cache_ledger"


def tracked_persist(df: "DataFrame", storage_level=None) -> "DataFrame":
    """``df.persist()`` that the session's next :func:`release_caches`
    will undo. Returns ``df`` for chaining, like ``persist`` itself."""
    if storage_level is not None:
        df.persist(storage_level)
    else:
        df.persist()
    sess = df.sparkSession
    ledger = getattr(sess, _LEDGER_ATTR, None)
    if ledger is None:
        ledger = []
        setattr(sess, _LEDGER_ATTR, ledger)
    ledger.append(df)
    return df


def release_caches(spark: "SparkSession") -> int:
    """Unpersist every frame :func:`tracked_persist` registered on this
    session; returns how many were released. Idempotent — frames a
    caller already unpersisted early (or that were never materialized)
    unpersist as a no-op."""
    frames = getattr(spark, _LEDGER_ATTR, None) or []
    try:
        delattr(spark, _LEDGER_ATTR)
    except AttributeError:
        pass
    for f in frames:
        try:
            f.unpersist()
        except Exception:
            pass  # a stopped session's handle: nothing left to free
    return len(frames)


def tracked_count(spark: "SparkSession") -> int:
    """Frames currently on this session's ledger (not yet released)."""
    return len(getattr(spark, _LEDGER_ATTR, None) or [])


def persisted_df_count(spark: "SparkSession") -> int:
    """The SQL CacheManager's count of cached DataFrames — ground
    truth for 'is executor storage actually empty', independent of the
    ledger (so an untracked bare ``.persist()`` shows up here).
    Harness tests assert this returns 0 after release. Deliberately
    the SQL-level cache, not ``getPersistentRDDs``: iterative graph
    ops use ``localCheckpoint``, whose RDD blocks are freed
    asynchronously by the ContextCleaner and would make an RDD-level
    zero-assertion flaky."""
    return int(
        spark._jsparkSession.sharedState().cacheManager().cachedData().size()
    )
