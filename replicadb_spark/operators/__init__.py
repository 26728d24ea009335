from replicadb_spark.operators.bloom import bloom_build, bloom_prejoin, bloom_probe
from replicadb_spark.operators.cdc import apply_diff, scd2_intervals, snapshot_diff
from replicadb_spark.operators.graph import (
    connected_components,
    pagerank,
    triangle_count,
)
from replicadb_spark.operators.relational import (
    asof_join,
    interval_coalesce,
    range_join_pairs,
)
from replicadb_spark.operators.setsim import edit1_pairs, set_jaccard_pairs
from replicadb_spark.operators.skew import salted_join
from replicadb_spark.operators.stats import (
    calendar_gapfill,
    entropy_by_key,
    groupwise_ols,
)

__all__ = [
    "apply_diff",
    "asof_join",
    "bloom_build",
    "bloom_prejoin",
    "bloom_probe",
    "calendar_gapfill",
    "connected_components",
    "edit1_pairs",
    "entropy_by_key",
    "groupwise_ols",
    "interval_coalesce",
    "pagerank",
    "range_join_pairs",
    "salted_join",
    "scd2_intervals",
    "set_jaccard_pairs",
    "snapshot_diff",
    "triangle_count",
]
