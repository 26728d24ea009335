from replicadb_spark.operators.bloom import bloom_build, bloom_prejoin, bloom_probe
from replicadb_spark.operators.cdc import apply_diff, scd2_intervals, snapshot_diff
from replicadb_spark.operators.graph import connected_components
from replicadb_spark.operators.relational import asof_join, range_join_pairs
from replicadb_spark.operators.skew import salted_join

__all__ = [
    "apply_diff",
    "asof_join",
    "bloom_build",
    "bloom_prejoin",
    "bloom_probe",
    "connected_components",
    "range_join_pairs",
    "salted_join",
    "scd2_intervals",
    "snapshot_diff",
]
