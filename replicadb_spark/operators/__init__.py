from replicadb_spark.operators.graph import connected_components
from replicadb_spark.operators.relational import asof_join, range_join_pairs
from replicadb_spark.operators.skew import salted_join

__all__ = ["asof_join", "connected_components", "range_join_pairs", "salted_join"]
