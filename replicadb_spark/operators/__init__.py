from replicadb_spark.operators.relational import asof_join, range_join_pairs
from replicadb_spark.operators.skew import salted_join

__all__ = ["asof_join", "range_join_pairs", "salted_join"]
