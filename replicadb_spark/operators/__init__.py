from replicadb_spark.operators.relational import asof_join, range_join_pairs

__all__ = ["asof_join", "range_join_pairs"]
