"""replicadb_spark — a PySpark-native bulk-replication + analytics engine.

A from-scratch engine with the query and data-processing capabilities of
osalvador/ReplicaDB (reference: /root/reference, v0.15.1), re-expressed
Spark-first:

- sources/: partitioned scans (JDBC hash/range partitioning, CSV dialects,
  parquet/orc/json/avro, Mongo/Kafka gated behind connector availability).
  Reference: manager/*.java readTable() family (SURVEY.md §2.1).
- sinks/: bulk loads (JDBC batch, file formats, object-per-row S3, Kafka
  JSON). Reference: manager/*.java insertDataToTable() family (§2.2).
- modes.py: complete / complete-atomic / incremental replication plans
  (§2.3), staging + dialect MERGE re-expressed as driver-side SQL.
- types.py: the java.sql.Types normalization pipe (§1.3 / §2.4) as
  declarative Column expressions.
- functions/: the large-scale data-pipeline surface (dedup, similarity,
  text analysis, multimodal plumbing) the reference lacks but a 100 TB
  training-data pipeline needs.
- plans/: the relational query surface (scan/filter/project/join/agg/
  window/set-ops) exposed over any registered source.

Everything is DataFrame-declarative so Catalyst owns predicate pushdown,
column pruning, join planning and AQE owns runtime re-planning.
"""

__version__ = "0.1.0"

from replicadb_spark.session import get_spark  # noqa: F401
