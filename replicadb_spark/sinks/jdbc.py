"""JDBC sinks — bulk loads (SURVEY.md §2.2 K1-K4).

``df.write.jdbc`` with ``batchsize`` reproduces the reference's typed
addBatch/executeBatch loop (StandardJDBCManager.java:80-223) on every
partition in parallel — the same N-connections shape as N ReplicaTasks.
Dialect fast paths the reference implements natively map to connector
options here (MySQL LOAD DATA → rewriteBatchedStatements, SQLServer
BulkCopy → useBulkCopyForBatchInsert); Postgres COPY has the exact
``foreachPartition`` writer in ``sinks/pg_copy.py`` (K2), with these
connector flags as its no-client-lib fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from replicadb_spark.options import ReplicaJob
from replicadb_spark.sql.dialects import dialect_from_url

# Connector-level bulk options per dialect. MySQL rewriteBatchedStatements
# is the same flag the reference sets on its own connection
# (MySQLManager.java:36-42) — it turns the insert batch into a multi-row
# statement, the JDBC-protocol cousin of LOAD DATA.
BULK_SINK_PARAMS: dict[str, dict[str, str]] = {
    "mysql": {"rewriteBatchedStatements": "true"},
    "mariadb": {"rewriteBatchedStatements": "true"},
    "postgresql": {"reWriteBatchedInserts": "true"},
    "sqlserver": {"useBulkCopyForBatchInsert": "true"},
}


def jdbc_writer_properties(job: ReplicaJob) -> dict[str, str]:
    props: dict[str, str] = {"batchsize": str(job.fetch_size)}
    dialect = dialect_from_url(job.sink_connect)
    props.update(BULK_SINK_PARAMS.get(dialect, {}))
    if job.sink_user:
        props["user"] = job.sink_user
    if job.sink_password:
        props["password"] = job.sink_password
    props.update({k: str(v) for k, v in job.sink_params.items()})
    return props


def write_jdbc(
    df: DataFrame,
    job: ReplicaJob,
    *,
    table: str | None = None,
    mode: str = "append",
    truncate: bool = False,
) -> None:
    """Bulk insert into ``table`` (defaults to job.sink_table).

    ``mode='overwrite', truncate=True`` is M1 complete mode: TRUNCATE
    then reload, keeping the sink table's DDL (SqlManager.java:360-378).
    Partition count = write parallelism = the reference's ``jobs``;
    repartition only when the plan's natural width differs wildly.
    """
    target = table or job.sink_table
    if not target:
        raise ValueError("sink_table required for a JDBC sink")
    out = df
    if job.jobs and df.rdd.getNumPartitions() > job.jobs * 4:
        out = df.coalesce(job.jobs)
    writer = (
        out.write.format("jdbc")
        .option("url", job.sink_connect)
        .option("dbtable", target)
        .mode(mode)
    )
    if truncate:
        writer = writer.option("truncate", "true")
    for k, v in jdbc_writer_properties(job).items():
        writer = writer.option(k, v)
    writer.save()
