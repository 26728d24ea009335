"""JDBC sources — partitioned scans (SURVEY.md §2.1 S1-S9, S12-S14).

The reference opens N identical JDBC sessions, each reading one
hash/offset partition (ReplicaTask.java:29-80). Spark's JDBC source does
the same thing with either:

- ``partitionColumn/lowerBound/upperBound/numPartitions`` — range split
  on a numeric/date key (the safe replacement for the reference's
  OFFSET-page scans S3/S4/S6, which can drop/duplicate rows without an
  ORDER BY — SURVEY §7.4: do not copy), or
- ``predicates=[...]`` — one arbitrary WHERE clause per partition, used
  for dialect hash splits (ora_hash / CHECKSUM %%physloc%% / crc32), the
  exact predicates the reference generates (OracleManager.java:63,
  SQLServerManager.java:383).

Both strategies push the partition predicate into the remote database so
each Spark task streams a disjoint slice — identical network shape to the
reference, but with Spark's retry/locality/AQE on top.

No JDBC driver jars ship in this environment, so these builders are
exercised by unit tests on the generated plans/options rather than a live
database (tests/test_jdbc_source.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

from replicadb_spark.options import ReplicaJob
from replicadb_spark.sql.dialects import dialect_from_url, hash_partition_predicates

# Session-init statements the reference runs before scanning, carried via
# the JDBC `sessionInitStatement` option (OracleManager.java:83-99).
SESSION_INIT: dict[str, str] = {
    "oracle": (
        "BEGIN "
        "EXECUTE IMMEDIATE 'ALTER SESSION SET NLS_NUMERIC_CHARACTERS=\".,\"'; "
        "EXECUTE IMMEDIATE 'ALTER SESSION SET \"_serial_direct_read\"=true'; "
        "EXECUTE IMMEDIATE 'ALTER SESSION SET recyclebin=OFF'; "
        "END;"
    ),
}


def build_select(job: ReplicaJob) -> str:
    """The scan SQL: ``SELECT {cols|*} FROM {table} [WHERE ...]`` or the
    user query wrapped as a derived table (SqlManager.java:58-93,
    OracleManager.java:45-52).
    """
    if job.source_query:
        return f"({job.source_query}) replicadb_q"
    cols = job.source_columns or "*"
    sql = f"SELECT {cols} FROM {job.source_table}"
    if job.source_where:
        sql += f" WHERE {job.source_where}"
    return f"({sql}) replicadb_t"


def reader_properties(job: ReplicaJob, dialect: str) -> dict[str, str]:
    """Connection properties for the predicates-based read path — must
    carry everything _base_reader sets as options, notably the dialect
    sessionInitStatement: oracle's hash scan (S2) ALWAYS takes this
    path, and the reference runs its ALTER SESSIONs on every task
    connection (OracleManager.java:83-99)."""
    props = {"fetchsize": str(job.fetch_size)}
    if job.source_user:
        props["user"] = job.source_user
    if job.source_password:
        props["password"] = job.source_password
    if dialect in SESSION_INIT:
        props["sessionInitStatement"] = SESSION_INIT[dialect]
    props.update({k: str(v) for k, v in job.source_params.items()})
    return props


def _base_reader(spark: SparkSession, job: ReplicaJob) -> DataFrameReader:
    reader = (
        spark.read.format("jdbc")
        .option("url", job.source_connect)
        .option("fetchsize", str(job.fetch_size))
    )
    if job.source_user:
        reader = reader.option("user", job.source_user)
    if job.source_password:
        reader = reader.option("password", job.source_password)
    dialect = dialect_from_url(job.source_connect)
    if dialect in SESSION_INIT:
        reader = reader.option("sessionInitStatement", SESSION_INIT[dialect])
    for k, v in job.source_params.items():
        reader = reader.option(k, str(v))
    return reader


def read_jdbc(spark: SparkSession, job: ReplicaJob) -> DataFrame:
    """Partitioned JDBC scan.

    Strategy selection (mirrors each manager's readTable, §2.1):
    jobs==1 → single scan (S1); a numeric ``source_split_by`` with
    ``partition.lower/upper.bound`` params → range partitioning; otherwise
    dialect hash predicates (S2/S5 parity, generic hash elsewhere).
    """
    dbtable = build_select(job)
    reader = _base_reader(spark, job).option("dbtable", dbtable)

    if job.jobs <= 1:
        return reader.load()

    lower = job.source_params.get("partition.lower.bound")
    upper = job.source_params.get("partition.upper.bound")
    if job.source_split_by and lower is not None and upper is not None:
        return (
            reader.option("partitionColumn", job.source_split_by)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(job.jobs))
            .load()
        )

    dialect = dialect_from_url(job.source_connect)
    if dialect not in ("oracle", "sqlserver") and not job.source_split_by:
        # generic dialect with no split column: the reference's
        # StandardJDBCManager reads single-stream in this case (S1,
        # SqlManager.java:58-93 — "no partitioning, jobs=1 only")
        return reader.load()
    predicates = hash_partition_predicates(dialect, job.jobs, job.source_split_by)
    where = f" AND ({job.source_where})" if (job.source_where and job.source_query) else ""
    props = reader_properties(job, dialect)
    return spark.read.jdbc(
        url=job.source_connect,
        table=dbtable,
        predicates=[p + where for p in predicates],
        properties=props,
    )
