"""MySQL/MariaDB ``LOAD DATA LOCAL INFILE`` fast path (SURVEY.md §2.2 K3).

Exact-parity re-expression of the reference's infile-stream loop
(``manager/MySQLManager.java:51-227``): each Spark partition encodes
rows into the infile text format and hands fetch-size batches to a
loader —

- ``LOAD DATA LOCAL INFILE '<file>' INTO TABLE <t> CHARACTER SET UTF8
  FIELDS TERMINATED BY X'1F' (c1, @c2, ...) SET c2=UNHEX(@c2)`` with
  one ``@var``/UNHEX pair per binary column
  (``MySQLManager.java:177-227``);
- column separator 0x1F, row terminator ``\\n``;
- SQL NULL → ``\\N`` (``MySQLManager.java:124-129``);
- escaping ``\\`` → ``\\\\``, LF → ``\\n``, CR → ``\\r`` unless
  ``sink.disable.escape`` (``MySQLManager.java:123-129``, T7);
- binary → bare hex, decoded server-side by the UNHEX SET clause
  (``MySQLManager.java:105-111,205-218``);
- one ``executeUpdate`` per ``fetch.size`` rows
  (``MySQLManager.java:134-151``) — mirrored as one loader call per
  batch.

Deviation (same corruption fix as the COPY writer): a literal 0x1F
byte inside a string value is dropped-in as ``\\`` + 0x1F (LOAD DATA
treats a backslash-prefixed byte as that literal byte); the reference
writes it raw, which shifts every later column of the row.

The loader is injectable because this container has no live MySQL or
client lib — production default is a pymysql-backed factory
(import-gated) that stages each batch as a temp file, tests inject a
recording one.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Callable, Iterable, Protocol

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from replicadb_spark.options import ReplicaJob

FIELD_SEPARATOR = "\x1f"
INFILE_PLACEHOLDER = "__REPLICADB_INFILE__"


class LoadSink(Protocol):
    """What a load_factory must return: consumes one encoded batch per
    call (the reference's copyData, MySQLManager.java:165-175)."""

    def load(self, data: bytes) -> None: ...

    def close(self) -> None: ...


# load_factory(load_sql) -> LoadSink, invoked ON THE EXECUTOR once per
# partition; must be picklable. load_sql contains INFILE_PLACEHOLDER
# where the staged file's path belongs (the reference passes 'dummy'
# and overrides the stream; a file-based client substitutes the path).
LoadFactory = Callable[[str], LoadSink]


def load_data_sql(table: str, columns: list[str], binary_columns: set[str]) -> str:
    """The LOAD DATA command with @var/UNHEX redirection for binary
    columns (MySQLManager.java:177-227)."""
    field_list = ", ".join(
        f"@{c}" if c in binary_columns else c for c in columns
    )
    sql = (
        f"LOAD DATA LOCAL INFILE '{INFILE_PLACEHOLDER}' INTO TABLE {table}"
        f" CHARACTER SET UTF8 FIELDS TERMINATED BY X'1F' ({field_list})"
    )
    sets = [f"{c}=UNHEX(@{c})" for c in columns if c in binary_columns]
    if sets:
        sql += " SET " + ", ".join(sets)
    return sql


def encode_value(v, *, disable_escape: bool = False) -> str:
    """One column value → infile field (see module docstring)."""
    if v is None:
        return "\\N"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()  # bare hex; UNHEX() decodes server-side
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (datetime.datetime, datetime.date, decimal.Decimal, int, float)):
        return str(v)
    s = str(v)
    if not disable_escape:
        s = (
            s.replace("\\", "\\\\")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace(FIELD_SEPARATOR, "\\" + FIELD_SEPARATOR)
        )
    return s


def encode_row(values: Iterable, *, disable_escape: bool = False) -> bytes:
    """One row → delimited, escaped, LF-terminated UTF-8 bytes."""
    return (
        FIELD_SEPARATOR.join(encode_value(v, disable_escape=disable_escape) for v in values)
        + "\n"
    ).encode("utf-8")


def pymysql_load_factory(job: ReplicaJob) -> LoadFactory:
    """Production factory: one pymysql connection per partition; each
    batch staged as a temp file (pymysql has no in-memory infile hook).

    Import-gated: pymysql does not ship in this container, so the gate
    raises at factory-build time (driver side), never mid-write.
    """
    try:
        import pymysql  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "mysql LOAD DATA fast path needs pymysql on the executors; "
            "install it or inject load_factory="
        ) from exc

    url, user, password = job.sink_connect, job.sink_user, job.sink_password

    def factory(sql: str) -> LoadSink:
        return _PymysqlSink(url, user, password, sql)

    return factory


class _PymysqlSink:
    """One connection, one LOAD DATA executeUpdate per batch, commit on
    close — the reference's per-task lifecycle (MySQLManager.java:160-163)."""

    def __init__(self, url: str, user: str | None, password: str | None, sql: str):
        import re

        import pymysql

        m = re.match(r"jdbc:(?:mysql|mariadb)://([^/:]+)(?::(\d+))?/(\w+)", url)
        if not m:
            raise ValueError(f"cannot parse mysql url: {url}")
        self._conn = pymysql.connect(
            host=m.group(1), port=int(m.group(2) or 3306), database=m.group(3),
            user=user, password=password, local_infile=True,
        )
        self._sql = sql

    def load(self, data: bytes) -> None:
        import os
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".infile")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            with self._conn.cursor() as cur:
                cur.execute(self._sql.replace(INFILE_PLACEHOLDER, path))
        finally:
            os.unlink(path)

    def close(self) -> None:
        try:
            self._conn.commit()
        finally:
            self._conn.close()


def write_mysql_load(
    df: DataFrame,
    job: ReplicaJob,
    *,
    table: str | None = None,
    load_factory: LoadFactory | None = None,
) -> None:
    """LOAD DATA every partition of ``df`` into ``table`` (default
    job.sink_table) — the K3 fast path.

    Parallelism = partition count, capped at job.jobs×4 like the batch
    writer; each partition loads fetch-size batches independently, so
    nothing funnels through the driver.
    """
    target = table or job.sink_table
    if not target:
        raise ValueError("sink_table required for a LOAD DATA sink")
    out = df
    if job.jobs and df.rdd.getNumPartitions() > job.jobs * 4:
        out = df.coalesce(job.jobs)
    binary_cols = {
        f.name for f in out.schema.fields if isinstance(f.dataType, T.BinaryType)
    }
    sql = load_data_sql(target, out.columns, binary_cols)
    factory = load_factory or pymysql_load_factory(job)
    disable_escape = job.sink_disable_escape
    batch_rows = max(job.fetch_size, 1)

    def _load_partition(rows):
        sink = factory(sql)
        buf = bytearray()
        n = 0
        try:
            for row in rows:
                buf += encode_row(row, disable_escape=disable_escape)
                n += 1
                if n >= batch_rows:
                    sink.load(bytes(buf))
                    buf.clear()
                    n = 0
            if n:
                sink.load(bytes(buf))
        finally:
            sink.close()

    out.foreachPartition(_load_partition)
