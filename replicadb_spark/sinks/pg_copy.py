"""Postgres ``COPY FROM STDIN`` fast path (SURVEY.md §2.2 K2).

Exact-parity re-expression of the reference's CopyManager loop
(``manager/PostgresqlManager.java:49-192``): each Spark partition opens
one COPY stream and feeds it the text-format encoding the reference
builds row-by-row —

- ``COPY <table> (<cols>) FROM STDIN WITH DELIMITER e'\\x1f' ENCODING
  'UTF-8'`` (``PostgresqlManager.java:173-191``);
- column separator 0x1F, row terminator ``\\n``;
- SQL NULL → ``\\N`` (the reference stages nulls as ``\\u0000`` and
  rewrites them after escaping, ``PostgresqlManager.java:135-139``);
- escaping ``\\`` → ``\\\\``, LF → ``\\n``, CR → ``\\r`` unless
  ``sink.disable.escape`` (``PostgresqlManager.java:136-139``, T7);
- binary → Postgres hex form (``PostgresqlManager.java:383-393``).

Two deliberate deviations, both corruption fixes, not behavior drift:

1. Binary values are emitted as the wire form ``\\\\x<hex>`` and are
   EXEMPT from the generic backslash escape. The reference builds
   ``\\\\x<hex>`` and then doubles its backslashes again in the generic
   escape pass, which makes escaped-mode binary undecodable by the
   server (only its ``disable.escape`` path round-trips). Citing
   ``PostgresqlManager.java:105,136`` — order of those two steps.
2. A literal 0x1F byte inside a string value is escaped as ``\\x1f``
   (COPY text accepts ``\\xDIGITS``); the reference writes it raw,
   which shifts every later column in the row.

The per-partition plumbing mirrors the reference's task model: one
connection + one CopyIn per ReplicaTask becomes one ``copy_factory``
call per partition inside ``foreachPartition``. The factory is
injectable because this container has no live Postgres or client lib —
production default is a psycopg-backed factory (import-gated), tests
inject a file-backed one and decode the stream.
"""

from __future__ import annotations

import datetime
import decimal
from typing import Callable, Iterable, Protocol

from pyspark.sql import DataFrame

from replicadb_spark.options import ReplicaJob

COPY_DELIMITER = "\x1f"


class CopySink(Protocol):
    """What a copy_factory must return: a byte sink for ONE COPY stream."""

    def write(self, data: bytes) -> None: ...

    def close(self) -> None: ...


# copy_factory(copy_sql) -> CopySink, invoked ON THE EXECUTOR once per
# partition; must be picklable (top-level function / functools.partial).
CopyFactory = Callable[[str], CopySink]


def copy_sql(table: str, columns: list[str]) -> str:
    """The COPY meta-command (PostgresqlManager.java:173-191)."""
    cols = f" ({', '.join(columns)})" if columns else ""
    return f"COPY {table}{cols} FROM STDIN WITH DELIMITER e'\\x1f' ENCODING 'UTF-8' "


def encode_value(v, *, disable_escape: bool = False) -> str:
    """One column value → COPY text-format field (see module docstring)."""
    if v is None:
        return "\\N"
    if isinstance(v, (bytes, bytearray)):
        # wire form \\x<hex>: server strips one backslash level → \x<hex>
        return "\\\\x" + bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (datetime.datetime, datetime.date, decimal.Decimal, int, float)):
        return str(v)
    s = str(v)
    if not disable_escape:
        s = (
            s.replace("\\", "\\\\")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace(COPY_DELIMITER, "\\x1f")
        )
    return s


def encode_row(values: Iterable, *, disable_escape: bool = False) -> bytes:
    """One row → delimited, escaped, LF-terminated UTF-8 bytes."""
    return (
        COPY_DELIMITER.join(encode_value(v, disable_escape=disable_escape) for v in values)
        + "\n"
    ).encode("utf-8")


def psycopg_copy_factory(job: ReplicaJob) -> CopyFactory:
    """Production factory: one psycopg/psycopg2 connection per partition.

    Import-gated: neither client lib ships in this container, so the
    gate raises at factory-build time (driver side), never mid-write.
    """
    try:  # psycopg3 first, psycopg2 fallback
        import psycopg  # noqa: F401
    except ImportError:
        try:
            import psycopg2  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "postgres COPY fast path needs psycopg or psycopg2 on the "
                "executors; install one or inject copy_factory="
            ) from exc

    url, user, password = job.sink_connect, job.sink_user, job.sink_password

    def factory(sql: str) -> CopySink:
        return _PsycopgSink(url, user, password, sql)

    return factory


class _PsycopgSink:
    """COPY stream over a dedicated connection; commit on close —
    the reference's per-task connection.commit() (PostgresqlManager.java:168)."""

    def __init__(self, url: str, user: str | None, password: str | None, sql: str):
        try:
            import psycopg

            dsn = url.replace("jdbc:postgresql://", "postgresql://", 1)
            self._conn = psycopg.connect(dsn, user=user, password=password)
            self._copy_ctx = self._conn.cursor().copy(sql)
            self._copy = self._copy_ctx.__enter__()
            self._v3 = True
        except ImportError:
            import io

            import psycopg2

            dsn = url.replace("jdbc:postgresql://", "postgresql://", 1)
            self._conn = psycopg2.connect(dsn, user=user, password=password)
            self._buf = io.BytesIO()
            self._sql = sql
            self._v3 = False

    def write(self, data: bytes) -> None:
        if self._v3:
            self._copy.write(data)
        else:
            self._buf.write(data)

    def close(self) -> None:
        try:
            if self._v3:
                self._copy_ctx.__exit__(None, None, None)
            else:
                self._buf.seek(0)
                cur = self._conn.cursor()
                cur.copy_expert(self._sql, self._buf)
                cur.close()
            self._conn.commit()
        finally:
            self._conn.close()


class _BufferedSink:
    """Batches encoded rows into ~chunk_bytes writes — the CopyIn
    writeToCopy granularity without a syscall per row."""

    def __init__(self, inner: CopySink, chunk_bytes: int = 1 << 20):
        self._inner = inner
        self._chunk = chunk_bytes
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf += data
        if len(self._buf) >= self._chunk:
            self._inner.write(bytes(self._buf))
            self._buf.clear()

    def close(self) -> None:
        try:
            if self._buf:
                self._inner.write(bytes(self._buf))
                self._buf.clear()
        finally:
            self._inner.close()


def write_postgres_copy(
    df: DataFrame,
    job: ReplicaJob,
    *,
    table: str | None = None,
    copy_factory: CopyFactory | None = None,
    chunk_bytes: int = 1 << 20,
) -> None:
    """COPY every partition of ``df`` into ``table`` (default
    job.sink_table) — the K2 fast path.

    Parallelism = partition count, capped at job.jobs×4 like the batch
    writer (the reference runs exactly ``jobs`` ReplicaTasks); each
    partition streams independently, so the load is distributed and
    nothing funnels through the driver.
    """
    target = table or job.sink_table
    if not target:
        raise ValueError("sink_table required for a COPY sink")
    out = df
    if job.jobs and df.rdd.getNumPartitions() > job.jobs * 4:
        out = df.coalesce(job.jobs)
    sql = copy_sql(target, out.columns)
    factory = copy_factory or psycopg_copy_factory(job)
    disable_escape = job.sink_disable_escape

    def _write_partition(rows):
        sink = _BufferedSink(factory(sql), chunk_bytes)
        try:
            for row in rows:
                sink.write(encode_row(row, disable_escape=disable_escape))
        finally:
            sink.close()

    out.foreachPartition(_write_partition)
