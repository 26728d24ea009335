"""S3 sinks (SURVEY.md §2.2 K9/K10).

K9 (file upload) is free in Spark: ``df.write.<fmt>("s3a://...")`` — the
reference's multipart streaming upload (manager/S3Manager.java:256-289)
is what the Hadoop S3A committer already does, with job-commit atomicity
the reference lacks.

K10 (object-per-row) has no Spark builtin: each row becomes one S3 object
with key = row[key_column] and body = row[content_column]
(S3Manager.java:220-254). Implemented as a foreachPartition writer with a
per-partition client — this is one of the reference operators where
imperative per-partition code is genuinely the right Spark shape.

boto3 is not installed in this container; the client factory is injectable
and tests use a fake that records puts (tests/test_s3_sink.py).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def rewrite_s3_url(path: str) -> str:
    """``s3://`` → ``s3a://`` (the Hadoop connector scheme)."""
    if path.startswith("s3://"):
        return "s3a://" + path[len("s3://"):]
    return path


def _default_client_factory():  # pragma: no cover - needs boto3 + credentials
    import boto3

    return boto3.client("s3")


def write_object_per_row(
    df: DataFrame,
    bucket: str,
    *,
    key_column: str,
    content_column: str,
    key_prefix: str = "",
    client_factory: Callable = _default_client_factory,
) -> None:
    """K10: one S3 object per row (S3Manager.java:220-254, options at
    S3Manager.java:115-140).

    Binary columns upload verbatim; strings encode UTF-8 (the reference's
    CLOB/XML-aware path). The client is created once per partition, not
    per row — the Spark analog of the reference's one connection per task.
    """
    plan = df.select(key_column, content_column)

    def upload(rows) -> None:
        client = client_factory()
        for row in rows:
            key = key_prefix + str(row[0])
            body = row[1]
            if body is None:
                body = b""
            elif isinstance(body, str):
                body = body.encode("utf-8")
            elif isinstance(body, bytearray):
                body = bytes(body)
            client.put_object(Bucket=bucket, Key=key, Body=body)

    plan.foreachPartition(upload)
