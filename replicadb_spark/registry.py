"""Scheme → reader/writer dispatch (≈ manager/ManagerFactory.java:30-68,
manager/SupportedManagers.java:46-81).

The reference dispatches a connect URL to a ConnManager subclass; here a
URL dispatches to a (kind, scheme) pair the engine uses to pick a Spark
reader/writer. JDBC sub-dialects are resolved by sql.dialects.
"""

from __future__ import annotations

from urllib.parse import urlparse

from replicadb_spark.sql.dialects import SUPPORTED_DIALECTS

FILE_SCHEMES = ("file", "hdfs", "s3", "s3a", "s3n", "gs", "abfs", "abfss")


def classify(url: str) -> tuple[str, str]:
    """Return ``(kind, scheme)`` where kind ∈ {jdbc, file, mongodb, kafka}."""
    if not url:
        raise ValueError("empty connection url")
    low = url.lower()
    if low.startswith("jdbc:"):
        return "jdbc", low.split(":")[1]
    scheme = urlparse(low).scheme or "file"
    if scheme in ("mongodb", "mongodb+srv"):
        return "mongodb", scheme
    if scheme == "kafka":
        return "kafka", scheme
    if scheme in FILE_SCHEMES:
        return "file", scheme
    if scheme in SUPPORTED_DIALECTS:
        return "jdbc", scheme
    raise ValueError(f"unsupported connection url: {url}")


def file_path(url: str) -> str:
    """Strip a ``file://`` prefix; pass cloud URLs through (s3 → s3a is
    handled by sinks.s3.rewrite_s3_url)."""
    if url.lower().startswith("file://"):
        return url[len("file://"):]
    return url
