"""File sinks — CSV/ORC writers (SURVEY.md §2.2 K7/K8/K11/K12) plus
parquet/json/avro.

Spark-first: the reference's per-task temp files + post-job
FileChannel/OrcFile.mergeFiles concatenation (CsvFileManager.java:235-311,
OrcFileManager.java:141-196) disappear — Spark writes part-files natively
and ``single_file=True`` (coalesce(1)) reproduces the merged-single-file
behavior when a user needs one object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from replicadb_spark.sinks.s3 import rewrite_s3_url


def write_file(
    df: DataFrame,
    path: str,
    fmt: str,
    *,
    mode: str = "overwrite",
    single_file: bool = False,
    header: bool = True,
    compression: str | None = None,
    **options: str,
) -> None:
    """Format-dispatched file sink.

    ``mode='append'`` reproduces the reference's incremental file append
    (CsvFileManager.java:295-305); ``compression`` carries the ORC codec
    option (OrcFileManager.java:205-220).
    """
    fmt = fmt.lower()
    path = rewrite_s3_url(path)
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, str(v))
    if fmt == "csv":
        writer.option("header", str(header).lower()).csv(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "avro":
        try:
            writer.format("avro").save(path)
        except Exception as exc:  # pragma: no cover - environment-dependent
            raise NotImplementedError("avro writer requires the spark-avro package") from exc
    else:
        raise ValueError(f"unsupported sink file format: {fmt}")
