"""Kafka JSON sink (SURVEY.md §2.2 K6; manager/KafkaManager.java:49-190).

The reference serializes each row to a typed JSON object (dates ISO-8601
UTC, binary base64 — KafkaManager.java:75-81,142-148) and produces to a
topic; a single ``json`` source column passes through verbatim
(KafkaManager.java:97-99). Both behaviors are pure DataFrame transforms
here; the actual produce needs the spark-sql-kafka package, so it is
gated and the serialization is unit-tested standalone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def to_kafka_records(df: DataFrame, key_column: str | None = None) -> DataFrame:
    """Rows → ``(key, value)`` Kafka records with the reference's JSON
    encoding rules. Passthrough mode: a single column named ``json`` is
    sent verbatim (KafkaManager.java:97-99)."""
    if df.columns == ["json"]:
        value = F.col("json")
    else:
        encoded: list[Column] = []
        for f in df.schema.fields:
            col = F.col(f.name)
            if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
                col = F.date_format(col, ISO_FMT)
            elif isinstance(f.dataType, T.DateType):
                col = F.date_format(col.cast("timestamp"), ISO_FMT)
            elif isinstance(f.dataType, T.BinaryType):
                col = F.base64(col)
            encoded.append(col.alias(f.name))
        value = F.to_json(F.struct(*encoded))
    key = F.col(key_column).cast("string") if key_column else F.lit(None).cast("string")
    return df.select(key.alias("key"), value.alias("value"))


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    *,
    key_column: str | None = None,
) -> None:  # pragma: no cover - needs spark-sql-kafka package + broker
    records = to_kafka_records(df, key_column)
    try:
        (
            records.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .save()
        )
    except Exception as exc:
        raise NotImplementedError(
            "kafka sink requires the spark-sql-kafka-0-10 package on the classpath"
        ) from exc
