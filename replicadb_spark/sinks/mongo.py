"""MongoDB sink (SURVEY.md §2.2 K5, §2.3 M3f) — gated behind the Spark
Mongo connector.

The reference bulk-writes InsertOneModel chunks
(manager/MongoDBManager.java:241-334) and upserts via a ``$merge``
aggregation keyed on unique-index columns (MongoDBManager.java:510-535).
The connector's ``replaceDocument`` + ``idFieldList`` write mode is the
same PK-replace semantics without the staging collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_mongo(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    *,
    mode: str = "append",
    id_fields: list[str] | None = None,
) -> None:  # pragma: no cover - needs mongo connector + server
    writer = (
        df.write.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .mode(mode)
    )
    if id_fields:
        writer = (
            writer.option("operationType", "replace")
            .option("idFieldList", ",".join(id_fields))
        )
    try:
        writer.save()
    except Exception as exc:
        raise NotImplementedError(
            "mongodb sink requires the mongo-spark-connector package"
        ) from exc
