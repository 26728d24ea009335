"""MongoDB source (SURVEY.md §2.1 S8/S9) — gated behind the Spark Mongo
connector (not shipped in this container).

Parity notes: the reference paginates ``find()`` with skip/limit +
``sort(_id)`` for stability (manager/MongoDBManager.java:161-204) and
parses ``source-query`` as an aggregation pipeline
(MongoDBManager.java:139-160, 226-230). The Spark connector's
partitioners replace skip/limit pagination; the aggregation pipeline
passes through via ``aggregation.pipeline``. Schema comes from
full-collection inference — a strict upgrade over the reference's
first-document inference (MongoDBRowSetImpl.java:75-149).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_mongo(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    *,
    pipeline: str | None = None,
    projection: list[str] | None = None,
) -> DataFrame:  # pragma: no cover - needs mongo connector + server
    reader = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )
    if pipeline:
        reader = reader.option("aggregation.pipeline", pipeline)
    try:
        df = reader.load()
    except Exception as exc:
        raise NotImplementedError(
            "mongodb source requires the mongo-spark-connector package"
        ) from exc
    return df.select(*projection) if projection else df
