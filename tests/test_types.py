"""Type normalization pipe (SURVEY §1.3 / §2.4 T1-T13)."""

from datetime import date, datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from replicadb_spark import types as tp


def test_schema_from_declared_types():
    # CSV declared-type parity (CsvFileManager.java:215-220)
    s = tp.schema_from_declared_types(
        ["a", "b", "c", "d", "e"],
        ["VARCHAR", "INTEGER", "DECIMAL(10,2)", "TIMESTAMP", "mystery"],
    )
    assert s["a"].dataType == T.StringType()
    assert s["b"].dataType == T.IntegerType()
    assert s["c"].dataType == T.DecimalType(10, 2)
    assert s["d"].dataType == T.TimestampType()
    # unknown → string fallback (OracleManager.java:213-215)
    assert s["e"].dataType == T.StringType()


def test_boolean_lexical(spark):
    # CsvCachedRowSetImpl.java:323-330 lexicon
    df = spark.createDataFrame(
        [("1",), ("yes",), ("TRUE",), ("on",), ("0",), ("no",), ("off",), ("maybe",), (None,)],
        ["v"],
    )
    got = [r[0] for r in df.select(tp.boolean_lexical(F.col("v"))).collect()]
    assert got == [True, True, True, True, False, False, False, None, None]


def test_binary_to_hex_postgres_and_mysql(spark):
    df = spark.createDataFrame([(bytearray(b"\xde\xad"),), (None,)], ["b"])
    pg = [r[0] for r in df.select(tp.binary_to_hex(F.col("b"))).collect()]
    assert pg == ["\\xdead", None]          # PostgresqlManager.java:363-393
    my = [r[0] for r in df.select(tp.binary_to_hex(F.col("b"), prefix="")).collect()]
    assert my == ["DEAD", None]             # MySQLManager.java:369-391 upper-hex


def test_base64_and_iso8601(spark):
    df = spark.createDataFrame(
        [(bytearray(b"hi"), datetime(2020, 5, 17, 12, 30, 45))], ["b", "ts"]
    )
    row = df.select(
        tp.binary_to_base64(F.col("b")).alias("b64"),
        tp.timestamp_to_iso8601(F.col("ts")).alias("iso"),
    ).first()
    assert row["b64"] == "aGk="
    assert row["iso"].startswith("2020-05-17T12:30:45.000")  # KafkaManager.java:75-81


def test_null_normalize(spark):
    # T6: '' and \N → NULL (CsvCachedRowSetImpl.java:332-341)
    df = spark.createDataFrame([("",), ("\\N",), ("x",)], ["v"])
    got = [r[0] for r in df.select(tp.null_normalize(F.col("v"))).collect()]
    assert got == [None, None, "x"]


def test_epoch_conversions(spark):
    # T9 (time/Conversions.java:17-91)
    df = spark.createDataFrame([(18000, 1589718645000, 1589718645000000)], ["d", "ms", "us"])
    row = df.select(
        tp.epoch_days_to_date(F.col("d")).alias("dt"),
        tp.epoch_millis_to_timestamp(F.col("ms")).alias("tms"),
        tp.epoch_micros_to_timestamp(F.col("us")).alias("tus"),
    ).first()
    assert row["dt"] == date(2019, 4, 14)
    assert row["tms"] == row["tus"] == datetime(2020, 5, 17, 12, 30, 45)


def test_quote_identifier():
    # T12 (ConnManager.java:86-115)
    assert tp.quote_identifier("a b") == '"a b"'
    assert tp.quote_identifier('we"ird') == '"we""ird"'


def test_normalize_frame_round_trip(spark):
    # whole-row pipe: cast into a declared sink schema
    src = spark.createDataFrame([("1", "2.50", "true")], ["i", "d", "b"])
    target = T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("d", T.DecimalType(10, 2)),
        T.StructField("b", T.BooleanType()),
    ])
    out = tp.normalize_frame(src, target)
    assert [f.dataType for f in out.schema.fields] == [
        T.IntegerType(), T.DecimalType(10, 2), T.BooleanType()
    ]
    assert out.first() == (1, Decimal("2.50"), True)
