"""MySQL LOAD DATA fast-path writer (sinks/mysql_load.py, K3).

No live MySQL in this container, so coverage is (a) byte-exact encoding
and SQL shape vs the reference's rules (MySQLManager.java:99-227) and
(b) the foreachPartition + fetch-size batching plumbing with an
injected recording factory.
"""

import datetime
import decimal
import glob
import os

import pytest

from replicadb_spark.options import ReplicaJob
from replicadb_spark.sinks import mysql_load as M


def test_load_sql_plain_columns():
    sql = M.load_data_sql("t1", ["a", "b"], set())
    assert sql == (
        "LOAD DATA LOCAL INFILE '__REPLICADB_INFILE__' INTO TABLE t1"
        " CHARACTER SET UTF8 FIELDS TERMINATED BY X'1F' (a, b)"
    )


def test_load_sql_binary_unhex_redirect():
    # binary columns go through @var + SET UNHEX (MySQLManager.java:177-227)
    sql = M.load_data_sql("t1", ["id", "payload", "v"], {"payload"})
    assert "(id, @payload, v)" in sql
    assert sql.endswith("SET payload=UNHEX(@payload)")


def test_encode_null_escape_binary():
    assert M.encode_value(None) == "\\N"
    assert M.encode_value("a\\b\nc\rd") == "a\\\\b\\nc\\rd"
    assert M.encode_value("x", disable_escape=True) == "x"
    # bare hex, no \x prefix — UNHEX decodes it (MySQLManager.java:105-111)
    assert M.encode_value(b"\x00\xff") == "00ff"
    assert M.encode_value(True) == "1"
    assert M.encode_value(decimal.Decimal("3.50")) == "3.50"
    assert M.encode_value(datetime.date(2026, 8, 13)) == "2026-08-13"


def test_encode_row():
    assert M.encode_row([1, None, "x"]) == b"1\x1f\\N\x1fx\n"


def _recording_factory(directory):
    # defined-by-value for executor pickling (see test_pg_copy)
    def factory(sql):
        import os as _os
        import uuid as _uuid

        base = _os.path.join(directory, f"p-{_uuid.uuid4().hex}")

        class _Sink:
            def __init__(self):
                self.calls = 0

            def load(self, data):
                with open(f"{base}-batch{self.calls}.load", "wb") as f:
                    f.write(data)
                self.calls += 1

            def close(self):
                with open(f"{base}.sql", "w") as f:
                    f.write(sql)

        return _Sink()

    return factory


def test_write_mysql_load_batches_by_fetch_size(spark, tmp_path):
    job = ReplicaJob(
        source_connect="jdbc:mysql://src/db",
        sink_connect="jdbc:mysql://dst/db",
        sink_table="t_out",
        jobs=1,
        fetch_size=2,  # 5 rows in 1 partition → batches of 2,2,1
    )
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(5)], ["id", "v"]
    ).coalesce(1)
    out = str(tmp_path)
    M.write_mysql_load(df, job, load_factory=_recording_factory(out))

    batches = sorted(glob.glob(os.path.join(out, "*-batch*.load")))
    assert len(batches) == 3  # one loader call per fetch-size batch
    rows = []
    for b in batches:
        with open(b, "rb") as f:
            rows += [ln for ln in f.read().split(b"\n") if ln]
    assert sorted(rows) == sorted(f"{i}\x1fv{i}".encode() for i in range(5))

    (sqlfile,) = glob.glob(os.path.join(out, "*.sql"))
    with open(sqlfile) as f:
        assert "INTO TABLE t_out" in f.read()


def test_default_factory_gated_without_client_lib():
    job = ReplicaJob(
        source_connect="jdbc:mysql://src/db",
        sink_connect="jdbc:mysql://dst/db",
        sink_table="t",
    )
    with pytest.raises(NotImplementedError):
        M.pymysql_load_factory(job)
