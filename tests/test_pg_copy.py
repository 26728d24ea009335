"""Postgres COPY fast-path writer (sinks/pg_copy.py, K2).

No live Postgres in this container, so coverage is (a) byte-exact
encoding vs the reference's rules (PostgresqlManager.java:93-145) and
(b) the foreachPartition plumbing with an injected file-backed factory,
decoding the streams back.
"""

import datetime
import decimal
import glob
import os
import uuid

import pytest

from replicadb_spark.options import ReplicaJob
from replicadb_spark.sinks import pg_copy as P


def test_copy_sql_shape():
    sql = P.copy_sql("public.t1", ["a", "b"])
    assert sql == "COPY public.t1 (a, b) FROM STDIN WITH DELIMITER e'\\x1f' ENCODING 'UTF-8' "


def test_encode_null_is_backslash_n():
    assert P.encode_value(None) == "\\N"


def test_encode_escapes():
    # PostgresqlManager.java:136-139: \ -> \\, LF -> \n, CR -> \r
    assert P.encode_value("a\\b") == "a\\\\b"
    assert P.encode_value("a\nb") == "a\\nb"
    assert P.encode_value("a\rb") == "a\\rb"
    # deviation (documented): data 0x1F escaped, not left to shift columns
    assert P.encode_value("a\x1fb") == "a\\x1fb"


def test_encode_disable_escape_passthrough():
    assert P.encode_value("a\\b\nc", disable_escape=True) == "a\\b\nc"


def test_encode_binary_pg_hex():
    # wire form \\x<hex> -> server text \x<hex> -> bytea
    assert P.encode_value(b"\x00\xff") == "\\\\x00ff"
    assert P.encode_value(bytearray(b"\x1f")) == "\\\\x1f"


def test_encode_scalars():
    assert P.encode_value(True) == "true"
    assert P.encode_value(False) == "false"
    assert P.encode_value(decimal.Decimal("12.340")) == "12.340"
    assert P.encode_value(datetime.date(2026, 8, 13)) == "2026-08-13"
    assert P.encode_value(datetime.datetime(2026, 8, 13, 1, 2, 3)) == "2026-08-13 01:02:03"


def test_encode_row_delimiter_and_terminator():
    row = P.encode_row([1, None, "x"])
    assert row == b"1\x1f\\N\x1fx\n"


def _file_factory(directory):
    # everything defined inside the closure so cloudpickle ships it by
    # value (the test module is not importable on executor workers)
    def factory(sql):
        import os as _os
        import uuid as _uuid

        f = open(_os.path.join(directory, f"part-{_uuid.uuid4().hex}.copy"), "ab")

        class _Sink:
            def write(self, data):
                f.write(data)

            def close(self):
                f.close()

        # one stream per partition, like one CopyIn per ReplicaTask
        return _Sink()

    return factory


def test_write_postgres_copy_streams_partitions(spark, tmp_path):
    job = ReplicaJob(
        source_connect="jdbc:postgresql://src/db",
        sink_connect="jdbc:postgresql://dst/db",
        sink_table="t_out",
        jobs=2,
    )
    df = spark.createDataFrame(
        [(1, "plain", None), (2, "needs\\escape", "v"), (3, "multi\nline", "w")],
        ["id", "txt", "opt"],
    ).repartition(2)
    out_dir = str(tmp_path)
    P.write_postgres_copy(df, job, copy_factory=_file_factory(out_dir))

    files = glob.glob(os.path.join(out_dir, "part-*.copy"))
    assert len(files) == 2  # one COPY stream per partition
    lines = []
    for f in files:
        with open(f, "rb") as fh:
            lines += [ln for ln in fh.read().split(b"\n") if ln]
    decoded = sorted(ln.split(b"\x1f") for ln in lines)
    assert decoded == [
        [b"1", b"plain", b"\\N"],
        [b"2", b"needs\\\\escape", b"v"],
        [b"3", b"multi\\nline", b"w"],
    ]


def test_default_factory_gated_without_client_lib():
    job = ReplicaJob(
        source_connect="jdbc:postgresql://src/db",
        sink_connect="jdbc:postgresql://dst/db",
        sink_table="t",
    )
    with pytest.raises(NotImplementedError):
        P.psycopg_copy_factory(job)
