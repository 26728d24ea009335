"""Golden-fixture round-trips for the COPY / LOAD DATA text encodings.

The fixture mirrors the reference's wide-type source row
(``src/test/resources/postgres/pg-source.sql:17-58``): every
Spark-representable column family the reference's 28-column t_source
exercises — exact numerics (int/smallint/bigint/two decimals),
approximate numerics (float/double), three binary columns (incl. bytes
that collide with the escape alphabet), boolean, five character columns
(incl. separator/terminator/backslash collisions and non-ASCII),
date/timestamp, array/xml/json shipped as their text forms (the
reference moves them via JDBC getString) — plus the reference's
all-NULL row (``pg-source.sql:119-151``).

Each test DECODES the produced stream with an independent decoder
implementing the server's documented parsing rules (PG COPY text /
MySQL LOAD DATA escape grammar) and asserts the decoded values equal
the originals — so every T1–T13 type provably crosses the wire format
and back, including the two reference bugs the writers deliberately
fix (binary double-escape, raw 0x1F column shift).
"""

from __future__ import annotations

import datetime
import glob
import os
from decimal import Decimal

import pytest

from replicadb_spark.options import ReplicaJob
from replicadb_spark.sinks import mysql_load as M
from replicadb_spark.sinks import pg_copy as P

TRICKY = "back\\slash\nnew\rline\x1fsep\ttab é¥—end"
NASTY_BYTES = bytes([0x00, 0x0A, 0x0D, 0x1F, 0x5C, 0xDE, 0xAD, 0xBE, 0xEF])

SCHEMA = (
    "c_integer int, c_smallint smallint, c_bigint bigint, "
    "c_numeric decimal(28,6), c_decimal decimal(10,2), "
    "c_real float, c_double double, "
    "c_binary binary, c_binary_var binary, c_binary_lob binary, "
    "c_boolean boolean, "
    "c_character string, c_character_var string, c_character_lob string, "
    "c_national_character string, c_national_character_var string, "
    "c_date date, c_timestamp timestamp, "
    "c_array string, c_xml string, c_json string"
)


def _fixture_df(spark):
    full = (
        1, 12, 2**60 + 3,
        Decimal("123456789.123456"), Decimal("99999999.99"),
        1.5, 2.718281828459045,
        b"\xde\xad\xbe\xef", b"", NASTY_BYTES,
        True,
        TRICKY, "plain varchar", "x" * 300,
        "ñandú 中文", "ünïcode",
        datetime.date(2024, 2, 29),
        datetime.datetime(2024, 2, 29, 23, 59, 58, 123456),
        "{a,b}", "<p><a>1</a></p>", '{"firstName": "1", "age": 2}',
    )
    nulls = (2,) + (None,) * 20  # the reference's all-NULL row (PK set)
    return spark.createDataFrame([full, nulls], SCHEMA).coalesce(1)


# --------------------------------------------------------------- decoders

def _pg_decode_field(b: bytes):
    """PG COPY text field per the server's rules: \\N = NULL, \\\\ \\n
    \\r literal escapes, \\xHH hex byte; raw 0x1F/0x0A never occur
    inside a value (that's the corruption the writer prevents)."""
    if b == b"\\N":
        return None
    out = bytearray()
    i = 0
    while i < len(b):
        if b[i] == 0x5C:
            nxt = b[i + 1 : i + 2]
            if nxt == b"n":
                out += b"\n"
            elif nxt == b"r":
                out += b"\r"
            elif nxt == b"x":
                out.append(int(b[i + 2 : i + 4], 16))
                i += 4
                continue
            else:
                out += nxt
            i += 2
        else:
            out.append(b[i])
            i += 1
    return bytes(out)


def _mysql_split(data: bytes):
    """Stateful LOAD DATA splitter: backslash escapes the next byte, so
    0x1F/0x0A terminate fields/rows ONLY when unescaped."""
    rows, field, row = [], bytearray(), []
    esc = False
    for byte in data:
        if esc:
            field.append(0x5C)
            field.append(byte)
            esc = False
        elif byte == 0x5C:
            esc = True
        elif byte == 0x1F:
            row.append(bytes(field))
            field = bytearray()
        elif byte == 0x0A:
            row.append(bytes(field))
            rows.append(row)
            field, row = bytearray(), []
        else:
            field.append(byte)
    return rows


def _mysql_decode_field(b: bytes):
    if b == b"\\N":
        return None
    out = bytearray()
    i = 0
    while i < len(b):
        if b[i] == 0x5C:
            nxt = b[i + 1]
            if nxt == ord("n"):
                out += b"\n"
            elif nxt == ord("r"):
                out += b"\r"
            elif nxt == ord("0"):
                out += b"\x00"
            else:  # \\ -> \, \<sep> -> sep, \<other> -> other
                out.append(nxt)
            i += 2
        else:
            out.append(b[i])
            i += 1
    return bytes(out)


def _expected_fields(row, *, mysql: bool):
    """What decoding must recover, per column, from the original row."""
    out = []
    for v in row:
        if v is None:
            out.append(None)
        elif isinstance(v, (bytes, bytearray)):
            # PG: bytea hex input form survives one unescape level;
            # MySQL: bare hex for the UNHEX(@var) redirect
            out.append(bytes(v).hex() if mysql else "\\x" + bytes(v).hex())
        elif isinstance(v, bool):
            out.append(("1" if v else "0") if mysql else ("true" if v else "false"))
        else:
            out.append(str(v))
    return out


# --------------------------------------------------------------- factories

def _pg_file_factory(directory):
    def factory(sql):
        import os as _os
        import uuid as _uuid

        f = open(_os.path.join(directory, f"g-{_uuid.uuid4().hex}.copy"), "ab")

        class _Sink:
            def write(self, data):
                f.write(data)

            def close(self):
                f.close()

        return _Sink()

    return factory


def _mysql_file_factory(directory):
    def factory(sql):
        import os as _os
        import uuid as _uuid

        path = _os.path.join(directory, f"g-{_uuid.uuid4().hex}.infile")

        class _Sink:
            def load(self, data):
                with open(path, "ab") as f:
                    f.write(data)

            def close(self):
                pass

        return _Sink()

    return factory


# ------------------------------------------------------------------ tests

def _decoded_rows(files, decode_field, split=None):
    assert len(files) == 1
    with open(files[0], "rb") as fh:
        data = fh.read()
    if split is not None:
        raw_rows = split(data)
    else:
        raw_rows = [ln.split(b"\x1f") for ln in data.split(b"\n") if ln]
    decoded = [[decode_field(f) for f in row] for row in raw_rows]
    # key on the integer PK (first column) — partition order isn't a contract
    return sorted(decoded, key=lambda r: int(r[0]))


def test_pg_copy_golden_roundtrip(spark, tmp_path):
    df = _fixture_df(spark)
    job = ReplicaJob(
        source_connect="jdbc:postgresql://s/db",
        sink_connect="jdbc:postgresql://d/db",
        sink_table="t_sink",
    )
    P.write_postgres_copy(df, job, copy_factory=_pg_file_factory(str(tmp_path)))
    got = _decoded_rows(glob.glob(os.path.join(str(tmp_path), "g-*.copy")), _pg_decode_field)

    want_rows = sorted(df.collect(), key=lambda r: r[0])
    assert len(got) == 2
    for got_row, src in zip(got, want_rows):
        want = _expected_fields(src, mysql=False)
        assert len(got_row) == len(want) == 21
        for g, w in zip(got_row, want):
            assert (g.decode("utf-8") if g is not None else None) == w


def test_mysql_load_golden_roundtrip(spark, tmp_path):
    df = _fixture_df(spark)
    job = ReplicaJob(
        source_connect="jdbc:mysql://s/db",
        sink_connect="jdbc:mysql://d/db",
        sink_table="t_sink",
        fetch_size=1,  # force one loader call per row (batch boundary between rows)
    )
    M.write_mysql_load(df, job, load_factory=_mysql_file_factory(str(tmp_path)))
    got = _decoded_rows(
        glob.glob(os.path.join(str(tmp_path), "g-*.infile")),
        _mysql_decode_field,
        split=_mysql_split,
    )

    want_rows = sorted(df.collect(), key=lambda r: r[0])
    assert len(got) == 2
    for got_row, src in zip(got, want_rows):
        want = _expected_fields(src, mysql=True)
        assert len(got_row) == len(want) == 21
        for g, w in zip(got_row, want):
            assert (g.decode("utf-8") if g is not None else None) == w


def test_binary_survives_escape_mode_unlike_reference():
    """The reference escapes AFTER building \\x<hex>, double-escaping
    the backslash so the server cannot decode escaped-mode binary
    (PostgresqlManager.java:105,136). Our writer emits the wire form
    exempt from the generic escape: one unescape level must yield the
    exact bytea hex literal."""
    encoded = P.encode_value(b"\xde\xad", disable_escape=False)
    assert _pg_decode_field(encoded.encode()) == b"\\xdead"
    # and a *string* that happens to look like hex binary still escapes
    s = P.encode_value("\\xdead", disable_escape=False)
    assert _pg_decode_field(s.encode()) == b"\\xdead"
