"""Live execution of the POSTGRES dialect upsert SQL on DuckDB.

DuckDB deliberately implements PostgreSQL's SQL grammar, including the
``INSERT .. SELECT .. ON CONFLICT (pk) DO UPDATE SET c = excluded.c``
upsert this engine generates for the postgresql dialect
(PostgresqlManager.java:262-307). Running the generated text verbatim
on DuckDB is not a Postgres server test — the UNLOGGED staging DDL and
COPY paths stay container-gated — but it proves the merge template is
valid PG-grammar SQL with the intended upsert semantics on a real
engine that parses that grammar, upgrading the PG merge from
text-asserted to behavior-checked. (SQLite runs its own template live
in test_sqlite_live.py; Derby covers SQL:2003 MERGE end-to-end.)
"""

from __future__ import annotations

import duckdb
import pytest

from replicadb_spark.sql.dialects import (
    MergeSpec,
    atomic_swap_sql,
    create_staging_sql,
    merge_sql,
    truncate_sql,
)


@pytest.fixture()
def db():
    con = duckdb.connect()
    con.execute("CREATE TABLE sink (id INTEGER PRIMARY KEY, name TEXT, v DOUBLE)")
    con.execute("INSERT INTO sink VALUES (1,'one',1.0),(2,'two',2.0),(3,'three',3.0)")
    yield con
    con.close()


def _rows(con, t="sink"):
    return sorted(con.execute(f"SELECT * FROM {t}").fetchall())


def test_pg_on_conflict_upsert_semantics(db):
    db.execute("CREATE TABLE stg (id INTEGER, name TEXT, v DOUBLE)")
    db.execute("INSERT INTO stg VALUES (2,'TWO',22.0),(4,'four',4.0)")
    spec = MergeSpec(sink="sink", staging="stg",
                     columns=["id", "name", "v"], pk_columns=["id"])
    sql = merge_sql("postgresql", spec)
    assert "ON CONFLICT (id) DO UPDATE" in sql and "excluded." in sql
    db.execute(sql)
    assert _rows(db) == [
        (1, "one", 1.0), (2, "TWO", 22.0), (3, "three", 3.0), (4, "four", 4.0),
    ]
    db.execute(sql)  # retry idempotence
    assert _rows(db) == [
        (1, "one", 1.0), (2, "TWO", 22.0), (3, "three", 3.0), (4, "four", 4.0),
    ]


def test_pg_all_pk_do_nothing(db):
    db.execute("CREATE TABLE pk_only (a INTEGER, b INTEGER, PRIMARY KEY (a,b))")
    db.execute("INSERT INTO pk_only VALUES (1,1)")
    db.execute("CREATE TABLE pk_stg (a INTEGER, b INTEGER)")
    db.execute("INSERT INTO pk_stg VALUES (1,1),(2,2)")
    sql = merge_sql("postgresql", MergeSpec(
        sink="pk_only", staging="pk_stg", columns=["a", "b"], pk_columns=["a", "b"]
    ))
    assert "DO NOTHING" in sql
    db.execute(sql)
    assert _rows(db, "pk_only") == [(1, 1), (2, 2)]


def test_mysql_staging_ctas_shape_runs(db):
    # the MySQL staging clone (CTAS WHERE 1=0) is plain ANSI enough for
    # DuckDB too: structure cloned, zero rows
    db.execute(create_staging_sql("mysql", "stg2", "sink"))
    assert db.execute("SELECT COUNT(*) FROM stg2").fetchone()[0] == 0
    cols = [r[0] for r in db.execute("DESCRIBE stg2").fetchall()]
    assert cols == ["id", "name", "v"]


def test_pg_truncate_and_atomic_swap(db):
    assert truncate_sql("postgresql", "sink") == "TRUNCATE TABLE sink"
    db.execute("CREATE TABLE stg3 (id INTEGER, name TEXT, v DOUBLE)")
    db.execute("INSERT INTO stg3 VALUES (9,'nine',9.0)")
    for stmt in atomic_swap_sql("postgresql", "sink", "stg3", ["id", "name", "v"]):
        db.execute(stmt)
    assert _rows(db) == [(9, "nine", 9.0)]
