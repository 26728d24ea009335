"""Live execution of the SQLite dialect SQL against a REAL SQLite engine.

No SQLite JDBC jar ships in this container (Derby is the only JDBC
engine on the Spark classpath), so the engine's full JDBC path can't
touch SQLite — but the risk the Derby e2e doesn't cover is the
per-dialect SQL TEXT, and Python's stdlib ``sqlite3`` is a real SQLite
engine that can execute every statement ``sql/dialects.py`` generates
for the sqlite dialect: staging CTAS, the ``INSERT .. SELECT .. WHERE
true ON CONFLICT`` upsert (SqliteManager.java:237-274 — the WHERE true
disambiguates the SELECT source from the ON CONFLICT clause, exactly
the quirk worth proving live), DELETE-as-truncate
(SqliteManager.java:320-335), the atomic swap pair, and staging drop.

This makes SQLite the second live dialect after Derby; pg/mysql/oracle/
sqlserver remain text-asserted only (no engines in the container).
"""

from __future__ import annotations

import sqlite3

import pytest

from replicadb_spark.sql.dialects import (
    MergeSpec,
    atomic_swap_sql,
    create_staging_sql,
    drop_staging_sql,
    merge_sql,
    truncate_sql,
)


@pytest.fixture()
def db():
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE sink (id INTEGER PRIMARY KEY, name TEXT, v REAL)")
    con.executemany(
        "INSERT INTO sink VALUES (?, ?, ?)",
        [(1, "one", 1.0), (2, "two", 2.0), (3, "three", 3.0)],
    )
    con.commit()
    yield con
    con.close()


def _rows(con, table="sink"):
    return sorted(con.execute(f"SELECT * FROM {table}").fetchall())


def test_sqlite_staging_merge_live(db):
    """Full incremental-mode SQL sequence: staging create → load →
    MERGE (upsert) → staging drop, each statement the generated text."""
    db.execute(create_staging_sql("sqlite", "stg", "sink"))
    # staging clones structure, empty
    assert db.execute("SELECT COUNT(*) FROM stg").fetchone()[0] == 0

    db.executemany(
        "INSERT INTO stg VALUES (?, ?, ?)",
        [(2, "TWO", 22.0), (4, "four", 4.0)],  # one update, one insert
    )
    spec = MergeSpec(
        sink="sink", staging="stg",
        columns=["id", "name", "v"], pk_columns=["id"],
    )
    db.execute(merge_sql("sqlite", spec))
    db.commit()
    assert _rows(db) == [
        (1, "one", 1.0), (2, "TWO", 22.0), (3, "three", 3.0), (4, "four", 4.0),
    ]

    db.execute(drop_staging_sql("stg"))
    with pytest.raises(sqlite3.OperationalError):
        db.execute("SELECT 1 FROM stg")


def test_sqlite_merge_all_pk_table(db):
    """All-PK edge: DO NOTHING branch (no non-pk columns to update)."""
    db.execute("CREATE TABLE pk_only (a INTEGER, b INTEGER, PRIMARY KEY (a, b))")
    db.execute("INSERT INTO pk_only VALUES (1, 1)")
    db.execute("CREATE TABLE pk_stg (a INTEGER, b INTEGER)")
    db.executemany("INSERT INTO pk_stg VALUES (?, ?)", [(1, 1), (2, 2)])
    spec = MergeSpec(
        sink="pk_only", staging="pk_stg", columns=["a", "b"], pk_columns=["a", "b"]
    )
    sql = merge_sql("sqlite", spec)
    assert "DO NOTHING" in sql
    db.execute(sql)
    assert _rows(db, "pk_only") == [(1, 1), (2, 2)]


def test_sqlite_merge_is_idempotent(db):
    """Re-running the same MERGE (retry after a partial failure) must
    not duplicate rows or change values — the PK upsert contract."""
    db.execute(create_staging_sql("sqlite", "stg", "sink"))
    db.executemany("INSERT INTO stg VALUES (?, ?, ?)", [(2, "TWO", 22.0), (4, "four", 4.0)])
    spec = MergeSpec(sink="sink", staging="stg", columns=["id", "name", "v"], pk_columns=["id"])
    db.execute(merge_sql("sqlite", spec))
    once = _rows(db)
    db.execute(merge_sql("sqlite", spec))
    assert _rows(db) == once


def test_sqlite_truncate_and_atomic_swap(db):
    """complete mode's DELETE-as-truncate and complete-atomic's
    DELETE + INSERT..SELECT pair, in one transaction."""
    assert truncate_sql("sqlite", "sink") == "DELETE FROM sink"
    db.execute(create_staging_sql("sqlite", "stg", "sink"))
    db.executemany("INSERT INTO stg VALUES (?, ?, ?)", [(9, "nine", 9.0)])
    for stmt in atomic_swap_sql("sqlite", "sink", "stg", ["id", "name", "v"]):
        db.execute(stmt)
    db.commit()
    assert _rows(db) == [(9, "nine", 9.0)]
