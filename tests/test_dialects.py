"""Dialect SQL generation — the driver-side strings the reference builds
in each ConnManager (SURVEY §2.1 S2/S5, §2.3 M3a-M3f/M4)."""

import pytest

from replicadb_spark.sql.dialects import (
    MergeSpec,
    atomic_swap_sql,
    create_staging_sql,
    dialect_from_url,
    hash_partition_predicates,
    merge_sql,
    staging_table_name,
    truncate_sql,
)


def test_dialect_from_url():
    assert dialect_from_url("jdbc:postgresql://h:5432/db") == "postgresql"
    assert dialect_from_url("jdbc:oracle:thin:@h:1521/s") == "oracle"
    assert dialect_from_url("jdbc:sqlserver://h;db=x") == "sqlserver"
    assert dialect_from_url("jdbc:mariadb://h/db") == "mariadb"
    assert dialect_from_url("jdbc:sqlite:/tmp/x.db") == "sqlite"
    assert dialect_from_url("jdbc:weird:stuff") == "jdbc"
    with pytest.raises(ValueError):
        dialect_from_url("gopher://nope")


def test_oracle_hash_predicates_cover_all_partitions():
    # parity: ora_hash(rowid, N-1) = taskId (OracleManager.java:63,75)
    preds = hash_partition_predicates("oracle", 4)
    assert preds == [f"ora_hash(rowid, 3) = {i}" for i in range(4)]


def test_sqlserver_physloc_predicates():
    # parity: ABS(CHECKSUM(%%physloc%%)) % N (SQLServerManager.java:383)
    preds = hash_partition_predicates("sqlserver", 3)
    assert preds[1] == "ABS(CHECKSUM(%%physloc%%)) % 3 = 1"


def test_generic_hash_needs_split_column():
    with pytest.raises(ValueError):
        hash_partition_predicates("postgresql", 4)
    preds = hash_partition_predicates("postgresql", 2, "id")
    assert "hashtext" in preds[0]


def test_single_job_predicate_is_trivial():
    assert hash_partition_predicates("oracle", 1) == ["1=1"]


def test_staging_ddl_dialects():
    # PG UNLOGGED (PostgresqlManager.java:246), Oracle NOLOGGING
    # (OracleManager.java:277), SQLServer SELECT INTO (SQLServerManager.java:262-282)
    assert "UNLOGGED" in create_staging_sql("postgresql", "s", "t")
    assert "NOLOGGING" in create_staging_sql("oracle", "s", "t")
    assert create_staging_sql("sqlserver", "s", "t").startswith("SELECT * INTO s")
    assert "WHERE 1 = 0" in create_staging_sql("mysql", "s", "t")


def test_staging_name_is_repdbNN():
    # ConnManager.java:144-167 format
    assert staging_table_name(7).startswith("repdb")
    assert staging_table_name(7, "stg") == f"stg.{staging_table_name(7)}"
    # reference parity: random name is <sink-or-alias> + repdbNN
    assert staging_table_name(7, base="t_sink") == f"t_sinkrepdb{7 % 100:02d}"
    assert staging_table_name(7, "stg", "als") == f"stg.alsrepdb{7 % 100:02d}"


def test_truncate_fallback_sqlite():
    # SqliteManager.java:320-335: DELETE, not TRUNCATE
    assert truncate_sql("sqlite", "t") == "DELETE FROM t"
    assert truncate_sql("postgresql", "t") == "TRUNCATE TABLE t"


SPEC = MergeSpec(sink="t", staging="s", columns=["id", "a", "b"], pk_columns=["id"])


def test_merge_postgres_on_conflict():
    sql = merge_sql("postgresql", SPEC)
    assert "ON CONFLICT (id) DO UPDATE SET a = excluded.a, b = excluded.b" in sql


def test_merge_oracle_merge_into():
    sql = merge_sql("oracle", SPEC)
    assert sql.startswith("MERGE INTO t trg USING")
    assert "WHEN MATCHED THEN UPDATE SET trg.a = src.a" in sql
    assert "WHEN NOT MATCHED THEN INSERT (id, a, b)" in sql


def test_merge_mysql_on_duplicate():
    sql = merge_sql("mysql", SPEC)
    assert "ON DUPLICATE KEY UPDATE a = excluded.a" in sql


def test_merge_sqlite_where_true():
    # SqliteManager.java:252-255 requires WHERE true before ON CONFLICT
    sql = merge_sql("sqlite", SPEC)
    assert "WHERE true ON CONFLICT (id)" in sql


def test_merge_all_pk_skips_update():
    # SQLServerManager.java:327-332 edge case: every column is a PK
    spec = MergeSpec(sink="t", staging="s", columns=["id"], pk_columns=["id"])
    sql = merge_sql("sqlserver", spec)
    assert "WHEN MATCHED" not in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql


def test_merge_requires_pks():
    with pytest.raises(ValueError):
        MergeSpec(sink="t", staging="s", columns=["a"], pk_columns=[])
    with pytest.raises(ValueError):
        MergeSpec(sink="t", staging="s", columns=["a"], pk_columns=["id"])


def test_atomic_swap_is_delete_then_insert():
    stmts = atomic_swap_sql("postgresql", "t", "s", ["id", "a"])
    assert stmts[0] == "DELETE FROM t"
    assert stmts[1] == "INSERT INTO t (id, a) SELECT id, a FROM s"
