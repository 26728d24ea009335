"""Dialect SQL generation: partition predicates, staging DDL, MERGE upserts.

These are the driver-side SQL strings the reference builds inside each
ConnManager subclass (SURVEY.md §2.1 S2-S8, §2.3 M3a-M3f, M4). They are
pure functions so they can be unit-tested without a database; engine.py
executes them over a single JDBC connection where needed.
"""

from __future__ import annotations

from dataclasses import dataclass

SUPPORTED_DIALECTS = (
    "oracle", "postgresql", "mysql", "mariadb", "sqlserver", "sqlite",
    "db2", "denodo", "derby",
)


def dialect_from_url(url: str) -> str:
    """Scheme → dialect, mirroring ManagerFactory.accept
    (manager/ManagerFactory.java:30-68, manager/SupportedManagers.java:46-81)."""
    u = url.lower()
    for d in SUPPORTED_DIALECTS:
        if u.startswith(f"jdbc:{d}:") or u.startswith(f"{d}:"):
            return d
    if u.startswith("jdbc:as400:") or u.startswith("jdbc:db2:"):
        return "db2"
    if u.startswith("jdbc:vdb:"):
        return "denodo"
    if u.startswith("jdbc:"):
        return "jdbc"  # StandardJDBCManager fallback
    raise ValueError(f"unsupported connection url: {url}")


# --- partitioned-scan predicates (S2, S5, generic) -------------------------

def hash_partition_predicates(dialect: str, n: int, split_by: str | None = None) -> list[str]:
    """N mutually-exclusive, collectively-exhaustive hash predicates for
    ``spark.read.jdbc(predicates=...)``.

    Parity: Oracle ``ora_hash(rowid, N-1) = i`` (OracleManager.java:63,75),
    SQL Server ``ABS(CHECKSUM(%%physloc%%)) % N = i``
    (SQLServerManager.java:383,395). Generic dialects hash a user split
    column instead (the reference falls back to OFFSET pages there — a
    quirk we deliberately do not copy, SURVEY §7.4).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return ["1=1"]
    if dialect == "oracle":
        return [f"ora_hash(rowid, {n - 1}) = {i}" for i in range(n)]
    if dialect == "sqlserver":
        return [f"ABS(CHECKSUM(%%physloc%%)) % {n} = {i}" for i in range(n)]
    if split_by is None:
        raise ValueError(f"dialect {dialect!r} needs source_split_by for hash partitioning")
    if dialect in ("postgresql", "denodo"):
        return [f"abs(hashtext({split_by}::text)) % {n} = {i}" for i in range(n)]
    if dialect in ("mysql", "mariadb"):
        return [f"crc32({split_by}) % {n} = {i}" for i in range(n)]
    # generic ANSI-ish fallback: modulo on the split column itself
    return [f"mod(abs({split_by}), {n}) = {i}" for i in range(n)]


# --- staging DDL (M4) ------------------------------------------------------

def staging_table_name(
    seed: int, schema: str | None = None, base: str | None = None
) -> str:
    """``<base>repdb<NN>`` random staging name (ConnManager.java:144-167),
    seeded per-job instead of the reference's process-global static.

    ``base`` is the sink table's unqualified name — or the user's
    ``sink-staging-table-alias``, which exists because table + suffix
    can exceed an engine's identifier length limit
    (ConnManager.java:157-162)."""
    name = f"{base or ''}repdb{seed % 100:02d}"
    return f"{schema}.{name}" if schema else name


def create_staging_sql(dialect: str, staging: str, sink: str) -> str:
    """Clone sink structure into an (unlogged where possible) staging table.

    Oracle NOLOGGING CTAS (OracleManager.java:262-284), PG UNLOGGED LIKE
    (PostgresqlManager.java:239-259), MySQL CTAS WHERE 1=0
    (MySQLManager.java:230-250), SQL Server SELECT INTO WHERE 0=1
    (SQLServerManager.java:262-282), SQLite CTAS (SqliteManager.java:211-234).
    """
    if dialect == "oracle":
        return f"CREATE TABLE {staging} NOLOGGING AS (SELECT * FROM {sink} WHERE rownum = -1)"
    if dialect == "postgresql":
        return (
            f"CREATE UNLOGGED TABLE {staging} "
            f"(LIKE {sink} INCLUDING DEFAULTS INCLUDING CONSTRAINTS) "
            f"WITH (autovacuum_enabled=false)"
        )
    if dialect in ("mysql", "mariadb"):
        return f"CREATE TABLE {staging} AS SELECT * FROM {sink} WHERE 1 = 0"
    if dialect == "sqlserver":
        return f"SELECT * INTO {staging} FROM {sink} WHERE 0 = 1"
    if dialect in ("derby", "db2"):
        # SQL-standard CTAS form; Derby/DB2 require WITH NO DATA
        return f"CREATE TABLE {staging} AS SELECT * FROM {sink} WITH NO DATA"
    return f"CREATE TABLE {staging} AS SELECT * FROM {sink} WHERE 1 = 0"


def drop_staging_sql(staging: str) -> str:
    """M5 (SqlManager.java:458-467,514-527)."""
    return f"DROP TABLE {staging}"


def truncate_sql(dialect: str, table: str) -> str:
    """M1 truncate-vs-delete fallback (SqlManager.java:360-378,
    SqliteManager.java:320-335)."""
    if dialect == "sqlite":
        return f"DELETE FROM {table}"
    return f"TRUNCATE TABLE {table}"


# --- merge upserts (M3a-M3e) ------------------------------------------------

@dataclass(frozen=True)
class MergeSpec:
    sink: str
    staging: str
    columns: list[str]
    pk_columns: list[str]

    def __post_init__(self):
        if not self.pk_columns:
            raise ValueError("merge requires at least one primary-key column")
        missing = set(self.pk_columns) - set(self.columns)
        if missing:
            raise ValueError(f"pk columns not in column list: {sorted(missing)}")

    @property
    def non_pk_columns(self) -> list[str]:
        return [c for c in self.columns if c not in self.pk_columns]


def merge_sql(dialect: str, spec: MergeSpec) -> str:
    """Engine-specific PK upsert from staging into sink.

    Oracle MERGE (OracleManager.java:287-349), PG ON CONFLICT
    (PostgresqlManager.java:262-307), MySQL ON DUPLICATE KEY
    (MySQLManager.java:253-286), SQL Server MERGE incl. the all-PK edge
    case (SQLServerManager.java:285-350, skip-UPDATE at 327-332), SQLite
    ON CONFLICT (SqliteManager.java:237-274).
    """
    cols = ", ".join(spec.columns)
    pks = ", ".join(spec.pk_columns)

    if dialect == "oracle":
        on = " AND ".join(f"trg.{c} = src.{c}" for c in spec.pk_columns)
        sets = ", ".join(f"trg.{c} = src.{c}" for c in spec.non_pk_columns)
        ins_vals = ", ".join(f"src.{c}" for c in spec.columns)
        matched = f" WHEN MATCHED THEN UPDATE SET {sets}" if sets else ""
        return (
            f"MERGE INTO {spec.sink} trg USING (SELECT {cols} FROM {spec.staging}) src "
            f"ON ({on}){matched} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({ins_vals})"
        )
    if dialect in ("postgresql", "sqlite"):
        sets = ", ".join(f"{c} = excluded.{c}" for c in spec.non_pk_columns)
        do = f"DO UPDATE SET {sets}" if sets else "DO NOTHING"
        where_true = " WHERE true" if dialect == "sqlite" else ""
        return (
            f"INSERT INTO {spec.sink} ({cols}) "
            f"SELECT {cols} FROM {spec.staging}{where_true} "
            f"ON CONFLICT ({pks}) {do}"
        )
    if dialect in ("mysql", "mariadb"):
        sets = ", ".join(f"{c} = excluded.{c}" for c in spec.non_pk_columns)
        if not sets:  # all-PK table: any conflicting row is identical
            sets = ", ".join(f"{c} = excluded.{c}" for c in spec.pk_columns)
        return (
            f"INSERT INTO {spec.sink} ({cols}) "
            f"SELECT {cols} FROM {spec.staging} AS excluded "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    if dialect == "sqlserver":
        on = " AND ".join(f"trg.{c} = src.{c}" for c in spec.pk_columns)
        sets = ", ".join(f"trg.{c} = src.{c}" for c in spec.non_pk_columns)
        matched = f" WHEN MATCHED THEN UPDATE SET {sets}" if sets else ""
        ins_vals = ", ".join(f"src.{c}" for c in spec.columns)
        return (
            f"MERGE INTO {spec.sink} trg USING (SELECT {cols} FROM {spec.staging}) src "
            f"ON ({on}){matched} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({ins_vals});"
        )
    if dialect in ("derby", "db2", "jdbc"):
        # SQL:2003 standard MERGE — Derby 10.11+, DB2, and the
        # StandardJDBCManager fallback. The source is the staging BASE
        # table, not a derived table: Derby rejects subquery sources
        # (ERROR 42XAL).
        on = " AND ".join(f"trg.{c} = src.{c}" for c in spec.pk_columns)
        sets = ", ".join(f"trg.{c} = src.{c}" for c in spec.non_pk_columns)
        matched = f" WHEN MATCHED THEN UPDATE SET {sets}" if sets else ""
        ins_vals = ", ".join(f"src.{c}" for c in spec.columns)
        return (
            f"MERGE INTO {spec.sink} trg "
            f"USING {spec.staging} src "
            f"ON ({on}){matched} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({ins_vals})"
        )
    raise ValueError(f"no merge template for dialect {dialect!r}")


def atomic_swap_sql(dialect: str, sink: str, staging: str, columns: list[str]) -> list[str]:
    """complete-atomic (M2): DELETE + INSERT..SELECT committed in one
    transaction on one connection (SqlManager.java:386-434)."""
    cols = ", ".join(columns)
    return [
        f"DELETE FROM {sink}",
        f"INSERT INTO {sink} ({cols}) SELECT {cols} FROM {staging}",
    ]
