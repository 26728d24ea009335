"""JDBC source scan-SQL construction (no driver jars in this container,
so these verify the generated SQL/predicates rather than a live read)."""

from replicadb_spark.options import ReplicaJob
from replicadb_spark.sources.jdbc import SESSION_INIT, build_select


def test_select_star():
    job = ReplicaJob(source_connect="jdbc:postgresql://h/db", sink_connect="file:///o",
                     source_table="public.t")
    assert build_select(job) == "(SELECT * FROM public.t) replicadb_t"


def test_select_columns_where():
    # S13/S14: source-where + source-columns pushdown (SqlManager.java:76-81)
    job = ReplicaJob(source_connect="jdbc:mysql://h/db", sink_connect="file:///o",
                     source_table="t", source_columns="a,b", source_where="a > 5")
    assert build_select(job) == "(SELECT a,b FROM t WHERE a > 5) replicadb_t"


def test_custom_query_wrapped_as_derived_table():
    # S12 (OracleManager.java:45-52)
    job = ReplicaJob(source_connect="jdbc:oracle:thin:@h/s", sink_connect="file:///o",
                     source_query="SELECT a, sum(b) FROM t GROUP BY a")
    assert build_select(job) == "(SELECT a, sum(b) FROM t GROUP BY a) replicadb_q"


def test_oracle_session_init_matches_reference():
    # OracleManager.java:83-99 ALTER SESSION set
    init = SESSION_INIT["oracle"]
    assert "_serial_direct_read" in init
    assert "recyclebin=OFF" in init


def test_predicates_path_carries_session_init():
    """Oracle's hash scan (S2) goes through spark.read.jdbc(predicates=,
    properties=) — the ALTER SESSIONs must ride those properties, not
    just the option-based single-scan reader."""
    from replicadb_spark.options import ReplicaJob
    from replicadb_spark.sources.jdbc import reader_properties

    job = ReplicaJob(
        source_connect="jdbc:oracle:thin:@db:1521/s",
        sink_connect="file:///tmp/x", source_table="t", jobs=4,
        source_user="u", source_password="p",
    )
    props = reader_properties(job, "oracle")
    assert props["sessionInitStatement"] == SESSION_INIT["oracle"]
    assert props["fetchsize"] == "5000" and props["user"] == "u"
    # non-oracle dialects add nothing
    assert "sessionInitStatement" not in reader_properties(job, "postgresql")
