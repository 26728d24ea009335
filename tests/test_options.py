"""Options parsing — parity with cli/ToolOptions + cli/OptionsFile
(reference: cli/OptionsFile.java:15-84, EnvironmentVariableEvaluator.java:20-35)."""

import os

import pytest

from replicadb_spark.options import ReplicaJob, parse_args, parse_properties


def test_defaults():
    job = ReplicaJob()
    assert job.mode == "complete"
    assert job.jobs == 4            # ToolOptions.java:14
    assert job.fetch_size == 5000   # ToolOptions.java:15
    assert job.sink_truncate is True


def test_invalid_mode_rejected():
    with pytest.raises(ValueError):
        ReplicaJob(mode="bogus")


def test_query_and_table_exclusive():
    with pytest.raises(ValueError):
        ReplicaJob(source_table="t", source_query="SELECT 1")


def test_parse_properties_passthrough_params():
    text = """
    # comment
    mode=incremental
    jobs=8
    source.connect=jdbc:postgresql://h/db
    source.table=public.t_source
    source.columns=a, b ,c
    sink.connect=file:///tmp/out
    sink.file.format=parquet
    source.connect.parameter.fetchsize=9999
    sink.connect.parameter.pk.columns=a
    """
    job = parse_properties(text)
    assert job.mode == "incremental"
    assert job.jobs == 8
    assert job.source_column_list == ["a", "b", "c"]
    assert job.source_params == {"fetchsize": "9999"}
    assert job.sink_params == {"pk.columns": "a"}


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("RDBS_PW", "sekret")
    job = parse_properties("source.connect=jdbc:mysql://h/db\nsource.password=${RDBS_PW}\nsink.connect=file:///t")
    assert job.source_password == "sekret"
    # unknown vars stay verbatim (reference behavior)
    job2 = parse_properties("source.connect=${NOPE_VAR}\nsink.connect=file:///t")
    assert job2.source_connect == "${NOPE_VAR}"


def test_cli_overrides_options_file(tmp_path):
    f = tmp_path / "job.conf"
    f.write_text("mode=complete\njobs=2\nsource.connect=jdbc:sqlite:/a.db\nsink.connect=file:///out\n")
    job = parse_args(["--options-file", str(f), "--jobs", "16", "--mode", "incremental"])
    assert job.jobs == 16
    assert job.mode == "incremental"
    assert job.source_connect == "jdbc:sqlite:/a.db"
