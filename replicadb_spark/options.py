"""Job options — the engine's "API" surface.

Mirrors the reference CLI/properties surface (cli/ToolOptions.java:63-374,
cli/OptionsFile.java:15-84, cli/EnvironmentVariableEvaluator.java:20-35)
as a frozen dataclass + a properties-file/CLI parser. Unknown
``source.connect.parameter.*`` / ``sink.connect.parameter.*`` keys pass
through verbatim to the Spark reader/writer options, exactly like the
reference passes them to the JDBC driver.
"""

from __future__ import annotations

import argparse
import os
import re
from dataclasses import dataclass, field, replace

_ENV_PATTERN = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")

VALID_MODES = ("complete", "complete-atomic", "incremental")
# FileFormats.java:3-15 declares csv/json/avro/parquet/orc; only csv/orc are
# implemented in the reference. Spark implements all five natively.
VALID_FILE_FORMATS = ("csv", "orc", "parquet", "json", "avro")


def _interpolate_env(value: str) -> str:
    """``${ENV_VAR}`` interpolation (EnvironmentVariableEvaluator.java:20-35)."""
    def sub(m: re.Match) -> str:
        return os.environ.get(m.group(1), m.group(0))
    return _ENV_PATTERN.sub(sub, value)


@dataclass(frozen=True)
class ReplicaJob:
    """One replication job: source → sink with a mode.

    Field-for-field parity with ToolOptions (cli/ToolOptions.java:63-316);
    fields the Spark engine makes obsolete are kept for API compatibility
    and documented as such.
    """

    source_connect: str = ""
    sink_connect: str = ""
    mode: str = "complete"

    source_user: str | None = None
    source_password: str | None = None
    source_table: str | None = None
    source_columns: str | None = None          # projection pushdown (S14)
    source_where: str | None = None            # predicate pushdown (S13)
    source_query: str | None = None            # full-query pushdown (S12)
    source_file_format: str | None = None
    # Column used to split partitioned JDBC reads. The reference hashes
    # rowid/physloc (S2/S5) or pages with OFFSET (S3/S4/S6); here an
    # explicit split column enables range partitioning, and hash-predicate
    # partitioning is the fallback (sources/jdbc.py).
    source_split_by: str | None = None

    sink_user: str | None = None
    sink_password: str | None = None
    sink_table: str | None = None
    sink_columns: str | None = None
    sink_file_format: str | None = None
    sink_staging_table: str | None = None
    sink_staging_table_alias: str | None = None
    sink_staging_schema: str | None = None
    sink_truncate: bool = True                 # sink-truncate (M1)
    sink_disable_escape: bool = False          # T7 toggle (pg_copy/mysql_load)
    sink_disable_index: bool = False           # parsed-but-unused in reference
    sink_analyze: bool = False                 # parsed-but-unused in reference

    jobs: int = 4                              # ToolOptions.java:14
    fetch_size: int = 5000                     # ToolOptions.java:15
    bandwidth_throttling: int = 0              # KB/s, 0 = unlimited (F2)
    quoted_identifiers: bool = False           # T12
    verbose: bool = False

    # connect.parameter.* passthrough (OptionsFile.java:50-84)
    source_params: dict = field(default_factory=dict)
    sink_params: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.mode not in VALID_MODES:
            raise ValueError(f"mode must be one of {VALID_MODES}, got {self.mode!r}")
        if self.jobs < 1:
            raise ValueError("jobs must be >= 1")
        for fmt in (self.source_file_format, self.sink_file_format):
            if fmt is not None and fmt not in VALID_FILE_FORMATS:
                raise ValueError(f"file format must be one of {VALID_FILE_FORMATS}, got {fmt!r}")
        if self.source_query and self.source_table:
            raise ValueError("source_query and source_table are mutually exclusive")

    @property
    def source_column_list(self) -> list[str] | None:
        if not self.source_columns:
            return None
        return [c.strip() for c in self.source_columns.split(",") if c.strip()]

    @property
    def sink_column_list(self) -> list[str] | None:
        if not self.sink_columns:
            return None
        return [c.strip() for c in self.sink_columns.split(",") if c.strip()]

    def with_overrides(self, **kwargs) -> "ReplicaJob":
        return replace(self, **kwargs)


def parse_properties(text: str) -> ReplicaJob:
    """Parse a reference-style ``options-file`` properties body.

    Key grammar per OptionsFile.java: ``source.connect``, ``sink.table``,
    ``mode``, ``jobs``, plus ``{source|sink}.connect.parameter.<k>=<v>``
    passthrough, with ``${ENV}`` interpolation.
    """
    flat: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" not in line:
            continue
        k, v = line.split("=", 1)
        flat[k.strip()] = _interpolate_env(v.strip())

    def pop(key: str, default=None):
        return flat.pop(key, default)

    source_params = {}
    sink_params = {}
    for k in list(flat):
        if k.startswith("source.connect.parameter."):
            source_params[k[len("source.connect.parameter."):]] = flat.pop(k)
        elif k.startswith("sink.connect.parameter."):
            sink_params[k[len("sink.connect.parameter."):]] = flat.pop(k)

    def as_bool(v, default=False):
        if v is None:
            return default
        return str(v).lower() in ("1", "true", "yes", "on", "y", "t")

    return ReplicaJob(
        source_connect=pop("source.connect", ""),
        sink_connect=pop("sink.connect", ""),
        mode=pop("mode", "complete"),
        source_user=pop("source.user"),
        source_password=pop("source.password"),
        source_table=pop("source.table"),
        source_columns=pop("source.columns"),
        source_where=pop("source.where"),
        source_query=pop("source.query"),
        source_file_format=pop("source.file.format"),
        source_split_by=pop("source.split.by"),
        sink_user=pop("sink.user"),
        sink_password=pop("sink.password"),
        sink_table=pop("sink.table"),
        sink_columns=pop("sink.columns"),
        sink_file_format=pop("sink.file.format"),
        sink_staging_table=pop("sink.staging.table"),
        sink_staging_table_alias=pop("sink.staging.table.alias"),
        sink_staging_schema=pop("sink.staging.schema"),
        sink_truncate=as_bool(pop("sink.truncate"), True),
        sink_disable_escape=as_bool(pop("sink.disable.escape")),
        sink_disable_index=as_bool(pop("sink.disable.index")),
        sink_analyze=as_bool(pop("sink.analyze")),
        jobs=int(pop("jobs", 4)),
        fetch_size=int(pop("fetch.size", 5000)),
        bandwidth_throttling=int(pop("bandwidth.throttling", 0)),
        quoted_identifiers=as_bool(pop("quoted.identifiers")),
        source_params=source_params,
        sink_params=sink_params,
    )


VERSION = "0.15.1-spark"  # parity target: reference v0.15.1


def build_arg_parser() -> argparse.ArgumentParser:
    """The CLI surface, one flag per reference option
    (cli/ToolOptions.java:68-316; short forms h/j/v at 301-308).
    Exposed so the parity test can enumerate it against the reference."""
    p = argparse.ArgumentParser(prog="replicadb-spark")
    p.add_argument("--options-file")
    p.add_argument("--version", action="version", version=f"%(prog)s {VERSION}")
    p.add_argument("--mode", default=None, choices=VALID_MODES)
    p.add_argument("-j", "--jobs", type=int, default=None)
    p.add_argument("--fetch-size", type=int, default=None)
    p.add_argument("--bandwidth-throttling", type=int, default=None)
    p.add_argument("--quoted-identifiers", action="store_true", default=None)
    p.add_argument("--source-connect")
    p.add_argument("--source-user")
    p.add_argument("--source-password")
    p.add_argument("--source-table")
    p.add_argument("--source-columns")
    p.add_argument("--source-where")
    p.add_argument("--source-query")
    p.add_argument("--source-file-format")
    p.add_argument("--source-split-by")
    p.add_argument("--sink-connect")
    p.add_argument("--sink-user")
    p.add_argument("--sink-password")
    p.add_argument("--sink-table")
    p.add_argument("--sink-columns")
    p.add_argument("--sink-file-format")
    p.add_argument("--sink-staging-table")
    p.add_argument("--sink-staging-table-alias")
    p.add_argument("--sink-staging-schema")
    p.add_argument("--sink-disable-truncate", action="store_true", default=None)
    p.add_argument("--sink-disable-escape", action="store_true", default=None)
    p.add_argument("--sink-disable-index", action="store_true", default=None)
    p.add_argument("--sink-analyze", action="store_true", default=None)
    p.add_argument("-v", "--verbose", action="store_true", default=None)
    return p


def parse_args(argv: list[str]) -> ReplicaJob:
    """CLI parity with cli/ToolOptions.java:68-316."""
    ns = build_arg_parser().parse_args(argv)

    if ns.options_file:
        with open(ns.options_file) as fh:
            job = parse_properties(fh.read())
    else:
        job = ReplicaJob(source_connect="", sink_connect="")

    overrides = {}
    mapping = {
        "mode": "mode", "jobs": "jobs", "fetch_size": "fetch_size",
        "bandwidth_throttling": "bandwidth_throttling",
        "source_connect": "source_connect", "source_user": "source_user",
        "source_password": "source_password", "source_table": "source_table",
        "source_columns": "source_columns", "source_where": "source_where",
        "source_query": "source_query", "source_file_format": "source_file_format",
        "source_split_by": "source_split_by",
        "sink_connect": "sink_connect", "sink_user": "sink_user",
        "sink_password": "sink_password", "sink_table": "sink_table",
        "sink_columns": "sink_columns", "sink_file_format": "sink_file_format",
        "sink_staging_table": "sink_staging_table",
        "sink_staging_table_alias": "sink_staging_table_alias",
        "sink_staging_schema": "sink_staging_schema",
        "sink_disable_escape": "sink_disable_escape",
        "sink_disable_index": "sink_disable_index",
        "sink_analyze": "sink_analyze",
        "verbose": "verbose", "quoted_identifiers": "quoted_identifiers",
    }
    for arg_name, field_name in mapping.items():
        val = getattr(ns, arg_name, None)
        if val is not None:
            overrides[field_name] = val
    if ns.sink_disable_truncate:
        overrides["sink_truncate"] = False
    return job.with_overrides(**overrides)
