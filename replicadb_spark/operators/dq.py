"""Declarative data-quality verification (Deequ-style mini rules engine).

A rule set compiles into ONE aggregate pass over the table — every
completeness / range / set-membership / pattern rule becomes a
conditional-count column in the same Aggregate node, so checking 20
rules costs one scan, not 20 (uniqueness adds one distinct-count on its
key, the only extra exchange). The report is a tidy (rule, metric,
threshold, passed) frame a pipeline can gate a load on — the
replication engine's answer to the reference's post-load row-count
checks, generalized to column-level constraints.

Scale: conditional counts partial-aggregate map-side; the single output
row is O(|rules|) wide. Uniqueness uses count vs approx/count distinct
on the key only (narrow shuffle). No UDFs, no collect of data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One check: ``metric`` is the fraction of rows satisfying
    ``predicate`` (null predicate rows count as failing); ``min_ratio``
    is the pass threshold (1.0 = every row)."""

    name: str
    predicate: Column
    min_ratio: float = 1.0


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"range({col})", F.col(col).between(F.lit(lo), F.lit(hi)))


def in_set(col: str, values) -> Rule:
    return Rule(f"in_set({col})", F.col(col).isin(*values))


def matches(col: str, pattern: str, min_ratio: float = 1.0) -> Rule:
    return Rule(f"matches({col})", F.col(col).rlike(pattern), min_ratio)


def satisfies(name: str, predicate: Column, min_ratio: float = 1.0) -> Rule:
    return Rule(name, predicate, min_ratio)


@dataclass(frozen=True)
class UniqueRule:
    """Key-uniqueness check — the one rule that needs its own (narrow,
    key-only) aggregate: metric = distinct(key) / count(*)."""

    cols: tuple
    min_ratio: float = 1.0
    name: str = field(default="", compare=False)

    def label(self) -> str:
        return self.name or f"unique({','.join(self.cols)})"


def unique(*cols: str, min_ratio: float = 1.0) -> UniqueRule:
    return UniqueRule(tuple(cols), min_ratio)


@dataclass(frozen=True)
class CountRule:
    """Table-level row-count floor: metric = min(n / min_rows, 1).
    The rule an ingest gate must ALWAYS include — every per-row ratio
    rule is vacuously satisfied on an empty table (0-of-0 rows pass),
    so without a count floor a failed upstream extraction reads as a
    perfectly clean load."""

    min_rows: int

    def label(self) -> str:
        return f"at_least({self.min_rows})"


def at_least(min_rows: int) -> CountRule:
    return CountRule(min_rows)


def run_checks(df: DataFrame, rules: list) -> DataFrame:
    """Evaluate all rules; returns (rule string, metric double 6dp,
    threshold double, passed boolean), one row per rule, ordered by
    rule name for deterministic output.

    Empty-table semantics: per-row ratio rules are VACUOUSLY true on
    zero rows (0-of-0 pass — the mathematical convention), so a gate
    that must reject empty loads needs an explicit ``at_least(n)``
    count rule; it is the only rule that fails on an empty table."""
    spark = df.sparkSession

    def round6(x: float) -> float:
        # SQL ROUND is half-away-from-zero; Python round() is
        # half-to-even — a metric landing exactly on a 5 at the 7th
        # decimal would hash-mismatch the DuckDB oracle otherwise.
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    row_rules = [r for r in rules if isinstance(r, Rule)]
    uniq_rules = [r for r in rules if isinstance(r, UniqueRule)]
    count_rules = [r for r in rules if isinstance(r, CountRule)]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(row_rules):
        aggs.append(
            F.sum(F.when(r.predicate, 1).otherwise(0)).alias(f"__c{i}")
        )
    # ONE driver action for the whole report (r17): each uniqueness
    # rule's key-distinct count used to be its own count() job after
    # the row-rule aggregate — the 1-row subtrees now meet the wide
    # aggregate in a crossJoin fold (the contamination-gate pattern),
    # so every rule subtree schedules inside a single job.
    report = df.agg(*aggs)
    for j, r in enumerate(uniq_rules):
        report = report.crossJoin(
            df.select(*r.cols)
            .distinct()
            .agg(F.count(F.lit(1)).alias(f"__u{j}"))
        )
    base = report.collect()[0]  # one row, O(|rules|) wide
    n = base["__n"]

    rows = []
    for i, r in enumerate(row_rules):
        metric = (base[f"__c{i}"] / n) if n else 1.0
        rows.append((r.name, round6(metric), r.min_ratio, metric >= r.min_ratio))
    for j, r in enumerate(uniq_rules):
        dn = base[f"__u{j}"]
        metric = (dn / n) if n else 1.0
        rows.append(
            (r.label(), round6(metric), r.min_ratio, metric >= r.min_ratio)
        )
    for r in count_rules:
        metric = min(n / r.min_rows, 1.0) if r.min_rows > 0 else 1.0
        rows.append((r.label(), round6(metric), 1.0, n >= r.min_rows))
    rows.sort(key=lambda t: t[0])
    return spark.createDataFrame(
        rows, "rule string, metric double, threshold double, passed boolean"
    )
