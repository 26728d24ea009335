"""Distributed Bloom-filter semi-join pruning.

The 100 TB problem: a fact⋈dim join where the dim side is too big to
broadcast EXACTLY but selective enough that most fact rows will not
match. A Bloom filter of the dim keys fits in a few hundred KB where
the key set itself would be GBs, and pruning fact rows BEFORE the join
shuffle cuts the exchange by the miss rate. Spark's optimizer has a
runtime version of this (`spark.sql.optimizer.runtime.bloomFilter.*`);
this operator is the explicit, deterministic form — usable when the
planner doesn't inject one (e.g. the dim arrives as an arbitrary
DataFrame, or the join is written in two stages).

Everything is JVM-side Catalyst expressions:

- build: k bit positions per key via ``xxhash64(key, i)``, reduced to
  64-bit words with ``bit_or`` (ONE tiny shuffle of ≤ num_bits/64
  rows), densified into a single array<long> row.
- probe: broadcast crossJoin of that one row; membership test is a
  conjunction of ``element_at``/``shiftright`` bit tests — pure
  whole-stage codegen, no Python, no driver collect.

No false negatives (probe uses exactly the build's hash family), so
``bloom_prejoin`` followed by the real join returns EXACTLY the plain
join's rows — the driver gate checks that equivalence against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # xxhash64(key, i) varies the hash per probe by mixing in a literal;
    # pmod keeps positions non-negative. Build and probe MUST share this.
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    dim: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """One-row DataFrame ``(bf: array<long>)`` — the Bloom filter of
    ``dim[key_col]`` with ``num_bits`` bits.

    Size num_bits ≈ 10–15 bits per distinct key for ~1% false
    positives with 5 hashes. The word aggregation shuffles at most
    num_bits/64 rows regardless of dim size; the dense array is
    assembled by a single-row sort, never on the driver.
    """
    n_words = (num_bits + 63) // 64
    pos = dim.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), num_bits, num_hashes))).alias(
            "pos"
        )
    )
    words = pos.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        # pyspark's shiftleft() only takes a literal shift; the SQL form
        # accepts a column
        F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("b"),
    )
    sparse = words.groupBy("w").agg(F.bit_or("b").alias("bits"))
    # densify: sorted (w, bits) entries → map → sequence lookup, all in
    # one JVM projection over a single row. element_at on a map is a
    # scan, but it runs num_words times ONCE — not per probe row.
    return sparse.agg(
        F.map_from_entries(F.array_sort(F.collect_list(F.struct("w", "bits")))).alias(
            "__m"
        )
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("bf")
    )


def bloom_probe(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """``fact`` rows whose key MIGHT be in the filter (never drops a
    true member). The one-row bloom frame broadcasts; each bit test is
    ``(bf[pos/64] >> (pos%64)) & 1`` — whole-stage codegen."""
    probe = F.lit(True)
    for i in range(num_hashes):
        p = f"pmod(xxhash64({key_col}, {i}), {num_bits})"
        probe = probe & F.expr(
            f"(shiftright(element_at(bf, cast({p} / 64 as int) + 1),"
            f" cast({p} % 64 as int)) & 1L) = 1"
        )
    return fact.crossJoin(F.broadcast(bloom)).where(probe).drop("bf")


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """The full pattern: prune ``fact`` with a Bloom of ``dim`` keys,
    then run the real join (which removes the false positives). Result
    is row-for-row the plain join; the win is the pruned shuffle."""
    bf = bloom_build(dim, dim_key, num_bits=num_bits, num_hashes=num_hashes)
    pruned = bloom_probe(fact, bf, fact_key, num_bits=num_bits, num_hashes=num_hashes)
    return pruned.join(dim, on=F.col(fact_key) == F.col(dim_key), how=how)
