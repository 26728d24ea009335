"""Z-order layout: correctness of the Morton value and the actual
pruning benefit, measured from parquet footer statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from replicadb_spark.operators.ordering import zorder_layout, zorder_value


def _interleave_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_value_matches_reference_interleave(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave_ref(x, y), (x, y)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    import pyarrow.parquet as pq
    import os

    # a 256×256 grid: every (x, y) combination once
    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
    )
    z_dir = str(tmp_path / "zorder")
    x_dir = str(tmp_path / "xsort")
    zorder_layout(grid, "x", "y", num_files=16).write.parquet(z_dir)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(x_dir)

    def spans(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            lo = {"x": 1 << 30, "y": 1 << 30}
            hi = {"x": -1, "y": -1}
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for ci in range(row.num_columns):
                    col = row.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    lo[name] = min(lo[name], st.min)
                    hi[name] = max(hi[name], st.max)
            out.append((lo["x"], hi["x"], lo["y"], hi["y"]))
        return out

    z_spans = spans(z_dir)
    x_spans = spans(x_dir)
    # x-sorted layout: every file spans (almost) the full y range
    assert all(sy > 200 for (_, _, sy_lo, sy_hi) in x_spans for sy in [sy_hi - sy_lo])
    # The pruning claim: a y-only box predicate (y in [0, 31]) can skip
    # NOTHING under the x-sort (every file's y-stats intersect) but
    # skips most files under z-order — min/max footer stats alone.
    def intersecting(files, lo, hi):
        return sum(1 for (_, _, y_lo, y_hi) in files if y_hi >= lo and y_lo <= hi)

    assert intersecting(x_spans, 0, 31) == len(x_spans)  # no pruning possible
    z_hit = intersecting(z_spans, 0, 31)
    assert z_hit <= len(z_spans) // 2, (z_hit, z_spans)
    # row preservation
    assert spark.read.parquet(z_dir).count() == 256 * 256


def test_zorder_preserves_rows_exactly(spark):
    df = spark.range(1000).select(
        (F.col("id") * 7 % 100).alias("x"), (F.col("id") * 13 % 100).alias("y")
    )
    out = zorder_layout(df, "x", "y", num_files=4)
    assert sorted((r.x, r.y) for r in out.collect()) == sorted(
        (r.x, r.y) for r in df.collect()
    )


def test_file_manifest_prunes_zorder_layout_losslessly(spark, tmp_path):
    """manifest + prune_files over a z-ordered table: the pruned scan
    returns EXACTLY the rows of the full scan under the predicate, and
    reads fewer files."""
    from replicadb_spark.operators.manifest import file_manifest, prune_files

    grid = (
        spark.range(128 * 128)
        .select(
            (F.col("id") % 128).alias("x"),
            (F.col("id") / 128).cast("long").alias("y"),
        )
    )
    z_dir = str(tmp_path / "ztab")
    zorder_layout(grid, "x", "y", num_files=16).write.parquet(z_dir)

    man = file_manifest(spark, z_dir, columns=["x", "y"])
    lo, hi = 10, 20
    keep = prune_files(man, "y", lo, hi)
    import os
    total = sum(1 for f in os.listdir(z_dir) if f.endswith(".parquet"))
    assert 0 < len(keep) < total  # genuinely prunes

    pruned_rows = {
        (r.x, r.y)
        for r in spark.read.parquet(*keep)
        .where((F.col("y") >= lo) & (F.col("y") <= hi))
        .collect()
    }
    full_rows = {
        (r.x, r.y)
        for r in spark.read.parquet(z_dir)
        .where((F.col("y") >= lo) & (F.col("y") <= hi))
        .collect()
    }
    assert pruned_rows == full_rows  # lossless


def test_prune_files_keeps_statless_files(spark, tmp_path):
    from replicadb_spark.operators.manifest import file_manifest, prune_files

    d = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id").alias("v"), (F.col("id") * 2).alias("w")
    ).coalesce(2).write.parquet(d)
    man = file_manifest(spark, d)
    # files known to the manifest but with no stats row for v (drop the
    # v rows, keep the w rows): unknown is NOT excludable → all kept,
    # even for a range that matches nothing
    keep = prune_files(man.where(F.col("column") != "v"), "v", 10_000, 20_000)
    import os
    assert len(keep) == sum(1 for f in os.listdir(d) if f.endswith(".parquet"))


def test_prune_files_keeps_non_numeric_stats(spark, tmp_path):
    """A string column's min/max stringify but don't cast to double —
    the file has a stats row yet an unknown numeric range. Conservative
    contract: it must be KEPT, not silently dropped by null compares."""
    from replicadb_spark.operators.manifest import file_manifest, prune_files

    d = str(tmp_path / "s")
    spark.createDataFrame(
        [(i, f"name_{i}") for i in range(50)], "id long, label string"
    ).coalesce(2).write.parquet(d)
    man = file_manifest(spark, d)
    # sanity: the label stats exist but are non-numeric
    assert man.where(F.col("column") == "label").count() > 0
    keep = prune_files(man, "label", 0, 1)
    import os
    assert len(keep) == sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
