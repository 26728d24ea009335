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
