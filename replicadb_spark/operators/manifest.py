"""File-skipping manifest: per-file column statistics as a DataFrame.

Parquet already stores min/max per row group; what a 100 TB table needs
is those stats OUTSIDE the files, so a planner (or a job submitting
loop) can select the files worth scanning without opening any of them —
the core mechanism of lakehouse table formats' data skipping. This
operator builds that manifest with Spark itself: the file list is
parallelized and each task reads ONLY footers (pyarrow metadata, no row
data), so manifest cost is O(files), not O(bytes).

Pairs with ``ordering.zorder_layout``: cluster first, manifest once,
then ``prune_files`` turns a box predicate into the small file subset
whose stats intersect it. Correctness contract: pruning never drops a
file that could contain a matching row (stats are conservative), so
scan(pruned) ∩ predicate == scan(all) ∩ predicate — tested.

All path I/O goes through replicadb_spark.fs (Hadoop FileSystem on the
driver, pyarrow filesystems in the executors), so the manifest works on
any Spark-readable URI, not just the driver's local disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from replicadb_spark.fs import TableFS, join, pyarrow_open


def file_manifest(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """(file, n_rows, column, min_s, max_s, n_nulls) for every parquet
    part-file under ``path``. min/max are stringified (heterogeneous
    column types stack in one schema; numeric compare re-casts on use);
    ``n_nulls`` is the column's exact null count when every row group
    records one, else null (unknown ≠ zero). A column that is entirely
    null in a file still gets a row (null min/max, n_nulls == n_rows) —
    that row is what IS-NOT-NULL pruning skips on.

    The directory listing is driver-side metadata (same as Spark's own
    scan planning — one Hadoop glob round trip per nesting depth);
    footer reads are distributed over the executors.
    """
    fs = TableFS(spark, path)
    files: list[str] = []
    pattern = join(path, "*.parquet")
    for _ in range(8):  # bounded nesting: part files, then partition dirs
        files.extend(f for f, _sz in fs.glob(pattern))
        pattern = pattern[: -len("*.parquet")] + "*/*.parquet"
    files = sorted(set(files))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    fdf = spark.createDataFrame([(f,) for f in files], "file string")

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = {"file": [], "n_rows": [], "column": [],
                   "min_s": [], "max_s": [], "n_nulls": []}
            for fname in pdf["file"].values:
                md = pq.ParquetFile(pyarrow_open(fname)).metadata
                lo: dict = {}
                hi: dict = {}
                nul: dict = {}  # name -> exact count, or None once unknown
                bad_mm: set = set()  # min/max not covering every row group
                n_rows = md.num_rows
                for rg in range(md.num_row_groups):
                    row = md.row_group(rg)
                    for ci in range(row.num_columns):
                        col = row.column(ci)
                        name = col.path_in_schema
                        if columns is not None and name not in columns:
                            continue
                        st = col.statistics
                        if st is None:
                            nul[name] = None
                            bad_mm.add(name)
                            continue
                        if st.null_count is None or nul.get(name, 0) is None:
                            nul[name] = None
                        else:
                            nul[name] = nul.get(name, 0) + st.null_count
                        if not st.has_min_max:
                            # all-null row group: contributes no values,
                            # so existing min/max still cover the file
                            if st.null_count != row.num_rows:
                                bad_mm.add(name)
                            continue
                        lo[name] = min(lo[name], st.min) if name in lo else st.min
                        hi[name] = max(hi[name], st.max) if name in hi else st.max
                for name in sorted(set(lo) | set(nul)):
                    ok = name in lo and name not in bad_mm
                    out["file"].append(fname)
                    out["n_rows"].append(n_rows)
                    out["column"].append(name)
                    out["min_s"].append(str(lo[name]) if ok else None)
                    out["max_s"].append(str(hi[name]) if ok else None)
                    out["n_nulls"].append(nul.get(name))
            yield pd.DataFrame(out)

    width = spark.sparkContext.defaultParallelism
    return fdf.repartition(min(width, len(files))).mapInPandas(
        read_footers,
        schema="file string, n_rows long, column string, "
               "min_s string, max_s string, n_nulls long",
    )


def prune_files(
    manifest: DataFrame,
    column: str,
    lo: float,
    hi: float,
) -> list[str]:
    """Files whose [min, max] range on ``column`` intersects [lo, hi] —
    the candidate set a pruned scan reads. Conservative: a file with no
    stats row for the column is KEPT, and so is one whose stats do not
    parse as numbers (string/bytes column stringified by the manifest) —
    unknown ≠ excludable, the cast-to-null must never drop a file.

    The keep-set is computed entirely distributed (one left-join on the
    manifest); the ONLY driver pull is the final pruned file list —
    the bounded set a planner must hold anyway. At 10⁶ files × columns
    nothing else reaches the driver.
    """
    stats = manifest.where(F.col("column") == column).select(
        "file",
        # try_cast, not cast: under ANSI mode a non-numeric stat (string
        # column) would throw; here it must become null → file kept
        F.col("min_s").try_cast("double").alias("mn"),
        F.col("max_s").try_cast("double").alias("mx"),
    )
    keep = (
        manifest.select("file")
        .distinct()
        .join(stats, "file", "left")
        .where(
            F.col("mn").isNull()          # no stats row, or unparseable min
            | F.col("mx").isNull()        # unparseable max
            | ((F.col("mx") >= lo) & (F.col("mn") <= hi))
        )
        .select("file")
        .distinct()
    )
    return sorted(r.file for r in keep.collect())


def prune_files_not_null(manifest: DataFrame, column: str) -> list[str]:
    """Files that may hold a NON-NULL value of ``column`` — the
    candidate set for an ``IS NOT NULL`` scan (the dominant filter of
    sparse/optional columns at 100 TB: files whose column is entirely
    null are skipped without being opened). Conservative: a file is
    dropped ONLY when its manifest row proves n_nulls == n_rows;
    missing rows, unknown null counts, and legacy manifests without
    the n_nulls column all keep the file."""
    stats = manifest.where(F.col("column") == column).select(
        "file", "n_rows", "n_nulls"
    )
    all_null = stats.where(
        F.col("n_nulls").isNotNull() & (F.col("n_nulls") == F.col("n_rows"))
    ).select("file")
    keep = (
        manifest.select("file").distinct()
        .join(all_null, "file", "left_anti")
    )
    return sorted(r.file for r in keep.collect())
