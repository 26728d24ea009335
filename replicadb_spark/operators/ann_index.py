"""Persisted IVF vector index as a cell-partitioned parquet layout.

The ANN family in functions/similarity.py builds its inverted file
per query run; this module MATERIALIZES it as a table layout so the
index survives across jobs and the probe step becomes Spark partition
pruning:

- ``build``: assign every vector to its nearest coarse cell (the shared
  deterministic quantizer — functions/similarity.coarse_centroids) and
  write the corpus ``partitionBy("cell")``, with the centroid codebook
  as a small sidecar parquet. One layout write; at 100 TB this is the
  same cost as any partitioned-table materialization.
- ``search``: per query, pick the ``n_probe`` nearest cells from the
  (broadcast-size) codebook and scan ONLY those partitions — the
  ``cell IN (...)`` filter prunes at the directory level
  (PartitionFilters in the scan, pinned by the test), so a 1024-cell
  index at n_probe=8 reads <1% of the corpus bytes per query batch.
  Within the probed cells the scoring is the exact broadcast-queries
  kernel (no corpus shuffle), then one top-k window per query.
- ``append``: assign NEW vectors against the FROZEN codebook and
  append into their cell partitions — incremental index maintenance
  with no rebuild (cells drift as the distribution drifts; rebuild
  with fresh centroids when the recall gate drops, the standard IVF
  operational trade, cf. the stream_semantic_dedup fixed-codebook
  contract).

Determinism: the codebook is the deterministic hash-picked quantizer;
assignment ties go to the lower cell id; search output carries the
(score desc, neighbor_id) total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _assign(df: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """corpus → (id, cell, vec) via the collected-argmax Arrow kernel
    (the dedup.semantic_dedup shape): the bounded codebook rides the
    closure, assignment is a per-batch matmul argmax with ties to the
    lower cell id — ZERO exchanges on the corpus."""
    import numpy as np

    crows = cents.orderBy("cell").collect()
    cell_ids = np.array([r["cell"] for r in crows])
    C = np.array([r["cent_vec"] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0.0] = 1.0
    Cn = C / cn[:, None]

    id_t = dict(df.dtypes)[id_col]
    vec_t = df.schema[vec_col].dataType.simpleString()

    def assign_local(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["__v"].tolist(), dtype=np.float64)
            mn = np.linalg.norm(M, axis=1)
            mn[mn == 0.0] = 1.0
            S = (M / mn[:, None]) @ Cn.T
            # argmax returns the FIRST maximal column; columns are
            # cell-id ordered, so ties go to the lower cell id
            yield pd.DataFrame(
                {
                    "__vid": pdf["__vid"],
                    "cell": cell_ids[S.argmax(axis=1)],
                    "__v": pdf["__v"],
                }
            )

    return df.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v")
    ).mapInPandas(assign_local, schema=f"__vid {id_t}, cell int, __v {vec_t}")


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    lloyd_iters: int = 0,
) -> None:
    """Materialize the IVF layout: ``path/codebook`` (n_cells rows) and
    ``path/cells`` partitioned by cell."""
    from replicadb_spark.functions.similarity import coarse_centroids

    cents = coarse_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
        lloyd_iters=lloyd_iters,
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    spark = corpus.sparkSession
    saved = spark.read.parquet(f"{path}/codebook")
    _assign(corpus, saved, id_col, vec_col).withColumnRenamed(
        "__vid", id_col
    ).withColumnRenamed("__v", vec_col).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")


def append_to_ivf_index(
    new_vecs: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance: assign against the FROZEN codebook and
    append into the cell partitions (dynamic partition append — only
    the touched cells gain files). New vectors are cast to the INDEX's
    stored vector type first — mixed float/double element types across
    part-files would fail every later scan."""
    spark = new_vecs.sparkSession
    cents = spark.read.parquet(f"{path}/codebook")
    stored_t = (
        spark.read.parquet(f"{path}/cells")
        .schema[vec_col]
        .dataType.simpleString()
    )
    new_vecs = new_vecs.withColumn(vec_col, F.col(vec_col).cast(stored_t))
    _assign(new_vecs, cents, id_col, vec_col).withColumnRenamed(
        "__vid", id_col
    ).withColumnRenamed("__v", vec_col).write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")


def compact_ivf_cells(
    spark: SparkSession,
    path: str,
    *,
    target_mb: int = 128,
    min_files: int = 2,
) -> dict:
    """Layout maintenance: rewrite fragmented cell partitions into
    ~``target_mb`` files. Streaming appends add one file per touched
    cell per micro-batch (``append_to_ivf_index``); at production
    cadence a cell accumulates thousands of small files and the pruned
    scan degrades to open-file overhead. Compaction rewrites ONLY the
    cells with ≥ ``min_files`` part-files — each cell is read, coalesced
    to ``ceil(bytes / target_mb)`` files, written to a staging dir, and
    swapped in with an atomic directory rename. The codebook and the
    vectors are untouched: search results are identical pre/post (the
    test pins byte-identical result sets).

    Scale: cost is proportional to the FRAGMENTED cells' bytes only —
    untouched cells are never read (the zorder/manifest maintenance
    family's contract). Each cell rewrite is an independent pruned
    scan → coalesce → write; no shuffle, no global pass.

    Returns {"cells_compacted": n, "files_before": a, "files_after": b}.

    ``subdir``/``prefix`` generalize the maintenance to any
    hive-partitioned layout under ``path`` — operators/dedup_index
    reuses it for the band-partitioned MinHash bucket store.
    """
    return compact_partition_dirs(
        spark, path, subdir="cells", prefix="cell=",
        target_mb=target_mb, min_files=min_files,
    )


def compact_partition_dirs(
    spark: SparkSession,
    path: str,
    *,
    subdir: str,
    prefix: str,
    target_mb: int = 128,
    min_files: int = 2,
) -> dict:
    """Generic per-partition-directory compaction (see
    :func:`compact_ivf_cells` for the contract): rewrite each
    ``path/subdir/<prefix>*`` directory holding ≥ min_files part-files
    into ~target_mb files via staged write + atomic rename swap. All
    listing/rename/delete goes through the Hadoop FileSystem
    (replicadb_spark.fs), so the layout may live on any Spark-readable
    URI."""
    import math

    from replicadb_spark.fs import TableFS
    from replicadb_spark.fs import join as fs_join

    fs = TableFS(spark, path)
    cells_dir = fs_join(path, subdir)
    stats = {"cells_compacted": 0, "files_before": 0, "files_after": 0}
    for d in fs.list_names(cells_dir):
        if not d.startswith(prefix):
            continue
        cell_path = fs_join(cells_dir, d)
        parts = {
            f: sz
            for f, sz in fs.glob(fs_join(cell_path, "*.parquet"))
            if not f.rsplit("/", 1)[-1].startswith((".", "_"))
        }
        stats["files_before"] += len(parts)
        if len(parts) < min_files:
            stats["files_after"] += len(parts)
            continue
        nbytes = sum(parts.values())
        n_out = max(1, math.ceil(nbytes / (target_mb * 1024 * 1024)))
        # stage OUTSIDE cells/ so a concurrent partition discovery never
        # sees a half-written "cell=N.__compact__" directory
        staged = fs_join(path, f"__compact__{d}")
        fs.delete(staged, recursive=True)
        # one pruned single-partition read; the partition column is
        # constant inside the directory so it is dropped and re-derived
        # by the directory name on read
        spark.read.parquet(cell_path).coalesce(n_out).write.mode(
            "overwrite"
        ).parquet(staged)
        old = fs_join(path, f"__old__{d}")
        fs.delete(old, recursive=True)
        fs.rename_no_overwrite(cell_path, old)
        fs.rename_no_overwrite(staged, cell_path)
        fs.delete(old, recursive=True)
        # drop the _SUCCESS marker so the directory looks like any
        # other dynamic-partition output
        fs.delete(fs_join(cell_path, "_SUCCESS"))
        stats["files_after"] += len(fs.glob(fs_join(cell_path, "*.parquet")))
        stats["cells_compacted"] += 1
    return stats


def _probe_frame(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int,
):
    """Shared probe-selection kernel: nearest-cells-per-query computed
    INSIDE an Arrow batch against the broadcast-size codebook. Returns
    (qdf, qprobe, probe_ids) — query (id, vec) frame, (query_id, cell)
    probe pairs, and the distinct probed cell ids (≤ n_cells ints, the
    only driver-side collect)."""
    import numpy as np

    cents = spark.read.parquet(f"{path}/codebook").orderBy("cell").collect()
    C = np.array([r["cent_vec"] for r in cents], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0.0] = 1.0
    Cn = C / cn[:, None]
    cell_ids = np.array([r["cell"] for r in cents])
    n_take = min(n_probe, len(cell_ids))

    id_t = dict(queries.dtypes)[id_col]
    qdf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )

    def pick_probes(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["qv"].tolist(), dtype=np.float64)
            mn = np.linalg.norm(M, axis=1)
            mn[mn == 0.0] = 1.0
            S = (M / mn[:, None]) @ Cn.T
            # stable argsort over score desc: columns ascend by cell
            # id, so ties resolve to the lower cell (the build-side
            # tie rule)
            order = np.argsort(-S, axis=1, kind="stable")[:, :n_take]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy().repeat(n_take),
                    "cell": cell_ids[order].ravel().astype("int32"),
                }
            )

    qprobe = qdf.mapInPandas(pick_probes, schema=f"query_id {id_t}, cell int")
    probe_ids = sorted(
        r["cell"] for r in qprobe.select("cell").distinct().collect()
    )
    return qdf, qprobe, probe_ids, id_t


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 3,
    k: int = 10,
) -> DataFrame:
    """Probe-and-scan: union of the query batch's n_probe cells → ONE
    pruned partitioned scan (`cell IN (...)` reaches PartitionFilters)
    → broadcast-queries exact scoring inside EACH query's own probed
    cells (equi-join on cell — proper per-query IVF semantics) → top-k
    window per query. Returns (query_id, neighbor_id, score 6dp).

    Probe selection runs INSIDE an Arrow kernel (the ≤n_cells codebook
    rides the closure); only the DISTINCT probed cell ids — at most
    n_cells ints — are collected to build the partition-pruning
    literal. Query vectors never touch the driver, so the batch can be
    arbitrarily large. An empty query batch returns an empty frame."""
    qdf, qprobe, probe_ids, id_t = _probe_frame(
        spark, path, queries, id_col, vec_col, n_probe
    )
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, score double"
    if not probe_ids:
        return spark.createDataFrame([], out_schema)

    cells = spark.read.parquet(f"{path}/cells").where(
        F.col("cell").isin(probe_ids)
    )
    qside = qdf.join(qprobe, "query_id")
    scored = (
        cells.join(F.broadcast(qside), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (
                F.aggregate(
                    F.zip_with(vec_col, "qv", lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.greatest(
                    F.sqrt(
                        F.aggregate(
                            F.transform(vec_col, lambda x: x * x),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    )
                    * F.sqrt(
                        F.aggregate(
                            F.transform("qv", lambda x: x * x),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        )
                    ),
                    F.lit(1e-12),
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ persisted layout: the cells hold product-quantization CODES
# (m_sub small ints + one recon norm per vector ≈ 16-70 B) instead of raw
# float vectors (256-512 B) — the scan-bytes answer at 100 TB: directory
# pruning cuts WHICH cells are read, PQ cuts HOW MUCH each cell weighs.
# ---------------------------------------------------------------------------


def _pq_codebook(
    corpus: DataFrame, id_col: str, vec_col: str, ks: int, seed: int
) -> "list":
    """ks hash-sampled corpus vectors — the same constant-size,
    deterministic pick as functions/similarity.ann_ivf_pq (one bounded
    driver collect, ≤ ks rows regardless of corpus size)."""
    return (
        corpus.select(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(ks))
            .cast("int")
            .alias("b"),
            F.struct(
                F.xxhash64(F.col(id_col), F.lit(seed + 1)).alias("__h"),
                F.col(id_col).alias("__sid"),
                F.col(vec_col).alias("__sv"),
            ).alias("__pick"),
        )
        .groupBy("b")
        .agg(F.min("__pick").alias("__pick"))
        .select(F.col("b"), F.col("__pick.__sv").alias("sv"))
        .collect()
    )


def _load_pq(spark: SparkSession, path: str):
    """(CB (m_sub, ks_eff, dsub), cb_norms_sq, m_sub, dsub) from the
    persisted pq_codebook + pq_meta sidecars."""
    import numpy as np

    meta = spark.read.parquet(f"{path}/pq_meta").first()
    m_sub, dim = meta["m_sub"], meta["dim"]
    rows = spark.read.parquet(f"{path}/pq_codebook").orderBy("b").collect()
    S_ = np.array([r["sv"] for r in rows], dtype=np.float64)
    dsub = dim // m_sub
    CB = np.ascontiguousarray(
        S_.reshape(len(S_), m_sub, dsub).transpose(1, 0, 2)
    )
    return CB, (CB**2).sum(axis=2), m_sub, dsub


def _encode_pq(df: DataFrame, CB, cb_norms_sq, id_col: str, vec_col: str):
    """(id, vec) → (id, codes, recon_norm) via the vectorized
    subvector-argmin kernel (no corpus shuffle; codebook rides the
    closure)."""
    import numpy as np

    m_sub = CB.shape[0]
    dsub = CB.shape[2]
    id_t = dict(df.dtypes)[id_col]

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["__v"].tolist(), dtype=np.float64)
            Xs = X.reshape(len(X), m_sub, dsub)
            dots = np.einsum("nmd,mkd->nmk", Xs, CB)
            code = (cb_norms_sq[None, :, :] - 2.0 * dots).argmin(axis=2)
            recon_sq = cb_norms_sq[np.arange(m_sub)[None, :], code].sum(axis=1)
            yield pd.DataFrame(
                {
                    "__vid": pdf["__vid"].values,
                    "codes": list(code.astype(np.int32)),
                    "recon_norm": np.sqrt(recon_sq),
                }
            )

    return df.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).alias("__v")
    ).mapInPandas(
        encode, schema=f"__vid {id_t}, codes array<int>, recon_norm double"
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m_sub: int = 16,
    ks: int = 32,
    seed: int = 7,
    lloyd_iters: int = 0,
) -> None:
    """Materialize the IVF-PQ layout: ``path/codebook`` (coarse cells),
    ``path/pq_codebook`` + ``path/pq_meta`` (PQ sidecars), and
    ``path/cells`` partitioned by cell holding (id, codes, recon_norm)
    ONLY — raw vectors never enter the layout, so a 64-dim float64
    corpus (512 B/row) stores as m_sub=16 int codes + one double
    (~70 B parquet-encoded; int8-width codes once ks ≤ 256 dictionary-
    encode far smaller). Search reads n_probe/n_cells of THAT.

    Citation: the in-memory twin is functions/similarity.ann_ivf_pq
    (same deterministic codebooks, same encode kernel); this module
    persists its stages the way build_ivf_index persists ann_ivf."""
    import numpy as np

    from replicadb_spark.functions.similarity import coarse_centroids

    spark = corpus.sparkSession
    cents = coarse_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells,
        lloyd_iters=lloyd_iters,
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")

    sample = _pq_codebook(corpus, id_col, vec_col, ks, seed)
    dim = len(sample[0]["sv"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    spark.createDataFrame(
        [(r["b"], [float(x) for x in r["sv"]]) for r in sample],
        "b int, sv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pq_codebook")
    spark.createDataFrame(
        [(m_sub, ks, dim)], "m_sub int, ks int, dim int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pq_meta")

    CB, cb_norms_sq, m_sub, _dsub = _load_pq(spark, path)
    saved_cents = spark.read.parquet(f"{path}/codebook")
    codes = _encode_pq(corpus, CB, cb_norms_sq, id_col, vec_col)
    cells = _assign(corpus, saved_cents, id_col, vec_col).select("__vid", "cell")
    codes.join(cells, "__vid").withColumnRenamed("__vid", id_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{path}/cells")


def append_to_ivf_pq_index(
    new_vecs: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental maintenance with BOTH codebooks frozen: coarse-assign
    and PQ-encode the new vectors, append into touched cell partitions
    (same operational contract as append_to_ivf_index — rebuild when
    the recall gate drops)."""
    spark = new_vecs.sparkSession
    cents = spark.read.parquet(f"{path}/codebook")
    CB, cb_norms_sq, _m, _d = _load_pq(spark, path)
    codes = _encode_pq(new_vecs, CB, cb_norms_sq, id_col, vec_col)
    cells = _assign(new_vecs, cents, id_col, vec_col).select("__vid", "cell")
    codes.join(cells, "__vid").withColumnRenamed("__vid", id_col).write.mode(
        "append"
    ).partitionBy("cell").parquet(f"{path}/cells")


def search_ivf_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 3,
    k: int = 10,
    rerank: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Probe → pruned CODES scan → ADC scoring → top-k; optionally
    exact-rescore the ADC shortlist against the raw ``corpus`` (the
    standard retrieve+rerank, rerank ≥ k candidates per query).

    Plan shape: the probed-cell scan reads codes-only bytes
    (PartitionFilters prune directories, the column set is
    (id, codes, recon_norm)); ADC is one Arrow kernel with a per-query
    (m_sub × ks) LUT; the rerank joins a broadcast shortlist of
    ≤ rerank·|queries| ids against the corpus — the corpus itself
    never shuffles. Empty query batches return an empty frame."""
    import numpy as np

    CB, _cbn, m_sub, dsub = _load_pq(spark, path)
    qdf, qprobe, probe_ids, id_t = _probe_frame(
        spark, path, queries, id_col, vec_col, n_probe
    )
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, score double"
    if not probe_ids:
        return spark.createDataFrame([], out_schema)

    cells = spark.read.parquet(f"{path}/cells").where(
        F.col("cell").isin(probe_ids)
    )
    qside = qdf.join(qprobe, "query_id")
    cand = (
        cells.join(F.broadcast(qside), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "codes",
            "recon_norm",
            "qv",
        )
    )

    def adc(batches):
        import pandas as pd

        luts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out = np.empty(len(pdf), dtype=np.float64)
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            recon = pdf["recon_norm"].values
            qids = pdf["query_id"].values
            for qid in pd.unique(qids):
                sel = qids == qid
                if qid not in luts:
                    qv = np.array(pdf["qv"].values[sel][0], dtype=np.float64)
                    luts[qid] = (
                        np.einsum("md,mkd->mk", qv.reshape(m_sub, dsub), CB),
                        float(np.sqrt((qv**2).sum())),
                    )
                lut, qn = luts[qid]
                dots = lut[np.arange(m_sub)[None, :], codes[sel]].sum(axis=1)
                denom = qn * recon[sel]
                with np.errstate(divide="ignore", invalid="ignore"):
                    out[sel] = np.where(denom > 0, dots / denom, 0.0)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "neighbor_id": pdf["neighbor_id"].values,
                    "score": out,
                }
            )

    scored = cand.mapInPandas(adc, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    if rerank <= 0 or corpus is None:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select(
                "query_id", "neighbor_id", F.round("score", 6).alias("score")
            )
        )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max(rerank, k))
        .select("query_id", "neighbor_id")
    )
    from replicadb_spark.functions.similarity import cosine

    exact = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        .join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("c_vec")).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"))
    )


def ivf_cell_stats(
    spark: SparkSession,
    path: str,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Operational health of the persisted IVF layout — the numbers the
    rebuild decision needs (the frozen-codebook trade documented on
    ``append_to_ivf_index``): per cell, how many vectors it holds, how
    many part-files it has fragmented into, and the mean cosine of its
    vectors to their own centroid (assignment tightness — drifting data
    pulls this down; rebuild with fresh centroids when it sags or when
    cell sizes skew).

    Returns (cell, n_vecs, n_files, mean_cos_to_centroid) — one row per
    cell, bounded by n_cells. ONE pruned scan + one groupBy(cell)
    aggregate; the codebook joins in as a broadcast. File counts come
    from one Hadoop-FS glob over the cell directories (the same
    bounded listing compaction does; any Spark-readable URI)."""
    from replicadb_spark.fs import TableFS
    from replicadb_spark.fs import join as fs_join

    from replicadb_spark.functions.similarity import cosine

    fs = TableFS(spark, path)
    counts: dict[int, int] = {}
    for f, _sz in fs.glob(fs_join(path, "cells", "cell=*", "*.parquet")):
        cell = int(f.rsplit("/", 2)[-2].split("=", 1)[1])
        counts[cell] = counts.get(cell, 0) + 1
    files_df = spark.createDataFrame(
        sorted(counts.items()), "cell int, n_files int"
    )
    cells = spark.read.parquet(f"{path}/cells")
    cents = spark.read.parquet(f"{path}/codebook")
    stats = (
        cells.join(F.broadcast(cents), "cell")
        .select("cell", cosine(F.col(vec_col), F.col("cent_vec")).alias("cos"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("mean_cos_to_centroid"),
        )
    )
    return (
        stats.join(F.broadcast(files_df), "cell")
        .select("cell", "n_vecs", "n_files", "mean_cos_to_centroid")
        .orderBy("cell")
    )
