"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: broadcast the (small) query set, score every
  corpus vector with JVM-side array expressions (zip_with + aggregate —
  sequential fold, deterministic), window top-k per query. At 100 TB the
  corpus side never shuffles: it streams through a broadcast-join +
  partial top-k.
- LSH (random hyperplane) buckets: the approximate scale path — sign-bit
  signatures on deterministic hyperplanes, candidates share a bucket.
- Embedding near-dup: all-pairs within LSH buckets, cosine threshold.

All float math is widened to double before multiplication so the fold is
bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Plan: broadcast(queries) × corpus → score → window top-k. The
    cross-join is broadcast (no corpus shuffle); the only shuffle is the
    final top-k on query_id, which AQE coalesces. Excludes self-matches.
    Returns (query_id, neighbor_id, score) with deterministic (score desc,
    id asc) ranking.
    """
    import pandas as pd

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )

    # Per-partition partial top-k BEFORE the window shuffle: each corpus
    # partition keeps only its k best candidates per query, so the
    # exchange moves ≤ k·partitions·|queries| rows instead of
    # |corpus|·|queries|. The reducer only FILTERS rows whose score was
    # computed JVM-side, and applies the exact (score desc, id asc)
    # tie-break the final window uses — the global top-k of the reduced
    # set is provably the global top-k of the full set, bit-identical.
    def local_topk(batches):
        best: "pd.DataFrame | None" = None
        for pdf in batches:
            if not len(pdf):
                continue
            merged = pdf if best is None else pd.concat((best, pdf), ignore_index=True)
            merged = merged.sort_values(
                ["query_id", "score", "neighbor_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            best = merged.groupby("query_id", sort=False).head(k)
        if best is not None:
            yield best

    reduced = scored.mapInPandas(
        local_topk, schema="query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("score"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in {-1,+1}^dim from a
    MINSTD stream — integer-derived so every engine reproduces them."""
    state = seed % 2147483647 or 1
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 48271) % 2147483647
            row.append(1.0 if state % 2 else -1.0)
        planes.append(row)
    return planes


def _signature_from(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket id from explicit ±1 hyperplanes: bit i = sign(<v, h_i>)."""
    acc = F.lit(0).cast("long")
    for plane in planes:
        pl = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec, pl, lambda x, h: x.cast("double") * h),
            F.lit(0.0), lambda a, v: a + v,
        )
        acc = acc * 2 + F.when(d > 0, F.lit(1)).otherwise(F.lit(0))
    return acc


def lsh_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 13) -> Column:
    """Random-hyperplane signature as one bucket id (long). ±1 hyperplanes
    make the dot an exact sum of floats widened to double."""
    return _signature_from(vec, _hyperplanes(dim, n_planes, seed))


def lsh_tables(vec: Column, dim: int, n_tables: int, bits: int, seed: int = 13) -> Column:
    """Multi-table LSH keys: array of ``table_id·2^(bits+1) + bucket``
    longs, one per table (one contiguous plane stream split across
    tables). OR-amplification (candidate if ANY table collides) — the
    sign-random-projection analog of MinHash banding; essential when
    neighbors sit at moderate cosine, where a single table's AND-only
    collision probability collapses."""
    planes = _hyperplanes(dim, n_tables * bits, seed)
    keys = []
    for t in range(n_tables):
        sig = _signature_from(vec, planes[t * bits : (t + 1) * bits])
        keys.append(F.lit(t).cast("long") * (1 << (bits + 1)) + sig)
    return F.array(*keys)


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 12,
    bits: int = 6,
    k: int = 10,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 of n_tables hyperplane
    buckets; exact cosine ranks the candidates.

    Scale: corpus explodes to n_tables skinny (key, id) rows and joins the
    broadcast query keys — O(n · n_tables / 2^bits) scored pairs instead
    of O(n·q) brute force; the corpus vectors themselves never shuffle
    (the candidate ids semi-join back to the corpus on id)."""
    import numpy as np
    import pandas as pd

    planes = np.array(_hyperplanes(dim, n_tables * bits, seed))  # (T·b, dim)
    pow2 = 2 ** np.arange(bits)[::-1]

    def keyser(out_col):
        def gen(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
                )
                sig = (vecs @ planes.T > 0).astype(np.int64)  # (n, T·b)
                sig = sig.reshape(len(pdf), n_tables, bits)
                buckets = (sig * pow2).sum(axis=2)            # (n, T)
                buckets += np.arange(n_tables, dtype=np.int64) * (1 << (bits + 1))
                ids = np.repeat(np.asarray(pdf["id"].values, dtype=np.int64), n_tables)
                yield pd.DataFrame({out_col: ids, "bucket": buckets.reshape(-1)})

        return gen

    # one numpy matmul per Arrow batch replaces T·b interpreted
    # aggregate() plane-dots per row (the JVM HOF form is expression-
    # interpreted); same ±1 planes, so buckets are deterministic
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c_keys = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(keyser("neighbor_id"), schema="neighbor_id long, bucket long")
    q_keys = queries.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(keyser("query_id"), schema="query_id long, bucket long")
    cand = (
        c_keys.join(F.broadcast(q_keys), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 3,
    k: int = 10,
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic coarse quantizer
    (every (corpus_size/n_cells)-th vector by id is a "centroid") assigns
    each corpus vector to its nearest cell; each query probes its n_probe
    nearest cells and brute-forces only those.

    Scale: the centroid table is tiny and broadcast twice (assignment +
    probe); the corpus partition never shuffles for assignment — it streams
    through a broadcast join. The candidate join is corpus⋈probed-cells on
    cell id: O(n · n_probe / n_cells) scored pairs instead of O(n·q).
    (Real IVF trains centroids with k-means; a deterministic stride sample
    keeps the oracle/test reproducible — swap `centroids` for trained ones
    in production.)
    """
    w_cell = Window.partitionBy("__vid").orderBy(
        F.col("__cscore").desc(), F.col("cell").asc()
    )

    # stride-sample n_cells centroids deterministically by id rank (the
    # global row_number runs on the tiny id+vec projection; production
    # would use trained k-means centroids instead)
    n = corpus.count()
    stride = max(n // n_cells, 1)
    centroids = (
        corpus.withColumn("__rn", F.row_number().over(Window.orderBy(F.col(id_col))))
        .where(((F.col("__rn") - 1) % stride == 0) & (F.col("__rn") <= stride * n_cells))
        .select(
            ((F.col("__rn") - 1) / stride).cast("int").alias("cell"),
            F.col(vec_col).alias("cent_vec"),
        )
    )

    def assign(df: DataFrame, idc: str, vc: str, top: int) -> DataFrame:
        scored = df.select(F.col(idc).alias("__vid"), F.col(vc).alias("__v")).crossJoin(
            F.broadcast(centroids)
        ).select(
            "__vid", "cell", cosine(F.col("__v"), F.col("cent_vec")).alias("__cscore")
        )
        return (
            scored.withColumn("__r", F.row_number().over(w_cell))
            .where(F.col("__r") <= top)
            .select("__vid", "cell")
        )

    c_assign = assign(corpus, id_col, vec_col, 1)
    q_probe = assign(queries, id_col, vec_col, n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).join(c_assign.withColumnRenamed("__vid", "neighbor_id"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).join(q_probe.withColumnRenamed("__vid", "query_id"), "query_id")

    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Two phases, exact overall:

    1. **Candidate generation** — Arrow-batched ``mapInPandas``: the
       normalized corpus matrix is broadcast to executors; each Arrow
       batch runs one numpy GEMM (batch × corpus) and emits pairs with
       approx cosine ≥ t − 1e-6. A 12.5M-pair sweep is a ~1.6 GFLOP
       matmul (milliseconds) instead of 12.5M interpreted array folds.
    2. **Exact rescore** — the handful of survivors join back to their
       vectors and the deterministic sequential-fold cosine (JVM) applies
       the threshold, so the result is bit-identical to the naive
       all-pairs form (GEMM rounding stays inside the 1e-6 margin).

    Scale: the broadcast matrix caps this at ~10M vectors per block
    (64-dim float64 ≈ 5 GB); past that, block by ``lsh_tables`` /
    ``ann_ivf`` cells first and run this within blocks — same two-phase
    shape, same rescore.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    local = v.toPandas()
    ids = np.asarray(local["id"].values, dtype=np.int64)
    mat = np.asarray([np.asarray(x, dtype=np.float64) for x in local["vec"]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))
    margin = 1e-6

    def gen(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["vec"]])
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ b_mat.T
            qi, cj = np.nonzero(sims >= threshold - margin)
            qa = np.asarray(pdf["id"].values, dtype=np.int64)[qi]
            ca = b_ids[cj]
            keep = qa < ca
            yield pd.DataFrame({"id_a": qa[keep], "id_b": ca[keep]})

    cand = v.mapInPandas(gen, schema="id_a long, id_b long")
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    return (
        cand.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )
