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
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
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


def lsh_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 13) -> Column:
    """Random-hyperplane signature as one bucket id (long): bit i =
    sign(<v, h_i>). ±1 hyperplanes make the dot an exact sum of floats
    widened to double."""
    planes = _hyperplanes(dim, n_planes, seed)
    acc = F.lit(0).cast("long")
    for plane in planes:
        pl = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec, pl, lambda x, h: x.cast("double") * h),
            F.lit(0.0), lambda a, v: a + v,
        )
        acc = acc * 2 + F.when(d > 0, F.lit(1)).otherwise(F.lit(0))
    return acc


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    k: int = 10,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: candidates = same hyperplane bucket, then exact
    cosine rank within bucket. At scale the bucket join replaces the
    broadcast cross-join — O(n/2^planes) candidates per query."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_signature(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), dim, n_planes, seed).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
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

    Exact all-pairs form — correct at test scale; the 100 TB path blocks
    by lsh_signature first (same bucket ⇒ candidate), which this shares
    code with via ann_lsh.
    """
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return (
        v.alias("l")
        .join(v.alias("r"), F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            cosine(F.col("l.vec"), F.col("r.vec")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
