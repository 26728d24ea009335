"""Persisted MinHash near-dup index: the dedup twin of the ANN index
family (operators/ann_index).

``functions/dedup.minhash_dedup_pairs_bipartite`` dedupes an incoming
batch against a corpus but re-sketches the corpus every run — its own
docstring says "at 100 TB the existing side's buckets are a precomputed
index (stage them to a table)". This module IS that table:

- ``build``: one sketch pass over the corpus writes the banded-LSH
  bucket rows (``path/buckets``, partitioned by band) and the full
  MinHash signatures (``path/sigs``) plus a parameter sidecar. The
  corpus TEXT is not retained — membership screening needs only the
  sketch.
- ``query``: an incoming batch is sketched once, its bucket rows are
  BROADCAST against the persisted bucket store (the big side never
  shuffles), candidate pairs pull the stored signatures, and similarity
  is the unbiased MinHash estimate — the fraction of agreeing signature
  components (±1/√num_hashes ≈ 0.09 at 128 hashes). No corpus re-read,
  no raw-text join.
- ``append``: sketch the accepted batch and append its bucket/sig rows
  (dynamic partition append touches each band's directory once per
  batch; ``ann_index.compact_partition_dirs`` compacts the
  fragmentation, same contract as the IVF cells).

Determinism: the sketch parameters (k, num_hashes, bands, seed) are
frozen in the sidecar at build time; both query sides re-derive buckets
and signatures from them, so index and probe always share hash
families. Reference parity: this generalizes the reference's PK-based
incremental MERGE (SqlManager.java:503-512) to similarity-based
identity — the "have I seen (something like) this row" question at
training-data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from replicadb_spark.functions.dedup import (
    minhash_band_buckets,
    minhash_signatures_df,
)


def _sketch(
    docs: DataFrame, id_col: str, text_col: str,
    k: int, num_hashes: int, bands: int, seed: int,
) -> tuple[DataFrame, DataFrame]:
    buckets = minhash_band_buckets(
        docs, id_col, text_col,
        k=k, num_hashes=num_hashes, bands=bands, seed=seed,
    )
    sigs = minhash_signatures_df(
        docs, id_col, text_col, k=k, num_hashes=num_hashes, seed=seed
    )
    return buckets, sigs


def build_minhash_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 128,
    bands: int = 64,
    seed: int = 42,
) -> None:
    """Materialize the near-dup index: ``path/buckets`` (id, bucket;
    partitioned by band), ``path/sigs`` (id, sig), ``path/meta``."""
    spark = docs.sparkSession
    spark.createDataFrame(
        [(k, num_hashes, bands, seed)],
        "k int, num_hashes int, bands int, seed int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    buckets, sigs = _sketch(docs, id_col, text_col, k, num_hashes, bands, seed)
    buckets.write.mode("overwrite").partitionBy("band").parquet(
        f"{path}/buckets"
    )
    sigs.write.mode("overwrite").parquet(f"{path}/sigs")


def append_to_minhash_index(
    new_docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Sketch an accepted batch with the FROZEN index parameters and
    append its bucket/signature rows (ids must be fresh — the
    incremental-ingest contract shared with the bipartite path).

    The batch id column is cast to the STORE's id type first — mixed
    int/bigint part-files in one directory fail every later scan (the
    append_to_ivf_index lesson applied here)."""
    spark = new_docs.sparkSession
    m = spark.read.parquet(f"{path}/meta").first()
    stored_id_t = (
        spark.read.parquet(f"{path}/sigs").schema["id"].dataType.simpleString()
    )
    new_docs = new_docs.withColumn(id_col, F.col(id_col).cast(stored_id_t))
    buckets, sigs = _sketch(
        new_docs, id_col, text_col,
        m["k"], m["num_hashes"], m["bands"], m["seed"],
    )
    buckets.write.mode("append").partitionBy("band").parquet(f"{path}/buckets")
    sigs.write.mode("append").parquet(f"{path}/sigs")


def query_minhash_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_jaccard: float = 0.4,
    max_bucket_size: "int | None" = 1000,
) -> DataFrame:
    """(new_id, match_id, est_jaccard) for every indexed document whose
    estimated Jaccard with a batch document clears the threshold.

    Plan: batch bucket rows BROADCAST onto the persisted bucket store
    (equi-join on (band, bucket); the store never shuffles) → hot-bucket
    cap → distinct candidate pairs → stored signatures pulled by
    broadcast semi-join → agreement-fraction estimate in codegen
    (zip_with + filter + size). Cost is O(batch·bands + collisions),
    independent of corpus size.

    ``max_bucket_size`` caps the LSH failure mode minhash_index_stats
    measures: a boilerplate bucket shared by k docs would contribute
    O(k) candidates to EVERY probe landing in it, forever. Buckets
    bigger than the cap are dropped from candidate generation entirely
    (mirroring the FastSS index's ``max_sig_df``) — a true near-dup of
    boilerplate still surfaces through its other, unsaturated bands,
    which is why the recall gate stays green. The size check rides the
    probe's own collision set (one window over the already-joined hits,
    store ids being unique per bucket), so no second store scan and
    nothing O(store) is recounted per query. ``None`` disables."""
    m = spark.read.parquet(f"{path}/meta").first()
    num_hashes = m["num_hashes"]
    nb, new_sigs = _sketch(
        new_docs, id_col, text_col,
        m["k"], num_hashes, m["bands"], m["seed"],
    )
    store = spark.read.parquet(f"{path}/buckets")
    hits = store.join(
        F.broadcast(
            nb.select(F.col("id").alias("new_id"), "band", "bucket")
        ),
        ["band", "bucket"],
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        # (band, bucket, id) is unique in the store, so the per-probe
        # partition count IS the store bucket's size
        bsz = F.count(F.lit(1)).over(
            Window.partitionBy("band", "bucket", "new_id")
        )
        hits = hits.withColumn("__bsz", bsz).where(
            F.col("__bsz") <= max_bucket_size
        )
    cand = (
        hits
        .where(F.col("id") != F.col("new_id"))
        .select(F.col("id").alias("match_id"), "new_id")
        .distinct()
    )
    old_sigs = spark.read.parquet(f"{path}/sigs")
    matched = old_sigs.join(
        F.broadcast(cand), old_sigs["id"] == cand["match_id"]
    ).select("new_id", "match_id", F.col("sig").alias("sig_old"))
    joined = matched.join(
        F.broadcast(
            new_sigs.select(
                F.col("id").alias("new_id"), F.col("sig").alias("sig_new")
            )
        ),
        "new_id",
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_old", "sig_new", lambda a, b: a == b),
            lambda x: x,
        )
    )
    return (
        joined.select(
            "new_id",
            "match_id",
            F.round(agree.cast("double") / num_hashes, 4).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= min_est_jaccard)
    )


def minhash_index_stats(spark: SparkSession, path: str) -> DataFrame:
    """Operational health of the persisted near-dup store: per band, the
    bucket-count and the largest / 99th-percentile bucket sizes. Hot
    buckets are THE LSH failure mode at scale — a bucket shared by k
    docs contributes O(k) candidates to EVERY future probe that lands
    in it (the same degradation max_sig_df caps in the FastSS index),
    so a fattening max_bucket_size is the signal to re-shard with more
    bands / a different seed or to cap the bucket in query.

    Returns (band, n_buckets, max_bucket_size, p99_bucket_size) — one
    row per band. ONE scan + two groupBys whose keys are (band, bucket)
    then band; every aggregate is map-side combinable."""
    b = spark.read.parquet(f"{path}/buckets")
    per_bucket = b.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return (
        per_bucket.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket_size"),
            F.percentile_approx("sz", 0.99).alias("p99_bucket_size"),
        )
        .orderBy("band")
    )
