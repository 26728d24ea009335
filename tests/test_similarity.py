"""Similarity search (functions/similarity.py)."""

import math

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from replicadb_spark.functions import similarity as S

SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_cosine_known_values(spark, vectors):
    pairs = vectors.alias("a").crossJoin(vectors.alias("b")).select(
        F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
        S.cosine(F.col("a.embedding"), F.col("b.embedding")).alias("c"),
    )
    got = {(r["ia"], r["ib"]): r["c"] for r in pairs.collect()}
    assert got[(0, 0)] == pytest.approx(1.0)
    assert got[(0, 2)] == pytest.approx(0.0)
    assert got[(0, 3)] == pytest.approx(-1.0)
    # embeddings are stored float32: 0.9/0.1 round at ~1e-8
    assert got[(0, 1)] == pytest.approx(0.9 / math.sqrt(0.82), rel=1e-6)


def test_knn_ranks_expected_neighbors(vectors):
    out = S.knn_bruteforce(vectors, vectors.where(F.col("vec_id") == 0), k=2).collect()
    ranked = [(r["rank"], r["neighbor_id"]) for r in out]
    assert ranked == [(1, 1), (2, 4)]
    # self excluded
    assert all(r["neighbor_id"] != 0 for r in out)


def test_knn_broadcast_no_corpus_shuffle(vectors):
    plan = (
        S.knn_bruteforce(vectors, vectors.where(F.col("vec_id") == 0), k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ann_lsh_recall_on_testdata(spark):
    """LSH candidates must recover most exact top-10 neighbors."""
    from replicadb_spark.session import tables

    emb = tables(spark, "/root/testdata/sf0.001", ("embeddings",))["embeddings"]
    queries = emb.where(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             S.knn_bruteforce(emb, queries, k=10).collect()}
    approx = {(r["query_id"], r["neighbor_id"]) for r in
              S.ann_lsh(emb, queries, dim=64, n_tables=12, bits=6, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    # TESTDATA embeddings are near-random (mean top-10 cosine ≈ 0.30) —
    # the hard case for LSH; 12 tables × 6 bits scores ~16% of the corpus
    # and recovers 40% of exact neighbors (deterministic planes).
    assert recall >= 0.35


def test_embedding_neardup_pairs(vectors):
    pairs = {(r["id_a"], r["id_b"]) for r in
             S.embedding_neardup_pairs(vectors, threshold=0.95).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_hyperplanes_deterministic():
    assert S._hyperplanes(8, 4, seed=13) == S._hyperplanes(8, 4, seed=13)
    assert S._hyperplanes(8, 4, seed=13) != S._hyperplanes(8, 4, seed=14)
