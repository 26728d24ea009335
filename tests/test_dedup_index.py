"""Persisted MinHash near-dup index (operators/dedup_index): durable
bucket/signature store, broadcast probe, frozen-parameter append,
band-directory compaction."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.operators.dedup_index import (
    append_to_minhash_index,
    build_minhash_index,
    query_minhash_index,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mh") / "idx")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    build_minhash_index(docs, path, k=3, num_hashes=128, bands=64)
    return path, docs


def test_layout_is_band_partitioned(spark, index):
    import os

    path, docs = index
    dirs = [d for d in os.listdir(f"{path}/buckets") if d.startswith("band=")]
    assert len(dirs) == 64
    assert spark.read.parquet(f"{path}/sigs").count() == docs.count()


def test_query_finds_perturbed_near_dups_not_unrelated(spark, index):
    path, docs = index
    # near-dups: docs 10..14 with one word appended (jaccard stays high)
    near = docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 15)).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
    )
    # unrelated: distinct vocabulary, shares no 3-gram shingles
    unrelated = spark.createDataFrame(
        [(2_000_000 + i, " ".join(f"q{i}w{j}" for j in range(40)))
         for i in range(3)],
        "doc_id long, text string",
    )
    batch = near.unionByName(unrelated)
    res = query_minhash_index(
        spark, path, batch, min_est_jaccard=0.4
    ).collect()
    found = {r["new_id"]: r for r in res}
    for d in range(10, 15):
        nid = d + 1_000_000
        assert nid in found, f"near-dup of {d} not found"
        # the best match must be the source doc
        best = max(
            (r for r in res if r["new_id"] == nid),
            key=lambda r: (r["est_jaccard"], -r["match_id"]),
        )
        assert best["match_id"] == d
        assert best["est_jaccard"] >= 0.5
    assert not any(r["new_id"] >= 2_000_000 for r in res)


def test_query_recall_vs_exact_jaccard(spark, index):
    """Self-probe recall: querying the corpus against its own index must
    recover >= 80% of the exact Jaccard-0.5 pairs (the dedup_minhash_lsh
    gate bound, through the PERSISTED store)."""
    from replicadb_spark.functions.dedup import jaccard_pairs

    path, docs = index
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(
            docs, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    got_raw = query_minhash_index(
        spark, path, docs, min_est_jaccard=0.35
    ).collect()
    got = {
        (min(r["new_id"], r["match_id"]), max(r["new_id"], r["match_id"]))
        for r in got_raw
    }
    recall = len(got & truth) / max(len(truth), 1)
    assert len(truth) > 0
    assert recall >= 0.8, (recall, len(truth))


def test_append_then_query_matches_new_docs(spark, index, tmp_path):
    path, docs = index
    batch1 = docs.where(F.col("doc_id") == 42).select(
        F.lit(3_000_001).alias("doc_id"), "text"
    )
    append_to_minhash_index(batch1, path)
    # batch2 is a near-dup of batch1's doc — the match must surface via
    # the APPENDED rows (id 3_000_001), not only the original corpus
    batch2 = docs.where(F.col("doc_id") == 42).select(
        F.lit(3_000_002).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" y")).alias("text"),
    )
    res = query_minhash_index(spark, path, batch2, min_est_jaccard=0.5)
    matches = {r["match_id"] for r in res.collect()}
    assert 3_000_001 in matches and 42 in matches


def test_band_dirs_compact_with_shared_maintenance(spark, tmp_path):
    import os

    from replicadb_spark.operators.ann_index import compact_partition_dirs

    path = str(tmp_path / "mh_frag")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    build_minhash_index(docs.where(F.col("doc_id") < 50), path)
    for i in range(3):
        append_to_minhash_index(
            docs.where(F.col("doc_id") == 100 + i).select(
                (F.col("doc_id") + 4_000_000).alias("doc_id"), "text"
            ),
            path,
        )

    def n_files():
        total = 0
        for d in os.listdir(f"{path}/buckets"):
            if d.startswith("band="):
                total += len([
                    f for f in os.listdir(f"{path}/buckets/{d}")
                    if f.endswith(".parquet")
                ])
        return total

    before_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/buckets").select(
            "id", "bucket", "band"
        ).collect()
    )
    files_before = n_files()
    stats = compact_partition_dirs(
        spark, path, subdir="buckets", prefix="band="
    )
    assert stats["cells_compacted"] >= 1
    assert n_files() < files_before
    after_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/buckets").select(
            "id", "bucket", "band"
        ).collect()
    )
    assert after_rows == before_rows


def test_minhash_index_stats_flags_hot_buckets(spark, tmp_path):
    from replicadb_spark.operators.dedup_index import minhash_index_stats

    path = str(tmp_path / "hot_idx")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    # 20 exact copies of one text -> every band has a bucket of >= 20
    clones = spark.createDataFrame(
        [(5_000_000 + i, "the same hot text repeated " * 5)
         for i in range(20)],
        "doc_id long, text string",
    )
    base = docs.select("doc_id", "text").unionByName(clones)
    build_minhash_index(base, path)
    stats = {r["band"]: r for r in minhash_index_stats(spark, path).collect()}
    assert len(stats) == 64
    for band, r in stats.items():
        assert r["max_bucket_size"] >= 20, (band, r)
        assert r["n_buckets"] >= 1


def test_query_caps_hot_buckets(spark, tmp_path):
    """max_bucket_size acts on the signal minhash_index_stats measures:
    a probe landing in a boilerplate bucket of 20 clones gets ZERO
    candidates from it under the cap (instead of 20 per probe forever),
    while matches for ordinary documents are unaffected."""
    path = str(tmp_path / "cap_idx")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    clones = spark.createDataFrame(
        [(5_000_000 + i, "the same hot text repeated " * 5)
         for i in range(20)],
        "doc_id long, text string",
    )
    build_minhash_index(docs.select("doc_id", "text").unionByName(clones), path)

    # probe 1: the boilerplate text itself — every band saturated
    boiler = spark.createDataFrame(
        [(9_000_000, "the same hot text repeated " * 5)],
        "doc_id long, text string",
    )
    uncapped = query_minhash_index(
        spark, path, boiler, min_est_jaccard=0.5, max_bucket_size=None
    ).count()
    capped = query_minhash_index(
        spark, path, boiler, min_est_jaccard=0.5, max_bucket_size=10
    ).count()
    assert uncapped == 20  # O(bucket) candidates per probe — the failure
    assert capped == 0

    # probe 2: a near-dup of an ordinary doc — its buckets are small,
    # so the same cap changes nothing
    near = docs.where(F.col("doc_id") == 7).select(
        F.lit(9_000_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    got = query_minhash_index(
        spark, path, near, min_est_jaccard=0.5, max_bucket_size=10
    ).collect()
    assert any(r["match_id"] == 7 for r in got)
