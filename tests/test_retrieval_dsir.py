"""Hybrid RRF retrieval (functions/retrieval) and DSIR importance
weights (functions/text.dsir_importance): fusion semantics on tiny
hand-checkable corpora, partial-coverage handling, and the importance
ratio's direction."""

from pyspark.sql import functions as F

from replicadb_spark.functions.retrieval import (
    bm25_related_docs,
    cosine_related_docs,
    rrf_fuse,
)
from replicadb_spark.functions.text import dsir_importance


def _docs(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "omega psi chi"),
        (4, "beta gamma delta epsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bm25_related_excludes_self_and_ranks_overlap(spark):
    out = bm25_related_docs(_docs(spark), "doc_id", "text", [0], top_k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 0 not in rows  # never returns the query doc itself
    # doc 3 shares no term with doc 0 — absent entirely
    assert 3 not in rows
    # richer overlap ranks above poorer: 1 (3 shared) beats 2 (2 shared)
    assert rows[1]["lex_rank"] < rows[2]["lex_rank"]


def test_cosine_related_orders_by_similarity(spark):
    out = cosine_related_docs(_emb(spark), "vec_id", "embedding", [0])
    ranks = {r["doc_id"]: r["dense_rank"] for r in out.collect()}
    assert 0 not in ranks
    assert ranks[1] == 1  # nearly parallel to the query
    assert ranks[1] < ranks[2] and ranks[1] < ranks[3]


def test_rrf_fuse_handles_one_sided_candidates(spark):
    """A doc present in only one ranker still fuses (the missing leg
    contributes 0); a doc in both legs outranks a same-rank one-sided
    doc; booleans report the provenance."""
    lex = spark.createDataFrame(
        [(0, 10, 5.0, 1), (0, 11, 4.0, 2)],
        "query_id long, doc_id long, lex_score double, lex_rank int",
    )
    dense = spark.createDataFrame(
        [(0, 10, 0.9, 1), (0, 12, 0.8, 2)],
        "query_id long, doc_id long, dense_score double, dense_rank int",
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(lex, dense, k=60).collect()}
    assert set(rows) == {10, 11, 12}
    assert rows[10]["in_lex"] and rows[10]["in_dense"]
    assert rows[11]["in_lex"] and not rows[11]["in_dense"]
    assert not rows[12]["in_lex"] and rows[12]["in_dense"]
    assert rows[10]["rrf_rank"] == 1  # both legs beat any single leg
    # same single-leg rank 2 on each side -> identical rrf, doc_id break
    assert rows[11]["rrf"] == rows[12]["rrf"]
    assert rows[11]["rrf_rank"] == 2 and rows[12]["rrf_rank"] == 3
    # 1/(60+1) + 1/(60+1), rounded 6dp
    assert abs(rows[10]["rrf"] - round(2 / 61, 6)) < 1e-9


def test_dsir_weights_tilt_toward_target_vocabulary(spark):
    """Docs made of target-only vocabulary score above docs of
    off-target vocabulary; weights are finite for unseen-in-target
    buckets (add-one smoothing)."""
    rows = [
        (0, "aaa bbb aaa bbb aaa", 1),
        (1, "aaa bbb aaa", 1),
        (2, "aaa bbb ccc", 0),
        (3, "xxx yyy zzz xxx", 0),
        (4, "xxx yyy", 0),
    ]
    df = spark.createDataFrame(rows, "id long, text string, tgt int")
    out = {
        r["id"]: r
        for r in dsir_importance(
            df, "id", "text", F.col("tgt") == 1, n_buckets=64
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0]["n_terms"] == 5
    # pure target vocab > mixed > pure off-target (absolute signs are
    # not asserted: with n_buckets >> corpus counts the add-one
    # smoothing flattens the target distribution and shifts every
    # weight by a constant-ish offset; the ORDER is the contract)
    assert out[1]["weight_raw"] > out[2]["weight_raw"]
    assert out[2]["weight_raw"] > out[4]["weight_raw"]
    assert out[0]["weight_raw"] > out[3]["weight_raw"]
    # per-term tilt: target docs' mean term weight beats off-target's
    assert (out[0]["weight_raw"] / out[0]["n_terms"]) > (
        out[3]["weight_raw"] / out[3]["n_terms"]
    )


def test_dup_span_coverage_hand_checked(spark, tmp_path, monkeypatch):
    """dup_span_coverage on a hand-built corpus: verbatim cross-doc
    spans count, within-doc-only repetition does NOT (distinct-doc
    vote), overlapping duplicated grams union without double counting,
    and a full duplicate covers 100%."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from replicadb_spark.plans.catalog import QUERIES

    shared = "X" * 10 + "Y" * 10 + "Z" * 15  # 35 chars, shared verbatim
    rows = [
        # docs 1/2 share a 35-char block → union of the six 30-gram
        # spans = the whole 35-char block in each
        (1, "A" * 20 + shared),
        (2, shared + "B" * 20),
        # 3 repeats ITS OWN 30-gram twice but shares nothing: 0
        (3, ("Q" * 30) * 2 + "R" * 5),
        # 4/5: exact duplicates → full coverage
        (4, "D" * 44),
        (5, "D" * 44),
        (6, "unique text with no repeats at all and some padding!!"),
    ]
    pdf = pa.Table.from_pylist(
        [
            {"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)}
            for i, t in rows
        ]
    )
    d = tmp_path / "docs_dup"
    d.mkdir()
    pq.write_table(pdf, d / "documents.parquet")
    got = {
        r["doc_id"]: (r["dup_chars"], r["dup_frac"])
        for r in QUERIES["dup_span_coverage"](spark, str(tmp_path / "docs_dup")).collect()
    }
    assert got[1] == (35, round(35 / 55, 6))
    assert got[2] == (35, round(35 / 55, 6))
    assert got[3] == (0, 0.0)  # within-doc repetition is not dup
    assert got[4] == (44, 1.0) and got[5] == (44, 1.0)
    assert got[6] == (0, 0.0)
