"""Dedup operators on planted duplicates (functions/dedup.py)."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.functions import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm window sill in the late afternoon sun"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token change → high jaccard
FAR = "completely different content about spark shuffles and parquet row groups and columnar execution"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE), (1, NEAR), (2, FAR),
        (3, BASE),              # exact dup of 0
        (4, "  " + BASE.upper() + "  "),  # normalized dup of 0
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["t"])
    got = df.select(D.shingles(F.col("t"), 3).alias("s")).first()["s"]
    assert sorted(got) == ["a b c", "b c d"]
    # shorter than k → empty
    got2 = df.select(D.shingles(F.lit("a b"), 3).alias("s")).first()["s"]
    assert got2 == []


def test_exact_duplicates(corpus):
    dups = {(r["keep_id"], r["dup_count"]) for r in D.exact_duplicates(corpus, "doc_id", "text").collect()}
    assert dups == {(0, 3)}  # 0, 3, 4 normalize to the same text


def test_deduplicate_exact_keeps_min_id(corpus):
    kept = {r["doc_id"] for r in D.deduplicate_exact(corpus, "text", "doc_id").collect()}
    assert kept == {0, 1, 2, 5}


def test_jaccard_pairs_finds_near_dup(corpus):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             D.jaccard_pairs(corpus, "doc_id", "text", threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert pairs[(0, 1)] > 0.7
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert not any({a, b} == {0, 2} for a, b in pairs)


def test_jaccard_cap_not_binding_is_identity(corpus):
    # cap far above any shingle's DF → identical pairs and values
    base = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            D.jaccard_pairs(corpus, "doc_id", "text", threshold=0.2).collect()}
    capped = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              D.jaccard_pairs(corpus, "doc_id", "text", threshold=0.2,
                              max_shingle_df=1000).collect()}
    assert base == capped


def test_jaccard_cap_neutralizes_viral_shingle(spark):
    # 12 docs all share one viral 3-gram ("spam spam spam") but are
    # otherwise pairwise-disjoint word salad; docs 100/101 are true
    # near-dups. Uncapped, the viral shingle links every doc pair
    # (quadratic bucket); capped at DF<=8 the viral shingle is dropped
    # and only the true near-dup pair survives the threshold.
    viral = "spam spam spam"
    rows = [(i, f"{viral} unique{i}a unique{i}b unique{i}c unique{i}d") for i in range(12)]
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = {(r["id_a"], r["id_b"]) for r in
                D.jaccard_pairs(df, "doc_id", "text", threshold=0.05).collect()}
    # viral shingle creates pairs among the 12 spam docs
    assert any(a < 12 and b < 12 for a, b in uncapped)

    capped = {(r["id_a"], r["id_b"]) for r in
              D.jaccard_pairs(df, "doc_id", "text", threshold=0.05,
                              max_shingle_df=8).collect()}
    # spam-doc pairs vanish (their only shared shingle is viral)
    assert not any(a < 12 and b < 12 for a, b in capped)
    assert (100, 101) in capped

    # jaccard for the surviving pair is exact over the capped universe ==
    # full universe here (no viral shingle in docs 100/101)
    val = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           D.jaccard_pairs(df, "doc_id", "text", threshold=0.05,
                           max_shingle_df=8).collect()}[(100, 101)]
    # 8 tokens → 6 shingles each, 5 shared → 5/7
    assert abs(val - 5 / 7) < 1e-9


def test_minhash_matches_exact_on_high_sim(corpus):
    mh = {(r["id_a"], r["id_b"]) for r in
          D.minhash_dedup_pairs(corpus, "doc_id", "text", num_hashes=128, bands=64,
                                threshold=0.5).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in
             D.jaccard_pairs(corpus, "doc_id", "text", threshold=0.5).collect()}
    assert mh == exact


def test_minhash_signature_deterministic(corpus):
    a = D.minhash_signatures_df(corpus, "doc_id", "text", num_hashes=16).collect()
    b = D.minhash_signatures_df(corpus, "doc_id", "text", num_hashes=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    sig = dict((r["id"], r["sig"]) for r in a)
    assert sig[0] == sig[3]          # exact dups → identical signatures
    assert sig[0] != sig[2]


def test_simhash_near_dup_low_hamming(corpus):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             D.simhash_pairs(corpus, "doc_id", "text", max_hamming=10, band_bits=8).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 0
    assert (0, 1) in pairs and pairs[(0, 1)] <= 10


def test_lsh_candidates_scale_shape(corpus):
    cands = D.minhash_lsh_candidates(corpus, "doc_id", "text", num_hashes=32, bands=16)
    # candidate set must include the true near-dups
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert {(0, 1), (0, 3), (0, 4)} <= got


def test_bipartite_dedup_only_cross_pairs(spark):
    # existing: 0-2, incoming: 100-102; 100 duplicates 0, 101 duplicates
    # 102 (BOTH incoming — must NOT pair), 2 duplicates 1 (both existing)
    rows = [
        (0, BASE), (1, FAR), (2, FAR),
        (100, BASE), (101, NEAR), (102, NEAR.replace("sleepy", "drowsy")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    existing = df.where("doc_id < 100")
    incoming = df.where("doc_id >= 100")
    pairs = {(r["id_a"], r["id_b"]) for r in
             D.minhash_dedup_pairs_bipartite(
                 existing, incoming, "doc_id", "text",
                 num_hashes=128, bands=64, threshold=0.5).collect()}
    assert (0, 100) in pairs                      # cross-set dup found
    assert all(a < 100 <= b for a, b in pairs)    # bipartite only


def test_containment_catches_quoted_inclusion(spark):
    """A short doc fully contained in a long one: containment flags it,
    jaccard at the same cutoff does not."""
    from replicadb_spark.functions.dedup import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame([(1, short), (2, long)], "doc_id long, text string")

    cont = containment_pairs(df, "doc_id", "text", k=3, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.containment_a_in_b == 1.0  # every trigram of the short doc is in the long
    assert row.containment_b_in_a < 0.1

    jac = jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.9).collect()
    assert jac == []  # symmetric measure misses the inclusion


def test_containment_cap_neutralizes_viral_shingle(spark):
    # Same shape as the jaccard viral-shingle test: 12 docs share one
    # viral 3-gram but are otherwise disjoint; 100/101 are true
    # near-dups. Capped, the spam-doc pairs vanish and the surviving
    # pair's containment is exact over the capped universe.
    from replicadb_spark.functions.dedup import containment_pairs

    viral = "spam spam spam"
    rows = [(i, f"{viral} unique{i}a unique{i}b unique{i}c unique{i}d") for i in range(12)]
    rows.append((100, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta eta iota"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = {(r["id_a"], r["id_b"]) for r in
                containment_pairs(df, "doc_id", "text", threshold=0.05).collect()}
    assert any(a < 12 and b < 12 for a, b in uncapped)

    capped_rows = containment_pairs(
        df, "doc_id", "text", threshold=0.05, max_shingle_df=8
    ).collect()
    capped = {(r["id_a"], r["id_b"]) for r in capped_rows}
    assert not any(a < 12 and b < 12 for a, b in capped)
    assert (100, 101) in capped

    # 8 tokens → 6 shingles each, 5 shared → c = 5/6 both directions
    vals = {(r["id_a"], r["id_b"]): (r["containment_a_in_b"], r["containment_b_in_a"])
            for r in capped_rows}[(100, 101)]
    assert abs(vals[0] - 5 / 6) < 1e-9 and abs(vals[1] - 5 / 6) < 1e-9


def test_containment_superset_of_jaccard(spark):
    from replicadb_spark.functions.dedup import containment_pairs, jaccard_pairs
    from replicadb_spark.session import tables

    d = tables(spark, "/root/testdata/sf0.001", ("documents",))["documents"]
    thr = 0.5
    jac = {(r.id_a, r.id_b) for r in
           jaccard_pairs(d, "doc_id", "text", k=3, threshold=thr).collect()}
    cont = {(r.id_a, r.id_b) for r in
            containment_pairs(d, "doc_id", "text", k=3, threshold=thr).collect()}
    assert jac <= cont  # c(a→b) ≥ jaccard(a,b) for every pair


def test_semantic_dedup_planted_groups(spark):
    """Three near-identical copies of direction A, two of direction B,
    one orthogonal singleton; n_cells=1 so grouping is purely by
    similarity. Greedy min-id must keep exactly the smallest id of each
    duplicate group and the singleton."""
    import math

    from replicadb_spark.functions.dedup import semantic_dedup

    a = [1.0, 0.0, 0.0, 0.0]
    a2 = [math.cos(0.05), math.sin(0.05), 0.0, 0.0]   # cos ≈ 0.9988
    b = [0.0, 1.0, 0.0, 0.0]
    b2 = [0.0, math.cos(0.05), math.sin(0.05), 0.0]
    c = [0.0, 0.0, 0.0, 1.0]
    rows = [(10, a), (11, a2), (12, a), (20, b), (21, b2), (30, c)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", n_cells=1, threshold=0.99
    )
    kept = {r["id"] for r in out.collect() if r["kept"]}
    assert kept == {10, 20, 30}


def test_semantic_dedup_zero_vectors_survive(spark):
    """Zero-norm vectors are similar to nothing — all kept, no crash."""
    from replicadb_spark.functions.dedup import semantic_dedup

    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", n_cells=1, threshold=0.5
    )
    assert all(r["kept"] for r in out.collect())


def test_semantic_cell_pairs_matches_exact(spark):
    """The verification path's within-cell pairs equal the exact
    brute-force pairs when every vector is in one cell."""
    import itertools

    import numpy as np

    from replicadb_spark.functions.dedup import semantic_cell_pairs

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign = spark.createDataFrame(
        [(i, 0) for i in range(20)], "id long, cell int"
    )
    got = {
        (r.id_a, r.id_b)
        for r in semantic_cell_pairs(
            df, assign, id_col="vec_id", vec_col="embedding", threshold=0.3
        ).collect()
    }
    M = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    S = M @ M.T
    want = {
        (i, j)
        for i, j in itertools.combinations(range(20), 2)
        if S[i, j] >= 0.3
    }
    assert got == want and len(want) > 0


def test_chunk_dedup_spark_duckdb_agree_on_empty_docs(spark):
    """Empty/whitespace documents must not diverge between the engines:
    Spark's sequence() counts DOWN for a negative stop (phantom chunks)
    while DuckDB's generate_series returns empty — the catalog query
    floors the chunk count at 1 on both sides. Verified end-to-end by
    running the gated query on a corpus WITH empty docs."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as E

    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma", "", "   ", "alpha beta gamma delta"],
        "lang": ["en"] * 4,
        "source": ["s"] * 4,
        "n_chars": [16, 0, 3, 22],
    }
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(pa.table(rows), os.path.join(d, "documents.parquet"))

    sdf = E.queries()["chunk_dedup_rebuild"](spark, d).orderBy("doc_id")
    got = [(r["doc_id"], r["n_chunks"], r["n_kept"], r["rebuilt_text"])
           for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want = con.execute(
        E.oracle_sql()["chunk_dedup_rebuild"] + " ORDER BY doc_id"
    ).fetchall()
    assert got == [tuple(w) for w in want]
    # empty docs: exactly one empty chunk each, second one deduped away
    by_id = {g[0]: g for g in got}
    assert by_id[2][1] == 1 and by_id[3][1] == 1
    assert by_id[2][2] + by_id[3][2] == 1  # one keeps the empty chunk


def test_pair_intersections_match_bruteforce(spark):
    """The r13 doc-list kernel (per-shingle sorted doc lists, narrow
    pair expansion, zero joins) must equal a brute-force python
    reference — jaccard AND both containment directions, capped and
    uncapped — on a corpus with shared shingles across many docs,
    asymmetric containment (short doc quoted in a long one), and a
    viral shingle."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),          # near-dup of 0
        (2, "alpha beta gamma"),                            # contained in 0/1
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "quick brown fox jumps over a lazy dog today"),
        (5, "spam spam spam spam spam spam spam"),          # viral shingle
        (6, "spam spam spam unrelated words entirely here"),
        (7, "totally different content with zero overlap"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")

    def shingle_set(text, k=3):
        toks = [t for t in text.lower().strip().split() if t]
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    for cap in (None, 3):
        sets = {i: shingle_set(t) for i, t in rows}
        if cap is not None:
            df_count = {}
            for s in sets.values():
                for g in s:
                    df_count[g] = df_count.get(g, 0) + 1
            sets = {
                i: {g for g in s if df_count[g] <= cap}
                for i, s in sets.items()
            }
        want_j, want_c = {}, {}
        ids = sorted(sets)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                inter = len(sets[a] & sets[b])
                if not inter:
                    continue
                jac = inter / len(sets[a] | sets[b])
                if jac >= 0.2:
                    want_j[(a, b)] = round(jac, 9)
                ca, cb = inter / len(sets[a]), inter / len(sets[b])
                if ca >= 0.5 or cb >= 0.5:
                    want_c[(a, b)] = (round(ca, 9), round(cb, 9))
        got_j = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in D.jaccard_pairs(
                corpus, "doc_id", "text", threshold=0.2, max_shingle_df=cap
            ).collect()
        }
        got_c = {
            (r["id_a"], r["id_b"]): (
                round(r["containment_a_in_b"], 9),
                round(r["containment_b_in_a"], 9),
            )
            for r in D.containment_pairs(
                corpus, "doc_id", "text", threshold=0.5, max_shingle_df=cap
            ).collect()
        }
        assert got_j == want_j, f"jaccard mismatch (cap={cap})"
        assert got_c == want_c, f"containment mismatch (cap={cap})"


def test_verify_sets_path_matches_docs_path(spark):
    """r17: exact_jaccard_verify_sets over a precomputed shingle-set
    frame must equal the original docs-path verify (which shingles
    candidate docs per run) — the equivalence the persisted ssets/
    layout leans on."""
    from pyspark.sql import functions as F

    from replicadb_spark.session import tables

    d = tables(spark, "/root/testdata/sf0.001", ("documents",))[
        "documents"
    ].select(F.col("doc_id").alias("id"), "text")
    cands = D.minhash_band_buckets(
        d.withColumnRenamed("id", "doc_id").withColumnRenamed("text", "text"),
        "doc_id", "text", k=3, num_hashes=128, bands=64,
    )
    cands = (
        cands.alias("l")
        .join(cands.alias("r"), on=["band", "bucket"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    via_docs = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.exact_jaccard_verify(
            d, cands, k=3, threshold=0.5
        ).collect()
    }
    ssets = D.shingle_sets(d, "id", "text", k=3)
    via_sets = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.exact_jaccard_verify_sets(
            ssets, cands, threshold=0.5
        ).collect()
    }
    assert via_docs and via_sets == via_docs
