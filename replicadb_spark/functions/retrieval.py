"""Hybrid retrieval: lexical (Okapi BM25) + dense (embedding cosine)
rankings fused by Reciprocal Rank Fusion (RRF, Cormack et al. 2009) —
the standard two-tower retrieval shape a training-data pipeline runs
for related-document mining, hard-negative sourcing, and RAG corpus
audits. The reference engine has no retrieval surface at all
(SURVEY.md §2); this extends the repo's BM25 + kNN primitives with the
fusion step that makes them one ranker.

RRF's whole point is determinism-friendliness: the fused score
``Σ_r 1/(k + rank_r)`` consumes only INTEGER ranks, so two engines
that agree on each ranker's order agree on the fusion bit-for-bit —
no score-scale calibration between BM25 and cosine, which is why RRF
beats weighted-sum fusion operationally. Ranks are taken over scores
ROUNDED to 6 dp with a doc-id tiebreak (the repo's cross-engine
contract: float jitter below the rounding quantum cannot flip an
order the oracle sees).

100 TB shape: the lexical leg explodes the corpus token stream but
filters it against the (broadcast) query-term set BEFORE the tf
aggregate shuffles; the dense leg broadcasts the query vectors and
streams the corpus through one zip_with dot product (the
knn_bruteforce plan); both legs end in per-query top-k windows whose
shuffle carries ≤ candidates × queries skinny rows. The fusion is a
full-outer join of two ≤ k-row-per-query frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from replicadb_spark.cache import tracked_persist


def bm25_related_docs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_ids: "list[int]",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 50,
    term_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """Per query document: the ``top_k`` OTHER documents ranked by
    Okapi BM25 with the query doc's DISTINCT terms as the query.
    Returns (query_id, doc_id, lex_score, lex_rank); scores rounded to
    6 dp, ranks over (rounded score DESC, doc_id).

    Plan: ONE corpus tokenization feeds document lengths (zero-shuffle
    codegen size()) and the tf aggregate; the tf stream is semi-joined
    against the broadcast query-term set before it shuffles, so the
    shuffled volume is O(matching doc-term pairs of ≤ |queries| · |doc
    vocab| terms), never the corpus token stream."""
    toks_arr = F.regexp_extract_all(
        F.lower(text_col), F.lit(term_pattern), 0
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks_arr.alias("a"))
    dl = tracked_persist(
        base.select("doc_id", F.size("a").alias("dl")).where(F.col("dl") > 0)
    )
    stats = dl.agg(
        (F.sum("dl") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    # query term sets: distinct terms of each query doc (tiny — |q|·vocab)
    qterms = tracked_persist(
        base.where(F.col("doc_id").isin(*query_ids))
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct("a")).alias("term"),
        )
    )
    tf = tracked_persist(
        base.select("doc_id", F.explode("a").alias("term"))
        .join(
            F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("lex_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("lex_score").desc(), "doc_id"
    )
    return (
        scored.withColumn("lex_rank", F.row_number().over(w))
        .where(F.col("lex_rank") <= top_k)
    )


def cosine_related_docs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: "list[int]",
    *,
    top_k: int = 50,
) -> DataFrame:
    """Per query id: the ``top_k`` other vectors by cosine. Returns
    (query_id, doc_id, dense_score, dense_rank); scores rounded to
    6 dp, ranks over (rounded score DESC, doc_id). Queries broadcast;
    the corpus streams through one zip_with dot product — the
    knn_bruteforce plan with the rank taken on the rounded score."""
    e = emb.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    q = e.where(F.col("doc_id").isin(*query_ids)).select(
        F.col("doc_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a_, b_: a_ * b_),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(dot / (nrm(F.col("v")) * nrm(F.col("qv"))), 6).alias(
                "dense_score"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dense_score").desc(), "doc_id"
    )
    return (
        scored.withColumn("dense_rank", F.row_number().over(w))
        .where(F.col("dense_rank") <= top_k)
    )


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    *,
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion of the two ranked candidate frames:
    ``rrf = Σ_present 1/(k + rank)`` over the full outer join on
    (query_id, doc_id) — a doc missing from one list simply contributes
    nothing for it (the standard RRF treatment). The fused score is a
    sum of at most two exactly-representable reciprocals of integers,
    so engines agree bit-for-bit; the final cut ranks on (rrf DESC,
    doc_id). Returns (query_id, doc_id, rrf, rrf_rank, in_lex,
    in_dense)."""
    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("dense_rank")), F.lit(0.0))
        ).alias("rrf_raw"),
        F.col("lex_rank").isNotNull().alias("in_lex"),
        F.col("dense_rank").isNotNull().alias("in_dense"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_raw").desc(), "doc_id"
    )
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w))
        .where(F.col("rrf_rank") <= top_k)
        .select(
            "query_id",
            "doc_id",
            F.round("rrf_raw", 6).alias("rrf"),
            F.col("rrf_rank").cast("int").alias("rrf_rank"),
            "in_lex",
            "in_dense",
        )
    )
