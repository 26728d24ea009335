"""Similarity joins over non-text set/string data: Jaccard set-similarity
between (id, item) baskets, and edit-distance-1 string matching via
deletion-neighborhood signatures (FastSS).

The reference engine has no joins at all (SURVEY.md §2.7); these extend
the training-data surface (functions/dedup.py applies the same inverted-
index idea to text shingles) to relational entity data: "customers with
similar purchase baskets" powers recommendation/segment audits, and
edit-distance-1 blocking is the classic entity-resolution primitive for
typo-tolerant key matching.

100 TB shapes:

- ``set_jaccard_pairs``: inverted index on the item — pair generation is
  an equi-join on item, O(sum_item df_item²) not O(n²). A viral item
  (one item held by millions of ids) makes its bucket quadratic, so the
  ``max_item_df`` cap drops items above the document-frequency cap from
  the similarity universe BEFORE pairing — the same hot-shingle cap
  functions/dedup.py:jaccard_pairs applies, and like there the capped
  universe is the documented metric contract (basket sizes are computed
  on the capped universe too, so Jaccard stays a true Jaccard of the
  capped sets).
- ``edit1_pairs``: every string emits its ≤ len+1 deletion variants
  (delete one char, plus the identity); two strings within edit
  distance 1 (substitution, insertion, or deletion) necessarily share a
  variant (FastSS, Bocek et al. 2007), so candidates come from ONE
  equi-join on the variant hash and the exact ``F.levenshtein`` verify
  (JVM codegen) removes false positives. No O(n²) compare; hot variants
  are bounded by alphabet × string length, and a ``max_sig_df`` cap
  guards pathological corpora (e.g. millions of identical strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from replicadb_spark.cache import tracked_persist


def set_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    item_col: str,
    *,
    threshold: float,
    max_item_df: int | None = None,
) -> DataFrame:
    """Pairs of ids whose item sets have Jaccard >= threshold.

    Input may contain duplicate (id, item) rows; sets are DISTINCT
    items. Returns (id_a, id_b, inter, jaccard) with id_a < id_b,
    jaccard rounded to 6 decimals for stable cross-engine hashing.

    Plan: distinct → optional df-cap anti-join → inverted-index
    self-join on item → per-pair intersection count → join the two
    (capped) set sizes back. Three shuffles total (distinct, pair
    groupBy, size join), every one on bounded keys.

    Plan note (r13): the per-key member-list kernel that replaced the
    TEXT-shingle self-join (functions/dedup._pair_intersections) was
    A/B-measured here too and LOST (warm 3.06 s join vs 4.16 s lists
    at sf0.1): basket join keys are integers (cheap codegen hash
    exchanges, no string shuffle weight, no double-computed explode),
    while the list expansion's higher-order transform/flatten is
    interpreted — the kernel wins exactly where the old plan paid
    string keys + a recomputed tokenize, which baskets don't.
    """
    pairs_src = capped_set_pairs(
        df, id_col, item_col, max_item_df=max_item_df
    )
    pairs_src = tracked_persist(pairs_src)
    return jaccard_pairs_from_sets(pairs_src, threshold=threshold)


def capped_set_pairs(
    df: DataFrame,
    id_col: str,
    item_col: str,
    *,
    max_item_df: int | None = None,
) -> DataFrame:
    """The (id, item) set representation :func:`set_jaccard_pairs`
    compares: distinct membership pairs with items above the
    ``max_item_df`` document-frequency cap removed BEFORE pairing.
    Factored so a corpus matched repeatedly can materialize this frame
    once (the edge-layout precedent — plans/catalog._basket_layout)
    and hand every match run straight to
    :func:`jaccard_pairs_from_sets`."""
    pairs_src = df.select(
        F.col(id_col).alias("id"), F.col(item_col).alias("item")
    ).distinct()
    if max_item_df is not None:
        hot = (
            pairs_src.groupBy("item")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_item_df)
            .select("item")
        )
        pairs_src = pairs_src.join(hot, "item", "left_anti")
    return pairs_src


def jaccard_pairs_from_sets(
    pairs_src: DataFrame, *, threshold: float
) -> DataFrame:
    """Jaccard pair generation from an already-derived (id, item) set
    frame (:func:`capped_set_pairs`, persisted or layout-scanned): the
    inverted-index self-join on item, the per-pair intersection count,
    and the set sizes — the tail of :func:`set_jaccard_pairs`, shared
    so a layout-backed caller ranks IDENTICALLY.

    If the frame carries a precomputed per-id set size column ``n``
    (a layout can attach it once at build time — ``_basket_layout``
    does), the sizes RIDE the inverted-index join as grouping keys:
    the plan is one bucketed self-join + ONE pair aggregate, with the
    size groupBy and both post-aggregate size-join exchanges gone
    (r17 — measured 2.9 → 2.0 s warm at sf0.1 on the basket corpus).
    ``n`` must be the size of the id's CAPPED set, constant per id;
    grouping on it adds no groups."""
    # threshold on the RAW ratio (the rounded column is output-only) so
    # a value that rounds up across the threshold can't diverge from an
    # exact-arithmetic oracle
    raw = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    if "n" in pairs_src.columns:
        inter = (
            pairs_src.alias("a")
            .join(pairs_src.alias("b"), "item")
            .where(F.col("a.id") < F.col("b.id"))
            .groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.n").alias("na"),
                F.col("b.n").alias("nb"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return (
            inter.where(raw >= threshold)
            .select("id_a", "id_b", "inter", F.round(raw, 6).alias("jaccard"))
        )
    sizes = pairs_src.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        pairs_src.alias("a")
        .join(pairs_src.alias("b"), "item")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
        .where(raw >= threshold)
        .select("id_a", "id_b", "inter", F.round(raw, 6).alias("jaccard"))
    )
    return out


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_sig_df: int | None = None,
) -> DataFrame:
    """Pairs of rows whose strings are within Levenshtein distance 1
    (and not byte-identical). Returns (id_a, id_b, dist) with
    id_a < id_b, dist ∈ {0 is excluded, 1}; identical strings under
    distinct ids are reported with dist 0? No — strings equal ⇒
    dist 0 pairs are EXCLUDED (exact-dup detection is dedup_exact_key's
    job); this operator finds near-misses only.

    Signatures: for a string s, D(s) = {s} ∪ {s with char i removed}.
    ed(a,b) ≤ 1 ⟹ D(a) ∩ D(b) ≠ ∅ (substitution: drop the differing
    position from both; insertion/deletion: drop the extra char from
    the longer side and match the shorter's identity). The converse
    has false positives (two deletions landing on the same string), so
    every candidate is verified with the built-in ``levenshtein``.

    Position refinement (the FastSS paper's candidate filter, r12):
    deleting any position inside a run of equal characters yields the
    SAME variant, so each row emits one deletion variant per RUN,
    tagged with the run's position interval [lo, hi] (identity = 0).
    A substitution match needs a COMMON deletion position, and because
    the positions producing one variant are exactly one contiguous
    run, interval overlap ⟺ common position — so candidates whose
    intervals miss (two deletions at incompatible positions, ed ≥ 2)
    are killed by an integer compare BEFORE the levenshtein verify.
    Measured at sf0.1 this is exact: 262.5k of 977.5k raw join rows
    survive the interval filter and ALL pass the verify (which stays,
    as the xxhash collision guard). The per-run variant set is
    identical to the per-row-distinct variant set, so the ``df`` cap
    counts the same multiset the oracle's DISTINCT builds.

    One shuffle (the signature equi-join); signature strings are hashed
    to 64-bit with xxhash64 so shuffle rows stay narrow even for long
    inputs — hash collisions only ever ADD candidates, which the exact
    verify then rejects.

    The signature frame (explode + hash — the expensive scan) is
    persisted through the session cache ledger: it feeds the hot-df
    aggregate AND both sides of the self-join, so an unpersisted plan
    recomputes the explode per consumer. The hot-signature set is
    BROADCAST into the anti-join — it is at most a handful of viral
    signatures (usually empty), so shuffling the full signature frame
    to subtract it would be all cost, no benefit.

    Repeated matching over one corpus: build the signature frame once
    with :func:`edit1_signatures`, store it scan-ready (parquet), and
    run :func:`edit1_pairs_from` per query — the edge-layout precedent
    (operators/graph.write_edge_layout): derivation cost is paid once
    per corpus, not per match run.
    """
    sigs = tracked_persist(edit1_signatures(df, id_col, text_col))
    return edit1_pairs_from(sigs, max_sig_df=max_sig_df)


def edit1_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The FastSS edit-1 deletion-neighborhood signature frame:
    one (id, s, sig, lo, hi) row per RUN-deletion variant (identity
    tagged lo = hi = 0). ``sig`` is the xxhash64 of the variant so
    downstream shuffles stay narrow. See :func:`edit1_pairs` for the
    run-interval semantics; this is its signature stage factored out
    so a corpus matched repeatedly can persist the frame once."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("s"))
    n = F.length("s")
    # run starts: positions where the char differs from its predecessor
    starts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1)
        | (
            F.substring(F.col("s"), (i - 1).cast("int"), 1)
            != F.substring(F.col("s"), i.cast("int"), 1)
        ),
    )
    # one (variant, lo, hi) per run: delete at the run start; the run
    # ends one before the NEXT start (the last run ends at len)
    runs = F.zip_with(
        starts,
        F.concat(F.slice(starts, 2, F.size(starts)), F.array(n + 1)),
        lambda lo, nxt: F.struct(
            F.concat(
                F.substring(F.col("s"), F.lit(1), (lo - 1).cast("int")),
                F.col("s").substr((lo + 1).cast("int"), n),
            ).alias("variant"),
            lo.alias("lo"),
            (nxt - 1).alias("hi"),
        ),
    )
    ident = F.array(
        F.struct(
            F.col("s").alias("variant"),
            F.lit(0).alias("lo"),
            F.lit(0).alias("hi"),
        )
    )
    variants = F.when(n >= 1, F.concat(ident, runs)).otherwise(ident)
    return base.select("id", "s", F.explode(variants).alias("v")).select(
        "id",
        "s",
        F.xxhash64("v.variant").alias("sig"),
        F.col("v.lo").alias("lo"),
        F.col("v.hi").alias("hi"),
    )


def edit1_pairs_from(
    sigs: DataFrame, *, max_sig_df: int | None = None
) -> DataFrame:
    """The match stage of :func:`edit1_pairs`, over an already-built
    signature frame (from :func:`edit1_signatures` — typically a
    scan-ready parquet a caller materialized once per corpus). The
    verify is the BANDED ``levenshtein(a, b, 1)`` (threshold form,
    -1 above the bound): O(len) per candidate instead of the full
    O(len²) DP — exact for the ≤ 1 decision this operator needs."""
    if max_sig_df is not None:
        hot = (
            sigs.groupBy("sig")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_sig_df)
            .select("sig")
        )
        sigs = sigs.join(F.broadcast(hot), "sig", "left_anti")
    # interval-compatible candidates only (identity wildcards); verify
    # BEFORE deduplicating: after the interval filter the verify sees
    # true pairs + hash collisions only, and the distinct then moves
    # nothing but (id_a, id_b, dist) integer rows
    compat = (
        (F.col("a.lo") == 0)
        | (F.col("b.lo") == 0)
        | (
            (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi"))
        )
    )
    cand = (
        sigs.alias("a")
        .join(sigs.alias("b"), "sig")
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.s") != F.col("b.s"))
            & compat
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s", 1).alias("dist"),
        )
    )
    # banded verify returns -1 above the threshold; strings differ, so
    # survivors are exactly dist = 1
    return cand.where(F.col("dist") == 1).distinct()


def edit2_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_sig_df: int | None = None,
    unblocked_row_limit: "int | None" = 100_000,
) -> DataFrame:
    """Pairs of rows whose strings are within Levenshtein distance 2
    (excluding identical strings). Returns (id_a, id_b, dist) with
    id_a < id_b, dist ∈ {1, 2} — the depth-2 FastSS blocking that
    entity resolution reaches for when distance-1 recall is not enough
    (two typos, a transposition = delete+insert, …).

    Signatures: D₂(s) = {s} ∪ {one char deleted} ∪ {two chars
    deleted}. ed(a,b) ≤ 2 ⟹ D₂(a) ∩ D₂(b) ≠ ∅ (align the edit
    script; delete the ≤2 non-matching positions from each side). The
    converse over-generates — candidates are verified with the codegen
    ``levenshtein`` with an early-exit threshold. Distance-1's
    run-interval refinement does not carry to depth 2 (two deletions
    spread over two runs), so this operator keeps the plain
    signature join + verify; the signature set is per-row DISTINCT
    (byte-equal variants from repeated chars collapse), which is the
    same multiset the oracle's DISTINCT builds.

    Scale: ~len²/2 signatures per row — an order above edit1_pairs, so
    this is the operator you point at a BLOCKED subset (a candidate
    segment, one country, one zip prefix), not the raw 100 TB corpus;
    ``max_sig_df`` caps viral signatures exactly as in edit1_pairs
    (broadcast anti-join). One shuffle (the signature equi-join);
    signatures shuffle as xxhash64 values, never variant strings.

    The deployment shape is ENFORCED, not just documented (r13, the
    put_if_absent refuse-rather-than-degrade precedent): invoked
    without ``max_sig_df`` on a frame above ``unblocked_row_limit``
    rows (default 100k, checked with a bounded limit-probe — never a
    full count), the operator refuses loudly instead of silently
    launching a len²/2-signature join over an unblocked corpus. Pass
    ``max_sig_df`` (the capped shape), pre-block the frame, or set
    ``unblocked_row_limit=None``/higher to state the intent
    explicitly."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("s"))
    if max_sig_df is None and unblocked_row_limit is not None:
        probe = base.limit(unblocked_row_limit + 1).count()
        if probe > unblocked_row_limit:
            raise ValueError(
                f"edit2_pairs refused: input exceeds {unblocked_row_limit}"
                " rows with no max_sig_df — depth-2 FastSS emits ~len²/2"
                " signatures per row and is meant for a BLOCKED subset."
                " Block the frame first, pass max_sig_df to cap viral"
                " signatures, or raise/disable unblocked_row_limit to"
                " run unguarded deliberately"
            )
    n = F.length("s")
    del1 = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            F.substring(F.col("s"), F.lit(1), (i - 1).cast("int")),
            F.col("s").substr((i + 1).cast("int"), n),
        ),
    )
    # delete positions i < j: prefix[1..i-1] + s[i+1..j-1] + s[j+1..]
    del2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.concat(
                    F.substring(F.col("s"), F.lit(1), (i - 1).cast("int")),
                    F.col("s").substr(
                        (i + 1).cast("int"), (j - i - 1).cast("int")
                    ),
                    F.col("s").substr((j + 1).cast("int"), n),
                ),
            ),
        )
    )
    variants = F.array_distinct(
        F.concat(
            F.array(F.col("s")),
            F.when(n >= 1, del1).otherwise(F.array().cast("array<string>")),
            F.when(n >= 2, del2).otherwise(F.array().cast("array<string>")),
        )
    )
    sigs = tracked_persist(
        base.select("id", "s", F.explode(variants).alias("variant")).select(
            "id", "s", F.xxhash64("variant").alias("sig")
        )
    )
    if max_sig_df is not None:
        hot = (
            sigs.groupBy("sig")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_sig_df)
            .select("sig")
        )
        sigs = sigs.join(F.broadcast(hot), "sig", "left_anti")
    cand = (
        sigs.alias("a")
        .join(sigs.alias("b"), "sig")
        .where(
            (F.col("a.id") < F.col("b.id")) & (F.col("a.s") != F.col("b.s"))
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.s", "b.s", 2).alias("dist"),
        )
    )
    # levenshtein(threshold=2) returns -1 above the bound — the early
    # exit keeps the verify O(len·k) per candidate instead of O(len²)
    return cand.where(F.col("dist") >= 1).distinct()


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float,
    max_term_df: int | None = None,
    max_term_df_frac: float | None = None,
    term_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """All document pairs with TF-IDF cosine similarity ≥ ``threshold``
    — the WEIGHTED sibling of the shingle-Jaccard join: rare shared
    terms dominate the score instead of every shared term counting
    equally, which is the similarity a topical near-dup / related-doc
    search actually wants.

    Vector space (the metric contract): terms are lowercase
    ``term_pattern`` matches; weight = tf · ln(N/df); terms with
    df > ``max_term_df`` (absolute) or df > ``max_term_df_frac`` · N
    (corpus-relative — the form that keeps the contract meaningful
    across scale factors) are dropped from the space ENTIRELY
    (weights, norms, and dots all computed on the capped universe —
    the jaccard/containment capped-universe precedent). The cap is
    also the scale guard: idf already down-weights hot terms but still
    pairs every bucket member, and one stop-word-like term with
    df = 10⁶ makes its join bucket quadratic.

    Scale: ONE inverted-index equi-join on the term generates dot
    products (O(Σ_term df²) bounded by the cap, never O(n²)); norms are
    a per-doc aggregate joined back by id. N rides a broadcast 1-row
    aggregate so the plan stays fully lazy. Output pairs are filtered
    on the RAW ratio and rounded only for display (threshold decisions
    on rounded values are the classic cross-engine trap).
    """
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    toks = base.select(
        "id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(term_pattern), 0)
        ).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = base.agg(F.count(F.lit(1)).alias("n"))
    return tfidf_cosine_pairs_from_tf(
        tf, n, threshold=threshold,
        max_term_df=max_term_df, max_term_df_frac=max_term_df_frac,
    )


def tfidf_cosine_pairs_from_tf(
    tf: DataFrame,
    n: DataFrame,
    *,
    threshold: float,
    max_term_df: int | None = None,
    max_term_df_frac: float | None = None,
) -> DataFrame:
    """The TF-IDF cosine tail over an already-reduced (id, term, tf)
    frame plus a 1-row (n) document-count aggregate — factored so a
    persisted term-frequency layout (plans/catalog._tf_layout) ranks
    IDENTICALLY to the one-shot operator."""
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_term_df is not None:
        docfreq = docfreq.where(F.col("df") <= max_term_df)
    if max_term_df_frac is not None:
        docfreq = docfreq.crossJoin(F.broadcast(n)).where(
            F.col("df") <= max_term_df_frac * F.col("n")
        ).select("term", "df")
    w = tracked_persist(  # feeds the norm aggregate AND both join sides
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "id",
            "term",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("w"),
        )
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    dots = (
        w.alias("a")
        .join(w.alias("b"), "term")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    cos = (
        dots.join(norms.withColumnRenamed("id", "id_a"), "id_a")
        .join(
            norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nrm_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (F.col("dot") / (F.col("nrm") * F.col("nrm_b"))).alias("raw"),
        )
    )
    return cos.where(F.col("raw") >= threshold).select(
        "id_a", "id_b", F.round("raw", 4).alias("cosine")
    )
