"""Text analysis for training-data pipelines: tokenization, language ID,
quality scoring, token counting, document fingerprinting.

Everything is built from JVM-side ``pyspark.sql.functions`` (no Python
UDFs in the hot path) and uses only portable integer/double arithmetic so
the DuckDB oracle can reproduce results bit-for-bit.

Scale notes: each function is a narrow per-row projection — no shuffle,
fully pipelined inside WholeStageCodegen, trivially parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007  # fits in int64 under (acc*31 + c) without overflow

# Tiny per-language stopword lexicons for the n-gram/stopword heuristic
# language scorer. Real pipelines plug fastText etc.; the heuristic is the
# deterministic, cluster-cheap baseline.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "is", "of", "to", "in", "that"),
    "es": ("el", "la", "los", "que", "y", "es", "un", "una"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

ENGLISH_STOPWORDS = STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"


def bpe_token_count(text: Column) -> Column:
    """Pre-tokenizer token count with a GPT-2-style split pattern
    (contraction suffixes, space-prefixed letter/digit/punct runs,
    whitespace runs) — the standard first stage of BPE tokenizers,
    restated lookahead-free so the same pattern runs on Java regex and
    RE2 (DuckDB oracle). Counts pre-tokens, not merges: a training-data
    pipeline uses this as the cheap corpus-size estimator."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0))


def word_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: count of maximal runs of letters or digits
    (``[a-z]+|[0-9]+`` on the lowercased text). Deterministic and portable
    (same RE2-safe pattern in DuckDB's regexp_extract_all)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit("[a-z]+|[0-9]+"), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords — a classic quality signal."""
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    stripped = F.regexp_replace(text, r"\s+", "")
    non_alnum = F.length(F.regexp_replace(stripped, r"[a-zA-Z0-9]", ""))
    return non_alnum.cast("double") / F.greatest(F.length(stripped), F.lit(1)).cast("double")


def mean_token_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score from length, stopword density,
    punctuation density, and mean token length — the standard cheap
    pre-filter in web-scale corpus cleaning (C4/Gopher-style rules).

    All terms are exact integer-ratio doubles, so the score is
    reproducible in any engine.
    """
    n_tok = token_count(text).cast("double")
    len_term = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * F.lit(4.0), F.lit(1.0))
    mtl = mean_token_length(text)
    mtl_term = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_term + stop_term + punct_term + mtl_term) / F.lit(4.0)


def language_scores(text: Column) -> list[tuple[str, Column]]:
    """Per-language stopword-hit counts on the lowercased token set."""
    toks = tokens(F.lower(text))

    def hits(sw: tuple[str, ...]):
        return lambda t: t.isin(*sw)

    return [
        (lang, F.size(F.filter(toks, hits(sw))))
        for lang, sw in sorted(STOPWORDS.items())
    ]


def language_id(text: Column) -> Column:
    """Argmax language by stopword hits; ties break to the alphabetically
    first language; zero hits → 'und' (undetermined), matching BCP-47.
    """
    scores = language_scores(text)
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # iterate reversed so earlier languages win ties via later .when override
    for lang, score in reversed(scores):
        result = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(result)
    return result


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash of the
    whitespace-normalized lowercased text, mod 1e9+7.

    h = fold(chars, acc -> (acc*31 + ascii(c)) % MOD). Used as the exact-
    dedup key: collision probability ~n²/2e9 — acceptable for blocking,
    with byte-equality confirmation downstream when it matters.
    """
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % MOD,
    )


def winnowing_fingerprints(df, id_col: str, text_col: str, *, k: int = 8, w: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS scheme): hash every char k-gram of the whitespace-normalized
    lowercase text, slide a w-hash window, keep each window's minimum —
    the selected set is a position-robust document sketch whose overlap
    estimates shared content.

    Returns (id, fp) — one row per distinct selected fingerprint hash.

    Plan notes:
    - the k-gram hash is the CLOSED-FORM sum Σ ascii(char_j)·31^(k-1-j)
      (k explicit codegen'd terms — no interpreted lambda fold, no
      modulus needed: 255·31^7·8 < 2^53);
    - the sliding min is a window frame (ROWS CURRENT..w-1 FOLLOWING)
      over one shuffle on the doc id — WindowExec keeps a w-deep sliding
      frame, never materializing pairs.
    """
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col).alias("id"), norm.alias("t"), F.length(norm).alias("n"))
    grams = base.where(F.col("n") >= k).select(
        "id", "t", F.explode(F.sequence(F.lit(1), F.col("n") - (k - 1))).alias("p")
    )
    # closed-form hash: ascii of each of the k chars at offset j
    h = None
    for j in range(k):
        # explicit long cast: ascii() is int32 and 31^7 ≈ 2.7e10 would
        # overflow int arithmetic under ANSI mode
        term = F.ascii(F.expr(f"substring(t, p + {j}, 1)")).cast("long") * F.lit(
            31 ** (k - 1 - j)
        ).cast("long")
        h = term if h is None else h + term
    hashed = grams.select("id", F.col("p"), h.alias("h"))
    win = Window.partitionBy("id").orderBy("p").rowsBetween(0, w - 1)
    n_grams = Window.partitionBy("id")
    sel = (
        hashed.withColumn("win_min", F.min("h").over(win))
        .withColumn("max_p", F.max("p").over(n_grams))
        .where(F.col("p") <= F.col("max_p") - (w - 1))  # full windows only
        .select("id", F.col("win_min").alias("fp"))
        .distinct()
    )
    return sel


# PII scrubbing patterns — shared with the DuckDB oracle, so they must
# behave identically under Java regex (Spark) and RE2 (DuckDB): plain
# character classes + counted quantifiers only, no lookaround (RE2 has
# none), no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONGNUM_RE = r"[0-9]{6,}"  # phone/account/ssn-length digit runs
PII_NUM_RE = r"[0-9]+"


def redact_pii(text: Column) -> dict[str, Column]:
    """Sequential PII scrub: emails → '<EMAIL>', ≥6-digit runs →
    '<NUM>', remaining digit runs → '#', with per-stage match counts
    (counted on the stage INPUT, so digits inside an email are never
    double-counted).

    Returns ``{"redacted", "n_email", "n_longnum", "n_num"}`` columns.

    Scale: three codegen regexp passes per row, no shuffle, no UDF —
    the cheap always-on scrub of an ingest pipeline (a learned NER
    scrubber would ride a Pandas UDF downstream of this)."""
    s0 = text
    n_email = F.regexp_count(s0, F.lit(PII_EMAIL_RE)).cast("long")
    s1 = F.regexp_replace(s0, PII_EMAIL_RE, "<EMAIL>")
    n_longnum = F.regexp_count(s1, F.lit(PII_LONGNUM_RE)).cast("long")
    s2 = F.regexp_replace(s1, PII_LONGNUM_RE, "<NUM>")
    n_num = F.regexp_count(s2, F.lit(PII_NUM_RE)).cast("long")
    s3 = F.regexp_replace(s2, PII_NUM_RE, "#")
    return {
        "redacted": s3,
        "n_email": n_email,
        "n_longnum": n_longnum,
        "n_num": n_num,
    }


def bigram_logprob(df, id_col: str, text_col: str):
    """Per-document mean bigram log-probability under the corpus's own
    add-one-smoothed bigram language model: (id, n_bigrams,
    avg_logprob). The classic LM-fluency filter — anomalously low
    scores flag gibberish/boilerplate; the unigram variant is
    unigram_prob_score in the catalog.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), avg of ln P over the
    doc's bigrams, rounded to 4 dp. The per-doc mean of ~10²
    double ln() terms is summation-order dependent at the ~1e-13
    level and the two engines sum in different orders, so the round
    must leave margin: at 4 dp a doc flakes only if its exact mean
    sits within ~1e-13 of a 5e-5 boundary (~1e-9 per doc) — the same
    calculus the catalog's other float scores use, with 100x more
    headroom than 6 dp.

    Plan: tokens via posexplode (codegen), bigrams via ONE lead()
    window on (doc, pos) — no positional self-join — then two
    map-side-partial count aggregates for the model, a broadcast |V|
    count, and a model join back keyed on the bigram. The token frame
    and the reduced bigram-count model persist once each (two
    consumers each); the corpus-sized bigram stream itself is never
    cached — recomputing the lead window from cached tokens is one
    narrow pass.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("pos", "term"),
    ).persist()
    w = Window.partitionBy("id").orderBy("pos")
    big = (
        toks.withColumn("w2", F.lead("term").over(w))
        .where(F.col("w2").isNotNull())
        .select("id", F.col("term").alias("w1"), "w2")
    )
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")).persist()
    uc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = toks.agg(F.countDistinct("term").alias("vocab"))
    return (
        # bc and uc scale with the corpus vocabulary — no forced
        # broadcast; AQE promotes them when they fit (the 1-row vocab
        # count always broadcasts)
        big.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vocab")))), 4
            ).alias("avg_logprob"),
        )
    )
