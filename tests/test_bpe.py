"""Byte-level BPE (functions/bpe.py): deterministic training on the
classic low/lower corpus, exact round-trip, compression monotonicity,
and the distributed apply path."""

import pytest

from replicadb_spark.functions.bpe import (
    _encode_word,
    _words,
    bpe_tokenize,
    train_bpe,
)


def _corpus_df(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest"),
        (4, "widest widest widest"),
        (5, "low lower lowest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_learns_frequent_pairs_deterministically(spark):
    df = _corpus_df(spark)
    m1 = train_bpe(df, "text", "doc_id", n_merges=10, sample_docs=100)
    m2 = train_bpe(df, "text", "doc_id", n_merges=10, sample_docs=100)
    assert m1 == m2  # pure function of the sampled multiset
    assert len(m1) == 10
    # the dominant pairs of this corpus must be learned early:
    # "es"+"t" chains and "lo"/"low" chains both appear
    joined = {a + b for a, b in m1}
    assert b"lo" in joined or b"ow" in joined
    assert b"es" in joined or b"st" in joined


def test_encode_word_merges_by_rank_and_roundtrips():
    merges = [(b"l", b"o"), (b"lo", b"w"), (b"e", b"s"), (b"es", b"t"),
              (b"n", b"e"), (b"w", b"est")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word(b"low", ranks) == [b"low"]
    assert _encode_word(b"lowest", ranks) == [b"low", b"est"]
    assert _encode_word(b"newest", ranks) == [b"ne", b"west"]
    for w in (b"low", b"lowest", b"newest", b"zzz", b"xyzzy"):
        assert b"".join(_encode_word(w, ranks)) == w  # byte-level: exact


def test_no_merges_tokenizes_to_bytes():
    assert _encode_word(b"abc", {}) == [b"a", b"b", b"c"]
    assert _words("  Hello   WORLD ") == [b"hello", b"world"]


def test_spark_apply_counts_and_compression(spark):
    df = _corpus_df(spark)
    merges = train_bpe(df, "text", "doc_id", n_merges=30, sample_docs=100)
    out = {r["id"]: r for r in bpe_tokenize(df, "doc_id", "text", merges).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for r in out.values():
        assert r["roundtrip_ok"]
        assert r["n_tokens"] <= r["n_bytes"]  # merging never inflates
        assert r["n_tokens"] >= r["n_words"]  # >= one token per word
    # doc 1 is five copies of a fully-merged word → exactly 5 tokens
    assert out[1]["n_tokens"] == 5
    # zero merges = byte tokenization: n_tokens == n_bytes
    raw = {r["id"]: r for r in bpe_tokenize(df, "doc_id", "text", []).collect()}
    for i, r in raw.items():
        assert r["n_tokens"] == r["n_bytes"], i


def test_unicode_safe_byte_level(spark):
    df = spark.createDataFrame(
        [(1, "héllo wörld héllo"), (2, "日本語 テスト 日本語")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, "text", "doc_id", n_merges=20, sample_docs=10)
    out = bpe_tokenize(df, "doc_id", "text", merges).collect()
    assert all(r["roundtrip_ok"] for r in out)
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["n_bytes"] == len("héllo".encode()) * 2 + len("wörld".encode())


def test_merge_floor_stops_on_singletons(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    # every word is one byte: no pair ever reaches frequency 2
    merges = train_bpe(df, "text", "doc_id", n_merges=50, sample_docs=10)
    assert merges == []


def test_save_load_roundtrip_on_file_uri(spark, tmp_path):
    from replicadb_spark.functions.bpe import load_bpe, save_bpe

    df = _corpus_df(spark)
    merges = train_bpe(df, "text", "doc_id", n_merges=12, sample_docs=100)
    path = "file://" + str(tmp_path / "tok" / "merges.json")
    save_bpe(spark, merges, path)
    assert load_bpe(spark, path) == merges
    # applying the loaded artifact matches applying the in-memory one
    a = bpe_tokenize(df, "doc_id", "text", merges).collect()
    b = bpe_tokenize(df, "doc_id", "text", load_bpe(spark, path)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError, match="not a BPE merges artifact"):
        bad = "file://" + str(tmp_path / "tok" / "bad.json")
        from replicadb_spark.fs import TableFS
        TableFS(spark, str(tmp_path)).write_text(bad, "{}")
        load_bpe(spark, bad)


def test_token_ids_decode_exactly(spark):
    """with_ids=True: decoding token_ids through bpe_vocab's id2bytes
    reproduces each document's word bytes exactly, and the ids column
    is length- and range-consistent with the counts."""
    from replicadb_spark.functions.bpe import bpe_vocab

    df = _corpus_df(spark)
    merges = train_bpe(df, "text", "doc_id", n_merges=30, sample_docs=100)
    _, id2bytes = bpe_vocab(merges)
    out = {
        r["id"]: r
        for r in bpe_tokenize(
            df, "doc_id", "text", merges, with_ids=True
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    for i, r in out.items():
        ids = r["token_ids"]
        assert len(ids) == r["n_tokens"]
        assert all(0 <= t < len(id2bytes) for t in ids)
        decoded = b"".join(id2bytes[t] for t in ids)
        assert decoded == b"".join(_words(texts[i]))
    # counts-only mode keeps the narrow schema
    narrow = bpe_tokenize(df, "doc_id", "text", merges)
    assert "token_ids" not in narrow.columns


def test_bpe_vocab_duplicate_products_first_minting_wins():
    """("ab","c") and ("a","bc") both mint "abc": lookup resolves to the
    FIRST id, decode keeps both ids' own bytes — encode/decode exact."""
    from replicadb_spark.functions.bpe import bpe_vocab

    merges = [
        (b"a", b"b"),   # 256: "ab"
        (b"b", b"c"),   # 257: "bc"
        (b"ab", b"c"),  # 258: "abc"
        (b"a", b"bc"),  # 259: "abc" (duplicate product)
    ]
    tok2id, id2bytes = bpe_vocab(merges)
    assert tok2id[b"abc"] == 258
    assert id2bytes[258] == b"abc" and id2bytes[259] == b"abc"
    assert tok2id[b"a"] == ord("a") and id2bytes[ord("a")] == b"a"


def test_incremental_pair_counts_match_naive_recount(spark):
    """train_bpe's incremental pair-count maintenance (VERDICT r11)
    must learn EXACTLY the merges of a from-scratch recount per step —
    proven against an inline naive reference on a corpus rich enough
    to exercise overlapping pairs, repeats, and ties."""
    from replicadb_spark.functions.bpe import _merge_word, _pair_counts

    rows = [
        (i, txt)
        for i, txt in enumerate(
            [
                "abab ababab abab banana bandana",
                "the theme there then anthem",
                "low lower lowest low low",
                "aaaa aaa aa a aaaaa",
                "mississippi missile mission misses",
                "日本語 テスト 日本語 abc abc",
            ]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def naive(df, n_merges):
        texts = [r["text"] for r in df.collect()]
        wf = {}
        for t in texts:
            for w in _words(t):
                wf[w] = wf.get(w, 0) + 1
        vocab = {tuple(bytes([b]) for b in w): f for w, f in wf.items()}
        out = []
        for _ in range(n_merges):
            counts = _pair_counts(vocab)
            if not counts:
                break
            best = min(counts, key=lambda p: (-counts[p], p))
            if counts[best] < 2:
                break
            joined = best[0] + best[1]
            vocab = {
                _merge_word(s, best, joined): f for s, f in vocab.items()
            }
            out.append(best)
        return out

    for n in (1, 5, 20, 100):
        assert train_bpe(
            df, "text", "doc_id", n_merges=n, sample_docs=100
        ) == naive(df, n), n


def test_bpe_tokenize_reuses_one_broadcast_per_vocab(spark):
    """ADVICE r12: repeated bpe_tokenize calls with the same trained
    merges must reuse ONE broadcast per payload kind instead of
    accreting broadcast blocks; a different vocabulary gets its own."""
    from replicadb_spark.functions import bpe as B

    df = spark.createDataFrame([(1, "aa bb aa")], "doc_id long, text string")
    m1 = [(b"a", b"a")]
    m2 = [(b"b", b"b")]
    B._BC_CACHE.clear()
    B.bpe_tokenize(df, "doc_id", "text", m1).collect()
    B.bpe_tokenize(df, "doc_id", "text", m1).collect()
    assert len(B._BC_CACHE) == 1  # one ranks broadcast, reused
    B.bpe_tokenize(df, "doc_id", "text", m1, with_ids=True).collect()
    assert len(B._BC_CACHE) == 2  # + the tok2id payload, same vocab
    first = dict(B._BC_CACHE)
    B.bpe_tokenize(df, "doc_id", "text", m1, with_ids=True).collect()
    assert B._BC_CACHE == first  # nothing new for a repeat
    B.bpe_tokenize(df, "doc_id", "text", m2).collect()
    assert len(B._BC_CACHE) == 3  # a distinct vocabulary broadcasts anew
