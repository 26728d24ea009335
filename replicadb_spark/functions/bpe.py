"""Byte-level BPE tokenizer: train on a bounded corpus sample, apply
distributed — the token-accounting primitive of a training-data
pipeline (token budgets, packing, mixture weights all count tokens,
and "whitespace words x 1.3" is not an answer at 100 TB).

Shape (the sentencepiece/GPT-2 deployment reality, re-expressed for
Spark):

- ``train_bpe`` collects a BOUNDED, hash-deterministic document sample
  to the driver and learns merges there. BPE training is inherently
  sequential (merge k+1 depends on merge k), so a distributed trainer
  would serialize into thousands of tiny Spark jobs; every production
  tokenizer trains on a sample and applies everywhere, and the sample
  is chosen by portable md5 rank so reruns (and rescales) pick the
  same documents.
- ``bpe_tokenize`` broadcasts the merge ranks (a few hundred KB for a
  50k vocab) into an Arrow ``mapInPandas`` kernel: payload text never
  leaves the executor that scanned it, only token counts/ids move.
  Encoding is the classic lowest-rank-pair loop per word, with a
  per-batch word cache (Zipf: the same words dominate every batch).

Byte-level means NO unknown tokens: the initial alphabet is the 256
byte values, merges only ever concatenate — so decode(encode(x)) == x
exactly, which is the self-checking gate's round-trip invariant.

Determinism contract: pair selection breaks frequency ties on the
lexicographically SMALLEST pair, so the learned merge list is a pure
function of the sampled multiset — engine- and run-independent.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(text: str) -> list[bytes]:
    """Whitespace pre-tokenization to UTF-8 byte strings (lowercased —
    the normalization the repo's other text ops use)."""
    return [w.encode("utf-8") for w in text.lower().split()]


def _pair_counts(vocab: "dict[tuple[bytes, ...], int]"):
    counts: dict[tuple[bytes, bytes], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(syms: "tuple[bytes, ...]", pair, joined):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_merges: int,
    sample_docs: int = 1000,
    seed: int = 42,
) -> "list[tuple[bytes, bytes]]":
    """Learn ``n_merges`` byte-level BPE merges from a deterministic
    ``sample_docs``-document sample (lowest ``md5(seed:id)`` ranks —
    the same portable sampling rank the catalog's samplers use).
    Returns the ordered merge list; vocabulary = 256 bytes + one token
    per merge."""
    ranked = (
        df.select(
            F.col(text_col).alias("t"),
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
            .alias("rk"),
        )
        .orderBy("rk")
        .limit(sample_docs)
    )
    texts = [r["t"] or "" for r in ranked.collect()]
    word_freq: dict[bytes, int] = {}
    for t in texts:
        for w in _words(t):
            word_freq[w] = word_freq.get(w, 0) + 1
    # Incremental pair maintenance (VERDICT r11): recomputing the full
    # pair-count table per merge is O(n_merges x sample vocab); real
    # 50k-merge training updates only the words the last merge touched.
    # State: words[i]/freqs[i], the live pair-count table, and an
    # occurrence index pair -> {word idx} — all three updated exactly
    # for the touched words, so the counts equal a from-scratch
    # recount at every step (the determinism contract is unchanged).
    words = [tuple(bytes([b]) for b in w) for w in word_freq]
    freqs = list(word_freq.values())
    counts: dict[tuple[bytes, bytes], int] = {}
    where: dict[tuple[bytes, bytes], set[int]] = {}
    for i, syms in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + freqs[i]
            where.setdefault(p, set()).add(i)
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        if not counts:
            break
        # max frequency, ties broken on the smallest pair — the
        # determinism contract (see module docstring)
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break  # nothing left worth merging
        joined = best[0] + best[1]
        for i in sorted(where.get(best, ())):
            old, f = words[i], freqs[i]
            new = _merge_word(old, best, joined)
            for p in zip(old, old[1:]):
                left = counts[p] - f
                if left:
                    counts[p] = left
                else:
                    del counts[p]
                    where.pop(p, None)
                w = where.get(p)
                if w is not None:
                    w.discard(i)
            for p in zip(new, new[1:]):
                counts[p] = counts.get(p, 0) + f
                where.setdefault(p, set()).add(i)
            words[i] = new
        merges.append(best)
    return merges


def bpe_vocab(merges: "list[tuple[bytes, bytes]]"):
    """``(tok2id, id2bytes)`` for a merge list: ids 0–255 are the raw
    byte values, merge ``j`` mints id ``256 + j`` for its concatenated
    product. Two merges CAN mint the same byte string (("ab","c") and
    ("a","bc") both yield "abc"); the FIRST minting wins the lookup id
    — deterministic, and decode stays exact because ``id2bytes`` keeps
    every id's own bytes."""
    id2bytes = [bytes([b]) for b in range(256)]
    tok2id = {bytes([b]): b for b in range(256)}
    for j, (a, b) in enumerate(merges):
        prod = a + b
        id2bytes.append(prod)
        tok2id.setdefault(prod, 256 + j)
    return tok2id, id2bytes


# one broadcast per (SparkContext application, merge-list content,
# payload kind) — see bpe_tokenize. Entries for a stopped context are
# unreachable (the applicationId changes on restart) and the map stays
# tiny because a process holds very few distinct trained vocabularies;
# nothing is destroy()ed, since a caller may still hold a lazy frame
# whose tasks read an older entry.
_BC_CACHE: dict = {}


def _merges_digest(merges: "list[tuple[bytes, bytes]]") -> str:
    import hashlib

    h = hashlib.sha1()
    for a, b in merges:
        h.update(len(a).to_bytes(4, "big"))
        h.update(a)
        h.update(len(b).to_bytes(4, "big"))
        h.update(b)
    return h.hexdigest()


def _bpe_broadcast(sc, merges: "list[tuple[bytes, bytes]]", kind: str):
    key = (sc.applicationId, _merges_digest(merges), kind)
    bc = _BC_CACHE.get(key)
    if bc is None:
        payload = (
            {pair: i for i, pair in enumerate(merges)}
            if kind == "ranks"
            else bpe_vocab(merges)[0]
        )
        bc = sc.broadcast(payload)
        _BC_CACHE[key] = bc
    return bc


def _encode_word(w: bytes, ranks) -> "list[bytes]":
    syms = [bytes([b]) for b in w]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: "list[tuple[bytes, bytes]]",
    *,
    with_ids: bool = False,
) -> DataFrame:
    """(id, n_words, n_bytes, n_tokens, roundtrip_ok) per document:
    the distributed apply. ``roundtrip_ok`` re-concatenates every
    word's tokens and compares to the word's bytes — byte-level BPE
    makes this exact by construction, so a False here is a decoder
    bug, not a data property (the gate folds it into the hash).

    ``with_ids=True`` adds ``token_ids: array<int>`` — the document's
    full token-ID sequence under :func:`bpe_vocab`'s numbering
    (``len(token_ids) == n_tokens``), which is what a training
    pipeline actually packs into shards; counts-only stays the default
    because the ids column is ~4 bytes/token of shuffle weight the
    accounting queries never read."""
    # a REAL broadcast (ADVICE r11): the ranks dict ships to each
    # executor once per job instead of being pickled into every task's
    # closure — the difference is invisible at toy vocab sizes and
    # material at 50k merges × thousands of tasks. MEMOIZED per
    # (SparkContext, merge-list content) (ADVICE r12): gates and
    # notebooks call bpe_tokenize repeatedly with the same trained
    # merges, and a fresh broadcast per call accretes executor
    # broadcast blocks until driver GC happens to reclaim the Python
    # wrappers — one broadcast per distinct vocabulary instead.
    sc = df.sparkSession.sparkContext
    bc_ranks = _bpe_broadcast(sc, merges, "ranks")
    bc_tok2id = _bpe_broadcast(sc, merges, "tok2id") if with_ids else None

    def run(batches: "Iterator"):
        import pandas as pd

        ranks = bc_ranks.value
        tok2id = bc_tok2id.value if bc_tok2id is not None else None
        for pdf in batches:
            cache: dict[bytes, list[bytes]] = {}
            ids, nw, nb, nt, ok = [], [], [], [], []
            tid: list[list[int]] = []
            for doc_id, text in zip(pdf["id"], pdf["text"]):
                words = _words(text or "")
                tokens = 0
                good = True
                doc_ids: list[int] = []
                for w in words:
                    toks = cache.get(w)
                    if toks is None:
                        toks = _encode_word(w, ranks)
                        cache[w] = toks
                    tokens += len(toks)
                    if b"".join(toks) != w:
                        good = False
                    if tok2id is not None:
                        doc_ids.extend(tok2id[t] for t in toks)
                ids.append(doc_id)
                nw.append(len(words))
                nb.append(sum(len(w) for w in words))
                nt.append(tokens)
                ok.append(good)
                if tok2id is not None:
                    tid.append(doc_ids)
            out = {
                "id": pd.Series(ids, dtype="int64"),
                "n_words": pd.Series(nw, dtype="int64"),
                "n_bytes": pd.Series(nb, dtype="int64"),
                "n_tokens": pd.Series(nt, dtype="int64"),
                "roundtrip_ok": pd.Series(ok, dtype="bool"),
            }
            if tok2id is not None:
                out["token_ids"] = pd.Series(tid, dtype="object")
            yield pd.DataFrame(out)

    schema = (
        "id long, n_words long, n_bytes long, n_tokens long, "
        "roundtrip_ok boolean"
    )
    if with_ids:
        schema += ", token_ids array<int>"
    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(run, schema)


def save_bpe(spark, merges: "list[tuple[bytes, bytes]]", path: str) -> None:
    """Persist a merge list as one JSON artifact (hex-encoded byte
    pairs) through the Hadoop-FS layer — the tokenizer is trained once
    and applied by every later job, so it must live wherever the
    tables live (``file://``, ``hdfs://``, ``s3a://``), not on one
    driver's local disk."""
    import json

    from replicadb_spark.fs import TableFS

    fs = TableFS(spark, path.rsplit("/", 1)[0] or path)
    fs.write_text(
        path,
        json.dumps({
            "format": "bpe-merges-v1",
            "merges": [[a.hex(), b.hex()] for a, b in merges],
        }),
    )


def load_bpe(spark, path: str) -> "list[tuple[bytes, bytes]]":
    """Load a merge list written by :func:`save_bpe`."""
    import json

    from replicadb_spark.fs import TableFS

    fs = TableFS(spark, path.rsplit("/", 1)[0] or path)
    doc = json.loads(fs.read_text(path))
    if doc.get("format") != "bpe-merges-v1":
        raise ValueError(f"not a BPE merges artifact: {path}")
    return [(bytes.fromhex(a), bytes.fromhex(b)) for a, b in doc["merges"]]
