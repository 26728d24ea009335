"""Cache hygiene (VERDICT r10 item 2): operators that persist an
intermediate feeding their RETURNED lazy frame must do so through
``replicadb_spark.cache.tracked_persist``, and a query-boundary
``release_caches`` must return executor storage to ZERO — the contract
that keeps a long-lived pipeline service (or the 100-query bench) from
accreting every dedup/similarity/stats index cache until session death.

Two layers:

- a dynamic harness test that runs a representative catalog slice —
  one query per formerly-leaking persist site — materializes each
  result, releases, and asserts the SQL CacheManager is empty; and
- a static pin that no production module reintroduces a bare
  ``.persist()``/``.cache()`` outside the three sanctioned patterns
  (tracked_persist, graph.py's collected-result finally-unpersist,
  and the paired persist/unpersist in streaming + snapshot commits).
"""

import pathlib
import re

import pytest

from replicadb_spark.cache import (
    persisted_df_count,
    release_caches,
    tracked_count,
    tracked_persist,
)

# one query per formerly-leaking persist() site (VERDICT r10 lists the
# modules): dedup shingle/LSH/ssets, setsim inverted index + tfidf w,
# stats obs + median base, text bigram toks/bc, quantiles cleaned,
# catalog q2 offer / tf frames / bm25 dl+tf / kfold per_user /
# semantic-dedup verdict+pairs
SLICE = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental_batch",
    "basket_jaccard_customers",
    "tfidf_cosine_neardup",
    "chi2_type_hour",
    "mad_outliers_by_type",
    "bigram_logprob_score",
    "quantile_sketch_gate",
    "q2_min_cost_supplier",
    "tfidf_top_terms",
    "unigram_prob_score",
    "bm25_keyword_search",
    "kfold_split_gate",
    "semantic_dedup_gate",
]


def test_tracked_persist_roundtrip(spark):
    # drain anything a previously-run test file's plan-building left in
    # the ledger so the exact counts below are order-independent
    release_caches(spark)
    df = tracked_persist(spark.range(100).selectExpr("id * 3 as x"))
    assert df.count() == 100
    assert tracked_count(spark) == 1
    assert persisted_df_count(spark) >= 1
    assert release_caches(spark) == 1
    assert tracked_count(spark) == 0
    assert persisted_df_count(spark) == 0


def test_release_is_idempotent_with_early_unpersist(spark):
    df = tracked_persist(spark.range(10))
    df.count()
    df.unpersist()  # caller freed it early — release must no-op safely
    release_caches(spark)
    assert persisted_df_count(spark) == 0


class _StubSession:
    pass


class _StubDF:
    """Minimal tracked_persist subject: the ledger mechanics are pure
    Python, so id-reuse semantics are testable without a real JVM."""

    def __init__(self, sess):
        self.sparkSession = sess
        self.released = False

    def persist(self, *a):
        return self

    def unpersist(self):
        self.released = True


def test_ledger_survives_session_id_reuse():
    """ADVICE r11: the ledger lives ON the session object, so a session
    dropped WITHOUT a final release takes its entries with it — a later
    session reusing the same CPython id() inherits nothing, and no
    global map pins the dead session or its frames."""
    import gc

    s1 = _StubSession()
    d1 = _StubDF(s1)
    tracked_persist(d1)
    assert tracked_count(s1) == 1
    old_id = id(s1)
    del s1, d1  # dropped without release_caches
    gc.collect()
    # churn allocations until one lands on the dead session's id — the
    # exact aliasing a global id()-keyed map would confuse. Not
    # guaranteed to hit, but the assertions must hold either way.
    reused = None
    for _ in range(10000):
        cand = _StubSession()
        if id(cand) == old_id:
            reused = cand
            break
    s2 = reused if reused is not None else _StubSession()
    assert tracked_count(s2) == 0  # no inherited entries
    assert release_caches(s2) == 0  # no cross-session bleed
    d2 = _StubDF(s2)
    tracked_persist(d2)
    assert tracked_count(s2) == 1
    assert release_caches(s2) == 1
    assert d2.released and tracked_count(s2) == 0


@pytest.mark.parametrize("name", SLICE)
def test_catalog_slice_leaves_storage_empty(spark, sf_dir, name):
    from replicadb_spark.plans.catalog import QUERIES

    spark.catalog.clearCache()
    release_caches(spark)
    n = QUERIES[name](spark, sf_dir).count()
    assert n >= 0
    release_caches(spark)
    left = persisted_df_count(spark)
    assert left == 0, (
        f"{name}: {left} cached frame(s) remain after release_caches — "
        "an untracked persist() leaked past the cache contract"
    )


def test_no_bare_persist_outside_sanctioned_patterns():
    """Static pin: production code persists only via tracked_persist or
    inside the modules whose persists are provably paired with
    unpersist (graph.py collects its result under finally-unpersist;
    streaming/pipeline.py and snapshot_table.py unpersist in the same
    scope — re-verified by the pairing count below)."""
    root = pathlib.Path(__file__).resolve().parents[1] / "replicadb_spark"
    # graph.py unpersists a cached-list in finally (N persists, one
    # loop); pipeline.py / snapshot_table.py pair each persist with an
    # unpersist in the same scope; cache.py IS the tracked implementation
    paired = {"graph.py", "pipeline.py", "snapshot_table.py"}
    for p in root.rglob("*.py"):
        if p.name == "cache.py":
            continue
        src = p.read_text()
        bare = len(re.findall(r"\.persist\(", src))
        if p.name in paired:
            # a module on the paired list must actually free its caches
            assert bare == 0 or ".unpersist(" in src, p
        else:
            assert bare == 0, f"{p}: bare .persist() — use tracked_persist"
        assert not re.search(r"\.cache\(\)", src), p


def test_snapshot_gates_never_collect_the_full_table():
    """VERDICT r12 item 4: the snapshot gates materialize their result
    executor-side (_gate_spool writes a spared parquet) — the former
    collect()+createDataFrame shape held the whole post-op table on the
    driver, which is driver-memory-bound at sf1+. Static pin: no gate
    function body between 'def snapshot_*_gate' / 'def *_gate' markers
    carries the materialize-on-driver pattern any more."""
    src = (
        pathlib.Path(__file__).resolve().parents[1]
        / "replicadb_spark" / "plans" / "catalog.py"
    ).read_text()
    assert "materialize before the temp layout drops" not in src
    # the full-table driver-collect shape: a collect() whose rows are
    # re-created via createDataFrame (bounded 1-row gate aggregates
    # keep their documented collects — those pass lists of Row/tuples
    # built from scalar scans, not full-table row lists). r14 widened
    # the pin to EVERY gate's full-table shape: snapshot reads, cursor
    # frames, AND saveAsTable-backed reads (spark.table) — the shape
    # bucketed_upsert_gate carried until VERDICT r13 item 2
    assert not re.search(
        r"rows = (cur|snapshot_read\(spark, path\)|spark\.table\()"
        r"[^\n]*\.collect\(\)",
        src,
    ), "a gate reintroduced the full-table driver collect"
    assert src.count("_gate_spool(") >= 9  # helper def + 8 gate sites
