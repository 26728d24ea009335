"""Invariants of the driver-gate ordering in __spark_entry__.py.

The driver verifies only the first 50 queries() entries per round, so
the explicit ordering IS the correctness-coverage policy. These tests
make its structural invariants unbreakable: a future round that
registers a query without slotting it, duplicates a name, or lets the
first-50 window shrink fails here instead of silently shipping an
unchecked operator.
"""

import __spark_entry__ as E
from replicadb_spark.plans.catalog import ORACLES, QUERIES


def test_every_registered_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


def test_gate_tuples_are_disjoint_and_known():
    first, last = set(E._GATE_FIRST), set(E._GATE_LAST)
    assert not first & last
    assert first <= set(QUERIES), sorted(first - set(QUERIES))
    assert last <= set(QUERIES), sorted(last - set(QUERIES))
    assert len(E._GATE_FIRST) == len(first)  # no dups inside a tuple
    assert len(E._GATE_LAST) == len(last)


def test_first_window_is_exactly_the_cap():
    # the driver checks exactly 50; fewer wastes slots, more is a lie
    assert len(E._GATE_FIRST) == 50


def test_unslotted_queries_land_inside_the_cap_only_if_room():
    """A newly-registered query not yet added to either tuple lands in
    the middle (positions 51+, unchecked this round). With FIRST at
    exactly 50 there is no silent room — this test forces the author
    to slot it explicitly."""
    middle = [
        n for n in QUERIES if n not in E._GATE_FIRST and n not in E._GATE_LAST
    ]
    assert middle == [], (
        f"queries registered but not slotted in _GATE_FIRST/_GATE_LAST: "
        f"{middle} — slot them (and rotate something out) so driver "
        f"coverage stays explicit"
    )


def test_queries_and_oracles_share_the_gate_order():
    assert list(E.queries()) == list(E.oracle_sql())


def test_r18_window_is_the_r15_block():
    """The r18 rotation (ROUND17.md "Round-18 gate plan", executed
    verbatim): the driver window is exactly the 50 r15-gated queries,
    bounded by its prescribed endpoints."""
    assert E._GATE_FIRST[0] == "dedup_simhash"
    assert E._GATE_FIRST[-1] == "copurchase_degree_profile"
    assert "semantic_dedup_gate" in E._GATE_FIRST
    # the two blocks that rotated out sit in _GATE_LAST in r20/r19 order
    assert E._GATE_LAST[0] == "basket_jaccard_customers"  # r17-gated block
    assert E._GATE_LAST[50] == "dedup_containment"        # r16-gated block
    assert E._GATE_LAST[-32:] == (
        "rfm_approx_gate", "equidepth_split_gate", "streaming_asof_state",
        "streaming_dq_state", "gopher_quality_rules", "ann_index_gate",
        # r7 local-evidence additions
        "gopher_full_screen", "ann_pq_index_gate", "bucketed_upsert_gate",
        "minhash_index_gate", "source_temperature_mix", "snapshot_table_gate",
        "snapshot_delete_gate",
        # r9 local-evidence addition
        "snapshot_bucketed_join_gate",
        # r10 local-evidence additions
        "snapshot_evolution_gate", "snapshot_zorder_gate",
        # r11 local-evidence additions
        "snapshot_restore_gate", "bpe_tokenize_gate",
        # r12 local-evidence additions
        "bpe_pack_gate", "hybrid_rrf_search", "dsir_importance_weights",
        "fuzzy_name_match_d2", "dup_span_coverage", "snapshot_merge_gate",
        # r13 local-evidence additions
        "sample_weighted_reservoir", "snapshot_partial_update_gate",
        "ppr_copurchase", "phrase_detection",
        # r14 local-evidence addition
        "streaming_phrase_state",
        # r15 local-evidence addition
        "streaming_ngram_topk_state",
        # r16 local-evidence addition
        "contamination_drift_gate",
        # r17 local-evidence addition
        "dup_rate_drift_gate",
    )


def test_cas_exception_taxonomy():
    """ADVICE r15 item 4: a CAS refusal is contention, not I/O failure
    — callers catching IOError for transient filesystem problems must
    never swallow a refusal that needs a refold; retry exhaustion is a
    third, distinct signal."""
    from replicadb_spark.operators.snapshot_table import (
        CommitRetryExhausted,
        ConcurrentCommitError,
    )

    assert issubclass(ConcurrentCommitError, RuntimeError)
    assert not issubclass(ConcurrentCommitError, IOError)
    assert issubclass(CommitRetryExhausted, RuntimeError)
    assert not issubclass(CommitRetryExhausted, IOError)
    assert not issubclass(CommitRetryExhausted, ConcurrentCommitError)
