"""Full MERGE semantics on the snapshot table
(operators/snapshot_table.snapshot_merge): every clause combination
against a dict reference model, pruning, delete-only key batches,
by-source full-sync, OCC conflict behavior, and time travel."""

import pytest
from pyspark.sql import functions as F

from replicadb_spark.operators import snapshot_table as snap_mod
from replicadb_spark.operators.snapshot_table import (
    snapshot_commit,
    snapshot_history,
    snapshot_merge,
    snapshot_read,
    snapshot_record,
)


def _uri(tmp_path, name: str) -> str:
    return "file://" + str(tmp_path / name)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


TABLE = [(1, 10), (2, 20), (3, 30)]
STAGE = [(2, 22), (3, 33), (5, 55)]  # 2,3 matched; 5 staging-only


def _model(when_matched, when_not_matched, by_source):
    t, s = dict(TABLE), dict(STAGE)
    out = {}
    for k, v in t.items():
        if k in s:
            if when_matched == "update":
                out[k] = s[k]
            elif when_matched is None:
                out[k] = v
            # "delete": dropped
        elif by_source == "keep":
            out[k] = v
    if when_not_matched == "insert":
        for k, v in s.items():
            if k not in t:
                out[k] = v
    return out


@pytest.mark.parametrize("wm", [None, "update", "delete"])
@pytest.mark.parametrize("wnm", [None, "insert"])
@pytest.mark.parametrize("bs", ["keep", "delete"])
def test_every_clause_combination_matches_model(spark, tmp_path, wm, wnm, bs):
    if wm is None and wnm is None and bs == "keep":
        return  # the no-op combo, tested to raise below
    path = _uri(tmp_path, f"mg_{wm}_{wnm}_{bs}")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    sid = snapshot_merge(
        spark, path, _df(spark, STAGE), pk_columns=["id"],
        when_matched=wm, when_not_matched=wnm, not_matched_by_source=bs,
    )
    got = {r["id"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert got == _model(wm, wnm, bs), (wm, wnm, bs)
    # parent unchanged (time travel)
    assert {r["id"]: r["v"]
            for r in snapshot_read(spark, path, snapshot_id=1).collect()
            } == dict(TABLE)
    rec = snapshot_record(path, sid)
    if (wm, wnm, bs) == ("update", "insert", "keep"):
        assert rec["operation"] == "upsert"  # the delegated path
    else:
        assert rec["clauses"] == {
            "when_matched": wm, "when_not_matched": wnm,
            "not_matched_by_source": bs,
        }


def test_upsert_combination_delegates_and_matches(spark, tmp_path):
    path = _uri(tmp_path, "mg_upsert")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    snapshot_merge(spark, path, _df(spark, STAGE), pk_columns=["id"])
    got = {r["id"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert got == _model("update", "insert", "keep")
    hist = {r["snapshot_id"]: r["operation"]
            for r in snapshot_history(spark, path).collect()}
    assert hist == {1: "append", 2: "upsert"}  # the delegated path


def test_delete_matched_accepts_keys_only_staging(spark, tmp_path):
    """A delete-only merge never adds rows, so the staging batch may
    carry ONLY the pk columns — the changelog-of-deletes shape."""
    path = _uri(tmp_path, "mg_keys")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    keys = spark.createDataFrame([(2,), (9,)], "id long")  # 9 not in table
    snapshot_merge(
        spark, path, keys, pk_columns=["id"],
        when_matched="delete", when_not_matched=None,
    )
    got = {r["id"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert got == {1: 10, 3: 30}


def test_by_source_delete_is_full_sync(spark, tmp_path):
    """(update, insert, delete) replaces the table's key domain with
    the staging batch — the full-sync replication shape."""
    path = _uri(tmp_path, "mg_sync")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    snapshot_merge(
        spark, path, _df(spark, STAGE), pk_columns=["id"],
        not_matched_by_source="delete",
    )
    got = {r["id"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert got == dict(STAGE)


def test_merge_validation_errors(spark, tmp_path):
    path = _uri(tmp_path, "mg_val")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    with pytest.raises(ValueError, match="no-op"):
        snapshot_merge(spark, path, _df(spark, STAGE), pk_columns=["id"],
                       when_matched=None, when_not_matched=None)
    with pytest.raises(ValueError, match="every file"):
        snapshot_merge(spark, path, _df(spark, STAGE), pk_columns=["id"],
                       not_matched_by_source="delete", prune_column="id")
    with pytest.raises(ValueError, match="when_matched"):
        snapshot_merge(spark, path, _df(spark, STAGE), pk_columns=["id"],
                       when_matched="upsert")
    with pytest.raises(ValueError, match="lacks table columns"):
        snapshot_merge(
            spark, path, spark.createDataFrame([(2,)], "id long"),
            pk_columns=["id"], when_matched="update", when_not_matched=None,
        )


def test_merge_prunes_victims_by_key_stats(spark, tmp_path):
    """update-only merge with prune_column: only files whose id stats
    contain a staging key are rewritten; the others carry over."""
    from replicadb_spark.operators.snapshot_table import snapshot_manifest

    path = _uri(tmp_path, "mg_prune")
    snapshot_commit(
        _df(spark, [(i, i * 10) for i in range(1, 9)])
        .repartitionByRange(4, "id"),
        path, stat_columns=["id"],
    )
    m1 = {r["file"] for r in snapshot_manifest(spark, path)
          .select("file").distinct().collect()}
    sid = snapshot_merge(
        spark, path, _df(spark, [(2, 222), (99, 0)]), pk_columns=["id"],
        when_matched="update", when_not_matched=None, prune_column="id",
    )
    rec = snapshot_record(path, sid)
    assert 0 < rec["victim_files"] < len(m1)
    got = {r["id"]: r["v"] for r in snapshot_read(spark, path).collect()}
    want = {i: i * 10 for i in range(1, 9)}
    want[2] = 222  # 99 not matched → not inserted (insert clause off)
    assert got == want


def test_merge_occ_refuses_concurrent_same_key_append(
    spark, tmp_path, monkeypatch
):
    """The pk_guard applies to merges too: a concurrent append of a
    staging key between manifest derivation and publish refuses."""
    path = _uri(tmp_path, "mg_occ")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])

    real = snap_mod._try_publish
    state = {"raced": False}

    def racy(fs, p, rec):
        if not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(snap_mod, "_try_publish", real)
            snapshot_commit(_df(spark, [(5, 99)]), path, stat_columns=["id"])
            monkeypatch.setattr(snap_mod, "_try_publish", racy)
        return real(fs, p, rec)

    monkeypatch.setattr(snap_mod, "_try_publish", racy)
    with pytest.raises(IOError, match="sharing primary keys"):
        snapshot_merge(
            spark, path, _df(spark, STAGE), pk_columns=["id"],
            when_matched="update", when_not_matched="insert",
        )
    rows = snapshot_read(spark, path).collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3, 5]


def test_delete_when_applies_tombstones_in_one_commit(spark, tmp_path):
    """delete_when (WHEN MATCHED AND cond THEN DELETE): tombstone rows
    evict their keys, upsert rows land, staging-only tombstones are
    no-ops — all in ONE commit; the op column never reaches the table."""
    path = _uri(tmp_path, "mg_dw")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    chg = spark.createDataFrame(
        [(1, 0, "D"), (2, 22, "U"), (7, 70, "I"), (9, 0, "D")],
        "id long, v long, op string",
    )
    sid = snapshot_merge(
        spark, path, chg, pk_columns=["id"],
        delete_when=F.col("op") == "D",
    )
    cur = snapshot_read(spark, path)
    assert cur.columns == ["id", "v"]  # op never persisted
    got = {r["id"]: r["v"] for r in cur.collect()}
    assert got == {2: 22, 3: 30, 7: 70}  # 1 deleted, 9 no-op
    rec = snapshot_record(path, sid)
    assert rec["clauses"]["delete_when"] is True
    assert snapshot_read(spark, path, snapshot_id=1).count() == len(TABLE)


def test_delete_when_last_wins_with_order_column(spark, tmp_path):
    """A key whose NEWEST changelog row is a delete dies even if an
    older row in the same batch upserted it — and vice versa."""
    path = _uri(tmp_path, "mg_dw_ord")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    chg = spark.createDataFrame(
        [
            (1, 111, "U", 1), (1, 0, "D", 2),   # upsert then delete → gone
            (2, 0, "D", 1), (2, 222, "U", 2),   # delete then upsert → lives
        ],
        "id long, v long, op string, seq long",
    )
    snapshot_merge(
        spark, path, chg, pk_columns=["id"],
        delete_when=F.col("op") == "D", order_column="seq",
    )
    got = {r["id"]: r["v"] for r in snapshot_read(spark, path).collect()}
    assert got == {2: 222, 3: 30}


def test_delete_when_requires_update_clause(spark, tmp_path):
    path = _uri(tmp_path, "mg_dw_val")
    snapshot_commit(_df(spark, TABLE), path, stat_columns=["id"])
    with pytest.raises(ValueError, match="delete_when requires"):
        snapshot_merge(
            spark, path,
            spark.createDataFrame([(1, 1, "D")], "id long, v long, op string"),
            pk_columns=["id"], when_matched="delete",
            delete_when=F.col("op") == "D",
        )
