"""Schema evolution on the snapshot table.

Delta/Iceberg's add-column shape: the commit record pins the table
schema, evolution is O(1) metadata — no data file is ever rewritten —
and reads request the pinned schema so the parquet reader null-fills
added columns and up-casts same-family widened numerics. Time travel
keeps each snapshot's own pinned schema; drift without ``evolve=True``
is refused (the reference refuses sink-column drift the same way —
SqlManager's column-list contract).
"""

import pytest
from pyspark.sql import functions as F

from replicadb_spark.fs import TableFS, join
from replicadb_spark.operators.snapshot_table import (
    snapshot_changes,
    snapshot_commit,
    snapshot_compact,
    snapshot_delete,
    snapshot_expire,
    snapshot_read,
    snapshot_schema,
    snapshot_upsert,
)


def _t(tmp_path, name="t"):
    return "file://" + str(tmp_path / name)


def test_drift_without_evolve_is_refused(spark, tmp_path):
    path = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame([(1, 10)], "id long, v long"), path
    )
    with pytest.raises(ValueError, match="evolve=True"):
        snapshot_commit(
            spark.createDataFrame([(2, 20, "x")], "id long, v long, tag string"),
            path,
        )
    # identical schema still appends freely
    snapshot_commit(spark.createDataFrame([(2, 20)], "id long, v long"), path)
    assert snapshot_read(spark, path).count() == 2


def test_add_column_null_fills_old_files(spark, tmp_path):
    path = _t(tmp_path)
    s1 = snapshot_commit(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"), path,
        stat_columns=["id"],
    )
    s2 = snapshot_commit(
        spark.createDataFrame([(3, 30, "en")], "id long, v long, lang string"),
        path, stat_columns=["id"], evolve=True,
    )
    cur = snapshot_read(spark, path)
    assert cur.columns == ["id", "v", "lang"]
    got = {r["id"]: r["lang"] for r in cur.collect()}
    assert got == {1: None, 2: None, 3: "en"}
    # time travel: the old snapshot keeps its own pinned schema
    old = snapshot_read(spark, path, snapshot_id=s1)
    assert old.columns == ["id", "v"]
    assert snapshot_schema(path, s1).fieldNames() == ["id", "v"]
    assert snapshot_schema(path, s2).fieldNames() == ["id", "v", "lang"]
    # evolution rewrote zero data files: snap-1's dir still holds only
    # its original files and the manifest union grew by snap-2's
    fs = TableFS(spark, path)
    assert fs.glob(join(path, "data", "snap-000001*", "*.parquet"))


def test_numeric_widening_upcasts_old_files(spark, tmp_path):
    path = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame([(1, 1.5)], "id int, v float"), path
    )
    snapshot_commit(
        spark.createDataFrame([(2, 2.5)], "id long, v double"), path,
        evolve=True,
    )
    cur = snapshot_read(spark, path)
    assert [f.dataType.simpleString() for f in cur.schema.fields] == [
        "bigint", "double",
    ]
    assert {r["id"]: r["v"] for r in cur.collect()} == {1: 1.5, 2: 2.5}


def test_narrower_batch_needs_no_flag(spark, tmp_path):
    """A batch missing table columns (or carrying narrower same-family
    types) is not drift: the merge is a no-op and its rows read back
    null / up-cast."""
    path = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame([(1, 10, "a")], "id long, v long, tag string"),
        path,
    )
    snapshot_commit(spark.createDataFrame([(2,)], "id int"), path)
    got = {r["id"]: (r["v"], r["tag"]) for r in snapshot_read(spark, path).collect()}
    assert got == {1: (10, "a"), 2: (None, None)}


def test_incompatible_types_refused_even_with_evolve(spark, tmp_path):
    path = _t(tmp_path)
    snapshot_commit(spark.createDataFrame([(1, 10)], "id long, v long"), path)
    with pytest.raises(ValueError, match="cannot reconcile"):
        snapshot_commit(
            spark.createDataFrame([(2, "oops")], "id long, v string"),
            path, evolve=True,
        )
    with pytest.raises(ValueError, match="cannot reconcile"):
        # cross-family int→double is not a parquet-reader promotion
        snapshot_commit(
            spark.createDataFrame([(2, 2.5)], "id long, v double"),
            path, evolve=True,
        )


def test_overwrite_replaces_schema(spark, tmp_path):
    path = _t(tmp_path)
    snapshot_commit(spark.createDataFrame([(1, 10)], "id long, v long"), path)
    snapshot_commit(
        spark.createDataFrame([("a",)], "name string"), path, mode="overwrite"
    )
    assert snapshot_read(spark, path).columns == ["name"]


def test_cow_ops_work_across_evolution_boundary(spark, tmp_path):
    """delete/upsert/compact/changes on a table whose older files
    predate an added column: every rewrite reads through the pinned
    schema, never a stale file footer."""
    path = _t(tmp_path)
    snapshot_commit(
        spark.createDataFrame([(i, i * 10) for i in range(4)], "id long, v long"),
        path, stat_columns=["id"],
    )
    s2 = snapshot_commit(
        spark.createDataFrame([(4, 40, "x")], "id long, v long, tag string"),
        path, stat_columns=["id"], evolve=True,
    )
    s3 = snapshot_delete(spark, path, F.col("id") == 0)
    got = snapshot_read(spark, path)
    assert got.columns == ["id", "v", "tag"] and got.count() == 4

    s4 = snapshot_upsert(
        spark,
        path,
        spark.createDataFrame([(1, 111, "y"), (9, 90, None)],
                              "id long, v long, tag string"),
        pk_columns=["id"],
    )
    cur = {r["id"]: (r["v"], r["tag"]) for r in snapshot_read(spark, path).collect()}
    assert cur == {1: (111, "y"), 2: (20, None), 3: (30, None),
                   4: (40, "x"), 9: (90, None)}

    # changelog across the evolution boundary: null-safe on the added col
    log = {
        (r["id"], r["_change_type"], r["tag"])
        for r in snapshot_changes(
            spark, path, pk_columns=["id"], from_snapshot=s3, to_snapshot=s4
        ).collect()
    }
    assert log == {(1, "update", "y"), (9, "insert", None)}

    s5 = snapshot_compact(spark, path, small_mb=64, target_files=1)
    assert s5 == s4 + 1
    assert {r["id"] for r in snapshot_read(spark, path).collect()} == {1, 2, 3, 4, 9}
    # compaction is content-identical → empty changelog, evolution or not
    assert snapshot_changes(
        spark, path, pk_columns=["id"], from_snapshot=s4, to_snapshot=s5
    ).count() == 0

    res = snapshot_expire(spark, path, keep_last=2)
    assert res["expired"] == [1, 2, 3]
    assert snapshot_read(spark, path).count() == 5
    # an upsert staging batch now MUST carry the evolved column
    with pytest.raises(ValueError, match="lacks table columns"):
        snapshot_upsert(
            spark, path,
            spark.createDataFrame([(1, 5)], "id long, v long"),
            pk_columns=["id"],
        )
    assert s2 == 2  # ids stayed dense through the whole chain


def test_upsert_with_schema_evolution(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION: staging columns beyond the table's
    are added to the pinned schema (widening included); the order
    column stays staging-side; untouched rows read the new column as
    null; without the flag the extra column is dropped as before."""
    path = _t(tmp_path, "ue")
    snapshot_commit(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v int"), path,
        stat_columns=["id"],
    )
    staging = spark.createDataFrame(
        [(2, 21, 9, "x"), (2, 22, 10, "y"), (3, 30, 1, "z")],
        "id long, v long, seq long, tag string",
    )
    # strict mode: extra columns dropped, no evolution
    snapshot_upsert(
        spark, path, staging, pk_columns=["id"], order_column="seq"
    )
    assert snapshot_read(spark, path).columns == ["id", "v"]

    sid = snapshot_upsert(
        spark, path, staging, pk_columns=["id"], order_column="seq",
        evolve=True,
    )
    cur = snapshot_read(spark, path)
    # tag added, v widened int->long, seq (the order column) NOT evolved in
    assert cur.columns == ["id", "v", "tag"]
    assert dict(cur.dtypes)["v"] == "bigint"
    got = {r["id"]: (r["v"], r["tag"]) for r in cur.collect()}
    assert got == {1: (10, None), 2: (22, "y"), 3: (30, "z")}
    assert snapshot_schema(path, sid).fieldNames() == ["id", "v", "tag"]
    # prior snapshots keep their own schema
    assert snapshot_read(spark, path, snapshot_id=1).columns == ["id", "v"]
