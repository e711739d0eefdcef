"""SQL-style DML (delete_where / update_where) and CDF-driven row-level
replication (TableReplicator)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable, TableReplicator

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, tmp_path, name="t", **props):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=4,
        properties=props or None,
    )


def _seed(spark, t, n=20):
    t.merge(
        spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b", i * 10, i, "upsert") for i in range(n)],
            "k long, grp string, v long, lsn long, op string",
        )
    )
    return t


def _state(t):
    return {r["k"]: (r["grp"], r["v"]) for r in t.read().collect()}


# ------------------------------------------------------------------ #
# DML
# ------------------------------------------------------------------ #
def test_delete_where_removes_matching_rows(spark, tmp_path):
    t = _seed(spark, _mk(spark, tmp_path))
    before = t.applied_lsn()
    stats = t.delete_where(F.col("grp") == "b")
    assert stats.deletes == 10
    st = _state(t)
    assert len(st) == 10 and all(g == "a" for g, _ in st.values())
    # ledger advanced by exactly one DML lsn; visible in history
    assert t.applied_lsn() == before + 1
    assert t.history().collect()[-1]["operation"] == "delete_where"


def test_delete_where_sql_string_predicate(spark, tmp_path):
    t = _seed(spark, _mk(spark, tmp_path, "s"))
    t.delete_where("v >= 100")
    assert set(_state(t)) == set(range(10))


def test_update_where_expression_assignment(spark, tmp_path):
    t = _seed(spark, _mk(spark, tmp_path, "u"))
    t.update_where(F.col("grp") == "a", {"v": F.col("v") + 1, "grp": "A"})
    st = _state(t)
    for k, (g, v) in st.items():
        if k % 2 == 0:
            assert (g, v) == ("A", k * 10 + 1)
        else:
            assert (g, v) == ("b", k * 10)
    assert t.history().collect()[-1]["operation"] == "update_where"


def test_update_where_rejects_key_and_unknown_columns(spark, tmp_path):
    t = _seed(spark, _mk(spark, tmp_path, "r"))
    with pytest.raises(ValueError):
        t.update_where("v > 0", {"k": 99})
    with pytest.raises(ValueError):
        t.update_where("v > 0", {"nope": 1})


def test_dml_visible_in_cdf(spark, tmp_path):
    t = _seed(spark, _mk(spark, tmp_path, "cdf"))
    v0 = t.snapshot["version"]
    t.delete_where("k = 0")
    t.update_where("k = 1", {"v": 777})
    ch = {
        (r["k"], r["_change_type"])
        for r in t.table_changes(v0).select("k", "_change_type").collect()
    }
    assert (0, "delete") in ch and (1, "update") in ch
    assert len(ch) == 2


def test_dml_after_wal_replay_keeps_exactly_once(spark, tmp_path):
    """A DML statement between WAL batches must not block later WAL
    events (they carry higher LSNs) and redelivery still dedups."""
    t = _mk(spark, tmp_path, "wal")
    b1 = spark.createDataFrame(
        [(1, "a", 10, 100, "upsert"), (2, "b", 20, 101, "upsert")],
        "k long, grp string, v long, lsn long, op string",
    )
    t.merge(b1)
    t.update_where("k = 1", {"v": 11})  # lsn 102
    b2 = spark.createDataFrame(
        [(2, "b", 22, 200, "upsert")],
        "k long, grp string, v long, lsn long, op string",
    )
    t.merge(b2)
    t.merge(b2)  # redelivery no-op
    assert _state(t) == {1: ("a", 11), 2: ("b", 22)}


# ------------------------------------------------------------------ #
# TableReplicator
# ------------------------------------------------------------------ #
def test_replica_bootstrap_and_incremental_sync(spark, tmp_path):
    src = _seed(spark, _mk(spark, tmp_path, "src"))
    rep = TableReplicator.create(spark, str(tmp_path / "rep"), src)
    assert _state(rep.table) == _state(src)
    assert rep.synced_version() == src.snapshot["version"]

    # mutate the source: update, delete, insert — all via one merge
    src.merge(
        spark.createDataFrame(
            [
                (0, "z", 999, 1000, "upsert"),
                (1, None, None, 1001, "delete"),
                (100, "n", 1, 1002, "upsert"),
            ],
            "k long, grp string, v long, lsn long, op string",
        )
    )
    out = rep.sync(src)
    assert out["skipped"] is False and out["keys"] == 3
    assert _state(rep.table) == _state(src)


def test_replica_sync_idempotent_and_noop(spark, tmp_path):
    src = _seed(spark, _mk(spark, tmp_path, "src2"))
    rep = TableReplicator.create(spark, str(tmp_path / "rep2"), src)
    # no source change -> skipped
    assert rep.sync(src)["skipped"] is True
    src.delete_where("k < 5")
    rep.sync(src)
    state = _state(rep.table)
    # re-sync of the completed interval is a no-op (ledger dedup)
    rep.sync(src)
    assert _state(rep.table) == state == _state(src)
    assert rep.table.history().collect()[-1]["operation"] == "replica_sync"


def test_replica_reopen_resumes_watermark(spark, tmp_path):
    src = _seed(spark, _mk(spark, tmp_path, "src3"))
    TableReplicator.create(spark, str(tmp_path / "rep3"), src)
    src.update_where("k = 2", {"v": -1})
    fresh = TableReplicator(spark, str(tmp_path / "rep3"))
    assert fresh.sync(src)["skipped"] is False
    assert _state(fresh.table) == _state(src)
