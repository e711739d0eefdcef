"""Equality deletes (Iceberg-v2 equality-delete files): O(1)-write key
deletion applied lazily at read — the erasure-feed shape.

Contract (lake/table.py::delete_keys): no table scan, no rewrite at
write time; any row version with a matching key and LSN at or below the
delete's LSN is dead; later upserts recreate the key; compact()
materializes and retires entries; every read surface (plain, time
travel, MOR fold, partial-image fold, point lookup, table_changes,
dv merges' position scan) respects the kills.
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

ROWS = [
    (1, "upsert", "r1", "a.py", "c1", "v1"),
    (2, "upsert", "r1", "b.py", "c2", "v1"),
    (3, "upsert", "r2", "a.py", "c3", "v1"),
    (4, "upsert", "r2", "b.py", "c4", "v1"),
]


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "lsn long, op string, repo string, path string, commit string, content string",
    )


def _keys(spark, pairs):
    return spark.createDataFrame(pairs, "repo string, path string")


def _state(table):
    return sorted(
        tuple(r)
        for r in table.read().select("repo", "path", "commit", "content").collect()
    )


def _mk(spark, tmp_path, name, mode="cow", **props):
    t = LakeTable.create(
        spark,
        os.path.join(str(tmp_path), name),
        SCHEMA,
        key_cols=["repo", "path"],
        n_buckets=4,
        properties={"merge_mode": mode, **props},
    )
    t.merge(_events(spark, ROWS))
    return t


def test_basic_delete_and_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path, "basic")
    files_before = {
        f["path"] for fs in t.snapshot["buckets"].values() for f in fs
    }
    lsn = t.delete_keys(_keys(spark, [("r1", "a.py"), ("r2", "b.py"), ("zz", "no.py")]))
    assert lsn > 4
    # O(1) write: no data file touched, only the eqdel entry landed
    files_after = {
        f["path"] for fs in t.snapshot["buckets"].values() for f in fs
    }
    assert files_after == files_before
    assert t.snapshot.get("eqdel")
    got = {(r[0], r[1]) for r in _state(t)}
    assert got == {("r1", "b.py"), ("r2", "a.py")}
    # resurrect: a later upsert (higher LSN) recreates the key
    t.merge(_events(spark, [(lsn + 1, "upsert", "r1", "a.py", "c9", "v9")]))
    got = {(r[0], r[1], r[2]) for r in _state(t)}
    assert ("r1", "a.py", "c9") in got and len(got) == 3


@pytest.mark.parametrize("mode", ["cow", "mor", "dv"])
def test_matches_delete_where(spark, tmp_path, mode):
    a = _mk(spark, tmp_path, f"eq-{mode}", mode)
    b = _mk(spark, tmp_path, f"dw-{mode}", mode)
    a.delete_keys(_keys(spark, [("r1", "a.py"), ("r2", "a.py")]))
    b.delete_where("repo = 'r1' AND path = 'a.py' OR repo = 'r2' AND path = 'a.py'")
    assert _state(a) == _state(b)


def test_time_travel_and_table_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, "tt")
    v_before = t.snapshot["version"]
    t.delete_keys(_keys(spark, [("r1", "a.py")]))
    pre = {(r[0], r[1]) for r in t.read(version=v_before).select("repo", "path").collect()}
    assert ("r1", "a.py") in pre and len(pre) == 4
    ch = {
        (r["repo"], r["path"]): r["_change_type"]
        for r in t.table_changes(v_before).collect()
    }
    assert ch == {("r1", "a.py"): "delete"}


def test_mor_versions_and_newer_delta_survive(spark, tmp_path):
    t = _mk(spark, tmp_path, "mor", "mor")
    t.merge(_events(spark, [(5, "upsert", "r1", "a.py", "c5", "v5")]), mode="mor")
    lsn = t.delete_keys(_keys(spark, [("r1", "a.py")]))
    assert ("r1", "a.py") not in {(r[0], r[1]) for r in _state(t)}
    t.merge(_events(spark, [(lsn + 1, "upsert", "r1", "a.py", "c7", "v7")]), mode="mor")
    got = {(r[0], r[1], r[2]) for r in _state(t)}
    assert ("r1", "a.py", "c7") in got


def test_partial_image_barrier(spark, tmp_path):
    """On a partial_updates table the eq delete is an inheritance
    barrier: a later partial image must NOT inherit pre-delete values."""
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "part"), SCHEMA,
        key_cols=["repo", "path"], n_buckets=4,
        properties={"partial_updates": "true"},
    )
    t.merge(_events(spark, ROWS), partial_update=True)
    lsn = t.delete_keys(_keys(spark, [("r1", "a.py")]))
    # partial re-insert: commit set, content null (would inherit "v1"
    # if the barrier leaked)
    t.merge(
        _events(spark, [(lsn + 1, "upsert", "r1", "a.py", "cN", None)]),
        partial_update=True,
    )
    row = [r for r in _state(t) if (r[0], r[1]) == ("r1", "a.py")][0]
    assert row[2] == "cN" and row[3] is None


def test_compact_materializes_and_vacuum_reclaims(spark, tmp_path):
    t = _mk(spark, tmp_path, "comp")
    t.delete_keys(_keys(spark, [("r1", "a.py"), ("r2", "b.py")]))
    before = _state(t)
    assert t.compact(max_files_per_bucket=0) > 0
    assert not t.snapshot.get("eqdel")
    assert _state(t) == before
    t.expire_snapshots(keep_last=1)
    t.vacuum()
    eq_dir = os.path.join(t.root, "eqdel")
    leftover = [
        fn for _, _, fns in os.walk(eq_dir) for fn in fns if fn.endswith(".parquet")
    ] if os.path.isdir(eq_dir) else []
    assert leftover == []
    assert _state(t) == before


def test_dv_merge_after_eq_delete_cdf_insert(spark, tmp_path):
    """A dv merge re-inserting an eq-deleted key must classify as insert
    (the eq-dead row must not surface as a pre-image) and must not kill
    the fresh row."""
    t = _mk(spark, tmp_path, "dvcdf", "dv", write_changes="true")
    lsn = t.delete_keys(_keys(spark, [("r1", "a.py")]))
    v = t.snapshot["version"]
    t.merge(
        _events(spark, [(lsn + 1, "upsert", "r1", "a.py", "cZ", "vZ")]),
        mode="dv",
    )
    ch = {
        (r["repo"], r["path"]): r["_change_type"]
        for r in t.table_changes(v).collect()
    }
    assert ch == {("r1", "a.py"): "insert"}
    got = {(r[0], r[1], r[2]) for r in _state(t)}
    assert ("r1", "a.py", "cZ") in got and len(got) == 4


def test_column_pruned_read_applies_kills(spark, tmp_path):
    """read(columns=[...]) must still apply equality kills even when the
    projection excludes the key columns the anti-join matches on."""
    t = _mk(spark, tmp_path, "proj")
    t.delete_keys(_keys(spark, [("r1", "a.py")]))
    got = sorted(r["commit"] for r in t.read(columns=["commit"]).collect())
    assert got == ["c2", "c3", "c4"]
    assert t.read(columns=["commit"]).columns == ["commit"]


def test_validation_and_noop(spark, tmp_path):
    t = _mk(spark, tmp_path, "val")
    v = t.snapshot["version"]
    assert t.delete_keys(_keys(spark, [])) == -1
    assert t.snapshot["version"] == v  # empty set: no commit
    with pytest.raises(ValueError, match="key column"):
        t.delete_keys(spark.createDataFrame([("r1",)], "repo string"))
    # duplicate tuples collapse: rows recorded == distinct keys
    t.delete_keys(_keys(spark, [("r1", "b.py"), ("r1", "b.py")]))
    assert t.snapshot["eqdel"][-1]["rows"] == 1
