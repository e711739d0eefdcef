"""Deletion-vector merge mode: positional deletes, fold-free reads.

Contract under test (lake/table.py::_apply_dv):
- replaying the same WAL through mode="dv" yields state identical to
  mode="cow" (inserts, updates, deletes, multi-batch, out-of-order)
- reads stay fold-free (no latest-per-key aggregate in the plan)
- time travel sees each version's own dv state
- table_changes classifies insert/update/delete across dv commits
- compact() folds dvs back into plain files; vacuum reclaims sidecars
- redelivery is a no-op (exactly-once holds in dv mode)
- partial-image batches are refused (positional kills cannot feed a
  per-column inheritance fold)
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


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, repo string, path string, commit string, content string"
    )


def _state(table):
    return sorted(
        tuple(r) for r in table.read().select("repo", "path", "commit", "content").collect()
    )


def _mk(spark, tmp_path, name, **create_kwargs):
    return LakeTable.create(
        spark,
        os.path.join(str(tmp_path), name),
        SCHEMA,
        key_cols=["repo", "path"],
        n_buckets=4,
        **create_kwargs,
    )


BATCH1 = [
    (1, "upsert", "r1", "a.py", "c1", "v1"),
    (2, "upsert", "r1", "b.py", "c2", "v1"),
    (3, "upsert", "r2", "a.py", "c3", "v1"),
]
BATCH2 = [
    (4, "upsert", "r1", "a.py", "c4", "v2"),  # update
    (5, "delete", "r1", "b.py", None, None),  # delete
    (6, "upsert", "r3", "x.py", "c6", "v1"),  # insert
]
BATCH3 = [
    (7, "upsert", "r1", "b.py", "c7", "v1"),  # re-insert after delete
    (8, "delete", "r2", "a.py", None, None),
    (9, "upsert", "r1", "a.py", "c9", "v3"),  # second update same key
]


def _replay(spark, tmp_path, name, mode, batches=(BATCH1, BATCH2, BATCH3)):
    t = _mk(spark, tmp_path, name)
    for i, b in enumerate(batches):
        t.merge(_events(spark, b), mode=mode, batch_id=f"b{i}")
    return t


def test_dv_matches_cow_state(spark, tmp_path):
    cow = _replay(spark, tmp_path, "cow", "cow")
    dv = _replay(spark, tmp_path, "dv", "dv")
    assert _state(dv) == _state(cow)
    # and the physical story is dv-shaped: appended files + kill lists,
    # no delta flags
    files = dv.files().collect()
    assert all(not r["is_delta"] for r in files)
    assert any(r["dv_rows"] > 0 for r in files)
    assert dv.snapshot.get("dv"), "dv entries must be recorded"


def test_dv_read_plan_is_fold_free(spark, tmp_path):
    dv = _replay(spark, tmp_path, "dvplan", "dv")
    plan = dv.read()._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan  # no per-key MOR resolution
    assert "HashAggregate" not in plan  # fold-free scan


def test_dv_time_travel(spark, tmp_path):
    dv = _replay(spark, tmp_path, "dvtt", "dv")
    v1 = dv.read(version=1).select("repo", "path", "commit").collect()
    got = sorted((r["repo"], r["path"], r["commit"]) for r in v1)
    assert got == [("r1", "a.py", "c1"), ("r1", "b.py", "c2"), ("r2", "a.py", "c3")]
    v2 = dv.read(version=2).select("repo", "path", "commit").collect()
    got2 = sorted((r["repo"], r["path"], r["commit"]) for r in v2)
    assert got2 == [("r1", "a.py", "c4"), ("r2", "a.py", "c3"), ("r3", "x.py", "c6")]


def test_dv_table_changes(spark, tmp_path):
    dv = _replay(spark, tmp_path, "dvcdf", "dv", batches=(BATCH1, BATCH2))
    ch = {
        (r["repo"], r["path"]): r["_change_type"]
        for r in dv.table_changes(1, 2).collect()
    }
    assert ch == {
        ("r1", "a.py"): "update",
        ("r1", "b.py"): "delete",
        ("r3", "x.py"): "insert",
    }


def test_dv_writetime_cdf(spark, tmp_path):
    t = _mk(spark, tmp_path, "dvwcdf", properties={"write_changes": "true"})
    t.merge(_events(spark, BATCH1), mode="dv", batch_id="b0")
    t.merge(_events(spark, BATCH2), mode="dv", batch_id="b1")
    # both commits carry stored change files -> the fast CDF path serves
    assert t.snapshot["changes"]["mode"] == "cdf"
    ch = {
        (r["repo"], r["path"], r["_change_type"])
        for r in t.table_changes(1, 2, include_preimages=True).collect()
    }
    assert ch == {
        ("r1", "a.py", "update_preimage"),
        ("r1", "a.py", "update_postimage"),
        ("r1", "b.py", "delete"),
        ("r3", "x.py", "insert"),
    }
    # pre-image carries the REPLACED values
    pre = (
        t.table_changes(1, 2, include_preimages=True)
        .filter((F.col("_change_type") == "update_preimage"))
        .collect()[0]
    )
    assert (pre["commit"], pre["content"]) == ("c1", "v1")


def test_dv_cdf_delete_then_reinsert_is_insert(spark, tmp_path):
    t = _mk(spark, tmp_path, "dvreins", properties={"write_changes": "true"})
    t.merge(_events(spark, BATCH1), mode="dv", batch_id="b0")
    t.merge(_events(spark, [(5, "delete", "r1", "b.py", None, None)]), mode="dv")
    t.merge(_events(spark, [(7, "upsert", "r1", "b.py", "c7", "v9")]), mode="dv")
    ch = {
        (r["repo"], r["path"]): r["_change_type"]
        for r in t.table_changes(2, 3).collect()
    }
    # the key's only prior version is DEAD: this is an insert, and the
    # dead row's stale values must not surface as a pre-image
    assert ch == {("r1", "b.py"): "insert"}


def test_dv_compact_folds_and_vacuum_reclaims(spark, tmp_path):
    dv = _replay(spark, tmp_path, "dvcompact", "dv")
    before = _state(dv)
    assert dv.compact(max_files_per_bucket=0) > 0
    assert not dv.snapshot.get("dv")
    assert all(r["dv_rows"] == 0 for r in dv.files().collect())
    assert _state(dv) == before
    dv.expire_snapshots(keep_last=1)
    removed = dv.vacuum()
    assert removed > 0
    dv_dir = os.path.join(dv.root, "dv")
    leftover = [
        fn
        for _, _, fns in os.walk(dv_dir)
        for fn in fns
        if fn.endswith(".parquet")
    ] if os.path.isdir(dv_dir) else []
    assert leftover == []
    assert _state(dv) == before


def test_dv_redelivery_noop(spark, tmp_path):
    dv = _replay(spark, tmp_path, "dvredeliver", "dv")
    before = _state(dv)
    v = dv.snapshot["version"]
    stats = dv.merge(_events(spark, BATCH2), mode="dv")  # full redelivery
    assert stats.batch_keys == 0
    assert dv.snapshot["version"] == v  # no-op: nothing committed
    assert _state(dv) == before


def test_dv_out_of_order_within_batch(spark, tmp_path):
    t = _mk(spark, tmp_path, "dvooo")
    shuffled = [BATCH1[2], BATCH1[0], BATCH1[1], (10, "upsert", "r1", "a.py", "cX", "vX")]
    t.merge(_events(spark, shuffled), mode="dv")
    got = {(r["repo"], r["path"]): r["commit"] for r in t.read().collect()}
    assert got[("r1", "a.py")] == "cX"


def test_dv_rejects_partial_images(spark, tmp_path):
    t = _mk(spark, tmp_path, "dvpartial")
    with pytest.raises(ValueError, match="full-row images"):
        t.merge(_events(spark, BATCH1), mode="dv", partial_update=True)


def test_dv_rejects_mor_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path, "dvmix")
    t.merge(_events(spark, BATCH1), mode="mor")
    with pytest.raises(ValueError, match="compact"):
        t.merge(_events(spark, BATCH2), mode="dv")
    # after folding the deltas, dv merges are accepted
    t.compact(max_files_per_bucket=0)
    t.merge(_events(spark, BATCH2), mode="dv")
    cow = _replay(spark, tmp_path, "dvmixref", "cow", batches=(BATCH1, BATCH2))
    assert _state(t) == _state(cow)


def test_dv_streaming_tail(spark, tmp_path):
    """The WAL tail reader drives dv merges through merge_kwargs — the
    full streaming chain works against the third physical mode too."""
    from cdm_cbioportal_etl_spark.cdc import gen_change_events
    from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA
    from cdm_cbioportal_etl_spark.cdc.replayer import expected_final_state
    from cdm_cbioportal_etl_spark.streaming import WalTailReader

    events = gen_change_events(spark, 3000, n_repos=10, paths_per_repo=20, seed=3)
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    for i, (lo, hi) in enumerate([(0, 1500), (1500, 3000)]):
        (
            events.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
            .coalesce(1)
            .write.parquet(os.path.join(wal_dir, f"seg-{i:04d}"))
        )
    table = LakeTable.create(
        spark, str(tmp_path / "dvtail"),
        T.StructType(list(REPOS_SCHEMA.fields)),
        key_cols=["repo", "path"], n_buckets=4,
    )
    WalTailReader(
        spark, os.path.join(wal_dir, "seg-*"), table,
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
        merge_kwargs={"mode": "dv"},
    ).run_available_now()
    got = {
        tuple(r)
        for r in table.read().select("repo", "path", "commit").collect()
    }
    want = {
        tuple(r)
        for r in expected_final_state(events, ["repo", "path"])
        .select("repo", "path", "commit")
        .collect()
    }
    assert got == want
    assert table.snapshot.get("dv") or all(
        not r["is_delta"] for r in table.files().collect()
    )


def test_dv_point_lookup_and_changes_since(spark, tmp_path):
    dv = _replay(spark, tmp_path, "dvpoint", "dv")
    r = dv.point_lookup({"repo": "r1", "path": "a.py"}).collect()
    assert len(r) == 1 and r[0]["commit"] == "c9"
    since = {
        (x["repo"], x["path"]) for x in dv.changes_since(6).collect()
    }
    assert since == {("r1", "b.py"), ("r1", "a.py")}
