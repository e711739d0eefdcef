"""Snapshot-diff change data feed: ``LakeTable.table_changes``.

``changes_since`` is honest-upsert-only (COW keeps no tombstones); the
full CDC feed a downstream consumer needs — inserts, updates, AND
deletes between two retained snapshots — comes from diffing the two
resolved states.  The tests pin the classification contract, the
pre/post-image rule, schema-evolution alignment, and the metadata-only
scan plan (untouched buckets and carried files never read).
"""

import pytest
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)

_BATCH = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        *SCHEMA.fields,
    ]
)


def _mk(spark, tmp_path, name, **props):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=4,
        properties=props or None,
    )


def _merge(t, rows):
    t.merge(t.spark.createDataFrame(rows, _BATCH))


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_insert_update_delete_classification(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, f"cdf_{mode}", merge_mode=mode)
    _merge(t, [(1, "upsert", "k1", "a", 10),
               (2, "upsert", "k2", "a", 20),
               (3, "upsert", "k3", "a", 30)])
    v1 = t.snapshot["version"]
    _merge(t, [(4, "upsert", "k1", "b", 11),   # update
               (5, "delete", "k2", None, None),  # delete
               (6, "upsert", "k4", "b", 40)])  # insert
    got = {r.k: r for r in t.table_changes(v1).collect()}
    assert set(got) == {"k1", "k2", "k4"}, mode  # k3 unchanged → absent
    assert got["k1"]._change_type == "update"
    assert (got["k1"].grp, got["k1"].v, got["k1"]._lsn) == ("b", 11, 4)
    assert got["k2"]._change_type == "delete"
    # delete carries the PRE-image (last live version) — COW has no
    # tombstone payload to emit
    assert (got["k2"].grp, got["k2"].v, got["k2"]._lsn) == ("a", 20, 2)
    assert got["k4"]._change_type == "insert"
    assert (got["k4"].grp, got["k4"].v, got["k4"]._lsn) == ("b", 40, 6)


def test_compaction_only_interval_diffs_empty(spark, tmp_path):
    t = _mk(spark, tmp_path, "cdf_compact", merge_mode="mor")
    _merge(t, [(1, "upsert", "k1", "a", 1), (2, "upsert", "k2", "a", 2)])
    _merge(t, [(3, "upsert", "k1", "b", 3)])
    v = t.snapshot["version"]
    assert t.compact() > 0  # folds MOR deltas, rewrites buckets
    df = t.table_changes(v)
    assert df.count() == 0
    # schema is stable even on the empty diff
    assert df.columns == ["k", "grp", "v", "_lsn", "_change_type"]


def test_same_version_empty_and_reversed_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, "cdf_edge")
    _merge(t, [(1, "upsert", "k1", "a", 1)])
    v = t.snapshot["version"]
    assert t.table_changes(v, v).count() == 0
    _merge(t, [(2, "upsert", "k2", "a", 2)])
    with pytest.raises(ValueError, match="precedes"):
        t.table_changes(t.snapshot["version"], v)


def test_schema_evolution_across_diff(spark, tmp_path):
    t = _mk(spark, tmp_path, "cdf_evolve")
    _merge(t, [(1, "upsert", "k1", "a", 1), (2, "upsert", "k2", "a", 2)])
    v1 = t.snapshot["version"]
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("w", T.StringType())])
    t.evolve_schema(wide)
    batch = T.StructType(
        [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType()),
         *wide.fields]
    )
    t.merge(spark.createDataFrame(
        [(3, "upsert", "k1", "b", 11, "new"), (4, "delete", "k2", None, None, None)],
        batch,
    ))
    got = {r.k: r for r in t.table_changes(v1).collect()}
    assert got["k1"]._change_type == "update" and got["k1"].w == "new"
    # delete pre-image predates the new column → aligned null
    assert got["k2"]._change_type == "delete" and got["k2"].w is None
    assert got["k2"].grp == "a"


def test_diff_plan_skips_untouched_buckets_and_carried_files(spark, tmp_path):
    """The scan plan is O(changed data): buckets whose manifests are
    identical are never read, and inside a changed COW bucket files
    carried by file-level copy-on-write are excluded too."""
    t = _mk(spark, tmp_path, "cdf_plan")
    _merge(t, [(i, "upsert", f"k{i:03d}", "a", i) for i in range(1, 65)])
    snap_a = t.snapshot
    v1 = snap_a["version"]
    _merge(t, [(100, "upsert", "k001", "b", 999)])  # touches ONE key
    snap_b = t.snapshot
    changed, paths = LakeTable._diff_plan(snap_a, snap_b)
    n_buckets = snap_b["n_buckets"]
    assert len(changed) < n_buckets  # untouched buckets skipped entirely
    all_b_paths = {
        f["path"] for b in changed for f in snap_b["buckets"].get(str(b), [])
    }
    carried = {
        f["path"]
        for b in changed
        for f in snap_a["buckets"].get(str(b), [])
        if f["path"] in all_b_paths
    }
    # file-level COW carried at least one winner-free file across the
    # merge, and the plan excludes every carried file
    assert not (paths & carried)
    # and the restricted diff is still exactly correct
    got = [r.asDict() for r in t.table_changes(v1).collect()]
    assert len(got) == 1
    assert got[0]["k"] == "k001" and got[0]["_change_type"] == "update"
    assert got[0]["v"] == 999 and got[0]["_lsn"] == 100


def test_null_key_updates_match_null_safely(spark, tmp_path):
    t = _mk(spark, tmp_path, "cdf_null")
    _merge(t, [(1, "upsert", None, "a", 1), (2, "upsert", "k1", "a", 2)])
    v1 = t.snapshot["version"]
    _merge(t, [(3, "upsert", None, "b", 3)])
    got = {r.k: r for r in t.table_changes(v1).collect()}
    # the null-key row is ONE update, not a delete+insert pair
    assert set(got) == {None}
    assert got[None]._change_type == "update" and got[None].grp == "b"


def test_multi_hop_diff_collapses_intermediate_versions(spark, tmp_path):
    """A key inserted then deleted strictly inside the interval never
    existed at either endpoint → absent from the feed (net-change
    semantics, same as Delta CDF between non-adjacent versions)."""
    t = _mk(spark, tmp_path, "cdf_hops")
    _merge(t, [(1, "upsert", "k1", "a", 1)])
    v1 = t.snapshot["version"]
    _merge(t, [(2, "upsert", "ghost", "a", 2)])
    _merge(t, [(3, "delete", "ghost", None, None)])
    _merge(t, [(4, "upsert", "k1", "a", 9)])
    got = {r.k: r for r in t.table_changes(v1).collect()}
    assert set(got) == {"k1"}
    assert got["k1"]._change_type == "update" and got["k1"].v == 9


def test_update_preimages_cdf_encoding(spark, tmp_path):
    """include_preimages=True emits Delta-CDF update pairs: the replaced
    image (update_preimage, old lsn) and the new one (update_postimage)."""
    t = _mk(spark, tmp_path, "cdf_pre")
    _merge(t, [(1, "upsert", "k1", "a", 10), (2, "upsert", "k2", "a", 20)])
    v1 = t.snapshot["version"]
    _merge(t, [(3, "upsert", "k1", "b", 11), (4, "delete", "k2", None, None),
               (5, "upsert", "k3", "b", 30)])
    rows = t.table_changes(v1, include_preimages=True).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r._change_type, []).append(r)
    assert set(by_type) == {"update_preimage", "update_postimage",
                            "delete", "insert"}
    (pre,), (post,) = by_type["update_preimage"], by_type["update_postimage"]
    assert (pre.k, pre.grp, pre.v, pre._lsn) == ("k1", "a", 10, 1)
    assert (post.k, post.grp, post.v, post._lsn) == ("k1", "b", 11, 3)
    # default encoding unchanged: single 'update' row
    assert {r._change_type for r in t.table_changes(v1).collect()} == {
        "update", "delete", "insert"
    }


def test_diff_from_expired_version_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, "cdf_expire")
    _merge(t, [(1, "upsert", "k1", "a", 1)])
    v1 = t.snapshot["version"]
    _merge(t, [(2, "upsert", "k2", "a", 2)])
    _merge(t, [(3, "upsert", "k3", "a", 3)])
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="no snapshot"):
        t.table_changes(v1)
