"""Snapshot rollback + bucket-layout evolution.

``rollback_to`` must revert table content AND the LSN ledger (so the
corrected events re-apply under exactly-once), metadata-only.
``rebucket`` must preserve exact state across a bucket-count change and
leave the table fully operational (merges, pruning, time travel).
"""

import pytest
from pyspark.sql import functions as F, types as T

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


def _mk(spark, tmp_path, name, n_buckets=4, **props):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=n_buckets,
        properties=props or None,
    )


def _merge(t, rows):
    t.merge(t.spark.createDataFrame(rows, _BATCH))


def _state(t, **kw):
    return {(r.k, r.grp, r.v) for r in t.read(**kw).collect()}


def test_rollback_reverts_state_and_ledger(spark, tmp_path):
    t = _mk(spark, tmp_path, "rb")
    _merge(t, [(1, "upsert", "k1", "a", 1), (2, "upsert", "k2", "a", 2)])
    v_good = t.snapshot["version"]
    good = _state(t)
    _merge(t, [(3, "upsert", "k1", "BAD", 99), (4, "delete", "k2", None, None)])
    v_bad = t.snapshot["version"]
    assert _state(t) != good

    v_new = t.rollback_to(v_good)
    assert v_new > v_bad  # history stays linear, no version reuse
    assert _state(t) == good
    assert t.applied_lsn() == 2  # ledger reverted with the data

    # the bad head is still time-travelable until expiry
    assert ("k1", "BAD", 99) in _state(t, version=v_bad)

    # corrected events re-apply under the same exactly-once rule
    _merge(t, [(3, "upsert", "k1", "good", 3)])
    assert _state(t) == {("k1", "good", 3), ("k2", "a", 2)}
    assert t.applied_lsn() == 3


def test_rollback_to_expired_version_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, "rb_exp")
    _merge(t, [(1, "upsert", "k1", "a", 1)])
    _merge(t, [(2, "upsert", "k2", "a", 2)])
    _merge(t, [(3, "upsert", "k3", "a", 3)])
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="no snapshot"):
        t.rollback_to(1)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_rebucket_preserves_state_and_operation(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, f"rbk_{mode}", n_buckets=2, merge_mode=mode)
    _merge(t, [(i, "upsert", f"k{i:03d}", "a", i) for i in range(1, 33)])
    _merge(t, [(50, "upsert", "k001", "b", 111), (51, "delete", "k002", None, None)])
    before = _state(t)
    v_old = t.snapshot["version"]

    t.rebucket(8)
    assert t.snapshot["n_buckets"] == 8
    assert _state(t) == before, mode
    # MOR deltas folded into the rewrite: no delta files survive
    assert not any(
        f.get("delta") for fs in t.snapshot["buckets"].values() for f in fs
    )
    # row count stays metadata-only and correct
    assert t.row_count() == len(before)
    # time travel to the pre-rebucket layout still resolves
    assert _state(t, version=v_old) == before

    # the table keeps working: merge + pruned read under the new layout
    _merge(t, [(60, "upsert", "zzz", "c", 1)])
    assert ("zzz", "c", 1) in _state(t)
    got = (
        t.read(prune={"k": "k005"})
        .filter(F.col("k") == "k005")
        .collect()
    )
    assert [(r.k, r.v) for r in got] == [("k005", 5)]


def test_rebucket_noop_and_validation(spark, tmp_path):
    t = _mk(spark, tmp_path, "rbk_edge", n_buckets=4)
    _merge(t, [(1, "upsert", "k1", "a", 1)])
    v = t.snapshot["version"]
    assert t.rebucket(4) == v  # same count → no new snapshot
    with pytest.raises(ValueError, match="n_buckets"):
        t.rebucket(0)
