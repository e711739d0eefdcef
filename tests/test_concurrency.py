"""Optimistic concurrency: O_EXCL manifest commit + merge retry.

Two writers racing to the same version must produce exactly one winner;
the loser's merge refreshes, re-prepares, and lands at the next version
with exactly-once semantics intact (the ledger filters any rows the
winner already applied).
"""

import json
import os

import pytest
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import ConcurrentCommitError, LakeTable

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


def _merge(t, rows):
    t.merge(t.spark.createDataFrame(rows, _BATCH))


def test_stale_handle_merge_retries_and_lands(spark, tmp_path):
    root = str(tmp_path / "occ")
    a = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=2)
    b = LakeTable(spark, root)
    _ = b.snapshot  # b caches the pre-race snapshot
    _merge(a, [(1, "upsert", "k1", "a", 1)])   # a wins version 1
    # b's cached snapshot is stale: its commit would collide at version 1;
    # merge must refresh + re-prepare and land at version 2
    _merge(b, [(2, "upsert", "k2", "b", 2)])
    b.refresh()
    got = {(r.k, r.grp, r.v) for r in b.read().collect()}
    assert got == {("k1", "a", 1), ("k2", "b", 2)}
    assert b.applied_lsn() == 2
    # the race left a linear, gap-free history
    assert b.snapshot["version"] == 2


def test_retry_preserves_exactly_once_under_overlap(spark, tmp_path):
    """The racer commits SOME of the same LSNs the loser carries: after
    the loser's retry those rows must not double-apply."""
    root = str(tmp_path / "occ2")
    a = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=2)
    b = LakeTable(spark, root)
    _ = b.snapshot
    _merge(a, [(1, "upsert", "k1", "a", 1), (2, "upsert", "k2", "a", 2)])
    # b redelivers lsn 1-2 plus a new event — retry must apply ONLY lsn 3
    _merge(b, [(1, "upsert", "k1", "a", 1), (2, "upsert", "k2", "a", 2),
               (3, "upsert", "k3", "b", 3)])
    b.refresh()
    got = {(r.k, r.grp) for r in b.read().collect()}
    assert got == {("k1", "a"), ("k2", "a"), ("k3", "b")}
    assert b.applied_lsn() == 3


def test_orphan_token_raises_with_repair_hint(spark, tmp_path):
    """A crashed writer's remnant is its commit-arbitration token (the
    ref pointer never advanced past the token's base).  A bare orphan
    MANIFEST no longer blocks — the global allocator draws past it and
    expire_snapshots reaps it — but the token must surface a repairable
    ConcurrentCommitError rather than spin or drop data."""
    root = str(tmp_path / "occ3")
    t = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=2)
    _merge(t, [(1, "upsert", "k1", "a", 1)])
    v = t.snapshot["version"]
    # crashed writer: token for (main, v) exists, manifest half-written,
    # pointer never moved
    orphan = os.path.join(root, "_meta", f"snap-{v + 1:08d}.json")
    with open(orphan, "w") as fh:
        json.dump({"version": v + 1}, fh)
    token = os.path.join(root, "_meta", "txn", f"main-{v}")
    with open(token, "w") as fh:
        fh.write(str(v + 1))
    with pytest.raises(ConcurrentCommitError, match="repair"):
        _merge(t, [(2, "upsert", "k2", "a", 2)])
    # repair and retry succeeds
    os.remove(token)
    os.remove(orphan)
    _merge(t, [(2, "upsert", "k2", "a", 2)])
    assert t.applied_lsn() == 2


def test_non_merge_committers_surface_conflicts(spark, tmp_path):
    """compact/evolve/rollback don't auto-retry — they raise for the
    caller to refresh and re-decide (the state they validated changed)."""
    root = str(tmp_path / "occ4")
    a = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=2)
    _merge(a, [(1, "upsert", "k1", "a", 1)])
    _merge(a, [(2, "upsert", "k1", "b", 2)])
    b = LakeTable(spark, root)
    _ = b.snapshot  # caches version 2
    _merge(a, [(3, "upsert", "k2", "a", 3)])  # a commits version 3
    with pytest.raises(ConcurrentCommitError):
        b.rollback_to(1)  # stale handle also targets version 3
    b.refresh()
    b.rollback_to(1)  # after refresh it commits cleanly
    assert {(r.k, r.grp) for r in b.read().collect()} == {("k1", "a")}


def test_stale_handle_partial_merge_retries_with_partial_semantics(spark, tmp_path):
    """A partial-image merge that loses the commit race must RE-PREPARE
    with partial semantics (not the whole-row fold): after the retry the
    unchanged columns still inherit from the state the racer committed."""
    root = str(tmp_path / "occ_partial")
    a = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=2)
    b = LakeTable(spark, root)
    _ = b.snapshot  # stale handle
    # racer a lands the full row first
    _merge(a, [(1, "upsert", "k1", "grp0", 7)])
    # loser b carries a PARTIAL image for the same key (grp unchanged);
    # its commit collides, refreshes, re-prepares partially, and the
    # enrichment must see a's row
    b.merge(
        b.spark.createDataFrame([(2, "upsert", "k1", None, 9)], _BATCH),
        partial_update=True,
    )
    b.refresh()
    got = {(r.k, r.grp, r.v) for r in b.read().collect()}
    assert got == {("k1", "grp0", 9)}  # grp inherited through the retry
    assert b.snapshot["version"] == 2 and b.applied_lsn() == 2
