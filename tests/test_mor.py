"""Merge-on-read mode: delta appends + read resolution + compaction.

Invariant under test: for any event stream, MOR table state (resolved
read) == COW table state == the directly-computed expected final state,
before AND after compaction — while MOR's apply never reads or rewrites
existing buckets.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.cdc import CdcReplayer, gen_change_events
from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA
from cdm_cbioportal_etl_spark.cdc.replayer import expected_final_state
from cdm_cbioportal_etl_spark.lake import LakeTable


def _mk(spark, root, mode=None):
    props = {"merge_mode": mode} if mode else None
    return LakeTable.create(
        spark, str(root), T.StructType(list(REPOS_SCHEMA.fields)),
        key_cols=["repo", "path"], n_buckets=8, properties=props,
    )


def _state(df):
    return {
        tuple(r)
        for r in df.select(
            "repo", "path", "commit", "lang",
            F.sha2(F.coalesce("content", F.lit("")), 256),
        ).collect()
    }


def test_mor_equals_cow_equals_expected(spark, tmp_path):
    events = gen_change_events(spark, 4000, n_repos=15, paths_per_repo=25, seed=3)
    cow = _mk(spark, tmp_path / "cow")
    mor = _mk(spark, tmp_path / "mor", mode="mor")
    for lo, hi in [(0, 1500), (1500, 3000), (3000, 4000)]:
        b = events.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        cow.merge(b)
        mor.merge(b)
    want = _state(expected_final_state(events, ["repo", "path"]))
    assert _state(mor.read()) == want
    assert _state(cow.read()) == want
    # MOR really appended deltas: some file entries carry the delta flag
    flags = [
        f.get("delta", False)
        for files in mor.snapshot["buckets"].values()
        for f in files
    ]
    assert any(flags)

    # compaction folds deltas into base files; state unchanged
    n = mor.compact(max_files_per_bucket=1000)  # only delta-triggered
    assert n > 0
    assert _state(mor.read()) == want
    assert not any(
        f.get("delta", False)
        for files in mor.snapshot["buckets"].values()
        for f in files
    )
    # after compaction physical rows == logical rows
    assert mor.row_count() == mor.read().count()


def test_mor_idempotent_redelivery(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", mode="mor")
    b = spark.createDataFrame(
        [(1, "insert", "r", "p", "c1", "md", "x"), (2, "update", "r", "p", "c2", "md", "y")],
        "lsn long, op string, repo string, path string, commit string, lang string, content string",
    )
    t.merge(b)
    v = t.snapshot["version"]
    t.merge(b)  # full redelivery: ledger no-op, no new snapshot
    assert t.snapshot["version"] == v
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0].commit == "c2"


def test_mor_delete_tombstone_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path / "t2", mode="mor")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "lsn long, op string, repo string, path string, commit string, lang string, content string",
    )
    t.merge(mk([(1, "insert", "r", "p", "c1", "md", "x")]))
    v1 = t.snapshot["version"]
    t.merge(mk([(2, "delete", "r", "p", None, None, None)]))
    assert t.read().count() == 0  # tombstone resolved at read
    # time travel to the pre-delete snapshot still sees the row
    assert t.read(version=v1).count() == 1


def test_mor_replayer_end_to_end(spark, tmp_path):
    """Full CdcReplayer path with merge_mode=mor from the table property."""
    events = gen_change_events(spark, 3000, n_repos=10, paths_per_repo=20, seed=9)
    t = _mk(spark, tmp_path / "t3", mode="mor")
    CdcReplayer(t).replay_range_batches(events, 0, 3000, batch_size=1000)
    want = _state(expected_final_state(events, ["repo", "path"]))
    assert _state(t.read()) == want
    assert t.snapshot["ledger"]["applied_lsn"] == 2999


def test_compact_fully_tombstoned_bucket(spark, tmp_path):
    """A bucket whose every key is deleted must compact to an EMPTY file
    list (regression: it previously kept its stale delta files)."""
    t = _mk(spark, tmp_path / "t4", mode="mor")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "lsn long, op string, repo string, path string, commit string, lang string, content string",
    )
    t.merge(mk([(1, "insert", "r", "p", "c1", "md", "x")]))
    t.merge(mk([(2, "delete", "r", "p", None, None, None)]))
    assert t.read().count() == 0
    n = t.compact(max_files_per_bucket=1000)
    assert n > 0
    # no delta (or any) files remain for the tombstoned key's bucket
    assert all(
        not f.get("delta", False)
        for files in t.snapshot["buckets"].values()
        for f in files
    )
    assert t.read().count() == 0 and t.row_count() == 0
