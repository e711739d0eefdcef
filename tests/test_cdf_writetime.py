"""Write-time change-data files (Delta-CDF shape).

A table created with ``write_changes=true`` persists, per COW
broadcast-path merge commit, exactly the changed rows (insert /
update_preimage / update_postimage / delete) under ``changes/``;
``table_changes`` answers from those files — O(changed rows), no
snapshot reads, no diff join — and falls back to the snapshot diff for
any interval containing a commit that could not capture pre-images
(shuffle-path merge, MOR append, overwrite, rollback).

Single-commit intervals have IDENTICAL semantics on both paths (the
per-commit log of one commit is its net diff), which is what these
tests exploit: every stored answer is checked row-for-row against a
twin table running the same workload without the property.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import IncrementalAggView, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

BATCHES = [
    # inserts
    [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert"), (3, "c", 30, 3, "upsert")],
    # update + insert + delete
    [(2, "B", 21, 4, "upsert"), (4, "d", 40, 5, "upsert"), (1, None, None, 6, "delete")],
    # re-insert after delete, delete of absent key, second update of k=2
    [(1, "a2", 11, 7, "upsert"), (9, None, None, 8, "delete"), (2, "B2", 22, 9, "upsert")],
]


def _mk(spark, root, props=None, n_buckets=4):
    shutil.rmtree(root, ignore_errors=True)
    return LakeTable.create(
        spark, root, SCHEMA, ["k"], n_buckets=n_buckets, properties=props or {}
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, n long, lsn long, op string")


def _canon(df):
    return sorted(
        tuple(r) for r in df.select("k", "v", "n", "_lsn", "_change_type").collect()
    )


def _run_twins(spark, tmp_path, props_a, batches=BATCHES, mode=None):
    ta = _mk(spark, str(tmp_path / "a"), {"write_changes": "true", **props_a})
    tb = _mk(spark, str(tmp_path / "b"))
    for rows in batches:
        ta.merge(_batch(spark, rows), mode=mode)
        tb.merge(_batch(spark, rows))
    return ta, tb


def test_per_commit_equals_diff_path(spark, tmp_path):
    ta, tb = _run_twins(spark, tmp_path, {})
    assert [
        ta.snapshot_at(v)["changes"]["mode"] for v in range(1, 4)
    ] == ["cdf", "cdf", "cdf"]
    for v in range(1, 4):
        for pre in (True, False):
            assert _canon(ta.table_changes(v - 1, v, include_preimages=pre)) == _canon(
                tb.table_changes(v - 1, v, include_preimages=pre)
            ), f"v{v} include_preimages={pre}"
    # final states agree regardless of feed machinery
    assert sorted(map(tuple, ta.read().collect())) == sorted(
        map(tuple, tb.read().collect())
    )


def test_multi_commit_interval_is_per_commit_log(spark, tmp_path):
    """Across commits the stored feed is the CONCATENATION of per-commit
    logs (Delta semantics): k=2 updated in commit 2 AND commit 3 emits
    two update pairs where the endpoint diff nets them into one."""
    ta, tb = _run_twins(spark, tmp_path, {})
    stored = _canon(ta.table_changes(0, 3, include_preimages=True))
    per_commit = sorted(
        sum(
            (
                _canon(tb.table_changes(v - 1, v, include_preimages=True))
                for v in range(1, 4)
            ),
            [],
        )
    )
    assert stored == per_commit
    # and the signed fold over either feed yields the same net counts
    net = _canon(tb.table_changes(0, 3))
    k2 = [r for r in stored if r[0] == 2 and r[4] == "update_postimage"]
    assert len(k2) == 2 and len([r for r in net if r[0] == 2]) == 1


def test_shuffle_path_marks_diff_and_falls_back(spark, tmp_path):
    ta, tb = _run_twins(
        spark, tmp_path, {"winner_broadcast_threshold": "1"}
    )
    assert all(
        ta.snapshot_at(v)["changes"]["mode"] == "diff" for v in range(1, 4)
    )
    for v in range(1, 4):
        assert _canon(ta.table_changes(v - 1, v, include_preimages=True)) == _canon(
            tb.table_changes(v - 1, v, include_preimages=True)
        )


def test_mor_marks_diff_and_falls_back(spark, tmp_path):
    ta, tb = _run_twins(spark, tmp_path, {"merge_mode": "mor"}, mode="mor")
    assert all(
        ta.snapshot_at(v)["changes"]["mode"] == "diff" for v in range(1, 4)
    )
    for v in range(1, 4):
        assert _canon(ta.table_changes(v - 1, v, include_preimages=True)) == _canon(
            tb.table_changes(v - 1, v, include_preimages=True)
        )


def test_mixed_interval_falls_back_to_diff(spark, tmp_path):
    """One diff-marked commit poisons only intervals containing it."""
    ta = _mk(spark, str(tmp_path / "a"), {"write_changes": "true"})
    ta.merge(_batch(spark, BATCHES[0]))                       # cdf
    ta.overwrite(ta.read(), lsn=ta.applied_lsn())             # diff marker
    ta.merge(_batch(spark, BATCHES[1]))                       # cdf
    modes = [ta.snapshot_at(v)["changes"]["mode"] for v in range(1, 4)]
    assert modes == ["cdf", "diff", "cdf"]
    # overwrite re-stamps row LSNs, so compare values only
    no_lsn = lambda rows: sorted((r[0], r[1], r[2], r[4]) for r in rows)
    # interval covering the overwrite: falls back (and stays correct)
    whole = _canon(ta.table_changes(0, 3, include_preimages=True))
    tb = _mk(spark, str(tmp_path / "b"))
    tb.merge(_batch(spark, BATCHES[0]))
    tb.merge(_batch(spark, BATCHES[1]))
    assert no_lsn(whole) == no_lsn(
        _canon(tb.table_changes(0, 2, include_preimages=True))
    )
    # interval after it: stored path serves
    assert no_lsn(_canon(ta.table_changes(2, 3))) == no_lsn(
        _canon(tb.table_changes(1, 2))
    )


def test_compaction_contributes_nothing(spark, tmp_path):
    ta, tb = _run_twins(spark, tmp_path, {})
    assert ta.compact(max_files_per_bucket=1) > 0
    assert ta.snapshot["changes"]["mode"] == "none"
    v = ta.snapshot["version"]
    assert ta.table_changes(v - 1, v).count() == 0
    # stored path still serves across the compaction
    assert _canon(ta.table_changes(2, v, include_preimages=True)) == _canon(
        tb.table_changes(2, 3, include_preimages=True)
    )


def test_schema_evolution_aligns_old_change_files(spark, tmp_path):
    ta = _mk(spark, str(tmp_path / "a"), {"write_changes": "true"})
    ta.merge(_batch(spark, BATCHES[0]))
    wide = T.StructType(
        list(SCHEMA.fields) + [T.StructField("extra", T.StringType())]
    )
    ta.evolve_schema(wide)
    b2 = spark.createDataFrame(
        [(2, "B", 21, "x", 4, "upsert")],
        "k long, v string, n long, extra string, lsn long, op string",
    )
    ta.merge(b2)
    ch = ta.table_changes(0, ta.snapshot["version"], include_preimages=True)
    rows = {
        (r["k"], r["_change_type"]): r["extra"] for r in ch.collect()
    }
    assert rows[(1, "insert")] is None          # pre-evolution commit null-fills
    assert rows[(2, "update_postimage")] == "x"
    assert rows[(2, "update_preimage")] is None


def test_dml_and_null_keys_capture_cdf(spark, tmp_path):
    ta, tb = _run_twins(spark, tmp_path, {})
    for t in (ta, tb):
        t.merge(
            _batch(spark, [(None, "nk", 1, 100, "upsert")])
        )  # null key: file-skip off, capture must stay null-safe
        t.update_where("k = 3", {"n": F.col("n") + 1})
        t.delete_where("k = 2")
    assert all(
        ta.snapshot_at(v)["changes"]["mode"] == "cdf"
        for v in range(4, ta.snapshot["version"] + 1)
    )
    for v in range(4, ta.snapshot["version"] + 1):
        assert _canon(ta.table_changes(v - 1, v, include_preimages=True)) == _canon(
            tb.table_changes(v - 1, v, include_preimages=True)
        )


def test_view_refresh_consumes_stored_cdf(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), {"write_changes": "true"})
    src.merge(_batch(spark, BATCHES[0]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), src, group_cols=["v"], sum_cols=["n"]
    )
    src.merge(_batch(spark, BATCHES[1]))
    src.merge(_batch(spark, BATCHES[2]))
    view.refresh(src)
    expect = sorted(
        map(
            tuple,
            src.read()
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n").alias("sum_n"))
            .collect(),
        )
    )
    assert sorted(map(tuple, view.read().collect())) == expect


def test_streaming_tail_to_cdf_to_view_chain(spark, tmp_path):
    """The whole CDC chain end-to-end: WAL segments tailed by Structured
    Streaming -> exactly-once merges into a write_changes table (every
    streaming commit captures CDF) -> incremental view refreshed from
    the STORED feed -> equals the recompute."""
    import os as _os

    from pyspark.sql import types as T

    from cdm_cbioportal_etl_spark.cdc import gen_change_events
    from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA
    from cdm_cbioportal_etl_spark.streaming import WalTailReader

    events = gen_change_events(
        spark, 4000, n_repos=16, paths_per_repo=25, seed=7
    )
    wal_dir = str(tmp_path / "wal")
    _os.makedirs(wal_dir, exist_ok=True)
    for i, (lo, hi) in enumerate([(0, 1500), (1500, 3000), (3000, 4000)]):
        (
            events.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(_os.path.join(wal_dir, f"seg-{i:04d}"))
        )
    table = LakeTable.create(
        spark,
        str(tmp_path / "table"),
        T.StructType(list(REPOS_SCHEMA.fields)),
        key_cols=["repo", "path"],
        n_buckets=8,
        properties={"write_changes": "true"},
    )
    view = IncrementalAggView.create(
        spark, str(tmp_path / "view"), table, group_cols=["lang"]
    )
    WalTailReader(
        spark,
        _os.path.join(wal_dir, "seg-*"),
        table,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    ).run_available_now()
    # every streaming merge captured CDF
    head = table.snapshot["version"]
    modes = {
        table.snapshot_at(v).get("changes", {}).get("mode")
        for v in range(1, head + 1)
    }
    assert modes <= {"cdf", "none"}, modes
    view.refresh(table)
    expect = sorted(
        map(
            tuple,
            table.read()
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect(),
        )
    )
    assert sorted(map(tuple, view.read().collect())) == expect


def test_vacuum_reclaims_expired_change_files(spark, tmp_path):
    ta, _tb = _run_twins(spark, tmp_path, {})
    ch_dir = os.path.join(str(tmp_path / "a"), "changes")
    n_dirs = len(os.listdir(ch_dir))
    assert n_dirs == 3
    ta.vacuum()  # everything still retained: nothing reclaimed
    assert len(os.listdir(ch_dir)) == 3
    ta.expire_snapshots(keep_last=2)
    ta.vacuum()
    assert len(os.listdir(ch_dir)) == 2
    # the retained window still answers from storage
    v = ta.snapshot["version"]
    assert ta.table_changes(v - 1, v).count() > 0
