"""CDF stream admission control (maxCommitsPerTrigger).

Contract under test:
- a backlog drains in bounded micro-batches: each admits at most k
  commits, contiguous and in order, and the union of streamed rows
  equals the full change interval
- the bound anchors at the checkpoint's resume point across restarts
  (Spark's AcceptsLatestSeenOffset hook calls partitions(restored,
  restored) before the first latestOffset — the cursor, not the
  stale startingversion, feeds the bound)
- under Trigger.AvailableNow the captured target itself is bounded, so
  one start() drains at most k commits; looping start() catches up in
  bounded steps (the documented pattern)
- maxCommitsPerTrigger < 1 is rejected
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.lake.datasource import (
    LakeTableDataSource,
    register,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark,
        os.path.join(str(tmp_path), "src"),
        SCHEMA,
        key_cols=["k"],
        n_buckets=2,
        properties={"write_changes": "true"},
    )


def _commit(spark, t, i):
    t.merge(
        spark.createDataFrame(
            [(i, f"v{i}", i, "upsert")], "k long, v string, lsn long, op string"
        ),
        batch_id=f"b{i}",
    )


def _drain_once(spark, t, ckpt, start_v, k, sink):
    q = (
        spark.readStream.format("laketable")
        .option("path", t.root)
        .option("mode", "cdf")
        .option("startingversion", str(start_v))
        .option("maxCommitsPerTrigger", str(k))
        .load()
        .writeStream.foreachBatch(
            lambda df, eid: sink.append(
                sorted(r[0] for r in df.select("_commit_version").distinct().collect())
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.exception() is None


def test_bounded_drains_cover_backlog_in_order(spark, tmp_path):
    t = _mk(spark, tmp_path)
    start_v = t.snapshot["version"]
    for i in range(8):
        _commit(spark, t, i)
    register(spark)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    batches: list[list[int]] = []
    for _ in range(10):
        _drain_once(spark, t, ckpt, start_v, 3, batches)
        if sum(len(b) for b in batches) >= 8:
            break
    # every batch admits <= 3 commits; versions are contiguous in order
    assert all(len(b) <= 3 for b in batches)
    flat = [v for b in batches for v in b]
    assert flat == sorted(flat)
    assert len(flat) == 8
    # restart-anchored: a LATER drain with the same (now stale)
    # startingversion picks up only the new commits
    _commit(spark, t, 100)
    before = len(batches)
    _drain_once(spark, t, ckpt, start_v, 3, batches)
    new = [v for b in batches[before:] for v in b]
    assert len(new) == 1 and new[0] == max(flat) + 1


def test_rate_limit_value_exactness(spark, tmp_path):
    """The union of all bounded batches equals table_changes over the
    whole interval (no commit skipped or duplicated)."""
    t = _mk(spark, tmp_path)
    start_v = t.snapshot["version"]
    for i in range(5):
        _commit(spark, t, i)
    register(spark)
    rows: list[tuple] = []
    ckpt = os.path.join(str(tmp_path), "ckpt-vals")
    for _ in range(6):
        q = (
            spark.readStream.format("laketable")
            .option("path", t.root)
            .option("mode", "cdf")
            .option("startingversion", str(start_v))
            .option("maxCommitsPerTrigger", "2")
            .load()
            .writeStream.foreachBatch(
                lambda df, eid: rows.extend(
                    tuple(r) for r in df.drop("_commit_version").collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if len(rows) >= 5:
            break
    want = sorted(
        tuple(r)
        for r in t.table_changes(
            start_v, t.snapshot["version"], include_preimages=True
        ).collect()
    )
    assert sorted(rows) == want


def test_invalid_rate_limit_rejected(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake.datasource import (
        LakeChangesStreamReader,
        _load_snapshot,
    )

    t = _mk(spark, tmp_path)
    _commit(spark, t, 1)
    root, snap = _load_snapshot({"path": t.root})
    with pytest.raises(ValueError, match="maxCommitsPerTrigger"):
        LakeChangesStreamReader(root, snap, {"maxcommitspertrigger": "0"})
