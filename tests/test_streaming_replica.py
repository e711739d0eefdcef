"""Stream-driven replication (streaming/replica.py::CdfReplicaMaintainer).

Contract under test:
- a replica maintained purely from the CDF stream equals the source
  row-for-row after every drain (updates, deletes, multi-commit keys)
- checkpoint resume picks up only new commits; redelivery (fresh
  checkpoint) dedups against the replica's version ledger
- source schema evolution fails the stream with guidance;
  propagate_schema + a fresh drain converges on the evolved schema
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.lake.replicate import TableReplicator
from cdm_cbioportal_etl_spark.streaming import CdfReplicaMaintainer

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "lsn long, op string, k long, v string")


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


@pytest.fixture()
def rig(spark, tmp_path):
    src = LakeTable.create(
        spark,
        os.path.join(str(tmp_path), "src"),
        SCHEMA,
        key_cols=["k"],
        n_buckets=4,
        properties={"write_changes": "true"},
    )
    src.merge(_ev(spark, [(1, "upsert", 1, "a"), (2, "upsert", 2, "b")]))
    rep = TableReplicator.create(
        spark, os.path.join(str(tmp_path), "rep"), src
    )
    m = CdfReplicaMaintainer(
        spark, src.root, rep, os.path.join(str(tmp_path), "ckpt")
    )
    return src, rep, m


def test_stream_replica_tracks_source(spark, rig):
    src, rep, m = rig
    src.merge(
        _ev(spark, [(10, "upsert", 1, "a2"), (11, "delete", 2, None),
                    (12, "upsert", 3, "c")]),
        batch_id="b1",
    )
    # same key changes again in a second commit: latest version wins
    src.merge(
        _ev(spark, [(20, "upsert", 1, "a3"), (21, "upsert", 4, "d")]),
        batch_id="b2",
    )
    m.run_available()
    assert _rows(rep.table) == _rows(src)
    assert rep.synced_version() == src.snapshot["version"]

    # resume: only new commits; delete-then-reinsert across commits
    src.merge(_ev(spark, [(30, "delete", 1, None)]), batch_id="b3")
    src.merge(_ev(spark, [(31, "upsert", 1, "back")]), batch_id="b4")
    m.run_available()
    assert _rows(rep.table) == _rows(src)

    # fresh-checkpoint redelivery: version ledger folds it to a no-op
    m2 = CdfReplicaMaintainer(
        spark, src.root, rep, m.checkpoint_dir + "-replay"
    )
    v = rep.table.snapshot["version"]
    # stale startingversion: stream every interval again
    m2.replica.table.refresh()
    stream = (
        spark.readStream.format("laketable")
        .option("path", src.root)
        .option("mode", "cdf")
        .option("startingversion", "1")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(m2._apply)
        .option("checkpointLocation", m2.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rep.table.refresh()
    assert _rows(rep.table) == _rows(src)


def test_schema_evolution_restart_flow(spark, rig):
    src, rep, m = rig
    src.merge(_ev(spark, [(10, "upsert", 3, "c")]), batch_id="pre")
    m.run_available()
    src.evolve_schema(
        T.StructType(list(SCHEMA.fields) + [T.StructField("n", T.LongType())])
    )
    src.merge(
        spark.createDataFrame(
            [(20, "upsert", 5, "e", 7)],
            "lsn long, op string, k long, v string, n long",
        ),
        batch_id="evolved",
    )
    # a drain constructed post-evolution serves the new column; the
    # maintainer must fail loudly rather than project it away
    with pytest.raises(Exception, match="propagate_schema|schema evolved"):
        try:
            m.run_available()
        except Exception as e:  # surface the streaming cause text
            raise RuntimeError(str(e)) from e
    m.propagate_schema()
    assert [f.name for f in rep.table.schema.fields] == ["k", "v", "n"]
    m.run_available()
    assert _rows(rep.table) == _rows(src)
    # old rows null-fill the new column on both sides
    assert rep.table.read().filter("k = 3").collect()[0]["n"] is None


def test_bounded_drains_catch_up(spark, rig):
    src, rep, m = rig
    for i in range(5):
        src.merge(_ev(spark, [(50 + i, "upsert", 10 + i, f"x{i}")]),
                  batch_id=f"bk{i}")
    bounded = CdfReplicaMaintainer(
        spark, src.root, rep, m.checkpoint_dir + "-bounded",
        max_commits_per_drain=2,
    )
    bounded.run_available()
    assert _rows(rep.table) == _rows(src)
    assert rep.synced_version() == src.snapshot["version"]
