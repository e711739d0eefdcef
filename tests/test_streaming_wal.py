"""WAL-tail streaming: drain → merge equivalence, incremental segments,
idempotent restart (exactly-once net effect)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.cdc import gen_change_events
from cdm_cbioportal_etl_spark.cdc.replayer import expected_final_state
from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA
from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.streaming import WalTailReader


def _write_segment(events, lo, hi, wal_dir, seg_id):
    (
        events.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(wal_dir, f"seg-{seg_id:04d}"))
    )


def _flatten_wal(spark, wal_dir):
    # file-stream source wants files directly under the glob; write each
    # segment dir then point the stream at seg-*/ via glob path
    return os.path.join(wal_dir, "seg-*")


def _state(table):
    return {
        tuple(r)
        for r in table.read()
        .select("repo", "path", "commit", "lang", F.sha2(F.coalesce("content", F.lit("")), 256))
        .collect()
    }


def _expected(events):
    return {
        tuple(r)
        for r in expected_final_state(events, ["repo", "path"])
        .select("repo", "path", "commit", "lang", F.sha2(F.coalesce("content", F.lit("")), 256))
        .collect()
    }


@pytest.fixture()
def wal_env(spark, tmp_path):
    events = gen_change_events(spark, 5000, n_repos=20, paths_per_repo=30, seed=11)
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir, exist_ok=True)
    table = LakeTable.create(
        spark,
        str(tmp_path / "table"),
        T.StructType(list(REPOS_SCHEMA.fields)),
        key_cols=["repo", "path"],
        n_buckets=8,
    )
    return events, wal_dir, table, str(tmp_path / "ckpt")


def test_available_now_drains_to_batch_equivalent_state(spark, wal_env):
    events, wal_dir, table, ckpt = wal_env
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 3500), (3500, 5000)]):
        _write_segment(events, lo, hi, wal_dir, i)
    reader = WalTailReader(spark, _flatten_wal(spark, wal_dir), table, ckpt,
                           max_files_per_trigger=1)
    reader.run_available_now()
    assert _state(table) == _expected(events)
    # the ledger advanced to the max lsn seen
    assert table.snapshot["ledger"]["applied_lsn"] == 4999


def test_incremental_segments_and_restart_idempotence(spark, wal_env):
    events, wal_dir, table, ckpt = wal_env
    _write_segment(events, 0, 2500, wal_dir, 0)
    reader = WalTailReader(spark, _flatten_wal(spark, wal_dir), table, ckpt)
    reader.run_available_now()
    first = _state(table)
    assert first == _expected(events.filter("lsn < 2500"))
    v1 = table.snapshot["version"]

    # new segment arrives; a new AvailableNow run picks up ONLY the delta
    _write_segment(events, 2500, 5000, wal_dir, 1)
    WalTailReader(spark, _flatten_wal(spark, wal_dir), table, ckpt).run_available_now()
    assert _state(table) == _expected(events)

    # restart with a FRESH checkpoint (simulated lost stream state): the
    # whole WAL is redelivered, but the LSN ledger makes it a no-op
    v2 = table.snapshot["version"]
    WalTailReader(
        spark, _flatten_wal(spark, wal_dir), table, ckpt + "-fresh"
    ).run_available_now()
    assert _state(table) == _expected(events)
    assert table.snapshot["ledger"]["applied_lsn"] == 4999


def test_streaming_schema_evolution(spark, tmp_path):
    """A WAL segment adds a column mid-stream; the registry evolves the
    table before the merge, and old rows null-fill the new column."""
    from pyspark.sql import types as T
    from cdm_cbioportal_etl_spark.cdc import SchemaRegistry
    from cdm_cbioportal_etl_spark.lake import LakeTable

    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir, exist_ok=True)
    base = spark.createDataFrame(
        [(0, "update", "a", "v1"), (1, "update", "b", "v1")],
        "lsn long, op string, k string, v string",
    )
    base.coalesce(1).write.parquet(os.path.join(wal_dir, "seg-0000"))
    table = LakeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]),
        key_cols=["k"], n_buckets=4,
    )
    reg = SchemaRegistry()
    WalTailReader(spark, os.path.join(wal_dir, "seg-*"), table, str(tmp_path / "c1"),
                  registry=reg).run_available_now()
    assert {f.name for f in table.schema.fields} == {"k", "v"}

    evolved = spark.createDataFrame(
        [(2, "update", "a", "v2", "extra")],
        "lsn long, op string, k string, v string, note string",
    )
    evolved.coalesce(1).write.parquet(os.path.join(wal_dir, "seg-0001"))
    WalTailReader(spark, os.path.join(wal_dir, "seg-*"), table, str(tmp_path / "c2"),
                  registry=reg).run_available_now()
    assert {f.name for f in table.schema.fields} == {"k", "v", "note"}
    rows = {r.k: (r.v, r.note) for r in table.read().collect()}
    assert rows == {"a": ("v2", "extra"), "b": ("v1", None)}
