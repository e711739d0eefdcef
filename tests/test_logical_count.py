"""logical_row_count(): the metadata-only COUNT(*) shortcut.

Iceberg and Delta answer ``SELECT COUNT(*)`` from manifest statistics
without scanning data; this suite pins our equivalent — exact live-row
counts from pure manifest arithmetic on COW and DV snapshots (zero Spark
jobs, asserted by poisoning every scan entry point), with an honest
fallback to a resolved read whenever MOR deltas or pending equality
deletes make liveness a data question (and back to the fast path after
``compact()`` folds them in).
"""

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mk(spark, tmp_path, name, **props):
    root = str(tmp_path / name)
    shutil.rmtree(root, ignore_errors=True)
    return LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], n_buckets=4, properties=props or None
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, lsn long, op string")


def _assert_metadata_only(table):
    """The fast path must touch neither parquet footers nor a Spark scan."""

    def _boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("logical_row_count left the manifest fast path")

    orig_read, orig_count = table.read, table._count_rows
    table.read, table._count_rows = _boom, _boom
    try:
        return table.logical_row_count()
    finally:
        table.read, table._count_rows = orig_read, orig_count


def test_cow_logical_equals_resolved_and_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path, "cowcnt")
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(100)]))
    # updates + deletes: COW folds in place, physical stays logical
    t.merge(
        _batch(
            spark,
            [(i, "b", 100 + i, "upsert") for i in range(0, 50)]
            + [(i, None, 200 + i, "delete") for i in range(50, 70)],
        )
    )
    expect = t.read().count()
    assert expect == 80
    assert _assert_metadata_only(t) == expect


def test_dv_logical_subtracts_dead_rows_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path, "dvcnt", merge_mode="dv")
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(100)]))
    # dv: superseded/deleted rows stay in the file, dv_rows counts them
    t.merge(
        _batch(
            spark,
            [(i, "b", 100 + i, "upsert") for i in range(0, 30)]
            + [(i, None, 200 + i, "delete") for i in range(30, 45)],
        )
    )
    expect = t.read().count()
    assert expect == 85
    assert t.row_count() > expect  # physical keeps the dead rows
    assert _assert_metadata_only(t) == expect
    # compaction drops the kill lists; arithmetic must stay exact
    t.compact()
    assert _assert_metadata_only(t) == expect == t.read().count()


def test_mor_falls_back_to_resolved_read(spark, tmp_path):
    t = _mk(spark, tmp_path, "morcnt", merge_mode="mor")
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(60)]))
    t.merge(
        _batch(
            spark,
            [(i, "b", 100 + i, "upsert") for i in range(0, 20)]
            + [(i, None, 200 + i, "delete") for i in range(20, 30)],
        )
    )
    # deltas pending: liveness needs key resolution — fallback, still exact
    assert t.logical_row_count() == t.read().count() == 50
    with pytest.raises(AssertionError):
        _assert_metadata_only(t)
    t.compact()  # folds deltas -> fast path is back
    assert _assert_metadata_only(t) == 50


def test_equality_deletes_force_fallback_until_compact(spark, tmp_path):
    t = _mk(spark, tmp_path, "eqcnt")
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(40)]))
    t.delete_keys(spark.createDataFrame([(i,) for i in range(5)], "k long"))
    assert t.logical_row_count() == t.read().count() == 35
    with pytest.raises(AssertionError):
        _assert_metadata_only(t)
    t.compact()
    assert _assert_metadata_only(t) == 35


def test_time_travel_count(spark, tmp_path):
    t = _mk(spark, tmp_path, "ttcnt")
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(10)]))
    v0 = t.snapshot["version"]
    t.merge(_batch(spark, [(i, None, 100 + i, "delete") for i in range(4)]))
    assert t.logical_row_count() == 6
    assert t.logical_row_count(version=v0) == 10 == t.read(version=v0).count()
