"""CHECK constraints (Delta ADD CONSTRAINT semantics) and
TIMESTAMP AS OF time travel."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import (
    ConstraintViolationError,
    LakeSession,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _mk(spark, tmp_path, name="t"):
    t = LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=4
    )
    t.merge(
        spark.createDataFrame(
            [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")],
            "k long, v string, n long, lsn long, op string",
        )
    )
    return t


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, n long, lsn long, op string")


def test_constraint_blocks_bad_batch_and_admits_good(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint("n_positive", "n > 0")
    with pytest.raises(ConstraintViolationError, match="n_positive"):
        t.merge(_batch(spark, [(3, "c", -5, 3, "upsert")]))
    # nothing committed by the failed merge
    assert t.row_count() == 2 and t.applied_lsn() == 2
    t.merge(_batch(spark, [(3, "c", 5, 3, "upsert")]))
    assert t.row_count() == 3
    # deletes carry no payload: never constraint-checked
    t.merge(_batch(spark, [(3, None, None, 4, "delete")]))
    assert t.row_count() == 2


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ConstraintViolationError, match="existing"):
        t.add_constraint("n_small", "n < 15")  # k=2 has n=20
    # staging rolled back: constraint not installed, merges unaffected
    assert t._constraints() == {}
    t.merge(_batch(spark, [(9, "z", 999, 9, "upsert")]))
    assert t.row_count() == 3


def test_null_check_passes_sql_semantics(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint("n_positive", "n > 0")
    # NULL n: CHECK passes (SQL three-valued logic), matching the
    # partial-image contract where null means 'unchanged'
    t.merge(_batch(spark, [(5, "e", None, 5, "upsert")]))
    assert t.row_count() == 3


def test_drop_constraint_and_sql_surface(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ls = LakeSession(spark)
    ls.register("t", t)
    ls.sql("ALTER TABLE t ADD CONSTRAINT v_nonempty CHECK (length(v) > 0)")
    with pytest.raises(ConstraintViolationError):
        ls.sql("INSERT INTO t VALUES (7, '', 70)")
    ls.sql("ALTER TABLE t DROP CONSTRAINT v_nonempty")
    ls.sql("INSERT INTO t VALUES (7, '', 70)")
    assert t.row_count() == 3
    # constraint commits are metadata-only for the change feed
    assert t.snapshot_at(t.snapshot["version"] - 1).get("changes", {}).get(
        "mode"
    ) in ("none", "cdf", "diff")


def test_timestamp_as_of(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ts_mid = time.time()
    time.sleep(0.05)
    t.merge(_batch(spark, [(3, "c", 30, 3, "upsert")]))
    assert t.version_at_timestamp(ts_mid) == 1
    assert t.version_at_timestamp(time.time()) == 2
    with pytest.raises(ValueError, match="no retained snapshot"):
        t.version_at_timestamp(0.0)
    ls = LakeSession(spark)
    ls.register("t", t)
    old = ls.sql(f"SELECT k FROM t TIMESTAMP AS OF {ts_mid} ORDER BY k")
    assert [r.k for r in old.collect()] == [1, 2]
    now = ls.sql("SELECT count(*) AS c FROM t").collect()[0].c
    assert now == 3
