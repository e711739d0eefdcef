"""SQL front-end (lake/sql.py): statement skeleton parsed structurally,
expressions delegated to Spark; DML routes through the exactly-once
merge engine and must equal the programmatic API's results."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeSession, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


@pytest.fixture()
def sess(spark, tmp_path):
    root = str(tmp_path / "t")
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=4)
    t.merge(
        spark.createDataFrame(
            [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert"),
             (3, "c", 30, 3, "upsert")],
            "k long, v string, n long, lsn long, op string",
        )
    )
    ls = LakeSession(spark)
    ls.register("t", t)
    return ls


def _state(ls):
    return sorted(map(tuple, ls.sql("SELECT k, v, n FROM t").collect()))


def test_select_and_dml_roundtrip(sess):
    assert _state(sess) == [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    sess.sql("UPDATE t SET n = n + 1, v = upper(v) WHERE k <= 2")
    assert _state(sess) == [(1, "A", 11), (2, "B", 21), (3, "c", 30)]
    sess.sql("DELETE FROM t WHERE v = 'B'")
    assert _state(sess) == [(1, "A", 11), (3, "c", 30)]
    sess.sql("INSERT INTO t VALUES (4, 'd', 40), (5, 'e', 50)")
    assert _state(sess) == [(1, "A", 11), (3, "c", 30), (4, "d", 40), (5, "e", 50)]


def test_insert_column_list_and_select_source(sess, spark):
    spark.createDataFrame([(9, 90)], "k long, n long").createOrReplaceTempView(
        "stage"
    )
    sess.sql("INSERT INTO t (k, n) SELECT k, n FROM stage")
    assert (9, None, 90) in _state(sess)


def test_merge_cdc_idiom_equals_method_merge(sess, spark, tmp_path):
    batch = spark.createDataFrame(
        [(2, "B2", 22, 10, "update"), (3, None, None, 11, "delete"),
         (7, "g", 70, 12, "update")],
        "k long, v string, n long, lsn long, op string",
    )
    batch.createOrReplaceTempView("src_batch")
    sess.sql(
        """
        MERGE INTO t USING src_batch AS s ON t.k = s.k
        WHEN MATCHED AND s.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    # twin via the programmatic API
    root = str(tmp_path / "twin")
    twin = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=4)
    twin.merge(
        spark.createDataFrame(
            [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert"),
             (3, "c", 30, 3, "upsert")],
            "k long, v string, n long, lsn long, op string",
        )
    )
    twin.merge(
        batch.withColumn(
            "op", F.when(F.col("op") == "delete", "delete").otherwise("upsert")
        )
    )
    assert _state(sess) == sorted(map(tuple, twin.read().collect()))


def test_merge_subquery_source_and_exactly_once(sess, spark):
    spark.createDataFrame(
        [(1, "A1", 11, 5, "update")],
        "k long, v string, n long, lsn long, op string",
    ).createOrReplaceTempView("wal")
    stmt = """
        MERGE INTO t USING (SELECT * FROM wal WHERE lsn <= 5) s ON t.k = s.k
        WHEN MATCHED AND s.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """
    st1 = sess.sql(stmt)
    st2 = sess.sql(stmt)  # redelivery: lsn ledger filters everything
    assert st1.batch_keys == 1 and st2.batch_keys == 0
    assert (1, "A1", 11) in _state(sess)


def test_time_travel_and_table_changes(sess):
    sess.sql("DELETE FROM t WHERE k = 2")
    v_now = sess.table("t").snapshot["version"]
    old = sess.sql(f"SELECT k FROM t VERSION AS OF {v_now - 1} ORDER BY k")
    assert [r.k for r in old.collect()] == [1, 2, 3]
    ch = sess.sql(
        f"SELECT k, _change_type FROM TABLE_CHANGES(t, {v_now - 1}, {v_now})"
    )
    assert [tuple(r) for r in ch.collect()] == [(2, "delete")]


def test_ddl_and_maintenance(sess):
    assert sess.sql("ALTER TABLE t ADD COLUMN extra string") is True
    sess.sql("UPDATE t SET extra = 'x' WHERE k = 1")
    rows = {r.k: r.extra for r in sess.sql("SELECT k, extra FROM t").collect()}
    assert rows[1] == "x" and rows[2] is None
    hist = sess.sql("DESCRIBE HISTORY t")
    assert "operation" in hist.columns and hist.count() >= 2
    files = sess.sql("DESCRIBE FILES t")
    assert files.count() >= 1
    n = sess.sql("OPTIMIZE t")
    assert isinstance(n, int)
    assert isinstance(sess.sql("VACUUM t"), int)
    # state survives maintenance
    assert {r.k for r in sess.sql("SELECT k FROM t").collect()} == {1, 2, 3}


def test_optimize_zorder(sess):
    n = sess.sql("OPTIMIZE t ZORDER BY (n, v)")
    assert isinstance(n, int)
    assert {r.k for r in sess.sql("SELECT k FROM t").collect()} == {1, 2, 3}


def test_delete_keys_using(sess):
    """DELETE FROM t KEYS USING (<select>): the O(1)-write equality
    delete through the statement surface; the subquery reads the lake
    table itself."""
    lsn = sess.sql("DELETE FROM t KEYS USING (SELECT k FROM t WHERE n >= 20)")
    assert isinstance(lsn, int) and lsn > 0
    assert _state(sess) == [(1, "a", 10)]
    # no data file was touched — pure metadata + eqdel sidecar commit
    t = sess.table("t")
    assert t.snapshot.get("eqdel")
    # resurrect through INSERT (higher LSN)
    sess.sql("INSERT INTO t VALUES (2, 'z', 99)")
    assert _state(sess) == [(1, "a", 10), (2, "z", 99)]


def test_errors_are_informative(sess):
    with pytest.raises(ValueError, match="unknown lake table"):
        sess.sql("DELETE FROM nope WHERE k = 1")
    with pytest.raises(ValueError, match="key columns"):
        sess.sql(
            "MERGE INTO t USING src s ON t.v = s.v "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with pytest.raises(ValueError, match="unsupported statement"):
        sess.sql("TRUNCATE TABLE t")
    with pytest.raises(ValueError, match="UPDATE SET \\*"):
        sess.sql(
            "MERGE INTO t USING src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = 'x' "
            "WHEN NOT MATCHED THEN INSERT *"
        )
