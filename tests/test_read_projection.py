"""Column-pruned lake reads: read(columns=[...]) pushes the projection
under the union/alignment so the parquet scan itself reads only the
requested columns (+ MOR-internal keys/LSN), verified against the plan's
ReadSchema — and always returns the same values as projecting the full
read."""

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("wide1", T.StringType()),
        T.StructField("wide2", T.StringType()),
        T.StructField("x", T.LongType()),
    ]
)

EV = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        *SCHEMA.fields,
    ]
)


def _mk(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "pj"), SCHEMA, ["k"], n_buckets=4)
    t.overwrite(
        spark.createDataFrame(
            [(i, f"w1-{i}", f"w2-{i}", i * 3) for i in range(500)], SCHEMA
        )
    )
    return t


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_prunes_scan_and_matches_full_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    slim = t.read(columns=["k", "x"])
    assert slim.columns == ["k", "x"]
    plan = _plan(slim)
    # the parquet ReadSchema must not mention the wide payload columns
    assert "wide1" not in plan and "wide2" not in plan
    full = {(r["k"], r["x"]) for r in t.read().select("k", "x").collect()}
    assert {tuple(r) for r in slim.collect()} == full


def test_projection_without_keys_cow(spark, tmp_path):
    t = _mk(spark, tmp_path)
    only_x = t.read(columns=["x"])
    assert only_x.columns == ["x"]
    assert "wide1" not in _plan(only_x)
    assert only_x.count() == 500


def test_projection_resolves_mor_internally(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ev = spark.createDataFrame(
        [(100, "upsert", 7, "W1", "W2", 999), (101, "delete", 8, None, None, None)],
        EV,
    )
    t.merge(ev, mode="mor")
    got = {tuple(r) for r in t.read(columns=["x"]).collect()}
    # key 7's x updated to 999, key 8 tombstoned — resolution correct
    # even though keys were not requested
    want = {(i * 3,) for i in range(500) if i not in (7, 8)} | {(999,)}
    assert got == want
    # the wide payload columns still pruned from the MOR scan
    assert "wide1" not in _plan(t.read(columns=["x"]))


def test_projection_validates_and_composes_with_lsn(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="columns not in schema"):
        t.read(columns=["nope"])
    df = t.read(columns=["k"], with_lsn=True)
    assert df.columns == ["k", "_lsn"]
    # prune + projection + row filter compose
    rows = (
        t.read(prune={"k": (10, 12)}, columns=["k", "x"])
        .filter(F.col("k").between(10, 12))
        .collect()
    )
    assert sorted((r["k"], r["x"]) for r in rows) == [(10, 30), (11, 33), (12, 36)]
