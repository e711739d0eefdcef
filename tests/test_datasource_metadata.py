"""Metadata tables through the `laketable` DataSource.

Iceberg exposes `table$files` / `$history` / `$snapshots`; here the same
inventory rides the registry as `option("metadata", ...)`. `files` and
`history` must be row-identical to the native LakeTable.files()/
history() DataFrames; `snapshots` is the registry user's discovery
surface for time-travel versions and must agree with refs/ancestry.
"""

import shutil

import pytest
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable, register_lake_datasource

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "mdt")
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], n_buckets=4,
        properties={"file_blooms": 1024},
    )
    t.merge(
        spark.createDataFrame(
            [(i, "a", i, "upsert") for i in range(50)],
            "k long, v string, lsn long, op string",
        )
    )
    t.merge(
        spark.createDataFrame(
            [(i, "b", 100 + i, "upsert") for i in range(20)]
            + [(i, None, 200 + i, "delete") for i in range(45, 50)],
            "k long, v string, lsn long, op string",
        )
    )
    register_lake_datasource(spark)
    return t


def _ds(spark, t, kind, **opts):
    r = spark.read.format("laketable").option("path", t.root).option(
        "metadata", kind
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _sorted_rows(df, *by):
    return [tuple(r) for r in df.orderBy(*by).collect()]


def test_files_matches_native(spark, table):
    assert _sorted_rows(_ds(spark, table, "files"), "bucket", "path") == (
        _sorted_rows(table.files(), "bucket", "path")
    )
    got = _ds(spark, table, "files")
    assert got.schema == table.files().schema


def test_history_matches_native(spark, table):
    assert _sorted_rows(_ds(spark, table, "history"), "seq") == (
        _sorted_rows(table.history(), "seq")
    )


def test_snapshots_lists_retained_versions(spark, table):
    rows = _ds(spark, table, "snapshots").orderBy("version").collect()
    head = table.snapshot["version"]
    assert rows[-1]["version"] == head
    # parent chain is intact and counts agree with the manifest
    by_v = {r["version"]: r for r in rows}
    assert by_v[head]["physical_rows"] == table.row_count()
    assert by_v[head]["applied_lsn"] == table.snapshot["ledger"]["applied_lsn"]
    for r in rows[1:]:
        assert r["parent"] in by_v


def test_metadata_time_travel(spark, table):
    v0 = _ds(spark, table, "snapshots").orderBy("version").collect()[0]
    files_then = _ds(spark, table, "files", version=str(v0["version"]))
    # the first retained snapshot has no second-merge files
    assert files_then.count() == v0["n_files"] < table.files().count()


def test_unknown_metadata_table_raises(spark, table):
    with pytest.raises(Exception, match="unknown metadata table"):
        _ds(spark, table, "partitions").collect()


def test_metadata_composes_with_filters(spark, table):
    # an ordinary filter over the metadata frame (no special casing)
    n_bloom = (
        _ds(spark, table, "files").filter("has_bloom").count()
    )
    assert n_bloom == sum(1 for r in table.files().collect() if r["has_bloom"])
    assert n_bloom > 0


def test_refs_metadata_matches_native(spark, table):
    table.create_branch("dev")
    table.create_tag("v1")
    got = sorted(tuple(r) for r in _ds(spark, table, "refs").collect())
    want = sorted(
        (r["name"], r["type"], r["version"]) for r in table.refs()
    )
    assert got == want
    names = {g[0] for g in got}
    assert {"main", "dev", "v1"} <= names
    # refs + snapshots together = full time-travel discovery: every ref
    # head is a readable version option
    for _, _, v in got:
        assert (
            _ds(spark, table, "files", version=str(v)).count() >= 0
        )
