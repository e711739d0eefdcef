"""Inspection surfaces: history() (DESCRIBE HISTORY analogue) and
files() (Iceberg .files metadata table) — DataFrames over manifest
metadata, no data files touched."""

import json

from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)

EV = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        *SCHEMA.fields,
    ]
)


def test_history_and_files_surfaces(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"], n_buckets=2)
    t.overwrite(spark.createDataFrame([(i, f"v{i}") for i in range(100)], SCHEMA))
    t.merge(
        spark.createDataFrame(
            [(10 + i, "upsert", i, "new") for i in range(5)]
            + [(20, "delete", 50, None)],
            EV,
        ),
        batch_id="my-batch",
        mode="mor",
    )
    t.compact()
    t.rebucket(4)

    hist = t.history().collect()
    ops = [r["operation"] for r in hist]
    assert ops.count("merge") == 1 and "compact" in ops and "rebucket" in ops
    merge_row = next(r for r in hist if r["operation"] == "merge")
    assert merge_row["batch_id"] == "my-batch"
    assert merge_row["lsn_max"] == 20 and merge_row["deletes"] == 1
    # seq is monotone and most-recent-last
    assert [r["seq"] for r in hist] == sorted(r["seq"] for r in hist)
    assert ops[-1] == "rebucket"
    # non-scalar lineage details ride as JSON
    rb = next(r for r in hist if r["operation"] == "rebucket")
    assert json.loads(rb["details"])["n_buckets"] == 4

    files = t.files().collect()
    assert files and all(not r["is_delta"] for r in files)  # compacted
    # manifest row counts agree with the metadata-only row_count()
    assert sum(r["rows"] for r in files) == t.row_count()
    # stats JSON decodes and carries the key column bounds
    st = json.loads(files[0]["stats"])
    assert "k" in st and len(st["k"]) == 2
    # buckets match the evolved layout
    assert {r["bucket"] for r in files} <= set(range(4))
    # the surfaces compose with ordinary DataFrame ops
    assert t.files().filter(F.col("rows") > 0).count() == len(files)


def test_files_reports_deltas_and_blooms(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t2"),
        SCHEMA,
        ["k"],
        n_buckets=2,
        properties={"file_blooms": 4096},
    )
    t.overwrite(spark.createDataFrame([(i, "x") for i in range(50)], SCHEMA))
    t.merge(
        spark.createDataFrame([(5, "upsert", 1, "y")], EV), mode="mor"
    )
    files = t.files()
    assert files.filter(F.col("is_delta")).count() >= 1
    assert files.filter(F.col("has_bloom")).count() >= 1
