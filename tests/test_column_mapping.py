"""RENAME/DROP COLUMN via field ids + physical names (column mapping).

Iceberg schema evolution beyond add/widen (reference analog: the summary
configs freely re-label clinical attribute columns between pipeline
versions, e.g. reference pipeline/lib/summary/summary_config_processor.py
header remapping) — here as metadata-only ALTERs over immutable data
files: a field keeps its id and PHYSICAL column name forever; renames
swap only the logical name, drops retire the id, and every read path
projects by id so old data can never leak into a re-added name.
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.lake.table import SchemaEvolutionError


def _mk(spark, tmp_path, name="cm", **props):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    return LakeTable.create(
        spark, str(tmp_path / name), schema, ["k"], n_buckets=4,
        properties=props or None,
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, n long, lsn long, op string"
    )


def test_rename_roundtrip_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")]))
    v_before = t.snapshot["version"]
    t.rename_column("v", "val")
    # new logical name serves OLD data (no rewrite happened)
    got = {r["k"]: (r["val"], r["n"]) for r in t.read().collect()}
    assert got == {1: ("a", 10), 2: ("b", 20)}
    # merges under the NEW name land next to old files
    t.merge(
        spark.createDataFrame(
            [(3, "c", 30, 3, "upsert"), (1, "a2", 11, 4, "upsert")],
            "k long, val string, n long, lsn long, op string",
        )
    )
    got = {r["k"]: r["val"] for r in t.read().collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}
    # time travel shows the OLD logical name
    old = t.read(version=v_before)
    assert "v" in old.columns and "val" not in old.columns
    assert {r["v"] for r in old.collect()} == {"a", "b"}


def test_drop_then_readd_never_leaks(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "secret", 10, 1, "upsert")]))
    t.drop_column("v")
    assert [f.name for f in t.schema.fields] == ["k", "n"]
    assert t.read().columns == ["k", "n"]
    # re-add the same logical name: fresh field id — old values must NOT
    # resurface (the classic column-mapping correctness trap)
    t.evolve_schema(
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("n", T.LongType()),
                T.StructField("v", T.StringType()),
            ]
        )
    )
    rows = t.read().collect()
    assert rows[0]["v"] is None
    # new writes to the re-added column work and stay separate
    t.merge(_batch(spark, [(2, "fresh", 20, 2, "upsert")]))
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: None, 2: "fresh"}


def test_rename_key_column_exactly_once_survives(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")]))
    t.rename_column("k", "id")
    assert t.key_cols == ["id"]
    # redelivery of an already-applied LSN is still a no-op
    st = t.merge(
        spark.createDataFrame(
            [(1, "a", 10, 1, "upsert")],
            "id long, v string, n long, lsn long, op string",
        )
    )
    assert st.upserts == 0 and st.batch_rows == 0  # LSN gate: no-op
    # new upsert + delete under the new key name
    t.merge(
        spark.createDataFrame(
            [(2, None, None, 3, "delete"), (4, "d", 40, 4, "upsert")],
            "id long, v string, n long, lsn long, op string",
        )
    )
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 4: "d"}
    # point lookup prunes + answers under the renamed key
    assert t.point_lookup({"id": 4}).collect()[0]["v"] == "d"


def test_rename_under_mor_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")]))
    t.merge(_batch(spark, [(1, "a2", 11, 3, "upsert")]))  # delta on top
    t.rename_column("v", "val")
    got = {r["k"]: r["val"] for r in t.read().collect()}
    assert got == {1: "a2", 2: "b"}
    # merge more deltas under the new name, then compact through it
    t.merge(
        spark.createDataFrame(
            [(2, "b2", 21, 4, "upsert")],
            "k long, val string, n long, lsn long, op string",
        )
    )
    t.compact()
    got = {r["k"]: r["val"] for r in t.read().collect()}
    assert got == {1: "a2", 2: "b2"}


def test_stats_prune_and_blooms_survive_rename(spark, tmp_path):
    t = _mk(spark, tmp_path, file_blooms=256)
    for i in range(4):
        t.merge(
            _batch(
                spark,
                [(100 * i + j, f"v{i}", i, 10 * i + j + 1, "upsert") for j in range(5)],
            )
        )
    t.rename_column("k", "id")
    adm_point, total = t.files_admitted(prune={"id": 103})
    assert adm_point < total  # stats keyed physically still prune
    assert {r["id"] for r in t.read(prune={"id": 103}).collect()} >= {103}
    got = t.point_lookup({"id": 203}).collect()
    assert len(got) == 1 and got[0]["n"] == 2


def test_rename_validations(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    with pytest.raises(SchemaEvolutionError, match="no such column"):
        t.rename_column("zz", "y")
    with pytest.raises(SchemaEvolutionError, match="already exists"):
        t.rename_column("v", "n")
    with pytest.raises(SchemaEvolutionError, match="invalid column name"):
        t.rename_column("v", "bad name!")
    t.add_constraint("n_pos", "n > 0")
    with pytest.raises(SchemaEvolutionError, match="constraint"):
        t.rename_column("n", "count")
    with pytest.raises(SchemaEvolutionError, match="constraint"):
        t.drop_column("n")
    t.drop_constraint("n_pos")
    t.rename_column("n", "count")  # allowed after the constraint is gone
    with pytest.raises(SchemaEvolutionError, match="key column"):
        t.drop_column("k")
    # evolve_schema still rejects implicit drops (rename is explicit-only)
    with pytest.raises(SchemaEvolutionError, match="drop not allowed"):
        t.evolve_schema(
            T.StructType(
                [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
            )
        )


def test_rename_updates_stats_cols_property(spark, tmp_path):
    t = _mk(spark, tmp_path, stats_cols="k,n,_lsn")
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    t.rename_column("n", "amount")
    assert t.snapshot["properties"]["stats_cols"] == "k,amount,_lsn"
    t.drop_column("amount")
    assert t.snapshot["properties"]["stats_cols"] == "k,_lsn"


def test_cdf_across_rename_serves_to_side_names(spark, tmp_path):
    t = _mk(spark, tmp_path, write_changes="true")
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    v0 = t.snapshot["version"]
    t.merge(_batch(spark, [(2, "b", 20, 2, "upsert")]))
    t.rename_column("v", "val")
    t.merge(
        spark.createDataFrame(
            [(1, "a2", 11, 3, "upsert")],
            "k long, val string, n long, lsn long, op string",
        )
    )
    ch = t.table_changes(v0)
    assert "val" in ch.columns and "v" not in ch.columns
    by = {(r["k"], r["_change_type"]): r["val"] for r in ch.collect()}
    assert by[(2, "insert")] == "b"
    assert by[(1, "update")] == "a2"


def test_legacy_manifest_without_ids_still_renames(spark, tmp_path):
    import json

    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    # simulate a legacy manifest: strip id/pname from every schema entry
    snap = json.loads(json.dumps(t.snapshot))
    for sid in snap["schemas"]:
        snap["schemas"][sid] = [
            {"name": f["name"], "type": f["type"]} for f in snap["schemas"][sid]
        ]
    snap["version"] += 1
    t._commit(snap)
    t.refresh()
    t.evolve_schema(
        T.StructType(
            list(t.schema.fields) + [T.StructField("extra", T.StringType())]
        )
    )
    t.rename_column("v", "val")
    got = t.read().collect()
    assert {r["val"] for r in got} == {"a"}
    assert got[0]["extra"] is None


def test_dv_and_eqdel_survive_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(i, f"v{i}", i, i + 1, "upsert") for i in range(8)]))
    t.rename_column("k", "id")
    # dv-mode merge under the renamed key kills old positions
    t.merge(
        spark.createDataFrame(
            [(3, "x", 99, 100, "upsert"), (5, None, None, 101, "delete")],
            "id long, v string, n long, lsn long, op string",
        ),
        mode="dv",
    )
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[3] == "x" and 5 not in got and len(got) == 7
    # equality delete by the new key name
    t.delete_keys(spark.createDataFrame([(7,)], "id long"))
    assert 7 not in {r["id"] for r in t.read().collect()}
    t.compact()
    assert 7 not in {r["id"] for r in t.read().collect()}


def test_sql_rename_and_drop_column(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake import LakeSession

    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    ls = LakeSession(spark)
    ls.register("t", t)
    ls.sql("ALTER TABLE t RENAME COLUMN v TO val")
    assert [f.name for f in t.schema.fields] == ["k", "val", "n"]
    got = ls.sql("SELECT k, val FROM t").collect()
    assert got[0]["val"] == "a"
    ls.sql("ALTER TABLE t DROP COLUMN n")
    assert [f.name for f in t.schema.fields] == ["k", "val"]
    ls.sql("UPDATE t SET val = upper(val) WHERE k = 1")
    assert ls.sql("SELECT * FROM t").collect()[0]["val"] == "A"


def test_datasource_reads_through_rename(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake import register_lake_datasource

    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")]))
    t.rename_column("v", "val")
    t.merge(
        spark.createDataFrame(
            [(3, "c", 30, 3, "upsert")],
            "k long, val string, n long, lsn long, op string",
        )
    )
    t.rename_column("k", "id")
    register_lake_datasource(spark)
    df = spark.read.format("laketable").option("path", t.root).load()
    assert set(df.columns) == {"id", "val", "n"}
    got = {r["id"]: r["val"] for r in df.collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # point lookup through the registry prunes on the renamed key
    one = df.filter("id = 2").collect()
    assert len(one) == 1 and one[0]["val"] == "b"
    # version time travel serves the OLD names
    old = (
        spark.read.format("laketable").option("path", t.root)
        .option("version", "1").load()
    )
    assert set(old.columns) == {"k", "v", "n"}


def test_datasource_eq_deletes_and_dropped_column(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake import register_lake_datasource

    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(i, f"v{i}", i, i + 1, "upsert") for i in range(5)]))
    t.rename_column("k", "id")
    t.delete_keys(spark.createDataFrame([(3,)], "id long"))
    t.drop_column("n")
    register_lake_datasource(spark)
    df = spark.read.format("laketable").option("path", t.root).load()
    assert set(df.columns) == {"id", "v"}
    assert {r["id"] for r in df.collect()} == {0, 1, 2, 4}


def test_replicator_propagates_rename_and_drop(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake.replicate import TableReplicator

    src = _mk(spark, tmp_path, "repl_src", write_changes="true")
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")]))
    rep = TableReplicator.create(spark, str(tmp_path / "repl_dst"), src)
    assert {r["k"] for r in rep.read().collect()} == {1, 2}
    # source renames (incl. the key), drops, and keeps writing
    src.rename_column("k", "id")
    src.rename_column("v", "val")
    src.drop_column("n")
    src.merge(
        spark.createDataFrame(
            [(3, "c", 3, "upsert"), (1, "a2", 4, "upsert")],
            "id long, val string, lsn long, op string",
        )
    )
    out = rep.sync(src)
    assert not out["skipped"]
    assert [f.name for f in rep.table.schema.fields] == ["id", "val"]
    got = {r["id"]: r["val"] for r in rep.read().collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}
    # idempotent re-sync
    again = rep.sync(src)
    assert again["skipped"]


def test_replicator_propagates_swap_rename(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake.replicate import TableReplicator

    src = _mk(spark, tmp_path, "swap_src", write_changes="true")
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    rep = TableReplicator.create(spark, str(tmp_path / "swap_dst"), src)
    # swap v <-> n through a temp (a rename CYCLE between syncs)
    src.rename_column("v", "tmpx")
    src.rename_column("n", "v")
    src.rename_column("tmpx", "n")
    src.merge(
        spark.createDataFrame(
            [(2, "bb", 22, 2, "upsert")],
            "k long, n string, v long, lsn long, op string",
        )
    )
    rep.sync(src)
    assert [f.name for f in rep.table.schema.fields] == ["k", "n", "v"]
    got = {r["k"]: (r["n"], r["v"]) for r in rep.read().collect()}
    assert got == {1: ("a", 10), 2: ("bb", 22)}


def test_incremental_view_fails_actionably_after_rename(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake.incremental import IncrementalAggView

    src = _mk(spark, tmp_path, "iv_src", write_changes="true")
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    view = IncrementalAggView.create(
        spark, str(tmp_path / "iv"), src, group_cols=["v"], sum_cols=["n"]
    )
    src.rename_column("v", "val")
    src.merge(
        spark.createDataFrame(
            [(2, "b", 20, 2, "upsert")],
            "k long, val string, n long, lsn long, op string",
        )
    )
    with pytest.raises(ValueError, match="renamed or dropped"):
        view.refresh(src)
