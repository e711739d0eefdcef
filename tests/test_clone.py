"""Shallow/deep table CLONE + localize (Delta CREATE TABLE ... CLONE).

The CDC-engine fork primitive: shallow clone is a metadata-only commit
whose genesis manifest references the source's files by absolute path
(zero bytes copied); the clone diverges independently, its vacuum can
never touch source files (it only walks its own root), and ``localize``
(or ``mode="deep"``) copies the referenced bytes over to decouple from
source retention.  The LSN ledger is carried, so replaying an
already-applied WAL batch into the clone stays exactly-once.
"""

import os
import shutil

import pytest
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable


def _mk(spark, tmp_path, name="src", **props):
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


def _state(t, version=None):
    return {
        r["k"]: (r["v"], r["n"]) for r in t.read(version=version).collect()
    }


def test_shallow_clone_reads_equal_and_zero_copy(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")]))
    src.merge(_batch(spark, [(3, "c", 30, 3, "upsert"), (1, None, 0, 4, "delete")]))
    c = src.clone(str(tmp_path / "c1"))
    assert _state(c) == _state(src) == {2: ("b", 20), 3: ("c", 30)}
    # metadata-only: the clone's data dir holds no parquet at all
    data_files = [
        fn
        for _, _, fns in os.walk(os.path.join(c.root, "data"))
        for fn in fns
        if fn.endswith(".parquet")
    ]
    assert data_files == []
    assert c.history().collect()[-1]["operation"] == "clone"


def test_clone_at_version_time_travels(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    v1 = src.snapshot["version"]
    src.merge(_batch(spark, [(2, "b", 20, 2, "upsert")]))
    c = src.clone(str(tmp_path / "c2"), version=v1)
    assert _state(c) == {1: ("a", 10)}


def test_clone_diverges_both_ways(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    c = src.clone(str(tmp_path / "c3"))
    c.merge(_batch(spark, [(2, "clone-only", 2, 2, "upsert")]))
    src.merge(_batch(spark, [(3, "src-only", 3, 2, "upsert")]))
    assert _state(c) == {1: ("a", 10), 2: ("clone-only", 2)}
    assert _state(src) == {1: ("a", 10), 3: ("src-only", 3)}


def test_clone_ledger_keeps_exactly_once(spark, tmp_path):
    src = _mk(spark, tmp_path)
    b = _batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")])
    src.merge(b)
    c = src.clone(str(tmp_path / "c4"))
    # redelivering the SAME already-applied batch must be a no-op
    before_v = c.snapshot["version"]
    stats = c.merge(b)
    assert stats.upserts == 0 and stats.deletes == 0
    assert stats.batch_keys == 0  # ledger filtered the whole batch out
    assert _state(c) == {1: ("a", 10), 2: ("b", 20)}
    # a genuinely new LSN still applies
    c.merge(_batch(spark, [(1, "a2", 11, 3, "upsert")]))
    assert _state(c)[1] == ("a2", 11)
    assert c.snapshot["version"] > before_v


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    c = src.clone(str(tmp_path / "c5"))
    # COW-update one key in the clone, expire + vacuum aggressively
    c.merge(_batch(spark, [(1, "a2", 11, 2, "upsert")]))
    c.expire_snapshots(keep_last=1)
    c.vacuum()
    assert _state(src) == {1: ("a", 10)}  # source files intact
    assert _state(c) == {1: ("a2", 11)}


def test_localize_then_source_deleted(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert"), (2, "b", 20, 2, "upsert")]))
    c = src.clone(str(tmp_path / "c6"))
    n = c.localize()
    assert n > 0
    assert c.localize() == 0  # idempotent
    # no absolute refs remain
    for files in c.snapshot["buckets"].values():
        for f in files:
            assert not os.path.isabs(f["path"])
    shutil.rmtree(src.root)
    assert _state(c) == {1: ("a", 10), 2: ("b", 20)}
    # time travel to the pre-localize genesis is honestly broken (its
    # manifest points at deleted source files) but the CURRENT state and
    # everything after localize survives source retirement
    assert c.history().collect()[-1]["operation"] == "localize"


def test_deep_clone_self_contained_from_birth(spark, tmp_path):
    src = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    c = src.clone(str(tmp_path / "c7"), mode="deep")
    shutil.rmtree(src.root)
    assert _state(c) == {1: ("a", 10)}
    for files in c.snapshot["buckets"].values():
        for f in files:
            assert not os.path.isabs(f["path"])


def test_clone_mor_with_dv_and_eqdel(spark, tmp_path):
    src = _mk(spark, tmp_path, name="mor_src", merge_mode="mor")
    src.merge(_batch(spark, [(i, f"v{i}", i, 1, "upsert") for i in range(8)]))
    src.merge(_batch(spark, [(3, "v3x", 33, 2, "upsert"), (5, None, 0, 2, "delete")]))
    # deletion-vector pass + an equality delete, then clone
    if hasattr(src, "merge_dv"):
        pass  # dv covered in its own suite; MOR deltas are the point here
    src.delete_where("k = 7")
    c = src.clone(str(tmp_path / "c8"))
    expected = _state(src)
    assert _state(c) == expected
    # deep variant folds identically, even after the source is retired
    d = src.clone(str(tmp_path / "c9"), mode="deep")
    shutil.rmtree(src.root)
    assert _state(d) == expected


def test_clone_of_renamed_table_and_clone_of_clone(spark, tmp_path):
    src = _mk(spark, tmp_path, name="ren_src")
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    src.rename_column("v", "val")
    c = src.clone(str(tmp_path / "c10"))
    assert [f.name for f in c.schema.fields] == ["k", "val", "n"]
    assert {r["k"]: r["val"] for r in c.read().collect()} == {1: "a"}
    # clone of a clone: absolute refs pass through join() untouched
    cc = c.clone(str(tmp_path / "c11"))
    assert {r["k"]: r["val"] for r in cc.read().collect()} == {1: "a"}
    # and localize on the grand-clone pulls from the ORIGINAL root
    assert cc.localize() > 0
    shutil.rmtree(src.root)
    shutil.rmtree(c.root)
    assert {r["k"]: r["val"] for r in cc.read().collect()} == {1: "a"}


def test_clone_rejects_existing_dest_and_bad_mode(spark, tmp_path):
    src = _mk(spark, tmp_path, name="rej_src")
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    src.clone(str(tmp_path / "c12"))
    with pytest.raises(ValueError, match="already exists"):
        src.clone(str(tmp_path / "c12"))
    with pytest.raises(ValueError, match="mode"):
        src.clone(str(tmp_path / "c13"), mode="sideways")


def test_sql_create_table_clone(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake import LakeSession

    src = _mk(spark, tmp_path, name="sql_src")
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    v1 = src.snapshot["version"]
    src.merge(_batch(spark, [(2, "b", 20, 2, "upsert")]))
    ls = LakeSession(spark)
    ls.register("src", src)
    c = ls.sql(
        f"CREATE TABLE fork CLONE src LOCATION '{tmp_path / 'sqlc'}'"
    )
    assert _state(c) == _state(src)
    # the new name is live in the session immediately
    assert {r["k"] for r in ls.sql("SELECT k FROM fork").collect()} == {1, 2}
    # deep + time-travel variant
    d = ls.sql(
        "CREATE TABLE fork2 DEEP CLONE src "
        f"VERSION AS OF {v1} LOCATION '{tmp_path / 'sqld'}'"
    )
    assert _state(d) == {1: ("a", 10)}
    shutil.rmtree(src.root)
    assert _state(d) == {1: ("a", 10)}  # deep = self-contained
    with pytest.raises(ValueError, match="CLONE"):
        ls.sql("CREATE TABLE x CLONE src")  # LOCATION is required


def test_clone_cdf_starts_at_genesis(spark, tmp_path):
    src = _mk(spark, tmp_path, name="cdf_src", write_changes="true")
    src.merge(_batch(spark, [(1, "a", 10, 1, "upsert")]))
    src.merge(_batch(spark, [(2, "b", 20, 2, "upsert")]))
    c = src.clone(str(tmp_path / "c14"))
    g = c.snapshot["version"]
    c.merge(_batch(spark, [(3, "c", 30, 3, "upsert")]))
    ch = c.table_changes(g, c.snapshot["version"]).collect()
    assert {r["k"] for r in ch} == {3}  # only post-clone commits feed CDF
