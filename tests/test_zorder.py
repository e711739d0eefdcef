"""Z-order clustering rewrite (cluster_files) + secondary-column skipping.

The invariant everywhere: clustering NEVER changes table state — it only
reorders rows across files so that per-file min/max stats on the cluster
columns become selective.  Effectiveness is asserted by counting admitted
files via ``files_admitted`` before vs after the rewrite.
"""

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)

LANGS = ["ada", "c", "go", "hs", "js", "lua", "ml", "py", "rb", "rs"]


def _mk(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "zt"), SCHEMA, ["k"], n_buckets=n_buckets
    )


def _data(spark, n=4000):
    # x/y/lang are hash-scattered relative to the key, so key-sorted files
    # have full-domain x/y/lang ranges (the worst case z-order fixes)
    rows = [
        (i, (i * 37) % 100, (i * 61) % 100, LANGS[(i * 13) % len(LANGS)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _state(table):
    return sorted(tuple(r) for r in table.read().collect())


def test_zorder_preserves_state_and_prunes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_data(spark))
    before_state = _state(t)
    adm0, tot0 = t.files_admitted({"x": (10, 14)})
    assert adm0 == tot0  # x is not a stats column yet: nothing skips

    v = t.cluster_files(["x", "y"], target_files_per_bucket=8, n_bins=32)
    assert v == t.snapshot["version"]
    assert _state(t) == before_state

    adm1, tot1 = t.files_admitted({"x": (10, 14)})
    assert tot1 >= 8  # the rewrite actually produced multiple files
    assert adm1 < tot1, "z-ordered files should skip for a tight x range"
    # both cluster dimensions prune (that's the z-curve vs plain sort)
    adm_y, _ = t.files_admitted({"y": (90, 95)})
    assert adm_y < tot1
    # pruned read + row filter is exact
    got = sorted(
        tuple(r)
        for r in t.read(prune={"x": (10, 14)})
        .filter(F.col("x").between(10, 14))
        .collect()
    )
    want = sorted(r for r in before_state if 10 <= r[1] <= 14)
    assert got == want


def test_zorder_string_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_data(spark))
    before = _state(t)
    t.cluster_files(["lang"], target_files_per_bucket=8, n_bins=16)
    assert _state(t) == before
    adm, tot = t.files_admitted({"lang": "py"})
    assert adm < tot
    got = sorted(
        tuple(r)
        for r in t.read(prune={"lang": "py"}).filter(F.col("lang") == "py").collect()
    )
    assert got == sorted(r for r in before if r[3] == "py")


def test_zorder_folds_mor_deltas_and_stats_survive_merges(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_data(spark))
    # MOR merge stacks delta files on top
    ev = spark.createDataFrame(
        [(100 + i, "upsert", i, 999, 999, "zz") for i in range(50)],
        T.StructType(
            [
                T.StructField("lsn", T.LongType()),
                T.StructField("op", T.StringType()),
                *SCHEMA.fields,
            ]
        ),
    )
    t.merge(ev, mode="mor")
    assert any(f.get("delta") for fs in t.snapshot["buckets"].values() for f in fs)
    expect = _state(t)
    t.cluster_files(["x"], target_files_per_bucket=4)
    # deltas folded; resolved state identical
    assert not any(
        f.get("delta") for fs in t.snapshot["buckets"].values() for f in fs
    )
    assert _state(t) == expect
    # later merges keep recording x stats (property persisted), so pruning
    # stays correct — and the z-ordered survivors still skip
    ev2 = spark.createDataFrame(
        [(200 + i, "upsert", 10_000 + i, 5, 5, "c") for i in range(20)],
        ev.schema,
    )
    t.merge(ev2)
    got = sorted(
        tuple(r)
        for r in t.read(prune={"x": (999, 999)})
        .filter(F.col("x") == 999)
        .collect()
    )
    assert got == sorted(r for r in _state(t) if r[1] == 999)


def test_zorder_validation_and_single_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(_data(spark, n=500))
    with pytest.raises(ValueError):
        t.cluster_files([])
    with pytest.raises(ValueError):
        t.cluster_files(["nope"])
    with pytest.raises(ValueError):
        t.cluster_files(["x"], n_bins=1)
    before = _state(t)
    t.cluster_files(["x"])  # single column = plain sort clustering
    assert _state(t) == before


def test_zorder_mor_prune_soundness_after_new_deltas(spark, tmp_path):
    """After z-order, a NEW MOR delta changing x must disable non-key
    pruning (files_admitted applies the same key-only rule as read)."""
    t = _mk(spark, tmp_path)
    t.overwrite(_data(spark))
    t.cluster_files(["x"], target_files_per_bucket=4)
    adm, tot = t.files_admitted({"x": (10, 14)})
    assert adm < tot
    ev = spark.createDataFrame(
        [(500, "upsert", 7, 10, 0, "c")],  # key 7 moves INTO the x range
        T.StructType(
            [
                T.StructField("lsn", T.LongType()),
                T.StructField("op", T.StringType()),
                *SCHEMA.fields,
            ]
        ),
    )
    t.merge(ev, mode="mor")
    adm2, tot2 = t.files_admitted({"x": (10, 14)})
    assert adm2 == tot2  # deltas present: x pruning suspended (sound)
    got = sorted(
        tuple(r)
        for r in t.read(prune={"x": (10, 14)})
        .filter(F.col("x").between(10, 14))
        .collect()
    )
    assert (7, 10, 0, "c") in got


def test_compact_binpack_target_file_rows(spark, tmp_path):
    """Bin-packing compaction: files hold ~target rows, key-sorted and
    key-contiguous (range partitioned), state unchanged."""
    t = _mk(spark, tmp_path, n_buckets=2)
    t.overwrite(_data(spark, n=3000))
    # pile up extra files so both buckets qualify for compaction
    ev = spark.createDataFrame(
        [(100 + i, "upsert", 10_000 + i, 1, 2, "c") for i in range(200)],
        T.StructType(
            [
                T.StructField("lsn", T.LongType()),
                T.StructField("op", T.StringType()),
                *SCHEMA.fields,
            ]
        ),
    )
    t.merge(ev)
    before = _state(t)
    t.compact(max_files_per_bucket=0, target_file_rows=400)
    assert _state(t) == before
    files = [f for fs in t.snapshot["buckets"].values() for f in fs]
    assert len(files) >= 6  # 3200 rows / 400 -> ~8 files, not 2
    # every file respects the target within partition-boundary slack
    assert max(f["rows"] for f in files) <= 2 * 400
    # key-range skipping works within a bucket after binpack: a tight
    # key range admits strictly fewer files than exist
    adm, tot = t.files_admitted({"k": (0, 99)})
    assert adm < tot


def test_compact_preserves_zorder_clustering(spark, tmp_path):
    """Maintenance must not undo the clustering: after cluster_files, a
    compact() (here folding MOR deltas) re-sorts rewritten buckets along
    the recorded curve — multiple files per bucket, secondary-column
    skipping still effective."""
    t = _mk(spark, tmp_path)
    t.overwrite(_data(spark))
    t.cluster_files(["x", "y"], target_files_per_bucket=8, n_bins=32)
    ev = spark.createDataFrame(
        [(100 + i, "upsert", i, 50, 50, "zz") for i in range(30)],
        T.StructType(
            [
                T.StructField("lsn", T.LongType()),
                T.StructField("op", T.StringType()),
                *SCHEMA.fields,
            ]
        ),
    )
    t.merge(ev, mode="mor")
    expect = _state(t)
    t.compact()  # folds deltas; must re-apply the recorded z-order
    assert _state(t) == expect
    files = [f for fs in t.snapshot["buckets"].values() for f in fs]
    assert len(files) > t.snapshot["n_buckets"]  # not folded to 1/bucket
    adm, tot = t.files_admitted({"x": (10, 14)})
    assert adm < tot, "secondary-column skipping must survive compaction"
