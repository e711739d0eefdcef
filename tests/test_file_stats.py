"""Per-file min/max column stats + stats-pruned reads (data skipping).

The manifest-side analogue of Iceberg's data-file stats: every written
parquet file records min/max for the table's stats columns (default keys
+ LSN); ``read(prune=...)`` skips files whose range cannot match.  The
invariant under test everywhere: pruning NEVER changes query results —
it only shrinks the file set; the caller's row filter does the rest.
"""

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.lake.table import LSN_COL


SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, tmp_path, n_buckets=4, **props):
    return LakeTable.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        ["k"],
        n_buckets=n_buckets,
        properties=props or None,
    )


def _rows(spark, lsn0, n, grp="a"):
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            *SCHEMA.fields,
        ]
    )
    return spark.createDataFrame(
        [(lsn0 + i, "upsert", f"k{i:03d}", grp, lsn0 + i) for i in range(n)],
        schema,
    )


def _all_files(table):
    return [f for files in table.snapshot["buckets"].values() for f in files]


def test_stats_recorded_on_write(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_rows(spark, 1, 40))
    files = _all_files(t)
    assert files
    for f in files:
        st = f.get("stats")
        assert st is not None
        assert set(st) == {"k", LSN_COL}
        lo, hi = st["k"]
        assert lo.startswith("k") and hi.startswith("k") and lo <= hi
        assert st[LSN_COL][0] >= 1 and st[LSN_COL][1] <= 40


def test_pruned_read_equals_filtered_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_rows(spark, 1, 40))
    want = {(r.k, r.v) for r in t.read().filter(F.col("k") == "k007").collect()}
    got = {
        (r.k, r.v)
        for r in t.read(prune={"k": "k007"}).filter(F.col("k") == "k007").collect()
    }
    assert got == want and len(got) == 1
    # range form, open bounds
    want = {r.k for r in t.read().filter(F.col("k") >= "k030").collect()}
    got = {
        r.k
        for r in t.read(prune={"k": ("k030", None)})
        .filter(F.col("k") >= "k030")
        .collect()
    }
    assert got == want and len(got) == 10


def test_prune_skips_files_by_lsn(spark, tmp_path):
    """Two merges; since-LSN pruning must admit strictly fewer files than
    the full scan plans (the incremental-read shape)."""
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.merge(_rows(spark, 1, 40))
    t.merge(_rows(spark, 101, 8))
    files = _all_files(t)
    admitted = [
        f for f in files if LakeTable._stats_admit(f, {LSN_COL: (101, None)})
    ]
    assert 0 < len(admitted) < len(files)
    # every admitted file really holds lsn >= 101 rows (delta files only)
    assert all(f["stats"][LSN_COL][1] >= 101 for f in admitted)


def test_prune_is_noop_for_nonkey_under_mor_deltas(spark, tmp_path):
    """A non-key column changes across versions: with delta files present,
    pruning on it must be disabled (stale-row resurrection hazard), so a
    pruned read equals the unpruned read exactly."""
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.merge(_rows(spark, 1, 10, grp="old"))
    t.merge(_rows(spark, 101, 10, grp="new"))  # same keys, grp flips
    base = {(r.k, r.grp) for r in t.read().collect()}
    pruned = {(r.k, r.grp) for r in t.read(prune={"grp": "old"}).collect()}
    assert pruned == base
    # and the filtered answer is empty — no stale 'old' version survives
    assert not t.read(prune={"grp": "old"}).filter(F.col("grp") == "old").count()


def test_nonkey_prune_sound_after_compact(spark, tmp_path):
    """compact() folds deltas into base files; with no deltas left,
    non-key pruning re-enables and stays result-identical."""
    t = _mk(spark, tmp_path, merge_mode="mor")
    t.merge(_rows(spark, 1, 10, grp="old"))
    t.merge(_rows(spark, 101, 10, grp="new"))
    t.compact(max_files_per_bucket=1)
    assert not any(f.get("delta") for f in _all_files(t))
    want = {r.k for r in t.read().filter(F.col("grp") == "new").collect()}
    got = {
        r.k
        for r in t.read(prune={"grp": "new"}).filter(F.col("grp") == "new").collect()
    }
    assert got == want and len(got) == 10


def test_stats_admit_missing_stats_is_conservative():
    assert LakeTable._stats_admit({}, {"k": "x"})
    assert LakeTable._stats_admit({"stats": {}}, {"k": ("a", "b")})
    assert not LakeTable._stats_admit({"stats": {"k": ["m", "p"]}}, {"k": "a"})
    assert LakeTable._stats_admit({"stats": {"k": ["m", "p"]}}, {"k": "n"})


def test_stats_cols_property_override(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t2"),
        SCHEMA,
        ["k"],
        n_buckets=2,
        properties={"stats_cols": "v"},
    )
    t.merge(_rows(spark, 1, 6))
    for f in _all_files(t):
        assert set(f.get("stats", {})) == {"v"}
