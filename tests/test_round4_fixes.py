"""Round-4 advisory fixes: LSN-tie agreement between COW and MOR partial
merges, stats_cols preservation through cluster_files, explicit lineage
operation stamps, and compact bin-packing with missing bucket_rows."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.LongType()),
        T.StructField("c", T.StringType()),
    ]
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        *SCHEMA.fields,
    ]
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _state(table):
    return {r["k"]: (r["a"], r["b"], r["c"]) for r in table.read().collect()}


def _mk(spark, tmp_path, name, **props):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=4,
        properties=props or None,
    )


# ------------------------------------------------------------------ #
# 1. same-LSN upsert+delete tie: COW and MOR partial merges must agree
#    (delete wins ties on both the write classification and the MOR
#    read fold)
# ------------------------------------------------------------------ #
def test_partial_lsn_tie_cow_matches_mor(spark, tmp_path):
    batch = [
        (100, "upsert", 1, "a1", 10, "c1"),
        # k=2: upsert and delete share LSN 200 — delete must win in BOTH
        # merge modes (previously COW kept an all-null row, MOR dropped it)
        (200, "upsert", 2, "a2", 20, "c2"),
        (200, "delete", 2, None, None, None),
    ]
    cow = _mk(spark, tmp_path, "cow", partial_updates=True)
    mor = _mk(spark, tmp_path, "mor", partial_updates=True, merge_mode="mor")
    cow.merge(_ev(spark, batch), partial_update=True, mode="cow")
    mor.merge(_ev(spark, batch), partial_update=True)
    assert _state(cow) == _state(mor) == {1: ("a1", 10, "c1")}


def test_partial_lsn_tie_delete_wins_on_existing_row(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", partial_updates=True)
    t.merge(_ev(spark, [(1, "upsert", 5, "old", 1, "x")]), partial_update=True)
    t.merge(
        _ev(
            spark,
            [(2, "delete", 5, None, None, None), (2, "upsert", 5, "new", None, None)],
        ),
        partial_update=True,
    )
    assert _state(t) == {}


# ------------------------------------------------------------------ #
# 2. cluster_files must UNION cluster columns into existing stats_cols,
#    not replace the property
# ------------------------------------------------------------------ #
def test_cluster_files_preserves_user_stats_cols(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "zs"), SCHEMA, ["k"], n_buckets=2,
        properties={"stats_cols": "k,_lsn,c"},
    )
    t.merge(_ev(spark, [(i, "upsert", i, f"a{i}", i * 2, f"c{i:03d}") for i in range(1, 41)]))
    t.cluster_files(["b"], target_files_per_bucket=2, n_bins=8)
    kept = t.snapshot["properties"]["stats_cols"].split(",")
    assert "c" in kept, "user-configured stats column dropped by cluster_files"
    assert "b" in kept and "k" in kept and "_lsn" in kept
    # and the per-file stats actually carry the preserved column
    stats_cols_seen = {
        c
        for fs in t.snapshot["buckets"].values()
        for f in fs
        for c in f.get("stats", {})
    }
    assert "c" in stats_cols_seen


# ------------------------------------------------------------------ #
# 3. history() reports the stamped operation, not a batch_id-prefix guess
# ------------------------------------------------------------------ #
def test_history_operation_ignores_misleading_batch_id(spark, tmp_path):
    t = _mk(spark, tmp_path, "h")
    t.merge(
        _ev(spark, [(1, "upsert", 1, "a", 1, "c")]),
        batch_id="compact-2026-08",  # a MERGE whose id looks like maintenance
    )
    t.compact(max_files_per_bucket=0)
    ops = {
        r["batch_id"]: r["operation"] for r in t.history().collect()
    }
    assert ops["compact-2026-08"] == "merge"
    assert any(v == "compact" for k, v in ops.items() if k != "compact-2026-08")


def test_history_operation_legacy_prefix_fallback(spark, tmp_path):
    t = _mk(spark, tmp_path, "hl")
    t.merge(_ev(spark, [(1, "upsert", 1, "a", 1, "c")]))
    # simulate a legacy lineage record written before the operation field
    snap = t.snapshot
    rec = dict(snap["lineage"][-1])
    rec.pop("operation", None)
    rec["batch_id"] = "rebucket-deadbeef"
    snap["lineage"].append(rec)
    ops = [r["operation"] for r in t.history().collect()]
    assert ops[-1] == "rebucket"


# ------------------------------------------------------------------ #
# 4. compact(target_file_rows) must not collapse to one partition when
#    bucket_rows is missing entries for the todo buckets
# ------------------------------------------------------------------ #
def test_compact_binpack_with_missing_bucket_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, "bp")
    rows = [(i, "upsert", i, f"a{i}", i, "c") for i in range(1, 401)]
    for lo in range(0, 400, 100):
        t.merge(_ev(spark, rows[lo:lo + 100]))
    # drop the row-count metadata (manifests written before row tracking);
    # the snapshot property caches in-memory, so compact() sees this
    t.snapshot.pop("bucket_rows", None)
    assert t._todo_rows(t.snapshot, set(range(4))) == 400
    n = t.compact(max_files_per_bucket=0, target_file_rows=50)
    assert n == 4
    files = [f for fs in t.snapshot["buckets"].values() for f in fs]
    # ~400 rows / 50 per file -> several files, NOT one giant one
    assert len(files) >= 4
    assert max(f.get("rows", 0) for f in files) <= 200
    assert _state(t) == {i: (f"a{i}", i, "c") for i in range(1, 401)}


# ------------------------------------------------------------------ #
# 5. PNG codec: stdlib-zlib + numpy unfiltering, all five filter types
# ------------------------------------------------------------------ #
def test_png_roundtrip_all_filters():
    import numpy as np

    from cdm_cbioportal_etl_spark.text.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(16, 16, 3), (7, 5, 3), (1, 1, 3), (33, 17, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for cyc in (True, False):
            assert np.array_equal(decode_png(encode_png(img, cycle_filters=cyc)), img)


def test_png_rejects_unsupported():
    import numpy as np
    import pytest as _pt

    from cdm_cbioportal_etl_spark.text.multimodal import decode_png, encode_png

    with _pt.raises(ValueError):
        decode_png(b"not a png")
    # corrupt the IHDR color type -> NotImplementedError (honest plug point)
    payload = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    payload[8 + 4 + 4 + 9] = 6  # color type RGBA
    with _pt.raises(NotImplementedError):
        decode_png(bytes(payload))


def test_png_decode_features_end_to_end(spark):
    import numpy as np

    from cdm_cbioportal_etl_spark.text.multimodal import (
        decode_features,
        synth_png_media,
    )

    ids = spark.range(6).withColumnRenamed("id", "media_id")
    rows = {r["media_id"]: r for r in decode_features(synth_png_media(ids)).collect()}
    assert len(rows) == 6
    y, x, c = np.ogrid[0:16, 0:16, 0:3]
    for mid, r in rows.items():
        img = (mid * 29 + x * 7 + y * 11 + c * 13) % 256
        means = img.reshape(-1, 3).sum(axis=0) / 256.0
        assert (r["dim_x"], r["dim_y"]) == (16, 16)
        assert abs(r["f1"] - means[0]) < 1e-9
        assert abs(r["f2"] - means[1]) < 1e-9
        assert abs(r["f3"] - means[2]) < 1e-9
