"""Sharded manifests (Iceberg manifest-list shape, opt-in).

With table property ``manifest_shards=N`` the per-snapshot file
inventory lives in N content-addressed shard files (bucket % N);
unchanged shards hash to the parent's files, so a commit's metadata
write is O(touched shards) instead of O(all live files) — the property
that keeps 10^10-event tables from rewriting a full inventory JSON on
every merge.  Readers (native, time travel, vacuum liveness, the
Python DataSource planner) resolve shards transparently.
"""

import json
import os
import shutil

from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable, register_lake_datasource

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mk(spark, tmp_path, name, **props):
    root = str(tmp_path / name)
    shutil.rmtree(root, ignore_errors=True)
    return LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], n_buckets=8,
        properties=props or None,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, lsn long, op string")


def _raw_snap(t, version):
    with open(
        os.path.join(t.root, "_meta", f"snap-{version:08d}.json")
    ) as fh:
        return json.load(fh)


def test_sharded_equals_inline_same_history(spark, tmp_path):
    hist = [
        [(i, "a", i, "upsert") for i in range(200)],
        [(i, "b", 300 + i, "upsert") for i in range(0, 60)]
        + [(i, None, 600 + i, "delete") for i in range(150, 170)],
    ]
    a = _mk(spark, tmp_path, "inline")
    b = _mk(spark, tmp_path, "sharded", manifest_shards=4)
    va_first = vb_first = None
    for h in hist:
        a.merge(_batch(spark, h))
        b.merge(_batch(spark, h))
        if va_first is None:
            va_first = a.snapshot["version"]
            vb_first = b.snapshot["version"]
    va = sorted(tuple(r) for r in a.read().collect())
    vb = sorted(tuple(r) for r in b.read().collect())
    assert va == vb
    assert a.logical_row_count() == b.logical_row_count() == 180
    # the sharded snapshot JSON carries refs, not the inventory
    raw = _raw_snap(b, b.snapshot["version"])
    assert "buckets" not in raw and len(raw["buckets_ref"]) == 4
    # time travel resolves shards of the older snapshot
    assert (
        b.read(version=vb_first).count()
        == a.read(version=va_first).count()
        == 200
    )


def test_commit_writes_only_touched_shards(spark, tmp_path):
    t = _mk(spark, tmp_path, "touch", manifest_shards=8)  # shard==bucket
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(64)]))
    base_ref = _raw_snap(t, t.snapshot["version"])["buckets_ref"]
    # one-key batch: exactly one bucket (= one shard) can change
    t.merge(_batch(spark, [(1, "z", 1000, "upsert")]))
    new_ref = _raw_snap(t, t.snapshot["version"])["buckets_ref"]
    changed = {s for s in new_ref if base_ref.get(s) != new_ref[s]}
    assert len(changed) == 1
    # content addressing: the 7 untouched shards reuse the SAME files
    assert sum(base_ref[s] == new_ref[s] for s in base_ref) == 7


def test_datasource_reads_sharded_manifests(spark, tmp_path):
    t = _mk(spark, tmp_path, "dshard", manifest_shards=3)
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(40)]))
    register_lake_datasource(spark)
    got = (
        spark.read.format("laketable").option("path", t.root).load()
    )
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        tuple(r) for r in t.read().collect()
    )
    files_md = (
        spark.read.format("laketable")
        .option("path", t.root)
        .option("metadata", "files")
        .load()
    )
    assert files_md.count() == t.files().count()


def test_expire_gcs_unreferenced_shards_keeps_retained(spark, tmp_path):
    # grace 0: the test wants immediate reclaim; production default 600s
    # additionally protects a stalled writer's not-yet-referenced shards
    t = _mk(spark, tmp_path, "gc", manifest_shards=2, shard_gc_grace_sec=0)
    for i in range(6):
        t.merge(_batch(spark, [(k, f"v{i}", i * 100 + k, "upsert")
                               for k in range(10)]))
    sdir = os.path.join(t.root, "_meta", "shards")
    before = set(os.listdir(sdir))
    t.expire_snapshots(keep_last=2)
    after = set(os.listdir(sdir))
    # retained manifests stay fully readable through their shards
    retained = sorted(
        int(f[5:13])
        for f in os.listdir(os.path.join(t.root, "_meta"))
        if f.startswith("snap-")
    )
    referenced = set()
    for v in retained:
        raw = _raw_snap(t, v)
        referenced.update(raw["buckets_ref"].values())
        assert t.read(version=v).count() == 10
    assert referenced <= after
    assert after < before  # expired-only shards were reclaimed
    # vacuum on the sharded table still sees the right liveness
    t.vacuum()
    assert t.read().count() == 10
    assert sorted(
        r["v"] for r in t.read().select("v").distinct().collect()
    ) == ["v5"]


def test_sharding_composes_with_branches_and_rollback(spark, tmp_path):
    t = _mk(spark, tmp_path, "branchy", manifest_shards=4)
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(30)]))
    v1 = t.snapshot["version"]
    t.create_branch("dev")
    dev = t.checkout("dev")
    dev.merge(_batch(spark, [(i, "dev", 100 + i, "upsert") for i in range(5)]))
    # branch commit wrote shards; both refs resolve independently
    assert {r["v"] for r in dev.read().select("v").distinct().collect()} == {
        "a", "dev"
    }
    assert {r["v"] for r in t.read().select("v").distinct().collect()} == {"a"}
    # main keeps moving, then rolls back — shard-referencing snapshots
    # stay readable and the rollback target resolves its shards
    t.merge(_batch(spark, [(0, "main2", 500, "upsert")]))
    t.rollback_to(v1)
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == sorted((i, "a") for i in range(30))


def test_set_properties_enables_sharding_mid_life(spark, tmp_path):
    """ALTER TABLE ... SET TBLPROPERTIES turns sharding on for an
    existing inline table; the next commit re-shards, a later flip-off
    goes back inline, and readers resolve every layout in the history."""
    import pytest
    from cdm_cbioportal_etl_spark.lake import LakeSession

    t = _mk(spark, tmp_path, "midlife")
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(20)]))
    v_inline = t.snapshot["version"]
    assert "buckets_ref" not in _raw_snap(t, v_inline)

    ls = LakeSession(spark)
    ls.register("t", t)
    ls.sql("ALTER TABLE t SET TBLPROPERTIES ('manifest_shards' = '4')")
    t.merge(_batch(spark, [(0, "b", 100, "upsert")]))
    raw = _raw_snap(t, t.snapshot["version"])
    assert "buckets" not in raw and len(raw["buckets_ref"]) == 4

    t.set_properties({"manifest_shards": 0})
    t.merge(_batch(spark, [(1, "c", 200, "upsert")]))
    raw2 = _raw_snap(t, t.snapshot["version"])
    assert "buckets" in raw2 and "buckets_ref" not in raw2
    # all three layouts readable; state correct end-to-end
    assert t.read(version=v_inline).count() == 20
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert (0, "b") in got and (1, "c") in got and len(got) == 20

    with pytest.raises(ValueError, match="fixed at table creation"):
        t.set_properties({"partial_updates": "true"})


def test_show_tblproperties(spark, tmp_path):
    from cdm_cbioportal_etl_spark.lake import LakeSession

    t = _mk(spark, tmp_path, "showp", manifest_shards=4)
    ls = LakeSession(spark)
    ls.register("t", t)
    got = {r["key"]: r["value"] for r in ls.sql("SHOW TBLPROPERTIES t").collect()}
    assert got.get("manifest_shards") == "4"
    ls.sql("ALTER TABLE t SET TBLPROPERTIES ('write_changes'='true')")
    got2 = {r["key"]: r["value"] for r in ls.sql("SHOW TBLPROPERTIES t").collect()}
    assert got2.get("write_changes") == "true"


def test_crashed_writer_orphan_shards_are_harmless_then_gcd(spark, tmp_path):
    """A writer that dies after writing shard files but before its
    manifest leaves content-addressed orphans: reads never see them
    (only referenced shards resolve), and expire_snapshots GCs them
    once a newer commit exists (the mtime guard keeps genuinely
    in-flight shards safe)."""
    import time as _time
    from cdm_cbioportal_etl_spark.lake.table import _write_manifest_shards

    t = _mk(spark, tmp_path, "crash", manifest_shards=2,
            shard_gc_grace_sec=0)
    t.merge(_batch(spark, [(i, "a", i, "upsert") for i in range(10)]))
    # simulate the crash: shards for a never-committed inventory
    _write_manifest_shards(
        t.root, {"0": [{"path": "data/zzz/0/fake.parquet", "rows": 1,
                        "schema_id": 0}]}, 2
    )
    sdir = os.path.join(t.root, "_meta", "shards")
    n_with_orphan = len(os.listdir(sdir))
    assert sorted(r["k"] for r in t.read().collect()) == list(range(10))
    _time.sleep(0.05)
    # a LATER commit makes the orphan strictly older than the newest
    # manifest -> reclaimable; referenced shards survive
    t.merge(_batch(spark, [(0, "b", 100, "upsert")]))
    t.expire_snapshots(keep_last=1)
    after = set(os.listdir(sdir))
    assert len(after) < n_with_orphan
    raw = _raw_snap(t, t.snapshot["version"])
    assert set(raw["buckets_ref"].values()) <= after
    assert t.read().count() == 10


def test_review_fixes_bad_props_grace_and_stream_guard(spark, tmp_path):
    import pytest
    from cdm_cbioportal_etl_spark.lake import LakeSession
    from cdm_cbioportal_etl_spark.lake.table import _write_manifest_shards

    t = _mk(spark, tmp_path, "fixes", manifest_shards=2)
    t.merge(_batch(spark, [(1, "a", 1, "upsert")]))
    ls = LakeSession(spark)
    ls.register("t", t)

    # (1) malformed numeric property fails the STATEMENT — no zero-byte
    # manifest is stranded, vacuum/expire keep working
    with pytest.raises(ValueError, match="non-negative int"):
        ls.sql("ALTER TABLE t SET TBLPROPERTIES ('manifest_shards'='8x')")
    t.vacuum()
    t.expire_snapshots(keep_last=5)

    # (2) TBLPROPERTIES item without '=' is a parse error, not k=''
    with pytest.raises(ValueError, match="expected 'key' = 'value'"):
        ls.sql("ALTER TABLE t SET TBLPROPERTIES ('write_changes')")

    # (3) default grace window protects a stalled writer's shards from
    # the expire-time GC even after newer commits land — while shards
    # referenced ONLY by just-expired manifests (provably from completed
    # commits) reclaim immediately, grace notwithstanding
    sdir = os.path.join(t.root, "_meta", "shards")
    pre = set(os.listdir(sdir))
    _write_manifest_shards(
        t.root, {"0": [{"path": "data/zz/0/f.parquet", "rows": 1,
                        "schema_id": 0}]}, 2
    )
    orphan = set(os.listdir(sdir)) - pre
    assert orphan  # the stalled writer's not-yet-referenced shard
    v1_refs = set(_raw_snap(t, t.snapshot["version"])["buckets_ref"].values())
    t.merge(_batch(spark, [(2, "b", 10, "upsert")]))
    v2_refs = set(_raw_snap(t, t.snapshot["version"])["buckets_ref"].values())
    t.expire_snapshots(keep_last=1)
    after = set(os.listdir(sdir))
    assert orphan <= after  # grace keeps the orphan
    assert v2_refs <= after  # retained refs intact
    assert not ((v1_refs - v2_refs) & after)  # expired-only: reclaimed now

    # (4) metadata tables are batch-only through the registry
    from cdm_cbioportal_etl_spark.lake import register_lake_datasource

    register_lake_datasource(spark)
    with pytest.raises(Exception, match="batch-only"):
        (
            spark.readStream.format("laketable")
            .option("path", t.root)
            .option("mode", "cdf")
            .option("metadata", "files")
            .load()
        )
