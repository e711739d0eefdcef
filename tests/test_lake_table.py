import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable, SchemaEvolutionError
from cdm_cbioportal_etl_spark.cdc import REPOS_SCHEMA


def _mk(spark, tmp_path, n_buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / "t"), REPOS_SCHEMA, ["repo", "path"], n_buckets=n_buckets
    )


def _batch(spark, rows):
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            *REPOS_SCHEMA.fields,
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_create_read_empty(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.read().count() == 0
    assert t.read().columns == ["repo", "path", "commit", "lang", "content"]


def test_merge_upsert_delete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b1 = _batch(
        spark,
        [
            (1, "insert", "r1", "a.py", "c1", "python", "v1"),
            (2, "insert", "r1", "b.py", "c2", "python", "v1"),
            (3, "update", "r1", "a.py", "c3", "python", "v2"),
        ],
    )
    s = t.merge(b1)
    assert s.batch_keys == 2 and s.deletes == 0
    got = {(r.repo, r.path): r.content for r in t.read().collect()}
    assert got == {("r1", "a.py"): "v2", ("r1", "b.py"): "v1"}

    b2 = _batch(
        spark,
        [
            (4, "delete", "r1", "b.py", None, None, None),
            (5, "update", "r1", "a.py", "c4", "python", "v3"),
        ],
    )
    t.merge(b2)
    got = {(r.repo, r.path): r.content for r in t.read().collect()}
    assert got == {("r1", "a.py"): "v3"}
    assert t.row_count() == 1


def test_merge_latest_lsn_wins_out_of_order(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # shuffled delivery within a batch: lsn order must win, not row order
    b = _batch(
        spark,
        [
            (9, "update", "r", "p", "c9", "go", "late"),
            (3, "insert", "r", "p", "c3", "go", "early"),
            (7, "update", "r", "p", "c7", "go", "mid"),
        ],
    )
    t.merge(b)
    assert t.read().collect()[0].content == "late"


def test_merge_exactly_once_replay(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b1 = _batch(spark, [(1, "insert", "r", "p", "c1", "md", "x")])
    t.merge(b1)
    v_before = t.snapshot["version"]
    # at-least-once: full redelivery of the same batch is a no-op
    # (count_batch=True: exact skip accounting needs the batch count pass)
    s = t.merge(b1, count_batch=True)
    assert s.skipped_already_applied == 1 and s.batch_keys == 0
    assert t.snapshot["version"] == v_before
    assert t.read().count() == 1


def test_merge_prunes_untouched_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=16)
    rows = [(i, "insert", f"r{i}", f"p{i}.py", f"c{i}", "rust", f"v{i}") for i in range(50)]
    t.merge(_batch(spark, rows))
    files_before = dict(t.snapshot["buckets"])
    # single-key update must rewrite only that key's bucket
    s = t.merge(_batch(spark, [(100, "update", "r0", "p0.py", "cX", "rust", "vX")]))
    assert s.touched_buckets == 1
    changed = [
        b for b in t.snapshot["buckets"]
        if t.snapshot["buckets"][b] != files_before.get(b)
    ]
    assert len(changed) == 1


def test_commit_atomicity_crash_before_pointer(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "insert", "r", "p", "c1", "md", "x")]))
    # simulate a crashed writer: manifest exists but VERSION not swung
    snap = dict(t.snapshot)
    snap["version"] += 1
    import json

    with open(os.path.join(t._meta_dir, f"snap-{snap['version']:08d}.json"), "w") as fh:
        json.dump(snap, fh)
    t2 = LakeTable(spark, t.root)
    assert t2.snapshot["version"] == 1  # readers still see committed state
    assert t2.read().count() == 1


def test_schema_evolution_add_and_widen(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_batch(spark, [(1, "insert", "r", "p", "c1", "md", "x")]))
    new = T.StructType(
        list(REPOS_SCHEMA.fields) + [T.StructField("license", T.StringType())]
    )
    assert t.evolve_schema(new) is True
    # old files readable, new column null-filled
    row = t.read().collect()[0]
    assert row.license is None
    # merge a batch carrying the new column
    schema = T.StructType(
        [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
        + list(new.fields)
    )
    b = spark.createDataFrame([(2, "update", "r", "p", "c2", "md", "y", "MIT")], schema)
    t.merge(b)
    row = t.read().collect()[0]
    assert row.license == "MIT" and row.content == "y"


def test_schema_evolution_rejects_drop_and_narrow(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(SchemaEvolutionError):
        t.evolve_schema(T.StructType(REPOS_SCHEMA.fields[:-1]))
    bad = T.StructType(
        [
            T.StructField("repo", T.IntegerType()),
            *REPOS_SCHEMA.fields[1:],
        ]
    )
    with pytest.raises(SchemaEvolutionError):
        t.evolve_schema(bad)


def test_overwrite(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = spark.createDataFrame(
        [("r", "p", "c", "md", "x"), ("r", "q", "c", "md", "y")], REPOS_SCHEMA
    )
    t.overwrite(df, lsn=10)
    assert t.read().count() == 2
    assert t.snapshot["ledger"]["applied_lsn"] == 10


def test_time_travel_compact_vacuum(spark, tmp_path):
    from pyspark.sql import types as T, functions as F
    from cdm_cbioportal_etl_spark.lake import LakeTable

    schema = T.StructType([
        T.StructField("k", T.StringType()), T.StructField("v", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "tt"), schema, ["k"], n_buckets=4)
    mk = lambda rows, lsn0: spark.createDataFrame(
        [(i + lsn0, "update", k, v) for i, (k, v) in enumerate(rows)],
        "lsn long, op string, k string, v string",
    )
    t.merge(mk([("a", "1"), ("b", "1")], 0), count_batch=False)
    v1 = t.snapshot["version"]
    t.merge(mk([("a", "2"), ("c", "1")], 10), count_batch=False)

    # time travel: old version still shows the old state
    cur = {(r.k, r.v) for r in t.read().collect()}
    old = {(r.k, r.v) for r in t.read(version=v1).collect()}
    assert cur == {("a", "2"), ("b", "1"), ("c", "1")}
    assert old == {("a", "1"), ("b", "1")}

    # compaction: merge buckets' file lists down to 1 file, same data
    import os
    n = t.compact(max_files_per_bucket=1)
    assert {(r.k, r.v) for r in t.read().collect()} == cur
    assert all(len(f) <= 1 for f in t.snapshot["buckets"].values())
    assert t.row_count() == 3

    # vacuum respects RETAINED snapshots: with all manifests kept,
    # nothing is reclaimable (time travel must survive)...
    assert t.vacuum() == 0
    assert {(r.k, r.v) for r in t.read(version=v1).collect()} == old
    # ...after expiring history, superseded files become orphans
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum()
    assert removed > 0
    assert {(r.k, r.v) for r in t.read().collect()} == cur


def test_crash_between_write_and_commit_is_recoverable(spark, tmp_path):
    """Files written but VERSION pointer not swung (crash mid-commit):
    readers still see the old snapshot; re-running the merge succeeds and
    vacuum removes the orphaned files."""
    from pyspark.sql import types as T
    from cdm_cbioportal_etl_spark.lake import LakeTable
    import cdm_cbioportal_etl_spark.lake.table as lt

    schema = T.StructType([
        T.StructField("k", T.StringType()), T.StructField("v", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "crash"), schema, ["k"], n_buckets=4)
    mk = lambda rows, lsn0: spark.createDataFrame(
        [(i + lsn0, "update", k, v) for i, (k, v) in enumerate(rows)],
        "lsn long, op string, k string, v string",
    )
    t.merge(mk([("a", "1")], 0), count_batch=False)

    orig_commit = LakeTable._commit
    calls = {"n": 0}

    def exploding_commit(self, snap):
        calls["n"] += 1
        raise RuntimeError("simulated crash before pointer swap")

    LakeTable._commit = exploding_commit
    try:
        try:
            t.merge(mk([("a", "2"), ("b", "1")], 10), count_batch=False)
        except RuntimeError:
            pass
    finally:
        LakeTable._commit = orig_commit
    assert calls["n"] == 1
    # table still serves the LAST COMMITTED snapshot
    t2 = LakeTable(spark, str(tmp_path / "crash"))
    assert {(r.k, r.v) for r in t2.read().collect()} == {("a", "1")}
    # retry applies cleanly (ledger untouched by the failed attempt)
    t2.merge(mk([("a", "2"), ("b", "1")], 10), count_batch=False)
    assert {(r.k, r.v) for r in t2.read().collect()} == {("a", "2"), ("b", "1")}
    # the crashed attempt's files are orphans -> vacuum removes them
    assert t2.vacuum() > 0
    assert {(r.k, r.v) for r in t2.read().collect()} == {("a", "2"), ("b", "1")}


def test_snapshot_isolation_for_concurrent_reader(spark, tmp_path):
    """A DataFrame planned before a merge keeps reading its snapshot's
    files after the merge commits (COW: old files are never mutated)."""
    from pyspark.sql import types as T
    from cdm_cbioportal_etl_spark.lake import LakeTable

    schema = T.StructType([
        T.StructField("k", T.StringType()), T.StructField("v", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "iso"), schema, ["k"], n_buckets=4)
    mk = lambda rows, lsn0: spark.createDataFrame(
        [(i + lsn0, "update", k, v) for i, (k, v) in enumerate(rows)],
        "lsn long, op string, k string, v string",
    )
    t.merge(mk([("a", "1"), ("b", "1")], 0), count_batch=False)
    reader = t.read()  # plan pinned to snapshot v
    t.merge(mk([("a", "2")], 10), count_batch=False)
    assert {(r.k, r.v) for r in reader.collect()} == {("a", "1"), ("b", "1")}
    assert {(r.k, r.v) for r in t.read().collect()} == {("a", "2"), ("b", "1")}


def test_expire_snapshots(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for i in range(6):
        t.merge(_batch(spark, [(i + 1, "update", "r", "p", f"c{i}", "md", f"v{i}")]))
    import os
    meta = os.path.join(str(tmp_path / "t"), "_meta")
    n_before = len([f for f in os.listdir(meta) if f.startswith("snap-")])
    removed = t.expire_snapshots(keep_last=2)
    assert removed == n_before - 2
    # current snapshot still readable; expired version is gone
    assert t.read().count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no snapshot"):
        t.snapshot_at(0)


def test_null_key_rows_latest_wins_both_strategies(spark, tmp_path):
    """NULL key values must follow latest-LSN-wins like any other key:
    broadcast path must not drop them (null-rejecting equi-join) and the
    resolve must REPLACE, not duplicate (review finding; eqNullSafe)."""
    for strat in ("broadcast", "shuffle"):
        t = LakeTable.create(
            spark, str(tmp_path / f"nk-{strat}"), REPOS_SCHEMA,
            ["repo", "path"], n_buckets=4,
        )
        b1 = _batch(spark, [
            (1, "insert", "r", None, "c1", "md", "x"),
            (2, "update", "r", None, "c2", "md", "y"),
            (3, "insert", "r", "p", "c3", "md", "z"),
        ])
        t.merge(b1, strategy=strat)
        got = {(r.repo, r.path): r.content for r in t.read().collect()}
        assert got == {("r", None): "y", ("r", "p"): "z"}, strat
        # second batch replaces the null-key row (no duplicate)
        t.merge(_batch(spark, [(4, "update", "r", None, "c4", "md", "w")]),
                strategy=strat)
        rows = t.read().collect()
        got = {(r.repo, r.path): r.content for r in rows}
        assert len(rows) == 2 and got[("r", None)] == "w", strat
