"""Partial-image merge (Debezium/Postgres-TOAST shape): NULL non-key
columns on an upsert mean "unchanged" and inherit the previous value —
within the batch (latest non-null per column) and from the existing
table row — while a delete logically re-creates the row (no inheritance
through it)."""

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


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "pt"), SCHEMA, ["k"], n_buckets=4
    )


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def _state(table):
    return {r["k"]: (r["a"], r["b"], r["c"]) for r in table.read().collect()}


def test_partial_update_inherits_from_table_and_batch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(
        spark.createDataFrame([(1, "a1", 10, "c1"), (2, "a2", 20, "c2")], SCHEMA)
    )
    # k=1: two partial images — later b=11 (a,c unchanged), earlier a="A1"
    # k=2: single partial image touching only c
    # k=3: brand-new key inserted with a partial image (b unknown -> null)
    t.merge(
        _ev(
            spark,
            [
                (101, "upsert", 1, "A1", None, None),
                (102, "upsert", 1, None, 11, None),
                (103, "upsert", 2, None, None, "C2"),
                (104, "upsert", 3, "a3", None, "c3"),
            ],
        ),
        partial_update=True,
    )
    assert _state(t) == {
        1: ("A1", 11, "c1"),  # a from lsn 101, b from 102, c inherited
        2: ("a2", 20, "C2"),
        3: ("a3", None, "c3"),
    }


def test_partial_update_delete_blocks_inheritance(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "old", 1, "keepme")], SCHEMA))
    # upsert before the delete must NOT leak through it; upsert after the
    # delete re-creates the row with ONLY its own columns
    t.merge(
        _ev(
            spark,
            [
                (201, "upsert", 1, "leaky", 99, None),
                (202, "delete", 1, None, None, None),
                (203, "upsert", 1, None, 7, None),
            ],
        ),
        partial_update=True,
    )
    assert _state(t) == {1: (None, 7, None)}


def test_partial_update_trailing_delete_removes_row(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "x", 1, "y"), (2, "p", 2, "q")], SCHEMA))
    t.merge(
        _ev(
            spark,
            [
                (301, "upsert", 1, "z", None, None),
                (302, "delete", 1, None, None, None),
            ],
        ),
        partial_update=True,
    )
    assert _state(t) == {2: ("p", 2, "q")}


def test_partial_update_idempotent_and_cross_batch(spark, tmp_path):
    t = _mk(spark, tmp_path)
    batch1 = _ev(spark, [(401, "upsert", 1, "a1", 10, "c1")])
    batch2 = _ev(spark, [(402, "upsert", 1, None, 11, None)])
    t.merge(batch1, partial_update=True)
    t.merge(batch2, partial_update=True)
    assert _state(t) == {1: ("a1", 11, "c1")}  # cross-batch inheritance
    # redelivery of both batches is a ledger-filtered no-op
    rows = t.row_count()
    t.merge(batch1, partial_update=True)
    t.merge(batch2, partial_update=True)
    assert _state(t) == {1: ("a1", 11, "c1")}
    assert t.row_count() == rows


def test_partial_update_rejects_mor(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="partial_updates=true"):
        t.merge(
            _ev(spark, [(1, "upsert", 1, "a", 1, "c")]),
            partial_update=True,
            mode="mor",
        )


def test_partial_update_equals_full_history_fold(spark, tmp_path):
    """Replaying the same partial-image WAL in 1 batch vs 3 batches gives
    identical state — the composition property the catalog oracle relies
    on (per-column latest non-null after the last delete, over the whole
    history)."""
    rows = []
    for i in range(300):
        k = i % 17
        op = "delete" if i % 29 == 28 else "upsert"
        rows.append(
            (
                1000 + i,
                op,
                k,
                f"a{i}" if i % 3 == 0 else None,
                i if i % 3 == 1 else None,
                f"c{i}" if i % 3 == 2 else None,
            )
        )
    ev = _ev(spark, rows)
    t1 = LakeTable.create(spark, str(tmp_path / "one"), SCHEMA, ["k"], n_buckets=4)
    t1.merge(ev, partial_update=True)
    t3 = LakeTable.create(spark, str(tmp_path / "three"), SCHEMA, ["k"], n_buckets=4)
    for lo, hi in [(1000, 1100), (1100, 1200), (1200, 1300)]:
        t3.merge(
            ev.filter((ev.lsn >= lo) & (ev.lsn < hi)), partial_update=True
        )
    assert _state(t1) == _state(t3)


def test_partial_update_through_streaming_wal(spark, tmp_path):
    """A Debezium-shaped stream (partial update images) through the
    WAL-tail reader with merge_kwargs={'partial_update': True}: per-epoch
    merges inherit unchanged columns exactly like the batch path."""
    import os

    from cdm_cbioportal_etl_spark.streaming import WalTailReader

    t = _mk(spark, tmp_path)
    t.overwrite(spark.createDataFrame([(1, "a1", 10, "c1")], SCHEMA))
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir, exist_ok=True)
    _ev(spark, [(501, "upsert", 1, None, 11, None)]).coalesce(1).write.parquet(
        os.path.join(wal_dir, "seg-0000")
    )
    _ev(
        spark,
        [(502, "upsert", 1, "A1", None, None), (503, "upsert", 2, "a2", None, None)],
    ).coalesce(1).write.parquet(os.path.join(wal_dir, "seg-0001"))
    reader = WalTailReader(
        spark,
        os.path.join(wal_dir, "seg-*"),
        t,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        merge_kwargs={"partial_update": True},
    )
    reader.run_available_now()
    assert _state(t) == {1: ("A1", 11, "c1"), 2: ("a2", None, None)}


def _mk_mor(spark, tmp_path, name="mpt"):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        SCHEMA,
        ["k"],
        n_buckets=4,
        properties={"partial_updates": True, "merge_mode": "mor"},
    )


def test_partial_mor_matches_cow(spark, tmp_path):
    """partial_updates tables resolve partial MOR deltas per column at
    read time — final state must equal the COW partial path on the same
    batches."""
    batches = [
        _ev(spark, [(601, "upsert", 1, "a1", 10, "c1"), (602, "upsert", 2, "a2", None, None)]),
        _ev(spark, [(603, "upsert", 1, None, 11, None), (604, "delete", 2, None, None, None)]),
        _ev(spark, [(605, "upsert", 2, None, None, "C2"), (606, "upsert", 1, "A1", None, None)]),
    ]
    mor = _mk_mor(spark, tmp_path, "mor")
    cow = _mk(spark, tmp_path)
    for b in batches:
        mor.merge(b, partial_update=True)  # mode from table property
        cow.merge(b, partial_update=True, mode="cow")
    assert any(
        f.get("delta") for fs in mor.snapshot["buckets"].values() for f in fs
    )
    assert _state(mor) == _state(cow) == {
        1: ("A1", 11, "c1"),
        2: (None, None, "C2"),  # delete barred a2's inheritance
    }


def test_partial_mor_delete_barrier_across_batches(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    t.merge(_ev(spark, [(701, "upsert", 1, "old", 5, "keep")]), partial_update=True)
    t.merge(_ev(spark, [(702, "delete", 1, None, None, None)]), partial_update=True)
    t.merge(_ev(spark, [(703, "upsert", 1, None, 7, None)]), partial_update=True)
    assert _state(t) == {1: (None, 7, None)}


def test_partial_mor_reset_tombstone_within_batch(spark, tmp_path):
    """A delete BELOW surviving upserts in one batch materializes as an
    extra tombstone delta row — the read fold must not inherit through
    it, even though the winner row is an upsert."""
    t = _mk_mor(spark, tmp_path)
    t.merge(_ev(spark, [(801, "upsert", 1, "leaky", 99, "x")]), partial_update=True)
    t.merge(
        _ev(
            spark,
            [(802, "delete", 1, None, None, None), (803, "upsert", 1, None, 7, None)],
        ),
        partial_update=True,
    )
    assert _state(t) == {1: (None, 7, None)}


def test_partial_mor_compact_materializes_and_mode_gates(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    t.merge(_ev(spark, [(901, "upsert", 1, "a", None, None)]), partial_update=True)
    t.merge(_ev(spark, [(902, "upsert", 1, None, 2, None)]), partial_update=True)
    expect = _state(t)
    t.compact()
    assert not any(
        f.get("delta") for fs in t.snapshot["buckets"].values() for f in fs
    )
    assert _state(t) == expect == {1: ("a", 2, None)}
    # full-image MOR on a partial table is unsound -> raise
    with pytest.raises(ValueError, match="full images"):
        t.merge(_ev(spark, [(903, "upsert", 1, "z", None, None)]))
    # redelivery is a no-op
    rows = t.row_count()
    t.merge(_ev(spark, [(902, "upsert", 1, None, 2, None)]), partial_update=True)
    assert t.row_count() == rows and _state(t) == expect
