"""Per-file key Bloom filters: point-update COW carry + point lookups.

Range stats carry files only when the batch's key hull misses them;
interleaved generations (every file's key range spans the keyspace)
defeat ranges entirely.  Blooms must (a) carry the provably-key-free
files in that regime, (b) never change results (false positives read
more, never wrong), (c) drive metadata-pruned point lookups in both
merge modes.
"""

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)

_BATCH = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        *SCHEMA.fields,
    ]
)


def _mk(spark, tmp_path, name, **props):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, ["k"], n_buckets=2,
        properties=props or None,
    )


def _merge(t, rows):
    t.merge(t.spark.createDataFrame(rows, _BATCH))


def _interleaved_base(t):
    # two generations whose key ranges BOTH span the keyspace: range
    # stats can never separate them
    _merge(t, [(i, "upsert", f"k{i:04d}", "g1", i) for i in range(0, 400, 2)])
    _merge(t, [(400 + i, "upsert", f"k{i:04d}", "g2", i) for i in range(1, 400, 2)])


def test_blooms_attached_only_when_enabled(spark, tmp_path):
    t0 = _mk(spark, tmp_path, "nb")
    _merge(t0, [(1, "upsert", "k1", "a", 1)])
    assert not any(
        f.get("bloom") for fs in t0.snapshot["buckets"].values() for f in fs
    )
    t1 = _mk(spark, tmp_path, "wb", file_blooms=4096)
    _merge(t1, [(1, "upsert", "k1", "a", 1)])
    blooms = [
        f["bloom"] for fs in t1.snapshot["buckets"].values() for f in fs
    ]
    assert blooms and all(b["m"] == 4096 and b["k"] == 4 for b in blooms)


def test_point_update_carries_bloom_rejected_files(spark, tmp_path):
    """Interleaved generations + 3-key point update: ranges admit every
    file, blooms carry the generation that lacks the keys — and the
    final state is identical to the bloom-less table."""
    plain = _mk(spark, tmp_path, "plain")
    bloomed = _mk(spark, tmp_path, "bloomed", file_blooms=8192)
    for t in (plain, bloomed):
        _interleaved_base(t)
    batch = [
        (1000, "upsert", "k0001", "hot", 111),
        (1001, "upsert", "k0201", "hot", 222),
        (1002, "delete", "k0399", None, None),
    ]
    sp = plain.merge(plain.spark.createDataFrame(batch, _BATCH))
    sb = bloomed.merge(bloomed.spark.createDataFrame(batch, _BATCH))
    # ranges span everything → plain carries nothing; blooms carry the
    # even-key generation's files (none hold the 3 odd probe keys)
    assert sp.carried_files == 0
    assert sb.carried_files > 0
    state = lambda t: {tuple(r) for r in t.read().collect()}
    assert state(plain) == state(bloomed)
    assert ("k0001", "hot", 111) in state(bloomed)
    assert not any(r[0] == "k0399" for r in state(bloomed))


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_point_lookup_correct_and_pruned(spark, tmp_path, mode):
    t = _mk(
        spark, tmp_path, f"pl_{mode}", file_blooms=8192, merge_mode=mode
    )
    _interleaved_base(t)
    _merge(t, [(1000, "upsert", "k0001", "hot", 9), (1001, "delete", "k0002", None, None)])
    got = t.point_lookup({"k": "k0001"}).collect()
    assert [(r.k, r.grp, r.v) for r in got] == [("k0001", "hot", 9)]
    # tombstoned key resolves to nothing (MOR: tombstone bloom-admitted)
    assert t.point_lookup({"k": "k0002"}).count() == 0
    assert t.point_lookup({"k": "zzzz"}).count() == 0
    with pytest.raises(ValueError, match="every key column"):
        t.point_lookup({})


def test_compact_rebuilds_blooms_and_lookup_survives(spark, tmp_path):
    t = _mk(spark, tmp_path, "cb", file_blooms=4096, merge_mode="mor")
    _interleaved_base(t)
    _merge(t, [(1000, "upsert", "k0003", "hot", 7)])
    assert t.compact() > 0
    assert all(
        f.get("bloom") for fs in t.snapshot["buckets"].values() for f in fs
    )
    got = t.point_lookup({"k": "k0003"}).collect()
    assert [(r.grp, r.v) for r in got] == [("hot", 7)]


def test_probe_cap_disables_bloom_carry_for_large_batches(spark, tmp_path):
    """Past bloom_probe_keys the collect is skipped: no probe job, plain
    range behavior, still correct."""
    t = _mk(
        spark, tmp_path, "cap", file_blooms=4096, bloom_probe_keys=2
    )
    _interleaved_base(t)
    st = t.merge(
        t.spark.createDataFrame(
            [(1000 + i, "upsert", f"k{2*i+1:04d}", "hot", i) for i in range(5)],
            _BATCH,
        )
    )
    assert st.carried_files == 0  # 5 keys > cap of 2 → no bloom probing
    assert ("k0001", "hot", 0) in {tuple(r) for r in t.read().collect()}
