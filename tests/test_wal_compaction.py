"""WAL log compaction (Kafka compacted-topic semantics).

Contract (streaming/compaction.py): replaying compacted-prefix ∪ tail
through the exactly-once MERGE path equals replaying the full log —
for every merge mode — and tombstone dropping is bootstrap-sound.
"""

import os

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.streaming.compaction import (
    compact_log,
    compact_wal_prefix,
    compose_compacted_wal,
)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _gen_events(spark, n=4000, keys=300, seed=7):
    """Deterministic synthetic change stream with updates + deletes."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("lsn"),
            F.when(F.xxhash64("id", F.lit(seed)) % 10 == 0, F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
            F.concat(F.lit("r"), (F.xxhash64("id", F.lit(seed + 1)) % 6).cast("string")).alias(
                "repo"
            ),
            F.concat(
                F.lit("f"),
                F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(keys)).cast("string"),
            ).alias("path"),
            F.md5(F.col("id").cast("string")).alias("content"),
        )
    )


def _write_segments(df, wal_dir, n_segments=8):
    """LSN-contiguous segments, one parquet file each."""
    lo, hi = df.agg(F.min("lsn"), F.max("lsn")).collect()[0]
    step = (hi - lo + n_segments) // n_segments
    os.makedirs(wal_dir, exist_ok=True)
    for i in range(n_segments):
        seg = df.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        seg.coalesce(1).write.parquet(os.path.join(wal_dir, f"_tmp{i}"))
        tmp = os.path.join(wal_dir, f"_tmp{i}")
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(os.path.join(tmp, part), os.path.join(wal_dir, f"seg-{i:04d}.parquet"))
        import shutil

        shutil.rmtree(tmp)


def _final_state(table):
    return sorted(tuple(r) for r in table.read().select("repo", "path", "content").collect())


def _replay(spark, tmp_path, name, events, mode="cow"):
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), name), SCHEMA,
        key_cols=["repo", "path"], n_buckets=4,
    )
    t.merge(events, mode=mode)
    return t


@pytest.fixture(scope="module")
def wal(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wal"))
    ev = _gen_events(spark)
    _write_segments(ev, d)
    return d, ev


def test_compacted_prefix_plus_tail_replays_identically(spark, wal, tmp_path):
    wal_dir, ev = wal
    horizon = 2000
    out = os.path.join(str(tmp_path), "compacted")
    rep = compact_wal_prefix(
        spark, wal_dir, out, key_cols=["repo", "path"], upto_lsn=horizon
    )
    assert rep.events_out < rep.events_in  # it actually compacted
    assert rep.tombstones_out > 0  # deletes survive as tombstones
    composed = compose_compacted_wal(spark, wal_dir, out, rep.upto_lsn)
    full = _replay(spark, tmp_path, "full", ev)
    comp = _replay(spark, tmp_path, "comp", composed)
    assert _final_state(comp) == _final_state(full)


def test_segment_boundary_horizon(spark, wal, tmp_path):
    """The effective horizon snaps to covered segments: segments
    straddling the requested LSN stay in the tail, so no event is ever
    split across prefix and tail."""
    wal_dir, ev = wal
    out = os.path.join(str(tmp_path), "c2")
    rep = compact_wal_prefix(
        spark, wal_dir, out, key_cols=["repo", "path"], upto_lsn=1700
    )
    # only whole segments at or below 1700 compacted
    assert all(os.path.basename(s) < "seg-0004" for s in rep.segments_in)
    composed = compose_compacted_wal(spark, wal_dir, out, rep.upto_lsn)
    assert composed.count() == rep.events_out + ev.filter(
        F.col("lsn") >= 1500
    ).count()


def test_full_log_compaction_bootstrap_drop_tombstones(spark, wal, tmp_path):
    """Whole-log compaction with tombstones dropped bootstraps an empty
    table to the same final state (Kafka's post-retention shape)."""
    wal_dir, ev = wal
    out = os.path.join(str(tmp_path), "c3")
    rep = compact_wal_prefix(
        spark, wal_dir, out, key_cols=["repo", "path"], drop_tombstones=True
    )
    assert rep.tombstones_out == 0
    boot = _replay(spark, tmp_path, "boot", spark.read.parquet(out))
    full = _replay(spark, tmp_path, "full3", ev)
    assert _final_state(boot) == _final_state(full)
    # and the compacted log is exactly one event per surviving key
    assert rep.events_out == len(_final_state(full))


def test_compacted_replay_all_modes_agree(spark, wal, tmp_path):
    wal_dir, ev = wal
    out = os.path.join(str(tmp_path), "c4")
    rep = compact_wal_prefix(spark, wal_dir, out, key_cols=["repo", "path"], upto_lsn=2000)
    composed = compose_compacted_wal(spark, wal_dir, out, rep.upto_lsn)
    ref = _final_state(_replay(spark, tmp_path, "m_cow", composed, "cow"))
    for mode in ("mor", "dv"):
        got = _final_state(_replay(spark, tmp_path, f"m_{mode}", composed, mode))
        assert got == ref, mode


def test_compact_log_pure(spark):
    ev = _gen_events(spark, n=500, keys=40)
    last = compact_log(ev, ["repo", "path"])
    # one row per key, and it is the max-LSN event
    assert last.groupBy("repo", "path").count().filter(F.col("count") > 1).count() == 0
    expect = (
        ev.groupBy("repo", "path").agg(F.max("lsn").alias("lsn")).count()
    )
    assert last.count() == expect


def test_horizon_below_first_segment_raises(spark, wal, tmp_path):
    wal_dir, _ = wal
    with pytest.raises(ValueError, match="no segment"):
        compact_wal_prefix(
            spark, wal_dir, os.path.join(str(tmp_path), "c5"),
            key_cols=["repo", "path"], upto_lsn=10,
        )
