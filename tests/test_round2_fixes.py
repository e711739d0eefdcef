"""Round-2 hardening tests (VERDICT.md / ADVICE.md items):

- asof_join: matched right row's NULL column stays NULL (no backfill from
  an older right row) and all prefixed columns come from the SAME row.
- WAL tail: a late-arriving segment with below-watermark LSNs fails the
  stream (policy) instead of silently dropping rows.
- merge(): auto strategy default — broadcast/shuffle equivalence at the
  threshold boundary.
- quantize_int8: stacked fixed-dim path == ragged fallback path.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable
from cdm_cbioportal_etl_spark.streaming import WalTailReader


def test_asof_join_null_field_not_backfilled(spark):
    """DuckDB ASOF semantics: the matched row wins wholesale — its NULL
    fields are NOT backfilled from older right rows, and multiple right
    columns never tear across different right rows."""
    from cdm_cbioportal_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 100, "L1"), ("k", 200, "L2")], "k string, ts long, lid string"
    )
    right = spark.createDataFrame(
        [("k", 50, "old-a", "old-b"), ("k", 150, None, "new-b")],
        "k string, ts long, a string, b string",
    )
    out = {
        r.lid: (r.asof_a, r.asof_b)
        for r in asof_join(
            left, right, on=["k"], ts_col="ts", right_cols=["a", "b"]
        ).collect()
    }
    # L1 matches ts=50 row wholesale
    assert out["L1"] == ("old-a", "old-b")
    # L2 matches ts=150 row wholesale: a stays NULL (no backfill to
    # 'old-a'), b comes from the SAME row (no ('old-a','new-b') tearing)
    assert out["L2"] == (None, "new-b")


def _mk_table(spark, tmp_path, name="t"):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        T.StructType(
            [T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]
        ),
        key_cols=["k"],
        n_buckets=4,
    )


def _seg(spark, wal_dir, seg_id, rows):
    df = spark.createDataFrame(rows, "lsn long, op string, k string, v string")
    df.coalesce(1).write.parquet(os.path.join(wal_dir, f"seg-{seg_id:04d}"))


def test_wal_stale_segment_fails_stream(spark, tmp_path):
    """A NEW segment whose LSNs are below the applied watermark is
    out-of-order delivery (silent data loss under a pure watermark
    filter) — default policy fails the stream."""
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    table = _mk_table(spark, tmp_path)
    _seg(spark, wal_dir, 1, [(10, "update", "a", "v10"), (11, "update", "b", "v11")])
    WalTailReader(
        spark, os.path.join(wal_dir, "seg-*"), table, str(tmp_path / "c1")
    ).run_available_now()
    assert table.snapshot["ledger"]["applied_lsn"] == 11
    assert len(table.snapshot["ledger"]["applied_segments"]) == 1

    # late segment with LOWER lsn arrives afterwards
    _seg(spark, wal_dir, 0, [(5, "update", "c", "v5")])
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="never applied"):
        q = WalTailReader(
            spark, os.path.join(wal_dir, "seg-*"), table, str(tmp_path / "c1")
        ).run_available_now(await_termination_sec=None)
        q.awaitTermination(120)


def test_wal_redelivered_segment_is_not_stale(spark, tmp_path):
    """Redelivery of an ALREADY-APPLIED segment (fresh checkpoint) is
    harmless idempotent replay — must NOT trigger the stale policy."""
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    table = _mk_table(spark, tmp_path)
    _seg(spark, wal_dir, 0, [(1, "update", "a", "v1")])
    _seg(spark, wal_dir, 1, [(2, "update", "b", "v2")])
    WalTailReader(
        spark, os.path.join(wal_dir, "seg-*"), table, str(tmp_path / "c1")
    ).run_available_now()
    # fresh checkpoint redelivers everything; ledger makes it a no-op
    WalTailReader(
        spark, os.path.join(wal_dir, "seg-*"), table, str(tmp_path / "c2")
    ).run_available_now()
    assert table.read().count() == 2
    assert table.snapshot["ledger"]["applied_lsn"] == 2


def test_merge_auto_strategy_picks_shuffle_above_threshold(spark, tmp_path):
    """auto must fall to the shuffle path once winners exceed the
    broadcast threshold — same final state either way."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "auto"),
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        ),
        key_cols=["k"],
        n_buckets=4,
        properties={"winner_broadcast_threshold": 10},
    )
    batch = spark.range(50).select(
        F.col("id").alias("lsn"),
        F.lit("update").alias("op"),
        (F.col("id") % 25).alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )
    t.merge(batch)  # 25 winners > threshold 10 -> shuffle path
    rows = {r.k: r.v for r in t.read().collect()}
    assert len(rows) == 25
    # latest-lsn wins: key k's winner lsn is k+25
    assert rows[0] == "v25" and rows[24] == "v49"


def test_quantize_stacked_equals_ragged(spark):
    """The np.stack fast path and the per-vector fallback agree."""
    from cdm_cbioportal_etl_spark.similarity.quantize import quantized_embeddings

    fixed = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [127.0, -127.0, 63.5])],
        "vec_id long, embedding array<float>",
    )
    ragged = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [3.0]), (3, [])],
        "vec_id long, embedding array<float>",
    )
    out_f = {r.vec_id: (r.scale, r.q) for r in quantized_embeddings(fixed).collect()}
    assert out_f[1][1] == [64, -127, 32]
    assert out_f[2] == (1.0, [0, 0, 0])  # zero vector -> scale 1, zeros
    assert out_f[3][1] == [127, -127, 64]
    out_r = {r.vec_id: (r.scale, r.q) for r in quantized_embeddings(ragged).collect()}
    assert out_r[1][1] == [64, -127, 32]
    assert out_r[2][1] == [127]
    assert out_r[3][1] == []


def test_read_tsv_rejects_multi_file(spark, tmp_path):
    from cdm_cbioportal_etl_spark.operators.io import read_cbioportal_tsv

    d = tmp_path / "multi"
    d.mkdir()
    (d / "a.tsv").write_text("x\n")
    (d / "b.tsv").write_text("y\n")
    with pytest.raises(ValueError, match="exactly one data file"):
        read_cbioportal_tsv(spark, str(d))


def test_tsv_roundtrip_quoted_values(spark, tmp_path):
    """Writer/reader csv dialect parity: quotes, tabs, backslashes in
    values must survive the TSV roundtrip byte-for-byte (review finding:
    python csv defaults mismatch Spark's quote/escape dialect)."""
    from cdm_cbioportal_etl_spark.operators.header import (
        ColumnMeta,
        combine_header_and_data,
    )
    from cdm_cbioportal_etl_spark.operators.io import (
        read_cbioportal_tsv,
        write_cbioportal_tsv,
    )

    tricky = [
        ("P1", 'size "large"'),
        ("P2", "tab\there"),
        ("P3", "back\\slash"),
        ("P4", 'mix "q"\tand\ttabs\\'),
    ]
    df = spark.createDataFrame(tricky, "PATIENT_ID string, NOTE string")
    out = str(tmp_path / "tricky")
    write_cbioportal_tsv(
        combine_header_and_data(df, {"NOTE": ColumnMeta("NOTE", "Note", "Note")}), out
    )
    _, got = read_cbioportal_tsv(spark, out)
    assert {(r.PATIENT_ID, r.NOTE) for r in got.collect()} == set(tricky)


def test_tsv_reader_rejects_short_file(spark, tmp_path):
    from cdm_cbioportal_etl_spark.operators.io import read_cbioportal_tsv

    f = tmp_path / "short.tsv"
    f.write_text("just\tone\nline\ttwo\n")
    with pytest.raises(ValueError, match="header rows"):
        read_cbioportal_tsv(spark, str(f))


def test_expire_snapshots_rejects_zero_keep(spark, tmp_path):
    from pyspark.sql import types as T
    from cdm_cbioportal_etl_spark.lake import LakeTable

    t = LakeTable.create(
        spark, str(tmp_path / "ek"),
        T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]),
        key_cols=["k"], n_buckets=2,
    )
    with pytest.raises(ValueError, match="keep_last"):
        t.expire_snapshots(keep_last=0)


def test_sessionizer_ignores_null_timestamps(spark, tmp_path):
    """A null ts in a micro-batch must not kill the stateful UDF."""
    import os
    from pyspark.sql import functions as F
    from cdm_cbioportal_etl_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "nsrc"
    (
        spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (1, None), (1, "2024-01-01 12:00:00")],
            "user_id long, ts string",
        )
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .coalesce(1)
        .write.parquet(str(src / "seg-0"))
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(str(src / "seg-*"))
    )
    q = (
        sessionize_stream(stream, gap_sec=600)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "nout"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "nck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(str(tmp_path / "nout"))
    # 10:00 session closed by the 12:00 event (gap > 600s); null ignored
    rows = out.collect()
    assert len(rows) == 1 and rows[0].n_events == 1
