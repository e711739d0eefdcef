"""Streaming dedup within the watermark horizon: redeliveries dropped
(same batch, later batch), expired-state re-emission documented, and
composition with the windowed aggregate (redelivery-proof counts)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.streaming import dedup_stream, windowed_agg_stream

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("etype", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.LongType()),
    ]
)


def _seg(spark, seg_dir, seg_id, rows):
    df = spark.createDataFrame(
        [(i, e, f"2024-01-01 00:{mm:02d}:00", v) for i, e, mm, v in rows],
        "event_id long, etype string, ts string, value long",
    ).select(
        "event_id", "etype", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(seg_dir, f"seg-{seg_id:04d}")
    )
    time.sleep(0.05)


def _drain(spark, seg_dir, ckpt, out_dir, fn):
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(seg_dir, "seg-*"))
    q = (
        fn(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_drops_redeliveries_within_watermark(spark, tmp_path):
    seg_dir, ckpt, out = (
        str(tmp_path / "segs"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    os.makedirs(seg_dir, exist_ok=True)
    # id 1 delivered 3x (twice in batch 0, once in batch 1 — all within
    # the 30 min watermark); id 2 once
    _seg(spark, seg_dir, 0, [(1, "a", 1, 10), (1, "a", 1, 10), (2, "b", 2, 5)])
    _seg(spark, seg_dir, 1, [(1, "a", 1, 10), (3, "a", 3, 7)])
    _drain(
        spark, seg_dir, ckpt, out,
        lambda s: dedup_stream(s, id_cols=("event_id",), watermark="30 minutes"),
    )
    got = sorted(
        (r["event_id"], r["etype"], r["value"])
        for r in spark.read.schema(SCHEMA).parquet(out).collect()
    )
    assert got == [(1, "a", 10), (2, "b", 5), (3, "a", 7)]


def test_dedup_state_expires_past_watermark(spark, tmp_path):
    """A duplicate arriving AFTER the watermark expired its id re-emits —
    the documented horizon bound (state is O(redelivery window), not
    O(stream lifetime))."""
    seg_dir, ckpt, out = (
        str(tmp_path / "segs"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    os.makedirs(seg_dir, exist_ok=True)
    _seg(spark, seg_dir, 0, [(1, "a", 1, 10)])
    # 00:40 pushes the 5-min watermark far past id 1's 00:01 state; the
    # eviction watermark lags one batch (it derives from data through the
    # PREVIOUS batch), so the state is gone only after batch 2 runs
    _seg(spark, seg_dir, 1, [(9, "z", 40, 1)])
    _seg(spark, seg_dir, 2, [(8, "z", 41, 2)])
    _seg(spark, seg_dir, 3, [(1, "a", 42, 10)])  # same id, state expired
    _drain(
        spark, seg_dir, ckpt, out,
        lambda s: dedup_stream(s, id_cols=("event_id",), watermark="5 minutes"),
    )
    ids = sorted(
        r["event_id"]
        for r in spark.read.schema(SCHEMA).parquet(out).collect()
    )
    assert ids == [1, 1, 8, 9]


def test_dedup_composes_with_windowed_agg(spark, tmp_path):
    """dedup upstream of the windowed rollup makes counts redelivery-
    proof: 5 deliveries of 3 distinct events count 3."""
    seg_dir, ckpt, out = (
        str(tmp_path / "segs"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    os.makedirs(seg_dir, exist_ok=True)
    _seg(
        spark, seg_dir, 0,
        [(1, "a", 1, 10), (1, "a", 1, 10), (2, "a", 2, 20), (3, "a", 3, 30)],
    )
    _seg(spark, seg_dir, 1, [(2, "a", 2, 20)])  # redelivery in a later batch
    _seg(spark, seg_dir, 2, [(9, "z", 50, 1)])  # advances wm; window [0,10) emits
    _drain(
        spark, seg_dir, ckpt, out,
        # watermark=None: the stream is already watermarked by
        # dedup_stream (one watermark definition per chained plan)
        lambda s: windowed_agg_stream(
            dedup_stream(s, id_cols=("event_id",), watermark="5 minutes"),
            window="10 minutes",
            watermark=None,
        ),
    )
    rows = spark.read.schema(
        "window_start timestamp, window_end timestamp, etype string, "
        "n_events long, total_value long"
    ).parquet(out).collect()
    got = {
        (r["window_start"].strftime("%M"), r["etype"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in rows
    }
    assert got == {("00", "a"): (3, 60)}
