"""Watermarked windowed aggregation: append-mode emission, late-but-
allowed events counted, too-late events dropped, restart durability,
and batch-plan equivalence of the same operator."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.streaming import windowed_agg_stream

SCHEMA = T.StructType(
    [
        T.StructField("etype", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.LongType()),
    ]
)

T0 = "2024-01-01 00:"


def _seg(spark, seg_dir, seg_id, rows):
    df = spark.createDataFrame(
        [(e, f"2024-01-01 00:{mm:02d}:{ss:02d}", v) for e, mm, ss, v in rows],
        "etype string, ts string, value long",
    ).select("etype", F.col("ts").cast("timestamp").alias("ts"), "value")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(seg_dir, f"seg-{seg_id:04d}")
    )
    # the file source orders by modification time: keep segments distinct
    time.sleep(0.05)


OUT_SCHEMA = (
    "window_start timestamp, window_end timestamp, etype string, "
    "n_events long, total_value long"
)


def _drain(spark, seg_dir, ckpt, out_dir):
    """Run the windowed query to a parquet FILE sink (the sink class that
    supports checkpoint recovery — append rows are exactly-once across
    restarts) and return the accumulated emitted windows."""
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(os.path.join(seg_dir, "seg-*"))
    q = (
        windowed_agg_stream(
            stream, window="10 minutes", watermark="5 minutes"
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["window_start"].strftime("%M"), r["etype"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in spark.read.schema(OUT_SCHEMA).parquet(out_dir).collect()
    }


def test_windowed_stream_late_data_semantics(spark, tmp_path):
    seg_dir = str(tmp_path / "segs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(seg_dir, exist_ok=True)

    # batch 0: window A=[00,10) and B=[10,20); wm advances to 00:07
    _seg(spark, seg_dir, 0, [("a", 1, 0, 10), ("a", 8, 0, 20), ("b", 12, 0, 5)])
    # batch 1: 00:09 is a LATE arrival still inside the watermark
    # (late-event filter uses the previous batch's wm, 00:07 < A's end)
    # -> counted into A; 00:30 pushes the eviction wm to 00:25 for the
    # NEXT batch
    _seg(spark, seg_dir, 1, [("a", 30, 0, 1), ("a", 9, 0, 100)])
    # batch 2: eviction wm is now 00:25 -> A and B finalize and emit
    _seg(spark, seg_dir, 2, [("a", 59, 59, 7)])
    # batch 3: 00:02 is TOO late (late-event wm 00:25 > A's end 00:10,
    # and A has already been emitted) -> dropped entirely; Spark's
    # late-filter watermark lags eviction by one batch, which is why the
    # drop needs a batch AFTER the finalizing one
    _seg(spark, seg_dir, 3, [("a", 2, 0, 1000)])

    got = _drain(spark, seg_dir, ckpt, str(tmp_path / "out"))
    assert got == {
        ("00", "a"): (3, 130),  # 00:01 + 00:08 + late-but-allowed 00:09
        ("10", "b"): (1, 5),
        ("30", "a"): (1, 1),  # finalized by the no-data batch (wm 00:55)
        # [50,60) stays OPEN (wm 00:55 < end 01:00): not emitted, and the
        # dropped 00:02 event resurfaces nowhere
    }


def test_windowed_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    seg_dir = str(tmp_path / "segs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(seg_dir, exist_ok=True)
    _seg(spark, seg_dir, 0, [("a", 1, 0, 10), ("b", 12, 0, 5)])
    out = str(tmp_path / "out")
    got1 = _drain(spark, seg_dir, ckpt, out)
    assert got1 == {}  # wm 00:07: nothing finalized yet

    # restart with a new segment far in the future: BOTH old windows emit
    # exactly once, from state recovered out of the checkpoint
    _seg(spark, seg_dir, 1, [("a", 45, 0, 1)])
    got2 = _drain(spark, seg_dir, ckpt, out)
    assert got2 == {("00", "a"): (1, 10), ("10", "b"): (1, 5)}


def test_windowed_agg_batch_twin_matches_sql(spark):
    """The same operator on a BATCH frame equals the plain SQL windowed
    aggregate — the twin-plan property (watermark is a no-op in batch)."""
    rows = [("a", 1, 10), ("a", 8, 20), ("b", 12, 5), ("a", 9, 100), ("a", 30, 1)]
    df = spark.createDataFrame(
        [(e, f"2024-01-01 00:{mm:02d}:00", v) for e, mm, v in rows],
        "etype string, ts string, value long",
    ).select("etype", F.col("ts").cast("timestamp").alias("ts"), "value")
    got = {
        (r["window_start"].strftime("%M"), r["etype"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in windowed_agg_stream(df, window="10 minutes").collect()
    }
    assert got == {
        ("00", "a"): (3, 130),
        ("10", "b"): (1, 5),
        ("30", "a"): (1, 1),
    }


def test_windowed_stream_to_lake_exactly_once(spark, tmp_path):
    """windowed agg -> LakeTable merge: each finalized window lands in
    the lake exactly once, across restarts and replayed epochs."""
    from cdm_cbioportal_etl_spark.lake import LakeTable
    from cdm_cbioportal_etl_spark.streaming import stream_windowed_agg_to_lake

    seg_dir = str(tmp_path / "segs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(seg_dir, exist_ok=True)
    table = LakeTable.create(
        spark,
        str(tmp_path / "rollup"),
        T.StructType(
            [
                T.StructField("window_start", T.TimestampType()),
                T.StructField("window_end", T.TimestampType()),
                T.StructField("etype", T.StringType()),
                T.StructField("n_events", T.LongType()),
                T.StructField("total_value", T.LongType()),
            ]
        ),
        key_cols=["window_start", "etype"],
        n_buckets=4,
    )

    def _run():
        stream = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(os.path.join(seg_dir, "seg-*"))
        stream_windowed_agg_to_lake(
            stream, table, ckpt, window="10 minutes", watermark="5 minutes"
        )

    def _lake():
        return {
            (r["window_start"].strftime("%M"), r["etype"]): (
                r["n_events"],
                r["total_value"],
            )
            for r in table.read().collect()
        }

    _seg(spark, seg_dir, 0, [("a", 1, 0, 10), ("a", 8, 0, 20), ("b", 12, 0, 5)])
    _run()
    assert _lake() == {}  # nothing finalized yet

    # restart 1: a far-future event finalizes A and B into the lake
    _seg(spark, seg_dir, 1, [("a", 45, 0, 1)])
    _run()
    assert _lake() == {("00", "a"): (2, 30), ("10", "b"): (1, 5)}
    rows_after = table.row_count()

    # restart 2 with NOTHING new: replayed/empty epochs must not
    # duplicate or disturb the landed windows (ledger-filtered merge)
    _run()
    assert table.row_count() == rows_after
    assert _lake() == {("00", "a"): (2, 30), ("10", "b"): (1, 5)}
