"""applyInPandasWithState sessionizer: cross-batch state carry and
checkpoint-durable restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdm_cbioportal_etl_spark.streaming.stateful import sessionize_stream


def _write_seg(spark, rows, path):
    (
        spark.createDataFrame(rows, "user_id long, ts string")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def _run_available_now(spark, src_glob, ckpt, out_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_glob)
    )
    # file sink (not memory): supports checkpoint RECOVERY, so a second
    # query run resumes the state store — the property under test
    q = (
        sessionize_stream(stream, gap_sec=600)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    ).parquet(out_dir)


def test_session_state_carries_across_micro_batches(spark, tmp_path):
    t = lambda s: f"2024-01-01 10:{s:02d}:00"  # noqa: E731
    # segment 0: user 1 events at 10:00 and 10:05 (same session)
    _write_seg(
        spark,
        [(1, t(0)), (1, t(5))],
        str(tmp_path / "src" / "seg-0"),
    )
    # segment 1 (separate micro-batch): 10:08 extends the session;
    # 10:30 is > 600s after 10:08 -> closes session #1, opens #2
    _write_seg(
        spark,
        [(1, t(8)), (1, t(30)), (2, t(0))],
        str(tmp_path / "src" / "seg-1"),
    )
    out = _run_available_now(
        spark, str(tmp_path / "src" / "seg-*"), str(tmp_path / "ck"), str(tmp_path / "out1")
    ).collect()
    # exactly one CLOSED session: user 1, 10:00-10:08, 3 events —
    # proving the open session crossed the micro-batch boundary intact
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1 and r.n_events == 3
    assert str(r.session_start).endswith("10:00:00")
    assert str(r.session_end).endswith("10:08:00")


def test_session_state_survives_query_restart(spark, tmp_path):
    t = lambda s: f"2024-01-01 11:{s:02d}:00"  # noqa: E731
    src = tmp_path / "src2"
    ck = str(tmp_path / "ck2")
    _write_seg(spark, [(7, t(0)), (7, t(3))], str(src / "seg-0"))
    out1 = _run_available_now(spark, str(src / "seg-*"), ck, str(tmp_path / "out2")).collect()
    assert out1 == []  # session still open, nothing closed yet

    # new file arrives; a NEW query run on the SAME checkpoint resumes
    # the state store and closes the session
    _write_seg(spark, [(7, t(45))], str(src / "seg-1"))
    out2 = _run_available_now(spark, str(src / "seg-*"), ck, str(tmp_path / "out2")).collect()
    assert len(out2) == 1
    r = out2[0]
    assert r.user_id == 7 and r.n_events == 2
    assert str(r.session_end).endswith("11:03:00")
