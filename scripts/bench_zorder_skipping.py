#!/usr/bin/env python
"""Reproducible z-order effectiveness benchmark.

Builds a lake table from the sf events table (key = event_id; the
secondary columns value/event_type are uncorrelated with the key, the
worst case for key-sorted files), then measures — before and after
``cluster_files(["value", "event_type"])`` — how many data files a
selective secondary-column predicate admits and how long the pruned
read + row filter takes.  Prints ONE JSON line.

Usage: python scripts/bench_zorder_skipping.py [sf_dir] [--files N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T  # noqa: E402

from cdm_cbioportal_etl_spark.lake import LakeTable  # noqa: E402
from cdm_cbioportal_etl_spark.session import get_spark  # noqa: E402


def timed_read(table, prune, row_filter):
    t0 = time.perf_counter()
    n = table.read(prune=prune).filter(row_filter).count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    files_per_bucket = 8
    spark = get_spark("zorder-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", "value", "props"
    )
    root = "/dev/shm/zorder_bench"
    shutil.rmtree(root, ignore_errors=True)
    table = LakeTable.create(
        spark,
        root,
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        ),
        key_cols=["event_id"],
        n_buckets=16,
        # write multiple key-sorted files per bucket so the BEFORE side
        # has the same file granularity as the AFTER side
        properties={"stats_cols": "event_id,_lsn,value,event_type"},
    )
    table.overwrite(ev)
    table.compact(max_files_per_bucket=0, target_file_rows=max(
        1, ev.count() // (16 * files_per_bucket)
    ))

    prune = {"value": (100.0, 120.0), "event_type": "purchase"}
    row_filter = F.col("value").between(100.0, 120.0) & (
        F.col("event_type") == "purchase"
    )
    adm0, tot0 = table.files_admitted(prune)
    # warm + timed
    timed_read(table, prune, row_filter)
    t_before, n_before = timed_read(table, prune, row_filter)

    table.cluster_files(
        ["value", "event_type"], target_files_per_bucket=files_per_bucket,
        n_bins=64,
    )
    adm1, tot1 = table.files_admitted(prune)
    timed_read(table, prune, row_filter)
    t_after, n_after = timed_read(table, prune, row_filter)
    assert n_before == n_after, "clustering changed results"

    print(
        json.dumps(
            {
                "metric": "zorder_files_admitted_ratio",
                "rows_matched": n_after,
                "before": {"admitted": adm0, "total": tot0, "read_sec": t_before},
                "after": {"admitted": adm1, "total": tot1, "read_sec": t_after},
                "admitted_ratio_before": round(adm0 / max(1, tot0), 3),
                "admitted_ratio_after": round(adm1 / max(1, tot1), 3),
                "sf_dir": sf_dir,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
