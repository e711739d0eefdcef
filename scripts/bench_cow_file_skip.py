#!/usr/bin/env python
"""Benchmark file-level COW (stats-based carry-over) vs bucket-level COW.

Replays an insert-only WAL — the regime where bucket-level copy-on-write
pays O(table) per batch while file-level COW pays O(batch) — once with
``cow_file_skip`` on and once off, printing one JSON line per mode with
per-batch walls so the divergence (flat vs linearly growing) is visible.

Usage:
    python scripts/bench_cow_file_skip.py [--batches 20] [--rows 250000]
        [--buckets 32] [--dir /dev/shm]

The BENCH.md "COW file skipping" table comes from this script's defaults.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, types as T  # noqa: E402

from cdm_cbioportal_etl_spark.session import get_spark  # noqa: E402
from cdm_cbioportal_etl_spark.lake import LakeTable  # noqa: E402


def run(spark, root: str, skip: str, n_batches: int, rows: int, buckets: int):
    shutil.rmtree(root, ignore_errors=True)
    table = LakeTable.create(
        spark,
        root,
        T.StructType(
            [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
        ),
        ["k"],
        n_buckets=buckets,
        properties={"cow_file_skip": skip},
    )
    walls, carried = [], 0
    for b in range(n_batches):
        base = b * rows
        # fresh, monotonically increasing keys: every batch's key range is
        # disjoint from every existing file's range
        df = spark.range(base, base + rows).select(
            (F.col("id") + 1).alias("lsn"),
            F.lit("upsert").alias("op"),
            F.format_string("key-%010d", F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        t0 = time.perf_counter()
        stats = table.merge(df, count_batch=False)
        walls.append(round(time.perf_counter() - t0, 3))
        carried += stats.carried_files
    out = {
        "mode": "file-level" if skip == "true" else "bucket-level",
        "cow_file_skip": skip,
        "batches": n_batches,
        "rows_per_batch": rows,
        "rows_final": table.row_count(),
        "total_sec": round(sum(walls), 2),
        "last4_sec": round(sum(walls[-4:]), 2),
        "carried_files": carried,
        "batch_walls_sec": walls,
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--rows", type=int, default=250_000)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--dir", default="/dev/shm")
    args = p.parse_args()

    spark = get_spark("bench-cow-file-skip")
    for skip in ("true", "false"):
        res = run(
            spark,
            os.path.join(args.dir, f"cowskip_bench_{skip}"),
            skip,
            args.batches,
            args.rows,
            args.buckets,
        )
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
