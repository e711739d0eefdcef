#!/usr/bin/env python
"""Benchmark equality deletes: write cost, read tax, compaction repay.

The pitch is O(1)-write erasure at any table size; the price is one
anti-join per read until compaction.  This script measures all three
sides on one table and prints one JSON line per phase:

1. seed a base table (``--base-rows``)
2. ``delete_keys`` of ``--erase-keys`` random existing keys → wall of
   the delete itself (should not grow with base size) + bytes written
3. resolved-read wall before the delete, after it (the anti-join tax),
   and after ``compact()`` retires the entry
4. a correctness gate: logical row count arithmetic holds at each step

Usage:
    python scripts/bench_eq_delete.py [--base-rows 8000000]
        [--erase-keys 100000] [--buckets 32] [--dir /dev/shm]
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

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _read_wall(table, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        table.read().agg(F.count(F.lit(1)).alias("n")).collect()
        walls.append(round(time.perf_counter() - t0, 3))
    return sorted(walls)[len(walls) // 2], walls


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base-rows", type=int, default=8_000_000)
    p.add_argument("--erase-keys", type=int, default=100_000)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--dir", default="/dev/shm")
    args = p.parse_args()
    spark = get_spark("bench-eq-delete")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(args.dir, "eqbench")
    shutil.rmtree(root, ignore_errors=True)
    try:
        t = LakeTable.create(spark, root, SCHEMA, ["k"], n_buckets=args.buckets)
        seed = spark.range(args.base_rows).select(
            F.format_string("key-%012d", F.col("id")).alias("k"),
            F.col("id").alias("v"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        t.overwrite(seed, lsn=0)
        med0, walls0 = _read_wall(t)
        print(json.dumps({"phase": "baseline_read", "median_sec": med0, "walls": walls0}))

        # deterministic "erasure requests": every base_rows/erase_keys-th key
        stride = max(1, args.base_rows // args.erase_keys)
        erase = spark.range(0, args.base_rows, stride).select(
            F.format_string("key-%012d", F.col("id")).alias("k")
        )
        t0 = time.perf_counter()
        lsn = t.delete_keys(erase)
        w_del = time.perf_counter() - t0
        entry = t.snapshot["eqdel"][-1]
        eq_bytes = sum(
            os.path.getsize(os.path.join(root, p)) for p in entry["files"]
        )
        print(json.dumps({
            "phase": "delete_keys",
            "keys": entry["rows"],
            "wall_sec": round(w_del, 3),
            "sidecar_bytes": eq_bytes,
            "lsn": lsn,
            "data_files_touched": 0,
        }))

        med1, walls1 = _read_wall(t)
        n_after = t.read().count()
        print(json.dumps({
            "phase": "read_with_eq_tax",
            "median_sec": med1,
            "walls": walls1,
            "tax_vs_baseline": round(med1 / med0, 2) if med0 else None,
            "rows_logical": n_after,
        }))
        assert n_after == args.base_rows - entry["rows"]

        t0 = time.perf_counter()
        t.compact(max_files_per_bucket=0)
        w_comp = time.perf_counter() - t0
        assert not t.snapshot.get("eqdel")
        med2, walls2 = _read_wall(t)
        assert t.read().count() == n_after
        print(json.dumps({
            "phase": "after_compact",
            "compact_wall_sec": round(w_comp, 2),
            "median_sec": med2,
            "walls": walls2,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
