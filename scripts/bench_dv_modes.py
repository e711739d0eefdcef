#!/usr/bin/env python
"""Benchmark the three physical merge strategies on an update-heavy replay.

The deletion-vector pitch is a two-sided trade: MOR-class WRITE cost
(no bucket rewrites — position sidecars + O(batch) appends) with
COW-class READ cost (no latest-per-key fold — union + positional
anti-join).  This script replays the same update-heavy WAL through
``mode in {cow, mor, dv}`` and prints one JSON line per mode with:

- per-batch merge walls (COW grows with touched-bucket bytes; MOR and
  DV stay ~flat at O(batch))
- post-replay resolved-read wall, median of 3 (MOR pays the fold tax;
  COW and DV are fold-free)
- final-state sha: all three modes MUST agree (correctness gate inside
  the benchmark)

Usage:
    python scripts/bench_dv_modes.py [--base-rows 4000000]
        [--batches 8] [--batch-rows 500000] [--update-frac 0.9]
        [--buckets 32] [--dir /dev/shm]
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


def _batch(spark, lo: int, n: int, base_rows: int, update_frac: float):
    """Deterministic change batch: ``update_frac`` of events hit existing
    keys (uniformly over the base pool — the hash-scattered point-update
    shape that is COW's worst case), the rest insert fresh keys."""
    upd = F.xxhash64("id", F.lit(1)) % 100 < int(update_frac * 100)
    keyid = F.when(
        upd, F.pmod(F.xxhash64("id", F.lit(2)), F.lit(base_rows))
    ).otherwise(F.col("id") + base_rows)
    return spark.range(lo, lo + n).select(
        (F.col("id") + 1).alias("lsn"),
        F.lit("upsert").alias("op"),
        F.format_string("key-%012d", keyid).alias("k"),
        F.col("id").alias("v"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )


def run(spark, root: str, mode: str, args) -> dict:
    shutil.rmtree(root, ignore_errors=True)
    table = LakeTable.create(
        spark, root, SCHEMA, ["k"], n_buckets=args.buckets,
        properties={"file_blooms": 1 << 17},
    )
    seed = spark.range(args.base_rows).select(
        F.format_string("key-%012d", F.col("id")).alias("k"),
        F.col("id").alias("v"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    table.overwrite(seed, lsn=0)
    walls = []
    total = 0
    t_all = time.perf_counter()
    for b in range(args.batches):
        df = _batch(
            spark, b * args.batch_rows, args.batch_rows,
            args.base_rows, args.update_frac,
        )
        t0 = time.perf_counter()
        table.merge(df, mode=mode, batch_id=f"b{b}")
        walls.append(round(time.perf_counter() - t0, 3))
        total += args.batch_rows
    wall_merge = time.perf_counter() - t_all
    read_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        agg = table.read().agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()[0]
        read_walls.append(round(time.perf_counter() - t0, 3))
    # order-insensitive state digest: all modes must agree
    sha = table.read().agg(
        F.sum(
            F.conv(
                F.substring(
                    F.sha2(F.concat_ws("\x1f", "k", "v", "payload"), 256), 1, 14
                ),
                16,
                10,
            ).cast("decimal(38,0)")
        )
        .cast("string")
        .alias("h")
    ).collect()[0]["h"]
    out = {
        "mode": mode,
        "batches": args.batches,
        "batch_rows": args.batch_rows,
        "update_frac": args.update_frac,
        "merge_walls_sec": walls,
        "merge_wall_total_sec": round(wall_merge, 2),
        "merge_events_per_sec": round(total / wall_merge, 1),
        "read_wall_median_sec": sorted(read_walls)[1],
        "read_walls_sec": read_walls,
        "rows_logical": int(agg["n"]),
        "state_digest": sha,
    }
    if mode == "dv":
        out["dv_entries"] = len(table.snapshot.get("dv", []))
        out["dv_rows"] = sum(
            e.get("rows", 0) for e in table.snapshot.get("dv", [])
        )
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base-rows", type=int, default=4_000_000)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--batch-rows", type=int, default=500_000)
    p.add_argument("--update-frac", type=float, default=0.9)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--dir", default="/dev/shm")
    args = p.parse_args()
    spark = get_spark("bench-dv-modes")
    spark.sparkContext.setLogLevel("ERROR")
    digests = {}
    try:
        for mode in ("cow", "mor", "dv"):
            r = run(spark, os.path.join(args.dir, f"dvbench-{mode}"), mode, args)
            digests[mode] = r["state_digest"]
            print(json.dumps(r))
        assert len(set(digests.values())) == 1, f"state divergence: {digests}"
        print(json.dumps({"states_equal": True}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
