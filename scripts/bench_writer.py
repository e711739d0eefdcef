#!/usr/bin/env python
"""DataSource WRITE path micro-bench (the BENCH.md "DataSource writer
throughput" table, now a repeatable script).

Times three ingest paths for the SAME generated change batch (repos
WAL shape — BASELINE.json input) into fresh 32-bucket tables:

- ``df.write.format("laketable")`` with task-side bucket assignment
  (numpy-vectorized Spark-bit-equal xxhash64, lake/xxh64_vec.py);
- the same write with a caller-computed JVM ``_bucket`` column
  (``table.bucket_expr()`` — one Catalyst projection);
- ``LakeTable.merge(mode="mor")`` — the reduced merge baseline the
  writer must beat for the blind-append path to be worth its trade.

Prints ONE JSON line.  Usage:
    python scripts/bench_writer.py [--events N] [--reps N]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from cdm_cbioportal_etl_spark.cdc import gen_change_events  # noqa: E402
from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA  # noqa: E402
from cdm_cbioportal_etl_spark.lake import LakeTable  # noqa: E402
from cdm_cbioportal_etl_spark.lake.datasource import register  # noqa: E402
from cdm_cbioportal_etl_spark.session import get_spark  # noqa: E402


def _arg(flag: str, default: int) -> int:
    return (
        int(sys.argv[sys.argv.index(flag) + 1])
        if flag in sys.argv
        else default
    )


def main() -> None:
    n_events = _arg("--events", 4_000_000)
    reps = _arg("--reps", 3)
    root = "/dev/shm/writer_bench"
    spark = get_spark("writer-bench")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    shutil.rmtree(root, ignore_errors=True)
    ev = gen_change_events(
        spark, n_events, n_repos=2000, paths_per_repo=500, seed=23,
        parallelism=64,
    )
    wal_dir = os.path.join(root, "wal")
    ev.write.mode("overwrite").parquet(wal_dir)
    wal = spark.read.parquet(wal_dir)
    wal.count()  # footer cache warm
    # untimed warmup write: python worker spin-up + JIT, so the first
    # timed path isn't charged for cold start
    wu = LakeTable.create(
        spark, os.path.join(root, "warmup"),
        T.StructType(list(REPOS_SCHEMA.fields)),
        key_cols=["repo", "path"], n_buckets=32,
    )
    wal.limit(200_000).write.format("laketable").option(
        "path", wu.root
    ).mode("append").save()
    shutil.rmtree(wu.root, ignore_errors=True)

    def _fresh(i: int) -> LakeTable:
        return LakeTable.create(
            spark, os.path.join(root, f"t{i}"),
            T.StructType(list(REPOS_SCHEMA.fields)),
            key_cols=["repo", "path"], n_buckets=32,
        )

    results: dict[str, dict] = {}
    seq = 0
    rows_seen: set[int] = set()
    for name, run in [
        (
            "writer_task_hash",
            lambda t: wal.write.format("laketable")
            .option("path", t.root).mode("append").save(),
        ),
        (
            "writer_jvm_bucket",
            lambda t: wal.withColumn("_bucket", t.bucket_expr())
            .write.format("laketable")
            .option("path", t.root).mode("append").save(),
        ),
        (
            "merge_mor",
            lambda t: t.merge(wal, mode="mor"),
        ),
    ]:
        walls = []
        for _ in range(reps):
            t = _fresh(seq)
            seq += 1
            t0 = time.perf_counter()
            run(t)
            walls.append(time.perf_counter() - t0)
            # fresh handle: the create-time handle caches its snapshot,
            # and the format-writer commits through its own handle.
            # read().count() is the FOLDED row count — physical delta
            # rows differ by design between blind append and merge.
            rows_seen.add(LakeTable(spark, t.root).read().count())
            shutil.rmtree(t.root, ignore_errors=True)
        best = min(walls)
        results[name] = {
            "best_wall_sec": round(best, 2),
            "median_wall_sec": round(statistics.median(walls), 2),
            "events_per_sec": round(n_events / best, 0),
        }
    assert len(rows_seen) == 1, rows_seen  # all three paths fold equal
    print(json.dumps({
        "metric": "datasource_writer_throughput",
        "events": n_events,
        "reps": reps,
        "final_rows": rows_seen.pop(),
        "paths": results,
    }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
