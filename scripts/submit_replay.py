#!/usr/bin/env python
"""spark-submit entry point for the CDC replay job.

Cluster launch (the north-rule's deployment shape):

    zip -r engine.zip cdm_cbioportal_etl_spark
    spark-submit --py-files engine.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/submit_replay.py \
        --wal /path/to/wal_parquet --table /path/to/lake_table \
        --events 10000000000 --batches 1000 [--resume]

Local smoke:  python scripts/submit_replay.py --synthetic 1000000

The session comes from ``SparkSession.builder.getOrCreate()`` so
spark-submit's master/deploy-mode/executor conf is respected; engine
defaults are applied only where unset.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, types as T  # noqa: E402

from cdm_cbioportal_etl_spark.cdc import CdcReplayer, gen_change_events  # noqa: E402
from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA  # noqa: E402
from cdm_cbioportal_etl_spark.lake import LakeTable  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wal", help="parquet WAL directory (lsn,op,repo,path,commit,lang,content)")
    ap.add_argument("--table", default="/tmp/cdc_submit/repos")
    ap.add_argument("--events", type=int, default=None, help="lsn upper bound")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--strategy", default="auto",
                    choices=["broadcast", "shuffle", "auto"])
    ap.add_argument("--mode", default="cow", choices=["cow", "mor", "dv"],
                    help="merge mode: copy-on-write rewrite, merge-on-read "
                         "delta append, or deletion-vector positional kills "
                         "(applies at table creation; existing tables keep "
                         "their property)")
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the table's LSN ledger watermark")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N events instead of reading --wal")
    ap.add_argument("--cdf", action="store_true",
                    help="create the table with write_changes=true: COW "
                         "merges persist per-commit change files, so the "
                         "--view refresh (and any table_changes consumer) "
                         "reads O(batch) stored rows instead of snapshot-"
                         "diffing rewritten files")
    ap.add_argument("--manifest-shards", type=int, default=0,
                    help="shard the manifest file inventory into N "
                         "content-addressed files (bucket %% N): per-commit "
                         "metadata writes become O(touched shards) — the "
                         "setting for long-lived tables with large file "
                         "counts (0 = inline inventory)")
    ap.add_argument("--view", default=None,
                    help="maintain an incremental per-lang COUNT view at "
                         "this path: created (one full compute) if absent, "
                         "then refreshed from the change feed after the "
                         "replay — the downstream half of the CDC chain")
    ap.add_argument("--view-stream", action="store_true",
                    help="with --view and --cdf: refresh through the CDF "
                         "STREAM (CdfViewMaintainer checkpoint drain) "
                         "instead of the pull-model table_changes refresh")
    ap.add_argument("--ingest", default="replayer",
                    choices=["replayer", "writer"],
                    help="replayer = exactly-once MERGE batches (default); "
                         "writer = the DataSource distributed MOR delta "
                         "append (df.write.format('laketable'), JVM "
                         "_bucket fast path) — same LSN-range batching, "
                         "resumable via the ledger pre-filter; appended "
                         "deltas fold at read or compact()")
    args = ap.parse_args()
    if args.ingest == "writer" and (args.cdf or args.view_stream):
        # fail HERE, not as a ValueError deep in the writer constructor
        # after table creation: the DataSource delta-append writer
        # rejects write_changes tables (a blind append cannot produce
        # the pre-image change files a live CDF stream relies on)
        ap.error(
            "--ingest writer is incompatible with --cdf/--view-stream: "
            "the DataSource writer cannot capture write-time change "
            "files; use --ingest replayer for CDF-fed pipelines"
        )

    spark = SparkSession.builder.appName("cdc-replay").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        wal = gen_change_events(spark, args.synthetic)
        lsn_hi = args.synthetic
    else:
        if not args.wal:
            ap.error("--wal or --synthetic required")
        wal = spark.read.parquet(args.wal)
        lsn_hi = args.events or (wal.agg({"lsn": "max"}).collect()[0][0] + 1)

    if LakeTable.exists(args.table):
        table = LakeTable(spark, args.table)
    else:
        props = {"merge_mode": args.mode}
        if args.cdf:
            props["write_changes"] = "true"
        if args.manifest_shards:
            props["manifest_shards"] = str(args.manifest_shards)
        table = LakeTable.create(
            spark, args.table, T.StructType(list(REPOS_SCHEMA.fields)),
            key_cols=["repo", "path"], n_buckets=args.buckets,
            properties=props,
        )

    batch_size = (lsn_hi + args.batches - 1) // args.batches
    t0 = time.perf_counter()
    if args.ingest == "writer":
        # the writer appends MOR-shape deltas regardless of the table's
        # default merge_mode; reads fold, compact() re-bases
        from pyspark.sql import functions as F

        from cdm_cbioportal_etl_spark.lake.datasource import (
            register_lake_datasource,
        )

        register_lake_datasource(spark)
        applied = skipped = 0
        start = table.applied_lsn() + 1 if args.resume else 0
        src = wal.withColumn("_bucket", table.bucket_expr())
        for lo in range(0, lsn_hi, batch_size):
            hi = min(lo + batch_size, lsn_hi)
            if hi <= start:
                skipped += 1
                continue
            v0 = table.snapshot["version"]
            src.filter(
                (F.col("lsn") >= lo) & (F.col("lsn") < hi)
            ).write.format("laketable").option("path", table.root).mode(
                "append"
            ).save()
            table.refresh()
            applied += 1 if table.snapshot["version"] > v0 else 0
            skipped += 1 if table.snapshot["version"] == v0 else 0

        class _R:  # same report shape as the replayer
            batches_applied = applied
            batches_skipped = skipped

        report = _R()
    else:
        replayer = CdcReplayer(table)
        if args.resume:
            report = replayer.resume(wal, lsn_hi, batch_size)
        else:
            report = replayer.replay_range_batches(
                wal, 0, lsn_hi, batch_size=batch_size,
                strategy=args.strategy, salt_partitions=args.salt,
            )
    wall = time.perf_counter() - t0
    out = {
        "events": lsn_hi,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(lsn_hi / wall, 1),
        "batches_applied": report.batches_applied,
        "batches_skipped": report.batches_skipped,
        "rows_after": table.row_count(),
        # live rows by manifest arithmetic (== rows_after on COW; on DV
        # the dead rows stay physical until compaction) — metadata-only,
        # resolved-read fallback only while MOR deltas/eq-deletes pend
        "live_rows": table.logical_row_count(),
        "applied_lsn": table.snapshot["ledger"]["applied_lsn"],
    }
    if args.view:
        from cdm_cbioportal_etl_spark.lake import IncrementalAggView

        if LakeTable.exists(args.view):
            view = IncrementalAggView(spark, args.view)
        else:
            view = IncrementalAggView.create(
                spark, args.view, table, ["lang"]
            )
        if args.view_stream:
            # push model: the CDF stream drives the view through a
            # checkpointed drain (requires --cdf on the source)
            from cdm_cbioportal_etl_spark.streaming import CdfViewMaintainer

            m = CdfViewMaintainer(
                spark, table.root, view, args.view + "-ckpt"
            )
            rep = m.run_available() or {"groups": 0}
        else:
            rep = view.refresh(table)
        out["view"] = {
            "groups_touched": rep["groups"],
            "consumed_version": view.consumed_version(),
            "rows": view.read().count(),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
