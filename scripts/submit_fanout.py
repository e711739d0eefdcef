#!/usr/bin/env python
"""spark-submit entry point for the multi-table CDC fan-out job.

One wire stream of Debezium JSON envelopes (the Kafka-topic-dump
layout: a directory of JSON-line segment files) fans out to N lake
tables through a Structured-Streaming tail, with:

  - per-table exactly-once (LSN ledgers; epoch replay no-ops),
  - ONE atomic catalog publish per micro-batch (lake/txn.py — a reader
    joining the routed tables through the catalog never sees a
    half-applied epoch),
  - wire-driven schema evolution (Connect schema blob -> ADD COLUMN /
    widen before decode; --no-evolve to ignore unknown columns),
  - an idempotent per-epoch dead-letter sink,
  - crash-resume from the streaming checkpoint (re-run the same
    command; drained epochs re-merge as no-ops).

Cluster launch (the north-rule's deployment shape):

    zip -r engine.zip cdm_cbioportal_etl_spark
    spark-submit --py-files engine.zip scripts/submit_fanout.py \
        --wire-dir /path/to/topic_dump --root /path/to/lakeroot

Local smoke:  python scripts/submit_fanout.py --synthetic 200000
Resume:       add --resume (same --root; tables/catalog/checkpoint kept)

Prints one JSON line: events routed, wall, events/sec, catalog version,
per-table live rows, dead-letter count.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F, types as T  # noqa: E402

from cdm_cbioportal_etl_spark.cdc import (  # noqa: E402
    EnvelopeTailReader,
    encode_debezium,
    gen_change_events,
)
from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA  # noqa: E402
from cdm_cbioportal_etl_spark.lake import LakeCatalog, LakeTable  # noqa: E402

V2_SCHEMA = T.StructType(
    list(REPOS_SCHEMA.fields) + [T.StructField("stars", T.LongType())]
)


def _write_wire(spark: SparkSession, n: int, wire_dir: str, segments: int) -> None:
    """Synthesize the topic dump: repos WAL split by repo parity into two
    source tables; the second half of the stream carries the v2 schema
    (+stars) — exercising mid-stream evolution through the tail."""
    wal = gen_change_events(spark, n)
    parity = F.crc32(F.col("repo")) % 2 == 0
    cut = n // 2
    parts = []
    for name, pred in (("repos_even", parity), ("repos_odd", ~parity)):
        gen1 = wal.filter(pred & (F.col("lsn") < cut))
        gen2 = wal.filter(pred & (F.col("lsn") >= cut)).withColumn(
            "stars", F.crc32(F.col("path")) % 997
        )
        parts.append(encode_debezium(
            gen1, REPOS_SCHEMA, source_table=name, include_schema=True))
        parts.append(encode_debezium(
            gen2, V2_SCHEMA, source_table=name, include_schema=True))
    wire = parts[0]
    for p in parts[1:]:
        wire = wire.unionByName(p)
    wire.repartition(segments).write.mode("overwrite").text(wire_dir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/cdc_fanout")
    ap.add_argument("--wire-dir", default=None,
                    help="existing JSON-lines topic dump; default "
                         "<root>/wire (written by --synthetic)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N events of 2-table wire traffic")
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument("--no-evolve", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="keep tables/catalog/checkpoint from a prior run")
    args = ap.parse_args()

    builder = SparkSession.builder.appName("cdc-fanout")
    if not SparkSession.getActiveSession():
        builder = builder.config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
        ).config("spark.sql.adaptive.enabled", "true")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    wire_dir = args.wire_dir or os.path.join(args.root, "wire")
    if not args.resume:
        shutil.rmtree(args.root, ignore_errors=True)
    if args.synthetic and not (args.resume and os.path.isdir(wire_dir)):
        _write_wire(spark, args.synthetic, wire_dir, args.segments)
    if not os.path.isdir(wire_dir):
        ap.error(f"no wire dir at {wire_dir}; pass --wire-dir or --synthetic N")

    names = ("repos_even", "repos_odd")
    tables = {}
    for name in names:
        troot = os.path.join(args.root, name)
        tables[name] = (
            LakeTable(spark, troot)
            if LakeTable.exists(troot)
            else LakeTable.create(
                spark, troot, T.StructType(list(REPOS_SCHEMA.fields)),
                key_cols=["repo", "path"], n_buckets=args.buckets,
            )
        )
    cat_root = os.path.join(args.root, "catalog")
    if LakeCatalog.exists(cat_root):
        cat = LakeCatalog(spark, cat_root)
    else:
        cat = LakeCatalog.create(spark, cat_root)
        for name, t in tables.items():
            cat.attach(name, t)

    tail = EnvelopeTailReader(
        spark,
        wire_dir,
        tables,
        checkpoint_dir=os.path.join(args.root, "ckpt"),
        dlq_dir=os.path.join(args.root, "dlq"),
        max_files_per_trigger=args.max_files_per_trigger,
        catalog=cat,
        auto_evolve=not args.no_evolve,
    )
    t0 = time.time()
    tail.run_available_now()
    wall = time.time() - t0
    cat.refresh()
    events = sum(
        int(r[0]) for r in
        spark.read.text(wire_dir).agg(F.count("*")).collect()
    )
    out = {
        "events": events,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(events / wall, 1) if wall > 0 else None,
        "catalog_version": cat.version,
        "tables": {
            n: {
                "rows": cat.read(n).count(),
                "schema": [f.name for f in tables[n].schema.fields],
                "applied_lsn": int(
                    tables[n].snapshot.get("ledger", {}).get("applied_lsn", -1)
                ),
            }
            for n in names
        },
        "dead_letters": tail.dead_letters().count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
