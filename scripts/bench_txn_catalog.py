"""Measure the multi-table catalog's publish overhead (lake/txn.py).

The design claim: a catalog publish is O(tables) metadata — one small
JSON + one fsync'd rename — independent of data volume, so making a CDC
fan-out atomic costs milliseconds per wire batch regardless of how much
data the batch carried.  This script measures publish wall time at
increasing member-table counts and the per-batch overhead a
catalog-bound router adds over a bare router.

Usage: python scripts/bench_txn_catalog.py [--tables 4 16 64 256]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from cdm_cbioportal_etl_spark.lake import LakeCatalog, LakeTable  # noqa: E402
from cdm_cbioportal_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", nargs="+", type=int,
                    default=[4, 16, 64, 256])
    ap.add_argument("--publishes", type=int, default=20)
    args = ap.parse_args()
    spark = get_spark("bench-txn-catalog")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    out: dict[str, object] = {"publishes_per_point": args.publishes}
    points = []
    work = tempfile.mkdtemp(prefix="txncat-")
    try:
        for n in args.tables:
            root = os.path.join(work, f"n{n}")
            cat = LakeCatalog.create(spark, os.path.join(root, "cat"))
            # attach n tables; the publish payload grows with n
            for i in range(n):
                t = LakeTable.create(
                    spark, os.path.join(root, f"t{i}"), schema, ["k"],
                    n_buckets=2,
                )
                cat.attach(f"t{i}", t)
            # time bare publishes (pins unchanged — pure catalog cost)
            walls = []
            for _ in range(args.publishes):
                t0 = time.perf_counter()
                cat._publish(
                    dict(cat.snapshot["tables"]), base=cat.version,
                    lineage={"operation": "bench"},
                )
                walls.append(time.perf_counter() - t0)
            points.append(
                {
                    "tables": n,
                    "publish_ms_median": round(
                        statistics.median(walls) * 1e3, 3
                    ),
                    "publish_ms_max": round(max(walls) * 1e3, 3),
                    "catalog_bytes": os.path.getsize(
                        cat._cat_path(cat.version)
                    ),
                }
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    out["points"] = points
    print(json.dumps(out))


if __name__ == "__main__":
    main()
