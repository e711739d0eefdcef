"""Multi-table CDC routing (cdc/router.py): one wire stream of Debezium
envelopes fans out to N lake tables with per-table exactly-once ledgers
and an idempotent dead-letter sink."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.cdc import EnvelopeTailReader, WalRouter
from cdm_cbioportal_etl_spark.lake import LakeTable

USERS = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)
ORDERS = T.StructType(
    [
        T.StructField("oid", T.LongType()),
        T.StructField("uid", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _env(table, op, lsn, before=None, after=None):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "source": {"lsn": lsn, "ts_ms": 1, "db": "d", "table": table},
                "op": op,
                "ts_ms": 1,
            }
        }
    )


WIRE = [
    _env("users", "c", 1, after={"uid": 1, "name": "ann"}),
    _env("orders", "c", 1, after={"oid": 10, "uid": 1, "total": 5.0}),
    _env("users", "u", 2, after={"uid": 1, "name": "anne"}),
    _env("orders", "d", 2, before={"oid": 10, "uid": 1, "total": 5.0}),
    _env("orders", "c", 3, after={"oid": 11, "uid": 1, "total": 7.5}),
    _env("ledger", "c", 4, after={"x": 1}),     # unknown table
    "{broken json",                              # unrouteable
    _env("users", "z", 5, after={"uid": 2, "name": "bob"}),  # unknown op
]


def _mk_tables(spark, tmp_path):
    users = LakeTable.create(
        spark, str(tmp_path / "users"), USERS, ["uid"], n_buckets=4
    )
    orders = LakeTable.create(
        spark, str(tmp_path / "orders"), ORDERS, ["oid"], n_buckets=4
    )
    return users, orders


def test_router_batch_fanout_and_dlq(spark, tmp_path):
    users, orders = _mk_tables(spark, tmp_path)
    raw = spark.createDataFrame([(v,) for v in WIRE], ["value"])
    router = WalRouter(spark, {"users": users, "orders": orders})
    stats, dlq = router.apply_wire_batch(raw)
    assert stats["users"].batch_keys == 1 and stats["orders"].batch_keys == 2
    assert {tuple(r) for r in users.read().collect()} == {(1, "anne")}
    assert {tuple(r) for r in orders.read().collect()} == {(11, 1, 7.5)}
    reasons = sorted(r.reason for r in dlq.collect())
    assert reasons == ["unrouteable", "unrouteable", "users:unknown_op"]


def test_router_redelivery_is_noop(spark, tmp_path):
    users, orders = _mk_tables(spark, tmp_path)
    raw = spark.createDataFrame([(v,) for v in WIRE], ["value"])
    router = WalRouter(spark, {"users": users, "orders": orders})
    router.apply_wire_batch(raw)
    v_u, v_o = users.snapshot["version"], orders.snapshot["version"]
    stats, _ = router.apply_wire_batch(raw)  # full redelivery
    assert all(s.batch_keys == 0 for s in stats.values())
    assert {tuple(r) for r in users.read().collect()} == {(1, "anne")}
    # no-op merges commit nothing
    assert users.snapshot["version"] == v_u
    assert orders.snapshot["version"] == v_o


def test_streaming_envelope_tail(spark, tmp_path):
    users, orders = _mk_tables(spark, tmp_path)
    wire_dir = str(tmp_path / "wire")
    os.makedirs(wire_dir, exist_ok=True)
    for i, chunk in enumerate([WIRE[:4], WIRE[4:]]):
        with open(os.path.join(wire_dir, f"chunk-{i:04d}.jsonl"), "w") as fh:
            fh.write("\n".join(chunk) + "\n")
    dlq_dir = str(tmp_path / "dlq")
    reader = EnvelopeTailReader(
        spark,
        wire_dir,
        {"users": users, "orders": orders},
        str(tmp_path / "ckpt"),
        dlq_dir=dlq_dir,
        max_files_per_trigger=1,
    )
    reader.run_available_now()
    assert {tuple(r) for r in users.read().collect()} == {(1, "anne")}
    assert {tuple(r) for r in orders.read().collect()} == {(11, 1, 7.5)}
    dl1 = sorted(r.reason for r in reader.dead_letters().collect())
    assert dl1 == ["unrouteable", "unrouteable", "users:unknown_op"]

    # lost stream state: full redelivery merges no-op AND the DLQ does
    # not duplicate (epoch-keyed overwrite)
    EnvelopeTailReader(
        spark,
        wire_dir,
        {"users": users, "orders": orders},
        str(tmp_path / "ckpt2"),
        dlq_dir=dlq_dir,
        max_files_per_trigger=1,
    ).run_available_now()
    assert {tuple(r) for r in users.read().collect()} == {(1, "anne")}
    assert (
        sorted(r.reason for r in reader.dead_letters().collect()) == dl1
    )
