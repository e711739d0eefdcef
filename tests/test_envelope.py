"""Debezium envelope codec: decode/encode roundtrip, op mapping,
tombstone handling, delete key materialization, partial-image passthrough,
and end-to-end replay equivalence through the merge engine."""

import json

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.cdc import (
    CdcReplayer,
    decode_debezium,
    encode_debezium,
    envelope_schema,
    gen_change_events,
)
from cdm_cbioportal_etl_spark.cdc.generator import REPOS_SCHEMA
from cdm_cbioportal_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _env(op, lsn, before=None, after=None):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "source": {"lsn": lsn, "ts_ms": 1, "db": "d", "table": "t"},
                "op": op,
                "ts_ms": 1,
            }
        }
    )


def test_decode_op_mapping_and_images(spark):
    rows = [
        (_env("c", 10, after={"k": 1, "name": "a", "v": 5}),),
        (_env("r", 11, after={"k": 2, "name": "b", "v": 6}),),
        (_env("u", 12, before={"k": 1, "name": "a", "v": 5}, after={"k": 1, "name": "a2", "v": 7}),),
        (_env("d", 13, before={"k": 2, "name": "b", "v": 6}),),
    ]
    raw = spark.createDataFrame(rows, ["value"])
    got = {r.lsn: r for r in decode_debezium(raw, SCHEMA).collect()}
    assert got[10].op == "insert" and got[10].k == 1 and got[10].v == 5
    assert got[11].op == "insert" and got[11].k == 2
    assert got[12].op == "update" and got[12].name == "a2" and got[12].v == 7
    # delete takes its keys from the BEFORE image
    assert got[13].op == "delete" and got[13].k == 2 and got[13].name == "b"


def test_decode_drops_tombstones_and_garbage(spark):
    rows = [
        (_env("c", 1, after={"k": 1, "name": "x", "v": 1}),),
        ("null",),  # Kafka log-compaction tombstone value
        (json.dumps({"payload": None}),),
        (json.dumps({"payload": {"op": None, "source": {"lsn": 9}}}),),
        ("{not json at all",),
        (_env("z", 2, after={"k": 2, "name": "y", "v": 2}),),  # unknown op
    ]
    raw = spark.createDataFrame(rows, ["value"])
    out = decode_debezium(raw, SCHEMA).collect()
    assert len(out) == 1 and out[0].k == 1


def test_roundtrip_canonical_batch(spark):
    batch = spark.createDataFrame(
        [
            (1, "insert", 1, "a", 10),
            (2, "update", 1, "a2", 11),
            (3, "delete", 2, "b", 0),
            (4, "upsert", 3, "c", 30),
        ],
        ["lsn", "op", "k", "name", "v"],
    )
    wire = encode_debezium(batch, SCHEMA)
    back = decode_debezium(wire, SCHEMA).orderBy("lsn").collect()
    assert [r.op for r in back] == ["insert", "update", "delete", "insert"]
    assert [r.k for r in back] == [1, 1, 2, 3]
    assert [r.name for r in back] == ["a", "a2", "b", "c"]
    # the wire really is Debezium-shaped: delete has only before
    d = json.loads(wire.collect()[2].value)["payload"]
    assert d["op"] == "d" and d["after"] is None and d["before"]["k"] == 2
    c = json.loads(wire.collect()[0].value)["payload"]
    assert c["op"] == "c" and c["before"] is None


def test_partial_image_nulls_survive_decode(spark):
    # TOAST shape: unchanged column arrives NULL in after
    raw = spark.createDataFrame(
        [(_env("u", 5, after={"k": 1, "name": None, "v": 9}),)], ["value"]
    )
    r = decode_debezium(raw, SCHEMA).collect()[0]
    assert r.name is None and r.v == 9


def test_envelope_replay_matches_direct_replay(spark, tmp_path):
    """Encoding the synthetic WAL to Debezium wire format and decoding it
    back must replay to the exact same final state as the direct path."""
    wal = gen_change_events(spark, 20_000, n_repos=20, seed=7)
    decoded = decode_debezium(encode_debezium(wal, REPOS_SCHEMA), REPOS_SCHEMA)

    t_direct = LakeTable.create(
        spark, str(tmp_path / "direct"), REPOS_SCHEMA, ["repo", "path"], n_buckets=8
    )
    CdcReplayer(t_direct).replay_range_batches(wal, 0, 20_000, batch_size=5_000)
    t_wire = LakeTable.create(
        spark, str(tmp_path / "wire"), REPOS_SCHEMA, ["repo", "path"], n_buckets=8
    )
    CdcReplayer(t_wire).replay_range_batches(decoded, 0, 20_000, batch_size=5_000)

    a = t_direct.read().orderBy("repo", "path").collect()
    b = t_wire.read().orderBy("repo", "path").collect()
    assert a == b and len(a) > 0


def test_decode_plan_is_single_stage(spark):
    """The decoder must stay a map-only projection: no shuffle, no UDF —
    on 100 TB of envelopes this is the difference between a pipelined
    scan and an extra stage."""
    raw = spark.createDataFrame([(_env("c", 1, after={"k": 1, "name": "x", "v": 1}),)], ["value"])
    plan = decode_debezium(raw, SCHEMA)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    schema = envelope_schema(SCHEMA)
    assert schema["payload"].dataType["op"].dataType == T.StringType()


def test_dead_letter_split_accounts_for_every_line(spark):
    from cdm_cbioportal_etl_spark.cdc import decode_debezium_with_rejects

    rows = [
        (_env("c", 1, after={"k": 1, "name": "a", "v": 5}),),   # good
        (None,),                                                 # tombstone
        ("{not json at all",),                                   # corrupt
        (json.dumps({"payload": {"source": {"lsn": 2}}}),),      # corrupt (no op)
        (_env("x", 3, after={"k": 3, "name": "c", "v": 7}),),    # unknown_op
        (_env("u", None, after={"k": 4, "name": "d", "v": 8}),), # missing_lsn
        (_env("d", 5),),                                         # missing_image
        (_env("d", 6, before={"k": 6, "name": "f", "v": 9}),),   # good delete
    ]
    raw = spark.createDataFrame(rows, ["value"])
    decoded, rejects = decode_debezium_with_rejects(raw, SCHEMA)
    got = {(r.lsn, r.op, r.k) for r in decoded.collect()}
    assert got == {(1, "insert", 1), (6, "delete", 6)}
    why = sorted(r.reason for r in rejects.collect())
    assert why == ["corrupt", "corrupt", "missing_image", "missing_lsn", "unknown_op"]
    # tombstones are routine: dropped, never dead-lettered
    assert rejects.filter("reason = 'tombstone'").count() == 0
    # the default decoder's good set is identical (one semantics)
    assert {
        (r.lsn, r.op, r.k) for r in decode_debezium(raw, SCHEMA).collect()
    } == got


def test_dead_letter_plan_is_map_only(spark):
    from cdm_cbioportal_etl_spark.cdc import decode_debezium_with_rejects

    raw = spark.createDataFrame(
        [(_env("c", 1, after={"k": 1, "name": "x", "v": 1}),)], ["value"]
    )
    decoded, rejects = decode_debezium_with_rejects(raw, SCHEMA)
    for df in (decoded, rejects):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan
