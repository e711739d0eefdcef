"""Wire-level schema evolution (cdc/envelope.py schema blob +
cdc/router.py auto_evolve): an upstream ALTER TABLE shows up as a
changed Kafka-Connect schema blob on the envelope, and the sink issues
the matching lake DDL BEFORE decoding — events referencing the new
schema can never apply ahead of the DDL they depend on."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F, types as T

from cdm_cbioportal_etl_spark.cdc import (
    WalRouter,
    connect_schema_json,
    decode_debezium,
    encode_debezium,
    parse_connect_schema,
)
from cdm_cbioportal_etl_spark.lake import (
    LakeCatalog,
    LakeTable,
    SchemaEvolutionError,
)

V1 = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)
V2 = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)


def _batch(spark, schema, rows):
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
    )
    return spark.createDataFrame(rows, f"lsn long, op string, {cols}")


def test_connect_schema_roundtrip():
    blob = connect_schema_json(V2)
    d = json.loads(blob)
    assert [f["field"] for f in d["fields"]] == ["uid", "name", "email"]
    assert parse_connect_schema(blob) == T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in V2.fields]
    )
    with pytest.raises(ValueError, match="unsupported Connect type"):
        parse_connect_schema(
            '{"type":"struct","fields":[{"field":"x","type":"mystery"}]}'
        )
    with pytest.raises(ValueError, match="not a Connect struct"):
        parse_connect_schema('{"type":"int64"}')
    with pytest.raises(ValueError, match="no Connect wire type"):
        connect_schema_json(
            T.StructType([T.StructField("m", T.MapType(
                T.StringType(), T.StringType()))])
        )


def test_encode_with_schema_still_decodes(spark):
    b = _batch(spark, V1, [(1, "insert", 1, "ann"), (2, "delete", 1, None)])
    wire = encode_debezium(b, V1, include_schema=True)
    rows = wire.collect()
    for r in rows:
        env = json.loads(r["value"])
        assert env["schema"]["type"] == "struct"  # blob rides every line
        assert "payload" in env
    out = decode_debezium(wire, V1)
    got = {(r["lsn"], r["op"], r["uid"]) for r in out.collect()}
    assert got == {(1, "insert", 1), (2, "delete", 1)}


def _mk_table(spark, tmp_path, schema=V1):
    return LakeTable.create(
        spark, str(tmp_path / "users"), schema, ["uid"], n_buckets=4
    )


def test_router_auto_evolves_added_column(spark, tmp_path):
    users = _mk_table(spark, tmp_path)
    router = WalRouter(spark, {"users": users}, auto_evolve=True)
    w1 = encode_debezium(
        _batch(spark, V1, [(1, "insert", 1, "ann")]),
        V1, source_table="users", include_schema=True,
    )
    router.apply_wire_batch(w1)
    assert [f.name for f in users.schema.fields] == ["uid", "name"]
    # upstream ALTER: v2 envelopes carry email — sink widens, then merges
    w2 = encode_debezium(
        _batch(spark, V2, [(2, "insert", 2, "bob", "b@x"),
                           (3, "update", 1, "anne", "a@x")]),
        V2, source_table="users", include_schema=True,
    )
    router.apply_wire_batch(w2)
    assert [f.name for f in users.schema.fields] == ["uid", "name", "email"]
    got = {r["uid"]: (r["name"], r["email"]) for r in users.read().collect()}
    # pre-evolution row got the new column null-filled at read (no rewrite)
    assert got == {1: ("anne", "a@x"), 2: ("bob", "b@x")}


def test_router_auto_evolve_widens_types(spark, tmp_path):
    narrow = T.StructType(
        [T.StructField("uid", T.LongType()), T.StructField("n", T.IntegerType())]
    )
    wide = T.StructType(
        [T.StructField("uid", T.LongType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), narrow, ["uid"], n_buckets=2
    )
    router = WalRouter(spark, {"t": t}, auto_evolve=True)
    w = encode_debezium(
        _batch(spark, wide, [(1, "insert", 1, 2**40)]),
        wide, source_table="t", include_schema=True,
    )
    router.apply_wire_batch(w)
    assert dict(
        (f.name, f.dataType.simpleString()) for f in t.schema.fields
    )["n"] == "bigint"
    assert t.read().collect()[0]["n"] == 2**40


def test_router_auto_evolve_rejects_incompatible(spark, tmp_path):
    users = _mk_table(spark, tmp_path)
    bad = T.StructType(
        [T.StructField("uid", T.LongType()),
         T.StructField("name", T.DoubleType())]
    )
    router = WalRouter(spark, {"users": users}, auto_evolve=True)
    w = encode_debezium(
        spark.createDataFrame([(1, "insert", 1, 2.5)],
                              "lsn long, op string, uid long, name double"),
        bad, source_table="users", include_schema=True,
    )
    with pytest.raises(SchemaEvolutionError, match="incompatible"):
        router.apply_wire_batch(w)


def test_without_auto_evolve_unknown_columns_ignored(spark, tmp_path):
    users = _mk_table(spark, tmp_path)
    router = WalRouter(spark, {"users": users})  # default: ignore
    w = encode_debezium(
        _batch(spark, V2, [(1, "insert", 1, "ann", "a@x")]),
        V2, source_table="users", include_schema=True,
    )
    router.apply_wire_batch(w)
    assert [f.name for f in users.schema.fields] == ["uid", "name"]
    assert {tuple(r) for r in users.read().collect()} == {(1, "ann")}


def test_auto_evolve_publishes_atomically_with_catalog(spark, tmp_path):
    users = _mk_table(spark, tmp_path)
    cat = LakeCatalog.create(spark, str(tmp_path / "cat"))
    cat.attach("users", users)
    router = WalRouter(spark, {"users": users}, catalog=cat,
                       auto_evolve=True)
    v0 = cat.version
    w = encode_debezium(
        _batch(spark, V2, [(1, "insert", 1, "ann", "a@x")]),
        V2, source_table="users", include_schema=True,
    )
    router.apply_wire_batch(w, batch_id="wire-ev")
    # DDL + data rode ONE catalog publish
    assert cat.version == v0 + 1
    got = cat.read("users").collect()
    assert {(r["uid"], r["name"], r["email"]) for r in got} == {(1, "ann", "a@x")}
    # the pre-publish cut still reads with the OLD schema
    old = cat.read("users", catalog_version=v0)
    assert [f.name for f in old.schema.fields] == ["uid", "name"]
    assert old.count() == 0


def test_wire_schema_collect_is_schema_generations_not_rows(spark, tmp_path):
    # 1000 rows, one schema generation -> exactly one distinct blob
    users = _mk_table(spark, tmp_path)
    rows = [(i, "insert", i, f"u{i}") for i in range(1000)]
    w = encode_debezium(
        _batch(spark, V1, rows), V1, source_table="users",
        include_schema=True,
    )
    n = (
        w.select(F.get_json_object("value", "$.schema").alias("s"))
        .distinct()
        .count()
    )
    assert n == 1
