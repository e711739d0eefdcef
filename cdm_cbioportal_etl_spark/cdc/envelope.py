"""Debezium-style CDC envelope codec → the engine's canonical batch.

Real CDC pipelines rarely hand you ``(lsn, op, keys, payload)`` directly:
they hand you the Debezium wire format — one JSON envelope per change,
``payload.op`` in ``{c,r,u,d}``, full row images under ``payload.before``
/ ``payload.after``, and the source log position at
``payload.source.lsn``.  This module is the ingest adapter: decode the
envelope column into the canonical batch shape every other engine
surface (LakeTable.merge, CdcReplayer, WalTailReader) consumes, and
encode the canonical shape back out (the test/wire-simulation path).

Both directions are single JVM-side expressions (``from_json`` /
``to_json`` on a typed struct) — no Python UDF, so decoding 100 TB of
envelopes is a map-only scan that pipelines into the merge shuffle with
zero extra stages.

Semantics (Debezium public contract):
  - op ``c`` (create) and ``r`` (snapshot read) → ``insert``;
    ``u`` → ``update``; ``d`` → ``delete``.
  - the row image is ``after`` except for deletes, which only carry
    ``before``.
  - Kafka tombstones (null payload / null op — the null-value record
    emitted after a delete for log compaction) are dropped.
  - partial images (Postgres TOAST: unchanged big columns arrive NULL
    in ``after``) ride through untouched — pair the decoder with
    ``LakeTable.merge(partial_images=True)`` and NULL means "unchanged".

Provenance: generalizes the reference's fetch-then-normalize ingestion
(reference pipeline/lib/cdm_utilities.py read + column-normalize steps)
to the changelog-stream shape this engine ingests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

__all__ = [
    "envelope_schema",
    "decode_debezium",
    "decode_debezium_with_rejects",
    "encode_debezium",
    "connect_schema_json",
    "parse_connect_schema",
]

# Kafka-Connect primitive type names <-> Spark types (the subset the
# wire-evolution path speaks; Debezium's logical types collapse to
# these primitives on the JSON converter)
_SPARK_TO_CONNECT = {
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "boolean": "boolean",
    "string": "string",
    "binary": "bytes",
    "date": "int32",       # Connect date = days since epoch
    "timestamp": "int64",  # Connect timestamp = epoch millis
}
_CONNECT_TO_SPARK = {
    "int8": T.IntegerType(),
    "int16": T.IntegerType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def connect_schema_json(data_schema: T.StructType) -> str:
    """The Kafka-Connect inline schema blob (what Debezium emits with
    ``schemas.enable=true``) for a row schema — the wire's authoritative
    statement of what columns this envelope carries, and the signal the
    auto-evolving sink (cdc/router.py) keys DDL off."""
    import json as _json

    fields = []
    for f in data_schema.fields:
        ct = _SPARK_TO_CONNECT.get(f.dataType.simpleString())
        if ct is None:
            raise ValueError(
                f"no Connect wire type for column {f.name}: "
                f"{f.dataType.simpleString()}"
            )
        fields.append({"field": f.name, "type": ct, "optional": True})
    return _json.dumps(
        {"type": "struct", "fields": fields, "optional": False},
        separators=(",", ":"),
    )


def parse_connect_schema(blob: str) -> T.StructType:
    """Inverse of ``connect_schema_json``: the wire blob → a Spark row
    schema.  Unknown Connect types fail loudly — silently guessing a
    type would corrupt the evolved table."""
    import json as _json

    d = _json.loads(blob)
    if d.get("type") != "struct" or not isinstance(d.get("fields"), list):
        raise ValueError(f"not a Connect struct schema: {blob[:120]!r}")
    out = []
    for f in d["fields"]:
        t = _CONNECT_TO_SPARK.get(f.get("type"))
        if t is None:
            raise ValueError(
                f"unsupported Connect type {f.get('type')!r} for field "
                f"{f.get('field')!r}"
            )
        out.append(T.StructField(str(f["field"]), t, True))
    return T.StructType(out)


def envelope_schema(data_schema: T.StructType) -> T.StructType:
    """The typed Debezium envelope for a given row schema.  ``schema``
    (the Kafka-Connect inline schema blob) is intentionally absent: we
    parse only ``payload``; unknown envelope fields are ignored by
    ``from_json`` (mode PERMISSIVE), which is what makes the decoder
    tolerant of connector-version drift."""
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("before", data_schema),
                        T.StructField("after", data_schema),
                        T.StructField(
                            "source",
                            T.StructType(
                                [
                                    T.StructField("lsn", T.LongType()),
                                    T.StructField("ts_ms", T.LongType()),
                                    T.StructField("db", T.StringType()),
                                    T.StructField("table", T.StringType()),
                                ]
                            ),
                        ),
                        T.StructField("op", T.StringType()),
                        T.StructField("ts_ms", T.LongType()),
                    ]
                ),
            )
        ]
    )


def _classified(raw: DataFrame, data_schema: T.StructType, value_col: str):
    """Shared decode plan: parse once, classify every line.  ``_why`` is
    null for decodable envelopes, else one of {tombstone, corrupt,
    unknown_op, missing_lsn, missing_image}."""
    v = F.col(value_col)
    p = F.from_json(v, envelope_schema(data_schema))["payload"]
    img = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    why = (
        # Kafka log-compaction tombstone: the null-VALUE record after a
        # delete — routine, silently dropped, never dead-lettered
        F.when(v.isNull(), F.lit("tombstone"))
        # from_json PERMISSIVE yields a null struct on malformed JSON;
        # a parsed envelope without an op is equally unusable
        .when(p.isNull() | p["op"].isNull(), F.lit("corrupt"))
        .when(~p["op"].isin("c", "r", "u", "d"), F.lit("unknown_op"))
        .when(p["source"]["lsn"].isNull(), F.lit("missing_lsn"))
        .when(img.isNull(), F.lit("missing_image"))
    )
    op = (
        F.when(p["op"].isin("c", "r"), F.lit("insert"))
        .when(p["op"] == "u", F.lit("update"))
        .when(p["op"] == "d", F.lit("delete"))
    )
    return raw.select(
        v.alias("_raw"),
        why.alias("_why"),
        p["source"]["lsn"].alias("lsn"),
        op.alias("op"),
        img.alias("_img"),
    )


def decode_debezium(
    raw: DataFrame,
    data_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """``raw[value_col]`` (JSON envelope string per row) → canonical
    batch ``(lsn, op, <data columns>)``.

    Deletes materialize the ``before`` image so the key columns are
    populated (Debezium deletes carry no ``after``); payload columns on
    a delete are whatever ``before`` held — the merge path ignores them.
    Tombstones and undecodable lines are dropped, matching a sink
    connector's default; use ``decode_debezium_with_rejects`` when the
    pipeline must account for every line (dead-letter queue).
    """
    c = _classified(raw, data_schema, value_col)
    return c.where(F.col("_why").isNull()).select(
        "lsn", "op", *[F.col("_img")[f.name].alias(f.name) for f in data_schema.fields]
    )


def decode_debezium_with_rejects(
    raw: DataFrame,
    data_schema: T.StructType,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter variant: ``(decoded, rejects)`` where ``rejects`` is
    ``(raw_value, reason)`` for every line that is neither decodable nor
    a routine tombstone — reason in {corrupt, unknown_op, missing_lsn,
    missing_image}.  A production tail sinks ``rejects`` to a quarantine
    table and alerts on its rate; exactly-once of the good path is
    untouched (the LSN ledger never sees a rejected line).  Both outputs
    share one classification plan — at scale this costs one extra scan
    of the envelope column, not a second parse job per side."""
    c = _classified(raw, data_schema, value_col)
    decoded = c.where(F.col("_why").isNull()).select(
        "lsn", "op", *[F.col("_img")[f.name].alias(f.name) for f in data_schema.fields]
    )
    rejects = c.where(
        F.col("_why").isNotNull() & (F.col("_why") != "tombstone")
    ).select(F.col("_raw").alias("raw_value"), F.col("_why").alias("reason"))
    return decoded, rejects


def _row_struct(data_schema: T.StructType, null_when: Column | None) -> Column:
    row = F.struct(*[F.col(f.name).alias(f.name) for f in data_schema.fields])
    if null_when is None:
        return row
    return F.when(null_when, F.lit(None).cast(data_schema)).otherwise(row)


def encode_debezium(
    batch: DataFrame,
    data_schema: T.StructType,
    source_db: str = "engine",
    source_table: str = "t",
    include_schema: bool = False,
) -> DataFrame:
    """Canonical batch ``(lsn, op, <data columns>)`` → one-column
    DataFrame ``value`` of Debezium JSON envelopes (the wire shape the
    decoder consumes; used by tests and by the replicator's export path).

    ``insert``/``upsert`` → op ``c`` with ``after`` only; ``update`` →
    op ``u`` (before omitted — the engine's canonical shape carries no
    pre-image; partial-image nulls in the payload stay null in
    ``after``); ``delete`` → op ``d`` with ``before`` only.
    """
    is_del = F.col("op") == "delete"
    dbz_op = (
        F.when(F.col("op").isin("insert", "upsert"), F.lit("c"))
        .when(is_del, F.lit("d"))
        .otherwise(F.lit("u"))
    )
    envelope = F.struct(
        F.struct(
            _row_struct(data_schema, null_when=~is_del).alias("before"),
            _row_struct(data_schema, null_when=is_del).alias("after"),
            F.struct(
                F.col("lsn").cast("long").alias("lsn"),
                F.lit(None).cast("long").alias("ts_ms"),
                F.lit(source_db).alias("db"),
                F.lit(source_table).alias("table"),
            ).alias("source"),
            dbz_op.alias("op"),
            F.lit(None).cast("long").alias("ts_ms"),
        ).alias("payload")
    )
    # Debezium emits explicit nulls ("after": null on a delete);
    # to_json drops null fields unless told otherwise
    if include_schema:
        # schemas.enable=true wire shape: the Connect schema blob rides
        # every envelope.  One constant per batch — string concat, not a
        # per-row serialization of the schema struct.
        payload_json = F.to_json(
            envelope["payload"], {"ignoreNullFields": "false"}
        )
        return batch.select(
            F.concat(
                F.lit('{"schema":' + connect_schema_json(data_schema)
                      + ',"payload":'),
                payload_json,
                F.lit("}"),
            ).alias("value")
        )
    return batch.select(
        F.to_json(envelope, {"ignoreNullFields": "false"}).alias("value")
    )
