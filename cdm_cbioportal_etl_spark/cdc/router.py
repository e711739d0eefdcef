"""Multi-table CDC routing: one wire stream, many lake tables.

A real change capture deployment rarely feeds one table: the connector
emits envelopes for EVERY table in the source database (Debezium's
``payload.source.table``), and the sink must route each event to its
own lake table — each with its own schema, bucketing, and exactly-once
ledger.  This module is that sink:

- ``WalRouter.apply_wire_batch``: route one batch of JSON envelopes to
  N registered tables.  Per table: a cheap ``get_json_object`` routing
  filter (map-only, prunes before the full typed parse), the typed
  envelope decode against THAT table's schema, and the normal
  idempotent merge.  Lines no registered table claims, plus per-table
  decode rejects, come back as a dead-letter DataFrame
  ``(raw_value, reason)`` — reason ``unrouteable`` covers both corrupt
  JSON and unknown table names (indistinguishable without a parse).
- ``EnvelopeTailReader``: the streaming shape — tail a directory of
  JSON-line files (the Kafka-topic-dump layout) with Structured
  Streaming, apply each micro-batch through the router, and
  idempotently persist dead letters per epoch.  A replayed epoch
  re-merges (each table's LSN ledger no-ops it) and OVERWRITES its own
  epoch's DLQ partition, so the whole chain — good rows and dead
  letters both — is exactly-once.

Scale shape: routing is N map-only passes over the batch (N = number
of registered tables, a catalog-sized constant), each pushing its
filter into the scan; no shuffle is added beyond each table's own
merge.  Re-imagines the reference's per-product staging writes
(reference pipeline/cbioportal/* writing patient/sample/timeline
staging tables per run) as one declarative multi-table change sink.

Provenance: reference pipeline/lib/summary/summary_config_processor.py
writes several cBioPortal staging tables from one source pull; here the
"one source, many tables" shape is the changelog itself.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdm_cbioportal_etl_spark.cdc.envelope import (
    decode_debezium_with_rejects,
)
from cdm_cbioportal_etl_spark.lake.table import LakeTable, MergeStats

__all__ = ["WalRouter", "EnvelopeTailReader"]


class WalRouter:
    """Routes a wire batch of Debezium JSON envelopes to registered
    LakeTables by ``payload.source.table``."""

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, LakeTable],
        catalog: "Any | None" = None,
        auto_evolve: bool = False,
    ):
        if not tables:
            raise ValueError("WalRouter needs at least one table")
        self.spark = spark
        self.tables = dict(tables)
        # auto_evolve: honor the Kafka-Connect schema blob riding each
        # envelope (schemas.enable=true) — an upstream ALTER TABLE shows
        # up as new/widened fields in the blob, and the sink issues the
        # matching lake DDL BEFORE decoding the sub-batch, so events
        # referencing the new schema can never apply ahead of the DDL
        # they depend on (the north-star registry-before-upsert rule,
        # BASELINE.json).  Off by default: without it, unknown wire
        # columns are silently ignored (a sink connector's default).
        self.auto_evolve = auto_evolve
        # optional LakeCatalog (lake/txn.py): when set, each wire batch's
        # N per-table merges publish as ONE atomic catalog commit, so a
        # reader joining the routed tables through the catalog never sees
        # a half-applied fan-out
        self.catalog = catalog
        if catalog is not None:
            missing = sorted(
                set(tables) - set(catalog.snapshot["tables"])
            )
            if missing:
                raise ValueError(
                    f"routed tables {missing} are not attached to the "
                    f"catalog at {catalog.root}"
                )
            # share the router's handles so merge + publish see one
            # snapshot state per table (fewer spurious commit retries)
            catalog._handles.update(self.tables)

    def apply_wire_batch(
        self,
        raw: DataFrame,
        value_col: str = "value",
        batch_id: str | None = None,
        merge_kwargs: dict[str, Any] | None = None,
    ) -> tuple[dict[str, MergeStats], DataFrame]:
        """Returns ``(per-table MergeStats, dead-letter DataFrame)``.

        The routing predicate uses ``get_json_object`` (no typed parse)
        so each table's pass prunes to its own lines before the full
        envelope decode; the batch is checkpointed once so the N routing
        passes and the DLQ complement all reuse one evaluation."""
        raw = raw.select(F.col(value_col).alias("value")).localCheckpoint()
        route = F.get_json_object(F.col("value"), "$.payload.source.table")
        stats: dict[str, MergeStats] = {}
        dlqs: list[DataFrame] = []
        txn = self.catalog.transaction() if self.catalog is not None else None
        for name, table in self.tables.items():
            sub = raw.filter(route == name)
            if self.auto_evolve:
                self._evolve_from_wire(name, table, sub, txn)
            decoded, rejects = decode_debezium_with_rejects(
                sub, table.schema
            )
            mk = dict(
                batch_id=(f"{batch_id}-{name}" if batch_id else None),
                **(merge_kwargs or {}),
            )
            stats[name] = (
                txn.merge(name, decoded, **mk)
                if txn is not None
                else table.merge(decoded, **mk)
            )
            dlqs.append(
                rejects.withColumn(
                    "reason", F.concat(F.lit(f"{name}:"), F.col("reason"))
                )
            )
        # lines claimed by NO table: unknown table name, corrupt JSON,
        # or tombstones (null value — routine, dropped like the decoder)
        unrouted = raw.filter(
            F.col("value").isNotNull()
            & (route.isNull() | ~route.isin(*self.tables.keys()))
        ).select(
            F.col("value").alias("raw_value"),
            F.lit("unrouteable").alias("reason"),
        )
        dlq = unrouted
        for d in dlqs:
            dlq = dlq.unionByName(d)
        if txn is not None:
            txn.commit(lineage={"batch_id": batch_id})
        return stats, dlq

    def _evolve_from_wire(
        self, name: str, table: LakeTable, sub: DataFrame, txn: "Any | None"
    ) -> None:
        """Fold every DISTINCT wire schema blob in this sub-batch into
        the table schema and issue one DDL commit if anything grew.

        The distinct-collect is metadata-scale: the blob is one constant
        string per upstream schema generation, so the result set is the
        number of schema CHANGES in the batch (almost always 0 or 1),
        never the row count.  Under a catalog transaction the DDL rides
        the same publish as the data — schema change + rows become
        visible in one atomic cut."""
        from cdm_cbioportal_etl_spark.cdc.envelope import parse_connect_schema
        from cdm_cbioportal_etl_spark.cdc.registry import merged_evolution

        blobs = [
            r[0]
            for r in sub.select(
                F.get_json_object(F.col("value"), "$.schema")
            ).distinct().collect()
            if r[0]
        ]
        target = table.schema
        changed = False
        for blob in blobs:
            wire = parse_connect_schema(blob)
            target, ch = merged_evolution(target, list(wire.fields))
            changed = changed or ch
        if changed:
            if txn is not None:
                txn.run(name, lambda t: t.evolve_schema(target))
            else:
                table.evolve_schema(target)


class EnvelopeTailReader:
    """Structured-Streaming tail of a JSON-lines envelope directory,
    routed to N tables with an idempotent per-epoch dead-letter sink."""

    def __init__(
        self,
        spark: SparkSession,
        wire_dir: str,
        tables: dict[str, LakeTable],
        checkpoint_dir: str,
        dlq_dir: str | None = None,
        max_files_per_trigger: int = 8,
        merge_kwargs: dict[str, Any] | None = None,
        catalog: "Any | None" = None,
        auto_evolve: bool = False,
    ):
        self.spark = spark
        self.wire_dir = wire_dir
        self.router = WalRouter(
            spark, tables, catalog=catalog, auto_evolve=auto_evolve
        )
        self.checkpoint_dir = checkpoint_dir
        self.dlq_dir = dlq_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.merge_kwargs = dict(merge_kwargs or {})

    def _apply(self, batch: DataFrame, epoch_id: int) -> None:
        _stats, dlq = self.router.apply_wire_batch(
            batch,
            batch_id=f"wire-epoch-{epoch_id}",
            merge_kwargs=self.merge_kwargs,
        )
        if self.dlq_dir is not None:
            # epoch-keyed OVERWRITE: a replayed epoch rewrites the same
            # partition instead of appending duplicates — the DLQ stays
            # exactly-once alongside the ledgered merges
            dlq.write.mode("overwrite").parquet(
                os.path.join(self.dlq_dir, f"epoch={epoch_id}")
            )

    def run_available_now(self, await_termination_sec: int | None = 300):
        q = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .load(self.wire_dir)
            .writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if await_termination_sec is not None:
            q.awaitTermination(await_termination_sec)
        return q

    def dead_letters(self) -> DataFrame:
        """All persisted dead letters (empty DataFrame if none/no dir)."""
        if self.dlq_dir is None or not os.path.isdir(self.dlq_dir):
            return self.spark.createDataFrame(
                [], "raw_value string, reason string"
            )
        return self.spark.read.parquet(self.dlq_dir).select(
            "raw_value", "reason"
        )
