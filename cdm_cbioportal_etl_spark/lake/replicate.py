"""Row-level downstream replication off the change data feed.

Completes the CDC chain WAL → table → CDF → replica: a
:class:`TableReplicator` maintains an exact row-level copy of a source
LakeTable by consuming ``table_changes`` intervals — the
engine-internal analog of a Kafka-Connect/Debezium sink chain, and the
row-level sibling of :class:`IncrementalAggView` (which consumes the
same feed into an aggregate).

Watermarking reuses the exactly-once machinery outright: every sync
merges its diff batch with ``lsn = source snapshot version``, so the
replica's LSN ledger IS the consumption watermark — a crashed sync
re-runs the same interval and deduplicates to a no-op, a completed one
makes re-delivery skip (the IncrementalAggView pattern,
lake/incremental.py:10-15).

Scale shape per sync: one snapshot diff (O(changed files) via
``_diff_plan`` bucket/file restriction), one merge of O(changed keys).
Nothing is O(source table) after the initial copy.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession, functions as F

from .table import LakeTable, schema_meta


class TableReplicator:
    """An exact row-level replica of a source LakeTable, maintained
    incrementally from its change data feed.  Reopenable: the replica is
    itself a plain LakeTable; ``applied_lsn`` doubles as the last synced
    source version."""

    def __init__(self, spark: SparkSession, root: str):
        self.table = LakeTable(spark, root)

    # ------------------------------------------------------------------ #
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        n_buckets: int | None = None,
    ) -> "TableReplicator":
        """Create the replica table (source schema + keys) and run the
        initial sync — ``table_changes(0, now)`` emits the source's
        entire current state as inserts, so even the bootstrap rides the
        incremental path."""
        LakeTable.create(
            spark,
            root,
            source.schema,
            key_cols=source.key_cols,
            n_buckets=n_buckets or int(source.snapshot["n_buckets"]),
        )
        rep = cls(spark, root)
        rep.sync(source)
        return rep

    # ------------------------------------------------------------------ #
    def synced_version(self) -> int:
        """Last source snapshot version folded into the replica."""
        return max(0, self.table.applied_lsn())

    def read(self):
        return self.table.read()

    def _propagate_schema(self, source: LakeTable, from_v: int) -> None:
        """Replay the source's schema evolution since the last sync onto
        the replica BEFORE folding its change feed: renames are diffed by
        FIELD ID between the two source snapshots (two-phase through temp
        names so swap cycles cannot collide), drops are dropped, and
        adds/widenings ride one evolve_schema.  The replica's columns are
        expected to match the from-version source names (every earlier
        sync left them that way); anything else is a corrupted replica
        and fails loudly rather than null-filling silently."""
        snap_a = source.snapshot_at(from_v)
        snap_b = source.snapshot
        if int(snap_a["schema_id"]) == int(snap_b["schema_id"]):
            return
        ma = schema_meta(snap_a, int(snap_a["schema_id"]))
        mb = schema_meta(snap_b, int(snap_b["schema_id"]))
        replica_cols = [f.name for f in self.table.schema.fields]
        a_names = [m["name"] for m in ma]
        if replica_cols != a_names:
            raise ValueError(
                f"replica columns {replica_cols} do not match the source's "
                f"schema at last-synced version {from_v} ({a_names}) — "
                "re-bootstrap the replica"
            )
        a_by_id = {m["id"]: m["name"] for m in ma}
        b_ids = {m["id"] for m in mb}
        renames = [
            (a_by_id[m["id"]], m["name"])
            for m in mb
            if m["id"] in a_by_id and a_by_id[m["id"]] != m["name"]
        ]
        if renames:
            for i, (old, _new) in enumerate(renames):
                self.table.rename_column(old, f"__sync_tmp_{i}")
            for i, (_old, new) in enumerate(renames):
                self.table.rename_column(f"__sync_tmp_{i}", new)
        for m in ma:
            # a dropped id keeps its from-version name (renames above only
            # touched ids alive on both sides)
            if m["id"] not in b_ids:
                self.table.drop_column(m["name"])
        if [
            (f.name, f.dataType) for f in self.table.schema.fields
        ] != [(f.name, f.dataType) for f in source.schema.fields]:
            self.table.evolve_schema(source.schema)

    def sync(self, source: LakeTable) -> dict[str, Any]:
        """Fold source changes since the last sync into the replica.
        Idempotent: re-running a completed interval deduplicates against
        the replica's LSN ledger (events carry ``lsn = to_version``)."""
        from_v = self.synced_version()
        to_v = int(source.snapshot["version"])
        if to_v <= from_v:
            return {"from_version": from_v, "to_version": to_v, "keys": 0,
                    "skipped": True}
        self._propagate_schema(source, from_v)
        cdf = source.table_changes(from_v, to_v)
        # one CDF row per changed key: insert/update carry the post-image,
        # delete the pre-image (keys are all a delete needs).  All events
        # take lsn = to_v — per-key uniqueness holds (one row per key) and
        # the replica ledger lands exactly on the synced source version.
        cols = [f.name for f in self.table.schema.fields]
        events = cdf.select(
            *cols,
            F.lit(to_v).cast("long").alias("lsn"),
            F.when(F.col("_change_type") == "delete", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
        )
        stats = self.table.merge(
            events,
            batch_id=f"replica-sync-v{from_v}-v{to_v}",
            extra_lineage={
                "operation": "replica_sync",
                "source_from_version": from_v,
                "source_to_version": to_v,
            },
        )
        return {
            "from_version": from_v,
            "to_version": to_v,
            "keys": stats.batch_keys,
            "deletes": stats.deletes,
            "skipped": False,
        }
