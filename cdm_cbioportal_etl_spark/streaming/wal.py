"""Structured-Streaming WAL tail: file-based change-log → exactly-once MERGE.

The batch replayer (cdc/replayer.py) consumes a *bounded* LSN range; this
module is the unbounded tail: a WAL directory into which log segments
(parquet files of change events) keep arriving is consumed with
``readStream`` + ``foreachBatch``, each micro-batch flowing through the
same ``LakeTable.merge`` exactly-once path (LSN ledger + atomic snapshot
commit).  Because the ledger commits atomically with the data, the sink is
idempotent under Structured Streaming's at-least-once ``foreachBatch``
redelivery — the end-to-end guarantee is exactly-once table state.

Reference analog: none — the reference re-extracts everything per run
(reference pipeline/lib/summary/summary_config_processor.py:373-419); this
is the incremental surface BASELINE.json's north_star mandates
("WAL-tail reader emits insert/update/delete events").

Scale shape: ``maxFilesPerTrigger`` bounds micro-batch size (bounded
executor memory at any WAL backlog); ``Trigger.AvailableNow`` drains a
backlog in bounded batches then stops — the cron/driver-friendly mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake import LakeTable

WAL_SYS_COLS = [
    T.StructField("lsn", T.LongType()),
    T.StructField("op", T.StringType()),
]


def wal_schema(data_schema: T.StructType) -> T.StructType:
    return T.StructType(WAL_SYS_COLS + list(data_schema.fields))


class WalTailReader:
    """Tails a directory of WAL parquet segments into a LakeTable."""

    def __init__(
        self,
        spark: SparkSession,
        wal_dir: str,
        table: LakeTable,
        checkpoint_dir: str,
        max_files_per_trigger: int = 8,
        registry=None,
    ):
        self.spark = spark
        self.wal_dir = wal_dir
        self.table = table
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        # optional SchemaRegistry: evolution DDL is issued BEFORE the batch
        # merge, so events referencing a newer schema never apply first
        self.registry = registry

    def _stream(self) -> DataFrame:
        # file streams need an explicit schema; infer it from the WAL files
        # themselves (cheap footer read) so newly-added columns are seen —
        # the registry then evolves the table before the first merge.
        # Falls back to the table schema for an empty/unborn WAL dir.
        try:
            schema = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(self.wal_dir)
                .schema
            )
            if "lsn" not in schema.names:
                schema = wal_schema(self.table.schema)
        except Exception:
            schema = wal_schema(self.table.schema)
        return (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.wal_dir)
        )

    def _apply_batch(self, batch: DataFrame, epoch_id: int) -> None:
        if self.registry is not None:
            self.registry.ensure_table_schema(self.table, batch)
        # merge() is idempotent (ledger-filtered, snapshot-atomic), so a
        # replayed epoch after a crash is a no-op — exactly-once net effect
        self.table.merge(
            batch,
            batch_id=f"stream-epoch-{epoch_id}",
            source_watermarks={"stream": epoch_id},
            count_batch=False,
        )

    def run_available_now(self, await_termination_sec: int | None = 300):
        """Drain everything currently in the WAL dir, then stop."""
        q = (
            self._stream()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if await_termination_sec is not None:
            q.awaitTermination(await_termination_sec)
        return q

    def run_continuous(self, processing_time: str = "5 seconds"):
        """Keep tailing (long-running service mode); caller manages stop()."""
        return (
            self._stream()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )
