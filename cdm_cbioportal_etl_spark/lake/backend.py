"""Merge-backend seam: the minimal surface the CDC engine needs from a
lake table, with two implementations —

- :class:`~cdm_cbioportal_etl_spark.lake.table.LakeTable` (built-in,
  jar-free: portable snapshot/bucket format, COW + MOR modes), and
- :class:`IcebergBackend` (Apache Iceberg ``MERGE INTO`` through Spark
  SQL, for clusters that ship iceberg-spark-runtime jars).

table.py:15 promises the bucket layout "is swappable for Apache Iceberg
MERGE INTO with a bucket partition spec" — this module is that seam made
checkable: the protocol is structural (``runtime_checkable``), LakeTable
already satisfies it unchanged, and the Iceberg implementation maps each
protocol method onto Iceberg's native equivalent (CREATE TABLE ... USING
iceberg PARTITIONED BY bucket(), MERGE INTO, rewrite_data_files,
snapshot history).  Tests parametrize the replay flow over both and skip
the Iceberg leg when the runtime jars are absent (they are not baked
into this sandbox).

Semantics parity notes (documented, not hidden):

- Latest-LSN-wins winner reduction happens BEFORE the merge in both
  backends (``reduce_winners`` — same map-side-combinable ``max_by``
  LakeTable.prepare_batch uses), so MERGE sources are key-unique as
  Iceberg requires (cardinality check).
- The exactly-once ledger: LakeTable commits applied_lsn atomically
  inside the same snapshot manifest as the data.  Iceberg's analog is a
  snapshot summary property — committed by the SAME MERGE commit via the
  write property ``snapshot-property.applied-lsn``; ``applied_lsn``
  reads it back from the current snapshot.  Re-applying an old batch is
  prevented the same way LakeTable does it: winners are filtered to
  ``_lsn > applied_lsn`` before the merge.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cdm_cbioportal_etl_spark.lake.table import LSN_COL


@runtime_checkable
class MergeBackend(Protocol):
    """What the replay engine requires of a lake table.

    LakeTable satisfies this structurally (no inheritance needed);
    IcebergBackend implements it over an Iceberg catalog table.
    """

    @property
    def schema(self) -> T.StructType: ...

    @property
    def key_cols(self) -> list[str]: ...

    def read(self) -> DataFrame: ...

    def merge(self, batch: DataFrame) -> object: ...

    def compact(self) -> int: ...

    def row_count(self) -> int: ...

    def applied_lsn(self) -> int: ...


def reduce_winners(batch: DataFrame, key_cols: list[str], lsn_col: str = "lsn") -> DataFrame:
    """Latest-LSN-wins per key: ONE aggregation (``max_by(struct, lsn)``)
    with map-side partial combine, so hot keys pre-reduce before the
    single key exchange — the same shape as LakeTable.prepare_batch's
    shuffle path.  (Physically a SortAggregate — struct-valued max_by —
    with per-partition local sorts; no window, no global sort.)"""
    payload = [c for c in batch.columns if c not in key_cols]
    agg = batch.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col(lsn_col)).alias("_w")
    )
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])


def iceberg_available(spark: SparkSession, catalog: str = "local") -> bool:
    """True when an Iceberg Spark catalog is configured AND its classes
    load — the skip condition for the Iceberg leg of backend tests."""
    if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergBackend:
    """Iceberg-native implementation of the merge seam.

    Requires a session configured with iceberg-spark-runtime and a
    catalog (e.g. ``spark.sql.catalog.local`` = SparkCatalog,
    type=hadoop, warehouse=...).  Table layout mirrors LakeTable: user
    columns + ``_lsn``, partitioned by ``bucket(n, first-key)`` so MERGE
    prunes to touched buckets — the exact swap table.py:15 promises.
    """

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        key_cols: list[str],
    ) -> None:
        self.spark = spark
        self.identifier = identifier
        self._key_cols = list(key_cols)

    # ---------------------------------------------------------------- #
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        identifier: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> "IcebergBackend":
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        spark.sql(
            f"CREATE TABLE {identifier} ({cols}, `{LSN_COL}` BIGINT) "
            f"USING iceberg "
            f"PARTITIONED BY (bucket({n_buckets}, `{key_cols[0]}`)) "
            f"TBLPROPERTIES ('format-version'='2', "
            f"'write.merge.mode'='merge-on-read')"
        )
        return cls(spark, identifier, key_cols)

    # ---------------------------------------------------------------- #
    @property
    def schema(self) -> T.StructType:
        fields = [
            f
            for f in self.spark.table(self.identifier).schema.fields
            if f.name != LSN_COL
        ]
        return T.StructType(fields)

    @property
    def key_cols(self) -> list[str]:
        return list(self._key_cols)

    def read(self) -> DataFrame:
        return self.spark.table(self.identifier).drop(LSN_COL)

    def row_count(self) -> int:
        return self.spark.table(self.identifier).count()

    def applied_lsn(self) -> int:
        """Ledger read: the applied-lsn summary property of the current
        snapshot (committed atomically by the MERGE that carried it)."""
        rows = (
            self.spark.sql(
                f"SELECT summary['applied-lsn'] AS lsn "
                f"FROM {self.identifier}.snapshots "
                f"ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
            )
        ).collect()
        if not rows or rows[0].lsn is None:
            return -1
        return int(rows[0].lsn)

    # ---------------------------------------------------------------- #
    def merge(
        self, batch: DataFrame, lsn_col: str = "lsn", op_col: str = "op"
    ) -> dict:
        """Exactly-once idempotent upsert of a change-event batch —
        LakeTable.merge's convention (key cols + payload + op upsert/delete +
        lsn): winner-reduce, drop already-applied LSNs, then ONE
        Iceberg MERGE INTO whose commit also advances the ledger
        property."""
        applied = self.applied_lsn()
        winners = reduce_winners(batch, self._key_cols, lsn_col).filter(
            F.col(lsn_col) > F.lit(applied)
        )
        stats = winners.agg(
            F.count(F.lit(1)).alias("keys"),
            F.coalesce(F.max(lsn_col), F.lit(applied)).alias("max_lsn"),
        ).collect()[0]
        if stats["keys"] == 0:
            return {"keys": 0, "max_lsn": applied, "skipped": True}
        # the MERGE commit carries the ledger advance in its snapshot
        # summary -> data + ledger move atomically, as in LakeTable
        self.spark.conf.set(
            "spark.wap.snapshot-property.applied-lsn", str(int(stats["max_lsn"]))
        )
        winners = winners.withColumnRenamed(lsn_col, LSN_COL)
        view = f"_cdc_src_{abs(hash(self.identifier)) % 10**8}"
        winners.createOrReplaceTempView(view)
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in self._key_cols)
        payload_cols = [
            c for c in winners.columns if c not in (*self._key_cols, op_col)
        ]
        set_clause = ", ".join(f"t.`{c}` = s.`{c}`" for c in payload_cols)
        insert_cols = ", ".join(
            f"`{c}`" for c in (*self._key_cols, *payload_cols)
        )
        insert_vals = ", ".join(
            f"s.`{c}`" for c in (*self._key_cols, *payload_cols)
        )
        self.spark.sql(
            f"MERGE INTO {self.identifier} t USING {view} s ON {on} "
            f"WHEN MATCHED AND s.`{op_col}` = 'delete' THEN DELETE "
            f"WHEN MATCHED THEN UPDATE SET {set_clause} "
            f"WHEN NOT MATCHED AND s.`{op_col}` != 'delete' "
            f"THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
        )
        self.spark.catalog.dropTempView(view)
        return {
            "keys": int(stats["keys"]),
            "max_lsn": int(stats["max_lsn"]),
            "skipped": False,
        }

    def compact(self) -> int:
        """Fold MOR deltas back into base files (Iceberg's
        rewrite_data_files action — LakeTable.compact's analog)."""
        catalog = self.identifier.split(".", 1)[0]
        out = self.spark.sql(
            f"CALL {catalog}.system.rewrite_data_files(table => "
            f"'{self.identifier.split('.', 1)[1]}')"
        ).collect()
        return int(out[0][0]) if out else 0
